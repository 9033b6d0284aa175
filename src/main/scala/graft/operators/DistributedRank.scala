package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking scaffold for ordered per-key numbering where the
  * key is a BOUNDED catalog attribute (source, lang, …).
  *
  * `Window.partitionBy(boundedKey).orderBy(ord)` over a raw frame is a
  * scale-killer: at 100 TB one dominant key value becomes one
  * unsplittable window partition — a multi-TB single-task sort. The
  * classic fix (the same shape as RDD `zipWithIndex`) ranks in three
  * distributed steps:
  *
  *  1. range-bucket the (long) order column — order-preserving, so
  *     per-bucket local order + bucket order = global order;
  *  2. aggregate `value` per (key, bucket) — a bounded frame
  *     (|keys| × buckets rows), then exclusive prefix-sum it per key.
  *     The ONLY window in the plan runs over this aggregated frame;
  *  3. broadcast the offsets back onto the bucketed rows; callers add a
  *     LOCAL per-(key, bucket) window to the offset. Per-task work is
  *     one bucket of one key, never a whole key.
  *
  * Mirrors the chunked batch processing of the reference analyzer
  * (interest_analyzer.py:168) without its driver-side loop.
  */
object DistributedRank {

  val BucketCol = "__b"
  val OffsetCol = "__off"

  /** Returns `df` plus [[BucketCol]] (range bucket of `ord`) and
    * [[OffsetCol]] (exclusive prefix aggregate of `value` over all
    * earlier buckets of the same `key`). `ord` must be integral.
    *
    * The min/max bounds read is one constant-size aggregate (the
    * broadcast-model pattern, like the ANN codebooks — not a data
    * collect).
    */
  def withBucketOffsets(df: DataFrame, key: String, ord: String,
                        value: Column, buckets: Int = 1024): DataFrame = {
    val bounds = df.agg(min(col(ord).cast("long")), max(col(ord).cast("long"))).head()
    val lo = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    val hi = if (bounds.isNullAt(1)) 0L else bounds.getLong(1)
    val width = math.max((hi - lo) / buckets + 1, 1L)
    val bucketed = df.withColumn(BucketCol,
      ((col(ord) - lit(lo)) / lit(width)).cast("long"))
    val perBucket = bucketed
      .groupBy(col(key), col(BucketCol))
      .agg(sum(value).as("__c"))
    val wOff = Window.partitionBy(key).orderBy(BucketCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn(OffsetCol, coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col(key), col(BucketCol), col(OffsetCol))
    bucketed.join(broadcast(offsets), Seq(key, BucketCol))
  }
}
