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
  *  1. bucket the (long) order column by EQUAL-DEPTH cut points —
  *     order-preserving, so per-bucket local order + bucket order =
  *     global order;
  *  2. aggregate `value` per (key, bucket) — a bounded frame
  *     (|keys| × buckets rows), then exclusive prefix-sum it per key.
  *     The ONLY window in the plan runs over this aggregated frame;
  *  3. broadcast the offsets back onto the bucketed rows; callers add a
  *     LOCAL per-(key, bucket) window to the offset. Per-task work is
  *     one bucket of one key, never a whole key.
  *
  * Bucket boundaries are approx-percentile cut points (the
  * decileValueScalable pattern), not equal-WIDTH ranges: equal width
  * degenerates under order-value skew — a corpus where 90% of docs
  * share one n_chars value (or where ids cluster in one range) would
  * collapse into a single bucket and re-create exactly the
  * unsplittable local window this scaffold exists to kill. Equal-depth
  * cuts bound every bucket at ~n/buckets plus the largest TIE CLASS:
  * the bucket id must stay a pure function of the order value (ties
  * may never straddle a boundary — callers' rank()/offset algebra
  * depends on earlier buckets holding strictly smaller values), so a
  * single value carried by most of the corpus is irreducibly one
  * bucket; give such callers a finer-grained or compound (hashed)
  * order column. The cut array is a constant-size model artifact
  * (≤ buckets−1 longs from one sketch pass — the broadcast-codebook
  * pattern, not a data collect), and per-row assignment is a native
  * codegen binary search ([[graft.functions.Exprs.searchSorted]]).
  * ScaleAudit pins the planted-90%-tie occupancy bound.
  *
  * Mirrors the chunked batch processing of the reference analyzer
  * (interest_analyzer.py:168) without its driver-side loop.
  */
object DistributedRank {

  val BucketCol = "__b"
  val OffsetCol = "__off"

  /** Equal-depth cut points for `ord`: deduplicated, strictly
    * increasing, at most `buckets − 1` values. One approximate-
    * quantile sketch pass (error sized so bucket depth error stays a
    * small multiple of the ideal n/buckets).
    */
  private[graft] def depthCuts(df: DataFrame, ord: String, buckets: Int): Array[Long] = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val err = math.min(0.001, 1.0 / (4.0 * buckets))
    df.select(col(ord).cast("long").as("__ord"))
      .stat.approxQuantile("__ord", probs, err)
      .map(_.toLong).distinct.sorted
  }

  /** Returns `df` plus [[BucketCol]] (equal-depth bucket of `ord`) and
    * [[OffsetCol]] (exclusive prefix aggregate of `value` over all
    * earlier buckets of the same `key`). `ord` must be integral.
    */
  def withBucketOffsets(df: DataFrame, key: String, ord: String,
                        value: Column, buckets: Int = 1024): DataFrame = {
    val cuts = depthCuts(df, ord, buckets)
    val bucketed = df.withColumn(BucketCol,
      graft.functions.Exprs.searchSorted(col(ord).cast("long"), cuts))
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
