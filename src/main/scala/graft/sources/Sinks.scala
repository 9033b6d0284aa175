package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side patterns for the 100 TB pipeline (SURVEY.md §2: sources &
  * sinks). The reference's sink is row-at-a-time psycopg2 INSERTs
  * (instagram_scraper.py:203, interest_analyzer.py:262); at scale the
  * equivalents are:
  *
  *  - date-partitioned parquet (partition pruning on read: a day's
  *    reprocess touches a day's files);
  *  - bucketed tables on the join key (co-located joins: downstream
  *    joins on the bucket key need NO shuffle — proven by SinksSpec
  *    asserting the absence of a shuffle exchange in the join plan);
  *  - compacted output (`coalesce` to target file counts — small-file
  *    storms kill object stores).
  */
object Sinks {

  /** Date-partitioned parquet sink: `path/day=YYYY-MM-DD/part-*.parquet`.
    * `repartition(col)` routes each day to one shuffle partition → one
    * file per day without serializing the write into a single task
    * (never `coalesce(1)` a partitioned write — it collapses the whole
    * job to one core).
    */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", to_date(col(tsCol)))
      .repartition(col("day"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Bucketed + sorted managed table: joins/aggregations on `key` read
    * co-located buckets and skip the shuffle entirely.
    */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a partitioned sink back; predicate on `day` prunes partitions. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
