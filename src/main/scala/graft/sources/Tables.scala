package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet loaders for the testdata star schema (see /root/repo/TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst sees a declarative scan: column
  * pruning and predicate pushdown reach the parquet reader for free. Do NOT
  * cache here — at 100 TB the tables don't fit, and caching defeats scan
  * pruning; individual operators broadcast the genuinely small dims instead.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (early
    * testdata) and plain TIMESTAMP(MICROS, isAdjustedToUTC=false) (the
    * current refresh). Normalize either encoding to session-zoned
    * TimestampType micros:
    *  - NANOS: Spark 4 refuses to map nanos to TimestampType, so read it
    *    as a nanos long and rebuild micros with integer division (`div` —
    *    exact on longs, floors like DuckDB's `epoch_us`).
    *  - MICROS w/o UTC flag: arrives as TIMESTAMP_NTZ; the session runs
    *    in UTC ([[graft.GraftSession.tune]]), so the cast to TIMESTAMP is
    *    the identity on the stored wall-clock micros — bit-identical to
    *    what DuckDB's `epoch_us(ts)` sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
