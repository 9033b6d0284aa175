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
    // Probe-first: read the footer WITHOUT the legacy flag, and set it
    // only when the file really is NANOS-encoded (the un-flagged read
    // then fails schema conversion). A MICROS events table therefore
    // never flips session-wide parquet semantics for OTHER nanos
    // tables read later; when the flag is needed it must stay set for
    // the session — the columnar reader re-consults it at execution,
    // so a scoped save/restore would break the deferred scan.
    val raw =
      try load(s, d, "events")
      catch {
        case e: Exception if e.getMessage != null && e.getMessage.contains("NANOS") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ wall-clock is UTC by data contract; the cast to
        // TimestampType interprets it in the SESSION zone, so it is
        // micros-identity only under UTC. Fail loudly instead of
        // silently shifting event times for a non-UTC caller.
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"Tables.events: events.ts is UTC wall-clock TIMESTAMP_NTZ; " +
            s"set spark.sql.session.timeZone=UTC (session has '$tz') — " +
            "GraftSession.tune does this")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
