package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingest-edge readers (SURVEY.md §2: sources): schema-enforced CSV and
  * JSON-lines with an explicit corrupt-record policy. At 100 TB the
  * ingest edge is where garbage enters; the pattern here is PERMISSIVE
  * parsing with corrupt rows captured in-band (`_corrupt_record`), so
  * bad data is quarantined by a filter, not by a job crash — and the
  * quarantine rate is observable per batch.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  /** Schema-enforced CSV read; malformed lines land in `_corrupt_record`
    * instead of failing the job (PERMISSIVE), schema is never inferred
    * (inference = an extra full scan + nondeterministic types).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Schema-enforced JSON-lines read, same corrupt-record policy. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split into (clean, quarantined). Spark requires the parsed rows to
    * be cached/materialized before `_corrupt_record` can be filtered —
    * handled here so callers can't hit AnalysisException.
    */
  def quarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val cached = graft.GraftCache.persistTracked(parsed)
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (clean, bad)
  }

  // ------------- incremental (cursor-resumable) batch ingest -------------
  //
  // The reference checkpoints pagination progress in
  // `scrape_jobs.last_cursor` (database/setup.py:118) and resumes from it
  // (instagram_scraper.py:246-260). Batch equivalent: a persisted
  // max-offset cursor; each run reads only rows past it. The `>` filter
  // is an ordinary pushed-down predicate, so parquet row-group stats (and
  // offset-correlated partition layouts) skip already-processed data at
  // the scan — a re-run after new files land touches only the new rows.

  /** Current cursor value, or Long.MinValue if no cursor exists yet. */
  def readCursor(spark: SparkSession, cursorPath: String): Long = {
    val p = new Path(cursorPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Long.MinValue
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Rows of `dataPath` strictly past the persisted cursor. */
  def readIncremental(spark: SparkSession, dataPath: String,
                      cursorPath: String, offsetCol: String): DataFrame =
    spark.read.parquet(dataPath)
      .filter(col(offsetCol) > lit(readCursor(spark, cursorPath)))

  /** Advance the cursor to max(offsetCol) of the processed batch — call
    * AFTER the batch's outputs are durably written (at-least-once on
    * failure, same as the reference resuming from its last committed
    * cursor). Write-then-rename so a crash never leaves a torn cursor.
    * Returns the new cursor (old one if the batch was empty).
    */
  def advanceCursor(spark: SparkSession, cursorPath: String,
                    processed: DataFrame, offsetCol: String): Long = {
    val row = processed.agg(max(col(offsetCol).cast("long"))).head()
    val old = readCursor(spark, cursorPath)
    if (row.isNullAt(0)) return old
    val nv = math.max(row.getLong(0), old)
    val p = new Path(cursorPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(cursorPath + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(nv.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"advanceCursor: rename $tmp -> $p failed")
    nv
  }
}
