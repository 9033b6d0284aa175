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

  /** Failure-aware replica rotation — the reference's proxy pool
    * (scraper/proxy_manager.py:9-65: round-robin `get_proxy`, failures
    * removed from the pool, a depleted pool reloaded) re-expressed for
    * the failure surface a Spark ingest actually has: INPUT REPLICAS.
    * A 100 TB pipeline reads the same logical dataset from one of
    * several physical locations (mirror buckets, a warm cache tier, a
    * secondary region), and transient location failures — throttling,
    * a cold mirror, a torn sync — should rotate to the next replica,
    * not kill the job.
    *
    * Differences from the reference, on purpose:
    *  - failures COOL DOWN instead of being removed: a throttled
    *    bucket heals, and cooldown-expiry is the honest analog of the
    *    reference's pool reload (which re-adds everything);
    *  - rotation prefers the replica with the fewest consecutive
    *    failures (stable order tiebreak), so a flaky mirror degrades
    *    to last resort instead of taking every Nth read;
    *  - when EVERY replica is cooling down, the least-recently-failed
    *    one is tried anyway (an all-cold pool must degrade to retry,
    *    never to silent no-op — the reference logs "No proxies" and
    *    returns None, which is the unsound branch).
    *
    * Spark wrinkle the wrapper owns: `spark.read.*` is LAZY — a bad
    * path surfaces at action time, deep in a job. [[ReplicaSet.read]]
    * therefore PROBES the chosen replica eagerly (schema resolution +
    * a one-row action: footer/header reads, not a scan) before handing
    * the frame out, so rotation happens at ingest time and a returned
    * frame is known-readable. Driver-local mutable state, like the
    * reference's in-process pool; clock injectable for tests.
    */
  final class ReplicaSet(paths: Seq[String], cooldownMs: Long = 60000L,
                         now: () => Long = System.currentTimeMillis) {
    require(paths.nonEmpty, "ReplicaSet needs at least one replica path")
    private case class Health(consecutiveFailures: Int = 0, lastFailureMs: Long = Long.MinValue)
    private val health = scala.collection.mutable.LinkedHashMap(
      paths.map(_ -> Health()): _*)

    private def coolingDown(h: Health): Boolean =
      h.consecutiveFailures > 0 && now() - h.lastFailureMs < cooldownMs

    /** Replicas in try-order: healthy ones first (fewest consecutive
      * failures, then declaration order), then — only as last resort —
      * the cooling-down ones, least-recently-failed first. */
    def tryOrder: Seq[String] = {
      val (cold, warm) = health.toSeq.partition { case (_, h) => coolingDown(h) }
      warm.sortBy { case (p, h) => (h.consecutiveFailures, paths.indexOf(p)) }.map(_._1) ++
        cold.sortBy { case (_, h) => h.lastFailureMs }.map(_._1)
    }

    def markFailure(path: String): Unit = health.get(path).foreach { h =>
      health.update(path, Health(h.consecutiveFailures + 1, now()))
    }
    def markSuccess(path: String): Unit =
      if (health.contains(path)) health.update(path, Health())
    def failures(path: String): Int =
      health.get(path).map(_.consecutiveFailures).getOrElse(0)

    /** Open the dataset from the first replica that proves readable:
      * for each candidate in [[tryOrder]], build the frame and probe it
      * (`limit(1).count()` — schema + one row, not a scan); a probe
      * failure marks the replica and rotates on. Throws the LAST
      * failure only after every replica refused. */
    def read(reader: String => DataFrame): DataFrame = {
      var lastErr: Throwable = null
      // explicit loop, no return-inside-lambda: a non-local return is a
      // control THROWABLE and the failure handler would swallow it,
      // turning every success into a marked failure
      val it = tryOrder.iterator
      while (it.hasNext) {
        val p = it.next()
        val probed =
          try {
            val df = reader(p)
            df.limit(1).count() // eager readability probe
            Some(df)
          } catch {
            case scala.util.control.NonFatal(e) => markFailure(p); lastErr = e; None
          }
        probed match {
          case Some(df) => markSuccess(p); return df
          case None =>
        }
      }
      throw new java.io.IOException(
        s"ReplicaSet: every replica of ${paths.size} refused", lastErr)
    }
  }
}
