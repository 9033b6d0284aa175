package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exprs
import graft.sources.Tables

/** C80: the committed eval-protection registry — C15's benchmark
  * decontamination promoted to an ARTIFACT, the way production
  * pretraining actually runs it: benchmark suites are registered ONCE
  * (their shingle fingerprints committed through `VersionedTable`),
  * and every ingest batch thereafter is decontaminated against the
  * committed registry WITHOUT the eval text being present — the
  * registry stores 16-hex-char shingle hashes, so eval answers never
  * ride along with the pipeline (the leak-safety property a shared
  * registry needs), and a new benchmark extends the registry by plain
  * key-merge (hash-keyed upsert IS set union; replays no-op).
  *
  * Scale shape: the registry is EVAL-SUITE-sized (thousands of docs ×
  * ~50 shingles), orders of magnitude under the corpus — it broadcasts
  * to the probe join, the corpus side streams once, and the per-doc
  * verdict is one keyed agg. C15 stays the in-session flag pass; this
  * is its build-once/serve-forever twin, exactly the C26→C66
  * promotion.
  */
object EvalRegistry {

  val W = 8
  private val toks = split(col("text"), " ")
  private def regPath(p: String) = s"$p/eval_shingles"

  /** Distinct 64-bit (16 hex char) shingle-hash fingerprints of a
    * benchmark frame — the SAME hash C15 joins on, so the two lenses
    * can never classify apart.
    */
  def shingleHashes(benchDocs: DataFrame, w: Int = W): DataFrame =
    benchDocs
      .select(explode(Exprs.shingles(toks, w)).as("s"))
      .select(substring(md5(col("s")), 1, 16).as("h"))
      .distinct()

  /** Register a benchmark SUITE: commit its fingerprints under the
    * suite name. Extending with a NEW benchmark is the same call — the
    * (suite, hash)-keyed upsert is set union, and re-registering the
    * same suite is a no-op. The suite column exists for the LIFECYCLE:
    * benchmarks get retired and rotated, and a registry of bare hashes
    * could never unregister one safely (a dropped hash might also
    * belong to a still-protected suite). Rows are keyed (suite, h) and
    * BUCKETED by suite, so [[unregister]] is a bucket-pruned rewrite
    * and a hash shared by two suites keeps protecting until its LAST
    * registrant leaves.
    */
  // Size assumption: bucketing by suite alone puts a whole suite's
  // fingerprints in ONE bucket dir, so register() rewrites that suite's
  // rows in one hot bucket — fine for eval registries (benchmarks are
  // thousands of docs, not corpora; the registry is catalog-sized by
  // nature). If registries ever grow corpus-shaped, move to a
  // (suite, h-range) bucket scheme with unregister enumerating the
  // suite's bucket range — the replaceBuckets contract already allows it.
  def register(benchDocs: DataFrame, path: String, buildV: Long = 0L,
               suite: String = "default"): Unit =
    graft.sources.Sinks.VersionedTable.mergeUpsert(
      benchDocs.sparkSession, regPath(path),
      shingleHashes(benchDocs)
        .withColumn("suite", lit(suite))
        .withColumn("build_v", lit(buildV)),
      Seq("suite", "h"), "build_v", numBuckets = 16,
      bucketKeys = Seq("suite"))

  /** Retire a benchmark suite — the registry's takedown: drop the
    * suite's rows (bucket-pruned: suites bucket whole, so the touched
    * set is one bucket per named suite), leaving every OTHER suite's
    * rows — including hashes the retired suite shared — still
    * protecting. Idempotent; refuses to empty the registry (drop the
    * table to retire the last suite).
    */
  def unregister(spark: SparkSession, path: String,
                 suite: String): TakedownReceipt = {
    import graft.sources.Sinks.VersionedTable
    val p = regPath(path)
    val nb = VersionedTable.storedNumBuckets(spark, p).getOrElse(16)
    val touched = spark.range(1)
      .select(pmod(hash(lit(suite)), lit(nb)).as("bk"))
      .head().getInt(0)
    // idsRequested = 1 named suite; idsFound counts the suite's
    // fingerprint rows actually present (0 = retiring a never-registered
    // suite, the idempotent re-run)
    Takedown.receipted(spark, path, p, "eval_shingles", 1L,
      col("suite") === suite, Some(Seq(touched))) {
      VersionedTable.replaceBuckets(spark, p, Seq("suite"), Seq(touched)) {
        slice => slice.filter(col("suite") =!= suite)
      }
    }
  }

  def load(spark: SparkSession, path: String): DataFrame =
    graft.sources.Sinks.VersionedTable.read(spark, regPath(path))
      .select("h").distinct()

  /** The registry's underlying VersionedTable path — what a
    * cross-artifact pipeline snapshot pins ([[graft.sources.Sinks
    * .PipelineSnapshot]]: the registry is a single plain table, so its
    * pin is a manifest version, not a group).
    */
  def tablePath(path: String): String = regPath(path)

  /** [[load]] at a PINNED manifest version — the pipeline-snapshot read
    * path: refuses on a vacuumed version (never silently falls forward;
    * keep the pin inside the maintenance sweep's retention budget).
    */
  def loadAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val p = regPath(path)
    require(graft.sources.Sinks.VersionedTable.manifestExists(spark, p, version),
      s"EvalRegistry.loadAt: pinned version $version no longer exists at $p " +
        "— retention outran the pin; re-pin to a recent snapshot")
    graft.sources.Sinks.VersionedTable.read(spark, p, Some(version))
      .select("h").distinct()
  }

  /** True iff the registry at `path` has at least one committed version —
    * the cheap existence probe stream starters use to fail fast on a
    * typo'd / not-yet-registered path instead of crash-looping the first
    * micro-batch ([[load]] throws on an uncommitted table).
    */
  def isRegistered(spark: SparkSession, path: String): Boolean =
    graft.sources.Sinks.VersionedTable
      .latestManifest(spark, regPath(path)).isDefined

  /** Per-doc decontamination verdict against a registry frame
    * (committed or in-session): n_shared distinct fingerprint hits and
    * the keep flag — EVERY probe doc gets a row (the keep verdict is
    * the product; C15 reports only the contaminated). Stateless, so
    * the streaming twin runs it unchanged per micro-batch.
    */
  def decontaminate(docs: DataFrame, registry: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(Exprs.shingles(toks, W)).as("s"))
      .select(col("doc_id"), substring(md5(col("s")), 1, 16).as("h"))
    val hits = sh.join(broadcast(registry), "h")
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_shared"))
    docs.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) === 0L).as("keep"))
  }

  /** The registered query: register the benchmark slice (doc_id % 10
    * == 0, C15's stand-in suite) into a session temp registry ONCE
    * (the memoized-artifact convention — a released cache re-pays the
    * build on cold runs), then decontaminate the train slice from the
    * LOADED registry — the full commit→load→serve path under the
    * oracle gate.
    */
  def decontaminateVsRegistry(spark: SparkSession, documents: DataFrame,
                              key: String): DataFrame = {
    val dirDf = graft.GraftCache.memoArtifact(spark, ("eval_registry", key)) {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-evalreg").toString
      register(documents.filter(col("doc_id") % 10 === 0), dir)
      Seq(dir).toDF("dir")
    }
    val dir = dirDf.collect()(0).getString(0)
    decontaminate(documents.filter(col("doc_id") % 10 =!= 0), load(spark, dir))
  }

  val decontaminateSql: String =
    s"""WITH sh AS (SELECT doc_id,
       |    substr(md5(unnest(${TextOps.shinglesSqlExpr(W)})), 1, 16) AS h
       |  FROM documents),
       |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0),
       |hits AS (
       |  SELECT sh.doc_id, CAST(count(DISTINCT sh.h) AS BIGINT) AS n_shared
       |  FROM sh JOIN bench USING (h)
       |  WHERE sh.doc_id % 10 <> 0
       |  GROUP BY sh.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(hits.n_shared, 0) AS BIGINT) AS n_shared,
       |  coalesce(hits.n_shared, 0) = 0 AS keep
       |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
       |WHERE d.doc_id % 10 <> 0""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decontaminate" -> ((s, d) =>
      decontaminateVsRegistry(s, Tables.documents(s, d), d)))

  def oracle: Map[String, String] = Map(
    "q_decontaminate" -> decontaminateSql)
}
