package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks.VersionedTable

/** C105: the admitted-corpus COMPLIANCE surface — merge-on-read
  * tombstones plus the unified forget/retro-decontamination jobs.
  *
  * The admission loops append admitted docs to a plain parquet dir
  * (`outPath`) — the right write shape for a firehose sink (no
  * per-batch manifest churn on the biggest table in the deployment),
  * but it left the corpus as the ONE store a takedown could not reach:
  * [[DedupIndex.retract]] / [[AnnIndex.retract]] / [[MediaIndex
  * .retract]] scrub the indexes, yet the content itself stayed
  * readable in the corpus files. Rewriting the corpus in place is the
  * wrong fix at scale — a 10-doc takedown must not rewrite a 100 TB
  * append dir, and a plain dir has no manifest to make the rewrite
  * atomic — so removal is MERGE-ON-READ, the deletion-vector design
  * every lakehouse format converged on: a takedown-sized tombstone
  * table (a [[VersionedTable]] under `<corpus>/_tombstones` — the
  * underscore prefix keeps it invisible to raw `spark.read.parquet`
  * consumers) that [[read]] anti-joins BROADCAST (cost: one map-side
  * filter over the scan, zero shuffle). Physical reclamation rides
  * whatever repack/re-shard job the deployment already schedules over
  * the corpus files — consumers go through [[read]] either way, so the
  * content is unreachable the moment the tombstone commits.
  *
  * [[forget]] is the unified compliance front door: tombstone the
  * corpus, retract from every committed artifact the caller names, and
  * file every receipt under ONE jobId in the [[TakedownLog]] — the job
  * the TakedownSpec kill-point sweep previously hand-composed,
  * promoted to the library. Effect order mirrors the admission loops'
  * restart-safety discipline, most-user-visible effect first:
  * tombstone FIRST (readers stop seeing the content immediately), then
  * the index retracts (probes stop matching), the ledger filing LAST
  * (evidence describes effects that actually landed). Every effect is
  * idempotent and the filing is jobId-guarded, so a job that dies at
  * ANY boundary reruns to the clean job's state (CorpusSpec sweeps
  * every boundary via the [[graft.FailPoint]] seam).
  *
  * [[retroDecontaminate]] closes the loop the r13 admission-time near
  * lens opened: gates protect batches admitted AFTER a registry lands,
  * but a registry UPDATE (new benchmark registered, the near lens
  * deployed after an exact-only era) leaves already-committed docs
  * leaking eval content. The job runs both committed lenses over the
  * corpus ([[EvalRegistry.retroVerdicts]] — the same detection core
  * the oracle-checked C104 query pins) and forgets the hits. Dedup
  * semantics stay sound afterwards: the hits leave the dedup index, so
  * a future COPY of that content is no longer rejected as a duplicate
  * — it is rejected by the REGISTRY gate instead, which is exactly
  * where benchmark content must be stopped.
  */
object Corpus {

  /** The tombstone table under the corpus dir. Underscore-prefixed, so
    * Spark's file index hides it from a raw parquet scan of the corpus
    * — only [[read]]/[[tombstones]] see it. */
  def tombstonesPath(corpusPath: String): String =
    s"${corpusPath.stripSuffix("/")}/_tombstones"

  /** Committed tombstones: (doc_id, job_id, reason, as_of_us). */
  def tombstones(spark: SparkSession, corpusPath: String): DataFrame =
    VersionedTable.read(spark, tombstonesPath(corpusPath))

  /** The corpus a consumer reads: the raw append dir minus tombstoned
    * docs. The tombstone table is takedown-sized by nature, so the
    * anti-join BROADCASTS — one map-side filter over the corpus scan,
    * no shuffle, no new scan shape. Consumers keep their existing
    * at-least-once discipline (dedup by (batch_id, doc_id)); this
    * removes docs, never rows-within-a-doc.
    */
  /** `idCol`: the corpus's id column — "doc_id" for the text loops,
    * "media_id" for the media loops (the tombstone table itself always
    * stores `doc_id`; the read renames for the anti-join). */
  def read(spark: SparkSession, corpusPath: String,
           idCol: String = "doc_id"): DataFrame = {
    val raw = spark.read.parquet(corpusPath)
    VersionedTable.latestManifest(spark, tombstonesPath(corpusPath)) match {
      case None => raw
      case Some(_) => raw.join(
        broadcast(tombstones(spark, corpusPath)
          .select(col("doc_id").as(idCol)).distinct()),
        Seq(idCol), "left_anti")
    }
  }

  /** Tombstone `docIds` in the corpus — the corpus's retract. Latest-
    * wins upsert keyed by doc_id (re-tombstoning is a no-op row-wise;
    * replays converge). Returns the receipt in [[TakedownReceipt]]'s
    * vocabulary: `idsFound` counts the CORPUS rows the tombstones mask
    * (0 = the content was never admitted — the "nothing to take down"
    * evidence; the count is one pushed-down scan, priced like the
    * funnel knob: a compliance job pays it, serves don't), versions
    * bracket the tombstone table's manifest (`oldVersion` −1 on the
    * first-ever tombstone).
    */
  def tombstone(spark: SparkSession, corpusPath: String, docIds: Seq[Long],
                jobId: String, reason: String,
                asOfUs: Long = 0L,
                idCol: String = "doc_id"): TakedownReceipt = {
    require(docIds.nonEmpty, "Corpus.tombstone: empty takedown list")
    val ids = docIds.toSet
    val tp = tombstonesPath(corpusPath)
    val (oldV, oldMap) = VersionedTable.latestManifest(spark, tp)
      .getOrElse((-1L, Map.empty[Int, String]))
    val found = spark.read.parquet(corpusPath)
      .filter(col(idCol).isInCollection(ids)).count()
    import spark.implicits._
    VersionedTable.mergeUpsert(spark, tp,
      docIds.toDF("doc_id")
        .withColumn("job_id", lit(jobId))
        .withColumn("reason", lit(reason))
        .withColumn("as_of_us", lit(asOfUs)),
      Seq("doc_id"), "as_of_us", numBuckets = 16)
    val (newV, newMap) = VersionedTable.latestManifest(spark, tp).get
    // the manifest delta, exactly as Takedown.receipted reports it
    val rewritten =
      newMap.count { case (b, rel) => !oldMap.get(b).contains(rel) } +
        (oldMap.keySet -- newMap.keySet).size
    TakedownReceipt(corpusPath, "_tombstones", ids.size, found,
      rewritten, oldV, newV, pruned = true)
  }

  /** The unified compliance job: remove `docIds` from the corpus (by
    * tombstone) and from every committed artifact named — dedup index,
    * ANN index, media index — filing all receipts under one `jobId`.
    * See the object doc for effect order and crash-replay semantics.
    */
  def forget(spark: SparkSession, corpusPath: String, docIds: Seq[Long],
             jobId: String,
             indexPath: Option[String] = None,
             annPath: Option[String] = None,
             mediaPath: Option[String] = None,
             logPath: Option[String] = None,
             reason: String = "forget",
             asOfUs: Long = 0L): Seq[TakedownReceipt] = {
    require(docIds.nonEmpty, "Corpus.forget: empty takedown list")
    require(jobId.nonEmpty, "Corpus.forget: jobId is the replay guard")
    val receipts =
      tombstone(spark, corpusPath, docIds, jobId, reason, asOfUs) +:
        (indexPath.toSeq.flatMap(DedupIndex.retract(spark, _, docIds)) ++
          annPath.toSeq.flatMap(AnnIndex.retract(spark, _, docIds)) ++
          mediaPath.toSeq.flatMap(MediaIndex.retract(spark, _, docIds)))
    logPath.foreach(lp =>
      TakedownLog.append(spark, lp, receipts, asOfUs, jobId))
    receipts
  }

  /** [[retroDecontaminate]]'s report: `scanned` corpus docs swept (one
    * verdict per doc), hits by lens, `tombstoned` = the forgotten doc
    * count (0 = clean corpus, nothing filed), and the registry manifest
    * versions the detection actually read (`nearRegistryV` −1 when the
    * registry carries no near fingerprints) — the dsirPin/regPin
    * capture-at-read discipline, so the sweep's evidence names its
    * inputs. */
  final case class RetroReport(scanned: Long, exactHits: Long,
                               nearHits: Long, tombstoned: Long,
                               registryV: Long, nearRegistryV: Long,
                               receipts: Seq[TakedownReceipt])

  /** Hit-list ceiling: a retro sweep whose hits are corpus-shaped means
    * the REGISTRY is wrong (a crawl slice registered as a benchmark),
    * not the corpus — refuse loudly rather than rewrite the world. Hits
    * are eval-suite-bounded by construction (each shares content with a
    * registered benchmark), so the takedown-list collect below stays
    * model-artifact-sized, like every other bounded collect site.
    */
  val RetroMaxHits = 100000

  /** Sweep the committed corpus against the committed registry with
    * BOTH lenses and forget the hits — the registry-update backfill.
    * Detection reads the RAW corpus files (not through [[read]]), and
    * that choice is load-bearing for crash-replay: a job that died
    * after the tombstone commit but before the index retract would,
    * under a tombstone-aware scan, replay to "0 hits" and leave the
    * contaminated fingerprints in the index forever. Against the raw
    * files the replay re-detects the same hits (tombstoned content is
    * still physically present until repack) and re-runs [[forget]],
    * whose every effect is idempotent and whose ledger filing is
    * jobId-guarded — so any kill point converges to the clean job's
    * state, and the report/funnel values are DETERMINISTIC under
    * replay (same scanned, same hits). The report reads as "physical
    * contamination present in the files"; it drops to zero only after
    * the repack job reclaims tombstoned rows. The optional funnel row
    * ([[AdmissionLog]], loop `retro_decon`) files after the effects,
    * like the admission loops' funnel.
    *
    * The near lens runs when the registry carries near fingerprints
    * ([[EvalRegistry.registerNear]]); an exact-only registry sweeps
    * with the exact lens alone — registering the near fingerprints and
    * re-running IS the "deploy the near lens retroactively" operation.
    */
  def retroDecontaminate(spark: SparkSession, corpusPath: String,
                         registryPath: String, jobId: String,
                         indexPath: Option[String] = None,
                         annPath: Option[String] = None,
                         mediaPath: Option[String] = None,
                         logPath: Option[String] = None,
                         funnelLogPath: Option[String] = None,
                         funnelBatchId: Long = 0L,
                         keepPct: Int = EvalRegistry.NearKeepPct,
                         maxHits: Int = RetroMaxHits,
                         asOfUs: Long = 0L): RetroReport = {
    require(EvalRegistry.isRegistered(spark, registryPath),
      s"Corpus.retroDecontaminate: no committed eval registry at " +
        s"$registryPath — call EvalRegistry.register(...) first")
    // RAW scan on purpose — see the crash-replay note above
    val corpus = spark.read.parquet(corpusPath)
      .select("doc_id", "text").dropDuplicates("doc_id")
    // registry versions captured AT READ and both lens loads pinned to
    // them (the admission loops' dsirPin/regPin discipline): a
    // re-register landing mid-job can neither tear the exact lens from
    // the near lens nor leave the report unable to name its inputs
    val regV: Long = VersionedTable
      .latestManifest(spark, EvalRegistry.tablePath(registryPath)).get._1
    val nearV: Long =
      if (EvalRegistry.isNearRegistered(spark, registryPath))
        VersionedTable.latestManifest(spark,
          EvalRegistry.nearTablePath(registryPath)).get._1
      else -1L
    val nearReg =
      if (nearV >= 0)
        Some(EvalRegistry.loadNearAt(spark, registryPath, nearV))
      else None
    val verdicts = EvalRegistry.retroVerdicts(corpus,
      EvalRegistry.loadAt(spark, registryPath, regV), nearReg, keepPct)
      .persist()
    try {
      val scanned = verdicts.count()
      val byKind = verdicts.filter(col("kind") =!= "clean")
        .groupBy("kind").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nExact = byKind.getOrElse("exact", 0L)
      val nNear = byKind.getOrElse("near", 0L)
      require(nExact + nNear <= maxHits,
        s"Corpus.retroDecontaminate: ${nExact + nNear} hits exceed " +
          s"maxHits=$maxHits — a corpus-shaped hit list means the registry " +
          "holds non-benchmark content; fix the registry, don't mass-retract")
      val hits = verdicts.filter(col("kind") =!= "clean")
        .select("doc_id").collect().map(_.getLong(0)).toIndexedSeq.sorted
      val receipts =
        if (hits.isEmpty) Seq.empty
        else forget(spark, corpusPath, hits, jobId, indexPath, annPath,
          mediaPath, logPath, reason = "retro_decontamination", asOfUs = asOfUs)
      funnelLogPath.foreach { lp =>
        graft.FailPoint.reach(lp) // kill-point sweep boundary (test seam)
        AdmissionLog.append(spark, lp, "retro_decon", funnelBatchId, Seq(
          "1_scanned" -> scanned,
          "2_exact_hits" -> nExact,
          "3_near_hits" -> nNear,
          "4_tombstoned" -> hits.size.toLong))
      }
      RetroReport(scanned, nExact, nNear, hits.size.toLong, regV, nearV,
        receipts)
    } finally verdicts.unpersist()
  }
}
