package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AdmissionLog, Corpus, DedupIndex, EvalRegistry, TakedownLog}
import graft.sources.Sinks.VersionedTable

/** C105: corpus tombstones (merge-on-read deletes for the admitted
  * corpus), the unified [[Corpus.forget]] compliance job, and the
  * [[Corpus.retroDecontaminate]] registry-update backfill — including
  * the full kill-point sweep over the retro job's durable-effect
  * boundaries.
  */
class CorpusSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-corpus-$tag").toString

  private def writeCorpus(dir: String, rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val p = s"$dir/corpus"
    rows.toDF("doc_id", "text").withColumn("batch_id", lit(0L))
      .write.mode("append").parquet(p)
    p
  }

  test("tombstones mask reads without touching the corpus files; receipts carry the masked-row evidence; idempotent") {
    val dir = tmp("ts")
    val rows = (1L to 8L).map(i => (i, s"corpus document $i"))
    val cp = writeCorpus(dir, rows)
    // no tombstones yet: read == raw
    assert(Corpus.read(spark, cp).count() == 8L)
    val r = Corpus.tombstone(spark, cp, Seq(2L, 5L), "job-1", "test", asOfUs = 1L)
    assert(r.idsRequested == 2L && r.idsFound == 2L && r.pruned &&
      r.oldVersion == -1L && r.newVersion > r.oldVersion,
      s"first-tombstone receipt: $r")
    // merge-on-read: the raw files still hold the content, readers don't see it
    assert(spark.read.parquet(cp).count() == 8L,
      "tombstoning must not rewrite the corpus files")
    val seen = Corpus.read(spark, cp).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(seen == Set(1L, 3L, 4L, 6L, 7L, 8L))
    // replay: same rows upsert to themselves; readers unchanged
    Corpus.tombstone(spark, cp, Seq(2L, 5L), "job-1", "test", asOfUs = 1L)
    assert(Corpus.tombstones(spark, cp).count() == 2L)
    assert(Corpus.read(spark, cp).count() == 6L)
    // a never-admitted id: receipt says found = 0 (the "nothing to
    // take down" evidence), readers unaffected
    val r99 = Corpus.tombstone(spark, cp, Seq(99L), "job-2", "test", asOfUs = 2L)
    assert(r99.idsFound == 0L)
    assert(Corpus.read(spark, cp).count() == 6L)
  }

  test("forget spans corpus + dedup index under one jobId: readers lose the doc, probes stop matching, ledger files once") {
    import spark.implicits._
    val dir = tmp("forget")
    val rows = (1L to 10L)
      .map(i => (i, s"forgettable document number $i carrying token$i"))
    val cp = writeCorpus(dir, rows)
    DedupIndex.build(rows.toDF("doc_id", "text"), s"$dir/index")
    val probe = Seq((103L, rows(2)._2)).toDF("doc_id", "text") // copy of doc 3
    assert(DedupIndex.serve(probe, s"$dir/index").head().getString(1) == "exact",
      "premise: the content is indexed before the forget")
    val receipts = Corpus.forget(spark, cp, Seq(3L), "job-f",
      indexPath = Some(s"$dir/index"), logPath = Some(s"$dir/tdlog"),
      asOfUs = 10L)
    assert(receipts.map(_.subTable).sorted == Seq("_tombstones", "bands", "fps", "sigs"),
      s"one receipt per store: ${receipts.map(_.subTable)}")
    assert(!Corpus.read(spark, cp).select("doc_id").collect()
      .map(_.getLong(0)).contains(3L))
    // the content is out of the index: its copy probes as new, and is
    // expected to be re-gated by the REGISTRY, not the dedup index
    assert(DedupIndex.serve(probe, s"$dir/index").head().getString(1) == "new")
    assert(TakedownLog.filedJobs(spark, s"$dir/tdlog") == Set("job-f"))
    val filedN = TakedownLog.read(spark, s"$dir/tdlog").count()
    // a crashed-and-rerun job replays every effect idempotently and
    // must not double-file
    Corpus.forget(spark, cp, Seq(3L), "job-f",
      indexPath = Some(s"$dir/index"), logPath = Some(s"$dir/tdlog"),
      asOfUs = 10L)
    assert(TakedownLog.read(spark, s"$dir/tdlog").count() == filedN,
      "jobId replay guard: no new ledger rows")
    assert(Corpus.tombstones(spark, cp).count() == 1L)
  }

  /** Planted retro scenario: bench passages registered with BOTH
    * lenses; the corpus holds novels plus PARAPHRASED bench passages —
    * exactly what an exact-only admission era let through (the spec
    * asserts that premise with the exact lens itself).
    */
  private def plantRetro(dir: String): (String, Seq[Long], Seq[Long]) = {
    import spark.implicits._
    val bench = (1L to 3L).map { i =>
      (i * 100L, (1 to 30).map(t => s"bench${i}tok$t").mkString(" "))
    }.toDF("doc_id", "text")
    // the shared paraphrase transform (drop every 7th token): no 8-gram
    // survives, ~4/7 of the 3-grams do
    val para = bench.select((col("doc_id") + 1L).as("doc_id"),
      EvalRegistry.paraphrase.as("text"))
    val novels = (1L to 5L).map { i =>
      (1000L + i, (1 to 30).map(t => s"novel${i}word$t").mkString(" "))
    }
    EvalRegistry.register(bench, s"$dir/registry")
    EvalRegistry.registerNear(bench, s"$dir/registry")
    // premise: the exact lens ADMITS every paraphrase (n_shared = 0) —
    // the gap the retro sweep exists to close
    val exactKeeps = EvalRegistry.decontaminate(para,
      EvalRegistry.load(spark, s"$dir/registry"))
    assert(exactKeeps.filter(!col("keep")).count() == 0L,
      "premise: paraphrases pass the exact lens")
    val corpusRows = novels ++
      para.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val cp = writeCorpus(dir, corpusRows)
    DedupIndex.build(corpusRows.toDF("doc_id", "text"), s"$dir/index")
    (cp, para.collect().map(_.getLong(0)).toSeq.sorted, novels.map(_._1))
  }

  test("retroDecontaminate: a registry update reaches back into the committed corpus — paraphrases forgotten, novels kept, evidence filed, replay converges") {
    val dir = tmp("retro")
    val (cp, paraIds, novelIds) = plantRetro(dir)
    // hit-list ceiling: a corpus-shaped hit list refuses before any effect
    val refused = intercept[IllegalArgumentException] {
      Corpus.retroDecontaminate(spark, cp, s"$dir/registry", "retro-0",
        maxHits = 0)
    }
    assert(refused.getMessage.contains("maxHits"))
    assert(Corpus.read(spark, cp).count() == (paraIds.size + novelIds.size).toLong,
      "the refused sweep must have taken no effect")
    val rep = Corpus.retroDecontaminate(spark, cp, s"$dir/registry", "retro-1",
      indexPath = Some(s"$dir/index"), logPath = Some(s"$dir/tdlog"),
      funnelLogPath = Some(s"$dir/funnel"), funnelBatchId = 7L, asOfUs = 20L)
    assert(rep.scanned == (paraIds.size + novelIds.size).toLong)
    assert(rep.exactHits == 0L && rep.nearHits == paraIds.size.toLong &&
      rep.tombstoned == paraIds.size.toLong, s"report: $rep")
    // the report names the registry versions the detection read (the
    // capture-at-read discipline)
    assert(rep.registryV >= 0L && rep.nearRegistryV >= 0L, s"report: $rep")
    val kept = Corpus.read(spark, cp).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == novelIds.toSet, s"novels kept, paraphrases gone: $kept")
    // dedup semantics after the retro: a COPY of forgotten content is
    // no longer an index dup — the registry gate is what rejects it now
    import spark.implicits._
    val copy = Seq((9999L, spark.read.parquet(cp)
      .filter(col("doc_id") === paraIds.head).head().getString(1)))
      .toDF("doc_id", "text")
    assert(DedupIndex.serve(copy, s"$dir/index").head().getString(1) == "new")
    assert(EvalRegistry.decontaminateNear(copy,
      EvalRegistry.loadNear(spark, s"$dir/registry"))
      .filter(!col("keep")).count() == 1L,
      "the registry gate still catches the content the index released")
    // evidence: one funnel row set under (retro_decon, batch 7), the
    // ledger filed once under the jobId
    val funnel = AdmissionLog.rollup(spark, s"$dir/funnel")
      .filter(col("loop") === "retro_decon").collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("total")).toMap
    assert(funnel == Map(
      "1_scanned" -> rep.scanned, "2_exact_hits" -> 0L,
      "3_near_hits" -> rep.nearHits, "4_tombstoned" -> rep.tombstoned))
    assert(TakedownLog.filedJobs(spark, s"$dir/tdlog") == Set("retro-1"))
    // replay (same jobId): detection is RAW-corpus on purpose, so the
    // report is deterministic; every effect no-ops, the ledger holds
    val ledgerN = TakedownLog.read(spark, s"$dir/tdlog").count()
    val rep2 = Corpus.retroDecontaminate(spark, cp, s"$dir/registry", "retro-1",
      indexPath = Some(s"$dir/index"), logPath = Some(s"$dir/tdlog"),
      funnelLogPath = Some(s"$dir/funnel"), funnelBatchId = 7L, asOfUs = 20L)
    assert(rep2.scanned == rep.scanned && rep2.nearHits == rep.nearHits &&
      rep2.tombstoned == rep.tombstoned,
      s"replayed sweep must re-derive the same verdicts: $rep2 vs $rep")
    assert(TakedownLog.read(spark, s"$dir/tdlog").count() == ledgerN)
    assert(Corpus.read(spark, cp).select("doc_id").collect()
      .map(_.getLong(0)).toSet == novelIds.toSet)
  }

  test("kill-point sweep: the retro job converges from a kill at every durable-effect boundary (r13)") {
    def setup(dir: String): Unit = plantRetro(dir)
    def job(dir: String): Unit = {
      Corpus.retroDecontaminate(spark, s"$dir/corpus", s"$dir/registry",
        "retro-ks", indexPath = Some(s"$dir/index"),
        logPath = Some(s"$dir/tdlog"),
        funnelLogPath = Some(s"$dir/funnel"), funnelBatchId = 1L,
        asOfUs = 30L)
    }
    // dir-independent converged state: readers see only novels, the
    // forgotten content probes as new, the ledger holds exactly one
    // filing per store under the job, snapshots healthy. Funnel counts
    // are deterministic here too (RAW-corpus detection), but a kill
    // BEFORE the funnel boundary leaves only the replay's filing —
    // identical rows, so they ARE comparable.
    def state(dir: String) = {
      import spark.implicits._
      val paraText = spark.read.parquet(s"$dir/corpus")
        .filter(col("doc_id") === 101L).head().getString(1)
      (Corpus.read(spark, s"$dir/corpus").select("doc_id").collect()
        .map(_.getLong(0)).toSet,
        DedupIndex.serve(Seq((9999L, paraText)).toDF("doc_id", "text"),
          s"$dir/index").head().getString(1),
        TakedownLog.read(spark, s"$dir/tdlog")
          .select("subTable", "job_id").collect()
          .map(r => (r.getString(0), r.getString(1))).sorted.toSeq,
        AdmissionLog.rollup(spark, s"$dir/funnel")
          .filter(col("loop") === "retro_decon").collect()
          .map(r => (r.getAs[String]("stage"), r.getAs[Long]("total")))
          .sorted.toSeq,
        graft.operators.Artifacts.snapshotHealth(spark, dir)
          .forall(_.fallenForward.isEmpty))
    }
    val dc = tmp("ks-clean"); setup(dc); job(dc)
    val ref = state(dc)
    assert(ref._1 == (1001L to 1005L).toSet && ref._2 == "new" &&
      ref._3.map(_._1) == Seq("_tombstones", "bands", "fps", "sigs"),
      s"clean premise: $ref")
    job(dc)
    assert(state(dc) == ref, "a replayed COMPLETE job must change nothing")
    val dp = tmp("ks-probe"); setup(dp)
    graft.FailPoint.record(dp); job(dp)
    val nB = graft.FailPoint.count
    graft.FailPoint.reset()
    // tombstone upsert + fps/sigs/bands rewrites + index group publish
    // + ledger filing + funnel filing
    assert(nB == 7, s"expected 7 durable-effect boundaries, saw $nB")
    assert(state(dp) == ref, "the probe run is itself a clean run")
    for (k <- 1 to nB) {
      val d = tmp(s"ks-$k"); setup(d)
      graft.FailPoint.arm(d, k)
      val killed =
        try { job(d); false }
        catch { case _: graft.FailPoint.Killed => true }
        finally graft.FailPoint.reset()
      assert(killed, s"boundary $k must fire")
      job(d) // the compliance job reruns after the crash
      assert(state(d) == ref,
        s"kill at boundary $k/$nB must replay to the clean job's state")
    }
  }
}
