package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, Embeddings}
import graft.sources.{Sinks, Tables}
import graft.streaming.EventStream

/** The committed ANN index artifact: build → commit → serve must equal
  * the in-session training path, rebuilds must version transactionally,
  * and the streaming serve path must answer from the committed artifact
  * across micro-batches without training anything.
  */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4)
  val sf = "/root/testdata/sf0.001"
  lazy val tmp: String = java.nio.file.Files.createTempDirectory("graft_annix").toString

  override def afterAll(): Unit = spark.stop()

  test("serve from the committed index == annIvfPq end to end") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_eq"
    AnnIndex.build(emb, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12), r.getInt(3))).toSet
    val served = rows(AnnIndex.serve(emb, path))
    val trained = rows(Embeddings.annIvfPq(emb))
    assert(served == trained,
      s"served-from-artifact must equal trained-in-session; diff=${(served diff trained) ++ (trained diff served)}")
  }

  test("hard negatives served from the committed index == in-session IVF-PQ band mining") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_neg"
    AnnIndex.build(emb, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12), r.getInt(3))).toSet
    val served = AnnIndex.serveHardNegatives(emb, path)
    val servedRows = served.collect()
    assert(servedRows.nonEmpty, "the band must be populated at sf0.001")
    // band + self-exclusion invariants on every served negative
    servedRows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "self can never be a negative")
      val cos = r.getDouble(2)
      assert(cos >= Embeddings.NegLo && cos < Embeddings.NegHi,
        s"cos $cos escaped the semi-hard band")
    }
    assert(rows(served) == rows(Embeddings.annHardNegatives(emb)),
      "artifact-served negatives must equal the in-session IVF-PQ band mining")
    // subset of the brute band pairs: same exact cosine, shortlist ⊆ all
    // k = corpus size: the heap keeps every band member per probe
    val brute = Embeddings.hardNegatives(emb, k = emb.count().toInt).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    servedRows.foreach(r => assert(brute.contains((r.getLong(0), r.getLong(1))),
      "a served negative must exist in the brute-force band set"))
  }

  test("rebuilds commit as new versions; the artifact tables are versioned and intact") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_v"
    AnnIndex.build(emb, path, buildV = 0L)
    AnnIndex.build(emb, path, buildV = 1L)
    val (v, _) = Sinks.VersionedTable.latestManifest(spark, s"$path/codes").get
    assert(v == 1L, s"second build must commit a second version, got $v")
    // same corpus -> identical deterministic index either version
    val v0 = Sinks.VersionedTable.read(spark, s"$path/codes", Some(0L))
      .select("vec_id", "c_id", "code_0", "code_1", "code_2", "code_3")
      .collect().map(_.toSeq).toSet
    val v1 = AnnIndex.codes(spark, path).collect().map(_.toSeq).toSet
    assert(v0 == v1, "idempotent rebuild: code tables must match across versions")
    // codebooks artifact is the constant-size model, not data-proportional
    val cbRows = Sinks.VersionedTable.read(spark, s"$path/codebooks").count()
    assert(cbRows == (1 + Embeddings.PqM) * Embeddings.NumCentroids,
      s"codebooks table must stay (1+PqM)*NumCentroids rows, got $cbRows")
  }

  test("takedown: retracted vectors stop serving (plain + hard negatives), bucket-pruned, parity with full rewrite (r10)") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_rt"
    AnnIndex.build(emb, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12), r.getInt(3))).toSet
    val before = AnnIndex.serve(emb, path).collect()
    assert(before.nonEmpty)
    // take down the two most-served neighbors — removal must be visible
    val takedown = before.map(_.getLong(1)).groupBy(identity)
      .toSeq.sortBy { case (id, g) => (-g.length, id) }.take(2).map(_._1)
    val mBefore = Sinks.VersionedTable.latestManifest(spark, s"$path/codes").get._2
    val Seq(receipt) = AnnIndex.retract(spark, path, takedown)
    val mAfter = Sinks.VersionedTable.latestManifest(spark, s"$path/codes").get._2
    val rewritten = (mBefore.keySet ++ mAfter.keySet)
      .count(b => mBefore.get(b) != mAfter.get(b))
    assert(rewritten <= takedown.size && rewritten >= 1,
      s"2-vec takedown rewrote $rewritten of ${mBefore.size} code buckets")
    // r11 receipt: what the compliance job files must equal the delta
    assert(receipt.subTable == "codes" && receipt.pruned &&
      receipt.bucketsRewritten == rewritten &&
      receipt.idsRequested == takedown.size.toLong &&
      receipt.idsFound == takedown.size.toLong &&
      receipt.newVersion == receipt.oldVersion + 1L,
      s"retract receipt must evidence the rewrite: $receipt")
    // removed content is no longer servable — by EITHER reader of the
    // candidate core
    val served = AnnIndex.serve(emb, path).collect()
    assert(!served.exists(r => takedown.contains(r.getLong(1))),
      "a retracted vector was served as a neighbor")
    assert(!AnnIndex.serveHardNegatives(emb, path).collect()
      .exists(r => takedown.contains(r.getLong(1))),
      "a retracted vector was mined as a hard negative")
    // codebooks untouched: the model artifact is not content
    assert(Sinks.VersionedTable.read(spark, s"$path/codebooks").count() ==
      (1 + Embeddings.PqM) * Embeddings.NumCentroids)
    // verdict parity with an unpruned full-snapshot rewrite of a twin
    val twin = s"$tmp/ix_rt_all"
    AnnIndex.build(emb, twin)
    Sinks.VersionedTable.replaceAll(spark, s"$twin/codes", Seq("vec_id")) { snap =>
      snap.filter(!col("vec_id").isInCollection(takedown.toSet))
    }
    assert(rows(AnnIndex.serve(emb, path)) == rows(AnnIndex.serve(emb, twin)),
      "bucket-pruned retract must serve identically to the full rewrite")
    // idempotent: replaying the takedown changes nothing
    AnnIndex.retract(spark, path, takedown)
    assert(rows(AnnIndex.serve(emb, path)) == rows(AnnIndex.serve(emb, twin)))
  }

  test("extend: new vectors encode with the COMMITTED codebooks, serve, and retract back out byte-identically (r11)") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_ext"
    // seed index on the id-prefix half (k-means init needs the first
    // NumCentroids ids present); the tail arrives as a later crawl
    val cut = 400L
    val seedEmb = emb.filter(col("vec_id") < cut)
    val newEmb = emb.filter(col("vec_id") >= cut)
    assert(newEmb.count() > 0, "need a non-empty extension crawl")
    AnnIndex.build(seedEmb, path)
    def served() = AnnIndex.serve(emb, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq
    val before = served()
    assert(!before.exists(_._2 >= cut), "extension ids must not serve yet")
    AnnIndex.extend(newEmb, path, buildV = 1L)
    // the merged codes == what the committed codebooks assign the union
    // (codebooks FROZEN — extend must never retrain the quantizer)
    val (coarseDf, cbs) = AnnIndex.loadCodebookFrames(spark, path)
    val qAll = Embeddings.quantized(emb)
    val expect = Embeddings.ivfAssign(qAll, coarseDf)
      .join(Embeddings.pqEncode(qAll, cbs), "vec_id")
      .collect().map(_.toSeq).toSet
    val got = AnnIndex.codes(spark, path).collect().map(_.toSeq).toSet
    assert(got == expect,
      "extended codes must equal the committed codebooks' assignment of the union")
    // new vectors now SERVE as candidates
    val after = served()
    assert(after.exists(_._2 >= cut),
      "an extension vector must be servable as a neighbor")
    // replayed extend: byte-identical content (idempotent re-merge)
    AnnIndex.extend(newEmb, path, buildV = 1L)
    assert(served() == after, "a replayed extend must not change answers")
    // retract the extension: serve returns byte-identical to pre-extend
    val newIds = newEmb.select("vec_id").collect().map(_.getLong(0)).toSeq
    AnnIndex.retract(spark, path, newIds)
    assert(served() == before,
      "retracting the extension must restore the seed index's answers")
    graft.GraftCache.releaseAll(spark)
  }

  test("occupancy from the committed codes == in-session diagnostic; retract frees the slots (r11)") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_occ"
    AnnIndex.build(emb, path)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val committed = rows(AnnIndex.occupancy(spark, path))
    val inSession = rows(Embeddings.ivfOccupancy(emb))
    assert(committed == inSession,
      "the artifact diagnostic must equal the in-session one row-for-row")
    // the takedown observable: retracting vectors drops code rows, and
    // the next occupancy read shows exactly those slots freed
    val victims = AnnIndex.codes(spark, path)
      .select("vec_id", "c_id").limit(3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    AnnIndex.retract(spark, path, victims.map(_._1).toSeq)
    val after = rows(AnnIndex.occupancy(spark, path)).map(t => t._1 -> t._2).toMap
    val expected = committed.map(t => t._1 -> t._2).toMap ++
      victims.groupBy(_._2).map { case (c, vs) =>
        c -> (committed.find(_._1 == c).get._2 - vs.length) }
    assert(after == expected,
      s"retract must free exactly the victims' slots: $after vs $expected")
    assert(after.values.sum == committed.map(_._2).sum - victims.length)
    graft.GraftCache.releaseAll(spark)
  }

  test("IndexRefine split: self-contained serve == corpus serve; vectors retract with codes; rebalance survives seed-id takedown (r11)") {
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_refine"
    AnnIndex.build(emb, path, storeVectors = true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12), r.getInt(3))).toSet
    val probeRows = emb.filter(col("vec_id") < Embeddings.NumProbes)
    // the split buys a serve with NO corpus frame: identical rows
    assert(rows(AnnIndex.serveWith(probeRows, path)) ==
      rows(AnnIndex.serve(emb, path)),
      "self-contained serve must equal the corpus-frame serve")
    // measured admission tau, REFUSAL branch: on this corpus the
    // 64-probe min self-ADC (0.39) sits BELOW the co-routed noise
    // ceiling (0.69) — a global ADC tau carries no signal, and the
    // measurement must refuse rather than emit one (run collision-only)
    val flat = intercept[IllegalArgumentException] {
      AnnIndex.measureAdmissionTau(spark, path)
    }
    assert(flat.getMessage.contains("no separation"), flat.getMessage)
    // separation branch: a 16-vector index has one centroid per vector
    // in every subspace (k-means init = the vectors), so reconstruction
    // is EXACT — self-ADC = 1.0 by construction, noise = the exact
    // pairwise cosine < 1; the measurement separates and commits
    val tiny = s"$tmp/ix_tau_tiny"
    AnnIndex.build(emb.filter(col("vec_id") < 16L), tiny, storeVectors = true)
    val tau = AnnIndex.commitAdmissionTau(spark, tiny, nProbes = 16)
    assert(tau > 0.0 && tau < 1.0, s"tau $tau must sit inside the ADC range")
    assert(AnnIndex.loadAdmissionTau(spark, tiny) == math.round(tau * 1e6) / 1e6,
      "committed tau must round-trip through the fixed-point exactly")
    // at the measured tau, every committed vector re-probed as an
    // arrival MATCHES (self-ADC >= tau by construction of the midpoint)
    val reprobe = AnnIndex.vectors(spark, tiny).orderBy("vec_id").limit(8)
    assert(AnnIndex.matchedIds(reprobe, tiny,
        AnnIndex.loadAdmissionTau(spark, tiny)).count() == 8L,
      "a committed vector must match itself at the measured tau")
    // the tau binds to the codebooks it measured: after a rebalance the
    // ADC scale shifts, and the stale operating point must refuse
    assert(AnnIndex.rebalance(spark, tiny, buildV = 1L, maxLoadPct = 0L))
    val stale = intercept[IllegalArgumentException] {
      AnnIndex.loadAdmissionTau(spark, tiny)
    }
    assert(stale.getMessage.contains("re-run commitAdmissionTau"), stale.getMessage)
    // takedown completeness: the exact vectors are content in the
    // strongest sense — retract must drop BOTH sub-tables
    val victims = Seq(0L, 1L, 2L, 3L, 4L, 5L)
    val receipts = AnnIndex.retract(spark, path, victims)
    assert(receipts.map(_.subTable).sorted == Seq("codes", "vectors"),
      s"one receipt per sub-table: $receipts")
    assert(receipts.forall(r => r.idsFound == victims.size.toLong && r.pruned))
    assert(AnnIndex.vectors(spark, path).filter(
      col("vec_id").isInCollection(victims.toSet)).count() == 0)
    // occupancy-triggered rebalance: forced (bar 0), and the k-means
    // seed ids 0..5 are GONE — the dense-init remap must still produce
    // contiguous committed c_ids or every loader breaks
    assert(AnnIndex.rebalance(spark, path, buildV = 5L, maxLoadPct = 0L))
    val occ = AnnIndex.occupancy(spark, path).collect()
    assert(occ.map(_.getLong(0)).sorted.toSeq ==
      (0L until Embeddings.NumCentroids.toLong).toSeq,
      "rebalanced c_ids must stay contiguous despite retracted seed ids")
    assert(occ.map(_.getLong(1)).sum == emb.count() - victims.size,
      "re-encode must cover exactly the surviving corpus")
    // below the bar: a no-op
    assert(!AnnIndex.rebalance(spark, path, buildV = 6L,
      maxLoadPct = Embeddings.NumCentroids * 100L))
    // a non-monotone buildV would lose the latest-wins merge to prior
    // versions, silently keeping stale codes against new codebooks
    val nonMono = intercept[IllegalArgumentException] {
      AnnIndex.rebalance(spark, path, buildV = 5L, maxLoadPct = 0L)
    }
    assert(nonMono.getMessage.contains("must exceed"), nonMono.getMessage)
    // the rebuilt index still serves: k rows per probe, retracted
    // content still excluded
    val served = AnnIndex.serveWith(probeRows, path).collect()
    assert(served.nonEmpty &&
      !served.exists(r => victims.contains(r.getLong(1))),
      "a retracted vector must not resurface through the rebalance")
    graft.GraftCache.releaseAll(spark)
  }

  test("streaming ANN serves from the committed index across two micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val path = s"$tmp/ix_stream"
    AnnIndex.build(emb, path)
    // two batches of "arriving" queries cloned from corpus vectors —
    // the clone lands in its original's list, so candidates must
    // contain the original
    val probes = emb.limit(4).collect()
      .map(r => (r.getLong(0) + 30000L, r.getSeq[Float](1)))
    val (b1, b2) = probes.splitAt(2)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.streamingAnnCommittedCandidates(
      in.toDF().toDF("query_id", "embedding"), path)
      .writeStream.format("memory").queryName("annix").outputMode("append").start()
    in.addData(b1.toSeq)
    q.processAllAvailable()
    val afterB1 = spark.sql("SELECT DISTINCT query_id FROM annix")
      .collect().map(_.getLong(0)).toSet
    assert(afterB1 == b1.map(_._1).toSet, s"batch 1 queries answered: $afterB1")
    in.addData(b2.toSeq)
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM annix").collect()
    q.stop()
    assert(out.map(_.getLong(0)).toSet == probes.map(_._1).toSet,
      "both micro-batches must be answered from the same committed index")
    // exact expectation: the identical transform on a static frame
    val expected = EventStream.streamingAnnCommittedCandidates(
      probes.toSeq.toDF("query_id", "embedding"), path)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1),
      math.round(r.getDouble(2) * 1e12))).toSet
    assert(got == expected, "streamed candidates must equal the static stream-static join")
    // the clone's own corpus vector is among its ADC candidates
    probes.foreach { case (qid, _) =>
      assert(out.exists(r => r.getLong(0) == qid && r.getLong(1) == qid - 30000L),
        s"query $qid: committed-index candidates must include its source vector")
    }
  }
}
