package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Embeddings
import graft.sources.Tables

/** Cache lifecycle: a long-lived session embedding graft operators must
  * not accumulate orphaned cached lineages (round-1 and round-2 advice).
  * Two properties:
  *
  *  - operator persists are input-keyed — re-running an operator reuses
  *    the one tracked entry instead of registering another;
  *  - [[GraftCache.releaseAll]] returns the session to zero persisted
  *    RDDs, including after operators (k-means) that persist internal
  *    frames — those must self-clean without the registry.
  */
class CacheLifecycleSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("three operator queries back-to-back, then releaseAll leaves zero persisted RDDs") {
    GraftCache.releaseAll(spark)
    for (q <- Seq("q_dedup_minhash_lsh", "q_ann_lsh", "q_mutual_edges")) {
      SparkEntry.queries(q)(spark, sf).count()
    }
    assert(GraftCache.trackedCount(spark) > 0, "operators should have tracked persists")

    // Re-running the same queries must not grow the tracked set (input-keyed reuse).
    val before = GraftCache.trackedCount(spark)
    for (q <- Seq("q_dedup_minhash_lsh", "q_ann_lsh", "q_mutual_edges")) {
      SparkEntry.queries(q)(spark, sf).count()
    }
    assert(GraftCache.trackedCount(spark) == before,
      s"tracked set grew on re-run: $before -> ${GraftCache.trackedCount(spark)}")

    GraftCache.releaseAll(spark)
    assert(GraftCache.trackedCount(spark) == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"persisted RDDs remain: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("releaseCreatedDuring scopes per-batch persists; pre-existing entries survive") {
    import graft.operators.TextOps
    GraftCache.releaseAll(spark)
    // a pre-existing tracked frame (the serving session's static state)
    val static = GraftCache.persistTracked(Tables.documents(spark, sf).limit(10))
    static.count()
    val before = GraftCache.trackedCount(spark)
    assert(before > 0)
    // two "micro-batches" with distinct plans, each tracking new frames
    // (DedupIndex.matchAgainst persist-tracks the batch signatures —
    // exactly what the streaming probe scopes per batch)
    val docs = Tables.documents(spark, sf)
    val ix = graft.operators.DedupIndex
    (1 to 2).foreach { i =>
      GraftCache.releaseCreatedDuring(spark) {
        val batch = docs.limit(20 + i).select("doc_id", "text")
        ix.matchAgainst(batch, ix.fps(docs), ix.sigs(docs), ix.bands(docs)).count()
        assert(GraftCache.trackedCount(spark) > before,
          "the batch classifier should have tracked at least one persist")
      }
      assert(GraftCache.trackedCount(spark) == before,
        s"batch $i leaked tracked persists: ${GraftCache.trackedCount(spark)} != $before")
    }
    // the static frame was never touched
    assert(static.storageLevel.useMemory || static.storageLevel.useDisk)
    GraftCache.releaseAll(spark)
  }

  test("memoArtifact: failed compute doesn't poison the memo; success is computed once") {
    var calls = 0
    intercept[RuntimeException] {
      GraftCache.memoArtifact(spark, "lifecycle-spec-boom") {
        calls += 1; throw new RuntimeException("training failed")
      }
    }
    // retry after failure recomputes...
    val df = GraftCache.memoArtifact(spark, "lifecycle-spec-boom") {
      calls += 1; spark.range(1).toDF()
    }
    assert(calls == 2 && df.count() == 1)
    // ...and a further call reuses the memo
    GraftCache.memoArtifact(spark, "lifecycle-spec-boom") {
      calls += 1; spark.range(1).toDF()
    }
    assert(calls == 2, "successful artifact should be memoized")
    GraftCache.releaseAll(spark)
  }

  test("k-means training cleans up its internal persists without the registry") {
    GraftCache.releaseAll(spark)
    val q = Embeddings.quantized(Tables.embeddings(spark, sf))
    val codebook = Embeddings.kmeansCodebook(q)
    assert(codebook.count() == Embeddings.NumCentroids)
    // Only the tracked `quantized` entry may remain; the training frame
    // and per-iteration centroid frames must be gone already.
    GraftCache.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"k-means leaked persists: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }
}
