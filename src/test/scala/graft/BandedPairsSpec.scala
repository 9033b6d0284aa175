package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BandedPairs

/** Exact-semantics fuzz for the shared banding machinery: against a
  * brute-force reference, `pairs` must return EXACTLY the set
  * {(a,b) : a < b, some band equal, hamming ≤ threshold}, each pair
  * once, with the true hamming distance — over random fingerprint
  * corpora (seeded, deterministic). This is the candidate rule both
  * engines share, so a bug here is invisible to the DuckDB oracle by
  * construction; the reference implementation is the only independent
  * check it can face.
  */
class BandedPairsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def hamming(a: String, b: String): Int =
    a.zip(b).count { case (x, y) => x != y }

  /** Brute-force reference incl. the md5-rank bucket cap: pairs kept
    * together in at least one (band index, band value) bucket after
    * capping, at hamming <= threshold.
    */
  private def refPairs(fps: Seq[(Long, String)], numBands: Int, bandBits: Int,
                       threshold: Int, cap: Int): Map[(Long, Long), Long] = {
    val buckets = scala.collection.mutable.Map.empty[(Int, String), List[(Long, String)]]
    for ((id, fp) <- fps; b <- 0 until numBands) {
      val key = (b, fp.substring(b * bandBits, (b + 1) * bandBits))
      buckets(key) = buckets.getOrElse(key, Nil) :+ ((id, fp))
    }
    val out = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for ((_, members) <- buckets) {
      val kept = members.sortBy { case (id, _) =>
        (graft.operators.BandedPairs.md5Rank(id), id) }.take(cap)
      for ((ia, fa) <- kept; (ib, fb) <- kept if ia < ib) {
        val d = hamming(fa, fb)
        if (d <= threshold) out((ia, ib)) = d.toLong
      }
    }
    out.toMap
  }

  test("pairs == brute-force {shared band && hamming <= t}, each exactly once, true distance") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(7L, 42L, 2026L)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val bits = 64
      val numBands = 4
      val bandBits = bits / numBands
      val threshold = 10
      // half the corpus are perturbed copies of earlier rows so real
      // near-dups exist at assorted distances
      val base = Array.fill(n / 2)(Array.fill(bits)(rnd.nextBoolean()))
      val fps: Seq[(Long, String)] = (0 until n).map { i =>
        val src = base(i % base.length).clone()
        if (i >= base.length) {
          val flips = rnd.nextInt(8)
          (0 until flips).foreach(_ => { val p = rnd.nextInt(bits); src(p) = !src(p) })
        }
        i.toLong -> src.map(if (_) '1' else '0').mkString
      }
      val expected = (for {
        (ia, fa) <- fps; (ib, fb) <- fps
        if ia < ib
        if (0 until numBands).exists(b =>
          fa.substring(b * bandBits, (b + 1) * bandBits) ==
            fb.substring(b * bandBits, (b + 1) * bandBits))
        d = hamming(fa, fb)
        if d <= threshold
      } yield (ia, ib) -> d.toLong).toMap
      val got = BandedPairs.pairs(fps.toDF("doc_id", "fp"), "doc_id", "fp",
        numBands, bandBits, threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      assert(got.length == got.map(_._1).distinct.length,
        s"seed $seed: duplicate pairs emitted")
      assert(got.toMap == expected,
        s"seed $seed: pair set/distances diverge from brute force " +
          s"(got ${got.length}, expected ${expected.size})")
      // the default cap (256 > corpus) must be a strict no-op here
      assert(expected == refPairs(fps, numBands, bandBits, threshold,
        BandedPairs.DefaultBucketCap))
    }
  }

  test("mega-cluster bucket cap bounds pairs and matches the capped reference") {
    val s = spark
    import s.implicits._
    // 60 IDENTICAL fingerprints (one mega-cluster) + 10 distinct others:
    // uncapped this is C(60,2)=1770 pairs; with cap=8 each bucket keeps
    // the 8 smallest md5 ranks, so the cluster contributes C(8,2)=28 —
    // discovered, not enumerated.
    val rnd = new scala.util.Random(11L)
    val mega = Array.fill(64)(rnd.nextBoolean()).map(if (_) '1' else '0').mkString
    val fps: Seq[(Long, String)] =
      (0L until 60L).map(_ -> mega) ++
        (100L until 110L).map(i =>
          i -> Array.fill(64)(rnd.nextBoolean()).map(if (_) '1' else '0').mkString)
    val cap = 8
    val got = BandedPairs.pairs(fps.toDF("doc_id", "fp"), "doc_id", "fp",
      numBands = 4, bandBits = 16, threshold = 10, bucketCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    val expected = refPairs(fps, 4, 16, 10, cap)
    assert(got.length == got.map(_._1).distinct.length, "duplicate pairs emitted")
    assert(got.toMap == expected,
      s"capped pair set diverges (got ${got.length}, expected ${expected.size})")
    assert(expected.size < 100, s"cap failed to bound the mega-cluster: ${expected.size}")
    assert(expected.nonEmpty, "the cluster must still be discovered")
  }

  /** Brute-force reference for the PROBE join: (probe, index) matches
    * where some band's values agree AND the index member survived that
    * band's occupancy cut — probes are never capped.
    */
  private def refProbe(probes: Seq[(Long, String)], index: Seq[(Long, String)],
                       numBands: Int, bandBits: Int, threshold: Int,
                       cap: Int): Map[(Long, Long), Long] = {
    val kept = scala.collection.mutable.Set.empty[(Int, String, Long)]
    val buckets = scala.collection.mutable.Map.empty[(Int, String), List[Long]]
    for ((id, fp) <- index; b <- 0 until numBands) {
      val key = (b, fp.substring(b * bandBits, (b + 1) * bandBits))
      buckets(key) = buckets.getOrElse(key, Nil) :+ id
    }
    for (((b, band), ids) <- buckets) {
      ids.sortBy(id => (graft.operators.BandedPairs.md5Rank(id), id)).take(cap)
        .foreach(id => kept += ((b, band, id)))
    }
    val idxFp = index.toMap
    (for {
      (pid, pfp) <- probes
      (iid, ifp) <- index
      if (0 until numBands).exists(b =>
        pfp.substring(b * bandBits, (b + 1) * bandBits) ==
          ifp.substring(b * bandBits, (b + 1) * bandBits) &&
          kept((b, pfp.substring(b * bandBits, (b + 1) * bandBits), iid)))
      d = hamming(pfp, idxFp(iid))
      if d <= threshold
    } yield (pid, iid) -> d.toLong).toMap
  }

  test("probeJoin == brute-force incl. the index-side cap, each match exactly once") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(3L, 99L)) {
      val rnd = new scala.util.Random(seed)
      val bits = 64
      val numBands = 4
      val bandBits = 16
      val threshold = 10
      // index: a hot cluster of 30 identical prints + 10 distinct;
      // probes: perturbed copies of both, ids disjoint from the index
      val mega = Array.fill(bits)(rnd.nextBoolean()).map(if (_) '1' else '0').mkString
      val index: Seq[(Long, String)] =
        (0L until 30L).map(_ -> mega) ++
          (50L until 60L).map(i =>
            i -> Array.fill(bits)(rnd.nextBoolean()).map(if (_) '1' else '0').mkString)
      val probes: Seq[(Long, String)] = (0 until 20).map { i =>
        val src = index(rnd.nextInt(index.length))._2.toCharArray
        (0 until rnd.nextInt(6)).foreach { _ =>
          val p = rnd.nextInt(bits)
          src(p) = if (src(p) == '1') '0' else '1'
        }
        (1000L + i) -> new String(src)
      }
      val cap = 8
      val got = BandedPairs.probeJoin(
        probes.toDF("media_id", "fp"), "media_id",
        index.toDF("doc_id", "fp"), "doc_id", "fp",
        numBands, bandBits, threshold, bucketCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      assert(got.length == got.map(_._1).distinct.length,
        s"seed $seed: duplicate matches emitted")
      val expected = refProbe(probes, index, numBands, bandBits, threshold, cap)
      assert(got.toMap == expected,
        s"seed $seed: probe matches diverge (got ${got.length}, expected ${expected.size})")
      assert(expected.nonEmpty, s"seed $seed: perturbed probes must match the index")
    }
  }
}
