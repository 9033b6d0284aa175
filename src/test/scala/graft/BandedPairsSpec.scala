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
    }
  }
}
