package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir
import graft.sources.Tables

/** C65 q_dsir_weights — hashed-ngram importance weighting (DSIR). */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  val sf = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def hexVal(h: String, n: Int): Long =
    h.take(n).foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))

  private def bucket(feat: String): Int =
    (hexVal(md5Hex(s"ds_$feat"), 8) % Dsir.NumBuckets).toInt

  private def feats(text: String): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString("_"))
  }

  test("lrTable is the exact BigInt Laplace-smoothed ratio of hashed-bucket counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "src0"),
      (2L, "alpha beta", "src0"),
      (3L, "delta epsilon zeta eta", "src1"),
      (4L, "alpha delta", "src2"))
      .toDF("doc_id", "text", "source")
    val lr = Dsir.lrTable(docs)
    assert(lr.length == Dsir.NumBuckets)
    // independent recompute: local md5 bucketing + BigInt arithmetic
    val all = docs.collect().map(r => (r.getString(1), r.getString(2)))
    val rawCounts = all.flatMap(d => feats(d._1)).groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val tgtCounts = all.filter(_._2 == Dsir.TargetSource)
      .flatMap(d => feats(d._1)).groupBy(bucket).view.mapValues(_.length.toLong).toMap
    val nr = BigInt(rawCounts.values.sum); val nt = BigInt(tgtCounts.values.sum)
    val b = BigInt(Dsir.NumBuckets)
    (0 until Dsir.NumBuckets).foreach { k =>
      val expected =
        if (!rawCounts.contains(k)) 0L
        else ((BigInt(Dsir.Scale) * (BigInt(tgtCounts.getOrElse(k, 0L)) + 1) * (nr + b)) /
          ((BigInt(rawCounts(k)) + 1) * (nt + b))).toLong
      assert(lr(k) == expected, s"bucket $k: lr=${lr(k)} expected=$expected")
    }
  }

  test("distribution matching: target-vocabulary docs outweigh off-distribution docs") {
    import spark.implicits._
    // target slice speaks vocab A; the raw pool holds A-docs and B-docs
    val aText = "the quick brown fox jumps over the lazy dog again and again"
    val bText = "zzq xkcd qwop vvrm plgh wubz jfkl mnop qrst uvwx yzab cdef"
    val docs = ((1L to 20L).map(i => (i, aText, "src0")) ++
      (21L to 40L).map(i => (i, aText, "src5")) ++
      (41L to 60L).map(i => (i, bText, "src6")))
      .toDF("doc_id", "text", "source")
    val w = Dsir.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    val aMin = (1L to 40L).map(w(_)._1).min
    val bMax = (41L to 60L).map(w(_)._1).max
    assert(aMin > bMax,
      s"every target-vocab doc must outweigh every off-distribution doc ($aMin <= $bMax)")
    // the keep gate selects exactly the target-like docs here
    assert((1L to 40L).forall(w(_)._2), "target-vocab docs must pass the keep gate")
    assert((41L to 60L).forall(!w(_)._2), "off-distribution docs must be dropped")
  }

  test("dsir_fp is the exact per-feature ratio sum and keep the floor-mean gate") {
    val docs = Tables.documents(spark, sf)
    val lr = Dsir.lrTable(docs)
    val rows = Dsir.dsirWeights(docs)
      .join(docs.select("doc_id", "text"), Seq("doc_id")).collect()
    assert(rows.nonEmpty)
    val weights = rows.map { r =>
      val fs = feats(r.getAs[String]("text"))
      val expected = fs.map(f => lr(bucket(f))).sum
      assert(r.getAs[Long]("n_feats") == fs.size.toLong)
      assert(r.getAs[Long]("dsir_fp") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[Long]("dsir_fp")} != $expected")
      r.getAs[Long]("dsir_fp")
    }
    val floorMean = weights.sum / weights.length
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("dsir_fp") >= floorMean))
    }
  }

  test("resample draws proportionally: target-vocab docs sampled, off-distribution not") {
    import spark.implicits._
    val aText = "the quick brown fox jumps over the lazy dog again and again"
    val bText = "zzq xkcd qwop vvrm plgh wubz jfkl mnop qrst uvwx yzab cdef"
    val docs = ((1L to 40L).map(i => (i, aText, if (i <= 20) "src0" else "src5")) ++
      (41L to 60L).map(i => (i, bText, "src6")))
      .toDF("doc_id", "text", "source")
    val r = Dsir.dsirResample(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    // every A doc shares one avg weight = the global max -> p = 1: all drawn
    assert((1L to 40L).forall(r(_)._2), "max-weight docs draw with probability 1")
    // B docs draw at p = avgB/avgA; recompute the exact integer rule per doc
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    val maxAvg = r.values.map(_._1).max
    (41L to 60L).foreach { id =>
      val u = hexVal(md5Hex(s"rs_$id"), 8) % Dsir.Scale
      assert(r(id)._2 == (u * maxAvg < r(id)._1 * Dsir.Scale),
        s"doc $id: draw must be the exact integer rule")
    }
    // and the off-distribution band is mostly rejected (p ~ avgB/avgA << 1)
    val bDrawn = (41L to 60L).count(r(_)._2)
    assert(bDrawn < 10, s"off-distribution docs should mostly be rejected, got $bDrawn/20")
  }

  test("committed ratio table round-trips: loadLr(commit(lr)) == lr, scores unchanged") {
    val docs = Tables.documents(spark, sf)
    val lr = Dsir.lrTable(docs)
    val path = java.nio.file.Files.createTempDirectory("graft-dsir-model").toString
    Dsir.commit(spark, lr, path)
    val loaded = Dsir.loadLr(spark, path)
    assert(loaded.toSeq == lr.toSeq, "the committed model must round-trip bit-for-bit")
    // a retrain commits atomically over it — latest version wins
    val bumped = lr.map(_ + 1L)
    Dsir.commit(spark, bumped, path, buildV = 1L)
    assert(Dsir.loadLr(spark, path).toSeq == bumped.toSeq)
  }

  test("drift monitor: identical snapshots read zero, a planted vocab shift lights up") {
    import spark.implicits._
    val base = (1L to 50L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    // identical distributions -> every bucket's drift is exactly 0
    val zero = Dsir.driftBetween(base, base).agg(max("drift_fp")).head().getLong(0)
    assert(zero == 0L, "identical snapshots must show zero drift in every bucket")
    // snapshot B swaps in a disjoint vocabulary -> mass moves between buckets
    val shifted = (1L to 50L).map(i => (i, "zzq xkcd qwop vvrm plgh wubz jfkl mnop"))
      .toDF("doc_id", "text")
    val d = Dsir.driftBetween(base, shifted)
    val total = d.agg(sum("drift_fp")).head().getLong(0)
    // the summed L1 of two disjoint distributions is 2.0 before
    // bucketing; 64-bucket collisions merge some mass (measured ~1.41),
    // but anything past 1.0 is unambiguous "retrain" territory versus
    // the exact 0 of identical snapshots
    assert(total > Dsir.ShareScale,
      s"disjoint vocabularies must show large drift, got $total")
    // and the exact-share recompute holds per bucket
    val rows = d.collect()
    val (nA, nB) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    rows.foreach { r =>
      assert(r.getLong(3) == (BigInt(Dsir.ShareScale) * r.getLong(1) / nA).toLong)
      assert(r.getLong(4) == (BigInt(Dsir.ShareScale) * r.getLong(2) / nB).toLong)
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)))
    }
  }

  test("scoreAgainst stays a zero-shuffle scan projection (no Exchange in the plan)") {
    val docs = Tables.documents(spark, sf)
    val plan = Dsir.scoreAgainst(docs, Dsir.lrTable(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must ride the scan:\n$plan")
  }
}
