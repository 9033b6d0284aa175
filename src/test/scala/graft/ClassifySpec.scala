package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify
import graft.sources.Tables

class ClassifySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("score is the exact weight-sum of unigram+bigram features (direct recompute)") {
    val docs = Tables.documents(spark, sf)
    val scored = Classify.qualityClassifier(docs)
      .join(docs.select("doc_id", "text"), Seq("doc_id"))
      .limit(64).collect()
    assert(scored.length == 64)
    // independent recompute: local md5, not the production helper
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    def hexVal(h: String, n: Int): Long =
      h.take(n).foldLeft(0L)((acc, c) => acc * 16 + "0123456789abcdef".indexOf(c))
    def weight(feat: String): Long = {
      val bucket = hexVal(md5Hex(s"tk_$feat"), 8) % Classify.NumBuckets
      hexVal(md5Hex(s"wb_$bucket"), 8) % 2001 - 1000
    }
    scored.foreach { r =>
      val toks = r.getAs[String]("text").split(" ", -1).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString("_"))
      assert(r.getAs[Long]("n_features") == feats.size.toLong)
      val expected = feats.map(weight).sum
      assert(r.getAs[Long]("score") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: score ${r.getAs[Long]("score")} != $expected")
      assert(r.getAs[Boolean]("keep") == (expected > 0))
    }
  }

  test("classifier plan is shuffle-free: the score rides the scan") {
    val plan = Classify.qualityClassifier(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier must not shuffle:\n$plan")
  }

  test("lm bigram score: exact recompute from corpus counts, avg bounded by the scale") {
    val docs = Tables.documents(spark, sf)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // independent corpus counts
    def bigrams(t: String): Seq[(String, String)] =
      t.split(" ", -1).toSeq.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
    val all = texts.values.flatMap(bigrams).toSeq
    val cb = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cw = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = graft.operators.Classify.lmBigramScore(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size == texts.size)
    texts.foreach { case (id, t) =>
      val bgs = bigrams(t)
      val score = bgs.map(b => 1000000L * cb(b) / cw(b._1)).sum
      val (n, s, a) = got(id)
      assert(n == bgs.size.toLong, s"doc $id n_bigrams")
      assert(s == score, s"doc $id: score $s != $score")
      assert(a == (if (bgs.nonEmpty) score / bgs.size else 0L))
      assert(a <= 1000000L, "mean per-bigram probability cannot exceed 1.0 fixed-point")
    }
  }

  test("scores discriminate: both keep and drop classes are populated") {
    val byKeep = Classify.qualityClassifier(Tables.documents(spark, sf))
      .groupBy("keep").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byKeep.getOrElse(true, 0L) > 0, "no kept docs — degenerate scores")
    assert(byKeep.getOrElse(false, 0L) > 0, "no dropped docs — degenerate scores")
  }
}
