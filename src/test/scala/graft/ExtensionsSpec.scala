package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface tests for the injected native functions. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)

  override def afterAll(): Unit = spark.stop()

  test("graft_dot_long is SQL-callable") {
    val r = spark.sql("SELECT graft_dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r == 32L)
  }

  test("graft_hamming is SQL-callable") {
    val r = spark.sql("SELECT graft_hamming('10101', '10001') AS h").head().getLong(0)
    assert(r == 1L)
  }

  test("graft_simhash64 returns a 64-bit string") {
    val r = spark.sql("SELECT graft_simhash64(array('a b c', 'b c d')) AS s")
      .head().getString(0)
    assert(r.length == 64 && r.forall(c => c == '0' || c == '1'))
  }

  test("graft_minhash_sig with explicit k matches SQL md5 semantics") {
    val r = spark.sql(
      """SELECT graft_minhash_sig(array('x'), 1) AS mh,
        |       array(md5('0|x')) AS expected""".stripMargin).head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
  }

  test("graft_min_k is SQL-callable as a grouped aggregate") {
    val s = spark
    import s.implicits._
    Seq((1L, 5L), (1L, 2L), (1L, 9L), (2L, 7L)).toDF("g", "v")
      .createOrReplaceTempView("mk")
    val r = spark.sql("SELECT g, graft_min_k(v, 2) AS ks FROM mk GROUP BY g ORDER BY g")
      .collect()
    assert(r(0).getSeq[Long](1) == Seq(2L, 5L))
    assert(r(1).getSeq[Long](1) == Seq(7L))
  }

  test("graft_max_k_scored is SQL-callable as a grouped aggregate") {
    val s = spark
    import s.implicits._
    Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 12L), (2L, 0.1, 13L))
      .toDF("g", "sc", "i").createOrReplaceTempView("mks")
    val r = spark.sql(
      "SELECT g, graft_max_k_scored(sc, i, 2) AS top FROM mks GROUP BY g ORDER BY g")
      .collect()
    // best-first, ties broken by smaller id
    val top1 = r(0).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(top1 == Seq((0.9, 11L), (0.9, 12L)))
    val top2 = r(1).getSeq[org.apache.spark.sql.Row](1)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(top2 == Seq((0.1, 13L)))
  }

  test("graft_heavy_hitters is SQL-callable and k-bounded") {
    val s = spark
    import s.implicits._
    (Seq.fill(10)("hot") ++ Seq("a", "b", "c", "d", "e"))
      .toDF("tok").createOrReplaceTempView("hh")
    val r = spark.sql("SELECT graft_heavy_hitters(tok, 3) AS mg FROM hh")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.size <= 3)
    assert(r.head._1 == "hot", s"dominant token must lead the summary: $r")
  }

  test("null inputs propagate null, not crash") {
    val r = spark.sql(
      "SELECT graft_dot_long(NULL, array(1L)) AS a, graft_hamming(NULL, 'x') AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("graft_shingles with a non-literal width fails with a clear contract message") {
    val s = spark
    import s.implicits._
    Seq((Array("a", "b", "c"), 2)).toDF("toks", "w").createOrReplaceTempView("shw")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingles(toks, w) FROM shw").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null && m.contains("must be a literal integer")),
      s"expected the literal-contract message, got: ${msgs(e)}")
    // literal width still works
    val ok = spark.sql("SELECT graft_shingles(array('a','b','c'), 2) AS sh").head()
    assert(ok.getSeq[String](0) == Seq("a b", "b c"))
  }
}
