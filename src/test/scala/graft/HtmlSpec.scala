package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Html, TextOps}
import graft.sources.Tables

class HtmlSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("planted corpus round-trips: content survives exactly, boilerplate vanishes") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = Html.htmlExtract(docs, Html.plantedHtml)
      .join(docs, "doc_id")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val clean = r.getAs[String]("clean_text")
      val orig = r.getAs[String]("text")
      val expected = if (id % 3 == 0) s"$orig See reference" else orig
      assert(clean == expected, s"doc $id: extraction must preserve content verbatim")
      assert(!clean.contains("Home") || orig.contains("Home"),
        s"doc $id: nav boilerplate leaked")
      assert(!clean.contains("track()"), s"doc $id: script leaked")
      assert(!clean.contains("margin"), s"doc $id: style leaked")
      assert(r.getAs[Long]("n_kept") == 1L, s"doc $id: exactly the main block is content")
      assert(r.getAs[Long]("n_dropped") == 2L, s"doc $id: nav + footer are boilerplate")
    }
  }

  test("adversarial markup: multiline scripts, tags inside script strings, attr-heavy anchors") {
    val s = spark
    import s.implicits._
    val page =
      """<html><head><title>t</title></head><body>
        |<div class="c">real content words here</div>
        |<div id="n"><a class="x" href="/a" rel="nofollow">L1</a> <a href="/b">L2</a></div>
        |<div>more prose <script>
        |var s = "<div>not a block</div>";
        |if (a < b) { run(); }
        |</script>after the script</div>
        |</body></html>""".stripMargin
    val out = Html.htmlExtract(
      Seq((1L, page)).toDF("doc_id", "html"), col("html")).collect()(0)
    val clean = out.getAs[String]("clean_text")
    assert(clean.contains("real content words here"))
    assert(clean.contains("more prose") && clean.contains("after the script"))
    assert(!clean.contains("not a block") && !clean.contains("run()"),
      s"script content leaked: $clean")
    assert(!clean.contains("L1"), s"link-only block kept: $clean")
  }

  test("streaming twin: markup pages stream through extraction statelessly, batch == stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val s = spark
    val pages = Tables.documents(spark, sf).select("doc_id", "text").limit(6)
      .select(col("doc_id"), graft.operators.Html.plantedHtml.as("html"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = pages.splitAt(3)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // append mode with NO watermark and NO foreachBatch: the extractor
    // must be a stateless projection for this to even start
    val q = graft.streaming.EventStream.streamingHtmlExtract(
      in.toDF().toDF("doc_id", "html"))
      .writeStream.format("memory").queryName("html_stream").outputMode("append").start()
    in.addData(b1.toSeq); q.processAllAvailable()
    in.addData(b2.toSeq); q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM html_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    q.stop()
    val batch = graft.operators.Html.htmlExtract(
      pages.toSeq.toDF("doc_id", "html"), col("html")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch, "streamed extraction must equal the batch operator row-for-row")
  }

  test("composition: extracted text feeds qualityRules directly (the C23 consumer)") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val extracted = Html.htmlExtract(docs, Html.plantedHtml)
      .select(col("doc_id"), col("clean_text").as("text"))
    val judged = TextOps.qualityRules(extracted)
    // the planted pages carry the real corpus text, so extraction must
    // hand qualityRules documents it still accepts
    val total = judged.count()
    val kept = judged.filter(col("keep")).count()
    assert(total == docs.count(), "every doc must be judged")
    assert(kept > total / 2, s"extraction must not garble content: $kept/$total kept")
  }
}
