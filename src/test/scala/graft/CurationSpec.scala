package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exprs
import graft.operators.{Curation, Sketches}
import graft.sources.Tables

/** C62 text normalization, C63 URL/domain curation, C64 count-min
  * sketch: correctness of the NFC kernel (incl. the JDK↔utf8proc
  * equivalence assumptions the oracle leans on), the per-host cap and
  * blocklist semantics, and the CMS error contract that is deliberately
  * NOT in the registered oracle (probabilistic ε bound, C31 convention).
  */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  private def nfcOf(input: String): String = {
    val s = spark
    import s.implicits._
    Seq(input).toDF("s").select(Exprs.nfc(col("s")).as("n"))
      .collect()(0).getString(0)
  }

  test("NFC composes combining sequences and singletons to the canonical forms") {
    // e + U+0301 -> U+00E9; A + U+030A -> U+00C5; OHM U+2126 -> U+03A9;
    // o + U+0308 -> U+00F6 — the planted set, all stability-frozen.
    assert(nfcOf("e\u0301") == "\u00E9")
    assert(nfcOf("A\u030A") == "\u00C5")
    assert(nfcOf("\u2126") == "\u03A9")
    assert(nfcOf("o\u0308") == "\u00F6")
    // already-NFC text (incl. non-ASCII and a supplementary-plane char)
    // passes through byte-identically
    val clean = "caf\u00E9 \uD83D\uDE00 plain ascii"
    assert(nfcOf(clean) == clean)
  }

  test("NFC is idempotent and matches java.text.Normalizer on mixed text") {
    val mixed = "a\u0301b\u0308 \u2126 x\uFB01 e\u0301\u0301"
    val once = nfcOf(mixed)
    assert(nfcOf(once) == once, "nfc(nfc(x)) == nfc(x)")
    assert(once ==
      java.text.Normalizer.normalize(mixed, java.text.Normalizer.Form.NFC))
  }

  test("NFC interpreted eval and whole-stage codegen agree") {
    val s = spark
    import s.implicits._
    val rows = Seq("e\u0301", "A\u030A zwsp\u200B", "plain", "\u2126\u2126")
      .toDF("s")
    val viaCodegen = rows.select(Exprs.nfc(col("s"))).collect().map(_.getString(0))
    val viaEval = rows.collect().map { r =>
      Exprs.NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
        .eval(null).toString
    }
    assert(viaCodegen.toSeq == viaEval.toSeq)
  }

  test("textNormalize strips invisibles, maps NBSP, composes, and flags changed") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.textNormalize(docs, Curation.plantedDirty).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val norm = r.getAs[String]("norm_text")
      val changed = r.getAs[Boolean]("changed")
      assert(!norm.exists(c => c == '\u200B' || c == '\uFEFF' || c == '\u00AD' || c == '\u00A0'),
        s"doc $id: invisible/NBSP survived")
      assert(java.text.Normalizer.isNormalized(norm, java.text.Normalizer.Form.NFC),
        s"doc $id: output not NFC")
      val expectChanged = id % 5 != 4
      assert(changed == expectChanged, s"doc $id: changed flag")
      (id % 5) match {
        case 0 => assert(norm.endsWith(" \u00E9"), s"doc $id: composed e-acute")
        case 1 => assert(norm.endsWith(" \u00C5 x"), s"doc $id: ring + NBSP->space")
        case 2 => assert(norm.endsWith(" \u03A9"), s"doc $id: ohm singleton")
        case 3 => assert(norm.endsWith(" \u00F6"), s"doc $id: composed o-umlaut")
        case _ => assert(r.getAs[Long]("n_raw") == r.getAs[Long]("n_norm"))
      }
    }
  }

  test("urlHostCap: no blocked hosts, at most K per host, smallest ids, correct ranks") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.urlHostCap(docs).collect()
    assert(out.nonEmpty)
    val byHost = out.groupBy(_.getAs[String]("host"))
    byHost.foreach { case (host, rows) =>
      assert(!Curation.Blocklist.contains(host), s"blocked host $host survived")
      assert(rows.length <= Curation.HostCap, s"$host over cap")
      val ranks = rows.map(_.getAs[Long]("host_rank")).sorted
      assert(ranks.toSeq == (1L to rows.length).toSeq, s"$host ranks not 1..n")
      // rank order == doc_id order (first-crawled-wins)
      val byRank = rows.sortBy(_.getAs[Long]("host_rank")).map(_.getAs[Long]("doc_id"))
      assert(byRank.toSeq == byRank.sorted.toSeq, s"$host rank/doc_id order")
    }
    // the kept ids per host are exactly the K smallest of that host's docs
    val all = docs.select(col("doc_id"),
        regexp_extract(Curation.plantedUrl, "^https://([^/]+)/", 1).as("host"))
      .collect().groupBy(_.getAs[String]("host"))
    byHost.foreach { case (host, rows) =>
      val expect = all(host).map(_.getAs[Long]("doc_id")).sorted.take(Curation.HostCap)
      assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == expect.toSeq,
        s"$host: kept set is not the K smallest")
    }
  }

  test("CMS never underestimates and lands within the e/w * N envelope") {
    val docs = Tables.documents(spark, sf)
    val out = Sketches.cmsTopkTokens(docs).collect()
    assert(out.length > 0 && out.length <= 20)
    out.foreach { r =>
      assert(r.getAs[Boolean]("cms_ge_exact"),
        s"token ${r.getAs[String]("token")}: CMS underestimated (impossible)")
      assert(r.getAs[Boolean]("cms_within_eps"),
        s"token ${r.getAs[String]("token")}: CMS above the eps envelope")
    }
  }

  test("streaming twin: dirty docs normalize statelessly, batch == stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // planted dirt rides on text, so synthesize from (doc_id, text) rows
    val dirty = Tables.documents(spark, sf)
      .select(col("doc_id"), Curation.plantedDirty.as("text")).limit(6)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (b1, b2) = dirty.splitAt(3)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // append mode, NO watermark, NO foreachBatch: stateless projection
    val q = graft.streaming.EventStream.streamingTextNormalize(
      in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("norm_stream").outputMode("append").start()
    in.addData(b1.toSeq); q.processAllAvailable()
    in.addData(b2.toSeq); q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM norm_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    q.stop()
    val batch = Curation.textNormalize(
      dirty.toSeq.toDF("doc_id", "text"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(streamed == batch, "streamed normalization must equal the batch operator")
  }

  test("composition: normalized text feeds the exact-dedup fingerprint (the C1 consumer)") {
    val s = spark
    import s.implicits._
    // two encodings of the same logical doc: decomposed+littered vs clean NFC
    val pairs = Seq(
      (1L, "caf" + "e\u0301" + "\u200B" + " menu"),
      (2L, "caf\u00E9 menu"))
      .toDF("doc_id", "text")
    val norm = Curation.textNormalize(pairs, col("text"))
      .select(col("doc_id"), col("norm_text").as("text"))
    val fps = norm.select(md5(col("text")).as("fp")).distinct().count()
    assert(fps == 1L, "normalization must make the two encodings fingerprint together")
  }

  test("CMS probes are the exact top-K by (count desc, token asc)") {
    val docs = Tables.documents(spark, sf)
    val got = Sketches.cmsTopkTokens(docs)
      .select("token", "exact_cnt").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("NFKC fold: homoglyph spam, fullwidth, ligatures, superscripts collapse; idempotent") {
    val s2 = spark
    import s2.implicits._
    // "p<cyrillic a>ypal" must fold to plain "paypal"; fullwidth/ligature/
    // superscript variants fold via NFKC compatibility decomposition
    val rows = Seq(
      ("p\u0430ypal", "paypal"),               // Cyrillic a -> Latin a
      ("\u0421\u041e\u0420\u0415", "COPE"), // Cyrillic C O P E -> Latin
      ("\uff21\uff22\uff23", "ABC"),          // fullwidth -> ASCII
      ("\ufb01le", "file"),                     // fi ligature
      ("x\u00b2", "x2"),                        // superscript two
      ("\u03bf\u03a1", "oP"),                  // Greek omicron + Rho
      ("plain ascii", "plain ascii"))
      .toDF("raw", "expected")
    val out = rows.select(col("expected"),
      graft.functions.Exprs.nfkcFold(col("raw")).as("folded")).collect()
    out.foreach(r => assert(r.getString(1) == r.getString(0),
      s"folded '" + r.getString(1) + "' != expected '" + r.getString(0) + "'"))
    // idempotence: folding a folded key changes nothing
    val twice = rows.select(graft.functions.Exprs.nfkcFold(
      graft.functions.Exprs.nfkcFold(col("raw"))).as("f2")).collect().map(_.getString(0))
    assert(twice.toSeq == out.map(_.getString(1)).toSeq)
  }

  test("NFKC fold keys make evasive homoglyph duplicates C1-fingerprint together") {
    val s2 = spark
    import s2.implicits._
    import graft.operators.Curation
    // two spellings of the same spam: pure Latin vs Cyrillic-substituted
    val docs = Seq(
      (1L, "buy cheap meds at paypal dot com now"),
      (2L, "buy cheap meds at p\u0430yp\u0430l dot com now"),
      (3L, "a genuinely different document entirely"))
      .toDF("doc_id", "text")
    val keys = Curation.nfkcFoldKeys(docs, col("text"))
    // C1 exact dedup over the FOLD KEY catches the evasion
    val fp = keys.select(col("doc_id"), md5(col("fold_key")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L), "homoglyph twin must fingerprint with its Latin original")
    assert(fp(1L) != fp(3L))
    // while plain NFC (C62) does NOT catch it - the reason C62b exists
    val nfcKeys = Curation.textNormalize(docs, col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(nfcKeys(1L) != nfcKeys(2L),
      "sanity: NFC alone must NOT equate the homoglyph spellings")
    // and the fold stays a shuffle-free scan projection
    val plan = Curation.nfkcFoldKeys(docs, col("text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("host split: every page of a host lands in ONE split; carve near 240/8/8; no shuffle") {
    val docs = Tables.documents(spark, sf)
    val rows = Curation.hostSplit(docs).collect()
      .map(r => (r.getString(1), r.getString(3))) // (host, split)
    // the leakage guarantee: split is constant per host
    rows.groupBy(_._1).foreach { case (h, rs) =>
      assert(rs.map(_._2).distinct.length == 1,
        s"host $h straddles splits: ${rs.map(_._2).distinct.toSeq} — the eval leak this operator kills")
    }
    // all three splits materialize over the synthetic host population
    assert(rows.map(_._2).distinct.toSet == Set("train", "val", "test"))
    // and the projection is scan-shaped (zero Exchange)
    val plan = Curation.hostSplit(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "host split must stay a shuffle-free projection")
  }

  private def fixOf(input: String): String = {
    val s = spark
    import s.implicits._
    Seq(input).toDF("s").select(Exprs.fixMojibake(col("s")).as("f"))
      .collect()(0).getString(0)
  }

  test("mojibake repair: single and double misdecodes reverse; guards never false-fire") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val clean = "café naïve jalapeño über text"
    val moji1 = new String(clean.getBytes(UTF_8), ISO_8859_1)
    val moji2 = new String(moji1.getBytes(UTF_8), ISO_8859_1)
    assert(moji1 != clean && moji2 != moji1)
    assert(fixOf(moji1) == clean, "single misdecode reverses")
    assert(fixOf(moji2) == clean, "double misdecode reverses via iteration")
    // the no-false-repair guard, both directions:
    assert(fixOf(clean) == clean,
      "genuine Latin-1 text re-encodes to invalid UTF-8 and stays untouched")
    assert(fixOf("plain ascii only") == "plain ascii only")
    val cjk = "日本語 text 😀"
    assert(fixOf(cjk) == cjk, "chars beyond Latin-1 stop the heuristic")
    assert(fixOf("") == "")
    // idempotent on its own output
    assert(fixOf(fixOf(moji2)) == clean)
  }

  test("mojibake repair: interpreted eval and whole-stage codegen agree") {
    val s = spark
    import s.implicits._
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val clean = "résumés"
    val moji = new String(clean.getBytes(UTF_8), ISO_8859_1)
    val df = Seq(moji, clean, "ascii").toDF("s")
      .select(Exprs.fixMojibake(col("s")).as("f"))
    val on = df.collect().map(_.getString(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = df.collect().map(_.getString(0)).toSeq
      assert(on == off)
      assert(on == Seq(clean, clean, "ascii"))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("q_mojibake_repair: corrupted docs flagged+changed, clean docs untouched, repair restores the planted clean text") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.mojibakeRepair(docs, Curation.plantedMoji).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(out.nonEmpty)
    val expectedMd5 = docs.select(col("doc_id"),
        md5(concat(col("text"), lit(Curation.MojiClean))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, nMoji, fixedMd5, changed) =>
      assert(changed == (id % 3 == 0), s"doc $id: changed must mark exactly the corrupted docs")
      assert((nMoji > 0) == (id % 3 == 0), s"doc $id: detection count must fire iff corrupted")
      assert(fixedMd5 == expectedMd5(id), s"doc $id: repair must restore the planted clean text")
    }
    // scan-shaped: zero Exchange
    val plan = Curation.mojibakeRepair(docs, Curation.plantedMoji)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "mojibake repair must stay a shuffle-free projection")
  }

  test("codeFenceExtract: a fence segment with no newline (unterminated ``` at EOF, bare ```lang) has an EMPTY body, not a double-counted tag") {
    val s = spark
    import s.implicits._
    val fence = "`" * 3
    val md = Seq(
      // fence 1: normal; fence 2: ```lang then EOF (no newline in segment)
      (1L, s"intro\n${fence}py\nx = 1\n$fence\ntext $fence" + "rust"),
      // single unterminated bare fence at EOF — segment is "" (no \n)
      (2L, s"prose $fence"),
      // ```lang\n with empty body — newline present, body after it is ""
      (3L, s"$fence" + "go\n" + s"$fence trailing"))
      .toDF("doc_id", "text")
    val out = Curation.codeFenceExtract(md, col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 1L, "py", 1L, 6L),      // "x = 1\n": one non-empty line, 6 chars
      (1L, 2L, "rust", 0L, 0L),    // unterminated: tag kept, body EMPTY
      (2L, 1L, "", 0L, 0L),        // bare ``` at EOF: no tag, no body
      (3L, 1L, "go", 0L, 0L)),     // ```go\n``` : empty body via the \n branch
      s"fence grammar on degenerate segments: $out")
  }

  test("scriptMix: planted counts match a JVM recomputation; the router hits every branch (C111)") {
    val docs = Tables.documents(spark, sf)
    // recompute expectations in the JVM from the same planted text \u2014
    // pins Spark regexp_count to java.util.regex semantics row by row
    val planted = docs
      .select(col("doc_id"), Curation.plantedMultiscript.as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def cnt(s: String, re: String): Long = re.r.findAllMatchIn(s).length.toLong
    val out = Curation.scriptMix(docs, Curation.plantedMultiscript).collect()
    assert(out.length == planted.size && out.nonEmpty)
    var seen = Set.empty[String]
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val t = planted(id)
      assert(r.getAs[Long]("n_latin") == cnt(t, "[A-Za-z]"), s"doc $id latin")
      assert(r.getAs[Long]("n_cyr") == cnt(t, "[\u0400-\u04FF]"), s"doc $id cyr")
      assert(r.getAs[Long]("n_greek") == cnt(t, "[\u0370-\u03FF]"), s"doc $id greek")
      assert(r.getAs[Long]("n_cjk") == cnt(t, "[\u4E00-\u9FFF]"), s"doc $id cjk")
      assert(r.getAs[Long]("n_confusable") ==
        cnt(t, "[A-Za-z][\u0400-\u04FF]|[\u0400-\u04FF][A-Za-z]"),
        s"doc $id confusable")
      val route = r.getAs[String]("route")
      if (id % 12 == 5)
        assert(r.getAs[Long]("n_latin") == 0L && route == "cyrillic",
          s"doc $id: the replaced doc must route to its own script")
      else if (id % 6 == 0)
        assert(route == "review", s"doc $id: confusable must route to review")
      else if (id % 4 == 3)
        assert(route == "latin", s"doc $id: unsuffixed doc routes latin")
      else
        assert(route == "multi" && r.getAs[Long]("n_scripts") >= 2L,
          s"doc $id: honest mixed-script doc routes multi")
      seen += route
    }
    assert(Set("latin", "cyrillic", "multi", "review").subsetOf(seen),
      s"every router branch must carry rows: $seen")
  }
}
