package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionOut}

/** Structured Streaming tests driven through MemoryStream micro-batches. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Long): Timestamp = new Timestamp(minute * 60000L)

  test("streaming upsert sink merges micro-batches into a latest-wins parquet target") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-upsert").toString
    val in = MemoryStream[Event]
    val q = EventStream.streamingUpsertSink(
      in.toDF(), s"$dir/target", keys = Seq("user_id"), versionCol = "event_id",
      checkpoint = s"$dir/ckpt")
    // batch 1: two users, user 1 updated twice WITHIN the batch
    in.addData(
      Event(1, ts(1), 1, "signup", 1.0),
      Event(3, ts(3), 1, "click", 3.0),
      Event(2, ts(2), 2, "signup", 2.0))
    q.processAllAvailable()
    // batch 2: user 2 updated, user 3 new — user 1 untouched
    in.addData(
      Event(5, ts(5), 2, "click", 5.0),
      Event(4, ts(4), 3, "signup", 4.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/target")
      .select("user_id", "event_id", "event_type").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out == Map(
      1L -> ((3L, "click")),   // within-batch latest won
      2L -> ((5L, "click")),   // cross-batch upsert won
      3L -> ((4L, "signup"))), // insert path
      s"unexpected target contents: $out")
  }

  test("streaming upsert sink never tears rows tied on (key, version)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-tie").toString
    val in = MemoryStream[Event]
    val q = EventStream.streamingUpsertSink(
      in.toDF(), s"$dir/target", keys = Seq("user_id"), versionCol = "event_id",
      checkpoint = s"$dir/ckpt")
    // two rows share (user_id=1, event_id=7) in ONE batch with different
    // payloads: the merged row must be one of the two source rows whole,
    // never event_type from one and value from the other.
    in.addData(
      Event(7, ts(1), 1, "click", 1.0),
      Event(7, ts(2), 1, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val r = spark.read.parquet(s"$dir/target")
      .select("event_type", "value").collect().map(x => (x.getString(0), x.getDouble(1)))
    assert(r.length == 1)
    assert(r.head == ("click", 1.0) || r.head == ("view", 2.0),
      s"torn row: ${r.head} mixes the two tied source rows")
  }

  test("windowed counts aggregate per hour window and event type") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(65), 1, "click", 3.0),
      Event(4, ts(8), 2, "view", 4.0))
    val q = EventStream.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM wc ORDER BY window_start, event_type").collect()
    q.stop()
    assert(rows.length == 3) // (h0,click)=2, (h0,view)=1, (h1,click)=1
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L))
  }

  test("file source: windowedCounts runs over parquet files landing in a directory") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    // first file lands before the query starts
    Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(8), 2, "view", 4.0))
      .toDF().write.mode("append").parquet(s"$dir/in")
    val src = EventStream.eventFileSource(spark, s"$dir/in", maxFilesPerTrigger = 1)
    assert(src.isStreaming, "file source must be a streaming frame")
    val q = EventStream.windowedCounts(src)
      .writeStream.format("memory").queryName("wc_file").outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    // a second file lands while the query runs: discovered incrementally
    Seq(Event(4, ts(65), 1, "click", 3.0))
      .toDF().write.mode("append").parquet(s"$dir/in")
    q.processAllAvailable()
    val rows = spark.sql("SELECT * FROM wc_file ORDER BY window_start, event_type").collect()
    q.stop()
    assert(rows.length == 3) // (h0,click)=2, (h0,view)=1, (h1,click)=1
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 1L, 1L))
  }

  test("streaming dedup drops same-fingerprint docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String)]
    val q = EventStream.streamingDedup(
      in.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    in.addData((ts(1), "hello world"), (ts(2), "hello world"), (ts(3), "other"))
    q.processAllAvailable()
    in.addData((ts(4), "hello world"), (ts(5), "third"))
    q.processAllAvailable()
    val texts = spark.sql("SELECT text FROM dd").collect().map(_.getString(0)).sorted
    q.stop()
    assert(texts.toSeq == Seq("hello world", "other", "third"))
  }

  test("streaming heavy hitters: cumulative bounded summary across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val q = EventStream.streamingHeavyHitters(in.toDF().toDF("text"), k = 4)
      .writeStream.format("memory").queryName("shh").outputMode("complete").start()
    def summary(): Map[String, Long] =
      spark.sql("SELECT summary FROM shh").collect()(0)
        .getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch 1: "hot hot" dominates (9 of 13 bigrams)
    in.addData("hot hot hot hot hot hot hot hot hot hot", "cold calm warm mild")
    q.processAllAvailable()
    val s1 = summary()
    assert(s1.size <= 4 && s1.contains("hot hot"), s"batch-1 summary: $s1")
    // batch 2: more heat — the summary stays bounded and cumulative
    in.addData("hot hot hot hot hot hot", "quiet still")
    q.processAllAvailable()
    val s2 = summary()
    q.stop()
    assert(s2.size <= 4, s"state must stay k-bounded: $s2")
    assert(s2.contains("hot hot"), s"cumulative heavy hitter lost: $s2")
    // 14 true "hot hot" occurrences over 18 grams: estimate within N/k
    assert(s2("hot hot") <= 14L && s2("hot hot") >= 14L - 18L / 4)
  }

  test("EQUIVALENCE: streaming HLL distinct tokens == batch sketch after the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("lang", "text").as[(String, String)].collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(String, String)]
    val q = EventStream.streamingDistinctTokens(in.toDF().toDF("lang", "text"))
      .writeStream.format("memory").queryName("sdt").outputMode("complete").start()
    in.addData(b1.toIndexedSeq); q.processAllAvailable()
    in.addData(b2.toIndexedSeq); q.processAllAvailable()
    val streamed = spark.sql("SELECT lang, n_tokens, hll FROM sdt").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    val batch = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"), approx_count_distinct(col("token"), 0.05).as("hll"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // HLL register merge is max-based (order-independent): exact equality
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("EQUIVALENCE: streaming host cap under ordered arrival == batch cap; first-arrived wins across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val withHost = docs.select(col("doc_id"),
        regexp_extract(graft.operators.Curation.plantedUrl,
          "^https://([^/]+)/", 1).as("host"))
      .filter(!col("host").isin(graft.operators.Curation.Blocklist: _*))
      .as[(Long, String)].collect().sortBy(_._1)
    // one doc_id-ordered batch: the frontier rule == the batch smallest-id rule
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingHostCap(in.toDS())
      .writeStream.format("memory").queryName("shc").outputMode("append").start()
    in.addData(withHost.toIndexedSeq); q.processAllAvailable()
    val afterB1 = spark.sql("SELECT doc_id, host, host_rank FROM shc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.operators.Curation.urlHostCap(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"), r.getAs[Long]("host_rank")))
      .toSet
    assert(afterB1 == batch, "ordered-arrival streaming cap must equal the batch cap")
    // batch 2: smaller doc_ids for already-full hosts must NOT displace
    // earlier admissions (first-arrived-wins), so nothing new is emitted
    // for full hosts
    val fullHosts = afterB1.groupBy(_._2).filter(_._2.size >= graft.operators.Curation.HostCap)
      .keySet
    assert(fullHosts.nonEmpty, "test corpus must fill at least one host")
    val replays = fullHosts.take(3).map(h => (-1L, h)).toSeq
    in.addData(replays.toIndexedSeq); q.processAllAvailable()
    val afterB2 = spark.sql("SELECT doc_id, host, host_rank FROM shc").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(afterB2 == afterB1, "late arrivals must not displace admitted docs of a full host")
  }

  test("EQUIVALENCE: streaming CMS grid == batch grid bit-for-bit after the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect()
    val (b1, b2) = docs.splitAt(docs.length / 2)
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingCmsGrid(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scms").outputMode("complete").start()
    in.addData(b1.toIndexedSeq); q.processAllAvailable()
    in.addData(b2.toIndexedSeq); q.processAllAvailable()
    val streamed = spark.sql("SELECT r, b, cell_cnt FROM scms").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    // cell increments are commutative sums: exact equality, like the HLL twin
    val batch = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("token"))
      .select(explode(graft.operators.Sketches.cmsCells(col("token"), 4, 1024)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cell_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, "streaming CMS grid must equal the batch grid")
    assert(streamed.size <= 4 * 1024, "grid state must stay depth*width-bounded")
  }

  test("EQUIVALENCE: streaming quantile summaries sit inside the batch exact windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderstatus", "o_totalprice").as[(String, Double)].collect()
    val (b1, b2) = orders.splitAt(orders.length / 2)
    val in = MemoryStream[(String, Double)]
    val q = EventStream.streamingOrderQuantiles(in.toDF().toDF("o_orderstatus", "o_totalprice"))
      .writeStream.format("memory").queryName("soq").outputMode("complete").start()
    in.addData(b1.toIndexedSeq); q.processAllAvailable()
    in.addData(b2.toIndexedSeq); q.processAllAvailable()
    val streamed = spark.sql("SELECT o_orderstatus, n, ap FROM soq").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    q.stop()
    // batch-side EXACT 1%-windows around p50/p90 (the same hard rank
    // bound the batch oracle uses)
    def exact(qq: Double) = expr(s"percentile_disc($qq) WITHIN GROUP (ORDER BY o_totalprice)")
    val windows = graft.sources.Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        exact(0.49).as("p50_lo"), exact(0.51).as("p50_hi"),
        exact(0.89).as("p90_lo"), exact(0.91).as("p90_hi"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(streamed.keySet == windows.keySet)
    windows.foreach { case (st, (n, p50lo, p50hi, p90lo, p90hi)) =>
      val (sn, ap) = streamed(st)
      assert(sn == n, s"$st: row count $sn != $n")
      assert(ap(0) >= p50lo && ap(0) <= p50hi, s"$st: p50 ${ap(0)} outside [$p50lo,$p50hi]")
      assert(ap(1) >= p90lo && ap(1) <= p90hi, s"$st: p90 ${ap(1)} outside [$p90lo,$p90hi]")
    }
  }

  test("EQUIVALENCE: stateless chunking runs unchanged on a stream == batch chunking") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // chunkDocs is pure map-side (sequence+slice explode, no window, no
    // agg), so the SAME operator body runs on a streaming frame with no
    // state, no watermark, append mode — the property that lets batch
    // curation code be reused for streaming ingest.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.TextOps.chunkDocs(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("chunks_eq").outputMode("append").start()
    docs.grouped(docs.length / 3 + 1).foreach(b => in.addData(b.toSeq))
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT doc_id, chunk_idx, chunk_text FROM chunks_eq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    q.stop()
    val batch = graft.operators.TextOps.chunkDocs(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .select("doc_id", "chunk_idx", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(batch.nonEmpty && streamed == batch,
      s"streamed ${streamed.size} chunks vs batch ${batch.size}")
  }

  test("stream-stream interval join: purchases match trailing-window clicks, outside-window clicks don't") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventStream.clickPurchaseJoin(
      clicks.toDF(), purchases.toDF(), windowSec = 3600L)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // user 1: click at t=10min and t=100min; purchase at t=65min
    //   -> only the t=10min click is within the trailing hour
    // user 2: click at t=5min, no purchase
    clicks.addData(
      Event(11, ts(10), 1, "click", 0),
      Event(12, ts(100), 1, "click", 0),
      Event(21, ts(5), 2, "click", 0))
    purchases.addData(Event(91, ts(65), 1, "purchase", 9.99))
    q.processAllAvailable()
    val rows = spark.sql("SELECT purchase_id, click_id FROM attrib").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(rows == Set((91L, 11L)),
      s"expected purchase 91 matched only to click 11, got $rows")
  }

  test("EQUIVALENCE: stream-stream interval join == batch interval join on real sf0.001 events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (EventStream.tsMicros(e.ts), e.event_id))
    val clickEvents = events.filter(_.event_type == "click")
    val purchaseEvents = events.filter(_.event_type == "purchase")
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = EventStream.clickPurchaseJoin(clicks.toDF(), purchases.toDF(), windowSec = 3600L)
      .writeStream.format("memory").queryName("attrib_eq").outputMode("append").start()
    // two micro-batches per side, in event-time order
    clickEvents.grouped(clickEvents.length / 2 + 1).foreach(c => clicks.addData(c.toSeq))
    purchaseEvents.grouped(purchaseEvents.length / 2 + 1).foreach(c => purchases.addData(c.toSeq))
    q.processAllAvailable()
    val streamed = spark.sql("SELECT purchase_id, click_id FROM attrib_eq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    q.stop()
    // batch twin: same join condition on static frames
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("purchase_id"))
      .join(ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("click_id")),
        col("pu") === col("cu") && col("cts") <= col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 3600 SECOND"))
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(batch.nonEmpty, "fixture should produce at least one attribution pair")
    assert(streamed == batch, s"streamed ${streamed.size} pairs vs batch ${batch.size}")
  }

  test("stateful sessionization: session spanning micro-batches is not split") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStream(in.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // batch 1: two events 5 min apart (one open session)
    in.addData(Event(1, ts(0), 7, "click", 0), Event(2, ts(5), 7, "click", 0))
    q.processAllAvailable()
    // batch 2: continuation at +10 min (same session), then a 60-min gap
    in.addData(Event(3, ts(15), 7, "click", 0), Event(4, ts(75), 7, "click", 0))
    q.processAllAvailable()
    val closed = spark.sql("SELECT * FROM sess").as[SessionOut].collect()
    q.stop()
    // exactly one closed session: events 1-3 (15 min duration), session 4 still open
    assert(closed.length == 1)
    assert(closed.head.n_events == 3)
    assert(closed.head.duration_us == 15L * 60 * 1000000)
    assert(closed.head.session_id == 1)
  }

  test("watermarked sessionize: idle session closes via event-time timeout, state evicted") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStreamWatermarked(in.toDS(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_to").outputMode("append").start()
    // user 7: two events, then silence — nobody ever sends a closing
    // event (fixture starts at t=100min: epoch-0 events fall on the
    // initial watermark boundary and get late-filtered)
    in.addData(Event(1, ts(100), 7, "click", 0), Event(2, ts(105), 7, "click", 0))
    q.processAllAvailable()
    assert(spark.sql("SELECT * FROM sess_to").count() == 0) // still open
    // another user's much-later event advances the watermark far past
    // user 7's last event + 30-min gap -> the timeout must close it
    in.addData(Event(3, ts(700), 8, "click", 0))
    q.processAllAvailable()
    in.addData(Event(4, ts(710), 8, "click", 0)) // one more batch so timeouts fire
    q.processAllAvailable()
    val closed = spark.sql("SELECT * FROM sess_to").as[SessionOut].collect()
    q.stop()
    assert(closed.exists(o => o.user_id == 7 && o.n_events == 2 &&
      o.duration_us == 5L * 60 * 1000000),
      s"user 7's idle session should have closed by timeout, got ${closed.toSeq}")
  }

  test("streaming ANN: arriving query vectors score against the static LSH index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // take two real vectors as "arriving" queries — self-match guaranteed
    val probe = corpus.limit(2).collect()
      .map(r => (r.getLong(0) + 10000L, r.getSeq[Float](1)))
    val in = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.streamingAnnCandidates(
      in.toDF().toDF("query_id", "embedding"), corpus)
      .writeStream.format("memory").queryName("ann").outputMode("append").start()
    in.addData(probe.toSeq)
    q.processAllAvailable()
    val out = spark.sql("SELECT * FROM ann").collect()
    q.stop()
    assert(out.nonEmpty, "expected candidate scores for streamed queries")
    // each streamed copy of corpus vector v must find v itself at cos ~ 1
    probe.foreach { case (qid, _) =>
      val self = out.filter(r => r.getLong(0) == qid && r.getLong(1) == qid - 10000L)
      assert(self.nonEmpty && math.abs(self.head.getDouble(2) - 1.0) < 1e-9,
        s"query $qid should self-match at cosine 1")
    }
  }

  test("streaming ANN top-k: each micro-batch yields the exact deduped top-k") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = corpus.limit(3).collect()
      .map(r => (r.getLong(0) + 10000L, r.getSeq[Float](1)))
    val k = 3
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.streamingAnnTopK(
      in.toDF().toDF("query_id", "embedding"), corpus, k) { (df, _) =>
      got ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }
    in.addData(probe.toSeq)
    q.processAllAvailable()
    q.stop()
    // exact expectation: the same candidate logic on a static frame,
    // deduped and ranked identically
    val staticQ = probe.toSeq.toDF("query_id", "embedding")
    val expected = EventStream.streamingAnnCandidates(staticQ, corpus)
      .dropDuplicates("query_id", "n_id")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rn") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got.toSet == expected, s"got=${got.toSet} expected=$expected")
    assert(got.map(_._1).distinct.size == probe.length)
    // rank 1 must be the self-match (identical vector, cosine 1)
    probe.foreach { case (qid, _) =>
      assert(got.exists(t => t._1 == qid && t._2 == qid - 10000L && t._3 == 1),
        s"query $qid: rank-1 should be its own corpus vector")
    }
  }

  test("streaming IVF top-k: exact per-batch answer from the trained codebook") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probe = corpus.limit(2).collect()
      .map(r => (r.getLong(0) + 20000L, r.getSeq[Float](1)))
    val k = 3
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    val in = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.streamingAnnIvfTopK(
      in.toDF().toDF("query_id", "embedding"), corpus, k) { (df, _) =>
      got ++= df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }
    in.addData(probe.toSeq)
    q.processAllAvailable()
    q.stop()
    // exact expectation: the same function applied to a static frame
    val expected = EventStream.streamingAnnIvfCandidates(
      probe.toSeq.toDF("query_id", "embedding"), corpus)
      .dropDuplicates("query_id", "n_id")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("n_id"))))
      .filter(col("rn") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got.toSet == expected, s"got=${got.toSet} expected=$expected")
    // a query identical to a corpus vector must find it at rank 1
    // (it lives in the list the query probes first)
    probe.foreach { case (qid, _) =>
      assert(got.exists(t => t._1 == qid && t._2 == qid - 20000L && t._3 == 1),
        s"query $qid: rank-1 should be its own corpus vector")
    }
  }

  test("sessionize stream keeps sub-millisecond event-time precision") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStream(in.toDS())
      .writeStream.format("memory").queryName("sess_us").outputMode("append").start()
    // two events 1500 µs apart, then a 31-minute gap closes the session
    in.addData(
      Event(1, tsUs(0), 9, "a", 0),
      Event(2, tsUs(1500), 9, "a", 0),
      Event(3, tsUs(31L * 60 * 1000000), 9, "a", 0))
    q.processAllAvailable()
    val closed = spark.sql("SELECT * FROM sess_us").as[SessionOut].collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.duration_us == 1500L,
      s"duration should keep µs precision, got ${closed.head.duration_us}")
  }

  test("EQUIVALENCE: real sf0.001 events through the watermarked stream == batch sessionize, row for row") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Real testdata (1000 events, 15 users), fed in event-time order in
    // four micro-batches — per-user ts order equals event_id order in
    // this table, so the stream's (ts, event_id) processing order and
    // the batch operator's event_id order define the same sessions.
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (EventStream.tsMicros(e.ts), e.event_id))
    val maxUs = EventStream.tsMicros(events.last.ts)
    def tsUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000); t.setNanos(((us % 1000000L) * 1000L).toInt); t
    }
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStreamWatermarked(in.toDS())
      .writeStream.format("memory").queryName("sess_eq").outputMode("append").start()
    events.grouped(events.length / 4 + 1).foreach { chunk =>
      in.addData(chunk.toSeq); q.processAllAvailable()
    }
    // sentinel user advances the watermark past every last-event + gap;
    // a second sentinel batch lets the event-time timeouts fire
    in.addData(Event(-1, tsUs(maxUs + 86400L * 1000000L), -1, "x", 0))
    q.processAllAvailable()
    in.addData(Event(-2, tsUs(maxUs + 2 * 86400L * 1000000L), -1, "x", 0))
    q.processAllAvailable()
    // the stream's session_id restarts after state eviction (documented);
    // renumber by start time per user for the ordinal the batch assigns
    val streamed = spark.sql("SELECT * FROM sess_eq").as[SessionOut].collect()
      .filter(_.user_id >= 0)
      .groupBy(_.user_id).toSeq.flatMap { case (uid, ss) =>
        ss.sortBy(_.start_us).zipWithIndex.map { case (o, i) =>
          (uid, i + 1L, o.n_events, o.duration_us)
        }
      }.sorted
    q.stop()
    val batch = operators.Reference.sessionize(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(streamed.length == batch.length,
      s"streamed ${streamed.length} sessions vs batch ${batch.length}")
    assert(streamed == batch.toSeq)
  }

  test("EQUIVALENCE: real sf0.001 documents through streaming dedup == batch exact dedup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Real documents with synthetic in-order arrival times (all inside
    // the 1-hour dedup watermark), fed in two micro-batches.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val in = MemoryStream[(Timestamp, String)]
    val q = EventStream.streamingDedup(in.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dd_eq").outputMode("append").start()
    // +1h offset: rows AT the initial watermark boundary (epoch 0) get
    // late-filtered, so keep every synthetic timestamp strictly past it
    docs.grouped(docs.length / 2 + 1).foreach { chunk =>
      in.addData(chunk.toSeq.map { case (id, text) =>
        (new Timestamp((id + 3600) * 1000L), text)
      })
      q.processAllAvailable()
    }
    val streamedKept = spark.sql("SELECT fp, text FROM dd_eq").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted
    q.stop()
    // batch twin: one keeper per fingerprint (same fp => same text, so
    // (fp, text) is the full dedup-relevant row)
    val batchKept = operators.TextOps.dedupExact(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .filter(col("doc_id") === col("keeper_id"))
      .select(col("fp"))
      .join(graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(md5(col("text")).as("fp"), col("text")).distinct(), "fp")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    assert(streamedKept.length == batchKept.length,
      s"streamed kept ${streamedKept.length} vs batch ${batchKept.length}")
    assert(streamedKept.toSeq == batchKept.toSeq)
  }

  test("batch and streaming sessionize agree on closed sessions") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // deterministic little fixture: 2 users, known gaps
    val events = Seq(
      Event(1, ts(0), 1, "a", 0), Event(2, ts(10), 1, "a", 0),
      Event(3, ts(50), 1, "a", 0), // gap 40min -> new session
      Event(4, ts(55), 1, "a", 0),
      Event(5, ts(0), 2, "b", 0), Event(6, ts(90), 2, "b", 0))
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStream(in.toDS())
      .writeStream.format("memory").queryName("sess2").outputMode("append").start()
    in.addData(events: _*)
    q.processAllAvailable()
    val streamed = spark.sql("SELECT * FROM sess2").as[SessionOut].collect()
      .map(o => (o.user_id, o.n_events, o.duration_us)).toSet
    q.stop()
    // batch operator on the same data (sessions that the stream also closed)
    val batchDf = events.toDF()
    val batch = operators.Reference.sessionize(batchDf)
      .select(col("user_id"), col("n_events"), col("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every stream-closed session must appear identically in the batch result
    assert(streamed.subsetOf(batch), s"streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty)
  }

  test("EQUIVALENCE: one-batch streaming line dedup == batch operator on sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ld").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingLineDedup(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/out", s"$dir/ckpt")
    in.addData(docs.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sorted
    val batch = operators.TextOps.lineDedup(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      "one-batch streaming line dedup must be bit-identical to the batch operator")
  }

  test("EQUIVALENCE: streaming Bloom-pruned incremental dedup == batch C26b on sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-bloom").toString
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the batch operator's internal split: doc_id%10 < 8 = historical,
    // >= 8 = delta — replay it as two micro-batches in that order
    val (hist, delta) = docs.partition(_._1 % 10 < 8)
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingDedupIncrementalBloom(
      in.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/out", s"$dir/ckpt")
    in.addData(hist.toIndexedSeq); q.processAllAvailable()
    in.addData(delta.toIndexedSeq); q.processAllAvailable()
    q.stop()
    val deltaIds = delta.map(_._1).toSet
    val streamed = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .filter(t => deltaIds.contains(t._1)).sorted
    val batch = graft.operators.Sketches.dedupIncrementalBloom(
      graft.sources.Tables.documents(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"streaming C26b diverged from batch: ${streamed.length} vs ${batch.length}")
    // batch 1 ran against an empty index: every historical row unknown
    val b1 = spark.read.parquet(s"$dir/out")
      .collect().filter(r => !deltaIds.contains(r.getLong(0)))
    assert(b1.nonEmpty && b1.forall(!_.getBoolean(2)))
    graft.GraftCache.releaseAll(spark)
  }

  test("streaming Bloom dedup: sidecar rebuilds on capacity overflow and keeps probing correctly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-bloom2").toString
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingDedupIncrementalBloom(
      in.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/out", s"$dir/ckpt")
    // batch 1 sizes the filter for ~2x its tiny cardinality; batch 2's
    // volume forces the doubling rebuild; batch 3 repeats batch-2 docs
    def sidecarMeta(): String = {
      val all = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/index/bloom.sidecar"))
      val mlen = java.nio.ByteBuffer.wrap(all, 0, 4).getInt
      new String(all, 4, mlen, "UTF-8")
    }
    in.addData((1L, "alpha"), (2L, "beta")); q.processAllAvailable()
    val metaTxt1 = sidecarMeta()
    in.addData((1000L to 2500L).map(i => (i, s"doc body number $i")).toIndexedSeq)
    q.processAllAvailable()
    val metaTxt2 = sidecarMeta()
    assert(metaTxt1 != metaTxt2, "capacity overflow must rewrite the sidecar meta")
    in.addData((3000L, "alpha"), (3001L, "doc body number 1500"), (3002L, "fresh"))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(3000L) && out(3001L), "replayed contents must be known after rebuild+merge")
    assert(!out(3002L), "fresh content stays unknown")
  }

  test("streaming upsert through VersionedTable: per-batch commits, snapshot isolation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-vt").toString
    val in = MemoryStream[(Long, String, Long)]
    val q = EventStream.streamingUpsertVersionedSink(
      in.toDF().toDF("id", "v", "ver"), s"$dir/table",
      Seq("id"), "ver", s"$dir/ckpt", numBuckets = 4)
    in.addData((1L, "a", 1L), (2L, "b", 1L), (1L, "a2", 2L)) // in-batch dup on key 1
    q.processAllAvailable()
    val v0 = graft.sources.Sinks.VersionedTable.latestManifest(spark, s"$dir/table").get._1
    in.addData((2L, "b9", 9L), (3L, "c", 1L))
    q.processAllAvailable()
    q.stop()
    val latest = graft.sources.Sinks.VersionedTable.read(spark, s"$dir/table")
      .select("id", "v", "ver").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(latest.toSeq == Seq((1L, "a2", 2L), (2L, "b9", 9L), (3L, "c", 1L)))
    // snapshot isolation: the first batch's committed version still
    // reads exactly its own state
    val snap = graft.sources.Sinks.VersionedTable.read(spark, s"$dir/table", Some(v0))
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(snap.toSeq == Seq((1L, "a2"), (2L, "b")))
  }

  test("streaming versioned sink: crash between data write and manifest publish — no torn read, replay converges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val VT = graft.sources.Sinks.VersionedTable
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-vtcrash").toString
    val in = MemoryStream[(Long, String, Long)]
    def startSink() = EventStream.streamingUpsertVersionedSink(
      in.toDF().toDF("id", "v", "ver"), s"$dir/table",
      Seq("id"), "ver", s"$dir/ckpt", numBuckets = 4)
    // batch 0 commits cleanly
    val q0 = startSink()
    in.addData((1L, "a", 1L), (2L, "b", 1L))
    q0.processAllAvailable(); q0.stop()
    val v0 = VT.latestManifest(spark, s"$dir/table").get._1
    // arm the crash: the NEXT merge dies after moving its data dirs
    // under data/ but before publishing the manifest — the exact window
    // the round-7 advice flagged for torn manifests
    VT.beforePublishHook = () => {
      VT.beforePublishHook = () => () // one-shot
      throw new RuntimeException("injected crash before publish")
    }
    try {
      val q1 = startSink()
      in.addData((2L, "b2", 2L), (3L, "c", 1L))
      intercept[Exception] { q1.processAllAvailable() }
      q1.stop()
    } finally VT.beforePublishHook = () => ()
    // the dying writer moved real bytes under data/ — but no reader may
    // see them: the table still resolves to the pre-crash version
    val (vAfterCrash, _) = VT.latestManifest(spark, s"$dir/table").get
    assert(vAfterCrash == v0, s"crash exposed version $vAfterCrash, expected $v0")
    val mid = VT.read(spark, s"$dir/table")
      .select("id", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(mid.toSeq == Seq((1L, "a"), (2L, "b")),
      s"torn write visible to readers: ${mid.toSeq}")
    // restart from the same checkpoint: the batch replays and commits
    val q2 = startSink()
    q2.processAllAvailable(); q2.stop()
    val fin = VT.read(spark, s"$dir/table")
      .select("id", "v", "ver").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(fin.toSeq == Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 1L)),
      s"replay did not converge: ${fin.toSeq}")
    // the crashed attempt's orphan dirs are invisible garbage; vacuum
    // reclaims them without touching committed data
    VT.vacuumVersioned(spark, s"$dir/table", keep = 10, minAgeMs = 0L)
    val fin2 = VT.read(spark, s"$dir/table")
      .select("id", "v", "ver").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(fin2.toSeq == fin.toSeq, "vacuum of crash orphans must not change the table")
  }

  test("EQUIVALENCE: streaming image-phash probe matches the batch probe join row for row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{BandedPairs, ImageDedup}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // committed index: the batch operator's fingerprints
    val index = ImageDedup.imagePhash(docs.limit(200)).cache()
    index.count()
    // incoming media: real PNG payloads for a different id range (shift
    // by a group multiple so pixel content matches the same groups —
    // genuine near-dups against the index)
    val incoming: Seq[(Long, Array[Byte])] =
      ImageDedup.imageCorpus(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000L).as("doc_id")))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toIndexedSeq
    val in = MemoryStream[(Long, Array[Byte])]
    val out = EventStream.streamingImagePhashMatches(
      in.toDF().toDF("media_id", "payload"), index)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("phash_stream").start()
    in.addData(incoming.take(20))
    q.processAllAvailable()
    in.addData(incoming.drop(20))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("phash_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = BandedPairs.probeJoin(
      ImageDedup.phashPayloads(incoming.toDF("media_id", "payload"), "media_id"),
      "media_id", index, "doc_id", "phash",
      ImageDedup.NumBands, ImageDedup.BandBits, ImageDedup.HammingThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty, "shifted ids share pixel groups — matches must exist")
    assert(streamed.toSeq == batch.toSeq,
      s"stream(${streamed.length}) != batch(${batch.length})")
    index.unpersist()
  }

  test("EQUIVALENCE: streaming video-phash probe matches the batch probe join row for row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{BandedPairs, VideoDedup}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val index = VideoDedup.videoPhash(docs.limit(200)).cache()
    index.count()
    // incoming clips: real AVI payloads for a shifted id range — same
    // pixel groups (shift is a NumGroups multiple), genuine near-dups
    val incoming: Seq[(Long, Array[Byte])] =
      VideoDedup.videoCorpus(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000L).as("doc_id")))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toIndexedSeq
    val in = MemoryStream[(Long, Array[Byte])]
    val out = EventStream.streamingVideoPhashMatches(
      in.toDF().toDF("media_id", "payload"), index)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("vhash_stream").start()
    in.addData(incoming.take(20))
    q.processAllAvailable()
    in.addData(incoming.drop(20))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vhash_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = BandedPairs.probeJoin(
      VideoDedup.vhashPayloads(incoming.toDF("media_id", "payload"), "media_id"),
      "media_id", index, "doc_id", "vhash",
      VideoDedup.NumBands, VideoDedup.BandBits, VideoDedup.HammingThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty, "shifted ids share pixel groups — matches must exist")
    assert(streamed.toSeq == batch.toSeq,
      s"stream(${streamed.length}) != batch(${batch.length})")
    index.unpersist()
  }

  test("committed MediaIndex: streaming probes load the artifact, takedown stops matching at the next snapshot (r10)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{AudioDedup, ImageDedup, MediaIndex, VideoDedup}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-mediaix").toString
    // commit real PNG + AVI + WAV fingerprints through the versioned artifact
    MediaIndex.buildImages(ImageDedup.imageCorpus(docs.limit(200)), dir, buildV = 0L)
    MediaIndex.buildVideos(VideoDedup.videoCorpus(docs.limit(200)), dir, buildV = 0L)
    MediaIndex.buildAudio(AudioDedup.audioCorpus(docs.limit(200)), dir, buildV = 0L)
    // incoming media: shifted id range, same pixel groups (genuine near-dups)
    val incoming: Seq[(Long, Array[Byte])] =
      ImageDedup.imageCorpus(docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000L).as("doc_id")))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toIndexedSeq
    def streamOnce(name: String): Seq[(Long, Long, Long)] = {
      val in = MemoryStream[(Long, Array[Byte])]
      val q = EventStream.streamingImagePhashServe(
        in.toDF().toDF("media_id", "payload"), dir)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      in.addData(incoming.take(20)); q.processAllAvailable()
      in.addData(incoming.drop(20)); q.processAllAvailable()
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toIndexedSeq.sorted
    }
    val streamed = streamOnce("mediaix_before")
    assert(streamed.nonEmpty, "shifted ids share pixel groups — matches must exist")
    val batch = MediaIndex.serveImages(incoming.toDF("media_id", "payload"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toIndexedSeq.sorted
    assert(streamed == batch,
      s"stream-from-artifact(${streamed.length}) != batch serve(${batch.length})")
    // the audio sub-table: streaming serve == batch serve — measured
    // BEFORE any takedown (retract removes an id from EVERY sub-table,
    // so the image/video takedowns below also forget these docs' audio)
    val wavs: Seq[(Long, Array[Byte])] =
      AudioDedup.audioCorpus(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 10000L).as("doc_id")))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toIndexedSeq
    val aIn = MemoryStream[(Long, Array[Byte])]
    val aq = EventStream.streamingAudioFpServe(
      aIn.toDF().toDF("media_id", "payload"), dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("mediaix_audio").start()
    aIn.addData(wavs); aq.processAllAvailable(); aq.stop()
    val aStreamed = spark.table("mediaix_audio").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toIndexedSeq.sorted
    val aBatch = MediaIndex.serveAudio(wavs.toDF("media_id", "payload"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toIndexedSeq.sorted
    assert(aStreamed.nonEmpty, "audio probes must match the committed fingerprints")
    assert(aStreamed == aBatch, "audio stream-from-artifact != batch serve")
    // takedown every matched corpus doc; a fresh stream (new snapshot)
    // must stop matching them — and ONLY them
    val hit = streamed.map(_._2).distinct
    MediaIndex.retract(spark, dir, hit)
    val after = streamOnce("mediaix_after")
    assert(after.isEmpty || !after.exists(m => hit.contains(m._2)),
      "a retracted media doc still matches at serve")
    assert(after == streamed.filterNot(m => hit.contains(m._2)),
      "retraction must not disturb matches against untouched docs")
    // the video sub-table serves and retracts through the same artifact
    val clips: Seq[(Long, Array[Byte])] =
      VideoDedup.videoCorpus(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 10000L).as("doc_id")))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toIndexedSeq
    val vBefore = MediaIndex.serveVideos(clips.toDF("media_id", "payload"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq.sorted
    assert(vBefore.nonEmpty, "video probes must match the committed fingerprints")
    MediaIndex.retract(spark, dir, vBefore.map(_._2).distinct)
    assert(MediaIndex.serveVideos(clips.toDF("media_id", "payload"), dir).count() == 0L,
      "retracted clips still match")
    // audio retract: forget whatever its matches were (some ids may
    // already be gone via the image/video takedowns — idempotent)
    MediaIndex.retract(spark, dir, aStreamed.map(_._2).distinct)
    assert(MediaIndex.serveAudio(wavs.toDF("media_id", "payload"), dir).count() == 0L,
      "retracted audio still matches")
    // maintenance keeps the artifact serving
    MediaIndex.maintain(spark, dir, keepVersions = 1)
    assert(MediaIndex.serveImages(incoming.toDF("media_id", "payload"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toIndexedSeq.sorted
      == after, "maintain must not change serve results")
  }

  test("MediaIndex named-snapshot serving: a probe pinned pre-retract keeps matching retracted fingerprints; unknown groups refuse at start (r12)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{ImageDedup, MediaIndex}
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-media-groupat").toString
    MediaIndex.buildImages(ImageDedup.imageCorpus(docs.limit(60)), dir, buildV = 0L)
    val g0 = MediaIndex.latestGroupVersion(spark, dir).get
    val incoming: Seq[(Long, Array[Byte])] =
      ImageDedup.imageCorpus(docs.filter(col("doc_id") < 30)
          .select((col("doc_id") + 10000L).as("doc_id")))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toIndexedSeq
    var n = 0
    def streamServe(pin: Option[Long]): Seq[(Long, Long, Long)] = {
      n += 1
      val in = MemoryStream[(Long, Array[Byte])]
      val q = EventStream.streamingImagePhashServe(
        in.toDF().toDF("media_id", "payload"), dir, pinGroupVersion = pin)
        .writeStream.outputMode("append").format("memory")
        .queryName(s"media_groupat_$n").start()
      in.addData(incoming); q.processAllAvailable(); q.stop()
      spark.table(s"media_groupat_$n").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toIndexedSeq.sorted
    }
    val before = streamServe(Some(g0))
    assert(before.nonEmpty, "shifted ids share pixel groups — matches must exist")
    assert(before == streamServe(None),
      "before any mutation, the pinned and latest serves agree")
    // takedown every matched doc — a NEW group publishes; the retracted
    // fingerprints leave the LATEST serve immediately…
    val hit = before.map(_._2).distinct
    MediaIndex.retract(spark, dir, hit)
    val g1 = MediaIndex.latestGroupVersion(spark, dir).get
    assert(g1 > g0, "the retract must publish a new root snapshot")
    assert(!streamServe(None).exists(m => hit.contains(m._2)),
      "latest-group serves must reflect the takedown")
    // …but the probe pinned PRE-RETRACT still matches them — exactly
    // what a compliance audit replaying pre-takedown verdicts needs
    assert(streamServe(Some(g0)) == before,
      "the pre-retract pin must keep serving the retracted fingerprints")
    // maintenance at an aggressive keep budget: the pinned group stays
    // byte-identical (protectGroups shields the newest 2 groups' pins)
    MediaIndex.maintain(spark, dir, keepVersions = 1)
    assert(streamServe(Some(g0)) == before,
      "maintenance must not age the pinned group's versions out")
    // an unknown group refuses at stream START, not as a batch-0 crash
    intercept[IllegalArgumentException] {
      EventStream.streamingImagePhashServe(
        spark.readStream.format("rate").load()
          .select(col("value").as("media_id"), lit(Array.emptyByteArray).as("payload")),
        dir, pinGroupVersion = Some(9999L))
    }
    // a modality the snapshot never pinned refuses too
    intercept[IllegalArgumentException] {
      MediaIndex.loadFpsAt(spark, dir, "vid", g0)
    }
  }

  test("EQUIVALENCE: streaming quality gate matches the batch classifier row for row") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(100)
    val rows: Seq[(Long, String)] =
      docs.collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingQualityGate(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("qgate_stream").start()
    in.addData(rows.take(40)); q.processAllAvailable()
    in.addData(rows.drop(40)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qgate_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    val batch = graft.operators.Classify.qualityClassifier(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    assert(streamed.length == 100)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming drift monitor converges to the batch drift table as the corpus arrives") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Dsir
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val refDocs = docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
    val liveDocs = docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text")
    val ref = Dsir.featBucketCounts(refDocs)
    val expected = Dsir.driftBetween(refDocs, liveDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq
    val rows: Seq[(Long, String)] = liveDocs.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-stream").toString
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingDriftMonitor(
      in.toDF().toDF("doc_id", "text"), ref, s"$dir/out", s"$dir/ckpt")
    val half = rows.length / 2
    in.addData(rows.take(half)); q.processAllAvailable()
    in.addData(rows.drop(half)); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
    val lastBatch = out.agg(max("batch_id")).head().getLong(0)
    val converged = out.filter(col("batch_id") === lastBatch).drop("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq
    assert(converged == expected,
      "once every live doc has arrived, the streamed drift table must equal the batch monitor's")
    // and the mid-stream table already reported against the same reference
    val mid = out.filter(col("batch_id") =!= lastBatch)
    assert(mid.count() > 0, "each micro-batch emits a full drift table")
  }

  test("streaming rollup fold cadence: partials stay key-bounded over many batches, reads identical through folds (r10)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.RollupIndex
    import graft.sources.Sinks.VersionedTable
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .limit(400)
    val rows: Seq[(Long, String, Double, Double)] = li.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-fold").toString
    val in = MemoryStream[(Long, String, Double, Double)]
    val q = EventStream.streamingRollupSink(
      in.toDF().toDF("l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice"),
      s"$dir/index", s"$dir/ckpt", foldEvery = 3)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def partials(): Long = VersionedTable.read(spark, s"$dir/index/state")
      .filter(col("row_kind") === "p").count()
    def keysOf(n: Int): Long = rows.take(n).map(r => (r._1, r._2)).distinct.size.toLong
    // 10 micro-batches of 40 — folds fire after batches 2, 5, 8
    val chunks = rows.grouped(40).toSeq
    chunks.take(6).foreach { c => in.addData(c); q.processAllAvailable() }
    // mid-stream (one fold behind + one unfolded batch): the presented
    // rollup equals the one-pass rescan of everything arrived so far
    assert(m(RollupIndex.read(spark, s"$dir/index")) ==
      m(RollupIndex.present(RollupIndex.partialAgg(
        rows.take(240).toDF("l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice")))),
      "mid-stream read through a fold must equal the rescan")
    chunks.drop(6).foreach { c => in.addData(c); q.processAllAvailable() }
    q.stop()
    // bounded: last fold at batch 8 collapsed to ≤1 row/key; batch 9
    // added at most one more partial set — NOT one per batch forever
    val p = partials()
    assert(p <= 2 * keysOf(400),
      s"partials $p exceed the fold bound ${2 * keysOf(400)} — cadence not folding")
    assert(m(RollupIndex.read(spark, s"$dir/index")) ==
      m(RollupIndex.present(RollupIndex.partialAgg(li))),
      "final read through three folds must equal the one-pass rescan")
    // the ledger survives folds: a replayed early delta still no-ops
    RollupIndex.applyDelta(
      rows.take(40).toDF("l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice"),
      s"$dir/index", "stream-batch-0")
    assert(m(RollupIndex.read(spark, s"$dir/index")) ==
      m(RollupIndex.present(RollupIndex.partialAgg(li))),
      "replay of a pre-fold delta id must no-op against the preserved ledger")
  }

  test("streaming rollup sink is exactly-once: two micro-batches == one rescan, replay no-ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.RollupIndex
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .limit(400)
    val rows: Seq[(Long, String, Double, Double)] = li.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3))).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-rollup-stream").toString
    val in = MemoryStream[(Long, String, Double, Double)]
    val q = EventStream.streamingRollupSink(
      in.toDF().toDF("l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice"),
      s"$dir/index", s"$dir/ckpt")
    in.addData(rows.take(250)); q.processAllAvailable()
    in.addData(rows.drop(250)); q.processAllAvailable()
    q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val maintained = m(RollupIndex.read(spark, s"$dir/index"))
    assert(maintained == m(RollupIndex.present(RollupIndex.partialAgg(li))),
      "streamed maintenance must equal the one-pass rescan")
    // a replayed micro-batch (same delta id) must no-op against the ledger
    RollupIndex.applyDelta(li.limit(250), s"$dir/index", "stream-batch-0")
    assert(m(RollupIndex.read(spark, s"$dir/index")) == maintained)
  }

  test("streaming curation admission: clean, gate, dedup-vs-index, admit, and remember across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, Html}
    val dir = java.nio.file.Files.createTempDirectory("graft-admission").toString
    // seed the corpus index with unrelated docs so the arrivals start novel
    val seed = Seq((900001L, "seed corpus alpha beta gamma delta epsilon"),
      (900002L, "another seed document with the usual words"))
      .toDF("doc_id", "text")
    DedupIndex.build(seed, s"$dir/index")
    // a flat ratio table + zero threshold: the DSIR gate passes all (its
    // own semantics are pinned elsewhere; here the admission loop is under test)
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    // three pages whose text passes the quality rules (>=5 words, a stopword)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks",
      4L -> "or perhaps the fourth page also carries enough words here")
    def htmlRows(ids: Seq[Long]) = {
      val df = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      df.select(col("doc_id"), Html.plantedHtml.as("html")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    }
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingCurationAdmission(
      in.toDF().toDF("doc_id", "html"), s"$dir/index", lr, dsirKeepMin = 0L,
      s"$dir/out", s"$dir/ckpt")
    in.addData(htmlRows(Seq(1L, 2L))); q.processAllAvailable()
    // page 2 arrives AGAIN next batch (a re-crawl) alongside novel page 4
    in.addData(htmlRows(Seq(2L, 4L))); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("batch_id")))
    assert(out.toSet == Set((1L, 0L), (2L, 0L), (4L, 1L)),
      s"batch 0 admits 1+2, batch 1 must reject the re-crawled 2 and admit 4; got ${out.toSeq}")
    // the admissions landed in the committed index: all three now exact dups
    val again = DedupIndex.serve(
      Seq(1L, 2L, 4L).map(i => (i + 100L, texts(i))).toDF("doc_id", "text"),
      s"$dir/index").collect().map(r => r.getString(1)).toSet
    assert(again == Set("exact"), s"re-serving admitted texts must flag exact, got $again")
  }

  test("admission decontamination: a registered benchmark doc is rejected at admission across micro-batches (r10)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, EvalRegistry, Html}
    val dir = java.nio.file.Files.createTempDirectory("graft-admit-decon").toString
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"),
      s"$dir/index")
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    // the "benchmark": a long-enough passage that passes every other
    // gate; doc 2 carries it verbatim, docs 1 and 4 are clean
    val bench = "what is the capital of france the capital of france is paris " +
      "and this sentence continues long enough to shingle"
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> bench,
      4L -> "or perhaps the fourth page also carries enough words here")
    EvalRegistry.register(Seq((77L, bench)).toDF("doc_id", "text"), s"$dir/registry")
    def htmlRows(ids: Seq[Long]) =
      ids.map(i => (i, texts(i))).toDF("doc_id", "text")
        .select(col("doc_id"), Html.plantedHtml.as("html")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingCurationAdmission(
      in.toDF().toDF("doc_id", "html"), s"$dir/index", lr, dsirKeepMin = 0L,
      s"$dir/out", s"$dir/ckpt", registryPath = Some(s"$dir/registry"))
    // the contaminated doc arrives in BOTH micro-batches — rejected each
    // time (not admitted once and then deduped: it must never extend the
    // index at all)
    in.addData(htmlRows(Seq(1L, 2L))); q.processAllAvailable()
    in.addData(htmlRows(Seq(2L, 4L))); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("batch_id")))
    assert(out.toSet == Set((1L, 0L), (4L, 1L)),
      s"clean docs admitted, benchmark doc rejected in both batches; got ${out.toSeq}")
    // the contaminated doc never reached the committed index: a fresh
    // probe of the benchmark text still classifies as new there
    val probe = DedupIndex.serve(
      Seq((555L, texts(2L))).toDF("doc_id", "text"), s"$dir/index")
      .head().getString(1)
    assert(probe == "new",
      s"benchmark text must be absent from the index, served $probe")
  }

  test("cross-ARTIFACT pipeline snapshot: one pinnable reference per batch; later mutations invisible to pinned readers; replay re-resolves the identical tuple (r12)") {
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, EvalRegistry, Html}
    import graft.sources.Sinks.PipelineSnapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-snap").toString
    val indexPath = s"$dir/index"; val regPath = s"$dir/registry"
    val pp = s"$dir/pipeline"
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), indexPath)
    EvalRegistry.register(
      Seq((77L, "what is the capital of france the capital of france is " +
        "paris and this sentence continues long enough to shingle"))
        .toDF("doc_id", "text"), regPath)
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks",
      4L -> "or perhaps the fourth page also carries enough words here",
      5L -> "a fifth novel page arriving late with plenty of words to pass")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    def run(ids: Seq[Long], bid: Long): Unit =
      EventStream.curationAdmitBatch(htmlDf(ids), bid, indexPath, lr, 0L,
        s"$dir/out", registryPath = Some(regPath), pipelinePath = Some(pp))
    assert(PipelineSnapshot.latest(spark, pp).isEmpty,
      "no pipeline manifest before the first batch")
    run(Seq(1L, 2L), 0L)
    val snap0 = PipelineSnapshot.latest(spark, pp).get
    assert(snap0.batchId == 0L && snap0.pins.size == 2,
      s"batch 0 must pin the index group + the registry table: $snap0")
    val g0 = snap0.groupPin(indexPath)
    val reg0 = snap0.tablePin(EvalRegistry.tablePath(regPath))
    def fpsAt(g: Long): Set[Long] =
      DedupIndex.loadFrames(spark, indexPath, Some(g))._1
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val fps0 = fpsAt(g0)
    assert(fps0 == Set(900001L, 1L, 2L), s"batch-0 snapshot state: $fps0")
    // batch 1 admits doc 4 — a later mutation from snap0's perspective
    run(Seq(2L, 4L), 1L)
    val snap1 = PipelineSnapshot.latest(spark, pp).get
    assert(snap1.batchId == 1L && snap1.groupPin(indexPath) > g0,
      s"batch 1 must publish a NEW pipeline snapshot with a newer index pin: $snap1")
    // (a) pinned-reader invisibility: the whole pipeline resolved
    // through snap0 still serves exactly the batch-0 tuple — the
    // extend published after snap0 is invisible
    assert(fpsAt(g0) == fps0, "the pinned index read must not see batch 1's extend")
    assert(fpsAt(snap1.groupPin(indexPath)).contains(4L),
      "the NEW snapshot's pin must see it")
    // the audit serve: doc 4's text re-drawn against the batch-0 pin is
    // still NEW (it hadn't been admitted yet), while the latest serve
    // knows it — the verdict-replay read serveAt exists for
    assert(DedupIndex.serveAt(
        Seq((999L, texts(4L))).toDF("doc_id", "text"), indexPath, g0)
      .head().getString(1) == "new",
      "serveAt(pre-admission pin) must re-draw the historical verdict")
    assert(DedupIndex.serve(
        Seq((999L, texts(4L))).toDF("doc_id", "text"), indexPath)
      .head().getString(1) == "exact")
    assert(EvalRegistry.loadAt(spark, regPath, reg0).count() > 0L,
      "the pinned registry version must stay readable")
    // (b) replay of batch 1 (crash-after-publish shape) against an
    // artifact that has since advanced (a direct extend — the
    // concurrent-mutator / re-extend shape): the raw group version
    // moves, but the pipeline snapshot for batch 1 stays the identical
    // tuple and the replay publishes nothing new
    val rawBefore = graft.sources.Sinks.VersionedTable
      .latestGroup(spark, indexPath).get._1
    DedupIndex.extend(
      Seq((900002L, "an unrelated direct extend between publish and replay"))
        .toDF("doc_id", "text"), indexPath, buildV = 50L)
    assert(graft.sources.Sinks.VersionedTable
        .latestGroup(spark, indexPath).get._1 > rawBefore,
      "test premise: the direct extend bumps the raw artifact group")
    run(Seq(2L, 4L), 1L)
    val replayed = PipelineSnapshot.forBatch(spark, pp, 1L).get
    assert(!fpsAt(replayed.groupPin(indexPath)).contains(900002L),
      "the replayed batch's pinned tuple predates the direct extend")
    assert(replayed == snap1,
      s"replay must re-resolve the IDENTICAL pinned tuple: $replayed vs $snap1")
    assert(PipelineSnapshot.latest(spark, pp).get.version == snap1.version,
      "a replayed batch publishes no new pipeline manifest")
    // (c) crash BEFORE the publish: no snapshot for that batch; the
    // replay completes the batch and publishes (pinning its post-replay
    // state — the at-least-once contract)
    intercept[RuntimeException] {
      EventStream.curationAdmitBatch(htmlDf(Seq(2L, 5L)), 2L, indexPath,
        lr, 0L, s"$dir/out", crashBeforeExtend = true,
        registryPath = Some(regPath), pipelinePath = Some(pp))
    }
    assert(PipelineSnapshot.forBatch(spark, pp, 2L).isEmpty,
      "a batch that died before its last step has no pipeline snapshot")
    run(Seq(2L, 5L), 2L)
    assert(PipelineSnapshot.forBatch(spark, pp, 2L).isDefined,
      "the replay publishes batch 2's snapshot")
    // (d) named access + refusal + health
    assert(PipelineSnapshot.at(spark, pp, snap0.version) == snap0)
    intercept[IllegalArgumentException] { PipelineSnapshot.at(spark, pp, 99L) }
    val h = PipelineSnapshot.health(spark, pp)
    assert(h.nonEmpty && h.forall(_.resolvable), s"all pins must resolve: $h")
    // the maintenance-cadence sweep surfaces the pipeline root next to
    // the artifact roots, pin-counted without the batch marker
    val sweep = graft.operators.Artifacts.snapshotHealth(spark, dir)
    val pipeRow = sweep.find(_.root.endsWith("/pipeline")).get
    assert(pipeRow.pinned == 2 && pipeRow.fallenForward.isEmpty,
      s"pipeline-level pins must be health-swept: $sweep")
    assert(sweep.exists(r => r.root.endsWith("/index") && r.fallenForward.isEmpty),
      s"artifact roots still swept alongside: $sweep")
  }

  test("two-level pin propagation: the sweep shields table versions pinned by recent PIPELINE snapshots; past the window named reads refuse loudly (r13)") {
    import spark.implicits._
    import graft.operators.{Artifacts, DedupIndex, Dsir, Html}
    import graft.sources.Sinks.PipelineSnapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-pins").toString
    val indexPath = s"$dir/index"; val pp = s"$dir/pipeline"
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), indexPath)
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks",
      3L -> "the third arriving page also crosses the quality floor",
      4L -> "or perhaps the fourth page also carries enough words here")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    (0L to 3L).foreach(b => EventStream.curationAdmitBatch(
      htmlDf(Seq(b + 1L)), b, indexPath, lr, 0L, s"$dir/out",
      pipelinePath = Some(pp)))
    val snap0 = PipelineSnapshot.forBatch(spark, pp, 0L).get
    assert(snap0.loop == EventStream.CurationLoop && snap0.served.nonEmpty,
      s"the loop must record its name and the served group pin: $snap0")
    def fpsAt(g: Long): Set[Long] =
      DedupIndex.loadFrames(spark, indexPath, Some(g))._1
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val gServed = snap0.servedGroupPin(indexPath).get
    val gPost = snap0.groupPin(indexPath)
    assert(fpsAt(gServed) == Set(900001L),
      "batch 0's SERVED pin is the pre-extend seed state")
    val post0 = fpsAt(gPost)
    assert(post0 == Set(900001L, 1L), s"batch 0's post-effect pin: $post0")
    // sweep at keep=1 with the default pipeline window (8 covers all 4
    // snapshots): every pinned table version must survive and serve
    // byte-identically — the C93 contract one level up
    Artifacts.maintainAll(spark, dir, keepVersions = 1, minAgeMs = 0L)
    assert(fpsAt(gServed) == Set(900001L) && fpsAt(gPost) == post0,
      "pipeline-pinned reads must survive the sweep byte-identically")
    val healthy = Artifacts.snapshotHealth(spark, dir, pipelineWindow = 8)
    assert(healthy.forall(_.fallenForward.isEmpty),
      s"all pins inside the window must resolve: $healthy")
    // a second sweep shielding ONLY the newest snapshot: batch 0's
    // pinned versions age out of keep=1, and the named read REFUSES
    // (never silently falls forward) — the contract's boundary
    Artifacts.maintainAll(spark, dir, keepVersions = 1, minAgeMs = 0L,
      protectGroups = 1, protectPipelines = 1)
    intercept[IllegalStateException] { fpsAt(gServed) }
    intercept[IllegalStateException] { fpsAt(gPost) }
    val swept = Artifacts.snapshotHealth(spark, dir, pipelineWindow = 8)
      .find(_.root.endsWith("/pipeline")).get
    assert(swept.fallenForward.nonEmpty &&
        swept.fallenForward.forall(_.startsWith("v")),
      s"health must name the out-of-window snapshots' fallen pins: $swept")
    // the newest snapshot stays fully servable after the narrow sweep
    val snap3 = PipelineSnapshot.forBatch(spark, pp, 3L).get
    assert(fpsAt(snap3.groupPin(indexPath)) ==
        Set(900001L, 1L, 2L, 3L, 4L),
      "the shielded newest snapshot keeps serving")
    assert(PipelineSnapshot.health(spark, pp, window = 1).forall(_.resolvable),
      "window-1 health (the shielded window) must be clean")
  }

  test("shared-root pipeline manifests keyed by (loop, batch): two loops interleave on ONE root, replay per (loop,batch) no-ops, cross-loop asOf composes (r13)") {
    import spark.implicits._
    import graft.operators.{AnnIndex, DedupIndex, Dsir, Html}
    import graft.sources.Sinks.PipelineSnapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-shared").toString
    val textIx = s"$dir/text_index"; val annIx = s"$dir/ann_index"
    val pp = s"$dir/pipeline"
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), textIx)
    def synth(salt: Int, from: Long, n: Long) =
      spark.range(from, from + n).toDF("vec_id")
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)),
            j => ((pmod(hash(lit(salt), col("vec_id"), j), lit(1000)) - lit(500))
              .cast("float") / lit(250.0f))).as("embedding"))
    AnnIndex.build(synth(1, 0L, 200L), annIx)
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    def runText(ids: Seq[Long], bid: Long): Unit =
      EventStream.curationAdmitBatch(htmlDf(ids), bid, textIx, lr, 0L,
        s"$dir/text_out", pipelinePath = Some(pp))
    def runEmb(salt: Int, from: Long, bid: Long): Unit =
      EventStream.embeddingAdmitBatch(synth(salt, from, 50L), bid, annIx,
        s"$dir/emb_out", tau = 2.0, pipelinePath = Some(pp))
    // interleave the two loops on ONE root — batch ids collide, loops don't
    runText(Seq(1L), 0L)
    runEmb(2, 1000L, 0L)
    runText(Seq(2L), 1L)
    runEmb(3, 2000L, 1L)
    val cur1 = PipelineSnapshot
      .forBatch(spark, pp, 1L, EventStream.CurationLoop).get
    val emb1 = PipelineSnapshot
      .forBatch(spark, pp, 1L, EventStream.EmbeddingLoop).get
    assert(cur1.pins.map(_.path) == Seq(textIx) &&
        emb1.pins.map(_.path) == Seq(annIx),
      s"each loop's batch-1 snapshot pins its own artifact: $cur1 / $emb1")
    assert(cur1.version != emb1.version,
      "colliding batch ids land as distinct manifests under distinct loops")
    // replay: each loop re-resolves its OWN identical tuple, no new manifest
    val latestV = PipelineSnapshot.latest(spark, pp).get.version
    runText(Seq(2L), 1L)
    runEmb(3, 2000L, 1L)
    assert(PipelineSnapshot.latest(spark, pp).get.version == latestV,
      "replays of both loops publish nothing new")
    assert(PipelineSnapshot
        .forBatch(spark, pp, 1L, EventStream.CurationLoop).get == cur1 &&
      PipelineSnapshot
        .forBatch(spark, pp, 1L, EventStream.EmbeddingLoop).get == emb1,
      "replay re-resolves the identical (loop, batch) tuple")
    assert(PipelineSnapshot.latestFor(spark, pp, EventStream.CurationLoop)
        .get.batchId == 1L,
      "latestFor scopes to the loop")
    // cross-loop compose: ONE asOf reference pins the whole deployment
    // as of the embedding loop's batch 0 (pipeline version order:
    // text b0 < emb b0 < text b1 < emb b1)
    val emb0 = PipelineSnapshot
      .forBatch(spark, pp, 0L, EventStream.EmbeddingLoop).get
    val asOf = PipelineSnapshot.asOf(spark, pp, emb0.version)
    assert(asOf.keySet == Set(EventStream.CurationLoop, EventStream.EmbeddingLoop),
      s"asOf spans every loop that had published: $asOf")
    assert(asOf(EventStream.EmbeddingLoop).batchId == 0L &&
        asOf(EventStream.CurationLoop).batchId == 0L,
      s"asOf picks each loop's newest snapshot at or before the version: $asOf")
    // and the composed reads resolve: the text index as the curation
    // loop left it at batch 0, the ann index as the embedding loop
    // SERVED it at batch 0 (seed only — batch 0's own vectors novel)
    val textAt = DedupIndex.loadFrames(spark, textIx,
        Some(asOf(EventStream.CurationLoop).groupPin(textIx)))._1
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(textAt == Set(900001L, 1L), s"composed text read: $textAt")
    val annServed = asOf(EventStream.EmbeddingLoop).servedGroupPin(annIx).get
    assert(AnnIndex.matchedIdsAt(
        graft.operators.Embeddings.quantized(synth(2, 1000L, 50L)),
        annIx, 2.0, annServed).count() == 0L,
      "the served pin re-draws embedding batch 0's own verdicts: all novel")
    assert(AnnIndex.matchedIdsAt(
        graft.operators.Embeddings.quantized(synth(2, 1000L, 50L)),
        annIx, 2.0, asOf(EventStream.EmbeddingLoop).groupPin(annIx)).count() == 50L,
      "the post-effect pin shows the state batch 0 left")
  }

  test("committed DSIR table serves the curation gate and pins at READ version: a mid-stream retrain protects the next batch, the snapshot records what the verdicts used (r12)") {
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, Html}
    import graft.sources.Sinks.PipelineSnapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-pin").toString
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), s"$dir/index")
    val permissive = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    Dsir.commit(spark, permissive, s"$dir/dsir", buildV = 0L)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      4L -> "or perhaps the fourth page also carries enough words here")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    def run(ids: Seq[Long], bid: Long): Unit =
      EventStream.curationAdmitBatch(htmlDf(ids), bid, s"$dir/index",
        lr = Array.empty, dsirKeepMin = 1L, s"$dir/out",
        pipelinePath = Some(s"$dir/pipeline"), dsirPath = Some(s"$dir/dsir"))
    run(Seq(1L), 0L)
    val snap0 = PipelineSnapshot.latest(spark, s"$dir/pipeline").get
    val dsirTable = Dsir.tablePath(s"$dir/dsir")
    val v0 = snap0.tablePin(dsirTable)
    assert(Dsir.loadLrAt(spark, s"$dir/dsir", v0).toSeq == permissive.toSeq,
      "the snapshot must pin the ratio-table version batch 0's verdicts used")
    // mid-stream retrain: an all-zero table (every doc scores 0 < keepMin)
    Dsir.commit(spark, Array.fill(Dsir.NumBuckets)(0L), s"$dir/dsir", buildV = 1L)
    run(Seq(4L), 1L)
    val out = spark.read.parquet(s"$dir/out").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(out == Set(1L),
      s"the retrained table must gate the NEXT batch (doc 4 rejected): $out")
    val snap1 = PipelineSnapshot.latest(spark, s"$dir/pipeline").get
    assert(snap1.batchId == 1L && snap1.tablePin(dsirTable) > v0,
      s"batch 1 must pin the retrained version: $snap1")
    // the historical snapshot still resolves the table batch 0 used
    assert(Dsir.loadLrAt(spark, s"$dir/dsir",
      PipelineSnapshot.at(spark, s"$dir/pipeline", snap0.version)
        .tablePin(dsirTable)).toSeq == permissive.toSeq)
    // the AUDIT replay: the same input re-drawn against the two
    // snapshots reproduces each batch's historical verdicts — under
    // snap0's permissive table doc 4 gates through and (being novel
    // then) would admit; under snap1's all-zero table the DSIR floor
    // drops it before dedup ever sees it
    def audit(v: Long): Map[Long, (Boolean, String, Boolean)] =
      EventStream.curationVerdictsAt(htmlDf(Seq(1L, 4L)), s"$dir/pipeline",
        v, s"$dir/index", dsirKeepMin = 1L, dsirPath = Some(s"$dir/dsir"))
        .collect().map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getString(2), r.getBoolean(3)))).toMap
    val a0 = audit(snap0.version)
    assert(a0(4L) == ((true, "new", true)),
      s"as of batch 0, doc 4 was novel and would admit: $a0")
    // the SERVED pin (r13): snapshot 0 re-draws batch 0's verdicts
    // against the PRE-extend index the batch actually served from, so
    // doc 1 — batch 0's own admission — re-derives exactly as the batch
    // drew it: novel, would admit (not as a dup of itself)
    assert(a0(1L) == ((true, "new", true)),
      s"snap0's served pin re-derives batch 0's own verdict for doc 1: $a0")
    // the POST-effect pin still answers "what state did batch 0 leave":
    // doc 1 is indexed there
    assert(DedupIndex.serveAt(htmlDf(Seq(1L)).select(col("doc_id"),
          lit(texts(1L)).as("text")), s"$dir/index",
        snap0.groupPin(s"$dir/index"))
      .head().getString(1) == "exact",
      "the post-effect group pin must still show batch 0's admission")
    val a1 = audit(snap1.version)
    assert(a1(4L) == ((false, "gated_out", false)),
      s"as of batch 1, the retrained DSIR table gates doc 4 out: $a1")
    assert(a1(1L) == ((false, "gated_out", false)),
      s"the all-zero table gates everything: $a1")
  }

  test("kill-point sweep: the text admission batch converges from a kill at EVERY commit boundary, not just the hand-picked seams (r12)") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, DedupIndex, Dsir, EvalRegistry, Html}
    import graft.sources.Sinks.PipelineSnapshot
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val bench = "what is the capital of france the capital of france is paris " +
      "and this sentence continues long enough to shingle"
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks",
      4L -> "or perhaps the fourth page also carries enough words here")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    def setup(dir: String): Unit = {
      DedupIndex.build(
        Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
          .toDF("doc_id", "text"), s"$dir/index")
      EvalRegistry.register(Seq((77L, bench)).toDF("doc_id", "text"),
        s"$dir/registry")
    }
    def run(dir: String, ids: Seq[Long], bid: Long): Unit =
      EventStream.curationAdmitBatch(htmlDf(ids), bid, s"$dir/index", lr, 0L,
        s"$dir/out", registryPath = Some(s"$dir/registry"),
        funnelLogPath = Some(s"$dir/funnel"),
        pipelinePath = Some(s"$dir/pipeline"))
    // the DIRECTORY-INDEPENDENT state a converged batch must reach:
    // serve verdicts, the deduped corpus provenance, the gate stages of
    // the resolved funnel (admitted is the documented at-least-once
    // residue — a kill between extend and filing loses the original
    // count and the replay legitimately under-files), pipeline presence
    def state(dir: String) = (
      DedupIndex.serve(
        texts.toSeq.map { case (i, t) => (i + 100L, t) }.toDF("doc_id", "text"),
        s"$dir/index").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap,
      spark.read.parquet(s"$dir/out")
        .select("doc_id", "batch_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      AdmissionLog.rollup(spark, s"$dir/funnel")
        .filter(col("stage") =!= "4_admitted").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet,
      PipelineSnapshot.forBatch(spark, s"$dir/pipeline", 1L).isDefined,
      graft.operators.Artifacts.snapshotHealth(spark, dir)
        .forall(_.fallenForward.isEmpty))
    def newDir() = java.nio.file.Files.createTempDirectory("graft-killsweep").toString
    // clean reference
    val dc = newDir(); setup(dc); run(dc, Seq(1L, 2L), 0L); run(dc, Seq(2L, 4L), 1L)
    val ref = state(dc)
    assert(ref._2 == Set((1L, 0L), (2L, 0L), (4L, 1L)) && ref._4,
      s"clean-run premise: $ref")
    // probe run counts the batch's commit boundaries
    val dp = newDir(); setup(dp); run(dp, Seq(1L, 2L), 0L)
    graft.FailPoint.record(dp)
    run(dp, Seq(2L, 4L), 1L)
    val nB = graft.FailPoint.count
    graft.FailPoint.reset()
    // corpus append + fps/sigs/bands commits + group publish + funnel
    // + pipeline publish — the sweep only means something if it sees
    // every boundary the batch actually has
    assert(nB == 7, s"expected 7 commit boundaries in one admitted batch, saw $nB")
    assert(state(dp) == ref, "the probe run is itself a clean run")
    for (k <- 1 to nB) {
      val d = newDir(); setup(d); run(d, Seq(1L, 2L), 0L)
      graft.FailPoint.arm(d, k)
      val killed =
        try { run(d, Seq(2L, 4L), 1L); false }
        catch { case _: graft.FailPoint.Killed => true }
        finally graft.FailPoint.reset()
      assert(killed, s"boundary $k must fire in the armed run")
      run(d, Seq(2L, 4L), 1L) // the streaming restart replays the batch id
      assert(state(d) == ref,
        s"kill at boundary $k/$nB must replay to the clean run's state")
    }
  }

  test("kill-point sweep: the embedding admission batch converges from a kill at EVERY commit boundary (r12)") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, AnnIndex}
    import graft.sources.Sinks.PipelineSnapshot
    def synth(salt: Int, from: Long, n: Long) =
      spark.range(from, from + n).toDF("vec_id")
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)),
            j => ((pmod(hash(lit(salt), col("vec_id"), j), lit(1000)) - lit(500))
              .cast("float") / lit(250.0f))).as("embedding"))
    def setup(dir: String): Unit =
      AnnIndex.build(synth(1, 0L, 200L), s"$dir/index")
    def run(dir: String, salt: Int, from: Long, bid: Long): Unit =
      EventStream.embeddingAdmitBatch(synth(salt, from, 50L), bid,
        s"$dir/index", s"$dir/out", tau = 2.0,
        funnelLogPath = Some(s"$dir/funnel"),
        pipelinePath = Some(s"$dir/pipeline"))
    def state(dir: String) = (
      spark.read.parquet(s"$dir/out")
        .select("vec_id", "batch_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      // converged index: every batch-1 vector collides with its own
      // committed codes (n admitted rows all indexed)
      AnnIndex.matchedIds(
        graft.operators.Embeddings.quantized(synth(3, 2000L, 50L)),
        s"$dir/index", tau = 2.0, exactRescore = false).count(),
      AdmissionLog.rollup(spark, s"$dir/funnel")
        .filter(col("stage") =!= "3_admitted").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet,
      PipelineSnapshot.forBatch(spark, s"$dir/pipeline", 1L).isDefined)
    def newDir() = java.nio.file.Files.createTempDirectory("graft-killsweep-emb").toString
    val dc = newDir(); setup(dc); run(dc, 2, 1000L, 0L); run(dc, 3, 2000L, 1L)
    val ref = state(dc)
    assert(ref._1.count(_._2 == 1L) > 0 && ref._2 == 50L && ref._4,
      s"clean-run premise: $ref")
    // the embedding audit read (matchedIdsAt — DedupIndex.serveAt's
    // twin): batch-1 vectors drawn against batch 0's pipeline pin are
    // all still NOVEL (their own admissions aren't in that state);
    // against batch 1's pin they all match; unknown groups refuse
    def probes = graft.operators.Embeddings.quantized(synth(3, 2000L, 50L))
    val pin0 = PipelineSnapshot.forBatch(spark, s"$dc/pipeline", 0L)
      .get.groupPin(s"$dc/index")
    assert(AnnIndex.matchedIdsAt(probes, s"$dc/index", 2.0, pin0).count() == 0L,
      "batch-1 vectors must be novel as of batch 0's pinned state")
    val pin1 = PipelineSnapshot.forBatch(spark, s"$dc/pipeline", 1L)
      .get.groupPin(s"$dc/index")
    assert(AnnIndex.matchedIdsAt(probes, s"$dc/index", 2.0, pin1).count() == 50L,
      "batch-1 vectors all match their own pinned admissions")
    intercept[IllegalArgumentException] {
      AnnIndex.matchedIdsAt(probes, s"$dc/index", 2.0, 9999L)
    }
    val dp = newDir(); setup(dp); run(dp, 2, 1000L, 0L)
    graft.FailPoint.record(dp)
    run(dp, 3, 2000L, 1L)
    val nB = graft.FailPoint.count
    graft.FailPoint.reset()
    // corpus append + codes commit + group publish + funnel + pipeline
    assert(nB >= 5, s"expected at least 5 commit boundaries, saw $nB")
    assert(state(dp) == ref, "the probe run is itself a clean run")
    for (k <- 1 to nB) {
      val d = newDir(); setup(d); run(d, 2, 1000L, 0L)
      graft.FailPoint.arm(d, k)
      val killed =
        try { run(d, 3, 2000L, 1L); false }
        catch { case _: graft.FailPoint.Killed => true }
        finally graft.FailPoint.reset()
      assert(killed, s"boundary $k must fire in the armed run")
      run(d, 3, 2000L, 1L)
      assert(state(d) == ref,
        s"kill at boundary $k/$nB must replay to the clean run's state")
    }
  }

  test("kill-point sweep: the SEMANTIC and MEDIA admission batches converge from a kill at every commit boundary (r12)") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, AnnIndex, ImageDedup, MediaIndex}
    import graft.sources.Sinks.PipelineSnapshot
    // ---- semantic loop (vectors-backed index, exact-cosine gate)
    def synth(salt: Int, from: Long, n: Long) =
      spark.range(from, from + n).toDF("vec_id")
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(63)),
            j => ((pmod(hash(lit(salt), col("vec_id"), j), lit(1000)) - lit(500))
              .cast("float") / lit(250.0f))).as("embedding"))
    def semSetup(dir: String): Unit =
      AnnIndex.build(synth(7, 0L, 200L), s"$dir/index", storeVectors = true)
    def semRun(dir: String, salt: Int, from: Long, bid: Long): Unit =
      EventStream.semDedupAdmitBatch(synth(salt, from, 30L), bid,
        s"$dir/index", s"$dir/out", tau = 0.99,
        funnelLogPath = Some(s"$dir/funnel"),
        pipelinePath = Some(s"$dir/pipeline"))
    def semState(dir: String) = (
      spark.read.parquet(s"$dir/out")
        .select("vec_id", "batch_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      AnnIndex.vectors(spark, s"$dir/index").count(),
      AdmissionLog.rollup(spark, s"$dir/funnel")
        .filter(col("stage") =!= "2_admitted").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet,
      PipelineSnapshot.forBatch(spark, s"$dir/pipeline", 1L).isDefined)
    def semDir() = java.nio.file.Files.createTempDirectory("graft-ks-sem").toString
    val sc = semDir(); semSetup(sc); semRun(sc, 8, 1000L, 0L); semRun(sc, 9, 2000L, 1L)
    val semRef = semState(sc)
    assert(semRef._1.count(_._2 == 1L) == 30 && semRef._4, s"clean premise: $semRef")
    val sp = semDir(); semSetup(sp); semRun(sp, 8, 1000L, 0L)
    graft.FailPoint.record(sp); semRun(sp, 9, 2000L, 1L)
    val semB = graft.FailPoint.count; graft.FailPoint.reset()
    assert(semB >= 5, s"semantic batch boundaries: $semB")
    for (k <- 1 to semB) {
      val d = semDir(); semSetup(d); semRun(d, 8, 1000L, 0L)
      graft.FailPoint.arm(d, k)
      val killed =
        try { semRun(d, 9, 2000L, 1L); false }
        catch { case _: graft.FailPoint.Killed => true }
        finally graft.FailPoint.reset()
      assert(killed, s"semantic boundary $k must fire")
      semRun(d, 9, 2000L, 1L)
      assert(semState(d) == semRef, s"semantic kill at $k/$semB must converge")
    }
    // ---- media loop (image modality through the real codec kernel)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def imgs(fromShift: Long, lo: Long, hi: Long) =
      ImageDedup.imageCorpus(
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select((col("doc_id") + fromShift).as("doc_id")))
        .toDF("media_id", "payload")
    def medSetup(dir: String): Unit =
      MediaIndex.buildImages(
        ImageDedup.imageCorpus(docs.filter(col("doc_id") < 20)), dir)
    def medRun(dir: String, lo: Long, hi: Long, bid: Long): Unit =
      EventStream.mediaAdmitBatch(imgs(20000L, lo, hi), bid, dir,
        s"$dir/out", "img", funnelLogPath = Some(s"$dir/funnel"),
        pipelinePath = Some(s"$dir/pipeline"))
    def medState(dir: String) = (
      spark.read.parquet(s"$dir/out")
        .select("media_id", "batch_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      MediaIndex.loadImageFps(spark, dir).count(),
      PipelineSnapshot.forBatch(spark, s"$dir/pipeline", 1L).isDefined)
    def medDir() = java.nio.file.Files.createTempDirectory("graft-ks-med").toString
    // pixel content is a function of doc_id % 50 (ImageDedup.NumGroups)
    // — the seed covers groups 0..19, so batches must draw from 40..49
    // and 20..29 to be genuinely novel (a group collision is a NEAR-DUP
    // by construction and would empty the batch)
    val mc = medDir(); medSetup(mc)
    medRun(mc, 40L, 50L, 0L); medRun(mc, 20L, 30L, 1L)
    val medRef = medState(mc)
    assert(medRef._1.count(_._2 == 1L) > 0 && medRef._3, s"clean premise: $medRef")
    val mp = medDir(); medSetup(mp); medRun(mp, 40L, 50L, 0L)
    graft.FailPoint.record(mp); medRun(mp, 20L, 30L, 1L)
    val medB = graft.FailPoint.count; graft.FailPoint.reset()
    assert(medB >= 4, s"media batch boundaries: $medB")
    for (k <- 1 to medB) {
      val d = medDir(); medSetup(d); medRun(d, 40L, 50L, 0L)
      graft.FailPoint.arm(d, k)
      val killed =
        try { medRun(d, 20L, 30L, 1L); false }
        catch { case _: graft.FailPoint.Killed => true }
        finally graft.FailPoint.reset()
      assert(killed, s"media boundary $k must fire")
      medRun(d, 20L, 30L, 1L)
      assert(medState(d) == medRef, s"media kill at $k/$medB must converge")
    }
  }

  test("curation admission replay: a crash between corpus append and index extend recovers, loses nothing") {
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, Html}
    val dir = java.nio.file.Files.createTempDirectory("graft-admission-replay").toString
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"),
      s"$dir/index")
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks",
      4L -> "or perhaps the fourth page also carries enough words here")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    def serveKind(id: Long): String = DedupIndex.serve(
      Seq((id + 100L, texts(id))).toDF("doc_id", "text"), s"$dir/index")
      .head().getString(1)
    // batch 0 lands normally; batch 1 (re-crawl of 2 + novel 4) dies in
    // the window between its two effects
    EventStream.curationAdmitBatch(htmlDf(Seq(1L, 2L)), 0L,
      s"$dir/index", lr, 0L, s"$dir/out")
    intercept[RuntimeException] {
      EventStream.curationAdmitBatch(htmlDf(Seq(2L, 4L)), 1L,
        s"$dir/index", lr, 0L, s"$dir/out", crashBeforeExtend = true)
    }
    // the crash state the ordering guarantees: the admission is in the
    // corpus but NOT yet in the index (the reverse order would leave the
    // unrecoverable opposite — indexed forever, never written)
    val crashed = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("batch_id")))
    assert(crashed.count(_ == ((4L, 1L))) == 1, s"doc 4's append landed before the crash: ${crashed.toSeq}")
    assert(serveKind(4L) == "new", "the extend must NOT have happened yet")
    // the streaming restart replays the SAME micro-batch id
    EventStream.curationAdmitBatch(htmlDf(Seq(2L, 4L)), 1L,
      s"$dir/index", lr, 0L, s"$dir/out")
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("batch_id")))
    assert(out.toSet == Set((1L, 0L), (2L, 0L), (4L, 1L)),
      s"replay adds no NEW (batch_id, doc_id) pairs: ${out.toSeq}")
    assert(out.count(_ == ((4L, 1L))) == 2,
      "the replay's only artifact is a duplicate of the same provenance key — " +
        "the at-least-once contract consumers already dedup by (batch_id, doc_id)")
    // converged: everything admitted is in BOTH the corpus and the index
    assert(Seq(1L, 2L, 4L).map(serveKind).toSet == Set("exact"))
  }

  test("admission compaction cadence: state files bounded, classifications identical through it") {
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, Html}
    val dirA = java.nio.file.Files.createTempDirectory("graft-admit-compact").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-admit-control").toString
    val seed = Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
    for (d <- Seq(dirA, dirB)) DedupIndex.build(seed.toDF("doc_id", "text"), s"$d/index")
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val vocab = Vector("amber", "birch", "cedar", "dune", "ember", "fjord", "grove",
      "heath", "inlet", "juniper", "kelp", "lagoon", "meadow", "nectar", "onyx",
      "prairie", "quartz", "reef", "summit", "tundra")
    // distinct shuffled-vocab sentences (one stopword for the quality
    // gate), different enough that every doc is admitted as `new`
    def text(n: Int): String =
      "the " + new scala.util.Random(n * 7919 + 13).shuffle(vocab).take(9).mkString(" ")
    def htmlDf(b: Int) = (0 until 3).map(i => (b * 10L + i, text(b * 3 + i)))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    val cadence = 3
    val rounds = 4 // 12 batches = 4 full cadences
    def bucketFiles(root: String): Seq[Int] =
      Seq("fps", "sigs", "bands").flatMap { t =>
        graft.sources.Sinks.VersionedTable
          .latestManifest(spark, s"$root/index/$t").get._2.values.map { rel =>
            new java.io.File(s"$root/index/$t/$rel").listFiles
              .count(_.getName.endsWith(".parquet"))
          }
      }
    // the UNBOUNDED quantity without maintenance: every extend commits
    // a new version and the superseded versions' dirs stay on disk
    def diskParquet(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$root/index"))
    }
    def manifests(root: String): Seq[Int] =
      Seq("fps", "sigs", "bands").map { t =>
        new java.io.File(s"$root/index/$t/_commits").listFiles
          .count(_.getName.endsWith(".json"))
      }
    def verdicts(root: String, probe: org.apache.spark.sql.DataFrame) =
      DedupIndex.serve(probe, s"$root/index").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // drive the cadences through BOTH loops (A maintains, B never)
    for (b <- 0 until rounds * cadence) {
      EventStream.curationAdmitBatch(htmlDf(b), b, s"$dirA/index", lr, 0L,
        s"$dirA/out", compactEvery = cadence)
      EventStream.curationAdmitBatch(htmlDf(b), b, s"$dirB/index", lr, 0L,
        s"$dirB/out")
      if (b == 2 * cadence - 1) {
        // mid-stream, right after the second maintenance: replayed
        // admitted texts + a novel one classify identically to the
        // unmaintained control
        val probe = ((0 until 3).map(i => (5000L + i, text(cadence + i))) :+
          ((6000L, "the wholly novel page nothing has indexed yet")))
          .toDF("doc_id", "text")
        assert(verdicts(dirA, probe) == verdicts(dirB, probe),
          "mid-stream maintenance must not change classifications")
      }
    }
    // every batch really extended the index (the growth premise is real)
    val outA = spark.read.parquet(s"$dirA/out").select("doc_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val outB = spark.read.parquet(s"$dirB/out").select("doc_id", "batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(outA == outB && outA.size == 3 * rounds * cadence,
      s"all ${3 * rounds * cadence} docs admitted in both: ${outA.size}")
    // bounded: the final cadence just compacted (single-file buckets)
    // and vacuumed (manifests capped at keepVersions), while the
    // control retains every superseded version's dirs
    assert(bucketFiles(dirA).max == 1,
      s"post-compaction buckets must be single-file, got ${bucketFiles(dirA)}")
    assert(manifests(dirA).forall(_ <= 8),
      s"vacuum must cap retained versions at keepVersions, got ${manifests(dirA)}")
    assert(manifests(dirB).forall(_ > 8), s"control retains all versions: ${manifests(dirB)}")
    assert(diskParquet(dirA) < diskParquet(dirB),
      s"maintenance must bound on-disk files: A=${diskParquet(dirA)} B=${diskParquet(dirB)}")
    // end-state classifications still identical
    val finalProbe = ((0 until 9).map(i => (7000L + i, text(i))) :+
      ((8000L, "the final novel probe page never indexed anywhere")))
      .toDF("doc_id", "text")
    assert(verdicts(dirA, finalProbe) == verdicts(dirB, finalProbe))
  }

  test("streaming dedup probe serves two micro-batches from one committed index == batch serve") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.DedupIndex
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-probe").toString
    DedupIndex.build(docs, s"$dir/index")
    val batch = DedupIndex.plantedBatch(docs)
    val expected = DedupIndex.serve(batch, s"$dir/index").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val rows: Seq[(Long, String)] = batch.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingDedupCommittedProbe(
      in.toDF().toDF("doc_id", "text"), s"$dir/index",
      s"$dir/out", s"$dir/ckpt")
    val half = rows.length / 2
    in.addData(rows.take(half)); q.processAllAvailable()
    in.addData(rows.drop(half)); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("kind"),
        r.getAs[Long]("match_id"), r.getAs[Long]("batch_id")))
    assert(out.length == rows.length, "every arriving doc gets exactly one verdict")
    out.foreach { case (id, kind, m, _) =>
      assert(expected(id) == ((kind, m)), s"doc $id: stream ($kind,$m) != batch ${expected(id)}")
    }
    // replay provenance: both micro-batches are represented
    assert(out.map(_._4).toSet == Set(0L, 1L))
  }

  test("streaming containment probe over two micro-batches == committed batch serve") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.DedupIndex
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-contain-probe").toString
    DedupIndex.buildContain(docs, s"$dir/index")
    val batch = DedupIndex.plantedContainBatch(docs)
    val expected = DedupIndex.serveContain(batch, s"$dir/index").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val rows: Seq[(Long, String)] = batch.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingContainProbe(
      in.toDF().toDF("doc_id", "text"), s"$dir/index",
      s"$dir/out", s"$dir/ckpt")
    val half = rows.length / 2
    in.addData(rows.take(half)); q.processAllAvailable()
    in.addData(rows.drop(half)); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("kind"),
        r.getAs[Long]("match_id"), r.getAs[Long]("n_hits"), r.getAs[Long]("batch_id")))
    assert(out.length == rows.length, "every arriving doc gets exactly one verdict")
    out.foreach { case (id, kind, m, n, _) =>
      assert(expected(id) == ((kind, m, n)),
        s"doc $id: stream ($kind,$m,$n) != batch ${expected(id)}")
    }
    assert(out.map(_._2).toSet == Set("contained", "new"),
      "both verdict classes must be exercised by the planted batch")
    assert(out.map(_._5).toSet == Set(0L, 1L))
  }

  test("EQUIVALENCE: streaming DSIR gate against a committed ratio table == batch scorer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Dsir
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // ratio table trained offline on the full corpus; the stream scores a subset
    val lr = Dsir.lrTable(docs)
    val scoreDocs = docs.select("doc_id", "text").limit(80)
    val batch = Dsir.scoreAgainst(scoreDocs, lr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val keepMin = batch.map(_._3).sum / batch.length // the batch run's floor mean
    val rows: Seq[(Long, String)] = scoreDocs.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingDsirGate(in.toDF().toDF("doc_id", "text"), lr, keepMin)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_stream").start()
    in.addData(rows.take(30)); q.processAllAvailable()
    in.addData(rows.drop(30)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).sorted
    assert(streamed.length == 80)
    assert(streamed.map(t => (t._1, t._2, t._3)).toSeq == batch.toSeq)
    streamed.foreach(t => assert(t._4 == (t._3 >= keepMin)))
  }

  test("EQUIVALENCE: streaming BPE encode from the committed bundle == batch encode; uncommitted bundle fails at start (r11)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.TextOps
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-bundle-serve").toString
    // fail-fast BEFORE any stream starts: a typo'd/uncommitted bundle is
    // a config error at start(), never a batch-0 crash loop
    val err = intercept[IllegalArgumentException] {
      EventStream.streamingBpeEncodeBundle(
        spark.readStream.format("rate").load(), s"$dir/nope")
    }
    assert(err.getMessage.contains("no committed tokenizer bundle"))
    TextOps.commitTokenizer(docs, dir, "crawl-a", k = 16)
    val merges = TextOps.loadBpeMerges(spark, dir)
    val batch = TextOps.bpeEncodeWith(docs.select("doc_id", "text"), merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val rows: Seq[(Long, String)] = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingBpeEncodeBundle(
        in.toDF().toDF("doc_id", "text"), dir)
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_bundle_stream").start()
    in.addData(rows.take(20)); q.processAllAvailable()
    in.addData(rows.drop(20)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bpe_bundle_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(streamed == batch,
      "every stream batch must encode exactly as the batch path at the committed snapshot")
    graft.GraftCache.releaseAll(spark)
  }

  test("EQUIVALENCE: streaming temperature gate against a committed rate table == batch mix") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.TextOps
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // rate table trained offline on the full corpus, committed, reloaded
    val dir = java.nio.file.Files.createTempDirectory("graft-temp-rates").toString
    TextOps.commitTemperature(TextOps.temperatureRates(docs), s"$dir/model")
    val rates = TextOps.loadTemperature(spark, s"$dir/model")
    // committed == in-session row-for-row (the artifact promotion pin)
    val served = rates.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val trained = TextOps.temperatureRates(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(served == trained, "committed rate table must equal the in-session one")
    val batch = TextOps.temperatureDecisions(docs, rates).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    val rows: Seq[(Long, String, String)] = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toIndexedSeq
    val in = MemoryStream[(Long, String, String)]
    val q = EventStream.streamingTemperatureGate(
        in.toDF().toDF("doc_id", "source", "text"), rates)
      .writeStream.outputMode("append")
      .format("memory").queryName("temp_gate_stream").start()
    in.addData(rows.take(20)); q.processAllAvailable()
    in.addData(rows.drop(20)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("temp_gate_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).sorted.toSeq
    assert(streamed.length == rows.length)
    assert(streamed == batch,
      "a doc admitted live must be exactly the doc the batch mix keeps at the committed snapshot")
    // the small source keeps everything under the no-upsampling normalization
    val minSrc = trained.minBy(_._2)
    assert(streamed.filter(_._2 == minSrc._1).forall(_._4),
      "the smallest source's docs must all be kept (rate 1)")
  }

  test("fuzzy decontamination (r13): the token-dropped paraphrase sails through the EXACT lens, containment catches it, salted novels pass; the LSH screen flags verbatim leaks") {
    import spark.implicits._
    import graft.operators.EvalRegistry
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-evalreg-near").toString
    val bench = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    EvalRegistry.register(bench, s"$dir/reg")
    EvalRegistry.registerNear(bench, s"$dir/reg")
    // paraphrase = drop every 7th token; on docs long enough to carry
    // several runs, >= ~55% of 3-grams survive while NO 8-gram does
    val para = bench.filter(size(split(col("text"), " ")) >= 21)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        EvalRegistry.paraphrase.as("text"))
    assert(para.count() > 10, "need paraphrasable bench docs at this SF")
    // (a) the EXACT lens (C80) misses every paraphrase — the gap
    val exact = EvalRegistry.decontaminate(
      para, EvalRegistry.load(spark, s"$dir/reg")).collect()
    assert(exact.forall(_.getBoolean(2)),
      "no 8-gram survives an every-7th-token drop, so C80 must keep them all")
    // (b) containment catches every paraphrase
    val near = EvalRegistry.decontaminateNear(
      para, EvalRegistry.loadNear(spark, s"$dir/reg")).collect()
    assert(near.forall(!_.getBoolean(3)),
      s"every paraphrase must be flagged: ${near.filter(_.getBoolean(3)).take(3).toSeq}")
    // (c) salted novels pass the near lens — no false contamination
    val novels = spark.range(50).select(
      (col("id") + 2000000L).as("doc_id"),
      expr("concat_ws(' ', 'zq' || id, 'wx' || id, 'vk' || id, 'jp' || id, " +
        "'qq' || id, 'zz' || id, 'yy' || id, 'xx' || id)").as("text"))
    val novelNear = EvalRegistry.decontaminateNear(
      novels, EvalRegistry.loadNear(spark, s"$dir/reg")).collect()
    assert(novelNear.forall(_.getBoolean(3)), "salted novels must pass")
    // (d) the LSH band screen: a verbatim leak collides on EVERY band
    // (J = 1); salted novels collide on none
    val leak = bench.select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    val lshLeak = EvalRegistry.decontaminateNearLsh(
      leak, EvalRegistry.loadBands(spark, s"$dir/reg")).collect()
    assert(lshLeak.forall(r => !r.getBoolean(2) &&
        r.getLong(1) == graft.operators.Dedup.NumBands.toLong),
      "a verbatim leak must collide on every band")
    val lshNovel = EvalRegistry.decontaminateNearLsh(
      novels, EvalRegistry.loadBands(spark, s"$dir/reg")).collect()
    assert(lshNovel.forall(_.getBoolean(2)), "salted novels must pass the screen")
    // (e) the registry still never ships eval text: both near tables
    // hold fixed-width hashes only
    val w3cols = graft.sources.Sinks.VersionedTable
      .read(spark, s"$dir/reg/eval_shingles_w3")
    assert(w3cols.select("h").collect().forall(_.getString(0).length == 16))
    val bandCols = graft.sources.Sinks.VersionedTable
      .read(spark, s"$dir/reg/eval_bands")
    assert(bandCols.select("band_key").collect().forall(_.getString(0).length == 32))
  }

  test("near-decontamination admission gate (r13): a PARAPHRASED benchmark doc passes the exact lens but is rejected by the near gate; the snapshot pins the near table and the audit replay reproduces the verdicts") {
    import spark.implicits._
    import graft.operators.{DedupIndex, Dsir, EvalRegistry, Html}
    import graft.sources.Sinks.PipelineSnapshot
    val dir = java.nio.file.Files.createTempDirectory("graft-near-gate").toString
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    // stopwords at positions 1 and 4 (never multiples of 7) so the
    // PARAPHRASE still passes the quality gate's min-stopword rule
    val benchWords = ("the alpha bravo and charlie delta echo foxtrot golf " +
      "hotel india juliet kilo lima mike november oscar papa quebec romeo " +
      "sierra tango uniform victor whiskey xray yankee zulu").split(" ")
    val benchText = benchWords.mkString(" ")
    // the C100 paraphrase rule: drop every 7th token
    val paraText = benchWords.zipWithIndex
      .collect { case (w, i) if (i + 1) % 7 != 0 => w }.mkString(" ")
    val novel = "a completely different novel page carrying plenty of its own words"
    EvalRegistry.register(Seq((77L, benchText)).toDF("doc_id", "text"), s"$dir/reg")
    EvalRegistry.registerNear(Seq((77L, benchText)).toDF("doc_id", "text"), s"$dir/reg")
    def batch = Seq((1L, paraText), (2L, novel)).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    def admitted(out: String): Set[Long] =
      if (new java.io.File(out).exists())
        spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
      else Set.empty
    // control: the exact lens ALONE admits the paraphrase — the gap
    DedupIndex.build(Seq((900001L, "seed corpus alpha beta gamma"))
      .toDF("doc_id", "text"), s"$dir/ix_ctl")
    EventStream.curationAdmitBatch(batch, 0L, s"$dir/ix_ctl", lr, 0L,
      s"$dir/out_ctl", registryPath = Some(s"$dir/reg"))
    assert(admitted(s"$dir/out_ctl") == Set(1L, 2L),
      "test premise: no 8-gram survives the drop, so C80 admits the paraphrase")
    // with the near gate: the paraphrase is rejected, the novel admits
    DedupIndex.build(Seq((900001L, "seed corpus alpha beta gamma"))
      .toDF("doc_id", "text"), s"$dir/ix")
    EventStream.curationAdmitBatch(batch, 0L, s"$dir/ix", lr, 0L,
      s"$dir/out", registryPath = Some(s"$dir/reg"),
      nearRegistryPath = Some(s"$dir/reg"),
      pipelinePath = Some(s"$dir/pipeline"),
      funnelLogPath = Some(s"$dir/funnel"))
    assert(admitted(s"$dir/out") == Set(2L),
      "the near gate must reject the paraphrase and admit the novel")
    // the funnel shows the drop at the decontamination stage
    val f = graft.operators.AdmissionLog.rollup(spark, s"$dir/funnel")
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(f("2_quality_dsir_kept") == 2L && f("3_decontaminated_kept") == 1L,
      s"funnel must evidence the near drop: $f")
    // the snapshot pins the near table; the audit replay reproduces
    val snap = PipelineSnapshot.latest(spark, s"$dir/pipeline").get
    assert(snap.tablePin(EvalRegistry.nearTablePath(s"$dir/reg")) >= 0L,
      "the pipeline snapshot must pin the near registry version")
    val verdicts = EventStream.curationVerdictsAt(batch, s"$dir/pipeline",
      snap.version, s"$dir/ix", dsirKeepMin = 0L,
      registryPath = Some(s"$dir/reg"), fallbackLr = lr,
      nearRegistryPath = Some(s"$dir/reg"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(verdicts(1L) == ((false, "gated_out", false)),
      s"the audit must re-derive the near rejection: $verdicts")
    assert(verdicts(2L) == ((true, "new", true)),
      s"the audit must re-derive the novel admission: $verdicts")
    // a stream pointed at a near-less registry refuses at START
    intercept[IllegalArgumentException] {
      EventStream.streamingCurationAdmission(
        spark.readStream.format("rate").load()
          .select(col("value").as("doc_id"), lit("<p>x</p>").as("html")),
        s"$dir/ix", lr, 0L, s"$dir/o2", s"$dir/ck2",
        nearRegistryPath = Some(s"$dir/no_such_registry"))
    }
  }

  test("EQUIVALENCE: streaming decontamination gate against a committed registry == batch verdicts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.EvalRegistry
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-evalreg-stream").toString
    EvalRegistry.register(docs.filter(col("doc_id") % 10 === 0), s"$dir/reg")
    val registry = EvalRegistry.load(spark, s"$dir/reg")
    val train = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val batch = EvalRegistry.decontaminate(train, registry).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    // the benchmark slice contaminates at least one train doc on this corpus
    assert(batch.exists(!_._3) && batch.exists(_._3))
    val rows: Seq[(Long, String)] = train.collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val out = java.nio.file.Files.createTempDirectory("graft-evalreg-out").toString
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingDecontaminateGate(
      in.toDF().toDF("doc_id", "text"), registry, s"$out/verdicts", s"$out/ckpt")
    in.addData(rows.take(25)); q.processAllAvailable()
    in.addData(rows.drop(25)); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$out/verdicts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(streamed == batch,
      "a doc the live gate rejects must be exactly the doc the batch pass rejects")
    // re-registering the same suite is a no-op: registry is a set
    EvalRegistry.register(docs.filter(col("doc_id") % 10 === 0), s"$dir/reg", buildV = 1L)
    val again = EvalRegistry.decontaminate(train, EvalRegistry.load(spark, s"$dir/reg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(again == batch)
    // suite lifecycle (r10): a SECOND suite registers, shares hashes
    // with the first (overlapping slice), and unregistering it must
    // restore EXACTLY the first suite's protection — shared hashes
    // keep protecting until their last registrant leaves
    EvalRegistry.register(docs.filter(col("doc_id") % 5 === 0), s"$dir/reg",
      buildV = 2L, suite = "suiteB")
    val both = EvalRegistry.decontaminate(train, EvalRegistry.load(spark, s"$dir/reg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(both.count(!_._3) > batch.count(!_._3),
      "the wider second suite must contaminate more train docs")
    EvalRegistry.unregister(spark, s"$dir/reg", "suiteB")
    val afterRetire = EvalRegistry.decontaminate(train, EvalRegistry.load(spark, s"$dir/reg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq
    assert(afterRetire == batch,
      "retiring suiteB must restore exactly the default suite's verdicts")
    // idempotent retire
    EvalRegistry.unregister(spark, s"$dir/reg", "suiteB")
    assert(EvalRegistry.decontaminate(train, EvalRegistry.load(spark, s"$dir/reg"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted.toSeq == batch)
  }

  test("LM gate scores from a COMMITTED model artifact == from the trained frames") {
    import graft.operators.Classify
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val (cb, cw) = Classify.lmTrain(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-model").toString
    Classify.commitLm(cb, cw, s"$dir/model")
    val (cb2, cw2) = Classify.loadLm(spark, s"$dir/model")
    val fromTrained = Classify.lmScoreAgainst(docs, cb, cw).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val fromCommitted = Classify.lmScoreAgainst(docs, cb2, cw2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(fromCommitted == fromTrained,
      "the committed LM must score identically to the in-session model")
  }

  test("EQUIVALENCE: streaming LM gate against a committed model == batch scorer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Classify
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // model trained on the full corpus; the stream scores a subset
    val (cb, cw) = Classify.lmTrain(docs)
    cb.cache().count(); cw.cache().count()
    val rows: Seq[(Long, String)] = docs.limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-gate").toString
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingLmGate(in.toDF().toDF("doc_id", "text"),
      cb, cw, s"$dir/out", s"$dir/ckpt")
    in.addData(rows.take(25)); q.processAllAvailable()
    in.addData(rows.drop(25)); q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val batch = Classify.lmScoreAgainst(rows.toDF("doc_id", "text"), cb, cw)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
    cb.unpersist(); cw.unpersist()
  }

  test("streaming line dedup: a line turning boilerplate strips from later batches only") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ld2").toString
    val in = MemoryStream[(Long, String)]
    val q = EventStream.streamingLineDedup(in.toDF().toDF("doc_id", "text"),
      s"$dir/index", s"$dir/out", s"$dir/ckpt", lineTok = 2, minDocs = 2)
    // batch 1: the line "x y" is unique so far — doc 1 passes untouched
    in.addData((1L, "x y a b")); q.processAllAvailable()
    // batch 2: doc 2 repeats "x y" — the line is now in 2 docs and strips
    in.addData((2L, "x y c d")); q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(1L) == "x y a b", "earlier batch must not be retro-cleaned")
    assert(out(2L) == "c d", s"later batch must strip the now-boilerplate line: ${out(2L)}")
  }

  /** Arrival rows for the media admission tests: (media_id, payload)
    * where the payload is the REAL PNG of `contentId`'s synthetic image —
    * distinct media ids can carry identical content (a re-crawl).
    */
  private def imageArrivals(pairs: Seq[(Long, Long)]): Seq[(Long, Array[Byte])] = {
    import spark.implicits._
    val imgs = graft.operators.ImageDedup.imageCorpus(
      pairs.map(_._2).distinct.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    pairs.map { case (mid, cid) => (mid, imgs(cid)) }
  }

  test("serve-cap band telemetry rides the maintenance cadence into the AdmissionLog; funnel rollup resolves replays by MAX (r12)") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, DedupIndex, Dsir, Html}
    val dir = java.nio.file.Files.createTempDirectory("graft-bandtel").toString
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), s"$dir/index")
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> "a second page with the words to pass quality checks")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    val log = s"$dir/funnel"
    // compactEvery = 1: every batch IS a cadence batch, so the band
    // telemetry files alongside the per-batch funnel stages
    EventStream.curationAdmitBatch(htmlDf(Seq(1L, 2L)), 0L,
      s"$dir/index", lr, 0L, s"$dir/out", compactEvery = 1,
      funnelLogPath = Some(log))
    val rows = AdmissionLog.read(spark, log).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val bands = rows.filter(_._1 == "curation_bands").map(t => t._3 -> t._4).toMap
    // nothing is hot at the production cap on this tiny corpus — the
    // telemetry's value here is that it FILES (zero is evidence too)
    assert(bands == Map("1_hot_buckets" -> 0L, "2_capped_rows" -> 0L),
      s"cadence batches must file band-cap evidence: $rows")
    assert(rows.exists(_._1 == "curation"),
      "the per-batch funnel still files alongside")
    // the rollup's replay resolution: per (loop, batch_id, stage) MAX
    // first (a replayed batch can only UNDER-count admissions), then
    // the bounded per-stage aggregate
    val planted = Seq(
      ("x", 0L, "1_arrived", 5L), ("x", 0L, "2_admitted", 4L),
      ("x", 0L, "1_arrived", 5L), ("x", 0L, "2_admitted", 1L), // replay under-counts
      ("x", 1L, "1_arrived", 2L), ("x", 1L, "2_admitted", 2L))
      .toDF("loop", "batch_id", "stage", "n")
    val rolled = AdmissionLog.rollupOf(planted).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(rolled == Set(
      ("x", "1_arrived", 2L, 7L),
      ("x", "2_admitted", 2L, 6L)),
      s"MAX resolution must keep the original attempt's counts: $rolled")
  }

  test("admission funnel ledger: per-batch stage evidence for both loops; replay refiles identical rows (r11)") {
    import spark.implicits._
    import graft.operators.{AdmissionLog, DedupIndex, Dsir, EvalRegistry, Html, ImageDedup, MediaIndex}
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    DedupIndex.build(
      Seq((900001L, "seed corpus alpha beta gamma delta epsilon"))
        .toDF("doc_id", "text"), s"$dir/index")
    val lr = Array.fill(Dsir.NumBuckets)(Dsir.Scale)
    val bench = "what is the capital of france the capital of france is paris " +
      "and this sentence continues long enough to shingle"
    val texts = Map(
      1L -> "the quick brown fox jumps over a lazy dog",
      2L -> bench, // falls at decontamination
      3L -> "short", // falls at the quality gate
      4L -> "or perhaps the fourth page also carries enough words here")
    EvalRegistry.register(Seq((77L, bench)).toDF("doc_id", "text"), s"$dir/registry")
    def htmlDf(ids: Seq[Long]) = ids.map(i => (i, texts(i))).toDF("doc_id", "text")
      .select(col("doc_id"), Html.plantedHtml.as("html"))
    val log = s"$dir/funnel"
    EventStream.curationAdmitBatch(htmlDf(Seq(1L, 2L, 3L, 4L)), 0L,
      s"$dir/index", lr, 0L, s"$dir/out",
      registryPath = Some(s"$dir/registry"), funnelLogPath = Some(log))
    // batch 1: a re-crawl survives every gate but dedup rejects it —
    // an all-rejected batch still files ("nothing admitted" is evidence)
    EventStream.curationAdmitBatch(htmlDf(Seq(4L)), 1L,
      s"$dir/index", lr, 0L, s"$dir/out",
      registryPath = Some(s"$dir/registry"), funnelLogPath = Some(log))
    def rows() = AdmissionLog.read(spark, log).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows().forall(_._1 == "curation"))
    val b0 = rows().filter(_._2 == 0L).map(t => t._3 -> t._4).toMap
    assert(b0 == Map("1_arrived" -> 4L, "2_quality_dsir_kept" -> 3L,
      "3_decontaminated_kept" -> 2L, "4_admitted" -> 2L), s"batch-0 funnel: $b0")
    val b1 = rows().filter(_._2 == 1L).map(t => t._3 -> t._4).toMap
    assert(b1 == Map("1_arrived" -> 1L, "2_quality_dsir_kept" -> 1L,
      "3_decontaminated_kept" -> 1L, "4_admitted" -> 0L), s"batch-1 funnel: $b1")
    // a replayed micro-batch refiles byte-identical rows under its own
    // batch_id — the loop's at-least-once contract, NOT the TakedownLog
    // jobId no-op: consumers dedup by (loop, batch_id, stage)
    EventStream.curationAdmitBatch(htmlDf(Seq(4L)), 1L,
      s"$dir/index", lr, 0L, s"$dir/out",
      registryPath = Some(s"$dir/registry"), funnelLogPath = Some(log))
    assert(rows().size == 12 && rows().distinct.size == 8,
      "replay must add only duplicate (loop, batch_id, stage) rows")
    // media loop: an undecodable payload quarantines in the codec
    // kernel — visible in the funnel as arrived - decoded
    val mdir = java.nio.file.Files.createTempDirectory("graft-funnel-media").toString
    MediaIndex.buildImages(
      ImageDedup.imageCorpus(Seq(900010L).toDF("doc_id")), s"$mdir/index")
    val arrivals = imageArrivals(Seq((101L, 1L), (102L, 2L)))
      .toDF("media_id", "payload")
      .unionByName(Seq((103L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
    EventStream.mediaAdmitBatch(arrivals, 0L, s"$mdir/index", s"$mdir/out",
      "img", funnelLogPath = Some(s"$mdir/funnel"))
    val m0 = AdmissionLog.read(spark, s"$mdir/funnel").collect()
      .map(r => (r.getString(2), r.getLong(3))).toMap
    assert(m0 == Map("1_arrived" -> 3L, "2_decoded" -> 2L,
      "3_batch_distinct" -> 2L, "4_admitted" -> 2L), s"media funnel: $m0")
    // the dashboard rollup: replay duplicates collapse exactly (the
    // refiled batch-1 rows count once), batches and totals per stage
    val ru = AdmissionLog.rollup(spark, log).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(ru == Map(
      "1_arrived" -> ((2L, 5L)), "2_quality_dsir_kept" -> ((2L, 4L)),
      "3_decontaminated_kept" -> ((2L, 3L)), "4_admitted" -> ((2L, 2L))),
      s"rollup must collapse the replay and total both batches: $ru")
    // the COMMITTED rollup: promotion applies one delta per batch, a
    // re-promotion no-ops via the rollup ledger, and the artifact reads
    // the same numbers as the on-read rollup
    def committed() = AdmissionLog.readRollup(spark, s"$dir/funnel_rollup")
      .collect().filter(_.getString(0) == "curation")
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    AdmissionLog.promoteRollup(spark, log, s"$dir/funnel_rollup")
    assert(committed() == ru,
      "the committed rollup must read the same numbers as the on-read rollup")
    AdmissionLog.promoteRollup(spark, log, s"$dir/funnel_rollup")
    assert(committed() == ru, "a re-promotion must be an exact no-op")
    graft.operators.RollupIndex.foldPartials(
      spark, s"$dir/funnel_rollup", AdmissionLog.FunnelShape)
    assert(committed() == ru, "folding partials must not change the numbers")
    graft.GraftCache.releaseAll(spark)
  }

  test("EMBEDDING admission loop: quantized verdicts vs committed codes, within-batch collapse, remember across batches (r11)") {
    import spark.implicits._
    import graft.operators.{AnnIndex, Embeddings}
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-admit").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1))
      .toMap
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$dir/index") // ids 0..499 at sf0.001
    def arrivals(rows: Seq[(Long, Long)]) = // (new id, content id)
      rows.map { case (id, cid) => (id, byId(cid)) }.toDF("vec_id", "embedding")
    // calibrate tau on the ADC scale THIS corpus + quantizer produce: a
    // re-crawled vector's self-ADC (cos of the vector against its own
    // PQ reconstruction — per-content, ~0.51..0.84 here) must separate
    // from novel arrivals' best candidate (noise ceiling ~0.43). The
    // margin is thin for the worst contents, which is exactly why tau
    // is MEASURED per corpus+quantizer (the C84 lesson on the ADC
    // scale): min self-ADC over a dup probe set, midpoint with the
    // noise ceiling — separation asserted, never assumed.
    val novelIds = (350L until 400L).map(i => (i, i))
    val calib = Seq((9001L, 7L), (9002L, 100L), (9003L, 200L), (9004L, 300L))
    val best0 = AnnIndex.adcScored(
        Embeddings.quantized(arrivals(novelIds ++ calib)), s"$dir/index")
      .groupBy("q_id").agg(max("approx_cos").as("b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dupMin = calib.map(c => best0(c._1)).min
    val noiseMax = best0.filter(_._1 < 9000L).values.max
    assert(dupMin > noiseMax,
      s"worst self-ADC $dupMin must separate from noise max $noiseMax")
    val tau = (dupMin + noiseMax) / 2
    // batch 0: 50 novel + a re-crawl of seed 7 (rejected) + an exact
    // within-batch pair of novel content 450 (one admitted)
    EventStream.embeddingAdmitBatch(
      arrivals(novelIds ++ Seq((9001L, 7L), (9011L, 450L), (9012L, 450L))),
      0L, s"$dir/index", s"$dir/out", tau,
      funnelLogPath = Some(s"$dir/funnel"))
    val out0 = spark.read.parquet(s"$dir/out").collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(!out0.contains(9001L), "the seed re-crawl must be rejected")
    assert(out0.contains(9011L) && !out0.contains(9012L),
      "within-batch exact dups collapse to the smallest id")
    assert((350L until 400L).forall(out0.contains), "novel vectors admit")
    // batch 1: a re-crawl of batch 0's admission 420 is rejected (the
    // loop remembers through the ARTIFACT), novel 460 admits
    EventStream.embeddingAdmitBatch(
      arrivals(Seq((9100L, 370L), (9101L, 460L))),
      1L, s"$dir/index", s"$dir/out", tau,
      funnelLogPath = Some(s"$dir/funnel"))
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch_id"))).toSet
    assert(!out.exists(_._1 == 9100L),
      "a re-crawl of a prior batch's admission must be rejected")
    assert(out.contains((9101L, 1L)))
    // funnel evidence for both batches
    val fu = graft.operators.AdmissionLog.read(spark, s"$dir/funnel")
      .collect().map(r => (r.getLong(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(fu((0L, "1_arrived")) == 53L && fu((0L, "2_batch_distinct")) == 52L
      && fu((0L, "3_admitted")) == 51L, s"batch-0 funnel: $fu")
    assert(fu((1L, "3_admitted")) == 1L)
    // id-collision guard: novel content under an existing index id fails
    val err = intercept[IllegalArgumentException] {
      EventStream.embeddingAdmitBatch(arrivals(Seq((370L, 470L))), 9L,
        s"$dir/index", s"$dir/out", tau)
    }
    assert(err.getMessage.contains("id re-use"), err.getMessage)
    // within-batch id discipline: a duplicated vec_id (any content)
    // would cross-multiply through the verdict joins — refused loudly
    val err2 = intercept[IllegalArgumentException] {
      EventStream.embeddingAdmitBatch(
        arrivals(Seq((9500L, 480L), (9500L, 481L))), 10L,
        s"$dir/index", s"$dir/out", tau)
    }
    assert(err2.getMessage.contains("unique per batch"), err2.getMessage)
    graft.GraftCache.releaseAll(spark)
  }

  test("embedding admission with in-loop rebalance: memory survives the re-encode, codebooks version, guards fire (r11)") {
    import spark.implicits._
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-rebal").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // the in-loop rebalance needs the IndexRefine split on the seed
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$dir/index",
      storeVectors = true)
    def arrivals(rows: Seq[(Long, Long)]) =
      rows.map { case (id, cid) => (id, byId(cid)) }.toDF("vec_id", "embedding")
    def run(b: Long, rows: Seq[(Long, Long)]): Unit =
      EventStream.embeddingAdmitBatch(arrivals(rows), b,
        s"$dir/index", s"$dir/out", tau = 2.0,
        compactEvery = 2, rebalanceLoadPct = 1L) // bar 1% => every cadence
    val cbV = () => graft.sources.Sinks.VersionedTable
      .latestManifest(spark, s"$dir/index/codebooks").get._1
    val v0 = cbV()
    run(0L, Seq((401L, 401L)))
    run(1L, Seq((410L, 410L))) // cadence batch: maintain + forced rebalance
    assert(cbV() > v0, "the cadence rebalance must commit new codebooks")
    // restart-before-checkpoint REPLAY of the completed cadence batch:
    // the re-crawl is rejected (no extend lands) and the SAME-version
    // rebalance must no-op instead of tripping the monotone guard into
    // a crash-loop (r11 review — the replay discipline the even/odd
    // version spacing promises)
    val vAfterRebal = cbV()
    run(1L, Seq((410L, 410L)))
    assert(cbV() == vAfterRebal,
      "a replayed cadence rebalance must no-op, not rebuild or throw")
    // cross-batch memory SURVIVES the re-encode: probe and index both
    // re-encode with the same new codebooks, so the collision rule
    // still rejects a re-crawl of a pre-rebalance admission
    run(2L, Seq((9100L, 401L), (9101L, 420L)))
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch_id"))).toSet
    assert(out.contains((401L, 0L)) && out.contains((410L, 1L)) &&
      out.contains((9101L, 2L)) && !out.exists(_._1 == 9100L),
      s"re-crawl must stay rejected across the rebalance: $out")
    // extends and the vectors sub-table stayed complete through it
    assert(AnnIndex.vectors(spark, s"$dir/index")
      .filter(col("vec_id").isInCollection(Set(401L, 410L, 9101L)))
      .count() == 3)
    // stream-start guards: ADC tau + rebalance is refused; a
    // codes-only index is refused
    val e1 = intercept[IllegalArgumentException] {
      EventStream.streamingEmbeddingAdmission(
        spark.readStream.format("rate").load(), s"$dir/index",
        s"$dir/out2", s"$dir/ckpt2", tau = 0.5, rebalanceLoadPct = 400L)
    }
    assert(e1.getMessage.contains("collision-only"), e1.getMessage)
    val codesOnly = java.nio.file.Files.createTempDirectory("graft-emb-co").toString
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$codesOnly/index")
    val e2 = intercept[IllegalArgumentException] {
      EventStream.streamingEmbeddingAdmission(
        spark.readStream.format("rate").load(), s"$codesOnly/index",
        s"$dir/out3", s"$dir/ckpt3", tau = 2.0, rebalanceLoadPct = 400L)
    }
    assert(e2.getMessage.contains("storeVectors"), e2.getMessage)
    graft.GraftCache.releaseAll(spark)
  }

  test("embedding admission with EXACT near-dup verdicts composes with the in-loop rebalance (r11)") {
    import spark.implicits._
    import graft.operators.{AnnIndex, Embeddings}
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-exact").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // cos ~0.98 on the unit-norm corpus — inside the measured tau AND
    // small enough that the perturbed probe still routes to its
    // original's coarse list (a larger bump is an honest ANN recall
    // miss: NProbe=4 of 16 lists; the verdict is candidates-only)
    def nearDupOf(id: Long): Seq[Float] = {
      val a = byId(id).toArray.clone(); a(0) = a(0) + 0.2f; a.toSeq
    }
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$dir/index",
      storeVectors = true)
    // the measured EXACT operating point (the ADC scale refuses on this
    // index — AnnIndexSpec pins that): near-dup gating AND the in-loop
    // rebalance, a composition the ADC tau forbids
    val tau = AnnIndex.commitAdmissionTau(spark, s"$dir/index", exact = true)
    def run(b: Long, rows: Seq[(Long, Seq[Float])]): Unit =
      EventStream.embeddingAdmitBatch(rows.toDF("vec_id", "embedding"), b,
        s"$dir/index", s"$dir/out", tau = tau,
        compactEvery = 2, rebalanceLoadPct = 1L, exactRescore = true)
    // batch 0: a near-dup of COMMITTED content is rejected through the
    // exact rule (no code collision — component 0 shifted subspace 0's
    // code), a novel tail vector admits
    run(0L, Seq((9000L, nearDupOf(5L)), (9001L, byId(400L))))
    // batch 1 (cadence: maintain + forced rebalance): a near-dup of the
    // BATCH-0 ADMISSION is rejected — cross-batch memory through the
    // extended index, still on the exact scale
    val cbV = () => graft.sources.Sinks.VersionedTable
      .latestManifest(spark, s"$dir/index/codebooks").get._1
    val v0 = cbV()
    run(1L, Seq((9100L, nearDupOf(400L)), (9101L, byId(420L))))
    assert(cbV() > v0, "the cadence rebalance must have rebuilt")
    // batch 2, AFTER the rebuild: the tau needed no re-measure, and
    // both re-crawls and near-dups of pre-rebuild admissions stay
    // rejected (exact scores never moved; only candidate recall can)
    run(2L, Seq((9200L, byId(400L)), (9201L, nearDupOf(420L)),
      (9202L, byId(440L))))
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch_id"))).toSet
    assert(out == Set((9001L, 0L), (9101L, 1L), (9202L, 2L)),
      s"exact verdicts must gate across batches and the rebuild: $out")
    // guard: exactRescore with a near-dup tau on a codes-only index is
    // refused at stream start (no vectors to rescore against)
    val codesOnly = java.nio.file.Files.createTempDirectory("graft-emb-exco").toString
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$codesOnly/index")
    val e = intercept[IllegalArgumentException] {
      EventStream.streamingEmbeddingAdmission(
        spark.readStream.format("rate").load(), s"$codesOnly/index",
        s"$dir/out2", s"$dir/ckpt2", tau = 0.7, exactRescore = true)
    }
    assert(e.getMessage.contains("storeVectors"), e.getMessage)
    graft.GraftCache.releaseAll(spark)
  }

  test("semantic admission loop: committed-wins + keep-first gate, cross-batch memory, in-loop rebalance, crash replay (r11)") {
    import spark.implicits._
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-sem-admit").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def nearDupOf(id: Long): Seq[Float] = { // cos ~0.98, routing-preserving
      val a = byId(id).toArray.clone(); a(0) = a(0) + 0.2f; a.toSeq
    }
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$dir/index",
      storeVectors = true)
    def run(b: Long, rows: Seq[(Long, Seq[Float])]): Unit =
      EventStream.semDedupAdmitBatch(rows.toDF("vec_id", "embedding"), b,
        s"$dir/index", s"$dir/out", tau = 0.9,
        compactEvery = 2, rebalanceLoadPct = 1L,
        funnelLogPath = Some(s"$dir/funnel"))
    // batch 0: committed copy drops (committed wins), novel admits,
    // a within-batch dup of the novel drops (keep-first)
    run(0L, Seq((9000L, byId(5L)), (9001L, byId(400L)), (9002L, byId(400L))))
    // batch 1 (cadence: maintain + forced rebalance): a verbatim copy
    // of the batch-0 admission drops (identical qv => identical rank-1
    // cluster, so the gate is guaranteed to see it) — cross-batch
    // memory via the extend; the NEAR-dup-in-cluster case is pinned in
    // AnnIndexSpec (the rank-1 gate legitimately misses near-dups that
    // perturb across a cluster boundary — SemDeDup's documented trade)
    val cbV = () => graft.sources.Sinks.VersionedTable
      .latestManifest(spark, s"$dir/index/codebooks").get._1
    val v0 = cbV()
    run(1L, Seq((9100L, byId(400L)), (9101L, byId(420L))))
    assert(cbV() > v0, "the cadence rebalance must have rebuilt")
    // batch 2, post-rebuild: exact cosines never moved — copies of
    // pre-rebuild admissions stay dropped, novel admits
    run(2L, Seq((9200L, byId(400L)), (9201L, byId(420L)),
      (9202L, byId(440L))))
    val out = () => spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch_id"))).toSet
    assert(out() == Set((9001L, 0L), (9101L, 1L), (9202L, 2L)),
      s"the semantic gate must admit exactly the novel rows: ${out()}")
    // funnel: per-batch arrived/admitted evidence
    val funnel = spark.read.parquet(s"$dir/funnel")
      .filter(col("loop") === "semantic" && col("batch_id") === 0L)
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n")).toMap
    assert(funnel == Map("1_arrived" -> 3L, "2_admitted" -> 1L),
      s"funnel must file the batch-0 gate evidence: $funnel")
    // crash between corpus append and extend: replay admits nothing new
    // (the appended row now reads as a committed copy is WRONG — the
    // extend never landed, so the replay re-gates and re-extends)
    intercept[RuntimeException] {
      EventStream.semDedupAdmitBatch(
        Seq((9300L, byId(460L))).toDF("vec_id", "embedding"), 3L,
        s"$dir/index", s"$dir/out", tau = 0.9, crashBeforeExtend = true)
    }
    // the crash left the corpus row but not the index row; the replay
    // re-runs the gate (9300 is still novel to the INDEX), re-appends,
    // and lands the extend — at-least-once corpus semantics, the
    // downstream dedup key is (vec_id, batch_id), same as the other loops
    EventStream.semDedupAdmitBatch(
      Seq((9300L, byId(460L))).toDF("vec_id", "embedding"), 3L,
      s"$dir/index", s"$dir/out", tau = 0.9)
    assert(AnnIndex.vectors(spark, s"$dir/index")
      .filter(col("vec_id") === 9300L).count() == 1L,
      "the replayed batch must land the extend")
    // and a later copy of it is rejected
    run(4L, Seq((9400L, byId(460L)), (9401L, byId(480L))))
    assert(out().contains((9401L, 4L)) && !out().exists(_._1 == 9400L),
      s"a copy of the replayed admission must drop: ${out()}")
    graft.GraftCache.releaseAll(spark)
  }

  test("streaming semantic gate: C44b verdicts from the committed index across micro-batches (r11)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-semgate").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$dir/index",
      storeVectors = true)
    val in = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.streamingSemDedupGate(
      in.toDF().toDF("vec_id", "embedding"), s"$dir/index",
      s"$dir/out", s"$dir/ckpt", tau = 0.9)
    in.addData(Seq((9000L, byId(5L)), (9001L, byId(400L)))) // copy + novel
    q.processAllAvailable()
    in.addData(Seq((9100L, byId(6L)))) // another committed copy, batch 2
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("is_kept"), r.getAs[Long]("batch_id")))).toMap
    assert(out(9000L) == ((false, 0L)), s"committed copy must drop: $out")
    assert(out(9001L) == ((true, 0L)), s"novel must keep: $out")
    assert(out(9100L) == ((false, 1L)),
      s"batch 2 must gate from the same committed index: $out")
    // a codes-only index is refused at stream START, not in batch 0
    val codesOnly = java.nio.file.Files.createTempDirectory("graft-semgate-co").toString
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$codesOnly/index")
    val e = intercept[IllegalArgumentException] {
      EventStream.streamingSemDedupGate(
        spark.readStream.format("rate").load(), s"$codesOnly/index",
        s"$dir/out2", s"$dir/ckpt2", tau = 0.9)
    }
    assert(e.getMessage.contains("storeVectors"), e.getMessage)
    graft.GraftCache.releaseAll(spark)
  }

  test("embedding admission replay: a crash between corpus append and index extend recovers, loses nothing (r11)") {
    import spark.implicits._
    import graft.operators.AnnIndex
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-replay").toString
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val byId = emb.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    AnnIndex.build(emb.filter(col("vec_id") < 350L), s"$dir/index")
    def arrivals(rows: Seq[(Long, Long)]) =
      rows.map { case (id, cid) => (id, byId(cid)) }.toDF("vec_id", "embedding")
    // collision-only verdicts (tau > 1): deterministic at any margin
    EventStream.embeddingAdmitBatch(arrivals(Seq((401L, 401L))), 0L,
      s"$dir/index", s"$dir/out", tau = 2.0)
    intercept[RuntimeException] {
      EventStream.embeddingAdmitBatch(
        arrivals(Seq((9100L, 401L), (410L, 410L))), 1L,
        s"$dir/index", s"$dir/out", tau = 2.0, crashBeforeExtend = true)
    }
    // the ordering's crash state: 410's append landed, its extend did not
    val crashed = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch_id")))
    assert(crashed.count(_ == ((410L, 1L))) == 1,
      s"410's append lands before the crash: ${crashed.toSeq}")
    assert(!AnnIndex.codes(spark, s"$dir/index").collect()
      .exists(_.getLong(0) == 410L), "the extend must NOT have happened yet")
    // the streaming restart replays the SAME micro-batch id
    EventStream.embeddingAdmitBatch(
      arrivals(Seq((9100L, 401L), (410L, 410L))), 1L,
      s"$dir/index", s"$dir/out", tau = 2.0)
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch_id")))
    assert(out.toSet == Set((401L, 0L), (410L, 1L)),
      s"replay adds no NEW (batch_id, vec_id) pairs and keeps rejecting " +
        s"the 401-content re-crawl: ${out.toSeq}")
    assert(out.count(_ == ((410L, 1L))) == 2,
      "the replay's only artifact duplicates the same provenance key " +
        "(at-least-once; consumers dedup by (batch_id, vec_id))")
    // converged: both admissions indexed exactly once
    val idx = AnnIndex.codes(spark, s"$dir/index").collect()
      .map(_.getLong(0)).filter(id => id == 401L || id == 410L)
    assert(idx.sorted.toSeq == Seq(401L, 410L))
    graft.GraftCache.releaseAll(spark)
  }

  test("streaming MEDIA admission: within-batch collapse, remember across batches, takedown re-opens mid-stream (r11)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{ImageDedup, MediaIndex}
    val dir = java.nio.file.Files.createTempDirectory("graft-media-admit").toString
    // seed the committed image index with unrelated content
    MediaIndex.buildImages(
      ImageDedup.imageCorpus(Seq(900010L, 900021L).toDF("doc_id")), s"$dir/index")
    val in = MemoryStream[(Long, Array[Byte])]
    val q = EventStream.streamingMediaAdmission(
      in.toDF().toDF("media_id", "payload"),
      s"$dir/index", s"$dir/out", s"$dir/ckpt", "img")
    // batch 0: 101 carries novel content 1; 102 is a dup of seed 900021
    // (content ids share an image group mod 50 — 900021 % 50 == 21 % 50;
    // seeds sit in groups 10/21, arrivals in 1/2, so only planted dups match)
    // (rejected by the serve); 103 repeats content 1 IN the same batch
    // (within-batch exact collapse keeps the smallest media_id only)
    in.addData(imageArrivals(Seq((101L, 1L), (102L, 900021L), (103L, 1L))))
    q.processAllAvailable()
    // batch 1: 201 re-crawls batch 0's admitted content 1 — the loop's
    // whole point: it must be rejected against the EXTENDED index;
    // 202 is novel
    in.addData(imageArrivals(Seq((201L, 1L), (202L, 2L))))
    q.processAllAvailable()
    // mid-stream takedown of media 101, same running query: the next
    // batch re-reads the artifact, so content 1's slot re-opens and a
    // fresh copy legitimately re-admits
    MediaIndex.retract(spark, s"$dir/index", Seq(101L))
    in.addData(imageArrivals(Seq((301L, 1L))))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("batch_id"))).toSet
    assert(out == Set((101L, 0L), (202L, 1L), (301L, 2L)),
      s"expected admits {101@0, 202@1, 301@2}; got $out")
    // the admitted fingerprints are servable: a copy of content 2 matches 202
    val again = MediaIndex.serveImages(
      imageArrivals(Seq((999L, 2L))).toDF("media_id", "payload"), s"$dir/index")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again.contains(202L), s"admitted 202 must serve; matched $again")
    // and an unbuilt modality refuses at START, not as a batch-0 crash-loop
    val err = intercept[IllegalArgumentException] {
      EventStream.streamingMediaAdmission(
        in.toDF().toDF("media_id", "payload"),
        s"$dir/index", s"$dir/out2", s"$dir/ckpt2", "aud")
    }
    assert(err.getMessage.contains("no committed 'aud' sub-table"))
  }

  test("media admission replay: a crash between corpus append and index extend recovers, loses nothing (r11)") {
    import spark.implicits._
    import graft.operators.{ImageDedup, MediaIndex}
    val dir = java.nio.file.Files.createTempDirectory("graft-media-replay").toString
    MediaIndex.buildImages(
      ImageDedup.imageCorpus(Seq(900010L).toDF("doc_id")), s"$dir/index")
    def batchDf(pairs: Seq[(Long, Long)]) =
      imageArrivals(pairs).toDF("media_id", "payload")
    def servedDocs(contentId: Long): Set[Long] = MediaIndex.serveImages(
      batchDf(Seq((888L, contentId))), s"$dir/index")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch 0 lands normally; batch 1 (re-crawl of 1 + novel 2) dies in
    // the window between its two effects
    EventStream.mediaAdmitBatch(batchDf(Seq((101L, 1L))), 0L,
      s"$dir/index", s"$dir/out", "img")
    intercept[RuntimeException] {
      EventStream.mediaAdmitBatch(batchDf(Seq((201L, 1L), (202L, 2L))), 1L,
        s"$dir/index", s"$dir/out", "img", crashBeforeExtend = true)
    }
    // the ordering's crash state: 202's append landed, its extend did not
    val crashed = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("batch_id")))
    assert(crashed.count(_ == ((202L, 1L))) == 1,
      s"202's append lands before the crash: ${crashed.toSeq}")
    assert(servedDocs(2L).isEmpty, "the extend must NOT have happened yet")
    // the streaming restart replays the SAME micro-batch id
    EventStream.mediaAdmitBatch(batchDf(Seq((201L, 1L), (202L, 2L))), 1L,
      s"$dir/index", s"$dir/out", "img")
    val out = spark.read.parquet(s"$dir/out").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("batch_id")))
    assert(out.toSet == Set((101L, 0L), (202L, 1L)),
      s"replay adds no NEW (batch_id, media_id) pairs: ${out.toSeq}")
    assert(out.count(_ == ((202L, 1L))) == 2,
      "the replay's only artifact duplicates the same provenance key " +
        "(at-least-once; consumers dedup by (batch_id, media_id))")
    // converged: both admissions servable, the re-crawl never admitted
    assert(servedDocs(1L) == Set(101L) && servedDocs(2L) == Set(202L))
    // id-collision guard: NOVEL content arriving under an id the index
    // already holds (different bytes) must fail the batch loudly — a
    // latest-wins extend would silently un-index the old content
    val err = intercept[IllegalArgumentException] {
      EventStream.mediaAdmitBatch(batchDf(Seq((900010L, 3L))), 9L,
        s"$dir/index", s"$dir/out", "img")
    }
    assert(err.getMessage.contains("id re-use"), err.getMessage)
  }

  test("media admission maintain cadence: files bounded, serves identical through compaction (r11)") {
    import graft.operators.MediaIndex
    // 12 batches x 2 novel images each; every content id takes its own
    // mod-50 image group (1..24), so nothing cross-matches and every
    // batch genuinely extends the index — the growth premise the
    // maintenance exists to bound. A maintains every 3 batches, B never.
    val dirA = java.nio.file.Files.createTempDirectory("graft-media-compact").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-media-control").toString
    import spark.implicits._
    for (d <- Seq(dirA, dirB))
      MediaIndex.buildImages(
        graft.operators.ImageDedup.imageCorpus(Seq(900030L).toDF("doc_id")),
        s"$d/index")
    val cadence = 3
    val rounds = 4
    def batchDf(b: Int) = imageArrivals(
      (0 until 2).map(i => (b * 100L + i, (b * 2 + i + 1).toLong)))
      .toDF("media_id", "payload")
    def serveSet(root: String, probe: org.apache.spark.sql.DataFrame) =
      MediaIndex.serveImages(probe, s"$root/index").collect()
        .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("doc_id"))).toSet
    for (b <- 0 until rounds * cadence) {
      EventStream.mediaAdmitBatch(batchDf(b), b, s"$dirA/index", s"$dirA/out",
        "img", compactEvery = cadence)
      EventStream.mediaAdmitBatch(batchDf(b), b, s"$dirB/index", s"$dirB/out", "img")
      if (b == 2 * cadence - 1) {
        // right after the second maintenance: copies of admitted content
        // + a genuinely novel group probe identically to the control
        val probe = imageArrivals(Seq((5001L, 2L), (5002L, 5L), (5003L, 40L)))
          .toDF("media_id", "payload")
        assert(serveSet(dirA, probe) == serveSet(dirB, probe),
          "mid-stream maintenance must not change media serves")
      }
    }
    def outSet(d: String) = spark.read.parquet(s"$d/out").collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("batch_id"))).toSet
    assert(outSet(dirA) == outSet(dirB) &&
      outSet(dirA).size == 2 * rounds * cadence,
      s"all ${2 * rounds * cadence} images admitted in both loops")
    def manifests(root: String): Int =
      new java.io.File(s"$root/index/img/_commits").listFiles
        .count(_.getName.endsWith(".json"))
    def bucketFiles(root: String): Seq[Int] =
      graft.sources.Sinks.VersionedTable
        .latestManifest(spark, s"$root/index/img").get._2.values.map { rel =>
          new java.io.File(s"$root/index/img/$rel").listFiles
            .count(_.getName.endsWith(".parquet"))
        }.toSeq
    assert(bucketFiles(dirA).max == 1,
      s"post-compaction buckets must be single-file: ${bucketFiles(dirA)}")
    assert(manifests(dirA) <= 8 && manifests(dirB) > 8,
      s"vacuum caps retained versions (A=${manifests(dirA)}, control B=${manifests(dirB)})")
    // end state: serves still identical, incl. a never-admitted group
    val fin = imageArrivals(
      Seq((7001L, 1L), (7002L, 12L), (7003L, 24L), (7004L, 41L)))
      .toDF("media_id", "payload")
    assert(serveSet(dirA, fin) == serveSet(dirB, fin))
  }

  test("media admission loop covers the VIDEO and AUDIO kernels end to end (r11)") {
    import spark.implicits._
    import graft.operators.{AudioDedup, MediaIndex, VideoDedup}
    // the loop is modality-generic and the live-stream facade is pinned
    // by the image test; here the other two decode kernels drive the
    // same two-batch admit/remember contract through the batch body.
    // Content ids share a group mod 50 per kernel — seeds sit in group
    // 10, arrivals in 1/2, so only planted dups match.
    val cases: Seq[(String, Seq[Long] => org.apache.spark.sql.DataFrame,
        (org.apache.spark.sql.DataFrame, String) => Unit)] = Seq(
      ("vid", (ids: Seq[Long]) => VideoDedup.videoCorpus(ids.toDF("doc_id")),
        (m: org.apache.spark.sql.DataFrame, p: String) => MediaIndex.buildVideos(m, p)),
      ("aud", (ids: Seq[Long]) => AudioDedup.audioCorpus(ids.toDF("doc_id")),
        (m: org.apache.spark.sql.DataFrame, p: String) => MediaIndex.buildAudio(m, p)))
    for ((modality, corpus, build) <- cases) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-media-$modality").toString
      def arrivals(pairs: Seq[(Long, Long)]) = {
        val m = corpus(pairs.map(_._2).distinct).collect()
          .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
        pairs.map { case (mid, cid) => (mid, m(cid)) }.toDF("media_id", "payload")
      }
      build(corpus(Seq(900010L)), s"$dir/index")
      // batch 0: 101 novel (content 1), 102 dup of the seed
      EventStream.mediaAdmitBatch(arrivals(Seq((101L, 1L), (102L, 900010L))),
        0L, s"$dir/index", s"$dir/out", modality)
      // batch 1: 201 re-crawls batch 0's admit, 202 novel
      EventStream.mediaAdmitBatch(arrivals(Seq((201L, 1L), (202L, 2L))),
        1L, s"$dir/index", s"$dir/out", modality)
      val out = spark.read.parquet(s"$dir/out").collect()
        .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("batch_id"))).toSet
      assert(out == Set((101L, 0L), (202L, 1L)),
        s"$modality: expected admits {101@0, 202@1}; got $out")
    }
  }
}
