package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Reference
import graft.pipeline.GraftPipeline

/** End-to-end facade tests on small fixtures with known answers,
  * mirroring the reference's tests/test_pipeline.py flow (profile →
  * followers/following → mutuals → interests).
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4)
  import scala.jdk.CollectionConverters._

  override def afterAll(): Unit = spark.stop()

  private def usersDf(rows: (Long, String, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "username", "last_updated_us")
  }

  test("upsertUsers keeps the newest row per user") {
    val existing = usersDf((1, "old_alice", 100), (2, "bob", 100))
    val incoming = usersDf((1, "alice", 200), (3, "carol", 150))
    val out = GraftPipeline.upsertUsers(existing, incoming)
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "alice"), (2L, "bob"), (3L, "carol")))
  }

  test("calculateMutualFollowers = followers ∩ following") {
    val s = spark
    import s.implicits._
    val followers = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("user_id", "other_id")
    val following = Seq((1L, 2L), (1L, 4L), (2L, 1L)).toDF("user_id", "other_id")
    val m = GraftPipeline.calculateMutualFollowers(followers, following)
      .orderBy("user_id", "mutual_id").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("scheduleUserScraping skips recently-scheduled users, emits 3 job types") {
    val s = spark
    import s.implicits._
    val targets = Seq("fresh_user", "recent_user").toDF("target_username")
    val nowUs = 1000L * 86400L * 1000000L
    val jobs = Seq(
      ("recent_user", "profile", nowUs - 86400L * 1000000L), // 1 day ago
      ("fresh_user", "profile", nowUs - 30L * 86400L * 1000000L)) // 30 days ago
      .toDF("target_username", "job_type", "started_at_us")
    val out = GraftPipeline.scheduleUserScraping(targets, jobs, nowUs).collect()
    assert(out.length == 3)
    assert(out.forall(_.getString(0) == "fresh_user"))
    assert(out.map(_.getString(1)).sorted.toSeq == Seq("followers", "following", "profile"))
    assert(out.forall(_.getString(2) == "pending"))
  }

  test("selectPendingBatch honors quota and job_id order") {
    val s = spark
    import s.implicits._
    val jobs = (1L to 20L).map(i =>
      (i, s"u$i", "profile", if (i % 2 == 0) "pending" else "completed"))
      .toDF("job_id", "target_username", "job_type", "status")
    val out = GraftPipeline.selectPendingBatch(jobs, remainingQuota = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 4L, 6L))
  }

  test("pendingAnalysisUsers: following-complete users without interests") {
    val s = spark
    import s.implicits._
    val users = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("user_id", "username")
    val jobs = Seq(("a", "following", "completed"), ("b", "following", "completed"),
      ("c", "following", "pending"))
      .toDF("target_username", "job_type", "status")
    val interests = Seq((1L, "performance", 0.9)).toDF("user_id", "category", "confidence")
    val out = GraftPipeline.pendingAnalysisUsers(users, jobs, interests).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L)) // b: done but unanalyzed
  }

  test("applyJobUpdates: completed/failed transitions touch only updated rows/cols") {
    val s = spark
    import s.implicits._
    val jobs = Seq(
      (1L, "a", "in_progress", null.asInstanceOf[String], 0L),
      (2L, "b", "in_progress", null.asInstanceOf[String], 0L),
      (3L, "c", "pending", null.asInstanceOf[String], 0L))
      .toDF("job_id", "target_username", "status", "error_message", "processed_items")
    val updates = Seq(
      (1L, "completed", null.asInstanceOf[String], Some(42L)),
      (2L, "failed", "timeout", None))
      .toDF("job_id", "status", "error_message", "processed_items")
      .withColumn("processed_items", col("processed_items").cast("long"))
    val out = GraftPipeline.applyJobUpdates(jobs, updates)
      .orderBy("job_id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("completed", "failed", "pending"))
    assert(out(1).getString(3) == "timeout") // error recorded
    assert(out(0).getLong(4) == 42L) // progress updated
    assert(out(1).getLong(4) == 0L) // absent update column keeps current value
    assert(out(2).getString(3) == null) // untouched row fully unchanged
  }

  test("retryFailedJobs re-queues below the attempt cap, dead-letters at it") {
    val s = spark
    import s.implicits._
    val jobs = Seq(
      (1L, "failed", "boom", 0L),
      (2L, "failed", "boom", 2L),
      (3L, "failed", "boom", 3L), // at cap: stays failed
      (4L, "completed", null.asInstanceOf[String], 1L))
      .toDF("job_id", "status", "error_message", "attempts")
    val out = GraftPipeline.retryFailedJobs(jobs, maxAttempts = 3)
      .orderBy("job_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("pending", "pending", "failed", "completed"))
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 3L, 3L, 1L))
    assert(out(0).getString(2) == null && out(1).getString(2) == null)
    assert(out(2).getString(2) == "boom") // dead-letter keeps its error
  }

  test("runScheduled drives intervals under the daily quota with day rollover") {
    val s = spark
    import s.implicits._
    val dayUs = 86400L * 1000000L
    val jobs = (1L to 8L).map(i =>
      (i, s"user$i", "profile", "pending", None: Option[String], None: Option[Long]))
      .toDF("job_id", "target_username", "job_type", "status",
        "error_message", "completed_at_us")
    // deterministic work step: job 3 fails, everything else completes
    def proc(batch: org.apache.spark.sql.DataFrame, nowUs: Long) = batch.select(
      col("job_id"),
      when(col("job_id") === 3L, "failed").otherwise("completed").as("status"),
      when(col("job_id") === 3L, "boom").cast("string").as("error_message"))
    // quota 5/day, batch 2/tick: ticks 1-3 process jobs 1..6 (five
    // complete + one failure), tick 4 is quota-blocked (failures do not
    // consume quota, but 5 completions do), tick 5 lands on the NEXT day
    // -> implicit rollover reset lets jobs 7,8 run.
    val ticks = Seq(0L, 3600L * 1000000L, 2 * 3600L * 1000000L,
      3 * 3600L * 1000000L, dayUs + 1000L)
    val out = GraftPipeline.runScheduled(jobs, ticks, proc,
      dailyQuota = 5, batchSize = 2).collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getString(3), Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    assert(byId(3L)._1 == "failed" && byId(3L)._2.isEmpty)
    assert(Seq(1L, 2L, 4L, 5L, 6L).forall(i =>
      byId(i)._1 == "completed" && byId(i)._2.exists(_ < dayUs)),
      s"day-0 completions wrong: $byId")
    assert(Seq(7L, 8L).forall(i =>
      byId(i)._1 == "completed" && byId(i)._2.exists(_ >= dayUs)),
      s"rollover tick did not process the tail: $byId")
    // quota invariant: never more than 5 completions inside one UTC day
    assert(out.count(r => r.getString(3) == "completed" &&
      r.get(5) != null && r.getLong(5) < dayUs) == 5)
    graft.GraftCache.releaseAll(spark)
  }

  test("runScheduledStream: ProcessingTime metronome merges tick updates into the jobs table") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sched_stream").toString
    val nowUs = 42L * 86400L * 1000000L + 7L
    (1L to 3L).map(i => (i, "profile", "pending", None: Option[Long], 0L))
      .toDF("job_id", "job_type", "status", "completed_at_us", "updated_at_us")
      .write.parquet(s"$tmp/jobs")
    def proc(batch: org.apache.spark.sql.DataFrame, t: Long) =
      batch.select(col("job_id"), lit("completed").as("status"))
    val q = GraftPipeline.runScheduledStream(spark, s"$tmp/jobs", proc,
      intervalMs = 250, checkpoint = s"$tmp/ckpt", dailyQuota = 200,
      batchSize = 10, clockUs = () => nowUs)
    try {
      val deadline = System.nanoTime() + 30L * 1000000000L
      var done = false
      while (!done && System.nanoTime() < deadline) {
        Thread.sleep(250)
        done = try {
          spark.read.parquet(s"$tmp/jobs")
            .filter(col("status") === "completed").count() == 3
        } catch { case _: Throwable => false } // mid-swap window
      }
      assert(done, "stream did not complete all jobs within 30s")
    } finally q.stop()
    val rows = spark.read.parquet(s"$tmp/jobs").collect()
    assert(rows.forall(r => r.getAs[String]("status") == "completed"))
    assert(rows.forall(r => r.getAs[Long]("completed_at_us") == nowUs),
      "facade must stamp completed_at_us with the tick clock")
    assert(rows.forall(r => r.getAs[Long]("updated_at_us") == nowUs))
  }

  test("end-to-end main loop: schedule -> select -> transition -> retry -> merge -> resume") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val nowUs = 1000L * 86400L * 1000000L

    // day 1: schedule 2 fresh targets (3 job types each), none recent
    val targets = Seq("alice", "bob").toDF("target_username")
    val noJobs = Seq.empty[(String, String, Long)].toDF("target_username", "job_type", "started_at_us")
    val scheduled = GraftPipeline.scheduleUserScraping(targets, noJobs, nowUs)
      .orderBy("target_username", "job_type")
      .withColumn("job_id", monotonically_increasing_id() + 1)
      .withColumn("attempts", lit(0L))
      .withColumn("error_message", lit(null).cast("string"))
    assert(scheduled.count() == 6)

    // select a batch under quota, run it: one job fails
    val batch = GraftPipeline.selectPendingBatch(scheduled, remainingQuota = 4)
    assert(batch.count() == 4)
    val updates = batch.select(col("job_id"))
      .withColumn("status", when(col("job_id") === 2, "failed").otherwise("completed"))
      .withColumn("error_message", when(col("job_id") === 2, "rate limited"))
    val afterRun = GraftPipeline.applyJobUpdates(scheduled, updates)
    assert(afterRun.filter(col("status") === "completed").count() == 3)
    assert(afterRun.filter(col("status") === "failed").count() == 1)

    // retry re-queues the failure with its error cleared
    val afterRetry = GraftPipeline.retryFailedJobs(afterRun)
    assert(afterRetry.filter(col("status") === "failed").count() == 0)
    assert(afterRetry.filter(col("status") === "pending").count() == 3) // 2 unrun + 1 retried

    // scraped profiles land via the MERGE sink, latest wins across runs
    val day1 = Seq((1L, "alice", "Alice v1", nowUs), (2L, "bob", "Bob", nowUs))
      .toDF("user_id", "username", "bio", "last_updated_us")
    val day2 = Seq((1L, "alice", "Alice v2", nowUs + 1), (3L, "carol", "Carol", nowUs + 1))
      .toDF("user_id", "username", "bio", "last_updated_us")
    graft.sources.Sinks.mergeUpsert(spark, s"$tmp/users", day1, Seq("user_id"), "last_updated_us")
    graft.sources.Sinks.mergeUpsert(spark, s"$tmp/users", day2, Seq("user_id"), "last_updated_us")
    val users = spark.read.parquet(s"$tmp/users")
    assert(users.count() == 3)
    assert(users.filter(col("user_id") === 1).head().getString(2) == "Alice v2")

    // event ingest resumes from the persisted cursor across runs
    (1L to 50L).map(i => (i, i % 5)).toDF("event_id", "user_id")
      .write.mode("append").parquet(s"$tmp/events")
    val run1 = graft.sources.Ingest.readIncremental(spark, s"$tmp/events", s"$tmp/cur", "event_id")
    assert(run1.count() == 50)
    graft.sources.Ingest.advanceCursor(spark, s"$tmp/cur", run1, "event_id")
    (51L to 60L).map(i => (i, i % 5)).toDF("event_id", "user_id")
      .write.mode("append").parquet(s"$tmp/events")
    val run2 = graft.sources.Ingest.readIncremental(spark, s"$tmp/events", s"$tmp/cur", "event_id")
    assert(run2.count() == 10, "resumed run must touch only new events")
  }

  test("analyzeUserInterests aggregates followed-account categories") {
    val s = spark
    import s.implicits._
    val following = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("user_id", "other_id")
    val docs = Seq(
      (10L, "fast fast vector join"), // performance (3 hits vs 1)
      (11L, "scan filter join join")) // query_exec
      .toDF("doc_id", "text")
    val out = GraftPipeline.analyzeUserInterests(following, docs)
      .orderBy("user_id", "category").collect()
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "performance", 1L), (1L, "query_exec", 1L), (2L, "performance", 1L)))
    assert(out.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1))
  }

  test("interest parent rollup follows the reference taxonomy") {
    val s = spark
    import s.implicits._
    // Child-level interests across the REAL reference taxonomy: two
    // Fashion subcategories (argmax must keep Streetwear), one Technology
    // subcategory, one main category (its own parent), one category
    // outside the taxonomy (rolls up to itself).
    val interests = Seq(
      (1L, "Streetwear", 0.9), (1L, "Luxury Fashion", 0.5),
      (1L, "Programming", 0.7), (1L, "Music", 0.6),
      (2L, "Basketball", 0.8), (2L, "Crochet", 0.4))
      .toDF("user_id", "category", "confidence")
    val out = Reference.interestParentRollup(interests, Reference.taxonomyDim(spark))
      .orderBy("user_id", "parent_category").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "Fashion", "Streetwear", 0.9, 2L),
      (1L, "Music", "Music", 0.6, 1L),
      (1L, "Technology", "Programming", 0.7, 1L),
      (2L, "Crochet", "Crochet", 0.4, 1L),
      (2L, "Sports", "Basketball", 0.8, 1L)))

    // Facade wiring: analyzeUserInterestsByParent runs the keyword
    // classifier then rolls up (toy categories self-parent).
    val following = Seq((1L, 10L)).toDF("user_id", "other_id")
    val docs = Seq((10L, "fast fast vector")).toDF("doc_id", "text")
    val rolled = GraftPipeline.analyzeUserInterestsByParent(following, docs).collect()
    assert(rolled.length == 1 && rolled.head.getString(1) == "performance")
  }

  test("curation pipeline: crawl blobs to curated corpus, funnel monotone, stages verbatim") {
    import graft.pipeline.CurationPipeline
    import graft.operators.{Curation, Html, TextOps}
    import graft.sources.{Tables, Warc}
    val docs0 = Tables.documents(spark, "/root/testdata/sf0.001")
    // every 3rd doc's text arrives UTF-8->Latin-1 misdecoded (the crawl
    // reality C75 exists for); the facade must repair it before
    // normalize/dedup see it
    val docs = docs0.withColumn("text",
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3L)) === 0L, lit(Curation.Moji1))
          .otherwise(lit(Curation.MojiClean))))
    val targetIds = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val blobs = Warc.warcFiles(docs.select(col("doc_id"), Html.plantedHtml.as("html")))
    val (curated, funnel) = CurationPipeline.curate(blobs, targetIds)
    val f = funnel.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage seconds present and sane on every funnel row
    funnel.collect().foreach(r => assert(r.getDouble(2) >= 0.0, r.getString(0)))
    val nDocs = docs.count()
    // the WARC round-trip loses nothing; each filter stage only narrows
    assert(f("1_warc_records") == nDocs && f("2_html_extracted") == nDocs &&
      f("3_normalized") == nDocs)
    assert(f("4_quality_kept") <= f("3_normalized"))
    // no registry passed: the decontamination stage is a pass-through
    assert(f("5_decontaminated") == f("4_quality_kept"))
    assert(f("6_canonical_kept") <= f("5_decontaminated"))
    assert(f("7_dsir_selected") <= f("6_canonical_kept"))
    assert(f("7_dsir_selected") > 0, "the pipeline must keep something")
    // curated ids are real input docs, and text survived extraction+normalization
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val out = curated.collect()
    assert(out.map(_.getLong(0)).toSet.subsetOf(ids))
    out.foreach(r => assert(r.getString(1).nonEmpty))
    // the repair stage actually fired: no curated text retains the
    // 0xC3-lead mojibake signature the corrupted third would carry
    out.foreach(r => assert(!r.getString(1).contains("Ã"),
      s"doc ${r.getLong(0)} kept mojibake through the facade"))
    // stage verbatim: the facade's normalize stage == applying the
    // operators by hand on the same blobs (no hidden semantics)
    val byHand = Curation.textNormalize(
      Html.htmlExtract(Warc.splitWarc(blobs), col("html"))
        .select(col("doc_id"),
          graft.functions.Exprs.fixMojibake(col("clean_text")).as("clean_text")),
      col("clean_text"))
      .select("doc_id", "norm_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (curated2, funnel2) = CurationPipeline.curate(blobs, targetIds)
    // determinism: a rerun reproduces the corpus exactly
    assert(curated2.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      out.map(r => (r.getLong(0), r.getString(1))).sorted.toSeq)
    out.foreach(r => assert(byHand(r.getLong(0)) == r.getString(1),
      s"facade text for doc ${r.getLong(0)} diverged from the by-hand stages"))
    assert(funnel2.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      funnel.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
    // with a registry: a curated doc's text registered as a "benchmark"
    // drops at the decontamination stage — the ONLY stage that can see
    // it (it already passed quality, dedup keeps it as its cluster's
    // canonical, DSIR has no reason to drop it)
    val planted = curated.limit(1).collect()(0)
    import spark.implicits._
    val reg = graft.operators.EvalRegistry.shingleHashes(
      Seq((planted.getLong(0), planted.getString(1)))
        .toDF("doc_id", "text"))
    val (curated3, funnel3) = CurationPipeline.curate(blobs, targetIds, Some(reg))
    val f3 = funnel3.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f3("5_decontaminated") < f3("4_quality_kept"),
      "the planted benchmark doc must drop at the decontamination stage")
    assert(!curated3.collect().map(_.getLong(0)).contains(planted.getLong(0)),
      "a benchmark-contaminated doc escaped into the curated corpus")
    graft.GraftCache.releaseAll(spark)
  }
}
