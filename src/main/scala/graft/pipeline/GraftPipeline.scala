package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Reference

/** API-compatibility facade: the reference pipeline's public operations
  * (main.py / scheduler / analyzer), re-expressed as DataFrame → DataFrame
  * stages. A user of Dante134/instagram_data_pipeline maps each call
  * 1:1; the row-at-a-time psycopg2 loops become set-oriented Spark plans.
  *
  * Schemas (mirroring database/setup.py):
  *  - users(user_id, username, full_name, bio, follower_count,
  *    following_count, is_private, last_updated_us)
  *  - follows(user_id, other_id)  — directed edge tables for both the
  *    `followers` and `following` relations
  *  - scrape_jobs(job_id, target_username, job_type, status,
  *    started_at_us, completed_at_us, total_items, processed_items)
  *  - interests(user_id, category, confidence)
  */
object GraftPipeline {

  /** users upsert, latest row wins — scraper.get_user_profile's
    * `ON CONFLICT DO UPDATE` (instagram_scraper.py:203-227). Batch form:
    * union existing+incoming, keep newest per user_id.
    */
  def upsertUsers(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("last_updated_us").desc)
    existing.unionByName(incoming)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** calculate_mutual_followers (instagram_scraper.py:407-426):
    * mutuals = followers ∩ following, per user. `followers(user_id,
    * other_id)` = other follows user; `following(user_id, other_id)` =
    * user follows other.
    */
  def calculateMutualFollowers(followers: DataFrame, following: DataFrame): DataFrame =
    followers.join(following, Seq("user_id", "other_id"))
      .select(col("user_id"), col("other_id").as("mutual_id"))
      .distinct()

  /** schedule_user_scraping (job_scheduler.py:50-78): skip users with a
    * recent job (7-day lookback from `nowUs`), emit pending jobs of each
    * type for the rest.
    */
  def scheduleUserScraping(targets: DataFrame, jobs: DataFrame, nowUs: Long,
                           lookbackDays: Int = 7): DataFrame = {
    val recent = jobs.filter(
      col("job_type").isin("profile", "followers", "following") &&
        col("started_at_us") > lit(nowUs - lookbackDays.toLong * 86400L * 1000000L))
      .select(col("target_username")).distinct()
    targets.join(recent, Seq("target_username"), "left_anti")
      .select(
        col("target_username"),
        explode(array(lit("profile"), lit("followers"), lit("following"))).as("job_type"),
        lit("pending").as("status"))
  }

  /** process_pending_jobs batch selection (job_scheduler.py:96-106):
    * pending jobs, job_id order, bounded by the remaining daily quota.
    */
  def selectPendingBatch(jobs: DataFrame, remainingQuota: Int, batchSize: Int = 10): DataFrame =
    jobs.filter(col("status") === "pending")
      .orderBy("job_id")
      .limit(math.min(remainingQuota, batchSize))

  /** process_pending_users (interest_analyzer.py:286-297): users whose
    * `following` job completed but who have no interests rows yet.
    */
  def pendingAnalysisUsers(users: DataFrame, jobs: DataFrame, interests: DataFrame,
                           limit: Int = 5): DataFrame = {
    val done = jobs.filter(col("job_type") === "following" && col("status") === "completed")
      .select(col("target_username").as("username")).distinct()
    users.join(done, "username")
      .join(interests, Seq("user_id"), "left_anti")
      .orderBy("user_id")
      .limit(limit)
      .select("user_id", "username")
  }

  /** analyze_user_interests (interest_analyzer.py:148-243): classify the
    * accounts a user follows and aggregate to per-user interest rows
    * with a confidence score — GPT-4 replaced by the deterministic
    * keyword categorizer (Reference.interestCategorize); the aggregation
    * mirrors _store_interest_results' per-(user, category) upsert.
    *
    * following: follows-edge table; accountDocs(doc_id, text) keyed by
    * the followed account id (bio text).
    */
  def analyzeUserInterests(following: DataFrame, accountDocs: DataFrame): DataFrame = {
    val categorized = Reference.interestCategorize(accountDocs)
      .withColumnRenamed("doc_id", "other_id")
    following.join(categorized, "other_id")
      .filter(col("category") =!= "unknown")
      .groupBy("user_id", "category")
      .agg(
        count(lit(1)).as("n_accounts"),
        avg(col("confidence")).as("confidence"))
  }

  /** analyze_user_interests + the taxonomy parent rollup: per-user
    * child-level interests from [[analyzeUserInterests]], rolled up to
    * the reference's parent categories (interest_analyzer.py:40-115 —
    * the parent link inserted at :101-108) via
    * [[Reference.interestParentRollup]]. `taxonomy` defaults to the
    * reference's own 2-level category set; a child category absent from
    * it rolls up to itself.
    */
  def analyzeUserInterestsByParent(following: DataFrame, accountDocs: DataFrame,
                                   taxonomy: Option[DataFrame] = None): DataFrame = {
    val interests = analyzeUserInterests(following, accountDocs)
      .select(col("user_id"), col("category"), col("confidence"))
    val tax = taxonomy.getOrElse(Reference.taxonomyDim(following.sparkSession))
    Reference.interestParentRollup(interests, tax)
  }

  /** Job status transitions — the reference mutates `scrape_jobs` rows in
    * place (`UPDATE … SET status = 'completed'/'failed', error_message…
    * WHERE job_id`, instagram_scraper.py:400-408, job_scheduler.py:139-148).
    * Batch form: left-join the updates frame on job_id and take each
    * updated column where provided (`coalesce(update, current)`), leaving
    * untouched jobs and unmentioned columns as they were. `updates` must
    * carry `job_id` plus any subset of the jobs columns, one row per
    * job_id. Pair with [[graft.sources.Sinks.mergeUpsert]] to persist the
    * result.
    */
  def applyJobUpdates(jobs: DataFrame, updates: DataFrame): DataFrame = {
    val updCols = updates.columns.filterNot(_ == "job_id")
    val u = updates.select(
      col("job_id") +: updCols.toIndexedSeq.map(c => col(c).as(s"__u_$c")): _*)
    jobs.join(u, Seq("job_id"), "left")
      .select(jobs.columns.toIndexedSeq.map { c =>
        if (updCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
        else col(c)
      }: _*)
  }

  /** Re-queue failed jobs (completing the lifecycle the reference logs
    * but never retries): failed rows below the attempt cap go back to
    * pending with the error cleared and `attempts` incremented; failed
    * rows at the cap stay failed (dead-letter). Jobs frame must carry an
    * `attempts` column (0 for fresh jobs).
    */
  def retryFailedJobs(jobs: DataFrame, maxAttempts: Int = 3): DataFrame =
    // materialize the predicate ONCE against the original columns — later
    // withColumns rebind status/attempts, so re-evaluating it inline
    // would read the already-updated values
    jobs
      .withColumn("__retry", col("status") === "failed" && col("attempts") < maxAttempts)
      .withColumn("error_message",
        when(col("__retry"), lit(null).cast("string")).otherwise(col("error_message")))
      .withColumn("attempts",
        when(col("__retry"), col("attempts") + 1).otherwise(col("attempts")))
      .withColumn("status",
        when(col("__retry"), lit("pending")).otherwise(col("status")))
      .drop("__retry")

  /** Job bookkeeping rollup — the scheduler's progress/error telemetry. */
  def jobStats(jobs: DataFrame): DataFrame =
    jobs.groupBy("job_type", "status")
      .agg(
        count(lit(1)).as("n"),
        sum(col("processed_items")).as("processed"),
        sum(col("total_items")).as("total"))

  // ---------------- scheduler run loop (job_scheduler.py:157-163) ----------------

  private val DayUs = 86400L * 1000000L

  /** One scheduler interval — the body of the reference's
    * `process_pending_jobs` (job_scheduler.py:80-150) as a set-oriented
    * update delta: check the daily quota, select the pending batch in
    * job_id order, hand it to `process`, and return the per-job updates
    * to merge back into the jobs table.
    *
    * `process` is the pluggable work step (the reference calls its
    * scraper per job type; a library user plugs their own fetch/compute)
    * — it receives the selected batch and returns one row per attempted
    * job: `job_id` plus any updated columns (`status` of
    * completed/failed, `error_message`, `processed_items`, …). The
    * facade stamps `completed_at_us` (completed rows, when the callback
    * didn't) and `updated_at_us` (all rows) with `nowUs`, so quota
    * accounting and merge versioning never depend on callback
    * discipline.
    *
    * Quota accounting is derived from the TABLE — completed jobs whose
    * `completed_at_us` falls in `nowUs`'s UTC day — not from an
    * in-memory counter like the reference's `current_day_processed`:
    * the day rollover reset (`_reset_daily_counter`) is implicit and
    * the count survives a driver restart mid-day. The derivation is one
    * count over the bookkeeping table, which is metadata-sized (one row
    * per job) at any corpus scale.
    */
  def processPendingUpdates(jobs: DataFrame, nowUs: Long,
                            process: DataFrame => DataFrame,
                            dailyQuota: Int = 200,
                            batchSize: Int = 10): DataFrame = {
    val dayStart = nowUs - math.floorMod(nowUs, DayUs)
    val emptyUpdates = jobs.select(col("job_id")).limit(0)
      .withColumn("status", lit(null).cast("string"))
    val processedToday = jobs.filter(
      col("status") === "completed" &&
        col("completed_at_us") >= dayStart &&
        col("completed_at_us") < dayStart + DayUs).count()
    val remaining = dailyQuota - processedToday.toInt
    if (remaining <= 0) emptyUpdates
    else {
      val batch = selectPendingBatch(jobs, remaining, batchSize)
      val updates = process(batch)
      val withCompleted =
        if (updates.columns.contains("completed_at_us"))
          updates.withColumn("completed_at_us",
            coalesce(col("completed_at_us"),
              when(col("status") === "completed", lit(nowUs))))
        else updates.withColumn("completed_at_us",
          when(col("status") === "completed", lit(nowUs)))
      withCompleted.withColumn("updated_at_us", lit(nowUs))
    }
  }

  /** The scheduler's `run_scheduler` loop (job_scheduler.py:157-163 —
    * `schedule.every(30).minutes.do(process_pending_jobs)`), simulated
    * over explicit tick timestamps: fold [[processPendingUpdates]] +
    * [[applyJobUpdates]] across `tickTimesUs`. Deterministic (the caller
    * owns the clock) and restart-free — resuming from the returned jobs
    * table at any tick boundary yields the same final state, which is
    * what makes the batch recipe equivalent to the always-on variant.
    *
    * Iterative hygiene: each tick's jobs frame is persisted, counted and
    * lineage-cut (the propagateMinLabels pattern) so a long simulation
    * doesn't compound plan depth across ticks; the previous tick's frame
    * is unpersisted as soon as the next is materialized, and the final
    * frame is handed off unpersisted-safe via GraftCache tracking.
    */
  def runScheduled(jobs: DataFrame, tickTimesUs: Seq[Long],
                   process: (DataFrame, Long) => DataFrame,
                   dailyQuota: Int = 200, batchSize: Int = 10): DataFrame = {
    val spark = jobs.sparkSession
    var current = jobs
    var currentPersisted: DataFrame = null
    try {
      tickTimesUs.sorted.foreach { nowUs =>
        val updates = processPendingUpdates(current, nowUs, process(_, nowUs),
          dailyQuota, batchSize)
        val next = applyJobUpdates(current, updates)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before cutting lineage / dropping prev
        if (currentPersisted != null) currentPersisted.unpersist(blocking = true)
        currentPersisted = next
        current = spark.createDataFrame(next.rdd, next.schema)
      }
      if (currentPersisted != null) {
        val out = graft.GraftCache.persistTracked(current)
        out.count()
        out
      } else current
    } finally {
      if (currentPersisted != null) currentPersisted.unpersist(blocking = true)
    }
  }

  /** Always-on form of the run loop: a `Trigger.ProcessingTime` stream
    * fires [[processPendingUpdates]] every `intervalMs` against the
    * parquet jobs table at `jobsPath` and MERGEs the update delta back
    * via [[graft.sources.Sinks.mergeUpsert]] (latest-wins on
    * `updated_at_us`, so an at-least-once replay of a tick re-merges
    * identical updates as a no-op). The jobs table must carry an
    * `updated_at_us` column. The rate source is a metronome — its rows
    * are ignored; each micro-batch is one scheduler tick, exactly the
    * reference's `schedule.run_pending()` cadence without the
    * sleep-poll loop.
    *
    * `clockUs` defaults to wall-clock; tests inject a deterministic
    * clock (the reference hardwires `datetime.now()`, which is why its
    * loop is untestable without monkey-patching).
    */
  def runScheduledStream(spark: SparkSession, jobsPath: String,
                         process: (DataFrame, Long) => DataFrame,
                         intervalMs: Long, checkpoint: String,
                         dailyQuota: Int = 200, batchSize: Int = 10,
                         clockUs: () => Long = () => System.currentTimeMillis() * 1000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", 1).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(intervalMs))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val nowUs = clockUs()
        val jobs = spark.read.parquet(jobsPath)
        val updates = processPendingUpdates(jobs, nowUs, process(_, nowUs),
          dailyQuota, batchSize)
        if (!updates.isEmpty)
          graft.sources.Sinks.mergeUpsert(spark, jobsPath,
            applyJobUpdates(jobs, updates).filter(col("updated_at_us") === nowUs),
            Seq("job_id"), "updated_at_us")
      }
      .start()
}
