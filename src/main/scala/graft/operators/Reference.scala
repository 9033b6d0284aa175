package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCache
import graft.functions.Exprs
import graft.sources.Tables

/** Operators re-expressing the reference pipeline's relational semantics
  * (Dante134/instagram_data_pipeline) Spark-first over the testdata tables.
  *
  * Portability conventions (DuckDB oracle parity, see SURVEY.md §6):
  *  - event time is always `unix_micros(ts)` (DuckDB: `epoch_us(ts)`) —
  *    both floor the parquet ns timestamps to identical bigint micros;
  *  - money sums go through DECIMAL(18,4) (exact, order-independent),
  *    then `round(…, 2)` and cast to double;
  *  - ratios/averages divide exact numerators as doubles, `round(…, 4)`.
  */
object Reference {

  /** Exact money arithmetic: cast to decimal before aggregating. */
  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def money(c: Column): Column = round(c, 2).cast("double")

  /** Event-time in microseconds: matches DuckDB `epoch_us` exactly. */
  private def tUs(c: Column): Column = unix_micros(c)

  // ===========================================================
  // A2/A3/A14 share a derived directed-edge relation: `click`
  // events define "user A follows B" with B = floor(value) % 20.
  // Mirrors the reference's followers/following tables
  // (database/setup.py:56-77).
  // ===========================================================

  /** Directed follow edges (src, dst), distinct, no self-loops. */
  def followEdges(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("src"),
        (floor(col("value")).cast("long") % 20).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  /** Persisted [[followEdges]]: the self-join/branching consumers
    * (mutual edges, degree stats, top influencers) each read the edge
    * relation 2–3 times; materializing the narrow distinct (src, dst)
    * projection once replaces per-branch rescans of the event log — the
    * cluster equivalent is checkpointing the edge table before graph
    * queries. Tracked in [[graft.GraftCache]]: branches and repeated
    * calls share one instance; releaseAll frees it.
    */
  def followEdgesCached(events: DataFrame): DataFrame =
    GraftCache.persistTracked(followEdges(events))

  val edgesSql: String =
    """SELECT DISTINCT user_id AS src, CAST(floor(value) AS BIGINT) % 20 AS dst
      |FROM events WHERE event_type = 'click'
      |  AND user_id <> CAST(floor(value) AS BIGINT) % 20""".stripMargin

  /** A1: latest-wins upsert — the reference upserts user profiles with
    * `ON CONFLICT DO UPDATE` keeping the newest row
    * (scraper/instagram_scraper.py:203-227). Spark-first: ONE
    * `max(struct(event_id, payload…))` hash aggregate per key — the same
    * shape as [[cdcApply]], its generalization below. Map-side partial
    * aggregation ships one struct per key per map partition and nothing
    * is ever sorted; at 100× a hot key (bot account with 10⁸ events) is a
    * merged partial, not one per-key window-sort task. event_id is unique
    * per event, so the lexicographic struct max is deterministic and the
    * trailing payload fields never tie-break.
    */
  def upsertLatest(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(
          col("event_id"),
          col("event_type"),
          col("value"),
          tUs(col("ts")).as("ts_us")).as("op"))
      .groupBy("user_id")
      .agg(max("op").as("op"))
      .select(
        col("user_id"),
        col("op.event_id").as("last_event_id"),
        col("op.event_type").as("last_type"),
        col("op.value").as("last_value"),
        col("op.ts_us").as("last_ts_us"))

  val upsertLatestSql: String =
    """SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |       value AS last_value, epoch_us(ts) AS last_ts_us
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) rn
      |      FROM events) WHERE rn = 1""".stripMargin

  /** A23: CDC changelog apply — A1's latest-wins upsert generalized to
    * full change-data-capture semantics (the lakehouse "apply changes"
    * primitive): each event is an operation on its user key ('error'
    * rows act as DELETEs, everything else UPSERTs its payload), and the
    * final state is the net result of replaying the log in
    * (ts, event_id) order — a key whose LAST op is a delete is absent
    * from the applied state. Spark-first: ONE `max(struct(...))` hash
    * aggregate picks the latest op per key — map-side partial
    * aggregation ships one struct per key per map partition and nothing
    * is ever sorted (vs A1's per-key window, which sorts each key
    * group); the delete filter runs on the already-aggregated one-row-
    * per-key frame. (ts_us, event_id) is unique, so the lexicographic
    * struct max is deterministic and the trailing payload fields never
    * tie-break.
    */
  def cdcApply(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(
          tUs(col("ts")).as("ts_us"),
          col("event_id"),
          col("event_type"),
          expr("CAST(round(value * 100, 0) AS BIGINT)").as("value_cents")).as("op"))
      .groupBy("user_id")
      .agg(max(col("op")).as("last"))
      .filter(col("last.event_type") =!= lit("error"))
      .select(
        col("user_id"),
        col("last.ts_us").as("last_ts_us"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        col("last.value_cents").as("last_value_cents"))

  val cdcApplySql: String =
    """SELECT user_id, last_ts_us, last_event_id, last_type, last_value_cents
      |FROM (SELECT user_id, epoch_us(ts) AS last_ts_us, event_id AS last_event_id,
      |        event_type AS last_type,
      |        CAST(round(value * 100, 0) AS BIGINT) AS last_value_cents,
      |        row_number() OVER (PARTITION BY user_id
      |                           ORDER BY epoch_us(ts) DESC, event_id DESC) rn
      |      FROM events)
      |WHERE rn = 1 AND last_type <> 'error'""".stripMargin

  /** A2: mutual followers — the reference's core query
    * (scraper/instagram_scraper.py:418-426): reciprocal-edge self-join.
    * Both sides are the same narrow (src,dst) projection, shuffled once
    * on the join key; output is the unordered pair (a<b).
    */
  def mutualEdges(events: DataFrame): DataFrame = {
    val e = followEdgesCached(events)
    val e1 = e.as("e1")
    val e2 = e.as("e2")
    e1.join(e2, col("e1.src") === col("e2.dst") && col("e1.dst") === col("e2.src"))
      .filter(col("e1.src") < col("e1.dst"))
      .select(col("e1.src").as("user_a"), col("e1.dst").as("user_b"))
  }

  val mutualEdgesSql: String =
    s"""WITH edges AS ($edgesSql)
       |SELECT e1.src AS user_a, e1.dst AS user_b
       |FROM edges e1 JOIN edges e2 ON e1.src = e2.dst AND e1.dst = e2.src
       |WHERE e1.src < e1.dst""".stripMargin

  /** A3: follower/following degree per user — the profile counters the
    * reference stores on `users` (follower_count / following_count).
    * Two partial-agg counts + a full outer join on the user key.
    * Deliberately NOT on [[followEdgesCached]]: measured ~1.8× slower
    * through the columnar cache than re-running the cheap scan+distinct
    * per aggregate branch (the branches group by different keys, so
    * there is no exchange to reuse either way).
    */
  def followerStats(events: DataFrame): DataFrame = {
    val e = followEdges(events)
    val out = e.groupBy(col("src").as("user_id")).agg(count("*").as("out_deg"))
    val in = e.groupBy(col("dst").as("user_id")).agg(count("*").as("in_deg"))
    out.join(in, Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  val followerStatsSql: String =
    s"""WITH edges AS ($edgesSql),
       |o AS (SELECT src AS user_id, count(*) AS out_deg FROM edges GROUP BY 1),
       |i AS (SELECT dst AS user_id, count(*) AS in_deg FROM edges GROUP BY 1)
       |SELECT coalesce(o.user_id, i.user_id) AS user_id,
       |       coalesce(out_deg, 0) AS out_deg, coalesce(in_deg, 0) AS in_deg
       |FROM o FULL JOIN i ON o.user_id = i.user_id""".stripMargin

  /** A4: pending-job batch selection — `status='pending' ORDER BY job_id
    * LIMIT n` (scheduler/job_scheduler.py:96-106). Spark compiles
    * sort+limit to TakeOrderedAndProject: per-partition top-n, no global
    * sort — exactly what survives at scale.
    */
  def pendingBatch(events: DataFrame, n: Int = 10): DataFrame =
    events
      .filter(col("event_type") === "signup")
      .orderBy("event_id")
      .limit(n)
      .select(col("event_id"), col("user_id"), tUs(col("ts")).as("ts_us"))

  val pendingBatchSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |FROM events WHERE event_type = 'signup'
      |ORDER BY event_id LIMIT 10""".stripMargin

  /** Reference lookback: the scheduler skips users with a job in the last
    * 7 days (scheduler/job_scheduler.py:63). */
  val ReferenceLookbackUs: Long = 7L * 86400L * 1000000L

  /** Testdata lookback: every synthetic user is active within 7 days of
    * max(ts), so the reference default yields an empty (vacuous) result on
    * the test tables; the wired query uses 12 hours to keep the oracle
    * check meaningful. Semantics are identical — only the constant differs.
    */
  val TestdataLookbackUs: Long = 12L * 3600L * 1000000L

  /** A5: recent-activity window dedup — the scheduler skips users with a
    * job inside the lookback window (scheduler/job_scheduler.py:56-78).
    * Here: users whose latest event is older than (max ts - lookback). The
    * global max is a one-row broadcast, not a driver collect.
    */
  def recentWindowDedup(events: DataFrame,
                        lookbackUs: Long = ReferenceLookbackUs): DataFrame = {
    val mx = events.agg(max(tUs(col("ts"))).as("max_us"))
    events
      .groupBy("user_id")
      .agg(max(tUs(col("ts"))).as("last_ts_us"))
      .crossJoin(broadcast(mx))
      .filter(col("last_ts_us") < col("max_us") - lit(lookbackUs))
      .select(col("user_id"), col("last_ts_us"))
  }

  val recentWindowDedupSql: String =
    s"""WITH mx AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
       |last AS (SELECT user_id, max(epoch_us(ts)) AS last_ts_us FROM events GROUP BY 1)
       |SELECT user_id, last_ts_us FROM last, mx
       |WHERE last_ts_us < max_us - $TestdataLookbackUs""".stripMargin

  /** A6: pending-users anti-join — users with completed scrape data but
    * no interest rows (analysis/interest_analyzer.py:289-297,
    * `LEFT JOIN … WHERE i.id IS NULL`). Spark-first: LEFT ANTI join —
    * the planner picks broadcast/hash anti based on sizes.
    */
  def pendingUsersAntiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  val pendingUsersAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin

  // ===========================================================
  // A7: interest categorization. The reference ships bios to GPT-4 and
  // stores (category, confidence) rows (interest_analyzer.py:176-260).
  // Deterministic re-expression: per-category keyword hit counts over the
  // token stream, argmax with alphabetical tie-break, confidence =
  // best/total. Pure codegen'd builtins — no UDF.
  // ===========================================================

  val categories: Seq[(String, Seq[String])] = Seq(
    "performance" -> Seq("fast", "slow", "vector"),
    "query_exec" -> Seq("scan", "filter", "join"),
    "storage" -> Seq("table", "column", "row"),
    "streaming" -> Seq("stream", "batch", "window"))

  def interestCategorize(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val counted = categories.foldLeft(documents.select(col("doc_id"), toks.as("toks"))) {
      case (df, (name, kws)) =>
        df.withColumn(s"c_$name", size(filter(col("toks"), t => t.isInCollection(kws))).cast("long"))
    }
    val catCols = categories.map { case (n, _) => col(s"c_$n") }
    val total = catCols.reduce(_ + _)
    val best = greatest(catCols: _*)
    // alphabetical-first argmax: the first category (in sorted order)
    // whose count equals the max wins — same CASE order as the oracle.
    val sortedCats = categories.map(_._1).sorted
    val winner = sortedCats
      .foldRight(lit("unknown")) { (n, acc) => when(col(s"c_$n") === best && best > 0, lit(n)).otherwise(acc) }
    counted
      .select(
        col("doc_id"),
        winner.as("category"),
        when(total > 0, round(best.cast("double") / total.cast("double"), 4))
          .otherwise(lit(0.0)).as("confidence"))
  }

  val interestCategorizeSql: String = {
    def cnt(kws: Seq[String]): String = {
      val inList = kws.map(k => s"'$k'").mkString(", ")
      s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ($inList))) AS BIGINT)"
    }
    val cols = categories.map { case (n, kws) => s"${cnt(kws)} AS c_$n" }.mkString(",\n  ")
    val names = categories.map(_._1)
    val total = names.map(n => s"c_$n").mkString(" + ")
    val best = s"greatest(${names.map(n => s"c_$n").mkString(", ")})"
    val cases = names.sorted
      .map(n => s"WHEN c_$n = best AND best > 0 THEN '$n'")
      .mkString("\n    ")
    s"""WITH scored AS (SELECT doc_id,
       |  $cols
       |FROM documents),
       |agged AS (SELECT doc_id, $total AS total, $best AS best, * FROM scored)
       |SELECT doc_id,
       |  CASE $cases ELSE 'unknown' END AS category,
       |  CASE WHEN total > 0 THEN round(CAST(best AS DOUBLE) / CAST(total AS DOUBLE), 4) ELSE 0.0 END AS confidence
       |FROM agged""".stripMargin
  }

  /** The reference's actual 2-level interest taxonomy
    * (interest_analyzer.py:41-61 main categories, :81-98 subcategories):
    * (category, parent) with parent = None for the 18 mains. A fixed
    * ~27-row dim — always broadcast, like region/nation.
    */
  val taxonomy: Seq[(String, Option[String])] = Seq(
    "Fashion" -> None, "Technology" -> None, "Sports" -> None,
    "Fitness" -> None, "Food" -> None, "Travel" -> None, "Art" -> None,
    "Music" -> None, "Photography" -> None, "Beauty" -> None,
    "Gaming" -> None, "Business" -> None, "Entertainment" -> None,
    "Education" -> None, "Science" -> None, "Politics" -> None,
    "Lifestyle" -> None, "Humor" -> None,
    "Streetwear" -> Some("Fashion"),
    "Luxury Fashion" -> Some("Fashion"),
    "Sustainable Fashion" -> Some("Fashion"),
    "Mobile Tech" -> Some("Technology"),
    "AI & Machine Learning" -> Some("Technology"),
    "Programming" -> Some("Technology"),
    "Football" -> Some("Sports"),
    "Basketball" -> Some("Sports"),
    "Formula 1" -> Some("Sports"))

  /** Taxonomy as a (category, parent_category) dim table. */
  def taxonomyDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    taxonomy.map { case (c, p) => (c, p.orNull) }.toDF("category", "parent_category")
  }

  /** A7b: parent-category rollup — _store_interest_results keeps one
    * (user, category) row with the max confidence; this rolls those
    * child-level interests up the taxonomy: per (user, parent) keep the
    * strongest child (argmax by confidence, name tie-break). A category
    * with no taxonomy row (or a main category) is its own parent, so the
    * rollup is total. The dim joins broadcast (27 rows); the argmax is a
    * max_by hash aggregate — partial-agg friendly, no window.
    */
  def interestParentRollup(interests: DataFrame, taxonomy: DataFrame): DataFrame =
    interests
      .join(broadcast(taxonomy), Seq("category"), "left")
      .withColumn("parent", coalesce(col("parent_category"), col("category")))
      .groupBy("user_id", "parent")
      .agg(
        max_by(col("category"), struct(col("confidence"), col("category"))).as("top_category"),
        max(col("confidence")).as("top_confidence"),
        count(lit(1)).as("n_interests"))
      .select(col("user_id"), col("parent").as("parent_category"),
        col("top_category"), col("top_confidence"), col("n_interests"))

  /** Deterministic per-user interests over the REAL taxonomy names,
    * derived from events: each (user, event) votes for a category by
    * event_id, confidence from the id too; one row per (user, category)
    * with the max confidence (exactly _store_interest_results'
    * keep-best upsert). Nine subcategories + three mains, so the rollup
    * exercises both the child→parent path and the self-parent path.
    */
  val interestVoteCategories: Seq[String] = Seq(
    "Streetwear", "Luxury Fashion", "Sustainable Fashion",
    "Mobile Tech", "AI & Machine Learning", "Programming",
    "Football", "Basketball", "Formula 1",
    "Music", "Lifestyle", "Humor")

  def syntheticInterests(events: DataFrame): DataFrame =
    events
      .select(
        col("user_id"),
        element_at(
          typedLit(interestVoteCategories),
          (pmod(col("event_id"), lit(12)) + 1).cast("int")).as("category"),
        round(pmod(col("event_id"), lit(100)).cast("double") / 100.0, 2).as("confidence"))
      .groupBy("user_id", "category")
      .agg(max(col("confidence")).as("confidence"))

  def interestParentRollupQuery(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    interestParentRollup(syntheticInterests(events), taxonomyDim(spark))
  }

  val interestParentRollupSql: String = {
    val cats = interestVoteCategories.map(c => s"'$c'").mkString(", ")
    val taxRows = taxonomy.map {
      case (c, Some(p)) => s"('$c', '$p')"
      case (c, None)    => s"('$c', NULL)"
    }.mkString(", ")
    s"""WITH tax(category, parent_category) AS (VALUES $taxRows),
       |votes AS (
       |  SELECT user_id, ([$cats])[CAST(event_id % 12 AS INT) + 1] AS category,
       |    round(CAST(event_id % 100 AS DOUBLE) / 100.0, 2) AS confidence
       |  FROM events
       |),
       |interests AS (
       |  SELECT user_id, category, max(confidence) AS confidence
       |  FROM votes GROUP BY user_id, category
       |),
       |joined AS (
       |  SELECT i.user_id, i.category, i.confidence,
       |    coalesce(t.parent_category, i.category) AS parent
       |  FROM interests i LEFT JOIN tax t ON i.category = t.category
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, parent
       |    ORDER BY confidence DESC, category DESC) AS rn
       |  FROM joined
       |)
       |SELECT r.user_id, r.parent AS parent_category, r.category AS top_category,
       |  m.top_confidence, m.n_interests
       |FROM ranked r JOIN (
       |  SELECT user_id, parent, max(confidence) AS top_confidence,
       |    count(*) AS n_interests
       |  FROM joined GROUP BY user_id, parent) m
       |ON r.user_id = m.user_id AND r.parent = m.parent
       |WHERE r.rn = 1""".stripMargin
  }

  /** A8: category hierarchy rollup — the reference's parent/child interest
    * taxonomy (interest_analyzer.py:40-115) re-expressed as the
    * nation→region rollup: small dims broadcast, fact side aggregated
    * with partial (map-side) combine.
    */
  def categoryRollup(orders: DataFrame, customer: DataFrame,
                     nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        money(sum(dec(col("o_totalprice")))).as("revenue"))

  val categoryRollupSql: String =
    """SELECT r_name, count(DISTINCT c_custkey) AS n_customers, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** A9: scrape-job progress stats — status/type breakdown with share of
    * total (scrape_jobs bookkeeping, scheduler + scraper). The total is a
    * window over the already-aggregated 5-row frame: free.
    */
  def jobProgress(events: DataFrame): DataFrame = {
    val agged = events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      money(sum(dec(col("value")))).as("total_value"))
    // Share of grand total WITHOUT a global window (a constant partition
    // key gets constant-folded back to an empty spec): the total is its
    // own one-row aggregate — a column-less count(*) scan — broadcast
    // onto the |event_type|-row frame.
    val tot = events.agg(count(lit(1)).cast("double").as("tot"))
    agged
      .crossJoin(broadcast(tot))
      .withColumn("share", round(col("n").cast("double") / col("tot"), 4))
      .drop("tot")
  }

  val jobProgressSql: String =
    """WITH agged AS (SELECT event_type, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1)
      |SELECT event_type, n, total_value,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (), 4) AS share
      |FROM agged""".stripMargin

  /** A10: daily quota — the scheduler caps work at N/day
    * (scheduler/job_scheduler.py:33, daily_quota).
    *
    * Scale note: the obvious `row_number() OVER (PARTITION BY day ORDER
    * BY event_id)` sorts *every* row of each day inside one window task
    * (one day = one partition AQE cannot split — at 100 TB/day that's
    * billions of rows in a single sort to keep ≤quota of them). Instead
    * a bounded [[graft.functions.Exprs.MinKLong]] aggregate carries at
    * most `quota` event_ids per day through a plain hash-agg: map-side
    * partials are quota-bounded, no window, no per-day sort.
    */
  def dailyQuota(events: DataFrame, quota: Int = 5): DataFrame = {
    val day = to_date(date_trunc("day", col("ts")))
    events
      // explicit non-null contract: MinKLong skips nulls, so a NULL
      // event_id must not count toward `total` either (the oracle
      // filters identically)
      .filter(col("event_id").isNotNull)
      .select(day.as("day"), col("event_id"))
      .groupBy("day")
      .agg(
        count(lit(1)).as("total"),
        Exprs.minK(col("event_id"), quota).as("kept_ids"))
      .select(col("day"), col("total"),
        size(col("kept_ids")).cast("long").as("kept"))
  }

  val dailyQuotaSql: String =
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |  row_number() OVER (PARTITION BY CAST(date_trunc('day', ts) AS DATE) ORDER BY event_id) AS rn
      |FROM events WHERE event_id IS NOT NULL)
      |SELECT day, count(*) AS total,
      |  CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS kept
      |FROM d GROUP BY day""".stripMargin

  /** A10b: the quota'd rows themselves — which events each day actually
    * admits (the scheduler's `ORDER BY job_id LIMIT n` batch,
    * scheduler/job_scheduler.py:96-106, applied per day). Same bounded
    * min-k aggregate, exploded back to rows: output ≤ quota × days.
    */
  def dailyQuotaRows(events: DataFrame, quota: Int = 5): DataFrame = {
    val day = to_date(date_trunc("day", col("ts")))
    events
      .filter(col("event_id").isNotNull)
      .select(day.as("day"), col("event_id"))
      .groupBy("day")
      .agg(Exprs.minK(col("event_id"), quota).as("kept_ids"))
      .select(col("day"), explode(col("kept_ids")).as("event_id"))
  }

  val dailyQuotaRowsSql: String =
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_id,
      |  row_number() OVER (PARTITION BY CAST(date_trunc('day', ts) AS DATE) ORDER BY event_id) AS rn
      |FROM events WHERE event_id IS NOT NULL)
      |SELECT day, event_id FROM d WHERE rn <= 5""".stripMargin

  /** A20: trailing-window activity — per event, the user's event count
    * and value sum over the preceding 7 days (the rate-limit /
    * engagement-velocity metric a scheduler consults before queueing
    * more work; generalizes the daily quota to a sliding window).
    * A keyed RANGE-frame window over exact event-time micros: partitions
    * by user (max-cardinality key), frame bounds are event-time offsets
    * — no self-join, no explosion; per-user data streams once through a
    * sliding aggregate. Money through DECIMAL like every other sum.
    */
  def rollingActivity(events: DataFrame,
                      windowUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t"))
      .rangeBetween(-windowUs, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), tUs(col("ts")).as("t"),
        col("value"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("sum_7d", money(sum(dec(col("value"))).over(w)))
      .select("user_id", "event_id", "n_7d", "sum_7d")
  }

  val rollingActivitySql: String =
    """SELECT user_id, event_id, count(*) OVER w AS n_7d,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))) OVER w, 2) AS DOUBLE) AS sum_7d
      |FROM (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY t
      |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""".stripMargin

  /** A11: batch assignment — the analyzer chunks following lists into
    * fixed batches (interest_analyzer.py:168, batch_size=20).
    *
    * `source` is a bounded catalog, so a per-source row_number window
    * over the raw frame would make one dominant source a single
    * unsplittable sort task at 100 TB. Distributed ranking instead
    * ([[DistributedRank]]): range-bucket doc_id, prefix-sum per-bucket
    * counts on the bounded (source × bucket) aggregate, then number rows
    * locally within each bucket and add the offset. Identical output,
    * per-task work bounded by one bucket.
    */
  def batchAssign(documents: DataFrame, batchSize: Int = 20,
                  buckets: Int = 1024): DataFrame = {
    val base = documents.select(col("doc_id"), col("source"))
    val wLocal = Window.partitionBy("source", DistributedRank.BucketCol)
      .orderBy("doc_id")
    DistributedRank.withBucketOffsets(base, "source", "doc_id", lit(1L), buckets)
      .withColumn("rn", col(DistributedRank.OffsetCol) + row_number().over(wLocal))
      .withColumn("batch_id",
        floor((col("rn") - 1) / lit(batchSize.toDouble)).cast("long"))
      .select("doc_id", "source", "batch_id")
  }

  val batchAssignSql: String =
    """SELECT doc_id, source,
      |  CAST(floor((row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) / 20.0) AS BIGINT) AS batch_id
      |FROM documents""".stripMargin

  /** A12: inter-event gaps — the scraper enforces ≥3s between requests
    * (instagram_scraper.py:158-167, _add_delay). Per-user lag() deltas in
    * exact integer micros.
    */
  def interEventGaps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id"))
    events
      .select(col("user_id"), col("event_id"), tUs(col("ts")).as("t"))
      .withColumn("gap_us", col("t") - lag(col("t"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        round(sum(col("gap_us")).cast("double") / count(lit(1)), 2).as("avg_gap_us"))
  }

  val interEventGapsSql: String =
    """WITH g AS (SELECT user_id,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS gap_us
      |FROM events)
      |SELECT user_id, count(*) AS n_gaps, min(gap_us) AS min_gap_us,
      |  round(CAST(sum(gap_us) AS DOUBLE) / count(*), 2) AS avg_gap_us
      |FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""".stripMargin

  /** A13: sessionization — "realistic session management" (README
    * anti-detection #4): gap > 30 min starts a new session; session id is
    * a per-user running sum. One hash partition per user, no global state.
    */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy(col("event_id"))
    events
      .select(col("user_id"), col("event_id"), tUs(col("ts")).as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(wOrd))
      .withColumn("is_new",
        when(col("prev_t").isNull || col("t") - col("prev_t") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("t")) - min(col("t"))).as("duration_us"))
  }

  val sessionizeSql: String =
    """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS t,
      |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_t
      |FROM events),
      |s AS (SELECT user_id, event_id, t,
      |  CAST(sum(CASE WHEN prev_t IS NULL OR t - prev_t > 1800000000 THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |FROM t)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  max(t) - min(t) AS duration_us
      |FROM s GROUP BY user_id, session_id""".stripMargin

  /** A14: top influencers — follower-count ranking over the edge graph.
    * rank() keeps ties (deterministic result set); the rank filter is a
    * window-group-limit, not a global materialized sort.
    *
    * Degenerate-tie guard: if the graph has fewer than k distinct heavy
    * degrees (e.g. a constant-degree graph), the k-th-degree threshold
    * collapses and "k + ties" survivors can approach the whole user
    * table — which would then be funnelled into the single-partition
    * rank below. The bounded `limit(cap+1).count()` probe (never a full
    * count of a degenerate survivor set) fails fast with a clear message
    * instead of silently building a multi-TB one-task sort.
    */
  def topInfluencers(events: DataFrame, k: Int = 10,
                     maxSurvivors: Int = 10000): DataFrame = {
    // The degree table feeds three consumers (k-th-degree threshold, the
    // tie-plateau probe, the final survivor ranking) — persist it once
    // instead of re-aggregating the edge relation per consumer.
    val in = GraftCache.persistTracked(
      followEdgesCached(events).groupBy(col("dst").as("user_id"))
        .agg(count(lit(1)).as("in_deg")))
    // rank-with-ties over the full degree table would single-partition a
    // user-cardinality frame. Scale-safe equivalent: take the k-th degree
    // via sort+limit (TakeOrderedAndProject), broadcast it as a threshold,
    // then rank only the >= threshold survivors (k + ties rows).
    val kth = in.orderBy(col("in_deg").desc).limit(k)
      .agg(min(col("in_deg")).as("thr"))
    val survivors = in.crossJoin(broadcast(kth))
      .filter(col("in_deg") >= col("thr"))
    val nSurv = survivors.limit(maxSurvivors + 1).count()
    if (nSurv > maxSurvivors) throw new IllegalStateException(
      s"topInfluencers: degenerate tie plateau — more than $maxSurvivors users " +
        s"share the top-$k degree threshold, so rank() carries no information. " +
        "Filter on the degree threshold directly (no rank), or raise maxSurvivors " +
        "if the plateau is genuinely wanted.")
    // rank()-with-ties over the (≤ k+ties)-row survivor frame, without a
    // Window.partitionBy() single-partition window: repartition(1) (a
    // shuffle barrier — upstream agg stays parallel; only the tiny
    // survivor rows move), sort the one partition, number rows with
    // monotonically_increasing_id, then rank = min row-number within the
    // tie group via a keyed (non-empty-spec) window.
    survivors
      .repartition(1)
      .sortWithinPartitions(col("in_deg").desc, col("user_id"))
      .withColumn("rn", monotonically_increasing_id() + 1)
      .withColumn("rnk",
        min(col("rn")).over(Window.partitionBy("in_deg")).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("user_id"), col("in_deg"), col("rnk"))
  }

  val topInfluencersSql: String =
    s"""WITH edges AS ($edgesSql),
       |i AS (SELECT dst AS user_id, count(*) AS in_deg FROM edges GROUP BY 1)
       |SELECT user_id, in_deg, rnk FROM
       |  (SELECT *, rank() OVER (ORDER BY in_deg DESC) AS rnk FROM i)
       |WHERE rnk <= 10""".stripMargin

  /** A15: profile⋈activity enrichment — per-nation engagement: the
    * nation dim is broadcast (no fact shuffle for the dim join).
    */
  def engagementJoin(customer: DataFrame, orders: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(customer.select("c_custkey", "c_nationkey", "c_acctbal"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        money(sum(dec(col("o_totalprice")))).as("revenue"))

  val engagementJoinSql: String =
    """SELECT n_name, o_orderstatus, count(*) AS n_orders,
      |  count(DISTINCT c_custkey) AS n_customers,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name, o_orderstatus""".stripMargin

  /** A16: conversion funnel — users whose first purchase follows their
    * signup within 7 days (the activation metric a scraping pipeline's
    * analytics layer reports). Two filtered aggregates + one join on the
    * user key; time math in exact integer micros.
    */
  def funnel(events: DataFrame, withinDays: Int = 7): DataFrame = {
    val signup = events.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(tUs(col("ts"))).as("signup_us"))
    val purchase = events.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(tUs(col("ts"))).as("first_purchase_us"))
    signup.join(purchase, Seq("user_id"), "left")
      .select(
        col("user_id"), col("signup_us"),
        col("first_purchase_us"),
        (col("first_purchase_us").isNotNull &&
          col("first_purchase_us") >= col("signup_us") &&
          col("first_purchase_us") - col("signup_us") <= lit(withinDays.toLong * 86400L * 1000000L))
          .as("converted"))
  }

  val funnelSql: String =
    """WITH s AS (SELECT user_id, min(epoch_us(ts)) AS signup_us
      |           FROM events WHERE event_type = 'signup' GROUP BY 1),
      |p AS (SELECT user_id, min(epoch_us(ts)) AS first_purchase_us
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT s.user_id, signup_us, first_purchase_us,
      |  (first_purchase_us IS NOT NULL AND first_purchase_us >= signup_us
      |   AND first_purchase_us - signup_us <= 7::BIGINT * 86400 * 1000000) AS converted
      |FROM s LEFT JOIN p ON s.user_id = p.user_id""".stripMargin

  /** A17: weekly cohort retention — users grouped by first-seen week;
    * for each (cohort, week-offset), how many distinct cohort members
    * were active. The classic retention triangle, built from one
    * first-seen aggregate joined back to the event stream.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val t = events.select(col("user_id"), tUs(col("ts")).as("t"))
    val first = t.groupBy("user_id").agg(min(col("t")).as("first_t"))
    t.join(first, "user_id")
      .select(
        floor(col("first_t") / weekUs).cast("long").as("cohort_week"),
        floor((col("t") - col("first_t")) / lit(weekUs).cast("double")).cast("long").as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  val retentionCohortsSql: String =
    """WITH t AS (SELECT user_id, epoch_us(ts) AS t FROM events),
      |f AS (SELECT user_id, min(t) AS first_t FROM t GROUP BY 1)
      |SELECT CAST(floor(f.first_t / 604800000000) AS BIGINT) AS cohort_week,
      |       CAST(floor((t.t - f.first_t) / 604800000000.0) AS BIGINT) AS week_offset,
      |       count(DISTINCT t.user_id) AS n_active
      |FROM t JOIN f ON t.user_id = f.user_id
      |GROUP BY 1, 2""".stripMargin

  /** A21: semi-structured payload extraction — every event row carries a
    * JSON `props` blob (the reference stores scraped profile payloads the
    * same way); summarize the embedded metric per event type. The scale
    * path is `from_json` with an EXPLICIT schema: one parse per row into
    * a typed struct at the scan side (schema inference over 100 TB is a
    * full extra pass, and per-key `get_json_object` re-parses the blob
    * for every key extracted). The aggregate is a plain hash agg;
    * avg is emitted as an exact BIGINT-sum / count division (IEEE
    * division is correctly rounded, so both engines render the same
    * float64 — no round() dialect risk).
    */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String])
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .select(col("event_type"), col("n"), col("sum_k"), col("min_k"), col("max_k"),
        (col("sum_k").cast("double") / col("n")).as("avg_k"))

  val propsStatsSql: String =
    """WITH e AS (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
      |SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |  min(k) AS min_k, max(k) AS max_k,
      |  CAST(CAST(sum(k) AS BIGINT) AS DOUBLE) / count(k) AS avg_k
      |FROM e GROUP BY event_type""".stripMargin

  // -------- wiring --------

  /** A22: snapshot reconciliation — per-user activity counts for two
    * consecutive windows, FULL OUTER joined and classified
    * new/churned/changed/stable. The reference recomputes follower
    * snapshots per scrape run and diffs against the stored row
    * (scraper.py:203 upsert + follower delta logging); this is that
    * diff as one declarative plan.
    *
    * Scale shape: each side is aggregated to one row per user BEFORE
    * the full-outer join, so the join is bounded by |users| not
    * |events|, and both sides arrive hash-partitioned on user_id from
    * their own aggregation — Catalyst reuses the partitioning, one
    * shuffle per side total.
    */
  def snapshotDiff(events: DataFrame,
                   aStartUs: Long = 1704067200000000L,  // 2024-01-01 UTC
                   splitUs: Long = 1704672000000000L,   // 2024-01-08 UTC
                   bEndUs: Long = 1705276800000000L     // 2024-01-15 UTC
                  ): DataFrame = {
    val t = tUs(col("ts"))
    val prev = events.filter(t >= aStartUs && t < splitUs)
      .groupBy("user_id").agg(count(lit(1)).as("prev_cnt"))
    val curr = events.filter(t >= splitUs && t < bEndUs)
      .groupBy("user_id").agg(count(lit(1)).as("curr_cnt"))
    prev.join(curr, Seq("user_id"), "full_outer")
      .select(col("user_id"), col("prev_cnt"), col("curr_cnt"),
        when(col("curr_cnt").isNull, "churned")
          .when(col("prev_cnt").isNull, "new")
          .when(col("prev_cnt") =!= col("curr_cnt"), "changed")
          .otherwise("stable").as("status"))
  }

  def snapshotDiffSql(aStartUs: Long = 1704067200000000L,
                      splitUs: Long = 1704672000000000L,
                      bEndUs: Long = 1705276800000000L): String =
    s"""WITH prev AS (
       |  SELECT user_id, count(*) AS prev_cnt FROM events
       |  WHERE epoch_us(ts) >= $aStartUs AND epoch_us(ts) < $splitUs GROUP BY 1),
       |curr AS (
       |  SELECT user_id, count(*) AS curr_cnt FROM events
       |  WHERE epoch_us(ts) >= $splitUs AND epoch_us(ts) < $bEndUs GROUP BY 1)
       |SELECT coalesce(prev.user_id, curr.user_id) AS user_id, prev_cnt, curr_cnt,
       |  CASE WHEN curr_cnt IS NULL THEN 'churned'
       |       WHEN prev_cnt IS NULL THEN 'new'
       |       WHEN prev_cnt <> curr_cnt THEN 'changed'
       |       ELSE 'stable' END AS status
       |FROM prev FULL OUTER JOIN curr ON prev.user_id = curr.user_id""".stripMargin

  /** A24: event-rate spike detection — the monitoring pass a scraper
    * operation runs over its own event firehose (reference domain: the
    * job scheduler's health view of scrape activity): hourly counts
    * per event type, flagged when an hour runs at more than 2× the
    * mean of the previous three OBSERVED hours (3n > 2·Σprev3 — exact
    * integer compare, robust to quiet hours because the lag walks
    * observed rows, not wall-clock slots; the first three hours of a
    * type carry prev3 = NULL and never flag).
    *
    * Scale: the raw firehose collapses FIRST through a keyed
    * (type, hour) hash agg — the only data-proportional shuffle; the
    * lag window then runs over the AGGREGATED series only (per type,
    * one row per hour — bounded by time, not by corpus; the
    * q_revenue_share rule for windows-after-aggregation).
    */
  def rateSpikes(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hour_id"))
      .groupBy("event_type", "hour_id")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour_id")
    hourly
      .withColumn("prev3",
        lag(col("n"), 1).over(w) + lag(col("n"), 2).over(w) + lag(col("n"), 3).over(w))
      .withColumn("is_spike",
        col("prev3").isNotNull && col("n") * 3 > col("prev3") * 2)
  }

  val rateSpikesSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_id,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT event_type, hour_id, n,
      |    lag(n, 1) OVER w + lag(n, 2) OVER w + lag(n, 3) OVER w AS prev3
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_id))
      |SELECT event_type, hour_id, n, prev3,
      |  prev3 IS NOT NULL AND n * 3 > prev3 * 2 AS is_spike
      |FROM lagged""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rate_spikes" -> ((s, d) => rateSpikes(Tables.events(s, d))),
    "q_snapshot_diff" -> ((s, d) => snapshotDiff(Tables.events(s, d))),
    "q_props_stats" -> ((s, d) => propsStats(Tables.events(s, d))),
    "q_upsert_latest" -> ((s, d) => upsertLatest(Tables.events(s, d))),
    "q_cdc_apply" -> ((s, d) => cdcApply(Tables.events(s, d))),
    "q_mutual_edges" -> ((s, d) => mutualEdges(Tables.events(s, d))),
    "q_follower_stats" -> ((s, d) => followerStats(Tables.events(s, d))),
    "q_pending_batch" -> ((s, d) => pendingBatch(Tables.events(s, d))),
    "q_recent_window_dedup" -> ((s, d) =>
      recentWindowDedup(Tables.events(s, d), TestdataLookbackUs)),
    "q_pending_users_antijoin" -> ((s, d) =>
      pendingUsersAntiJoin(Tables.customer(s, d), Tables.orders(s, d))),
    "q_interest_categorize" -> ((s, d) => interestCategorize(Tables.documents(s, d))),
    "q_interest_parent_rollup" -> ((s, d) => interestParentRollupQuery(Tables.events(s, d))),
    "q_category_rollup" -> ((s, d) =>
      categoryRollup(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q_job_progress" -> ((s, d) => jobProgress(Tables.events(s, d))),
    "q_daily_quota" -> ((s, d) => dailyQuota(Tables.events(s, d))),
    "q_daily_quota_rows" -> ((s, d) => dailyQuotaRows(Tables.events(s, d))),
    "q_batch_assign" -> ((s, d) => batchAssign(Tables.documents(s, d))),
    "q_interevent_gaps" -> ((s, d) => interEventGaps(Tables.events(s, d))),
    "q_rolling_7d" -> ((s, d) => rollingActivity(Tables.events(s, d))),
    "q_sessionize" -> ((s, d) => sessionize(Tables.events(s, d))),
    "q_top_influencers" -> ((s, d) => topInfluencers(Tables.events(s, d))),
    "q_engagement_join" -> ((s, d) =>
      engagementJoin(Tables.customer(s, d), Tables.orders(s, d), Tables.nation(s, d))),
    "q_funnel" -> ((s, d) => funnel(Tables.events(s, d))),
    "q_retention_cohorts" -> ((s, d) => retentionCohorts(Tables.events(s, d))))

  def oracle: Map[String, String] = Map(
    "q_rate_spikes" -> rateSpikesSql,
    "q_snapshot_diff" -> snapshotDiffSql(),
    "q_props_stats" -> propsStatsSql,
    "q_upsert_latest" -> upsertLatestSql,
    "q_cdc_apply" -> cdcApplySql,
    "q_mutual_edges" -> mutualEdgesSql,
    "q_follower_stats" -> followerStatsSql,
    "q_pending_batch" -> pendingBatchSql,
    "q_recent_window_dedup" -> recentWindowDedupSql,
    "q_pending_users_antijoin" -> pendingUsersAntiJoinSql,
    "q_interest_categorize" -> interestCategorizeSql,
    "q_interest_parent_rollup" -> interestParentRollupSql,
    "q_category_rollup" -> categoryRollupSql,
    "q_job_progress" -> jobProgressSql,
    "q_daily_quota" -> dailyQuotaSql,
    "q_daily_quota_rows" -> dailyQuotaRowsSql,
    "q_batch_assign" -> batchAssignSql,
    "q_interevent_gaps" -> interEventGapsSql,
    "q_rolling_7d" -> rollingActivitySql,
    "q_sessionize" -> sessionizeSql,
    "q_top_influencers" -> topInfluencersSql,
    "q_engagement_join" -> engagementJoinSql,
    "q_funnel" -> funnelSql,
    "q_retention_cohorts" -> retentionCohortsSql)
}
