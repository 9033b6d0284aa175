package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression gates: the properties that make these plans
  * survive a 100× scale-up, asserted on the plans themselves so a
  * refactor can't silently lose them. AQE is disabled in this session so
  * the physical nodes are directly visible to collect().
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String) =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def leafStrings(name: String): Seq[String] =
    plan(name).collectLeaves().map(_.toString)

  test("q1 pricing summary: shipdate filter and column pruning reach the parquet scan") {
    val leaves = leafStrings("q1_pricing_summary")
    assert(leaves.exists(l => l.contains("PushedFilters") && l.contains("l_shipdate")),
      s"shipdate filter not pushed:\n${leaves.mkString("\n")}")
    assert(!leaves.exists(_.contains("l_comment")),
      "scan reads l_comment — column pruning lost")
  }

  test("dim joins broadcast the small side (no fact-side shuffle)") {
    for (q <- Seq("q_join_pushdown", "q_category_rollup", "q_engagement_join")) {
      val n = plan(q).collect { case b: BroadcastExchangeLike => b }.size
      assert(n >= 1, s"$q: expected a broadcast dim exchange")
    }
  }

  test("no forced broadcast on SF-proportional dims (part/supplier)") {
    // part (~200k rows/SF) and supplier (~10k rows/SF) grow with scale
    // factor: a broadcast() hint there becomes a multi-GB broadcast at
    // the 100 TB target. The hint must be absent — only fixed-size
    // region/nation may be hinted — while the planner, free to choose,
    // still picks broadcast at test scale where the dims fit the
    // autoBroadcastJoinThreshold.
    for (q <- Seq("q_top_parts", "q14_promo_share", "q_supplier_volume",
                  "q5_local_supplier_volume")) {
      val qe = SparkEntry.queries(q)(spark, sf).queryExecution
      val hintedCols = qe.analyzed.collect {
        case h: ResolvedHint => h.child.output.map(_.name)
      }.flatten.toSet
      val factDim = hintedCols.filter(c => c.startsWith("p_") || c.startsWith("s_"))
      assert(factDim.isEmpty,
        s"$q: forced broadcast hint covers SF-proportional dim columns: $factDim")
      val n = qe.executedPlan.collect { case b: BroadcastExchangeLike => b }.size
      assert(n >= 1,
        s"$q: planner should still broadcast the small dims at sf0.001")
    }
  }

  test("top-k queries compile to TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q_top_parts", "q3_shipping_priority", "q_pending_batch", "q_bpe_merges")) {
      val n = plan(q).collect { case t: TakeOrderedAndProjectExec => t }.size
      assert(n >= 1, s"$q: expected TakeOrderedAndProject")
    }
  }

  test("q_bpe_encode is pure map-side: the encode plan contains NO exchange at all") {
    // the merge table is a memoized artifact inlined as literals, so
    // applying a trained tokenizer to a 100 TB corpus must be a single
    // embarrassingly-parallel scan — any shuffle here is a regression
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val n = plan("q_bpe_encode").collect { case e: ShuffleExchangeLike => e }.size
    assert(n == 0, s"q_bpe_encode: expected zero shuffles, got $n")
    graft.GraftCache.releaseAll(spark)
  }

  test("aggregations run partial+final (map-side combine present)") {
    for (q <- Seq("q1_pricing_summary", "q_monthly_revenue", "q_supplier_volume")) {
      val aggs = plan(q).collect { case a: BaseAggregateExec => a }
      assert(aggs.size >= 2, s"$q: expected partial+final aggregate pair, got ${aggs.size}")
    }
  }

  test("per-group rank filters compile to WindowGroupLimit (no full per-group sort retention)") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    for (q <- Seq("q_tfidf_topterms")) {
      val n = plan(q).collect { case w: WindowGroupLimitExec => w }.size
      assert(n >= 1, s"$q: rank<=k filter should push a WindowGroupLimit")
    }
  }

  test("ANN top-k is the bounded heap aggregate — no window over the scored frame") {
    // q_id is a BOUNDED probe set: a rank window here would sort one
    // probe's whole candidate list in one task at scale. All ANN lenses
    // must share the MaxKScored aggregate instead.
    // (q_ann_ivf keeps ONE window: nearest-nProbe centroid ranking over
    // the probes × centroids frame — a bounded model-size artifact, at
    // most NumProbes·NumCentroids rows, never data-proportional.)
    for (q <- Seq("q_ann_topk", "q_ann_lsh", "q_ann_multiprobe",
      "q_knn_classify", "q_friend_recs")) {
      assert(plan(q).collect { case w: WindowExec => w }.isEmpty,
        s"$q: expected no window in the plan")
    }
    for (q <- Seq("q_ann_topk", "q_ann_lsh", "q_ann_multiprobe", "q_ann_ivf",
      "q_friend_recs"))
      assert(plan(q).toString.contains("graft_max_k_scored"),
        s"$q: expected the MaxKScored aggregate")
  }

  test("round-7 shapes: ivfpq shortlist is the bounded heap, phash pairs are banded + codegen-verified") {
    // q_ann_ivfpq: the ADC shortlist and final top-k are MaxKScored
    // aggregates; the only window allowed is the probes x centroids
    // routing rank (bounded model-size frame, same exemption as
    // q_ann_ivf). A window over the ADC scan would sort a whole
    // inverted list per probe in one task at scale.
    val ivfpq = plan("q_ann_ivfpq")
    assert(ivfpq.toString.contains("graft_max_k_scored"),
      "q_ann_ivfpq: expected the MaxKScored shortlist aggregate")
    assert(ivfpq.collect { case w: WindowExec => w }.size <= 1,
      "q_ann_ivfpq: only the bounded centroid-routing window is allowed")
    // q_image_phash: pair mining must stay banded (equi-join on band
    // buckets, codegen Hamming verify) — no window, no nested-loop or
    // cartesian anywhere (an unbanded formulation would all-pairs the
    // corpus).
    val ph = plan("q_image_phash")
    assert(ph.collect { case w: WindowExec => w }.isEmpty,
      "q_image_phash: expected no window")
    assert(ph.toString.contains("graft_hamming"),
      "q_image_phash: expected the codegen Hamming verify")
    val loops = ph.toString
    assert(!loops.contains("CartesianProduct") && !loops.contains("BroadcastNestedLoopJoin"),
      "q_image_phash: pair mining must stay an equi-join on band buckets")
  }

  test("band occupancy cap is two-phase groupBy + semi-join, never a window (r10)") {
    // The cap exists BECAUSE megabuckets exist: a count-over-window on
    // (b, band_key) would buffer the hottest boilerplate bucket's whole
    // row set in one WindowExec task, and AQE can skew-split joins but
    // never window partitions. Pin the helper itself window-free...
    graft.GraftCache.releaseAll(spark)
    val docs = graft.sources.Tables.documents(spark, sf)
    val capped = graft.operators.Dedup.capBands(
      graft.operators.Dedup.minhashBands(graft.operators.Dedup.minhashSignature(docs)))
    assert(capped.queryExecution.executedPlan.collect { case w: WindowExec => w }.isEmpty,
      "capBands: occupancy guard must be groupBy + semi-join, not a window")
    // ...and the two consumers end to end: the C2 candidate miner and
    // the committed-index serve path (which re-caps the persisted band
    // table against current occupancy).
    for (q <- Seq("q_dedup_minhash_lsh", "q_dedup_vs_corpus")) {
      graft.GraftCache.releaseAll(spark)
      assert(plan(q).collect { case w: WindowExec => w }.isEmpty,
        s"$q: a window crept back into the capped-bands path")
    }
    graft.GraftCache.releaseAll(spark)
  }

  test("corpus bitext miner: bounded-heap shortlist, only the per-vector routing rank windows; calibration is window-free (r11)") {
    // q_bitext_mine_corpus: the ADC shortlist and the margin top-k sums
    // are MaxKScored aggregates; the only window allowed is the
    // per-vector coarse routing rank (≤ NumCentroids rows per key — the
    // same exemption as q_ann_ivf/q_ann_ivfpq). A window anywhere else
    // would sort a co-routed block or a margin frame in one task.
    graft.GraftCache.releaseAll(spark)
    val corpus = plan("q_bitext_mine_corpus")
    assert(corpus.toString.contains("graft_max_k_scored"),
      "q_bitext_mine_corpus: expected the MaxKScored shortlist/margin aggregates")
    assert(corpus.collect { case w: WindowExec => w }.size <= 1,
      "q_bitext_mine_corpus: only the bounded routing-rank window is allowed")
    assert(!corpus.toString.contains("CartesianProduct"),
      "q_bitext_mine_corpus: candidates must come from the co-routed block join")
    // q_margin_calibration bins the margin frame — nothing to rank
    graft.GraftCache.releaseAll(spark)
    assert(plan("q_margin_calibration").collect { case w: WindowExec => w }.isEmpty,
      "q_margin_calibration: expected no window")
    graft.GraftCache.releaseAll(spark)
  }

  test("committed SemDeDup gate: c_id-keyed pair joins, only the routing-rank window (r11)") {
    // q_semdedup_committed: both prior populations arrive through plain
    // equi-joins on the cluster id (per-cluster cost bounded by list
    // occupancy); the only window allowed is the per-vector coarse
    // routing rank (≤ NumCentroids rows per key, the q_ann_ivf
    // exemption). A window over the pair frame or a cartesian candidate
    // source would be the all-pairs hazard the clustering exists to cut.
    graft.GraftCache.releaseAll(spark)
    val p = plan("q_semdedup_committed")
    assert(p.collect { case w: WindowExec => w }.size <= 1,
      "q_semdedup_committed: only the bounded routing-rank window is allowed")
    assert(!p.toString.contains("CartesianProduct"),
      "q_semdedup_committed: prior pairs must come from the c_id equi-join")
    graft.GraftCache.releaseAll(spark)
  }

  test("chunking is shuffle-free: q_chunk_docs has no Exchange at all") {
    val exchanges = plan("q_chunk_docs").collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty,
      s"q_chunk_docs must stay map-side, found: ${exchanges.map(_.nodeName)}")
  }

  test("oov vocab is a broadcast artifact: the membership join never shuffles tokens") {
    val p = plan("q_oov_rate")
    assert(p.collect { case b: BroadcastExchangeLike => b }.nonEmpty,
      "q_oov_rate: vocab should reach the join via a broadcast exchange")
    // The membership join itself must be broadcast-hash, never a
    // shuffled join of the full exploded token stream. (The vocab's own
    // top-k derivation legitimately shuffles O(distinct tokens) rows.)
    val joins = p.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, "q_oov_rate: expected a membership join")
    val shuffledJoins = joins.filterNot(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(shuffledJoins.isEmpty,
      s"q_oov_rate: membership join is not broadcast: ${shuffledJoins.map(_.nodeName)}")
  }

  test("round-4 shapes: q18 TakeOrdered, q12/q18 unhinted, cube single Expand, bloom probe split") {
    // q18's top-k must be sort+limit, and neither Q12 nor Q18 may carry
    // a forced broadcast hint — lineitem, orders and customer are all
    // SF-proportional; strategy stays with the planner/AQE.
    assert(plan("q18_large_orders").collect {
      case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "q18_large_orders: expected TakeOrderedAndProject")
    for (q <- Seq("q12_priority_lines", "q18_large_orders")) {
      val hints = SparkEntry.queries(q)(spark, sf).queryExecution.analyzed.collect {
        case h: ResolvedHint => h }
      assert(hints.isEmpty, s"$q: no join-strategy hint may be forced")
    }
    // all four CUBE grouping sets from ONE Expand feeding one agg pair —
    // not a union of four scans
    val cube = plan("q_cube_revenue")
    assert(cube.collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.size == 1,
      "q_cube_revenue: expected exactly one Expand")
    assert(cube.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.size == 1,
      "q_cube_revenue: CUBE must not rescan the fact table per grouping set")
    // the Bloom dedup's exact join input must be the maybe-filtered
    // branch, not the full delta: the probe appears as a Filter above
    // the scan side feeding the fingerprint join
    val bloomPlan = plan("q_dedup_incremental_bloom").toString
    assert(bloomPlan.contains("might_contain"),
      "q_dedup_incremental_bloom: Bloom probe missing from the physical plan")
  }

  test("late round-4 shapes: q4 semi-join, q7/q10 unhinted facts, repetition profile shuffle-free") {
    // q4's EXISTS must decorrelate to a LEFT SEMI join — never a
    // per-row subquery or a nested loop over lineitem
    val q4 = plan("q4_order_priority")
    val semis = q4.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, s"q4_order_priority: EXISTS did not become a semi-join:\n$q4")
    assert(q4.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c }.isEmpty,
      "q4_order_priority: cartesian product in the plan")
    // q7/q10: only the fixed 25-row nation dim may be hinted; supplier /
    // customer / the fact spine stay with the planner
    for (q <- Seq("q7_volume_shipping", "q10_returned_items", "q2_min_cost_supplier")) {
      val hintedCols = SparkEntry.queries(q)(spark, sf).queryExecution.analyzed.collect {
        case h: ResolvedHint => h.child.output.map(_.name)
      }.flatten.toSet
      val nonNation = hintedCols.filterNot(_.startsWith("n_"))
      assert(nonNation.isEmpty, s"$q: forced broadcast beyond nation: $nonNation")
    }
    // q10's top-k is sort+limit
    assert(plan("q10_returned_items").collect {
      case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "q10_returned_items: expected TakeOrderedAndProject")
    // the repetition profile is a pure map-side projection: no Exchange
    assert(plan("q_repetition_profile").collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }.isEmpty,
      "q_repetition_profile must not shuffle")
  }

  test("snapshot diff / split / source overlap: joins bounded, map-side ops shuffle-free") {
    // q_snapshot_diff: the FULL OUTER join must sit above two
    // aggregations — it joins per-user counts, never raw events
    val sd = plan("q_snapshot_diff")
    val fo = sd.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.FullOuter => j
    }
    assert(fo.size == 1, "q_snapshot_diff: expected exactly one full-outer join")
    for (side <- Seq(fo.head.left, fo.head.right))
      assert(side.collectFirst { case a: BaseAggregateExec => a }.nonEmpty,
        "q_snapshot_diff: full-outer side is not pre-aggregated")
    // q_split_assign: pure projection, no Exchange
    assert(plan("q_split_assign").collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }.isEmpty,
      "q_split_assign must not shuffle")
    // q_source_overlap: the overlap matrix comes from a groupBy-collect,
    // NOT a fingerprint self-join — no join operator anywhere
    assert(plan("q_source_overlap").collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty,
      "q_source_overlap must not contain a join (self-join shape crept back)")
    // q_reservoir_sample: bounded top-k aggregate, never a global
    // sort/window over the corpus
    val rs = plan("q_reservoir_sample")
    assert(rs.collect { case w: WindowExec => w }.isEmpty &&
      rs.collect { case s: org.apache.spark.sql.execution.SortExec if s.global => s }.isEmpty,
      "q_reservoir_sample: global sort or window crept in")
    // q_epoch_mix: map-side explode only
    assert(plan("q_epoch_mix").collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }.isEmpty,
      "q_epoch_mix must not shuffle")
  }

  test("slowest fact scans stay single-scan under AQE: q18/q2/q10 read lineitem once") {
    // the three slowest warm queries are irreducible full-fact aggs;
    // their one defense at 100 TB is reading the fact exactly once
    // (q18's HAVING, q2's argmin, q10's rank all pre-aggregate before
    // any join). ScaleAudit re-checks the same shapes at 10x data.
    for (q <- Seq("q18_large_orders", "q2_min_cost_supplier", "q10_returned_items")) {
      val scans = plan(q).collectLeaves().map(_.toString).count(_.contains("lineitem"))
      assert(scans == 1, s"$q: lineitem scanned $scans times (expected exactly 1)")
    }
  }

  test("no query contains a single-partition global window over a raw frame") {
    // via WindowAudit.globalWindows: empty-partition WindowExec flags
    // unless the frame below it is fully reduced (an aggregate onto a
    // bounded bucket space — the DistributedRank offsets prefix sum)
    SparkEntry.queries.keys.foreach { q =>
      assert(WindowAudit.globalWindows(SparkEntry.queries(q)(spark, sf)) == 0,
        s"$q: global WindowExec over a raw frame")
    }
  }

  test("global-window detector: raw global rank trips it, reduced-frame prefix sums are exempt") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)
    // Positive control: the naive corpus shuffle — row_number over an
    // empty partition spec on the raw frame — is the one shape that
    // cannot survive a large input.
    val naive = docs.withColumn("rn",
      row_number().over(Window.orderBy(md5(col("text")))))
    assert(WindowAudit.globalWindows(naive) == 1,
      "detector missed a raw global row_number")
    // Exemption: a global prefix-sum over a bucket AGGREGATE (the
    // DistributedRank offsets frame, <= buckets rows by construction)
    // is bounded single-task work, not a hazard.
    val offsets = docs
      .groupBy(pmod(col("doc_id"), lit(64)).as("b")).agg(count(lit(1)).as("c"))
      .withColumn("off", sum(col("c")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)))
    assert(WindowAudit.globalWindows(offsets) == 0,
      "detector false-positives on a prefix sum over a bounded aggregate")
    // (the preceding test already sweeps every registered query through
    // this detector — only the positive/negative controls live here)
    graft.GraftCache.releaseAll(spark)
  }

  test("no query windows over a time bucket of a raw frame; detector catches the old shape") {
    // Positive control: the pre-round-3 dailyQuota shape — row_number
    // over (partition by day) on raw events — must trip the detector.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val events = graft.sources.Tables.events(spark, sf)
    val oldShape = events
      .withColumn("day", to_date(date_trunc("day", col("ts"))))
      .withColumn("rn", row_number().over(Window.partitionBy("day").orderBy("event_id")))
    assert(WindowAudit.timeBucketWindows(oldShape) == 1,
      "detector missed the per-day window over raw events")

    // A time-bucket key laundered through TWO chained projects must
    // still trip it (alias expansion has to reach a fixpoint).
    val laundered = events
      .select(col("*"), to_date(date_trunc("day", col("ts"))).as("d"))
      .select(col("event_id"), col("d").as("day"))
      .withColumn("rn", row_number().over(Window.partitionBy("day").orderBy("event_id")))
    assert(WindowAudit.timeBucketWindows(laundered) == 1,
      "detector missed a day window aliased through two projects")

    // A per-key window (sessionize shape) must NOT trip it.
    val keyed = events
      .withColumn("rn", row_number().over(Window.partitionBy("user_id").orderBy("event_id")))
    assert(WindowAudit.timeBucketWindows(keyed) == 0,
      "detector false-positives on a high-cardinality key window")

    // And the registered queries are all clean.
    SparkEntry.queries.keys.foreach { q =>
      val n = WindowAudit.timeBucketWindows(SparkEntry.queries(q)(spark, sf))
      assert(n == 0, s"$q: $n time-bucket window(s) over a raw frame")
    }
  }

  test("no query windows over a bounded catalog key of a raw frame; detector catches the r04 batchAssign") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)

    // Positive control: the r04 batchAssign shape — row_number over
    // (partition by source) on the raw documents frame.
    val oldShape = docs
      .select(col("doc_id"), col("source"))
      .withColumn("batch_id", floor((row_number().over(
        Window.partitionBy("source").orderBy("doc_id")) - 1) / lit(20.0)).cast("long"))
    assert(WindowAudit.boundedKeyWindows(oldShape) == 1,
      "detector missed the per-source window over raw documents")

    // A bounded key laundered through a project alias must still trip it.
    val laundered = docs
      .select(col("doc_id"), col("source").as("src"))
      .withColumn("rn", row_number().over(Window.partitionBy("src").orderBy("doc_id")))
    assert(WindowAudit.boundedKeyWindows(laundered) == 1,
      "detector missed a source window aliased through a project")

    // The DistributedRank scaffold — (source, bucket) local window plus a
    // prefix-sum window over the per-bucket AGGREGATE — must NOT trip it.
    assert(WindowAudit.boundedKeyWindows(
      graft.operators.Reference.batchAssign(docs)) == 0,
      "detector false-positives on the distributed-ranking batchAssign")
    assert(WindowAudit.boundedKeyWindows(
      graft.operators.TextOps.tokenBudgetMix(docs)) == 0,
      "detector false-positives on the distributed-ranking tokenBudgetMix")

    // A per-key window over a high-cardinality key must NOT trip it.
    val keyed = docs
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("source")))
    assert(WindowAudit.boundedKeyWindows(keyed) == 0,
      "detector false-positives on a high-cardinality key window")

    // And the registered queries are all clean.
    SparkEntry.queries.keys.foreach { q =>
      val n = WindowAudit.boundedKeyWindows(SparkEntry.queries(q)(spark, sf))
      assert(n == 0, s"$q: $n bounded-catalog-key window(s) over a raw frame")
    }
  }

  test("no query windows over a content fingerprint of a raw frame; detector catches the r10 C1 keeper (r11)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sf)

    // Positive control: the pre-round-11 dedupExact keeper — min over
    // (partition by md5(text)) on the raw documents frame. A boilerplate
    // doc duplicated 10^8 times is ONE WindowExec partition here.
    val oldShape = docs
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("keeper_id", min(col("doc_id")).over(Window.partitionBy("fp")))
    assert(WindowAudit.fingerprintKeyWindows(oldShape) == 1,
      "detector missed the per-fingerprint window over raw documents")

    // Laundered through two chained projects — alias expansion must reach it.
    val laundered = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .select(col("doc_id"), col("h").as("fp"))
      .withColumn("keeper_id", min(col("doc_id")).over(Window.partitionBy("fp")))
    assert(WindowAudit.fingerprintKeyWindows(laundered) == 1,
      "detector missed a fingerprint key aliased through two projects")

    // A SALTED window — partitionBy(key, pmod(hash, n)) — is the fix for
    // hot keys, not the hazard, and must NOT trip it.
    val salted = docs
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(16)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source", "salt").orderBy("doc_id")))
    assert(WindowAudit.fingerprintKeyWindows(salted) == 0,
      "detector false-positives on a salt (mod-bounded hash) partition key")

    // A per-key window over a natural high-cardinality key must NOT trip it.
    val keyed = docs
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy("source")))
    assert(WindowAudit.fingerprintKeyWindows(keyed) == 0,
      "detector false-positives on a plain high-cardinality key window")

    // The de-windowed queries execute window-free end to end...
    for (q <- Seq("q_dedup_exact", "q_upsert_latest")) {
      graft.GraftCache.releaseAll(spark)
      assert(plan(q).collect { case w: WindowExec => w }.isEmpty,
        s"$q: a window crept back into the de-windowed path (r11)")
    }
    graft.GraftCache.releaseAll(spark)

    // ...and every registered query is clean under the new detector.
    SparkEntry.queries.keys.foreach { q =>
      val n = WindowAudit.fingerprintKeyWindows(SparkEntry.queries(q)(spark, sf))
      assert(n == 0, s"$q: $n fingerprint-key window(s) over a raw frame")
    }
  }

  test("q6: every predicate reaches the parquet scan; no shuffle beyond the scalar reduce") {
    val leaves = leafStrings("q6_revenue_forecast")
    for (c <- Seq("l_shipdate", "l_quantity"))
      assert(leaves.exists(l => l.contains("PushedFilters") && l.contains(c)),
        s"$c filter not pushed:\n${leaves.mkString("\n")}")
    // Scan-dominant plan: exactly one exchange (the single-row final agg).
    val exchanges = plan("q6_revenue_forecast").collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    assert(exchanges <= 1, s"q6 grew $exchanges shuffles — expected at most the scalar-agg reduce")
  }

  test("q19: the OR-envelope bounds are pushed to both scans before the join") {
    val leaves = leafStrings("q19_branded_revenue")
    assert(leaves.exists(l => l.contains("PushedFilters") && l.contains("l_quantity")),
      s"lineitem quantity envelope not pushed:\n${leaves.mkString("\n")}")
    assert(leaves.exists(l => l.contains("PushedFilters") && l.contains("p_size")),
      s"part size envelope not pushed:\n${leaves.mkString("\n")}")
  }

  test("q13: orders aggregate to one row per customer BEFORE the outer join") {
    // The left join's right side must be the aggregated per-customer
    // frame, not raw orders: a HashAggregate must sit below the join.
    val p = plan("q13_cust_dist")
    val join = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(join.nonEmpty, "q13: expected a join")
    val aggBelowJoin = join.exists(_.right.collect {
      case a: BaseAggregateExec => a
    }.nonEmpty)
    assert(aggBelowJoin, "q13: per-customer aggregate must run below the outer join")
  }

  test("q21: the fact is aggregated per order once — no lineitem self-join") {
    // Classic Q21 self-joins lineitem twice (EXISTS + NOT EXISTS); the
    // re-expression must read it exactly once.
    val liScans = leafStrings("q21_waiting_suppliers").count(_.contains("lineitem"))
    assert(liScans == 1, s"q21 reads lineitem $liScans times — expected 1")
    // and the top-k is sort+limit, not a global sort
    assert(plan("q21_waiting_suppliers").collect {
      case t: TakeOrderedAndProjectExec => t
    }.nonEmpty, "q21: top-k must compile to TakeOrderedAndProject")
  }

  test("q11/q15: the global scalar is a broadcast, and the fact is scanned once") {
    for (q <- Seq("q11_important_parts", "q15_top_supplier")) {
      val p = plan(q)
      assert(p.collect { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"$q: the one-row scalar aggregate must broadcast back")
    }
    // q15's argmax join-back re-reads the per-supplier aggregate, not the
    // fact: lineitem appears at most twice (Spark does not share the
    // subframe without an explicit persist; both reads carry the pushed
    // quarter filter so each is a pruned scan).
    val liScans = leafStrings("q15_top_supplier").count(_.contains("lineitem"))
    assert(liScans <= 2, s"q15 reads lineitem $liScans times")
    for (l <- leafStrings("q15_top_supplier").filter(_.contains("lineitem")))
      assert(l.contains("PushedFilters") && l.contains("l_shipdate"),
        s"q15: quarter filter not pushed into a lineitem scan:\n$l")
  }

  test("q8: part-type and date prune before the spine; nation/region broadcast") {
    val leaves = leafStrings("q8_market_share")
    assert(leaves.exists(l => l.contains("PushedFilters") && l.contains("p_type")),
      s"part type filter not pushed:\n${leaves.mkString("\n")}")
    assert(leaves.exists(l => l.contains("PushedFilters") && l.contains("o_orderdate")),
      s"order date range not pushed:\n${leaves.mkString("\n")}")
    assert(plan("q8_market_share").collect {
      case b: BroadcastExchangeLike => b
    }.size >= 2, "q8: nation and region-nation frames must broadcast")
  }

  test("q_data_profile_approx: the HLL profile loses the Expand and honors the 4-sigma bound") {
    // exact B41 pays a 5x Expand for multi-count-distinct — the approx
    // twin must NOT (that's its whole reason to exist at 100 TB)
    assert(plan("q_data_profile").collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.nonEmpty,
      "q_data_profile (control): exact multi-distinct should plan an Expand")
    assert(plan("q_data_profile_approx").collect {
      case e: org.apache.spark.sql.execution.ExpandExec => e }.isEmpty,
      "q_data_profile_approx: approx_count_distinct must not plan an Expand")
    // probabilistic accuracy pinned here, not in the oracle (C31
    // convention): every column's HLL estimate within 4 sigma of exact
    import org.apache.spark.sql.functions.{abs, col, lit}
    val rsd = 0.05
    val approx = graft.operators.Analytics.dataProfileApprox(
      graft.sources.Tables.orders(spark, sf), rsd)
      .select(col("col_name"), col("nd_hll"))
    val exact = graft.operators.Analytics.dataProfile(
      graft.sources.Tables.orders(spark, sf))
      .select(col("col_name"), col("n_distinct"))
    val breaches = approx.join(exact, "col_name")
      .filter(abs(col("nd_hll").cast("double") / col("n_distinct").cast("double") - 1.0)
        > lit(4.0 * rsd))
      .collect()
    assert(breaches.isEmpty,
      s"HLL outside 4-sigma bound: ${breaches.mkString(", ")}")
  }

  test("q_html_extract: extraction is one shuffle-free projection riding the scan") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val p = plan("q_html_extract")
    assert(p.collect { case e: Exchange => e }.isEmpty,
      "HTML extraction must be pure per-row expressions — no Exchange anywhere")
  }

  test("q_text_normalize: strip/NBSP/NFC is one shuffle-free codegen projection") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val p = plan("q_text_normalize")
    assert(p.collect { case e: Exchange => e }.isEmpty,
      "normalization must be pure per-row expressions — no Exchange anywhere")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.nonEmpty,
      "the NFC expression must stay inside whole-stage codegen")
  }

  test("q_script_mix: script telemetry is one shuffle-free codegen projection") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val p = plan("q_script_mix")
    assert(p.collect { case e: Exchange => e }.isEmpty,
      "script counting must be pure per-row expressions - no Exchange anywhere")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }.nonEmpty,
      "the regexp counters must stay inside whole-stage codegen")
  }

  test("q_url_host_cap: broadcast blocklist, bounded heap cap, no window") {
    val p = plan("q_url_host_cap")
    assert(p.collect { case b: BroadcastExchangeLike => b }.nonEmpty,
      "blocklist anti-join must broadcast the blocklist")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty,
      "per-host cap must be the MinKLong heap aggregate, not a rank window")
  }

  test("q_cms_topk: grid + total are broadcast; probes via TakeOrderedAndProject") {
    val p = plan("q_cms_topk")
    assert(p.collect { case b: BroadcastExchangeLike => b }.size >= 2,
      "the d*w cell grid and the total must both broadcast to the probes")
    assert(p.toString.contains("TakeOrderedAndProject"),
      "top-K probe selection must be TakeOrderedAndProject, not sort-all")
  }

  test("q16/q20: blacklist anti-join and dominance join keep part filters pushed") {
    for ((q, c) <- Seq("q16_supplier_counts" -> "p_size",
      "q20_promotion_suppliers" -> "p_name")) {
      val leaves = leafStrings(q)
      assert(leaves.exists(l => l.contains("PushedFilters") && l.contains(c)),
        s"$q: part filter $c not pushed:\n${leaves.mkString("\n")}")
    }
  }
}
