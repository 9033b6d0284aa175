package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sketch-based approximate operators — the 100 TB paths where an exact
  * answer costs a full shuffle of a wide key space but a bounded-error
  * estimate costs one map-side pass: HyperLogLog++ cardinality, rank-bound
  * quantile summaries, and Bloom-filter semi-join pruning.
  *
  * Oracle strategy: a DuckDB oracle cannot reproduce another engine's
  * sketch bits, so each query emits (a) the EXACT value, oracle-checked
  * as usual, and (b) a boolean asserting the sketch landed within its
  * error contract, which the oracle claims as literal TRUE. The booleans
  * are safe to hash-compare when the bound is hard: approx_percentile's
  * rank error is a deterministic guarantee of the summary structure. The
  * HLL++ bound is only probabilistic, so it is asserted in ScalaTest and
  * kept OUT of the oracle-checked columns. The Bloom
  * variant needs no special contract at all — no false negatives means
  * prefilter + exact residual join is EXACTLY the plain anti-join result,
  * so it shares q_dedup_incremental's oracle verbatim.
  */
object Sketches {

  /** C31: per-language distinct-token cardinality, HLL++ next to exact.
    * At 100 TB the exact count-distinct shuffles every (lang, token)
    * pair; the HLL++ estimate is a fixed-width register array per
    * group, merged map-side — the standard first-pass corpus profile.
    * `hll_within_bound` asserts the estimate sits inside 4 standard
    * deviations of the configured relative error — unlike the quantile
    * summary's hard rank bound this is probabilistic (~6e-5 per group
    * at 4σ), so it lives in ScalaTest (LlmOpsSpec) ONLY: the registered
    * oracle query drops the boolean and hash-compares just the exact
    * columns, so a testdata refresh landing a group in the tail can
    * never flip the driver's correctness gate on a non-bug.
    */
  def approxDistinctTokens(documents: DataFrame, rsd: Double = 0.05): DataFrame =
    documents
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("token")).as("exact_distinct"),
        approx_count_distinct(col("token"), rsd).as("hll"))
      .select(col("lang"), col("n_tokens"), col("exact_distinct"),
        (abs(col("hll").cast("double") / col("exact_distinct").cast("double") - 1.0)
          <= lit(4.0 * rsd)).as("hll_within_bound"))

  val approxDistinctTokensSql: String =
    """WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
      |SELECT lang, count(*) AS n_tokens,
      |  count(DISTINCT token) AS exact_distinct
      |FROM tok GROUP BY lang""".stripMargin

  /** C32: per-status order-value quantiles — approx_percentile's summary
    * (one pass, bounded memory, partial-agg mergeable) next to the exact
    * percentile_disc. The summary guarantees rank error ≤ N/accuracy
    * REGARDLESS of merge order, so with accuracy=1000 the estimate's
    * rank sits within 0.1% of the target and must lie between the exact
    * 1%-window quantiles around it — a hard bound, not a probabilistic
    * one, hence safe to oracle as TRUE.
    */
  def approxOrderQuantiles(orders: DataFrame, accuracy: Int = 1000): DataFrame = {
    val eps = 0.01
    // The six exact order statistics come off ONE (status, value) count
    // map ([[Analytics.discQuantilePicks]] — bit-exact percentile_disc
    // pick rule) instead of six independent percentile buffers each
    // serializing the same map through the exchange (r14, guide §2.3);
    // the approx summary still consumes raw rows (a sketch cannot be
    // built from pre-counted values through the public API), sharing
    // that agg with the all-rows count. Both sides are group-cardinality
    // frames, so the re-attach join is broadcast-sized.
    val exact = Analytics.discQuantilePicks(orders, "o_orderstatus", "o_totalprice",
      Seq(0.5 -> "p50", 0.9 -> "p90",
        (0.5 - eps) -> "p50_lo", (0.5 + eps) -> "p50_hi",
        (0.9 - eps) -> "p90_lo", (0.9 + eps) -> "p90_hi"))
    val sketch = orders
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n"),
        expr(s"approx_percentile(o_totalprice, array(0.5, 0.9), $accuracy)").as("ap"))
    exact.join(broadcast(sketch), "o_orderstatus")
      .select(col("o_orderstatus"), col("n"), col("p50"), col("p90"),
        (col("ap")(0) >= col("p50_lo") && col("ap")(0) <= col("p50_hi"))
          .as("p50_within_bound"),
        (col("ap")(1) >= col("p90_lo") && col("ap")(1) <= col("p90_hi"))
          .as("p90_within_bound"))
  }

  /** The 100 TB twin of [[approxOrderQuantiles]]' EXACT columns:
    * per-group discrete quantiles via [[DistributedRank]] instead of
    * sort-buffering aggregates. `percentile_disc(q)` buffers every
    * group value in one aggregation buffer and sorts it at eval — six
    * of them here means six copies of the group in memory, the
    * documented exact-baseline-at-test-SF trade. This twin computes
    * the same values with NO per-group buffering: rank every row once
    * (equal-depth buckets + local windows — per-task work is one
    * bucket of one key), then pick the rows whose rank hits
    * ceil(q·n) — `percentile_disc`'s "smallest value with cume_dist
    * ≥ q" is exactly the value at row position ceil(q·n) of the
    * ordered group, ties included (tied rows carry the same value, so
    * any tie order yields the same answer). Two passes over the fact
    * frame, one bounded-frame window, one broadcast join.
    * LlmOpsSpec pins it value-for-value against percentile_disc.
    */
  def orderQuantilesScalable(orders: DataFrame,
                             qs: Seq[Double] = Seq(0.5, 0.9),
                             buckets: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // prices scale to exact long cents — integral, order-preserving.
    // The decimal(18,2) hop is load-bearing when the column arrives as
    // DOUBLE: 12345.67 * 100 is 1234566.999… in binary, and a straight
    // long cast would truncate it into the wrong rank key; the decimal
    // cast rounds to the intended cents first.
    val base = orders.select(col("o_orderstatus").as("g"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val wLocal = Window.partitionBy("g", DistributedRank.BucketCol)
      .orderBy("cents")
    val ranked = DistributedRank
      .withBucketOffsets(base, "g", "cents", lit(1L), buckets)
      .withColumn("r",
        col(DistributedRank.OffsetCol) + row_number().over(wLocal).cast("long"))
    // alias the group column: targets shares base's lineage, and a
    // ranked("g") === targets("g") condition would resolve both sides
    // to the same attribute (a trivially-true predicate)
    val counts = base.groupBy("g").agg(count(lit(1)).as("n"))
    // pos = ceil(q*n) in EXACT integer arithmetic: ceil(double(q)*n)
    // rounds past the true rank whenever q*n lands just above an
    // integer in binary (0.07*100 = 7.000000000000001 → rank 8, one
    // above percentile_disc). q is treated as a 6-dp rational — num*n
    // ≤ 10^6 * 10^12 stays inside int64 at any corpus size.
    val targets = counts.select(
      col("g").as("tg"), col("n"),
      explode(array(qs.map { q =>
        val num = math.round(q * 1000000.0)
        struct(lit(q).as("q"),
          expr(s"(($num * n) + 999999) div 1000000").as("pos"))
      }: _*)).as("t"))
      .select(col("tg"), col("n"), col("t.q").as("q"), col("t.pos").as("pos"))
    ranked
      .join(broadcast(targets), col("g") === col("tg") && col("r") === col("pos"))
      .select(col("g").as("o_orderstatus"), col("n"), col("q"),
        (col("cents").cast("double") / 100.0).as("value"))
  }

  val approxOrderQuantilesSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  quantile_disc(o_totalprice, 0.5) AS p50,
      |  quantile_disc(o_totalprice, 0.9) AS p90,
      |  TRUE AS p50_within_bound,
      |  TRUE AS p90_within_bound
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  /** C26b: Bloom-pruned incremental dedup — same contract as
    * [[TextOps.dedupIncremental]], with the historical fingerprint set
    * compacted into a Bloom filter (native `graft_bloom_agg` /
    * `graft_might_contain` (Spark's own runtime-filter expressions,
    * SQL-surfaced via GraftExtensions) — codegen'd, no UDF) broadcast as a one-row
    * aggregate. New docs that miss the filter are definitively unknown
    * (no false negatives) and skip the join entirely; only the ~dup-rate
    * + fpp fraction that hits proceeds to the exact join, so the shuffle
    * cost scales with the MATCH volume, not the ingest volume — the
    * standard semi-join reduction when the historical index dwarfs each
    * ingest batch. Result is bit-identical to the exact variant; the
    * driver checks it against the SAME oracle. The probe is wrapped in
    * `coalesce(…, false)`: an EMPTY historical side makes the Bloom
    * aggregate NULL and `might_contain` NULL, which would silently drop
    * every delta row — coalescing routes them to the not-maybe branch
    * (`is_known = false`), matching the exact path.
    */
  private val bloomCallCounter = new java.util.concurrent.atomic.AtomicLong()

  def dedupIncrementalBloom(documents: DataFrame, fpp: Double = 0.01): DataFrame = {
    val spark = documents.sparkSession
    val fp = documents.select(col("doc_id"), md5(col("text")).as("fp"))
    val hist = graft.GraftCache.persistTracked(
      fp.filter(pmod(col("doc_id"), lit(10)) < 8).select("fp").distinct())
    val delta = fp.filter(pmod(col("doc_id"), lit(10)) >= 8)
    // Size the filter from the historical cardinality: in production this
    // is a known index stat; here one cheap count over the (persisted)
    // distinct set the exact residual join needs anyway. n·ln(fpp)/ln²2 bits.
    val n = math.max(hist.count(), 1L)
    val numBits = math.max(64L, math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // might_contain demands its Bloom input as a constant or scalar
    // subquery (the same contract Spark's InjectRuntimeFilter satisfies):
    // the subquery aggregates the persisted hist once and the result is
    // fed to every probe as a runtime constant. Unique per-call view
    // names, dropped before returning (rollupRevenue pattern).
    val v = s"graft_bloom_${bloomCallCounter.incrementAndGet()}"
    hist.createOrReplaceTempView(s"${v}_hist")
    delta.createOrReplaceTempView(s"${v}_delta")
    try {
      spark.sql(
        s"""WITH flagged AS (
           |  SELECT doc_id, fp,
           |    coalesce(graft_might_contain(
           |      (SELECT graft_bloom_agg(xxhash64(fp), ${n}L, ${numBits}L)
           |       FROM ${v}_hist),
           |      xxhash64(fp)), false) AS maybe
           |  FROM ${v}_delta)
           |SELECT f.doc_id, f.fp, (h.fp IS NOT NULL) AS is_known
           |FROM (SELECT doc_id, fp FROM flagged WHERE maybe) f
           |  LEFT JOIN ${v}_hist h ON f.fp = h.fp
           |UNION ALL
           |SELECT doc_id, fp, FALSE AS is_known FROM flagged WHERE NOT maybe
           |""".stripMargin)
    } finally {
      Seq("hist", "delta").foreach(t => spark.catalog.dropTempView(s"${v}_$t"))
    }
  }

  /** C64: Count-Min sketch token frequency — the third sketch of the
    * frequency family (MG answers "which are heavy", HLL "how many
    * distinct", CMS "how often is THIS one", point estimates over keys
    * you didn't pre-declare). Depth×width counter grid: every token
    * occurrence increments one bucket per hash row
    * (`xxhash64(token, row) mod w`); the estimate for a probe is the
    * MIN over its d cells.
    *
    * Scale shape: the sketch build is ONE map-side-combinable hash agg
    * to at most d·w cells (16 KB of state here) regardless of corpus
    * size — the entire reduce fits in a single broadcastable frame, so
    * probing joins against a broadcast, never a shuffle of the corpus.
    * The exact counts computed alongside are the test-SF baseline (the
    * same convention as C31's exact columns): at 100 TB you keep ONLY
    * the grid.
    *
    * Guarantees split exactly like C31: `cms_ge_exact` (no
    * underestimates — every occurrence increments all d probe cells) is
    * deterministic and oracle-checked as TRUE; the ε-overshoot bound
    * (est ≤ exact + e/w·N at confidence 1−e^{−d}) is probabilistic, so
    * `cms_within_eps` is spec-only (CurationSpec) and dropped from the
    * registered query.
    */
  /** The d cells a token increments: struct(row, xxhash64(token, row)
    * mod w) per hash row. Shared by the batch sketch and the streaming
    * grid mirror so the two can never hash apart.
    */
  private[graft] def cmsCells(tok: Column, depth: Int, width: Int): Column =
    array((0 until depth).map { r =>
      struct(lit(r).as("r"), pmod(xxhash64(tok, lit(r)), lit(width.toLong)).as("b"))
    }: _*)

  /** Build the Count-Min counter grid over a `token` column: one
    * map-side-combinable hash agg to ≤ depth·width (r, b, cell_cnt)
    * rows. The reusable serve pair: build the grid once over the
    * corpus, then [[cmsEstimate]] any probe set against it.
    */
  def cmsGrid(toks: DataFrame, depth: Int = 4, width: Int = 1024): DataFrame =
    toks
      .select(explode(cmsCells(col("token"), depth, width)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cell_cnt"))

  /** Point-frequency estimates for a `token` probe frame against a
    * committed grid: min over each probe's d cells, via a broadcast of
    * the constant-size grid — never a corpus shuffle.
    */
  def cmsEstimate(
      grid: DataFrame,
      probes: DataFrame,
      depth: Int = 4,
      width: Int = 1024): DataFrame =
    probes
      .withColumn("rb", explode(cmsCells(col("token"), depth, width)))
      .withColumn("r", col("rb.r")).withColumn("b", col("rb.b")).drop("rb")
      .join(broadcast(grid), Seq("r", "b"))
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(col("cell_cnt")).as("cms_est"))

  def cmsTopkTokens(
      documents: DataFrame,
      depth: Int = 4,
      width: Int = 1024,
      topK: Int = 20): DataFrame = {
    val toks = documents.select(explode(split(col("text"), " ")).as("token"))
    val grid = cmsGrid(toks, depth, width)
    val total = toks.agg(count(lit(1)).as("n_total"))
    val probes = toks
      .groupBy("token")
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token").asc)
      .limit(topK)
    cmsEstimate(grid, probes, depth, width)
      .crossJoin(broadcast(total))
      .select(
        col("token"), col("exact_cnt"),
        (col("cms_est") >= col("exact_cnt")).as("cms_ge_exact"),
        (col("cms_est").cast("double") <= col("exact_cnt").cast("double")
          + lit(math.E / width) * col("n_total").cast("double"))
          .as("cms_within_eps"))
  }

  /** Oracle: the exact top-K token counts (count desc, token asc — the
    * same deterministic total order as the Spark side's
    * TakeOrderedAndProject) plus the hard no-underestimate guarantee
    * as TRUE; the probabilistic ε bound is spec-only.
    */
  def cmsTopkTokensSql(topK: Int = 20): String =
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (SELECT token, count(*) AS exact_cnt FROM tok GROUP BY token),
       |r AS (SELECT token, exact_cnt,
       |  row_number() OVER (ORDER BY exact_cnt DESC, token) AS rn FROM c)
       |SELECT token, exact_cnt, TRUE AS cms_ge_exact
       |FROM r WHERE rn <= $topK""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact columns only: the probabilistic HLL bound is spec-only
    "q_approx_distinct" -> ((s, d) =>
      approxDistinctTokens(Tables.documents(s, d)).drop("hll_within_bound")),
    "q_cms_topk" -> ((s, d) =>
      cmsTopkTokens(Tables.documents(s, d)).drop("cms_within_eps")),
    "q_approx_quantiles" -> ((s, d) => approxOrderQuantiles(Tables.orders(s, d))),
    "q_dedup_incremental_bloom" -> ((s, d) => dedupIncrementalBloom(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_approx_distinct" -> approxDistinctTokensSql,
    "q_cms_topk" -> cmsTopkTokensSql(),
    "q_approx_quantiles" -> approxOrderQuantilesSql,
    // same oracle as q_dedup_incremental on purpose: the Bloom path must
    // be exactly the anti-join result (no false negatives)
    "q_dedup_incremental_bloom" -> TextOps.dedupIncrementalSql)
}
