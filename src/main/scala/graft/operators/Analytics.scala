package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Classic analytics: the engine's bread-and-butter scan/agg/join/window
  * surface (SURVEY.md §2 B). All pure DataFrame plans — Catalyst owns
  * pushdown, pruning and join strategy; dims are explicitly broadcast.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def money(c: Column): Column = round(c, 2).cast("double")

  /** 1-based rank within a sorted-limit output. Relies on the physical
    * guarantee that `orderBy().limit(k)` output is one partition, where
    * monotonically_increasing_id yields 0..k-1; if a plan change ever
    * broke that, ids would jump past k (partition index in the high
    * bits) — this raises loudly instead of letting the old `cast("int")`
    * silently wrap to wrong ranks.
    */
  private def rankWithinLimit(k: Int): Column = {
    val mid = monotonically_increasing_id()
    when(mid < k, (mid + 1).cast("int"))
      .otherwise(raise_error(lit(
        s"rankWithinLimit: sorted-limit output spans multiple partitions (id past $k)"))
        .cast("int"))
  }

  /** B1 (flagship): TPC-H Q1-shaped pricing summary. Single scan of
    * lineitem, filter pushed to parquet, hash aggregate with map-side
    * partial agg — the canonical 100 TB-safe plan shape.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val disc = dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,4)") - dec(col("l_discount")))
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(disc)).as("sum_disc_price"),
        round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1)), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** B2: selective 4-way dim join — region/nation broadcast, filters
    * applied before the join so only matching customers shuffle.
    */
  def joinPushdown(orders: DataFrame, customer: DataFrame,
                   nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .filter(col("o_orderstatus") === "F")
      .join(customer.select("c_custkey", "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        money(sum(dec(col("o_totalprice")))).as("revenue"))

  val joinPushdownSql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA' AND o_orderstatus = 'F'
      |GROUP BY o_orderpriority""".stripMargin

  /** B3: join + agg + top-k: revenue by brand, keep top 5. Part grows
    * with scale factor (~200k rows/SF), so no forced broadcast — the
    * planner broadcasts it while it fits `autoBroadcastJoinThreshold`
    * and falls back to a shuffle join beyond that (AQE re-checks at
    * runtime). The top-k is a row_number filter over the tiny
    * aggregated frame.
    *
    * Money here is exact INTEGER arithmetic, not decimal: prices are
    * 2-decimal and discounts 2-decimal, so price·(1−d) in cents×100 is
    * an exact long (`round(x*100)` recovers the integer exactly in both
    * engines — quantization rule, SURVEY §6), summed as longs with full
    * codegen instead of per-row BigDecimal multiplies. Final rounding is
    * integer HALF_UP ((v+50) div 100) and ONE double division — no
    * float-derived round() anywhere.
    */
  def topParts(lineitem: DataFrame, part: DataFrame, k: Int = 5): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    val rev = lineitem
      .join(part.select("p_partkey", "p_brand"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(discE4).as("rev_e4"))
      .withColumn("rev_cents", expr("(rev_e4 + 50) div 100"))
    // sort+limit → TakeOrderedAndProject (per-partition top-k, merged on
    // the driver) — scale-safe, unlike a rank window over the full frame.
    // The limit output is a single partition by construction; re-assert
    // the order there and number rows with monotonically_increasing_id
    // (0-based within the one partition) — no Window.partitionBy()
    // window, so the single-partition WindowExec WARN stays a real
    // scale signal elsewhere, and `rev` is computed exactly once.
    rev
      .orderBy(col("rev_e4").desc, col("p_brand"))
      .limit(k)
      .sortWithinPartitions(col("rev_e4").desc, col("p_brand"))
      .withColumn("rn", rankWithinLimit(k))
      .select(col("p_brand"),
        (col("rev_cents").cast("double") / 100.0).as("revenue"), col("rn"))
  }

  val topPartsSql: String =
    """WITH rev AS (SELECT p_brand,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4
      |FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand)
      |SELECT p_brand, CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, rn
      |FROM (SELECT *, row_number() OVER (ORDER BY rev_e4 DESC, p_brand) AS rn FROM rev)
      |WHERE rn <= 5""".stripMargin

  /** B4: decile stats over order value. Value-based deciles from exact
    * quantile cut points: ONE `percentile` aggregate computes all 9 cuts
    * in a single pass (partial-agg map-side combine; final-reduce memory
    * ∝ distinct prices, not rows — no global sort, no single-partition
    * window), the 9-cut row is broadcast, and bucketing is a map-side
    * CASE. Spark's `percentile` and DuckDB's `quantile_cont` share the
    * interpolation convention (value at position p·(N−1), linear
    * lo + f·(hi−lo) — probed empirically), so the cuts are bit-identical
    * IEEE doubles and the oracle matches exactly. Ties on price land in
    * one bucket by construction, so no tiebreak key is needed.
    */
  def decileValue(orders: DataFrame): DataFrame = {
    val cuts = orders
      .agg(percentile(col("o_totalprice"),
        typedLit((1 to 9).map(_ / 10.0))).as("cs"))
      .select((1 to 9).map(i => col("cs").getItem(i - 1).as(s"c$i")): _*)
    val decile = (1 to 9).foldRight(lit(10): Column) { (i, acc) =>
      when(col("o_totalprice") <= col(s"c$i"), lit(i)).otherwise(acc)
    }
    orders
      .crossJoin(broadcast(cuts))
      .withColumn("decile", decile)
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  /** B4-approx: sketch-based variant for when even the distinct-value
    * final reduce of [[decileValue]] is too big — one approx-quantile
    * pass (GK sketch, driver gets 9 doubles), then the same map-side
    * bucketing. Not oracle-checked (sketch is implementation-specific);
    * DecileSpec bounds its disagreement with the exact operator instead.
    */
  def decileValueScalable(orders: DataFrame, relErr: Double = 0.001): DataFrame = {
    val cuts = orders.stat.approxQuantile(
      "o_totalprice", (1 to 9).map(_ / 10.0).toArray, relErr)
    val decile = cuts.zipWithIndex.foldRight(lit(10): Column) {
      case ((cut, i), acc) => when(col("o_totalprice") <= cut, lit(i + 1)).otherwise(acc)
    }
    orders
      .withColumn("decile", decile)
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
  }

  val decileValueSql: String = {
    val fracs = (1 to 9).map(i => s"0.$i").mkString(", ")
    val cutCols = (1 to 9).map(i => s"cs[$i] AS c$i").mkString(", ")
    val cases = (1 to 9).map(i => s"WHEN o_totalprice <= c$i THEN $i").mkString(" ")
    s"""WITH qs AS (SELECT quantile_cont(o_totalprice, [$fracs]) AS cs FROM orders),
       |cuts AS (SELECT $cutCols FROM qs),
       |d AS (SELECT o_totalprice, CASE $cases ELSE 10 END AS decile FROM orders, cuts)
       |SELECT decile, count(*) AS n, min(o_totalprice) AS min_price,
       |  max(o_totalprice) AS max_price
       |FROM d GROUP BY decile""".stripMargin
  }

  /** B5: month-bucketed revenue time series. */
  def monthlyRevenue(orders: DataFrame): DataFrame =
    orders
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        money(sum(dec(col("o_totalprice")))).as("revenue"))

  val monthlyRevenueSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1""".stripMargin

  /** B6 (TPC-H Q3 shape): top-10 open orders by discounted revenue for a
    * market segment. Fact-fact join shuffles once on the order key;
    * top-k is a rank filter over the aggregated frame.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String = "BUILDING", k: Int = 10): DataFrame = {
    // exact integer-cents money (see topParts) — codegen long multiplies
    // instead of per-row BigDecimal
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    val rev = lineitem
      .join(orders.filter(col("o_orderstatus") =!= "F")
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment).select("c_custkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(discE4).as("rev_e4"))
    // top-k via sort+limit (TakeOrderedAndProject) — the per-order
    // aggregate frame is unbounded at scale; never rank-window it.
    // Row numbering over the single-partition limit output, as in topParts.
    rev
      .orderBy(col("rev_e4").desc, col("o_orderkey"))
      .limit(k)
      .sortWithinPartitions(col("rev_e4").desc, col("o_orderkey"))
      .withColumn("rn", rankWithinLimit(k))
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"), col("rn"))
  }

  val shippingPrioritySql: String =
    """WITH rev AS (
      |  SELECT o_orderkey, o_orderdate,
      |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4
      |  FROM lineitem
      |    JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderstatus <> 'F' AND c_mktsegment = 'BUILDING'
      |  GROUP BY o_orderkey, o_orderdate)
      |SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, rn
      |FROM (SELECT *, row_number() OVER (ORDER BY rev_e4 DESC, o_orderkey) AS rn FROM rev)
      |WHERE rn <= 10""".stripMargin

  /** B7 (TPC-H Q14 shape): conditional-aggregate share — fraction of
    * revenue from one part type family. Exact decimal numerator/
    * denominator, one double division at the end. Part is
    * SF-proportional — join strategy left to the planner (see topParts).
    */
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    lineitem
      .join(part.select("p_partkey", "p_type"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type").startsWith("PROMO").as("is_promo"))
      .agg(sum(discE4).as("rev_e4"), count(lit(1)).as("n_items"))
      .select(col("is_promo"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"),
        col("n_items"))
  }

  val promoShareSql: String =
    """WITH a AS (SELECT starts_with(p_type, 'PROMO') AS is_promo,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY starts_with(p_type, 'PROMO'))
      |SELECT is_promo, CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_items
      |FROM a""".stripMargin

  /** B8: supplier volume by nation — nation (fixed 25 rows) broadcast;
    * supplier is SF-proportional (~10k rows/SF) so its join strategy is
    * the planner's call. Lineitem aggregated with partial combine.
    * (r14 audit: a SINGLE countDistinct next to non-distinct aggs plans
    * WITHOUT an Expand — Spark stacks a (n_name, s_suppkey)-keyed
    * partial agg under the per-nation rollup natively, so the manual
    * two-level rewrite produced a bit-identical plan and was dropped.)
    */
  def supplierVolume(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"),
        sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("vol_cents"))
      .select(col("n_name"), col("n_suppliers"), col("n_items"),
        (col("vol_cents").cast("double") / 100.0).as("volume"))

  val supplierVolumeSql: String =
    """WITH a AS (SELECT n_name, count(DISTINCT s_suppkey) AS n_suppliers, count(*) AS n_items,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS vol_cents
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name)
      |SELECT n_name, n_suppliers, n_items,
      |  CAST(vol_cents AS DOUBLE) / 100.0 AS volume
      |FROM a""".stripMargin

  /** B9: hierarchical ROLLUP — region/nation revenue with subtotal and
    * grand-total rows, the OLAP cube slice every BI layer asks for. One
    * pass; Spark expands grouping sets in the aggregate (no re-scan per
    * level). `gid` disambiguates data NULLs from subtotal NULLs
    * (grouping bits), identical in both engines.
    *
    * Expressed through `spark.sql` over temp views: this Spark build's
    * ambiguous-self-join detector false-positives on `Dataset.rollup`
    * over ANY join-derived frame (reproduced even with renamed keys,
    * `grouping_id()`, and an intermediate aggregate); the SQL analyzer
    * path has no dataset-id tagging and resolves the same plan cleanly —
    * and it exercises the library's SQL surface.
    */
  private val rollupCallCounter = new java.util.concurrent.atomic.AtomicLong(0)

  def rollupRevenue(orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    // Unique per-call view names so concurrent/interleaved calls in one
    // session can't clobber each other's inputs; spark.sql analyzes
    // eagerly, so the views can be dropped before returning the (lazy)
    // frame and nothing lingers in the catalog.
    val v = s"graft_rr_${rollupCallCounter.incrementAndGet()}"
    orders.createOrReplaceTempView(s"${v}_orders")
    customer.createOrReplaceTempView(s"${v}_customer")
    nation.createOrReplaceTempView(s"${v}_nation")
    region.createOrReplaceTempView(s"${v}_region")
    try {
      spark.sql(
        s"""SELECT r_name, n_name, count(*) AS n_orders,
           |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           |  CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid
           |FROM ${v}_orders JOIN ${v}_customer ON o_custkey = c_custkey
           |  JOIN ${v}_nation ON c_nationkey = n_nationkey
           |  JOIN ${v}_region ON n_regionkey = r_regionkey
           |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    } finally {
      Seq("orders", "customer", "nation", "region")
        .foreach(t => spark.catalog.dropTempView(s"${v}_$t"))
    }
  }

  val rollupRevenueSql: String =
    """SELECT r_name, n_name, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |  CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS gid
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** B16: CUBE over (priority, status) with an explicit grouping-id —
    * the DataFrame-native `.cube` surface (B9 exercises ROLLUP through
    * `spark.sql`). All 2^2 grouping sets come out of ONE shuffle of the
    * pre-aggregated map-side partials (Expand feeds a single hash agg),
    * not four scans. The gid is built from `grouping()` bits explicitly
    * so the encoding is pinned in both engines rather than relying on
    * either engine's native grouping_id bit order.
    */
  def cubeRevenue(orders: DataFrame): DataFrame =
    orders
      .cube("o_orderpriority", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        money(sum(dec(col("o_totalprice")))).as("revenue"),
        (grouping(col("o_orderpriority")) * 2 + grouping(col("o_orderstatus")))
          .cast("long").as("gid"))

  val cubeRevenueSql: String =
    """SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |  CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin

  /** B17: revenue share within region — the ratio-to-report window shape.
    * The window runs over the AGGREGATED (region, nation) frame — 25
    * rows at any corpus scale, because the SF-proportional fact side is
    * reduced by the hash agg BEFORE the window sees it (windows over raw
    * fact frames are the scale hazard WindowAudit polices). Revenue in
    * exact integer cents; the share is one IEEE double division of two
    * exact integers, bit-identical in both engines.
    */
  def revenueShare(orders: DataFrame, customer: DataFrame,
                   nation: DataFrame, region: DataFrame): DataFrame = {
    val cents = round(col("o_totalprice") * 100, 0).cast("long")
    val base = orders.select(col("o_custkey"), cents.as("c"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("c")).as("rev_c"))
    val w = Window.partitionBy("r_name")
    base
      .withColumn("region_c", sum(col("rev_c")).over(w))
      .select(col("r_name"), col("n_name"),
        (col("rev_c").cast("double") / 100.0).as("revenue"),
        (col("rev_c").cast("double") / col("region_c").cast("double")).as("share"))
  }

  val revenueShareSql: String =
    """WITH a AS (
      |  SELECT r_name, n_name,
      |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey
      |    JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name,
      |  CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
      |  CAST(rev_c AS DOUBLE) /
      |    CAST(CAST(sum(rev_c) OVER (PARTITION BY r_name) AS BIGINT) AS DOUBLE) AS share
      |FROM a""".stripMargin

  /** B20: correlated-subquery decorrelation — orders strictly above
    * their own customer's average value, written as two correlated
    * scalar subqueries through the `spark.sql` surface so Catalyst's
    * decorrelation rewrite (subquery → agg + join) is exercised, not
    * hand-decorrelated around it. The comparison is pure integer cents
    * (price·n > sum — no division, no float boundary): exact and
    * engine-portable even when an order sits exactly on the average.
    */
  def aboveAvgOrders(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    val v = s"graft_aao_${rollupCallCounter.incrementAndGet()}"
    orders.createOrReplaceTempView(v)
    try {
      spark.sql(
        s"""SELECT o_orderkey, o_custkey,
           |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS total_price
           |FROM $v o
           |WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) *
           |        (SELECT count(*) FROM $v i WHERE i.o_custkey = o.o_custkey)
           |      > (SELECT sum(CAST(round(i.o_totalprice * 100, 0) AS BIGINT))
           |         FROM $v i WHERE i.o_custkey = o.o_custkey)""".stripMargin)
    } finally spark.catalog.dropTempView(v)
  }

  val aboveAvgOrdersSql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS total_price
      |FROM orders o
      |WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) *
      |        (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      |      > (SELECT CAST(sum(CAST(round(i.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |         FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin

  /** B21: ordered string aggregation — per-region roster of nation
    * names (`listagg WITHIN GROUP` = DuckDB `string_agg ORDER BY`).
    * Deliberately on the BOUNDED dim hierarchy: listagg's state is the
    * concatenation itself, so it belongs on groups whose size is fixed
    * by the schema (25 nations), never on fact-scale groups where the
    * string grows with the data. The explicit ORDER BY inside the
    * aggregate is what makes the result deterministic under any
    * partitioning.
    */
  def nationRoster(nation: DataFrame, region: DataFrame): DataFrame =
    nation
      .join(broadcast(region.select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        count(lit(1)).as("n_nations"),
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("roster"))

  val nationRosterSql: String =
    """SELECT r_name, count(*) AS n_nations,
      |  string_agg(n_name, ',' ORDER BY n_name) AS roster
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** B18: PIVOT — order counts cross-tabbed status × priority. The
    * value set is declared explicitly (`F/O/P`), which is the scale
    * contract too: an undeclared pivot needs a distinct-values pass
    * over the fact table before it can even plan. Compiles to one hash
    * agg with conditional counts — no per-value scan.
    */
  def pivotStatus(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  val pivotStatusSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** B19: set-difference cohort — customers who ordered in 1996 but not
    * in 1997 (lapsed). EXCEPT compiles to a left-anti hash join of two
    * pre-aggregated key sets: both sides shuffle once on the key,
    * nothing wide moves. The 1996 side keeps its order count so the
    * result carries evidence, not just membership.
    */
  def lapsedCustomers(orders: DataFrame): DataFrame = {
    def active(y: Int) = orders
      .filter(col("o_orderdate") >= lit(s"$y-01-01") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01"))
    active(1996)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders_1996"))
      .join(active(1997).select("o_custkey").distinct(), Seq("o_custkey"), "left_anti")
  }

  val lapsedCustomersSql: String =
    """SELECT o_custkey, count(*) AS n_orders_1996
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND o_custkey NOT IN (
      |    SELECT o_custkey FROM orders
      |    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |      AND o_orderdate < TIMESTAMP '1998-01-01')
      |GROUP BY o_custkey""".stripMargin

  /** Exact per-group discrete quantiles from ONE (group, value) count
    * aggregation — the multi-fraction replacement for stacking one
    * `percentile_disc` aggregate per fraction (r14, guide §2.3). Each
    * percentile_disc builds and serializes its OWN value→count map
    * through the exchange and sorts it again at eval, so k fractions
    * ship the same map k times; here the map crosses the shuffle once
    * as (group, value, count) rows (map-side combined), is sorted once
    * per group, and every fraction is picked from the same sorted array.
    *
    * The pick replicates Spark's `PercentileDisc.getPercentile`
    * BIT-EXACTLY: position = N·fraction in IEEE doubles (N = non-null
    * value count as long, l2d cast), rank = ceil(position) (d2l),
    * result = smallest value whose cumulative count ≥ rank — the same
    * `ceil`/compare the aggregate runs, so boundary rounding can never
    * disagree. Null values are excluded from N and from the scan
    * exactly as percentile_disc's buffer excludes them; `__n_rows`
    * carries the all-rows count (what `count(1)` returns).
    *
    * Memory: per-group state is the distinct-value array — identical to
    * percentile_disc's final eval map, ONE copy instead of k.
    */
  private[graft] def discQuantilePicks(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(Double, String)]): DataFrame = {
    val vt = df.schema(valueCol).dataType
    val counts = df
      .groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val grouped = counts
      .groupBy(col(groupCol))
      .agg(
        sort_array(collect_list(when(col("__v").isNotNull,
          struct(col("__v"), col("__c"))))).as("__vc"),
        sum(col("__c")).as("__n_rows"),
        sum(when(col("__v").isNotNull, col("__c")).otherwise(0L)).as("__n"))
    val picks = qs.map { case (p, name) =>
      val rank = ceil(col("__n").cast("double") * lit(p))
      aggregate(col("__vc"),
        struct(lit(0L).as("cum"), lit(null).cast(vt).as("pick")),
        (acc, x) => {
          val cum = acc.getField("cum") + x.getField("__c")
          struct(cum.as("cum"),
            coalesce(acc.getField("pick"),
              when(cum >= rank, x.getField("__v"))).as("pick"))
        }).getField("pick").as(name)
    }
    grouped.select(col(groupCol) +: col("__n_rows") +: picks: _*)
  }

  /** B10: exact per-group quantiles — median and p90 order value per
    * priority class. Same boundary rule as DuckDB `quantile_disc`
    * (probed); computed via [[discQuantilePicks]] — one (group, value)
    * count map through the shuffle instead of one percentile_disc
    * buffer per fraction, partial-agg memory still ∝ distinct values
    * per group.
    */
  def groupQuantiles(orders: DataFrame): DataFrame =
    discQuantilePicks(orders, "o_orderpriority", "o_totalprice",
      Seq(0.5 -> "p50", 0.9 -> "p90"))
      .withColumnRenamed("__n_rows", "n")

  val groupQuantilesSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  quantile_disc(o_totalprice, 0.5) AS p50,
      |  quantile_disc(o_totalprice, 0.9) AS p90
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  /** B26: per-group winsorization — clip order values to the group's
    * exact [p05, p95] (the standard outlier treatment before training a
    * model on heavy-tailed spend). Bounds come from ONE partial+final
    * percentile aggregate over the bounded status catalog and broadcast
    * back onto the fact row-for-row — the fact shuffles zero times, so
    * at 100 TB the cost is the percentile agg plus a map-side clip.
    * `percentile_disc` is an exact order statistic (an element of the
    * input, not an interpolation), so both engines pick bit-identical
    * bounds; both bounds come off ONE count map via
    * [[discQuantilePicks]] instead of two independent percentile
    * buffers.
    */
  def winsorize(orders: DataFrame): DataFrame = {
    val bounds = discQuantilePicks(orders, "o_orderstatus", "o_totalprice",
      Seq(0.05 -> "lo", 0.95 -> "hi"))
      .drop("__n_rows")
    orders
      .join(broadcast(bounds), "o_orderstatus")
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        least(greatest(col("o_totalprice"), col("lo")), col("hi")).as("clipped"),
        (col("o_totalprice") < col("lo") || col("o_totalprice") > col("hi")).as("was_outlier"))
  }

  val winsorizeSql: String =
    """WITH b AS (
      |  SELECT o_orderstatus,
      |    quantile_disc(o_totalprice, 0.05) AS lo,
      |    quantile_disc(o_totalprice, 0.95) AS hi
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderkey, o.o_orderstatus, o_totalprice,
      |  least(greatest(o_totalprice, lo), hi) AS clipped,
      |  (o_totalprice < lo OR o_totalprice > hi) AS was_outlier
      |FROM orders o JOIN b ON o.o_orderstatus = b.o_orderstatus""".stripMargin

  /** B11: the salted hot-key join, oracle-checked — Skew.saltedJoin must
    * be SEMANTICALLY INVISIBLE (identical result to the plain equi-join
    * the oracle runs) while spreading each key over `salts` shuffle
    * partitions. SkewSpec proves the multiset equality; this query makes
    * the driver's DuckDB gate prove it too.
    */
  def saltedSegmentRevenue(orders: DataFrame, customer: DataFrame): DataFrame =
    Skew.saltedJoin(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      customer.select("c_custkey", "c_mktsegment"),
      "o_custkey", "c_custkey", saltOn = "o_orderkey")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        money(sum(dec(col("o_totalprice")))).as("revenue"))

  val saltedSegmentRevenueSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin

  /** B13 (TPC-H Q5 shape): local-supplier volume — revenue per nation
    * for one region and one order-date year (1996 — the synthetic orders span 1995-2001), where the supplying and
    * buying nations coincide. The classic join-order workout: region and
    * nation (fixed-size) broadcast; supplier is SF-proportional so its
    * join strategy stays with the planner; the customer⋈orders⋈lineitem
    * spine shuffles on its natural keys, and the c_nationkey =
    * s_nationkey correlation is a residual equality, not another
    * shuffle. Integer-cents money math as in topParts.
    */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                          supplier: DataFrame, nation: DataFrame, region: DataFrame,
                          regionName: String = "ASIA"): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    lineitem
      .join(orders
        .filter(to_date(col("o_orderdate")) >= lit("1996-01-01") &&
          to_date(col("o_orderdate")) < lit("1997-01-01"))
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(discE4).as("rev_e4"))
      .select(col("n_name"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"))
  }

  val localSupplierVolumeSql: String =
    """WITH a AS (SELECT n_name,
      |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
      |GROUP BY n_name)
      |SELECT n_name, CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue
      |FROM a""".stripMargin

  /** B12: per-customer running revenue — the keyed cumulative window
    * every time-series dashboard needs. Partitioned by customer (hash
    * shuffle, parallel), ordered by the unique order key; running sum in
    * exact decimals, surfaced as money.
    */
  def runningTotal(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .select(col("o_custkey"), col("o_orderkey"), dec(col("o_totalprice")).as("p"))
      .withColumn("running_revenue", money(sum(col("p")).over(w)))
      .select(col("o_custkey"), col("o_orderkey"), col("running_revenue"))
  }

  val runningTotalSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |          ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_revenue
      |FROM orders""".stripMargin

  /** B14 (TPC-H Q12 shape): conditional classification agg — per return
    * flag, how many 1996-shipped lines belong to urgent/high-priority
    * orders vs the rest. One shuffle join of lineitem to orders on their
    * natural key (both SF-proportional — no broadcast anywhere), then a
    * hash agg over CASE sums; the shipdate filter is pushed to the
    * lineitem scan, orders ships only (o_orderkey, o_orderpriority).
    * (Synthetic lineitem has no l_shipmode column, so l_returnflag plays
    * the Q12 group key.)
    */
  def priorityLines(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_returnflag")
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(isHigh, 1L).otherwise(0L)).cast("long").as("high_line_count"),
        sum(when(isHigh, 0L).otherwise(1L)).cast("long").as("low_line_count"))
  }

  val priorityLinesSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY l_returnflag""".stripMargin

  /** B15 (TPC-H Q18 shape): large-order detection — orders whose total
    * quantity exceeds a threshold, enriched with customer/order detail,
    * top 100 by value. The scale shape: the HAVING-filtered aggregate
    * output is a tiny fraction of orders, so the enrich joins hang off a
    * small frame (AQE broadcasts it at runtime); the only full-size
    * shuffles are the per-orderkey agg and none on the enrich side
    * beyond what the planner measures. Top-k is sort+limit
    * (TakeOrderedAndProject), tie-broken on the unique order key so the
    * kept set is deterministic.
    */
  def largeOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  minQty: Double = 300.0, k: Int = 100): DataFrame =
    lineitem
      .groupBy("l_orderkey")
      .agg(money(sum(dec(col("l_quantity")))).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(k)
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"),
        col("o_orderdate"), money(dec(col("o_totalprice"))).as("total_price"),
        col("total_qty"))

  val largeOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) > 300.0)
      |SELECT o_orderkey, c_custkey, c_mktsegment, o_orderdate,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS total_price,
      |  total_qty
      |FROM big
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** B22 — TPC-H Q4 shape: order-priority counts for orders with at
    * least one LATE line (shipped ≥30 days after the order date),
    * expressed as a correlated EXISTS through the spark.sql surface.
    * Complements B20's correlated SCALAR subquery: here Catalyst's
    * RewritePredicateSubquery turns the EXISTS into a LEFT SEMI join on
    * l_orderkey with the date arithmetic as a residual condition — the
    * fact-side semi-join dedups per order before the tiny priority agg,
    * so nothing data-proportional survives the join. The reference's
    * job-status accounting (scheduler counts jobs with a qualifying
    * event, scheduler/job_scheduler.py:117) is this same shape.
    */
  def orderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    val vo = s"graft_q4_o_${rollupCallCounter.incrementAndGet()}"
    val vl = s"graft_q4_l_${rollupCallCounter.incrementAndGet()}"
    orders.createOrReplaceTempView(vo)
    lineitem.createOrReplaceTempView(vl)
    try {
      spark.sql(
        s"""SELECT o_orderpriority, count(*) AS order_count
           |FROM $vo o
           |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
           |  AND EXISTS (SELECT 1 FROM $vl l
           |              WHERE l.l_orderkey = o.o_orderkey
           |                AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY)
           |GROUP BY o_orderpriority""".stripMargin)
    } finally {
      spark.catalog.dropTempView(vo)
      spark.catalog.dropTempView(vl)
    }
  }

  val orderPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** B23 — TPC-H Q7 shape: bilateral shipping volume between two nations
    * by year. Scale shape: the 25-row nation dim is broadcast into the
    * SF-proportional supplier/customer tables to prune them to the two
    * nations FIRST (the planner then sizes those joins itself — no
    * forced broadcast of supplier/customer, per the round-2 verdict);
    * the lineitem⋈orders spine shuffles on its natural keys; the
    * cross-pair disjunction is a residual filter after both enrich
    * joins, exactly TPC-H's published formulation.
    */
  /** The traded-nation set: every directed cross-pair inside it is a
    * reported flow (TPC-H Q7 fixes two nations; a set keeps the query
    * non-empty at every test SF — supplier coverage of any single pair
    * is sparse at sf0.001's 10 suppliers).
    */
  val VolumeNations: Seq[String] = Seq("NATION_10", "NATION_11", "NATION_12")

  def volumeShipping(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                     supplier: DataFrame, nation: DataFrame,
                     nations: Seq[String] = VolumeNations): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    val natSel = nation.filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey"), col("n_name"))
    val supp = supplier
      .join(broadcast(natSel), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(broadcast(natSel), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"), discE4.as("disc_e4"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(col("disc_e4")).as("rev_e4"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"))
  }

  def volumeShippingSql(nations: Seq[String] = VolumeNations): String = {
    val inList = nations.map(n => s"'$n'").mkString(", ")
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
       |        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4
       |  FROM lineitem
       |    JOIN supplier ON l_suppkey = s_suppkey
       |    JOIN orders   ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |    AND l_shipdate <  TIMESTAMP '1998-01-01'
       |    AND n1.n_name IN ($inList) AND n2.n_name IN ($inList)
       |    AND n1.n_name <> n2.n_name
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** B24 — TPC-H Q10 shape: top-k customers by returned-item revenue in
    * a half-year window. Scale shape: the fact side is aggregated down
    * to one row per customer BEFORE any dimension join; top-k is
    * sort+limit (TakeOrderedAndProject) applied to the pre-join
    * aggregate — the enrich joins then touch exactly k rows, not
    * |customers|, and the ranking matches the oracle's order of
    * operations (rank BEFORE the joins) even if a custkey ever failed to
    * resolve in customer/nation. Nation (fixed 25 rows) is the only
    * forced broadcast; the k-row ranked side is small enough that the
    * planner broadcasts it into customer unhinted (its limit-k stats
    * sit far under the auto-broadcast threshold).
    */
  def returnedItems(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, k: Int = 20): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    val rev = lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(discE4).as("rev_e4"))
    val ranked = rev
      .orderBy(col("rev_e4").desc, col("o_custkey"))
      .limit(k)
      .sortWithinPartitions(col("rev_e4").desc, col("o_custkey"))
      .withColumn("rn", rankWithinLimit(k))
    ranked
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"), col("rn"))
  }

  def returnedItemsSql(k: Int = 20): String =
    s"""WITH rev AS (
       |  SELECT o_custkey,
       |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
       |        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE l_returnflag = 'R'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate <  TIMESTAMP '1996-07-01'
       |  GROUP BY o_custkey)
       |SELECT c_custkey, c_name, n_name,
       |  CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, rn
       |FROM (SELECT *, row_number() OVER (ORDER BY rev_e4 DESC, o_custkey) AS rn FROM rev)
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |WHERE rn <= $k""".stripMargin

  /** B25 — TPC-H Q2 shape: cheapest supplier per part. Q2's correlated
    * `price = (SELECT min(price) …)` subquery is re-expressed as ONE
    * deterministic argmin hash aggregate — `min(struct(price_cents,
    * suppkey))` compares lexicographically, so ties on price break on
    * the smaller supplier identically in both engines (a bare
    * `min_by`/`arg_min` is tie-nondeterministic, and the join-back
    * `WHERE price = min_price` form scans the fact twice and can emit
    * tie duplicates). Fact reduced to one row per part before the dim
    * joins; part/supplier are SF-proportional → both joins unhinted.
    */
  def minCostSupplier(lineitem: DataFrame, supplier: DataFrame, part: DataFrame): DataFrame = {
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val best = lineitem
      .select(col("l_partkey"),
        struct(cents.as("pc"), col("l_suppkey").as("sk")).as("ps"))
      .groupBy("l_partkey")
      .agg(min(col("ps")).as("b"))
      .select(col("l_partkey"), col("b.pc").as("pc"), col("b.sk").as("l_suppkey"))
    best
      .join(part.select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        (col("pc").cast("double") / 100.0).as("best_price"))
  }

  val minCostSupplierSql: String =
    """WITH best AS (
      |  SELECT l_partkey,
      |    min({'pc': CAST(round(l_extendedprice * 100, 0) AS BIGINT),
      |         'sk': l_suppkey}) AS b
      |  FROM lineitem GROUP BY 1)
      |SELECT p_partkey, p_name, s_suppkey, s_name,
      |  CAST(b.pc AS DOUBLE) / 100.0 AS best_price
      |FROM best
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON b.sk = s_suppkey""".stripMargin

  /** B28: TPC-H Q6 shape — forecasting revenue change. The minimal
    * scan-dominant query: every predicate (ship-year range, discount
    * band, quantity cap) reaches the parquet scan as a pushed filter,
    * then one map-side-combined scalar aggregate. At 100 TB this plan
    * is pure I/O: no shuffle beyond the final single-row reduce.
    * Discount compared in exact cents (the data is 2-decimal) so the
    * band edges can't straddle a float representation gap cross-engine.
    */
  def revenueForecast(lineitem: DataFrame): DataFrame = {
    val discCents = round(col("l_discount") * 100, 0).cast("long")
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        round(col("l_discount") * 100, 0).cast("long").between(5, 7) &&
        col("l_quantity") < 24)
      .agg(
        sum(round(col("l_extendedprice") * 100, 0).cast("long") * discCents).as("rev_e4"),
        count(lit(1)).as("n_items"))
      .select((col("rev_e4").cast("double") / 10000.0).as("revenue"), col("n_items"))
  }

  val revenueForecastSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |                * CAST(round(l_discount * 100, 0) AS BIGINT)) AS DOUBLE)
      |         / 10000.0 AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
      |  AND CAST(round(l_discount * 100, 0) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  /** B29: TPC-H Q13 shape — customer order-count distribution. Orders
    * are aggregated to one row per customer BEFORE the outer join (the
    * join input shrinks from |orders| to |customers|), customers with
    * no qualifying orders surface as c_count=0 through the left join,
    * and the final distribution groupBy is over the bounded count
    * domain. Two key-partitioned shuffles total; no window, no skew
    * (custkey is high-cardinality).
    */
  def custDist(customer: DataFrame, orders: DataFrame): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c_count"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val custDistSql: String =
    """WITH pc AS (SELECT o_custkey, count(*) AS c_count FROM orders
      |            WHERE o_orderpriority <> '4-NOT SPECIFIED' GROUP BY 1)
      |SELECT coalesce(c_count, 0) AS c_count, count(*) AS custdist
      |FROM customer LEFT JOIN pc ON c_custkey = o_custkey
      |GROUP BY 1""".stripMargin

  /** B30: TPC-H Q17 shape — small-quantity-order revenue ("what would
    * we lose dropping small orders of these parts"). The correlated
    * `l_quantity < 0.2 * avg(l_quantity per part)` subquery is
    * decorrelated by hand into one per-part aggregate joined back onto
    * the SAME filtered fact frame: the part filter prunes first (the
    * SF-proportional part dim stays unhinted), the per-part stats frame
    * is one row per surviving part (planner broadcasts it on stats),
    * and the 0.2× comparison is exact integer arithmetic
    * (5·qty·cnt < Σqty — quantities are integral) so neither engine
    * divides. Brand prefix + size bound chosen to stay selective but
    * non-degenerate at sf0.001 (container/brand columns of classic Q17
    * don't all exist in this schema).
    */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val pk = part
      .filter(col("p_brand").startsWith("Brand#2") && col("p_size") < 15)
      .select("p_partkey")
    val li = lineitem
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(pk, col("l_partkey") === col("p_partkey"))
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val stats = li
      .groupBy(col("l_partkey").as("a_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_cnt"))
    li.join(stats, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("qty_cnt") < col("qty_sum"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev_cents"),
        count(lit(1)).as("n_lines"))
      .select(
        round(col("rev_cents").cast("double") / 100.0 / 7.0, 4).as("avg_yearly"),
        col("n_lines"))
  }

  val smallQtyRevenueSql: String =
    """WITH pk AS (SELECT p_partkey FROM part
      |            WHERE starts_with(p_brand, 'Brand#2') AND p_size < 15),
      |li AS (SELECT l_partkey, l_quantity, l_extendedprice
      |       FROM lineitem JOIN pk ON l_partkey = p_partkey),
      |st AS (SELECT l_partkey AS a_partkey,
      |              sum(CAST(l_quantity AS BIGINT)) AS qty_sum,
      |              count(*) AS qty_cnt
      |       FROM li GROUP BY 1)
      |SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
      |             / 100.0 / 7.0, 4) AS avg_yearly,
      |       count(*) AS n_lines
      |FROM li JOIN st ON l_partkey = a_partkey
      |WHERE CAST(l_quantity AS BIGINT) * 5 * qty_cnt < qty_sum""".stripMargin

  /** B31: TPC-H Q19 shape — disjunctive branded revenue. The three
    * brand/size/quantity conjunction arms are OR-ed as the join
    * residual, but the ENVELOPE of the disjunction (quantity 1–30,
    * size 1–35, brand prefix set) is added as explicit conjuncts on
    * each side so the parquet scans prune before the join — Catalyst
    * does not hoist common bounds out of an OR on its own, and at
    * 100 TB the difference is scanning 3 quantity bands vs the whole
    * fact. Revenue in exact e4 integer units, half-up cents rounding
    * shared with B7.
    */
  def brandedRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem
      .filter(col("l_quantity").between(1, 30))
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pt = part
      .filter((col("p_brand").startsWith("Brand#1") ||
        col("p_brand").startsWith("Brand#2") ||
        col("p_brand").startsWith("Brand#3")) && col("p_size").between(1, 35))
      .select("p_partkey", "p_brand", "p_size")
    val arm1 = col("p_brand").startsWith("Brand#1") &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
    val arm2 = col("p_brand").startsWith("Brand#2") &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
    val arm3 = col("p_brand").startsWith("Brand#3") &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(arm1 || arm2 || arm3)
      .agg(sum(discE4).as("rev_e4"), count(lit(1)).as("n_lines"))
      .select((expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("revenue"),
        col("n_lines"))
  }

  val brandedRevenueSql: String =
    """WITH a AS (
      |  SELECT sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4,
      |         count(*) AS n_lines
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE (starts_with(p_brand, 'Brand#1') AND p_size BETWEEN 1 AND 15
      |         AND l_quantity BETWEEN 1 AND 11)
      |     OR (starts_with(p_brand, 'Brand#2') AND p_size BETWEEN 1 AND 25
      |         AND l_quantity BETWEEN 10 AND 20)
      |     OR (starts_with(p_brand, 'Brand#3') AND p_size BETWEEN 1 AND 35
      |         AND l_quantity BETWEEN 20 AND 30))
      |SELECT CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_lines
      |FROM a""".stripMargin

  /** B32: TPC-H Q22 shape — lapsed rich customers. The global
    * positive-balance average is a one-row aggregate broadcast-crossed
    * back onto the nation-subset frame (the house pattern for scalar
    * subqueries); the above-average comparison is exact bigint
    * (cents·count > Σcents — no division, no float). "Lapsed" = no
    * order since 1999 via a left-anti join whose right side is just the
    * filtered orders key column; the final rollup groups by the bounded
    * nation key. This testdata has full FK coverage (every customer
    * has SOME order), so the recency filter — not a bare NOT EXISTS —
    * keeps the cohort non-degenerate.
    */
  def lapsedRich(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cents = round(col("c_acctbal") * 100, 0).cast("long")
    val base = customer
      .filter(col("c_nationkey").isin(3, 7, 11, 15, 19, 23))
      .select(col("c_custkey"), col("c_nationkey"), cents.as("bal_cents"))
    val stats = base.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("sum_cents"), count(lit(1)).as("n_pos"))
    base.crossJoin(broadcast(stats))
      .filter(col("bal_cents") * col("n_pos") > col("sum_cents"))
      .join(orders.filter(col("o_orderdate") >= lit("1999-01-01"))
        .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum(col("bal_cents")).as("tot_cents"))
      .select(col("c_nationkey"), col("numcust"),
        (col("tot_cents").cast("double") / 100.0).as("totacctbal"))
  }

  val lapsedRichSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
      |  FROM customer WHERE c_nationkey IN (3, 7, 11, 15, 19, 23)),
      |st AS (SELECT sum(bal_cents) AS sum_cents, count(*) AS n_pos
      |       FROM base WHERE bal_cents > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |       CAST(sum(bal_cents) AS DOUBLE) / 100.0 AS totacctbal
      |FROM base, st
      |WHERE bal_cents * n_pos > sum_cents
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = base.c_custkey
      |                    AND o.o_orderdate >= '1999-01-01')
      |GROUP BY 1""".stripMargin

  /** B33: TPC-H Q8 shape — national market share. The five-table spine
    * is pruned in dependency order BEFORE it ever touches the fact: the
    * part-type filter shrinks lineitem at the first join, the region →
    * nation chain (bounded, broadcast) prunes customer to one region,
    * and orders carries only (orderkey, custkey, year) through the
    * spine. The share division happens once per year group over exact
    * e4 integer sums, so both engines divide the same two bigints.
    * Nation (25 rows) is the only forced broadcast; part/customer/
    * supplier stay unhinted (SF-proportional house rule).
    */
  def marketShare(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  supplier: DataFrame, part: DataFrame, nation: DataFrame,
                  region: DataFrame, targetNation: String = "NATION_12"): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    val pk = part.filter(col("p_type") === "ECONOMY").select("p_partkey")
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = customer
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val supp = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), discE4.as("disc_e4"))
      .join(pk, col("l_partkey") === col("p_partkey"))
      .join(orders
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === targetNation, col("disc_e4")).otherwise(0L))
          .as("nat_e4"),
        sum(col("disc_e4")).as("tot_e4"))
      .select(col("o_year"),
        round(col("nat_e4").cast("double") / col("tot_e4").cast("double"), 6)
          .as("mkt_share"),
        (expr("(nat_e4 + 50) div 100").cast("double") / 100.0).as("nation_rev"),
        (expr("(tot_e4 + 50) div 100").cast("double") / 100.0).as("total_rev"))
  }

  def marketShareSql(targetNation: String = "NATION_12"): String =
    s"""WITH spine AS (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, ns.n_name AS n_name,
       |    CAST(round(l_extendedprice * 100, 0) AS BIGINT)
       |      * (100 - CAST(round(l_discount * 100, 0) AS BIGINT)) AS disc_e4
       |  FROM lineitem
       |    JOIN part ON l_partkey = p_partkey
       |    JOIN orders ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN nation nc ON c_nationkey = nc.n_nationkey
       |    JOIN region ON nc.n_regionkey = r_regionkey
       |    JOIN supplier ON l_suppkey = s_suppkey
       |    JOIN nation ns ON s_nationkey = ns.n_nationkey
       |  WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate <  TIMESTAMP '1998-01-01'),
       |g AS (SELECT o_year,
       |    sum(CASE WHEN n_name = '$targetNation' THEN disc_e4 ELSE 0 END) AS nat_e4,
       |    sum(disc_e4) AS tot_e4
       |  FROM spine GROUP BY 1)
       |SELECT o_year,
       |  round(CAST(nat_e4 AS DOUBLE) / CAST(tot_e4 AS DOUBLE), 6) AS mkt_share,
       |  CAST((nat_e4 + 50) // 100 AS DOUBLE) / 100.0 AS nation_rev,
       |  CAST((tot_e4 + 50) // 100 AS DOUBLE) / 100.0 AS total_rev
       |FROM g""".stripMargin

  /** B34: TPC-H Q9 shape — product-line profit by nation and year.
    * Classic Q9 prices cost from partsupp; this schema has no partsupp,
    * so cost = p_retailprice × quantity (same join shape, the cost
    * column just rides in from part instead of partsupp). Profit is an
    * exact e4 integer per line — revenue e4 minus cost cents × qty ×
    * 100 — summed per (nation, year); the double division happens once
    * per output row. The name filter prunes part before the fact join;
    * the only forced broadcast is the 25-row nation.
    */
  def productProfit(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                    supplier: DataFrame, nation: DataFrame): DataFrame = {
    val epc = round(col("l_extendedprice") * 100, 0).cast("long")
    val dc = round(col("l_discount") * 100, 0).cast("long")
    val amountE4 = epc * (lit(100L) - dc) -
      col("rp_cents") * col("l_quantity").cast("long") * lit(100L)
    val pk = part.filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), round(col("p_retailprice") * 100, 0).cast("long").as("rp_cents"))
    lineitem
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(pk, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"), amountE4.as("amount_e4"))
      .join(orders.select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(col("amount_e4")).as("profit_e4"))
      .select(col("nation"), col("o_year"),
        (col("profit_e4").cast("double") / 10000.0).as("profit"))
  }

  val productProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
      |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |             * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))
      |           - CAST(round(p_retailprice * 100, 0) AS BIGINT)
      |             * CAST(l_quantity AS BIGINT) * 100) AS DOUBLE)
      |    / 10000.0 AS profit
      |FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |WHERE contains(p_name, 'widget')
      |GROUP BY 1, 2""".stripMargin

  /** B35: TPC-H Q11 shape — important stock. The signature shape is a
    * group-HAVING against a GLOBAL scalar aggregate: per-part value from
    * the nation-filtered fact, kept only when it exceeds a fraction of
    * the total. The scalar is a one-row re-aggregate of the per-part
    * frame (one fact scan feeds both levels), broadcast-crossed back;
    * the fraction compare is exact bigint (value×10000 > 5×total, i.e.
    * 0.05%) so no float threshold can straddle engines. Without
    * partsupp, "value" = extended-price volume from the nation set's
    * suppliers — same dataflow, lineitem-priced.
    */
  def importantParts(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val supp = supplier
      .filter(col("s_nationkey").isin(3, 8, 13, 18, 23))
      .select("s_suppkey")
    val perPart = lineitem
      .select(col("l_partkey"), col("l_suppkey"), cents.as("cents"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("cents")).as("value_cents"))
    val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_cents") * 10000L > col("total_cents") * 5L)
      .select(col("l_partkey"),
        (col("value_cents").cast("double") / 100.0).as("part_value"))
  }

  val importantPartsSql: String =
    """WITH pp AS (
      |  SELECT l_partkey,
      |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS value_cents
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE s_nationkey IN (3, 8, 13, 18, 23)
      |  GROUP BY 1),
      |t AS (SELECT sum(value_cents) AS total_cents FROM pp)
      |SELECT l_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS part_value
      |FROM pp, t
      |WHERE value_cents * 10000 > total_cents * 5""".stripMargin

  /** B36: TPC-H Q15 shape — top supplier(s) by quarterly revenue. The
    * classic view + `WHERE total = (SELECT max(total))` formulation:
    * per-supplier revenue in exact e4 ints, the max as a one-row
    * aggregate of the SAME frame broadcast-crossed back, equality join
    * on exact integers (ties all surface, as in the spec — no float
    * equality hazard). Supplier dim joins only the argmax row(s).
    */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val discE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
      (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(discE4).as("rev_e4"))
    val mx = rev.agg(max(col("rev_e4")).as("max_e4"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_e4") === col("max_e4"))
      .join(supplier.select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (expr("(rev_e4 + 50) div 100").cast("double") / 100.0).as("total_revenue"))
  }

  val topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
      |        * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) AS rev_e4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name,
      |  CAST((rev_e4 + 50) // 100 AS DOUBLE) / 100.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)""".stripMargin

  /** B37: TPC-H Q16 shape — supplier counts per part attribute group,
    * excluding a blacklisted supplier set via NOT IN (left-anti here; the
    * exclusion keys are non-null so the semantics coincide). The
    * part-supplier relation is derived from lineitem (no partsupp in this
    * schema): the attribute filter prunes part before the fact join, the
    * anti-join's right side is just the key column of the (bounded-
    * selectivity) blacklist, and the distinct-count is Spark's standard
    * two-phase distinct agg on (group, suppkey) — no row explosion.
    * Complaints proxy: suppliers in arrears (negative balance).
    */
  def supplierCounts(lineitem: DataFrame, part: DataFrame,
                     supplier: DataFrame): DataFrame = {
    val excl = supplier.filter(col("s_acctbal") < 0).select("s_suppkey")
    val pt = part
      .filter(col("p_type") =!= "PROMO" && col("p_brand") =!= "Brand#5" &&
        col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    lineitem.select("l_partkey", "l_suppkey")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val supplierCountsSql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO' AND p_brand <> 'Brand#5'
      |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** B38: TPC-H Q20 shape — candidate promotion suppliers. Classic Q20's
    * correlated `ps_availqty > 0.5 × shipped qty` is re-framed (no
    * partsupp) as DOMINANT suppliers: a supplier qualifies when its 1996
    * shipped quantity of some name-filtered part strictly exceeds half
    * that part's 1996 total. Decorrelated into two stacked aggregates of
    * ONE pruned fact frame — per-(part, supplier) then per-part — joined
    * back on partkey with an exact 2·sq > tq integer compare, then the
    * supplier dim joins only the surviving distinct suppkeys (nation-set
    * filtered, as in the spec).
    */
  def promotionSuppliers(lineitem: DataFrame, part: DataFrame,
                         supplier: DataFrame): DataFrame = {
    val pk = part.filter(col("p_name").startsWith("small")).select("p_partkey")
    val li = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity").cast("long").as("qty"))
      .join(pk, col("l_partkey") === col("p_partkey"))
    val perPS = li.groupBy("l_partkey", "l_suppkey").agg(sum(col("qty")).as("sq"))
    val perP = perPS.groupBy(col("l_partkey").as("t_partkey")).agg(sum(col("sq")).as("tq"))
    perPS.join(perP, col("l_partkey") === col("t_partkey"))
      .filter(col("sq") * 2L > col("tq"))
      .select("l_suppkey").distinct()
      .join(supplier.select("s_suppkey", "s_name", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey").isin(2, 7, 12, 17, 22))
      .select("s_suppkey", "s_name")
  }

  val promotionSuppliersSql: String =
    """WITH li AS (
      |  SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE starts_with(p_name, 'small')
      |    AND l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01'),
      |ps AS (SELECT l_partkey, l_suppkey, sum(qty) AS sq FROM li GROUP BY 1, 2),
      |p AS (SELECT l_partkey AS t_partkey, sum(sq) AS tq FROM ps GROUP BY 1),
      |win AS (SELECT DISTINCT l_suppkey FROM ps JOIN p ON l_partkey = t_partkey
      |        WHERE sq * 2 > tq)
      |SELECT s_suppkey, s_name
      |FROM win JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_nationkey IN (2, 7, 12, 17, 22)""".stripMargin

  /** B39: TPC-H Q21 shape — suppliers who kept orders waiting. Classic
    * Q21 is EXISTS(another supplier) AND NOT EXISTS(another late
    * supplier) via two lineitem self-joins; with no commit/receipt dates
    * the blame signal is the return flag, and the scale-correct
    * re-expression collapses both correlated subqueries into per-order
    * aggregation — distinct-supplier count, distinct-returning-supplier
    * count, and the sole culprit key (max over a single-element set) —
    * so the fact is scanned once and never self-joined. The two distinct
    * aggregates run as two stacked hash aggs (per (order, supplier) with
    * a returned-row flag, then per order) rather than multi-distinct in
    * one agg: Spark plans the latter via Expand, tripling the rows into
    * the exchange, where the stacked form ships each distinct pair once
    * (r14; both shapes are the same arithmetic — ns counts the pair
    * groups, nr the flagged ones, culprit maxes the flagged suppkey).
    * Orders prune to status 'F' before the join; top-k over the
    * per-supplier counts is sort+limit (TakeOrderedAndProject) on the
    * unique (numwait desc, suppkey) total order, and the supplier dim
    * joins only k rows.
    */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, k: Int = 25): DataFrame = {
    val isRet = col("l_returnflag") === "R"
    val perPair = lineitem
      .join(orders.filter(col("o_orderstatus") === "F").select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(isRet).as("ret"))
    val perOrder = perPair
      .groupBy("l_orderkey")
      .agg(
        count(lit(1)).as("ns"),
        count(when(col("ret"), lit(1))).as("nr"),
        max(when(col("ret"), col("l_suppkey"))).as("culprit"))
      .filter(col("ns") >= 2 && col("nr") === 1)
    perOrder
      .groupBy("culprit")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("culprit"))
      .limit(k)
      .join(supplier.select("s_suppkey", "s_name"),
        col("culprit") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "numwait")
  }

  def waitingSuppliersSql(k: Int = 25): String =
    s"""WITH f AS (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'),
       |a AS (
       |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS ns,
       |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS nr,
       |    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS culprit
       |  FROM lineitem JOIN f ON l_orderkey = o_orderkey
       |  GROUP BY 1),
       |c AS (SELECT culprit, count(*) AS numwait FROM a
       |      WHERE ns >= 2 AND nr = 1 GROUP BY 1),
       |t AS (SELECT culprit, numwait FROM c ORDER BY numwait DESC, culprit LIMIT $k)
       |SELECT s_suppkey, s_name, numwait
       |FROM t JOIN supplier ON culprit = s_suppkey""".stripMargin

  /** B41: data-quality profiling (the Deequ/great-expectations niche —
    * the stats gate a pipeline runs before trusting a new drop): per
    * column of `orders`, non-null/null counts, exact distinct count,
    * and min/max rendered through engine-portable casts (integers and
    * strings verbatim; the timestamp column profiles as its DATE —
    * 'yyyy-MM-dd' renders identically in both engines where raw
    * timestamp strings do not). ONE scan: all 5 columns' aggregates in
    * a single
    * agg — Spark plans the multi-distinct via Expand (a 5× row
    * multiply, the standard exact-profile cost); at 100 TB swap the
    * exact distinct for `approx_count_distinct` per column and the
    * Expand disappears — the surrounding shape is unchanged. The
    * wide 1-row agg then unpivots to one row per column via `stack`
    * (a constant-width projection, no shuffle).
    */
  def dataProfile(orders: DataFrame): DataFrame = {
    val src = orders.withColumn("o_orderdate_d", to_date(col("o_orderdate")))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_orderdate_d")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_nn"),
      countDistinct(col(c)).as(s"${c}_nd"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max")))
    val wide = src.agg(count(lit(1)).as("n"), aggs: _*)
    val stackExpr = cols
      .map(c => s"'$c', n - ${c}_nn, ${c}_nd, ${c}_min, ${c}_max")
      .mkString(", ")
    wide.select(col("n"),
      expr(s"stack(${cols.length}, $stackExpr)")
        .as(Seq("col_name", "n_nulls", "n_distinct", "min_s", "max_s")))
  }

  /** B41b: the documented 100 TB execution of B41 made real —
    * [[dataProfile]]'s exact multi-count-distinct plans via ONE Expand
    * (a 5× row multiplication before the agg: the standard exact
    * cost); swapping HLL++ (`approx_count_distinct`) for the exact
    * distinct removes the Expand entirely, leaving a single scan whose
    * every aggregate is a fixed-width, map-side-mergeable sketch —
    * the shape a petabyte profile actually runs. Convention follows
    * C31: the registered query drops the probabilistic estimate before
    * the oracle hash (exact-comparable columns only — n, nulls,
    * min/max); the 4σ relative-error bound vs the exact profile and
    * the Expand-free plan are pinned in ScalaTest (PlanSpec), where a
    * testdata refresh landing in the probabilistic tail can't flip the
    * driver's gate on a non-bug.
    */
  def dataProfileApprox(orders: DataFrame, rsd: Double = 0.05): DataFrame = {
    val src = orders.withColumn("o_orderdate_d", to_date(col("o_orderdate")))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_orderdate_d")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_nn"),
      approx_count_distinct(col(c), rsd).as(s"${c}_nd"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max")))
    val wide = src.agg(count(lit(1)).as("n"), aggs: _*)
    val stackExpr = cols
      .map(c => s"'$c', n - ${c}_nn, ${c}_nd, ${c}_min, ${c}_max")
      .mkString(", ")
    wide.select(col("n"),
      expr(s"stack(${cols.length}, $stackExpr)")
        .as(Seq("col_name", "n_nulls", "nd_hll", "min_s", "max_s")))
  }

  val dataProfileApproxSql: String = {
    val cols = Seq(
      ("o_orderkey", "o_orderkey"),
      ("o_custkey", "o_custkey"),
      ("o_orderstatus", "o_orderstatus"),
      ("o_orderpriority", "o_orderpriority"),
      ("o_orderdate_d", "CAST(o_orderdate AS DATE)"))
    cols.map { case (name, e) =>
      s"""SELECT '$name' AS col_name, count(*) AS n,
         |  count(*) - count($e) AS n_nulls,
         |  CAST(min($e) AS STRING) AS min_s,
         |  CAST(max($e) AS STRING) AS max_s
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  val dataProfileSql: String = {
    val cols = Seq(
      ("o_orderkey", "o_orderkey"),
      ("o_custkey", "o_custkey"),
      ("o_orderstatus", "o_orderstatus"),
      ("o_orderpriority", "o_orderpriority"),
      ("o_orderdate_d", "CAST(o_orderdate AS DATE)"))
    cols.map { case (name, e) =>
      s"""SELECT '$name' AS col_name, count(*) AS n,
         |  count(*) - count($e) AS n_nulls,
         |  count(DISTINCT $e) AS n_distinct,
         |  CAST(min($e) AS STRING) AS min_s,
         |  CAST(max($e) AS STRING) AS max_s
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** B42: equi-width value histogram — the distribution-profiling
    * complement of B41's column stats and B4's quantile deciles (a
    * histogram answers "what does the distribution LOOK like" with one
    * keyed agg, where quantiles answer "where are the cut points").
    * Buckets are floor(value / width) — floor on an IEEE double is
    * exact and identical cross-engine, and lo = bucket·width is an
    * exact small-integer × power-of-two-free product both engines
    * round identically; share is one correctly-rounded division by
    * the broadcast total. ONE hash agg keyed on the bucket id (bounded
    * by the value range, not the corpus) — scan-shaped at any scale.
    */
  val HistWidth = 5.0

  def valueHistogram(events: DataFrame): DataFrame = {
    val bucketed = events.select(
      floor(col("value") / lit(HistWidth)).cast("long").as("bucket"))
    val counts = bucketed.groupBy("bucket").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("bucket"),
        (col("bucket").cast("double") * lit(HistWidth)).as("lo"),
        col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("share"))
  }

  val valueHistogramSql: String =
    s"""WITH b AS (
       |  SELECT CAST(floor(value / $HistWidth) AS BIGINT) AS bucket FROM events),
       |c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
       |SELECT bucket, CAST(bucket AS DOUBLE) * $HistWidth AS lo, n,
       |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
       |FROM c, t""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_value_histogram" -> ((s, d) => valueHistogram(Tables.events(s, d))),
    "q_data_profile" -> ((s, d) => dataProfile(Tables.orders(s, d))),
    // exact-comparable columns only (C31 convention): the HLL estimate
    // itself is spec-pinned, not oracle-hashed
    "q_data_profile_approx" -> ((s, d) =>
      dataProfileApprox(Tables.orders(s, d)).drop("nd_hll")),
    "q8_market_share" -> ((s, d) =>
      marketShare(Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.part(s, d), Tables.nation(s, d),
        Tables.region(s, d))),
    "q9_product_profit" -> ((s, d) =>
      productProfit(Tables.lineitem(s, d), Tables.orders(s, d), Tables.part(s, d),
        Tables.supplier(s, d), Tables.nation(s, d))),
    "q11_important_parts" -> ((s, d) =>
      importantParts(Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q15_top_supplier" -> ((s, d) =>
      topSupplier(Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q16_supplier_counts" -> ((s, d) =>
      supplierCounts(Tables.lineitem(s, d), Tables.part(s, d), Tables.supplier(s, d))),
    "q20_promotion_suppliers" -> ((s, d) =>
      promotionSuppliers(Tables.lineitem(s, d), Tables.part(s, d), Tables.supplier(s, d))),
    "q21_waiting_suppliers" -> ((s, d) =>
      waitingSuppliers(Tables.lineitem(s, d), Tables.orders(s, d), Tables.supplier(s, d))),
    "q6_revenue_forecast" -> ((s, d) => revenueForecast(Tables.lineitem(s, d))),
    "q13_cust_dist" -> ((s, d) => custDist(Tables.customer(s, d), Tables.orders(s, d))),
    "q17_small_qty_revenue" -> ((s, d) =>
      smallQtyRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q19_branded_revenue" -> ((s, d) =>
      brandedRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q22_lapsed_rich" -> ((s, d) =>
      lapsedRich(Tables.customer(s, d), Tables.orders(s, d))),
    "q2_min_cost_supplier" -> ((s, d) =>
      minCostSupplier(Tables.lineitem(s, d), Tables.supplier(s, d), Tables.part(s, d))),
    "q4_order_priority" -> ((s, d) =>
      orderPriority(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q7_volume_shipping" -> ((s, d) =>
      volumeShipping(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "q10_returned_items" -> ((s, d) =>
      returnedItems(Tables.lineitem(s, d), Tables.orders(s, d),
        Tables.customer(s, d), Tables.nation(s, d))),
    "q_cube_revenue" -> ((s, d) => cubeRevenue(Tables.orders(s, d))),
    "q_pivot_status" -> ((s, d) => pivotStatus(Tables.orders(s, d))),
    "q_above_avg_orders" -> ((s, d) => aboveAvgOrders(Tables.orders(s, d))),
    "q_nation_roster" -> ((s, d) =>
      nationRoster(Tables.nation(s, d), Tables.region(s, d))),
    "q_lapsed_customers" -> ((s, d) => lapsedCustomers(Tables.orders(s, d))),
    "q_revenue_share" -> ((s, d) =>
      revenueShare(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q12_priority_lines" -> ((s, d) =>
      priorityLines(Tables.lineitem(s, d), Tables.orders(s, d))),
    "q18_large_orders" -> ((s, d) =>
      largeOrders(Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d))),
    "q5_local_supplier_volume" -> ((s, d) =>
      localSupplierVolume(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q_running_total" -> ((s, d) => runningTotal(Tables.orders(s, d))),
    "q_rollup_revenue" -> ((s, d) =>
      rollupRevenue(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q_group_quantiles" -> ((s, d) => groupQuantiles(Tables.orders(s, d))),
    "q_winsorize" -> ((s, d) => winsorize(Tables.orders(s, d))),
    "q_salted_segment_revenue" -> ((s, d) =>
      saltedSegmentRevenue(Tables.orders(s, d), Tables.customer(s, d))),
    "q_key_skew" -> ((s, d) => Skew.keySkew(Tables.orders(s, d))),
    "q1_pricing_summary" -> ((s, d) => pricingSummary(Tables.lineitem(s, d))),
    "q_join_pushdown" -> ((s, d) =>
      joinPushdown(Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d), Tables.region(s, d))),
    "q_top_parts" -> ((s, d) => topParts(Tables.lineitem(s, d), Tables.part(s, d))),
    "q_decile_value" -> ((s, d) => decileValue(Tables.orders(s, d))),
    "q_monthly_revenue" -> ((s, d) => monthlyRevenue(Tables.orders(s, d))),
    "q3_shipping_priority" -> ((s, d) =>
      shippingPriority(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q14_promo_share" -> ((s, d) => promoShare(Tables.lineitem(s, d), Tables.part(s, d))),
    "q_supplier_volume" -> ((s, d) =>
      supplierVolume(Tables.lineitem(s, d), Tables.supplier(s, d), Tables.nation(s, d))))

  def oracle: Map[String, String] = Map(
    "q_value_histogram" -> valueHistogramSql,
    "q_data_profile" -> dataProfileSql,
    "q_data_profile_approx" -> dataProfileApproxSql,
    "q8_market_share" -> marketShareSql(),
    "q9_product_profit" -> productProfitSql,
    "q11_important_parts" -> importantPartsSql,
    "q15_top_supplier" -> topSupplierSql,
    "q16_supplier_counts" -> supplierCountsSql,
    "q20_promotion_suppliers" -> promotionSuppliersSql,
    "q21_waiting_suppliers" -> waitingSuppliersSql(),
    "q6_revenue_forecast" -> revenueForecastSql,
    "q13_cust_dist" -> custDistSql,
    "q17_small_qty_revenue" -> smallQtyRevenueSql,
    "q19_branded_revenue" -> brandedRevenueSql,
    "q22_lapsed_rich" -> lapsedRichSql,
    "q2_min_cost_supplier" -> minCostSupplierSql,
    "q4_order_priority" -> orderPrioritySql,
    "q7_volume_shipping" -> volumeShippingSql(),
    "q10_returned_items" -> returnedItemsSql(),
    "q_cube_revenue" -> cubeRevenueSql,
    "q_pivot_status" -> pivotStatusSql,
    "q_above_avg_orders" -> aboveAvgOrdersSql,
    "q_nation_roster" -> nationRosterSql,
    "q_lapsed_customers" -> lapsedCustomersSql,
    "q_revenue_share" -> revenueShareSql,
    "q12_priority_lines" -> priorityLinesSql,
    "q18_large_orders" -> largeOrdersSql,
    "q5_local_supplier_volume" -> localSupplierVolumeSql,
    "q_running_total" -> runningTotalSql,
    "q_rollup_revenue" -> rollupRevenueSql,
    "q_group_quantiles" -> groupQuantilesSql,
    "q_winsorize" -> winsorizeSql,
    "q_salted_segment_revenue" -> saltedSegmentRevenueSql,
    "q_key_skew" -> Skew.keySkewSql,
    "q1_pricing_summary" -> pricingSummarySql,
    "q_join_pushdown" -> joinPushdownSql,
    "q_top_parts" -> topPartsSql,
    "q_decile_value" -> decileValueSql,
    "q_monthly_revenue" -> monthlyRevenueSql,
    "q3_shipping_priority" -> shippingPrioritySql,
    "q14_promo_share" -> promoShareSql,
    "q_supplier_volume" -> supplierVolumeSql)
}
