package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph
import graft.sources.Tables

/** Invariants for the graph analytics suite beyond the DuckDB oracle:
  * a brute-force triangle recount on a known graph, recommendation
  * sanity, and — the load-bearing one — bit-identical PageRank under a
  * different input partitioning, which is the whole point of running
  * the fixpoint in scaled bigint arithmetic instead of doubles.
  */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)
  lazy val events: DataFrame = Tables.events(spark, sf)

  override def afterAll(): Unit = spark.stop()

  /** Synthetic event frame whose followEdges derivation yields a known
    * graph: user u clicking value v creates edge u→(v%20). K4 on nodes
    * {1,2,3,4} = 4 triangles, every node in 3 of them.
    */
  private def k4Events: DataFrame = {
    import spark.implicits._
    val pairs = for {
      a <- 1 to 4; b <- 1 to 4 if a != b
    } yield (a.toLong * 100 + b, a.toLong, "click", b.toDouble)
    pairs.toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .withColumn("props", lit("{}"))
  }

  test("triangles: K4 has four triangles, each node in three") {
    val t = Graph.triangles(k4Events).collect()
    assert(t.length == 4)
    assert(t.forall(_.getLong(1) == 3L),
      s"each K4 node sits in 3 triangles: ${t.mkString(",")}")
  }

  test("triangles: per-node counts sum to 3x the triangle total (testdata)") {
    val perNode = Graph.triangles(events)
    val sumCounts = perNode.agg(sum("n_triangles")).head().getLong(0)
    assert(sumCounts % 3 == 0, s"per-node counts must triple-count each triangle: $sumCounts")
    assert(sumCounts > 0, "testdata graph should contain triangles")
  }

  test("friend recs: never recommends an existing edge, respects k and ties") {
    val recs = Graph.friendRecs(events, k = 3).cache()
    assert(recs.filter(col("rn") > 3).isEmpty, "rn must be capped at k")
    // No recommended pair may already be adjacent (either direction of
    // the derived follow graph).
    val e = graft.operators.Reference.followEdges(events)
    val und = e.select(col("src").as("a"), col("dst").as("b"))
      .union(e.select(col("dst").as("a"), col("src").as("b")))
      .distinct()
    val overlap = recs.join(und,
      recs("user_id") === und("a") && recs("rec") === und("b"), "left_semi")
    assert(overlap.isEmpty, "recommended a pair that is already an edge")
    // Deterministic ranking: within a user, rn order follows
    // (mutuals desc, rec asc).
    val bad = recs.as("x").join(recs.as("y"),
      col("x.user_id") === col("y.user_id") && col("x.rn") < col("y.rn") &&
        (col("x.mutuals") < col("y.mutuals") ||
          (col("x.mutuals") === col("y.mutuals") && col("x.rec") > col("y.rec"))))
    assert(bad.isEmpty, "rank order must follow (mutuals desc, rec asc)")
    recs.unpersist()
  }

  test("pagerank: bit-identical under a different input partitioning") {
    val a = Graph.pageRank(events)
      .select("node", "rank_scaled").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Graph.pageRank(events.repartition(7, col("event_id")))
      .select("node", "rank_scaled").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b, "scaled-bigint PageRank must not depend on partitioning/merge order")
  }

  test("pagerank convergence: early-stops under the cap, bit-identical to fixed-iteration, stable past the stop (10x graph)") {
    // 10x the suite's graph (sf0.01 events): the convergence loop must
    // stop on mass movement, not on a lucky round count.
    val ev10 = Tables.events(spark, "/root/testdata/sf0.01")
    val eps = 1000000000L // 1e9 scaled units = 1e-3 of total rank mass
    val (ranks, rounds, delta) = Graph.iterateCore(ev10, 40, Some(eps))
    assert(rounds > 1 && rounds < 40,
      s"expected genuine early-stop, got rounds=$rounds")
    assert(delta >= 0 && delta < eps, s"reported delta $delta not under eps $eps")
    // A converged run IS the fixed-iteration run at the same round
    // count — integer fixed-point arithmetic, so bit-identical.
    val fixed = Graph.pageRank(ev10, iters = rounds)
      .select(col("node"), col("rank_scaled").as("rf"))
    val diff = ranks.select(col("node"), col("r"))
      .join(fixed, "node").filter(col("r") =!= col("rf")).count()
    assert(diff == 0, s"converged ranks diverge from pageRank($rounds) on $diff nodes")
    // Stability: one more round past the stop moves less than 2*eps of
    // mass (damping contracts the delta ~0.85x per round; the slack
    // covers integer-floor jitter).
    val (more, _, _) = Graph.iterateCore(ev10, rounds + 1, None)
    val moved = ranks.select(col("node"), col("r"))
      .join(more.select(col("node"), col("r").as("r2")), "node")
      .agg(sum(abs(col("r") - col("r2")))).head().getLong(0)
    assert(moved < 2 * eps, s"post-convergence round moved $moved >= ${2 * eps}")
    // public wrapper: same schema as pageRank, total output
    val pub = Graph.pageRankConverged(ev10, epsScaled = eps)
    assert(pub.columns.toSeq == Seq("node", "rank_scaled", "rank"))
    assert(pub.count() == ranks.count())
  }

  test("pagerank: mass stays bounded and every node holds at least the base share") {
    val ranks = Graph.pageRank(events).cache()
    val n = ranks.count()
    val base = (15L * 1000000000000L / 100L) / n
    assert(ranks.filter(col("rank_scaled") < base).isEmpty,
      "every node receives at least the teleport share")
    val total = ranks.agg(sum("rank_scaled")).head().getLong(0)
    assert(total <= 1000000000000L,
      s"floor divisions and dangling leak can only LOSE mass: $total")
    // Dangling sinks keep their rank out of circulation each round, so
    // the surviving share depends on graph shape; the teleport floor is
    // the only lower bound that is structural.
    assert(total >= base * n, s"total can't undercut the teleport floor: $total")
    ranks.unpersist()
  }

  test("lpa: two cliques with one bridge resolve to two communities (hand-traced)") {
    import spark.implicits._
    // K3 {1,2,3} + K3 {10,11,12} + bridge 3-10; synchronous self-vote
    // rounds with the (md5, label) tie-break trace to {1,2,3}→1 and
    // {10,11,12}→11 after 3 rounds (11 has the clique's smallest md5
    // rank; the self-vote keeps each clique's winner from being
    // overwritten across the bridge).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val got = Graph.lpaOnUndirected(und, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 11L, 11L -> 11L, 12L -> 11L), s"got $got")
  }

  test("lpa convergence: early-stop is a true fixpoint, identical to the fixed-round run") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    // converges at round 2 (round 1 already the fixpoint, detected one
    // round later) — must equal a full 20-round run label for label
    val conv = Graph.lpaCore(und, 20, stopOnFixpoint = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Graph.lpaCore(und, 20, stopOnFixpoint = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv == fixed, s"converged $conv != fixed-20 $fixed")
    assert(conv == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 11L, 11L -> 11L, 12L -> 11L))
    // public wrapper: same schema as communityLpa, total assignment
    val pub = Graph.communityLpaConverged(
      Tables.events(spark, "/root/testdata/sf0.01"))
    assert(pub.columns.toSeq == Seq("node", "community"))
    assert(pub.select("node").distinct().count() == pub.count())
  }

  test("lpa: sf0.01 communities are a total assignment and nontrivial") {
    // sf0.001 has only ~15 users over the 20 hub nodes — that graph IS
    // one dense community; structure appears from sf0.01 up
    val ev01 = Tables.events(spark, "/root/testdata/sf0.01")
    val com = Graph.communityLpa(ev01).cache()
    val nodes = com.count()
    assert(com.select("node").distinct().count() == nodes, "one community per node")
    val k = com.select("community").distinct().count()
    assert(k > 1, "all nodes in one community — the md5 tie-break should keep hub basins apart")
    assert(k < nodes, "no propagation happened — every node kept its own label")
    com.unpersist()
  }
}
