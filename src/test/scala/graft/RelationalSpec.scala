package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Reference}
import graft.sources.Tables

/** Invariant tests for the reference-derived relational operators on the
  * sf0.001 testdata (full value parity vs DuckDB is the driver's gate;
  * these check structural properties fast).
  */
class RelationalSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("snapshot diff: statuses are a partition of both windows' users") {
    val d = Reference.snapshotDiff(Tables.events(spark, sf))
    // churned ⇒ no curr count; new ⇒ no prev count; changed/stable ⇒ both
    assert(d.filter(col("status") === "churned" && col("curr_cnt").isNotNull).count() == 0)
    assert(d.filter(col("status") === "new" && col("prev_cnt").isNotNull).count() == 0)
    assert(d.filter(col("status") === "stable" && col("prev_cnt") =!= col("curr_cnt")).count() == 0)
    assert(d.filter(col("status") === "changed" && col("prev_cnt") === col("curr_cnt")).count() == 0)
    // one row per user, and totals reconcile with the raw windows
    assert(d.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    val t = unix_micros(col("ts"))
    val ev = Tables.events(spark, sf)
    val prevUsers = ev.filter(t >= 1704067200000000L && t < 1704672000000000L)
      .select("user_id").distinct().count()
    val currUsers = ev.filter(t >= 1704672000000000L && t < 1705276800000000L)
      .select("user_id").distinct().count()
    assert(d.filter(col("prev_cnt").isNotNull).count() == prevUsers)
    assert(d.filter(col("curr_cnt").isNotNull).count() == currUsers)
  }

  test("cdc apply: equals log replay; delete-final keys absent") {
    val ev = Tables.events(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val last = ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val applied = Reference.cdcApply(ev)
    val expected = last.filter(col("event_type") =!= "error")
    assert(applied.count() == expected.count())
    val joined = applied.join(
      expected.select(col("user_id"), col("event_id").as("exp_id")), "user_id")
    assert(joined.filter(col("last_event_id") =!= col("exp_id")).count() == 0)
    val deleted = last.filter(col("event_type") === "error").select("user_id")
    assert(applied.join(deleted, "user_id").count() == 0)
  }

  test("every registered query runs non-empty on sf0.001") {
    val emptyOk = Set("q_pending_users_antijoin", "q_recent_window_dedup")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      withClue(s"$name:") { assert(n > 0 || emptyOk(name), s"$name returned 0 rows") }
    }
  }

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("mutual edges are reciprocal and ordered") {
    val e = Reference.followEdges(Tables.events(spark, sf)).cache()
    val m = Reference.mutualEdges(Tables.events(spark, sf)).collect()
    val edgeSet = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    m.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b)
      assert(edgeSet.contains((a, b)) && edgeSet.contains((b, a)))
    }
  }

  test("upsert-latest keeps exactly one row per key, the newest") {
    val out = Reference.upsertLatest(Tables.events(spark, sf))
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.count() == users)
    assert(out.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // newest: last_event_id must be the max event_id for that user
    val mx = Tables.events(spark, sf).groupBy("user_id")
      .agg(max("event_id").as("mx"))
    val bad = out.join(mx, "user_id").filter(col("last_event_id") =!= col("mx")).count()
    assert(bad == 0)
  }

  test("sessionize: session durations are non-negative, gaps split sessions") {
    val s = Reference.sessionize(Tables.events(spark, sf))
    assert(s.filter(col("duration_us") < 0).count() == 0)
    // events per user equals sum of session sizes
    val perUser = s.groupBy("user_id").agg(sum("n_events").as("n"))
    val ev = Tables.events(spark, sf).groupBy("user_id").count()
    val bad = perUser.join(ev, "user_id").filter(col("n") =!= col("count")).count()
    assert(bad == 0)
  }

  test("top influencers: degenerate tie plateau fails fast, normal graph unaffected") {
    val s = spark
    import s.implicits._
    // constant-degree graph: 20 clickers, each targeting a distinct dst
    // (dst = floor(value) % 20) → every dst has in-degree exactly 1, so
    // the top-10 threshold collapses to 1 and ALL 20 dsts survive.
    val ev = (0 until 20).map { i =>
      (1000L + i, 100L + i, "click", i.toDouble,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
    val e = intercept[IllegalStateException] {
      Reference.topInfluencers(ev, k = 10, maxSurvivors = 5).collect()
    }
    assert(e.getMessage.contains("degenerate tie plateau"))
    // with the cap above the plateau the same graph ranks fine (all rank 1)
    val ok = Reference.topInfluencers(ev, k = 10, maxSurvivors = 50)
    assert(ok.count() == 20 && ok.filter(col("rnk") =!= 1).count() == 0)
    // and the real-data query still returns its usual k+ties rows
    assert(Reference.topInfluencers(Tables.events(spark, sf)).count() >= 10)
    graft.GraftCache.releaseAll(spark)
  }

  test("daily quota never keeps more than quota per day") {
    val q = Reference.dailyQuota(Tables.events(spark, sf), quota = 5)
    assert(q.filter(col("kept") > 5).count() == 0)
    assert(q.filter(col("kept") > col("total")).count() == 0)
  }

  test("interest categorize: confidence in [0,1], category from taxonomy") {
    val c = Reference.interestCategorize(Tables.documents(spark, sf))
    assert(c.filter(col("confidence") < 0 || col("confidence") > 1).count() == 0)
    val valid = Reference.categories.map(_._1).toSet + "unknown"
    val cats = c.select("category").distinct().collect().map(_.getString(0)).toSet
    assert(cats.subsetOf(valid))
  }

  test("scalable decile closely tracks exact ntile deciles") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = Analytics.decileValue(Tables.orders(spark, sf01))
      .orderBy("decile").collect()
    val approx = Analytics.decileValueScalable(Tables.orders(spark, sf01))
      .orderBy("decile").collect()
    assert(approx.map(_.getInt(0)).toSeq == (1 to 10))
    val total = exact.map(_.getLong(1)).sum
    assert(approx.map(_.getLong(1)).sum == total)
    // bucket sizes within 5% of n/10 at relErr=0.001
    approx.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 10.0) < total * 0.05,
        s"decile ${r.getInt(0)} size ${r.getLong(1)} too far from ${total / 10}")
    }
  }

  test("pricing summary matches a spark.sql cross-check") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val ours = Analytics.pricingSummary(Tables.lineitem(spark, sf))
      .select("l_returnflag", "l_linestatus", "count_order")
    assert(ours.exceptAll(viaSql).count() == 0 && viaSql.exceptAll(ours).count() == 0)
  }

  test("cube revenue: grand-total row equals orders count, gids partition the sets") {
    val o = Tables.orders(spark, sf)
    val out = Analytics.cubeRevenue(o).collect()
    val grand = out.filter(_.getLong(4) == 3L)
    assert(grand.length == 1 && grand.head.getLong(2) == o.count())
    // each grouping set's n_orders re-sums to the total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(out.filter(_.getLong(4) == gid).map(_.getLong(2)).sum == o.count(),
        s"gid $gid rows must cover all orders")
    }
  }

  test("revenue shares sum to 1 within every region") {
    val out = Analytics.revenueShare(Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf), Tables.region(spark, sf))
    val sums = out.groupBy("r_name").agg(sum("share").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"region ${r.getString(0)} shares sum to ${r.getDouble(1)}"))
  }

  test("above-average orders: no customer can have every order above their own mean") {
    val o = Tables.orders(spark, sf)
    val above = Analytics.aboveAvgOrders(o).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_above"))
    val all = o.groupBy("o_custkey").agg(count(lit(1)).as("n_all"))
    assert(above.join(all, "o_custkey").filter(col("n_above") >= col("n_all")).count() == 0)
    assert(above.count() > 0)
  }

  test("pivot cells cover all orders; lapsed customers have no later order") {
    val o = Tables.orders(spark, sf)
    val piv = Analytics.pivotStatus(o).collect()
    assert(piv.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum == o.count())
    val lapsed = Analytics.lapsedCustomers(o)
    val in97 = o.filter(col("o_orderdate") >= lit("1997-01-01") &&
      col("o_orderdate") < lit("1998-01-01")).select("o_custkey").distinct()
    assert(lapsed.join(in97, "o_custkey").count() == 0,
      "a lapsed customer must have no 1997 order")
  }

  test("priority lines: high+low equals the joined filtered line count") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val out = Analytics.priorityLines(li, o).collect()
    val expected = li
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(o, col("l_orderkey") === col("o_orderkey")).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum == expected)
    assert(out.nonEmpty)
  }

  test("large orders: all above threshold, capped at k, deterministic set") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val out = Analytics.largeOrders(li, o, c, minQty = 100.0, k = 20)
    val rows = out.collect()
    assert(rows.length <= 20)
    assert(rows.forall(_.getDouble(5) > 100.0))
    // deterministic under re-evaluation (tie-break on unique order key)
    val again = Analytics.largeOrders(li, o, c, minQty = 100.0, k = 20).collect()
    assert(rows.map(_.getLong(0)).toSet == again.map(_.getLong(0)).toSet)
  }

  test("discQuantilePicks == percentile_disc value for value, incl. boundary group sizes") {
    import spark.implicits._
    // Group sizes 100 and 20 make q·n integral in exact arithmetic while
    // double(q)·n lands just off the integer (0.05·100, 0.55·20, 0.9·20)
    // — the rank is where the count-map pick could diverge from the
    // aggregate if it rounded differently, so pin it on exactly those
    // sizes. Duplicated values, a null, and a singleton group cover the
    // remaining edges (ties in the count map, null exclusion from N).
    val rows: Seq[(String, Option[Double])] =
      (1 to 100).map(i => ("a", Some(i.toDouble))) ++
        (1 to 20).map(i => ("b", Some((i % 7).toDouble))) ++
        Seq(("c", Some(42.0)), ("b", None))
    val df = rows.toDF("g", "v")
    val qs = Seq(0.05, 0.07, 0.5, 0.55, 0.9, 0.95, 1.0)
    val picks = Analytics
      .discQuantilePicks(df, "g", "v",
        qs.zipWithIndex.map { case (q, i) => q -> s"p$i" })
      .collect().map(r => r.getString(0) -> r).toMap
    val aggCols = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY v)").as(s"e$i")
    }
    val ref = df.groupBy("g").agg(count(lit(1)).as("n"), aggCols: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ref.keySet == Set("a", "b", "c"))
    ref.keys.foreach { g =>
      assert(picks(g).getLong(1) == ref(g).getLong(1), s"$g: __n_rows vs count(1)")
      qs.indices.foreach { i =>
        assert(picks(g).getDouble(2 + i) == ref(g).getDouble(2 + i), s"$g q=${qs(i)}")
      }
    }
  }
}
