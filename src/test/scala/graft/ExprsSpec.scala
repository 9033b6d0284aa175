package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Exprs
import graft.operators.{Dedup, Embeddings}
import graft.sources.Tables

/** The native expressions must be bit-identical to the pure-builtin
  * formulations they replace (which are themselves oracle-checked against
  * DuckDB by the driver gate).
  */
class ExprsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("MinHashSig == builtin minhash signature") {
    val fast = Dedup.minhashSignature(Tables.documents(spark, sf))
    val slow = Dedup.minhashSignatureBuiltin(Tables.documents(spark, sf))
    val diff = fast.join(slow.withColumnRenamed("mh", "mh2"), "doc_id")
      .filter(col("mh") =!= col("mh2")).count()
    assert(diff == 0)
  }

  test("SimHash64 == builtin simhash") {
    val fast = Dedup.simhash(Tables.documents(spark, sf))
    val slow = Dedup.simhashBuiltin(Tables.documents(spark, sf))
    val diff = fast.join(slow.withColumnRenamed("sim", "sim2"), "doc_id")
      .filter(col("sim") =!= col("sim2")).count()
    assert(diff == 0)
  }

  test("Shingles == builtin shingle formulation (incl. short docs)") {
    import spark.implicits._
    val toksCol = split(col("text"), " ")
    val corpus = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(Seq((100001L, "one two"), (100002L, "solo"), (100003L, "a a a a a"))
        .toDF("doc_id", "text"))
    for (w <- Seq(3, 5, 8)) {
      val diff = corpus.select(
        Exprs.shingles(toksCol, w).as("fast"),
        operators.TextOps.shingles(toksCol, w).as("slow"))
        .filter(col("fast") =!= col("slow")).count()
      assert(diff == 0, s"native shingles diverges from builtin at w=$w")
    }
  }

  test("DotLong == builtin aggregate dot product") {
    val q = Embeddings.quantized(Tables.embeddings(spark, sf))
    val diff = q.select(
      Exprs.dotLong(col("qv"), col("qv")).as("fast"),
      Embeddings.dotBuiltin(col("qv"), col("qv")).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
  }

  test("HammingStr: identical strings 0, known distance, length mismatch counted") {
    import spark.implicits._
    val df = Seq(("10101", "10101"), ("10101", "10001"), ("111", "1")).toDF("a", "b")
    val r = df.select(Exprs.hamming(col("a"), col("b"))).collect().map(_.getLong(0))
    assert(r.toSeq == Seq(0L, 1L, 2L))
  }

  test("MinKLong == sorted-slice of collect_list (grouped, with nulls and small groups)") {
    import spark.implicits._
    // events grouped by user: compare the bounded aggregate against the
    // unbounded sort+slice spec on the same grouping.
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"))
    val fast = events.groupBy("user_id")
      .agg(Exprs.minK(col("event_id"), 5).as("ks"))
    val slow = events.groupBy("user_id")
      .agg(slice(array_sort(collect_list(col("event_id"))), 1, 5).as("ks2"))
    val diff = fast.join(slow, "user_id")
      .filter(col("ks") =!= col("ks2")).count()
    assert(diff == 0)

    // Small-group edge: fewer rows than k → all rows, sorted; nulls skipped.
    val tiny = Seq((1L, java.lang.Long.valueOf(9L)), (1L, java.lang.Long.valueOf(3L)),
      (1L, null.asInstanceOf[java.lang.Long]), (2L, java.lang.Long.valueOf(7L)))
      .toDF("g", "v")
    val r = tiny.groupBy("g").agg(Exprs.minK(col("v"), 5).as("ks"))
      .orderBy("g").collect()
    assert(r(0).getSeq[Long](1) == Seq(3L, 9L))
    assert(r(1).getSeq[Long](1) == Seq(7L))
  }

  test("MinKLong is partitioning-invariant (distributed merge correctness)") {
    val s = spark
    import s.implicits._
    // The aggregate's update/merge paths must give the same answer no
    // matter how rows are split across partitions or ordered.
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 25) {
      val vs = List.fill(5 + rnd.nextInt(60))(rnd.nextLong() / 2)
      val k = 1 + rnd.nextInt(8)
      val parts = 1 + rnd.nextInt(7)
      val got = vs.toDF("v").repartition(parts)
        .agg(Exprs.minK(col("v"), k)).head().getSeq[Long](0)
      assert(got == vs.sorted.take(k),
        s"trial $trial: k=$k parts=$parts got=$got expected=${vs.sorted.take(k)}")
    }
  }

  test("MaxKScored == row_number window formulation (grouped, with nulls and ties)") {
    val s = spark
    import s.implicits._
    // Score every (user, event) with a deterministic pseudo-score that
    // manufactures ties, then compare the bounded aggregate against the
    // exact window spec it replaces in annPq.
    val scored = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        (pmod(col("event_id"), lit(7)).cast("double") / 7d).as("score"))
    val k = 4
    val fast = scored.groupBy("user_id")
      .agg(Exprs.maxKScored(col("score"), col("event_id"), k).as("top"))
      .select(col("user_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("user_id"), col("t.id").as("event_id"),
        col("t.score").as("score"), (col("pos") + 1).as("rn"))
    val slow = scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("score").desc, col("event_id"))))
      .filter(col("rn") <= k)
      .select(col("user_id"), col("event_id"), col("score"), col("rn"))
    assert(fast.except(slow).count() == 0 && slow.except(fast).count() == 0)

    // Nulls skipped; small groups return all their rows best-first.
    val tiny = Seq(
      (1L, java.lang.Double.valueOf(0.5), 10L),
      (1L, null.asInstanceOf[java.lang.Double], 11L),
      (2L, java.lang.Double.valueOf(0.9), 12L))
      .toDF("g", "s", "i")
    val r = tiny.groupBy("g").agg(Exprs.maxKScored(col("s"), col("i"), 3).as("top"))
      .orderBy("g").collect()
    assert(r(0).getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1))) == Seq((0.5, 10L)))
    assert(r(1).getSeq[Row](1).map(x => (x.getDouble(0), x.getLong(1))) == Seq((0.9, 12L)))
  }

  test("MaxKScored is partitioning-invariant (distributed merge correctness)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 25) {
      // Coarse scores (10 distinct values) force tie-breaks through the
      // merge path; expected = sort by (score desc, id asc) take k.
      val vs = List.fill(5 + rnd.nextInt(60))((rnd.nextInt(10) / 10.0, rnd.nextLong() / 2))
      val k = 1 + rnd.nextInt(8)
      val parts = 1 + rnd.nextInt(7)
      val got = vs.toDF("s", "i").repartition(parts)
        .agg(Exprs.maxKScored(col("s"), col("i"), k)).head().getSeq[Row](0)
        .map(x => (x.getDouble(0), x.getLong(1)))
      val want = vs.sortBy { case (sc, id) => (-sc, id) }.take(k)
      assert(got == want, s"trial $trial: k=$k parts=$parts got=$got expected=$want")
    }
  }

  test("Ngrams == builtin non-distinct bigram formulation (incl. short docs)") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .union(Seq((9001L, "one"), (9002L, "two words"), (9003L, "a a a")).toDF("doc_id", "text"))
    val toks = split(col("text"), " ")
    val fast = docs.select(col("doc_id"), Exprs.ngrams(toks, 2).as("g"))
    val slow = docs.select(col("doc_id"), transform(
      sequence(lit(1), greatest(size(toks) - 1, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(2)))).as("g"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }

  test("MisraGries: superset + undercount guarantees hold under distributed merge") {
    val s = spark
    import s.implicits._
    val k = 4
    // skewed stream: hot=400, warm=200, 40 cold tokens x 10 → N=1000
    val stream = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 40).flatMap(i => Seq.fill(10)(s"cold_$i"))
    val n = stream.size.toLong
    for (parts <- Seq(1, 7)) {
      val df = scala.util.Random.shuffle(stream).toDF("tok").repartition(parts)
      val cand = df.agg(Exprs.misraGries(col("tok"), k).as("mg"))
        .select(explode(col("mg")).as("c"))
        .select(col("c.token"), col("c.est_cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cand.size <= k, s"summary exceeded $k counters: $cand")
      // every item with freq > N/k must be present (hot: 400 > 250)
      assert(cand.contains("hot"), s"parts=$parts: heavy hitter evicted: $cand")
      // estimates undercount by at most N/k and never overcount
      assert(cand("hot") <= 400L && cand("hot") >= 400L - n / k)
      cand.get("warm").foreach(c => assert(c <= 200L))
    }
  }

  test("heavyHitters two-pass output == exact groupBy heavy set (merge-order independent)") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(spark, sf)
    val hh = graft.operators.TextOps.heavyHitters(docs, k = 800).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact reference computed with a plain (non-sketch) plan
    val bg = docs.select(explode(transform(
      sequence(lit(1), greatest(size(split(col("text"), " ")) - 1, lit(1))),
      i => concat_ws(" ", slice(split(col("text"), " "), i, lit(2))))).as("gram"))
    val n = bg.count()
    val exact = bg.groupBy("gram").count()
      .filter(col("count") * 800 > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == exact, "two-pass heavy hitters diverged from the exact heavy set")
  }

  test("DotLong survives codegen in a realistic plan (join + filter)") {
    val q = Embeddings.quantized(Tables.embeddings(spark, sf)).limit(50)
    val a = q.select(col("vec_id").as("ia"), col("qv").as("qa"))
    val b = q.select(col("vec_id").as("ib"), col("qv").as("qb"))
    val n = a.crossJoin(b)
      .filter(Exprs.dotLong(col("qa"), col("qb")) > 0)
      .count()
    assert(n > 0)
  }

  test("Md5BucketMod == the portable hexPrefixVal SQL chain; eval == codegen; SQL-registered") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq("alpha", "the_quick", "", "unicode\u00e9\u4e2d", "x" * 200)
      .toDF("t")
    val viaExpr = rows.select(Exprs.md5Bucket(col("t"), "ds_", 64)).collect().map(_.getLong(0))
    // the oracle-side definition, evaluated by Spark itself
    val chain = graft.operators.TextOps.hexPrefixValSql("md5(concat('ds_', t))")
    val viaChain = rows.selectExpr(s"$chain % 64").collect().map(_.getLong(0))
    assert(viaExpr.toSeq == viaChain.toSeq,
      "the native bucket must be value-identical to the portable SQL chain")
    // interpreted eval path agrees with the codegen'd dataframe path
    val viaEval = rows.collect().map { r =>
      Exprs.Md5BucketMod(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))),
        "ds_", 64).eval(null).asInstanceOf[Long]
    }
    assert(viaEval.toSeq == viaExpr.toSeq)
    // and the session-registered SQL name resolves to the same values
    assert(rows.selectExpr("graft_md5bucket(t, 'ds_', 64)")
      .collect().map(_.getLong(0)).toSeq == viaExpr.toSeq)
  }

  test("SearchSortedLong == linear upper-bound count; eval == codegen; edge cases") {
    val s = spark
    import s.implicits._
    val cuts = Array(-5L, 0L, 0L, 7L, 100L).distinct.sorted // dedup like the caller
    val vals = Seq(Long.MinValue, -6L, -5L, -1L, 0L, 1L, 6L, 7L, 8L, 99L, 100L, 101L,
      Long.MaxValue)
    val df = vals.toDF("v")
    val viaExpr = df.select(Exprs.searchSorted(col("v"), cuts)).as[Long].collect().toSeq
    val linear = vals.map(v => cuts.count(_ <= v).toLong)
    assert(viaExpr == linear, "binary search must equal the linear upper-bound count")
    // interpreted eval agrees with the codegen'd dataframe path
    val viaEval = vals.map(v => Exprs.SearchSortedLong(
      org.apache.spark.sql.catalyst.expressions.Literal(v), cuts)
      .eval(null).asInstanceOf[Long])
    assert(viaEval == linear)
    // empty cut array: everything lands in bucket 0 (constant column case)
    assert(df.select(Exprs.searchSorted(col("v"), Array.empty[Long]))
      .as[Long].collect().forall(_ == 0L))
    // nulls propagate
    assert(Seq[Option[Long]](None).toDF("v")
      .select(Exprs.searchSorted(col("v"), cuts)).collect().head.isNullAt(0))
    // order preservation + ties-share-a-bucket (the DistributedRank contract)
    val b = viaExpr
    vals.zip(b).combinations(2).foreach { case Seq((v1, b1), (v2, b2)) =>
      if (v1 < v2) assert(b1 <= b2)
      if (v1 == v2) assert(b1 == b2)
    }
  }
}
