package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("salted join == plain join (row multiset)") {
    val fact = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", "c_custkey",
      saltOn = "o_orderkey")
      .select("o_orderkey", "c_name")
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salt spreads a hot key across buckets") {
    val s = spark
    import s.implicits._
    // pathological: one key owns 10k rows
    val hot = (1 to 10000).map(i => (42L, i.toLong)).toDF("key", "row_id")
    val salted = hot.withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length == 8, "hot key should hit all 8 salt buckets")
    assert(buckets.map(_.getLong(1)).max < 10000 * 0.25,
      "no salt bucket should hold a quarter of the hot key")
  }

  test("salted count-distinct == exact count-distinct") {
    val e = Tables.events(spark, sf)
    val exact = e.groupBy("user_id")
      .agg(countDistinct(col("event_type")).as("n_distinct"))
    val salted = Skew.saltedCountDistinct(e, "user_id", "event_type", saltOn = "event_id")
    val joined = exact.withColumnRenamed("n_distinct", "exact_n")
      .join(salted, "user_id")
    assert(joined.filter(col("exact_n") =!= col("n_distinct")).count() == 0)
    assert(joined.count() == exact.count())
  }

  test("key skew: bands partition all rows and keys, hot key count is real") {
    val o = Tables.orders(spark, sf)
    val out = Skew.keySkew(o).cache()
    // the histogram is a partition of the input: rows and keys add up
    assert(out.agg(sum("n_rows")).head().getLong(0) == o.count())
    assert(out.agg(sum("n_keys")).head().getLong(0) ==
      o.select(countDistinct("o_custkey")).head().getLong(0))
    // band membership: the band's max count two-sig-fig-rounds to the band
    val band = expr("CAST(rpad(substr(CAST(max_cnt AS STRING), 1, 2)," +
      " length(CAST(max_cnt AS STRING)), '0') AS BIGINT)")
    assert(out.filter(band =!= col("bucket")).count() == 0)
    // the hot key really has max_cnt rows
    val counts = o.groupBy(col("o_custkey").as("hot_key"))
      .agg(count(lit(1)).as("true_cnt"))
    assert(out.join(counts, "hot_key")
      .filter(col("true_cnt") =!= col("max_cnt")).count() == 0)
    out.unpersist()
  }
}
