package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Temporal
import graft.sources.Tables

class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  test("asOfBackward: fixture with boundary cases (equal t, no prior, duplicate right t)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 900L), (1L, 50L, 901L), (1L, 10L, 902L), (2L, 10L, 903L))
      .toDF("k", "t", "lid")
    // duplicate right rows at (1, 50): max val 21 must win deterministically
    val right = Seq((1L, 20L, 11L), (1L, 50L, 20L), (1L, 50L, 21L), (3L, 5L, 30L))
      .toDF("k", "t", "rid")
    val out = Temporal.asOfBackward(left, right, "k", "t", "rid")
      .orderBy("lid")
      .collect().map(r => (r.getAs[Long]("lid"),
        Option(r.getAs[java.lang.Long]("asof_t")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("asof_val")).map(_.toLong))).toSeq
    assert(out == Seq(
      (900L, Some(50L), Some(21L)), // latest ≤ 100 is t=50, dup resolved to max rid
      (901L, Some(50L), Some(21L)), // equal t is inclusive
      (902L, None, None),           // nothing at or before t=10
      (903L, None, None)))          // key with no right rows at all
  }

  test("burstPairs == naive theta join on real events (exactly once, no dups)") {
    val sf = "/root/testdata/sf0.001"
    val events = Tables.events(spark, sf)
    val fast = Temporal.burstPairs(events)
    val pairs = fast.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.length == pairs.distinct.length, "bucketed join emitted a pair twice")
    assert(pairs.forall(p => p._4 >= 0 && p._4 <= 600L * 1000000L))
    // naive quadratic reference on the small SF
    val e = events.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val naive = e.as("a").join(e.as("b"),
        col("a.user_id") === col("b.user_id") &&
          (col("b.t") > col("a.t") ||
            (col("b.t") === col("a.t") && col("b.event_id") > col("a.event_id"))) &&
          col("b.t") - col("a.t") <= 600L * 1000000L)
      .select(col("a.user_id"), col("a.event_id"), col("b.event_id"),
        (col("b.t") - col("a.t")).as("dt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(pairs.toSet == naive.toSet,
      s"bucketed=${pairs.length} naive=${naive.length}")
  }
}
