package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RollupIndex
import graft.sources.Tables

/** B43 — the committed incrementally-maintained rollup: merge algebra,
  * artifact round-trip, replay ledger, and untouched-key stability.
  */
class RollupIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = spark.stop()

  val sf = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-rollup-$tag").toString

  private def rows(df: DataFrame): Map[(Long, String), (Long, Double, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

  test("committed build + applyDelta == one-pass recompute over the whole fact table") {
    val li = Tables.lineitem(spark, sf)
    val base = li.filter(pmod(col("l_orderkey"), lit(4L)) =!= 0L)
    val delta = li.filter(pmod(col("l_orderkey"), lit(4L)) === 0L)
    val path = tmp("e2e")
    RollupIndex.build(base, path, deltaId = "bootstrap")
    RollupIndex.applyDelta(delta, path, deltaId = "batch-1")
    val maintained = rows(RollupIndex.read(spark, path))
    val recomputed = rows(RollupIndex.present(RollupIndex.partialAgg(li)))
    assert(maintained.nonEmpty)
    assert(maintained == recomputed,
      "incrementally maintained state must equal the full rescan exactly")
    // and the registered query runs the same core
    assert(rows(RollupIndex.rollupIncremental(li)) == recomputed)
  }

  test("replaying an already-applied delta id is a no-op (the at-least-once guard)") {
    val li = Tables.lineitem(spark, sf)
    val delta = li.filter(pmod(col("l_orderkey"), lit(4L)) === 0L)
    val path = tmp("replay")
    RollupIndex.build(li.filter(pmod(col("l_orderkey"), lit(4L)) =!= 0L), path, "bootstrap")
    RollupIndex.applyDelta(delta, path, "batch-1")
    val before = rows(RollupIndex.read(spark, path))
    RollupIndex.applyDelta(delta, path, "batch-1") // restarted job re-submits
    assert(rows(RollupIndex.read(spark, path)) == before,
      "a replayed delta must not double-count")
  }

  test("deltas compose: N sequential applies == one recompute, untouched keys stable") {
    val li = Tables.lineitem(spark, sf)
    val path = tmp("compose")
    val slices = (0L until 4L).map(i => li.filter(pmod(col("l_orderkey"), lit(4L)) === i))
    RollupIndex.build(slices(0), path, "slice-0")
    val afterBootstrap = rows(RollupIndex.read(spark, path))
    (1 until 4).foreach(i => RollupIndex.applyDelta(slices(i), path, s"slice-$i"))
    val maintained = rows(RollupIndex.read(spark, path))
    assert(maintained == rows(RollupIndex.present(RollupIndex.partialAgg(li))))
    // keys only slice 0 ever touched must still carry their bootstrap row
    val laterKeys = (1 until 4)
      .flatMap(i => rows(RollupIndex.present(RollupIndex.partialAgg(slices(i)))).keySet).toSet
    afterBootstrap.keysIterator.filterNot(laterKeys).foreach { k =>
      assert(maintained(k) == afterBootstrap(k), s"untouched key $k drifted")
    }
  }
}
