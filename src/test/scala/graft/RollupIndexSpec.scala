package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RollupIndex
import graft.operators.RollupIndex.{EventsShape, LineitemShape}
import graft.sources.{Sinks, Tables}

/** B43/B43b — the committed incrementally-maintained rollup, generic
  * over shape: merge algebra, artifact round-trip, replay ledger,
  * untouched-key stability, CONCURRENT multi-writer applies, and
  * merge-on-read compaction.
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

  private def rowsEv(df: DataFrame): Map[(Long, String), (Long, Double, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap

  private def eventsPrep: DataFrame =
    Tables.events(spark, sf).withColumn("ts_us", unix_micros(col("ts")))

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

  test("generic shape: events rollup (count + money sum + min/max) maintains exactly") {
    val ev = eventsPrep
    val base = ev.filter(pmod(col("event_id"), lit(4L)) =!= 0L)
    val delta = ev.filter(pmod(col("event_id"), lit(4L)) === 0L)
    val path = tmp("events")
    RollupIndex.build(base, path, "bootstrap", EventsShape)
    RollupIndex.applyDelta(delta, path, "batch-1", EventsShape)
    val maintained = rowsEv(RollupIndex.read(spark, path, EventsShape))
    val recomputed = rowsEv(RollupIndex.present(
      RollupIndex.partialAgg(ev, EventsShape), EventsShape))
    assert(maintained.nonEmpty)
    assert(maintained == recomputed,
      "generic-shape maintained state must equal the full rescan (incl. min/max monoids)")
    // and the registered query runs the same core
    assert(rowsEv(RollupIndex.rollupEvents(Tables.events(spark, sf))) == recomputed)
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
    assert(RollupIndex.appliedDeltas(spark, path) == Set("bootstrap", "batch-1"))
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

  test("CONCURRENT appliers of disjoint deltas both land (multi-writer, no lost update)") {
    val li = Tables.lineitem(spark, sf)
    val path = tmp("race")
    val slices = (0L until 4L).map(i => li.filter(pmod(col("l_orderkey"), lit(4L)) === i))
    RollupIndex.build(slices(0), path, "slice-0")
    // Two writers apply different deltas concurrently — the round-8
    // merged-state layout would race the shared key rows here (one
    // writer's increments clobbered by the other's stale redo); the
    // per-delta partial layout makes their row spaces disjoint, so the
    // optimistic commit retry must land BOTH.
    @volatile var failure: Option[Throwable] = None
    def applier(i: Int): Thread = {
      val t = new Thread(() =>
        try RollupIndex.applyDelta(slices(i), path, s"slice-$i")
        catch { case e: Throwable => failure = Some(e) })
      t.start(); t
    }
    val threads = Seq(applier(1), applier(2), applier(3))
    threads.foreach(_.join())
    failure.foreach(throw _)
    assert(RollupIndex.appliedDeltas(spark, path) ==
      Set("slice-0", "slice-1", "slice-2", "slice-3"))
    val maintained = rows(RollupIndex.read(spark, path))
    assert(maintained == rows(RollupIndex.present(RollupIndex.partialAgg(li))),
      "concurrent disjoint applies must land exactly once each")
    // replay of any of the raced deltas is still a no-op
    RollupIndex.applyDelta(slices(2), path, "slice-2")
    assert(rows(RollupIndex.read(spark, path)) == maintained)
  }

  test("foldPartials compacts merge-on-read state; reads, ledger, and replays unchanged") {
    val ev = eventsPrep
    val path = tmp("fold")
    val slices = (0L until 4L).map(i => ev.filter(pmod(col("event_id"), lit(4L)) === i))
    slices.zipWithIndex.foreach { case (s, i) =>
      RollupIndex.applyDelta(s, path, s"batch-$i", EventsShape)
    }
    val before = rowsEv(RollupIndex.read(spark, path, EventsShape))
    def partialRows(): Long =
      Sinks.VersionedTable.read(spark, s"$path/state")
        .filter(col("row_kind") === "p").count()
    val fragmented = partialRows()
    RollupIndex.foldPartials(spark, path, EventsShape)
    assert(rowsEv(RollupIndex.read(spark, path, EventsShape)) == before,
      "folding partials must not change the presented rollup")
    assert(partialRows() == before.size.toLong,
      s"fold must leave one partial row per key (had $fragmented)")
    assert(partialRows() < fragmented, "fold must actually compact")
    // the ledger survives the fold: replay still no-ops
    RollupIndex.applyDelta(slices(1), path, "batch-1", EventsShape)
    assert(rowsEv(RollupIndex.read(spark, path, EventsShape)) == before)
    // refold is idempotent, and a post-fold apply merges on read correctly
    RollupIndex.foldPartials(spark, path, EventsShape)
    val extra = ev.filter(pmod(col("event_id"), lit(4L)) === 0L).limit(50)
    RollupIndex.applyDelta(extra, path, "batch-extra", EventsShape)
    val expect = rowsEv(RollupIndex.present(RollupIndex.mergeStates(
      RollupIndex.partialAgg(ev, EventsShape),
      RollupIndex.partialAgg(extra, EventsShape), EventsShape), EventsShape))
    assert(rowsEv(RollupIndex.read(spark, path, EventsShape)) == expect)
  }
}
