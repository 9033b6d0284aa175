package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

class IngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)
  lazy val tmp: String = Files.createTempDirectory("graft_ingest").toString

  override def afterAll(): Unit = spark.stop()

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv: valid rows parse, malformed rows quarantined, not crashed") {
    val p = s"$tmp/in.csv"
    Files.writeString(Paths.get(p),
      """id,name,score
        |1,alice,0.5
        |2,bob,0.75
        |not_a_long,carol,xyz
        |4,dora,1.0
        |""".stripMargin)
    val (clean, bad) = Ingest.quarantine(Ingest.readCsv(spark, p, schema))
    assert(clean.count() == 3)
    assert(bad.count() == 1)
    assert(bad.head().getString(0).startsWith("not_a_long"))
    assert(clean.schema.fieldNames.toSeq == Seq("id", "name", "score"))
  }

  test("jsonl: schema enforced, corrupt lines captured") {
    val p = s"$tmp/in.jsonl"
    Files.writeString(Paths.get(p),
      """{"id": 1, "name": "alice", "score": 0.5}
        |{"id": 2, "name": "bob", "score": 0.75}
        |{this is not json
        |{"id": 4, "name": "dora", "score": 1.0}
        |""".stripMargin)
    val (clean, bad) = Ingest.quarantine(Ingest.readJsonLines(spark, p, schema))
    assert(clean.count() == 3)
    assert(bad.count() == 1)
  }

  test("quarantine rate is observable (counts add up)") {
    val p = s"$tmp/in2.csv"
    Files.writeString(Paths.get(p), "id,name,score\n1,a,0.1\nbad,row,row\n")
    val parsed = Ingest.readCsv(spark, p, schema)
    val (clean, bad) = Ingest.quarantine(parsed)
    assert(clean.count() + bad.count() == 2)
  }

  test("incremental ingest: second run touches only rows past the cursor") {
    val s = spark
    import s.implicits._
    val data = s"$tmp/inc_data"
    val cursor = s"$tmp/inc_cursor"
    (1L to 100L).map(i => (i, s"v$i")).toDF("event_id", "payload")
      .write.mode("append").parquet(data)

    // run 1: fresh cursor -> everything
    val run1 = Ingest.readIncremental(spark, data, cursor, "event_id")
    assert(run1.count() == 100)
    assert(Ingest.advanceCursor(spark, cursor, run1, "event_id") == 100L)

    // new files land
    (101L to 130L).map(i => (i, s"v$i")).toDF("event_id", "payload")
      .write.mode("append").parquet(data)

    // run 2: only the new rows
    val run2 = Ingest.readIncremental(spark, data, cursor, "event_id")
    assert(run2.count() == 30)
    assert(run2.agg(org.apache.spark.sql.functions.min("event_id")).head().getLong(0) == 101L)
    // the cursor predicate reaches the parquet scan (row-group skipping)
    val plan = run2.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(event_id"),
      s"cursor filter not pushed to scan:\n$plan")
    assert(Ingest.advanceCursor(spark, cursor, run2, "event_id") == 130L)

    // run 3: nothing new -> empty, cursor unchanged
    val run3 = Ingest.readIncremental(spark, data, cursor, "event_id")
    assert(run3.count() == 0)
    assert(Ingest.advanceCursor(spark, cursor, run3, "event_id") == 130L)
  }

  test("WARC split: a corrupt middle record is skipped, its neighbors survive") {
    import graft.sources.Warc
    val spark2 = spark
    import spark2.implicits._
    val good1 = Warc.encodeRecord(Warc.urlFor(1L), "<p>one</p>".getBytes("UTF-8"))
    val good2 = Warc.encodeRecord(Warc.urlFor(2L), "<p>two</p>".getBytes("UTF-8"))
    // middle record lies about its length: Content-Length far past EOF of
    // its own framing - parseOne rejects it and resyncs at the next magic
    val corrupt = ("WARC/1.0\r\nWARC-Target-URI: " + Warc.urlFor(9L) +
      "\r\nContent-Length: 999999\r\n\r\nshort").getBytes("UTF-8")
    val blob = good1 ++ corrupt ++ good2
    val files = Seq((0L, blob)).toDF("file_id", "blob")
    val out = Warc.splitWarc(files).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "<p>one</p>", 2L -> "<p>two</p>"),
      s"expected the two intact records only, got $out")
  }

  test("ReplicaSet: rotates past failed replicas, cools them down, heals on expiry") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-replicas").toString
    val good = s"$base/good"
    val missing = s"$base/missing" // never created
    val corrupt = s"$base/corrupt"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(good)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corrupt))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$corrupt/part-00000.parquet"),
      "not a parquet footer".getBytes("UTF-8"))
    var clock = 1000L
    val rs = new graft.sources.Ingest.ReplicaSet(
      Seq(missing, corrupt, good), cooldownMs = 60000L, now = () => clock)
    // first read rotates past the two bad replicas and lands on good
    val df = rs.read(p => spark.read.schema("id BIGINT, v STRING").parquet(p))
    assert(df.count() == 2)
    assert(rs.failures(missing) == 1 && rs.failures(corrupt) == 1 &&
      rs.failures(good) == 0)
    // failed replicas are cooling down: good is now FIRST in try order,
    // so the next read probes only it (no re-hammering of bad mirrors)
    assert(rs.tryOrder.head == good)
    // cooldown expiry re-admits the failed replicas ahead of the
    // last-resort tier (the reference's pool-reload analog) ...
    clock += 61000L
    assert(rs.tryOrder.take(3).toSet == Set(missing, corrupt, good))
    // ... though a clean replica still outranks an expired-cooldown one
    // (fewest consecutive failures first)
    val ranked = new graft.sources.Ingest.ReplicaSet(
      Seq(missing, good), cooldownMs = 60000L, now = () => clock)
    ranked.markFailure(missing)
    clock += 61000L
    assert(ranked.tryOrder == Seq(good, missing))
    // and a replica that heals (missing dir appears) is read again
    // after its cooldown, resetting its failure count
    Seq((3L, "c")).toDF("id", "v").write.parquet(missing)
    val healed = new graft.sources.Ingest.ReplicaSet(
      Seq(missing), cooldownMs = 60000L, now = () => clock)
    healed.markFailure(missing)
    clock += 61000L
    assert(healed.read(p => spark.read.schema("id BIGINT, v STRING").parquet(p))
      .count() == 1)
    assert(healed.failures(missing) == 0, "success must reset the failure count")
    // all replicas cooling down: degrade to least-recently-failed, not no-op
    val allBad = new graft.sources.Ingest.ReplicaSet(
      Seq(missing, good), cooldownMs = 60000L, now = () => clock)
    allBad.markFailure(missing); clock += 1; allBad.markFailure(good)
    assert(allBad.tryOrder == Seq(missing, good),
      "all-cold pool must order by least-recently-failed, never go empty")
    // and every-replica-refused surfaces the last error, not a silent None
    val hopeless = new graft.sources.Ingest.ReplicaSet(
      Seq(s"$base/nope1", s"$base/nope2"), now = () => clock)
    intercept[java.io.IOException] {
      hopeless.read(p => spark.read.schema("id BIGINT").parquet(p))
    }
  }
}
