package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Multimodal
import graft.pipeline.GraftPipeline
import graft.sources.Tables
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** End-to-end smoke drive of the non-oracle surfaces (streaming, media
  * plumbing, pipeline facade): `sbt "runMain graft.Smoke"`.
  * Prints observable results; exits nonzero on any violated expectation.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // 1. live streaming sessionization across micro-batches
    val in = MemoryStream[Event]
    val q = EventStream.sessionizeStream(in.toDS())
      .writeStream.format("memory").queryName("live").outputMode("append").start()
    in.addData(Event(1, new Timestamp(0), 9, "click", 0),
      Event(2, new Timestamp(300000), 9, "click", 0))
    q.processAllAvailable()
    in.addData(Event(3, new Timestamp(4000000), 9, "click", 0))
    q.processAllAvailable()
    val closed = spark.sql("select * from live").collect()
    println(s"[smoke] closed sessions: ${closed.mkString("; ")}")
    q.stop()
    require(closed.length == 1 && closed.head.getLong(2) == 2,
      "expected one closed 2-event session")

    // 2. multimodal batch plumbing over real testdata
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(Tables.documents(spark, "/root/testdata/sf0.001")))
    val n = feats.count()
    println(s"[smoke] media features: $n rows, sample=${feats.head()}")
    require(n == 500, s"expected 500 media rows, got $n")

    // 3. facade mutual followers
    val followers = Seq((1L, 2L), (2L, 1L)).toDF("user_id", "other_id")
    val following = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("user_id", "other_id")
    val mut = GraftPipeline.calculateMutualFollowers(followers, following).collect()
    println(s"[smoke] mutuals: ${mut.mkString("; ")}")
    require(mut.length == 2, "expected 2 mutual rows")

    // 4. sinks: date-partitioned layout on disk
    val sinkDir = java.nio.file.Files.createTempDirectory("graft_smoke_sink").toString
    graft.sources.Sinks.writePartitionedByDay(
      Tables.events(spark, "/root/testdata/sf0.001"), "ts", s"$sinkDir/by_day")
    val dayDirs = new java.io.File(s"$sinkDir/by_day").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    println(s"[smoke] sink partitions: ${dayDirs.take(3).mkString(", ")} … (${dayDirs.length} days)")
    require(dayDirs.nonEmpty && dayDirs.forall(_.startsWith("day=")), "expected day= layout")

    println("[smoke] OK")
    spark.stop()
  }
}
