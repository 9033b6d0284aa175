package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, VideoDedup}
import graft.sources.Tables

class VideoDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("writer emits spec-conformant AVI: the fuzz-tested Multimodal decoder accepts it") {
    // pins the hand-assembled RIFF writer to the independently
    // fuzz-tested container walk — dims, frame count, fps and the
    // bottom-up DIB stride must all agree
    val frames = Array.tabulate(VideoDedup.FrameCount) { f =>
      Array.tabulate(VideoDedup.Dim * VideoDedup.Dim)(i => (f * 31 + i * 7) % 256)
    }
    val avi = VideoDedup.encodeAvi(frames, VideoDedup.Dim, VideoDedup.Dim)
    val decoded = Multimodal.decodeVideo(avi, sampleEvery = 1)
    assert(decoded.isDefined, "Multimodal.decodeVideo must parse the writer's output")
    val (w, h, fps, nFrames, nSampled, _, _) = decoded.get
    assert(w == VideoDedup.Dim && h == VideoDedup.Dim)
    assert(nFrames == VideoDedup.FrameCount.toLong)
    assert(nSampled == VideoDedup.FrameCount)
    assert(math.abs(fps - 25.0) < 1e-9)
  }

  test("AVI roundtrip preserves the pixel function: decoded fingerprint == directly computed") {
    val docs = Tables.documents(spark, sf).select("doc_id").limit(32)
    val viaCodec = VideoDedup.videoPhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCodec.size == 32)
    val n = VideoDedup.Dim
    viaCodec.foreach { case (id, h) =>
      val direct = (0 until VideoDedup.FrameCount).map { f =>
        val lumas = for (y <- 0 until n; x <- 0 until n)
          yield VideoDedup.pixelValue(id, f, x, y).toLong // r=g=b=v ⇒ luma = v
        val sum = lumas.sum
        lumas.map(l => if (l * n * n > sum) '1' else '0').mkString
      }.mkString
      assert(h == direct, s"doc $id: codec fingerprint $h != direct $direct")
    }
  }

  test("same group, unperturbed docs collide at hamming 0; pairs unique and ordered") {
    val docs = Tables.documents(spark, sf)
    val pairs = VideoDedup.videoPhashPairs(docs).cache()
    val zeroPairs = pairs.filter(col("hamming") === 0)
    assert(zeroPairs.count() > 0, "identical derived clips must collide at hamming 0")
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
    val dup = pairs.groupBy("id_a", "id_b").count().filter(col("count") > 1).count()
    assert(dup == 0, "a pair must be emitted from exactly one band")
    assert(pairs.filter(col("hamming") > VideoDedup.HammingThreshold).count() == 0)
    pairs.unpersist()
  }

  test("hostile/undecodable payloads quarantine to None, never an error") {
    assert(VideoDedup.vhash64(null).isEmpty)
    assert(VideoDedup.vhash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoDedup.vhash64("RIFFxxxxAVI but not really a container".getBytes).isEmpty)
    // well-formed container, wrong dims: the gate must fire before pixel work
    val big = VideoDedup.encodeAvi(
      Array.fill(VideoDedup.FrameCount)(Array.fill(64)(0)), 8, 8)
    assert(VideoDedup.vhash64(big).isEmpty, "non-Dim dims must be rejected")
    // too few frames
    val short = VideoDedup.encodeAvi(
      Array.fill(1)(Array.fill(VideoDedup.Dim * VideoDedup.Dim)(0)),
      VideoDedup.Dim, VideoDedup.Dim)
    assert(VideoDedup.vhash64(short).isEmpty, "fewer than FrameCount frames must quarantine")
    // truncated mid-frame: bounds checks degrade to None
    val good = VideoDedup.encodeAvi(
      Array.fill(VideoDedup.FrameCount)(Array.fill(VideoDedup.Dim * VideoDedup.Dim)(7)),
      VideoDedup.Dim, VideoDedup.Dim)
    assert(VideoDedup.vhash64(good).isDefined)
    assert(VideoDedup.vhash64(good.take(good.length / 2)).isEmpty)
  }
}
