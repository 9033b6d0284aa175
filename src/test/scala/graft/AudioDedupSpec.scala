package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AudioDedup
import graft.sources.Tables

class AudioDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("WAV roundtrip preserves the samples: decoded fingerprint == directly computed fingerprint") {
    val docs = Tables.documents(spark, sf).select("doc_id").limit(32)
    val viaCodec = AudioDedup.audioFingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCodec.size == 32)
    viaCodec.foreach { case (id, fp) =>
      val amps = (0 until AudioDedup.NumBlocks).map(b => AudioDedup.blockAmp(id, b).toLong)
      val energies = amps.map(a => a * a) // 16·AmpUnit² cancels in the compare
      val total = energies.sum
      val direct = energies
        .map(e => if (e * AudioDedup.NumBlocks > total) '1' else '0').mkString
      assert(fp == direct, s"doc $id: codec fp $fp != direct $direct")
    }
  }

  test("same group, unperturbed docs collide at hamming 0; pairs unique and bounded") {
    val pairs = AudioDedup.audioFingerprintPairs(Tables.documents(spark, sf)).cache()
    assert(pairs.filter(col("hamming") === 0).count() > 0,
      "identical derived clips must collide at hamming 0")
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
    val dup = pairs.groupBy("id_a", "id_b").count().filter(col("count") > 1).count()
    assert(dup == 0, "a pair must be emitted from exactly one band")
    assert(pairs.filter(col("hamming") > AudioDedup.HammingThreshold).count() == 0)
    pairs.unpersist()
  }

  test("undecodable payloads are quarantined") {
    assert(AudioDedup.fingerprint64(null).isEmpty)
    assert(AudioDedup.fingerprint64(Array[Byte](9, 9, 9)).isEmpty)
    assert(AudioDedup.fingerprint64("not a wav at all".getBytes).isEmpty)
  }
}
