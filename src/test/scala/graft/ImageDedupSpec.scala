package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ImageDedup
import graft.sources.Tables

class ImageDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

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

  test("PNG roundtrip preserves the pixel function: decoded aHash == directly computed aHash") {
    // the property the whole oracle rests on — the real ImageIO
    // encode→decode must hand back exactly the gray levels the
    // generator wrote (TYPE_INT_RGB is verbatim; byte-gray would remap)
    val docs = Tables.documents(spark, sf).select("doc_id").limit(32)
    val viaCodec = ImageDedup.imagePhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaCodec.size == 32)
    viaCodec.foreach { case (id, h) =>
      val n = ImageDedup.ImgDim
      val lumas = for (y <- 0 until n; x <- 0 until n)
        yield ImageDedup.pixelValue(id, x, y).toLong // r=g=b=v ⇒ luma = v
      val sum = lumas.sum
      val direct = lumas.map(l => if (l * n * n > sum) '1' else '0').mkString
      assert(h == direct, s"doc $id: codec hash $h != direct $direct")
    }
  }

  test("same group, unperturbed docs collide at hamming 0; pairs unique and ordered") {
    val docs = Tables.documents(spark, sf)
    val pairs = ImageDedup.imagePhashPairs(docs).cache()
    // doc_id % 4 == 0 docs carry no perturbation: two of them in the
    // same group share the exact image, hence hamming 0
    val zeroPairs = pairs.filter(col("hamming") === 0)
    assert(zeroPairs.count() > 0, "identical derived images must collide at hamming 0")
    // every pair once (first-equal-band dedup), ordered id_a < id_b
    assert(pairs.filter(col("id_a") >= col("id_b")).count() == 0)
    val dup = pairs.groupBy("id_a", "id_b").count().filter(col("count") > 1).count()
    assert(dup == 0, "a pair must be emitted from exactly one band")
    assert(pairs.filter(col("hamming") > ImageDedup.HammingThreshold).count() == 0)
    pairs.unpersist()
  }

  test("undecodable payloads are quarantined before the join") {
    val s = spark
    import s.implicits._
    assert(ImageDedup.phash64(null).isEmpty)
    assert(ImageDedup.phash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageDedup.phash64("not a png".getBytes).isEmpty)
  }
}
