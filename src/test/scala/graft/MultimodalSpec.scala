package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

/** C12 multimodal plumbing: the decode kernel is stubbed, so these tests
  * pin the Spark-side contract — schema, batch shape, determinism,
  * partition-local processing.
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(4)

  override def afterAll(): Unit = spark.stop()

  lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf))

  test("media table schema and kinds") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "kind", "n_bytes"))
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction: schema, dimension, determinism") {
    val f1 = Multimodal.extractFeatures(media).cache()
    assert(f1.schema == Multimodal.featureSchema)
    assert(f1.count() == media.count())
    val dims = f1.select(size(col("features"))).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(Multimodal.FeatureDim))
    // deterministic: running twice gives identical features per media_id
    val f2 = Multimodal.extractFeatures(media)
    val diff = f1.select("media_id", "features")
      .join(f2.select(col("media_id"), col("features").as("features2")), "media_id")
      .filter(col("features") =!= col("features2")).count()
    assert(diff == 0)
  }

  test("batching contract: every batch at most batchSize, full batches in the interior") {
    val f = Multimodal.extractFeatures(media, batchSize = 16)
    assert(f.filter(col("batch_size") > 16).count() == 0)
    // at least one full batch exists (500 docs over 4 partitions)
    assert(f.filter(col("batch_size") === 16).count() > 0)
    // features are L1-normalized by the stub kernel
    val bad = f.select(aggregate(col("features"), lit(0.0d),
      (acc, x) => acc + x.cast("double")).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-3).count()
    assert(bad == 0)
  }

  /** Deterministic real PNG: w×h with a left-to-right luma gradient. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255) / math.max(w - 1, 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL image decode: JDK ImageIO extracts dimensions and luma features") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, pngBytes(8, 4)),
      (2L, pngBytes(32, 32)),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("media_id", "payload")
    val out = Multimodal.extractImageFeatures(df).orderBy("media_id").collect()
    assert(out.length == 4)
    // real PNGs decode with exact dimensions
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 8 && out(0).getInt(3) == 4)
    assert(out(1).getBoolean(1) && out(1).getInt(2) == 32 && out(1).getInt(3) == 32)
    // gradient mean luma ~ 127, histogram normalized to 1
    val mean = out(1).getDouble(4)
    assert(mean > 100 && mean < 155, s"gradient mean luma $mean")
    val hist = out(1).getSeq[Double](5)
    assert(hist.length == Multimodal.LumaBins && math.abs(hist.sum - 1.0) < 1e-9)
    assert(hist.count(_ > 0) > 4, "gradient should spread across luma bins")
    // garbage and null payloads are quarantined in-band, not thrown
    assert(!out(2).getBoolean(1) && out(2).isNullAt(2))
    assert(!out(3).getBoolean(1))
  }

  test("REAL image decode is deterministic and batch-shape independent") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map(i => (i, pngBytes(4 + (i % 8).toInt, 4))).toDF("media_id", "payload")
    def collectFeats(bs: Int) =
      Multimodal.extractImageFeatures(df, batchSize = bs)
        .orderBy("media_id").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getDouble(4))).toSeq
    assert(collectFeats(7) == collectFeats(64), "features must not depend on batch size")
  }

  test("frame sampling keeps every k-th frame of video payloads") {
    val s = Multimodal.sampleFrames(media, frameBytes = 32, everyK = 4)
    val row = s.join(media.select(col("media_id"), col("n_bytes")), "media_id")
      .select(col("n_sampled"), ceil(col("n_bytes") / 32.0).cast("long").as("n_frames"))
      .collect()
    assert(row.nonEmpty)
    row.foreach { r =>
      val expected = (r.getLong(1) + 3) / 4 // ceil(n_frames / 4)
      assert(r.getLong(0) == expected, s"sampled=${r.getLong(0)} frames=${r.getLong(1)}")
    }
  }
}
