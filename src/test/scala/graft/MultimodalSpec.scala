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
