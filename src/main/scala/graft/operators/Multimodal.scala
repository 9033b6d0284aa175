package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 C12): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in fixed-size
  * batches the way a Pandas-UDF / mapInPandas pipeline would batch work
  * for a vectorized decode kernel.
  *
  * The decode kernel itself is a clearly-marked STUB (no image/audio
  * libraries in this container): a deterministic byte-histogram
  * "feature extractor" stands in for a real JPEG/PNG decode + CNN
  * embedding. Everything around it — schema, batch shape, partition
  * preservation, metadata propagation — is the real Spark-side contract
  * a production decode would plug into.
  *
  * Scale: mapPartitions keeps the decode embarrassingly parallel with
  * zero shuffle; batches amortize per-call overhead exactly like Arrow
  * record batches under mapInPandas. (The reference's multimodal surface
  * is profile_pic_url handling, scraper/instagram_scraper.py:190.)
  */
object Multimodal {

  val FeatureDim = 16
  val DefaultBatchSize = 64

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Synthesize a media table from the documents corpus: payload =
    * UTF-8 bytes standing in for encoded media. Deterministic.
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** STUB decode kernel ??? — a real implementation would decode the
    * media bytes (libjpeg / ffmpeg / soundfile) and run a feature
    * model. This deterministic byte-histogram keeps the batch contract
    * testable: same payload → same features, FeatureDim floats, L1-
    * normalized.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (payload == null) return hist
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xff) % FeatureDim) += 1f
      i += 1
    }
    val total = payload.length.toFloat.max(1f)
    var j = 0
    while (j < FeatureDim) { hist(j) /= total; j += 1 }
    hist
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("batch_ordinal", IntegerType, nullable = false),
    StructField("batch_size", IntegerType, nullable = false)))

  /** Batched feature extraction: partitions are chunked into fixed-size
    * batches (the Arrow-record-batch shape), each batch fed to the
    * decode kernel in one call. batch_ordinal/batch_size are exposed so
    * tests can assert the batching contract a vectorized kernel relies
    * on.
    */
  def extractFeatures(media: DataFrame,
                      batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(featureSchema)
    val out: Dataset[Row] = media
      .select("media_id", "payload", "kind")
      .mapPartitions { rows =>
        rows.grouped(batchSize).zipWithIndex.flatMap { case (batch, bIdx) =>
          // one kernel invocation per batch: a real decode would pass
          // the whole batch to native code here
          val feats = batch.map { r =>
            decodeStub(if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
          }
          batch.zip(feats).map { case (r, f) =>
            Row(r.getLong(0), r.getString(2), f.toSeq, bIdx, batch.size)
          }
        }
      }(enc)
    out
  }

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size frames, keep every k-th — pure Spark-side slicing, the
    * shape a real video pipeline uses before per-frame decode.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, everyK: Int = 4): DataFrame = {
    val nFrames = ceil(col("n_bytes").cast("double") / frameBytes).cast("int")
    media
      .filter(col("kind") === "video")
      .select(
        col("media_id"),
        transform(
          filter(sequence(lit(0), nFrames - 1), i => pmod(i, lit(everyK)) === 0),
          i => substring(col("payload"), i * frameBytes + 1, lit(frameBytes))).as("frames"))
      .withColumn("n_sampled", size(col("frames")).cast("long"))
  }
}
