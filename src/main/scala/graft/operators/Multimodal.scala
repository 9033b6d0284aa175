package graft.operators

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2 C12): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in fixed-size
  * batches the way a Pandas-UDF / mapInPandas pipeline would batch work
  * for a vectorized decode kernel.
  *
  * The IMAGE path is real: [[decodeImage]]/[[extractImageFeatures]]
  * decode PNG/JPEG/GIF/BMP payloads with the JDK's built-in ImageIO
  * codecs (pure JVM, nothing external) into dimensions + a luma
  * histogram, quarantining undecodable bytes in-band (`decode_ok`)
  * instead of failing the job. The AUDIO path is real too:
  * [[decodeAudio]]/[[extractAudioFeatures]] decode WAV/AIFF/AU PCM with
  * the JDK's `javax.sound.sampled` codecs into rate/channels/duration +
  * per-channel RMS, same quarantine. The VIDEO path is real as well:
  * [[decodeVideo]]/[[extractVideoFeatures]] parse the RIFF/AVI
  * container (header metadata + frame chunk walk) and decode sampled
  * MJPEG or uncompressed-DIB frames into the same luma features —
  * covering the encodings decodable without external codecs; other
  * codecs (H.264 etc.) quarantine in-band rather than erroring.
  * Everything around all three — schema, batch shape, partition
  * preservation, metadata propagation — is the real Spark-side
  * contract a production decode plugs into.
  *
  * Scale: mapPartitions keeps the decode embarrassingly parallel with
  * zero shuffle; batches amortize per-call overhead exactly like Arrow
  * record batches under mapInPandas. (The reference's multimodal surface
  * is profile_pic_url handling, scraper/instagram_scraper.py:190.)
  */
object Multimodal {

  // Memory-backed ImageIO stream caches (see the ImageDedup init note:
  // the file-backed default costs a temp-file create+delete per codec
  // call on pure in-memory payloads). Idempotent, per executor JVM.
  ImageIO.setUseCache(false)

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

  /** Kind-agnostic contract kernel: a deterministic byte-histogram
    * (same payload → same features, FeatureDim floats, L1-normalized)
    * that keeps [[extractFeatures]]'s batch contract testable without
    * a codec. The real per-modality kernels are [[decodeImage]],
    * [[decodeAudio]] and [[decodeVideo]] below.
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

  // ---------------- real image decode (pure-JVM ImageIO) ----------------

  val LumaBins = 16
  /** Decode cost bound: images are sampled on a deterministic grid of at
    * most MaxSamplesPerAxis² pixels, so a 100-megapixel payload costs the
    * same as a thumbnail. */
  val MaxSamplesPerAxis = 64

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_luma", DoubleType, nullable = true),
    StructField("luma_hist", ArrayType(DoubleType, containsNull = false), nullable = true)))

  /** Real image decode: JDK ImageIO (PNG/JPEG/GIF/BMP codecs ship with
    * the JVM). Returns (width, height, mean luma, LumaBins luma
    * histogram normalized to sum 1) or None for bytes no installed
    * codec accepts. Luma = Rec.601 integer weights on a stride-sampled
    * pixel grid — deterministic for a given payload.
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Double, Array[Double])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val sx = math.max(1, w / MaxSamplesPerAxis)
      val sy = math.max(1, h / MaxSamplesPerAxis)
      val hist = new Array[Double](LumaBins)
      var lumaSum = 0L
      var n = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          // Rec.601 luma in integer arithmetic: (299R + 587G + 114B)/1000
          val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          hist(math.min(luma * LumaBins / 256, LumaBins - 1)) += 1d
          lumaSum += luma
          n += 1
          x += sx
        }
        y += sy
      }
      var i = 0
      while (i < LumaBins) { hist(i) /= n; i += 1 }
      Some((w, h, lumaSum.toDouble / n, hist))
    } catch { case _: Exception => None }
  }

  /** Batched REAL image feature extraction: same mapPartitions /
    * fixed-batch contract as [[extractFeatures]], with undecodable
    * payloads quarantined in-band (`decode_ok = false`, null features)
    * — the Ingest corrupt-record policy applied to media bytes.
    */
  def extractImageFeatures(media: DataFrame,
                           batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            decodeImage(if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)) match {
              case Some((w, h, mean, hist)) =>
                Row(r.getLong(0), true, w, h, mean, hist.toSeq)
              case None =>
                Row(r.getLong(0), false, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  // ---------------- real audio decode (pure-JVM javax.sound) ----------------

  /** Decode cost bound: at most this many frames are read per payload —
    * a pathological multi-hour WAV costs the same as a clip. (Duration
    * and frame count still report the full header-declared length.)
    */
  val MaxAudioFrames = 1 << 22

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("rms", ArrayType(DoubleType, containsNull = false), nullable = true)))

  /** Real audio decode: JDK `javax.sound.sampled` (WAV/AIFF/AU PCM
    * codecs ship with the JVM — the audio twin of the ImageIO path).
    * Returns (sample rate, channels, frame count, duration seconds,
    * per-channel RMS of the [-1,1]-normalized signal) or None for bytes
    * no installed codec accepts. Supports signed 16-bit and signed/
    * unsigned 8-bit PCM, either endianness — the formats the JDK WAV
    * reader actually emits.
    */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Double, Array[Double])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val rate = fmt.getSampleRate
        if ((!signed && !unsigned) || (bits != 8 && bits != 16) || ch <= 0 ||
          rate <= 0 || fmt.getFrameSize != ch * (bits / 8)) return None
        val declaredFrames = ais.getFrameLength
        val frameSize = fmt.getFrameSize
        val toRead = math.min(
          if (declaredFrames >= 0) declaredFrames else Long.MaxValue,
          MaxAudioFrames.toLong)
        val sumSq = new Array[Double](ch)
        var frames = 0L
        val buf = new Array[Byte](frameSize * 1024)
        var done = false
        while (!done && frames < toRead) {
          val n = ais.read(buf)
          if (n <= 0) done = true
          else {
            var off = 0
            while (off + frameSize <= n && frames < toRead) {
              var c = 0
              while (c < ch) {
                val base = off + c * (bits / 8)
                val v: Double =
                  if (bits == 16) {
                    val lo = buf(base) & 0xff
                    val hi = buf(base + 1) & 0xff
                    val s = if (fmt.isBigEndian) (buf(base) << 8) | (buf(base + 1) & 0xff)
                            else (buf(base + 1) << 8) | lo
                    s.toShort / 32768.0
                  } else if (signed) buf(base) / 128.0
                  else ((buf(base) & 0xff) - 128) / 128.0
                sumSq(c) += v * v
                c += 1
              }
              off += frameSize
              frames += 1
            }
          }
        }
        if (frames == 0) return None
        val rms = sumSq.map(s => math.sqrt(s / frames))
        val totalFrames = if (declaredFrames >= 0) declaredFrames else frames
        Some((rate.toInt, ch, totalFrames, totalFrames / rate.toDouble, rms))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Batched REAL audio feature extraction: same mapPartitions /
    * fixed-batch contract as [[extractImageFeatures]], undecodable
    * payloads quarantined in-band (`decode_ok = false`).
    */
  def extractAudioFeatures(media: DataFrame,
                           batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            decodeAudio(if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)) match {
              case Some((rate, ch, frames, dur, rms)) =>
                Row(r.getLong(0), true, rate, ch, frames, dur, rms.toSeq)
              case None =>
                Row(r.getLong(0), false, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  // ---------------- real video decode (pure-JVM RIFF/AVI) ----------------

  /** Decode cost bound: at most this many frames are actually decoded
    * per payload regardless of declared length (every `sampleEvery`-th
    * frame up to this cap) — a feature-length file costs the same as a
    * clip. */
  val MaxSampledFrames = 8

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("fps", DoubleType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("n_sampled", IntegerType, nullable = true),
    StructField("mean_luma", DoubleType, nullable = true),
    StructField("luma_hist", ArrayType(DoubleType, containsNull = false), nullable = true)))

  private def u32le(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Real video decode: RIFF/AVI container parse (pure JVM — the
    * container walk every video pipeline starts with) + per-frame
    * decode for the two frame encodings decodable without external
    * codecs: MJPEG (`00dc` chunks holding JPEG bytes → ImageIO, the
    * same codec path as [[decodeImage]]) and uncompressed bottom-up
    * BGR24 DIB (`00db` chunks). Header metadata (dims, fps, frame
    * count) comes from the `avih` MainAVIHeader; every `sampleEvery`-th
    * stream-0 frame up to [[MaxSampledFrames]] is decoded into the same
    * stride-bounded Rec.601 luma histogram as the image path. Returns
    * None for bytes that are not a parseable AVI or whose sampled
    * frames all fail to decode — callers quarantine in-band exactly
    * like images/audio.
    *
    * All chunk offsets/sizes come from untrusted bytes: every read is
    * bounds-checked and the walk is depth-limited, so a hostile payload
    * degrades to `decode_ok = false`, never an error or a runaway scan.
    */
  /** Untrusted frame dims are bounded here (the avih dims AND each
    * MJPEG frame's own header dims): a decompression-bomb frame that
    * declares 60000×60000 would OOM inside ImageIO before any catch —
    * an Error, not an Exception — so dims are read from the codec
    * header FIRST and oversized frames are skipped without decoding.
    */
  val MaxFrameDim = 16384

  /** Parsed RIFF/AVI container layout: the `avih` MainAVIHeader fields
    * plus the stream-0 frame chunks (offset, size, fourcc) in stream
    * order.
    */
  private[operators] final case class AviLayout(
      microSecPerFrame: Long, totalFrames: Long, width: Int, height: Int,
      frames: IndexedSeq[(Int, Int, String)])

  /** THE shared bounds-checked RIFF/AVI chunk walk — the single fuzzed
    * parser behind [[decodeVideo]] and VideoDedup's fingerprint kernel
    * (one copy so a hardening fix can never be applied to one consumer
    * and silently missing from the other). Every offset/size comes from
    * untrusted bytes: bounds-checked reads, depth-limited recursion,
    * even-offset chunk padding; returns None unless the RIFF/AVI magic
    * and an `avih` header are present — a hostile payload degrades to
    * None, never an error or a runaway scan.
    */
  private[operators] def walkAvi(payload: Array[Byte]): Option[AviLayout] = {
    if (payload == null || payload.length < 24) return None
    try {
      if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
      val end = math.min(payload.length.toLong, 8L + u32le(payload, 4)).toInt

      // avih MainAVIHeader fields (all u32 LE at fixed offsets)
      var microSecPerFrame = 0L
      var totalFrames = 0L
      var width = 0
      var height = 0
      var haveHeader = false
      // byte ranges of stream-0 frame chunks, in stream order
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]

      def walk(from: Int, to: Int, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to && depth < 8) {
          val id = fourcc(payload, off)
          val size = u32le(payload, off + 4)
          val dataStart = off + 8
          if (size < 0 || dataStart + size > to) return // truncated/hostile
          val dataEnd = (dataStart + size).toInt
          if (id == "LIST" && size >= 4) {
            // LIST payload = 4-byte list type + sub-chunks
            walk(dataStart + 4, dataEnd, depth + 1)
          } else if (id == "avih" && size >= 40) {
            microSecPerFrame = u32le(payload, dataStart)
            totalFrames = u32le(payload, dataStart + 16)
            width = u32le(payload, dataStart + 32).toInt
            height = u32le(payload, dataStart + 36).toInt
            haveHeader = true
          } else if ((id == "00dc" || id == "00db") && size > 0) {
            frames += ((dataStart, size.toInt, id))
          }
          off = dataEnd + (dataEnd & 1) // chunks pad to even offsets
        }
      }
      walk(12, end, 0)

      if (!haveHeader) None
      else Some(AviLayout(microSecPerFrame, totalFrames, width, height,
        frames.toIndexedSeq))
    } catch { case _: Exception => None }
  }

  def decodeVideo(payload: Array[Byte], sampleEvery: Int = 4)
      : Option[(Int, Int, Double, Long, Int, Double, Array[Double])] = {
    require(sampleEvery > 0, s"decodeVideo: sampleEvery must be positive, got $sampleEvery")
    val layout = walkAvi(payload) match {
      case Some(l) => l
      case None => return None
    }
    try {
      val AviLayout(microSecPerFrame, totalFrames, width, height, frames) = layout
      if (width <= 0 || height <= 0 || frames.isEmpty) return None

      val hist = new Array[Double](LumaBins)
      var lumaSum = 0L
      var n = 0L
      var sampled = 0

      def addLuma(luma: Int): Unit = {
        hist(math.min(luma * LumaBins / 256, LumaBins - 1)) += 1d
        lumaSum += luma
        n += 1
      }

      // MJPEG frame dims from the codec header ONLY — no pixel decode
      // yet, so a decompression bomb never reaches ImageIO.read.
      def jpegHeaderDims(start: Int, size: Int): Option[(Int, Int)] = {
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(payload, start, size))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
            finally r.dispose()
          }
        } catch { case _: Exception => None } finally iis.close()
      }

      var idx = 0
      while (idx < frames.length && sampled < MaxSampledFrames) {
        val (start, size, id) = frames(idx)
        // per-frame failures skip the frame, not the whole payload
        val frameOk: Boolean =
          if (id == "00dc") {
            val dimsOk = jpegHeaderDims(start, size).exists { case (w, h) =>
              w > 0 && h > 0 && w <= MaxFrameDim && h <= MaxFrameDim }
            val img =
              if (!dimsOk) None
              else try Option(ImageIO.read(new ByteArrayInputStream(payload, start, size)))
              catch { case _: Exception => None }
            img match {
              case Some(im) =>
                val w = im.getWidth
                val h = im.getHeight
                val sx = math.max(1, w / MaxSamplesPerAxis)
                val sy = math.max(1, h / MaxSamplesPerAxis)
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = im.getRGB(x, y)
                    addLuma((299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                      114 * (rgb & 0xff)) / 1000)
                    x += sx
                  }
                  y += sy
                }
                true
              case None => false
            }
          } else {
            // bottom-up BGR24 DIB: rows padded to 4-byte multiples.
            // Dims come from the untrusted header — bound them and
            // compare sizes in Long so a hostile avih can neither
            // overflow the row math nor force a giant allocation. Luma
            // is sampled STRAIGHT from the byte array at the stride
            // coordinates — no intermediate BufferedImage, so the
            // per-frame cost really is ~MaxSamplesPerAxis² reads, not
            // width×height writes.
            val rowBytes = (width * 3 + 3) & ~3
            if (width > MaxFrameDim || height > MaxFrameDim ||
                size.toLong < rowBytes.toLong * height) false
            else {
              val sx = math.max(1, width / MaxSamplesPerAxis)
              val sy = math.max(1, height / MaxSamplesPerAxis)
              var y = 0
              while (y < height) {
                val row = start + (height - 1 - y) * rowBytes
                var x = 0
                while (x < width) {
                  val b0 = payload(row + x * 3) & 0xff
                  val g = payload(row + x * 3 + 1) & 0xff
                  val r = payload(row + x * 3 + 2) & 0xff
                  addLuma((299 * r + 587 * g + 114 * b0) / 1000)
                  x += sx
                }
                y += sy
              }
              true
            }
          }
        if (frameOk) sampled += 1
        idx += sampleEvery
      }
      if (sampled == 0 || n == 0) return None
      var i = 0
      while (i < LumaBins) { hist(i) /= n; i += 1 }
      val fps = if (microSecPerFrame > 0) 1e6 / microSecPerFrame else 0d
      val nFrames = if (totalFrames > 0) totalFrames else frames.length.toLong
      Some((width, height, fps, nFrames, sampled, lumaSum.toDouble / n, hist))
    } catch { case _: Exception => None }
  }

  /** Batched REAL video feature extraction: same mapPartitions /
    * fixed-batch contract as the image and audio paths, undecodable
    * payloads quarantined in-band (`decode_ok = false`).
    */
  def extractVideoFeatures(media: DataFrame,
                           batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(videoFeatureSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            decodeVideo(if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)) match {
              case Some((w, h, fps, nf, ns, mean, hist)) =>
                Row(r.getLong(0), true, w, h, fps, nf, ns, mean, hist.toSeq)
              case None =>
                Row(r.getLong(0), false, null, null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }

  // ---------------- MP4/MOV container parse (pure-JVM atom walk) ----------------

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64be(b: Array[Byte], off: Int): Long =
    (u32be(b, off) << 32) | u32be(b, off + 4)

  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType, nullable = false),
    StructField("major_brand", StringType, nullable = true),
    StructField("duration_s", DoubleType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true),
    StructField("n_video", IntegerType, nullable = true),
    StructField("n_audio", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  /** MP4/MOV (ISO BMFF) container metadata: the `moov` atom walk every
    * real multimodal corpus needs — `ftyp` major brand, `mvhd`
    * timescale/duration, per-`trak` `tkhd` dims (16.16 fixed point) and
    * `hdlr` handler type (video/audio track counts) — pure JVM, no
    * codec, no frame decode. Complements [[decodeVideo]]'s RIFF/AVI
    * path: AVI is what the JDK can frame-decode, ISO BMFF is what
    * corpora actually contain, and its header parse alone powers
    * dedup/quality gates (dims, duration, track shape) at 100 TB.
    *
    * Untrusted-bytes contract (same as the AVI walk): 32-bit AND 64-bit
    * (`size == 1`) box lengths in Long math, every offset bounds-checked,
    * `size == 0` (to-end-of-file) terminates the level, recursion
    * depth-limited — a hostile header degrades to `decode_ok = false`
    * or a truncated-but-sane parse, never an error or runaway scan.
    */
  def parseMp4Meta(payload: Array[Byte])
      : Option[(String, Double, Int, Int, Int, Option[Int], Option[Int])] = {
    if (payload == null || payload.length < 16) return None
    try {
      var brand: String = null
      var timescale = 0L
      var duration = 0L
      var haveMvhd = false
      var nTracks = 0
      var nVideo = 0
      var nAudio = 0
      var maxW = 0
      var maxH = 0
      // per-trak state, committed when the trak's boxes are all seen
      var trakW = 0
      var trakH = 0
      var trakHandler: String = null

      def walk(from: Long, to: Long, depth: Int): Unit = {
        var off = from
        while (off + 8 <= to && depth < 8) {
          val size32 = u32be(payload, off.toInt)
          val id = fourcc(payload, off.toInt + 4)
          val (hdr, size) =
            if (size32 == 1L) {
              if (off + 16 > to) return
              (16L, u64be(payload, off.toInt + 8))
            } else if (size32 == 0L) (8L, to - off) // box extends to end
            else (8L, size32)
          if (size < hdr || off + size > to) return // truncated/hostile
          val dataStart = off + hdr
          val dataEnd = off + size
          id match {
            case "ftyp" if size - hdr >= 4 =>
              brand = fourcc(payload, dataStart.toInt).trim
            case "moov" => walk(dataStart, dataEnd, depth + 1)
            case "trak" =>
              trakW = 0; trakH = 0; trakHandler = null
              walk(dataStart, dataEnd, depth + 1)
              nTracks += 1
              if (trakHandler == "vide") {
                nVideo += 1
                if (trakW > 0 && trakH > 0) { maxW = math.max(maxW, trakW); maxH = math.max(maxH, trakH) }
              } else if (trakHandler == "soun") nAudio += 1
            case "mdia" => walk(dataStart, dataEnd, depth + 1)
            case "mvhd" if size - hdr >= 20 =>
              val v = payload(dataStart.toInt) & 0xff
              if (v == 1 && size - hdr >= 32) {
                timescale = u32be(payload, dataStart.toInt + 20)
                duration = u64be(payload, dataStart.toInt + 24)
                haveMvhd = true
              } else if (v == 0) {
                timescale = u32be(payload, dataStart.toInt + 12)
                duration = u32be(payload, dataStart.toInt + 16)
                haveMvhd = true
              }
            case "tkhd" if size - hdr >= 84 =>
              val v = payload(dataStart.toInt) & 0xff
              // width/height: 16.16 fixed point at the end of the box
              // (after matrix); version 1 widens the three time fields
              val wOff = if (v == 1) 88 else 76
              if (size - hdr >= wOff + 8) {
                trakW = (u32be(payload, dataStart.toInt + wOff) >> 16).toInt
                trakH = (u32be(payload, dataStart.toInt + wOff + 4) >> 16).toInt
              }
            case "hdlr" if size - hdr >= 12 =>
              trakHandler = fourcc(payload, dataStart.toInt + 8)
            case _ => // skip: mdat, free, udta, codec boxes, ...
          }
          off = dataEnd
        }
      }
      walk(0L, payload.length.toLong, 0)
      if (!haveMvhd || timescale <= 0) return None
      Some((Option(brand).getOrElse(""), duration.toDouble / timescale,
        nTracks, nVideo, nAudio,
        if (maxW > 0) Some(maxW) else None, if (maxH > 0) Some(maxH) else None))
    } catch { case _: Exception => None }
  }

  /** Batched MP4/MOV metadata extraction: same mapPartitions /
    * fixed-batch contract as the other modality paths, unparseable
    * payloads quarantined in-band (`decode_ok = false`).
    */
  def extractMp4Meta(media: DataFrame,
                     batchSize: Int = DefaultBatchSize): DataFrame = {
    val enc = RowEncoder.encoderFor(mp4MetaSchema)
    media
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            parseMp4Meta(if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)) match {
              case Some((brand, dur, nt, nv, na, w, h)) =>
                Row(r.getLong(0), true, brand, dur, nt, nv, na,
                  w.map(Integer.valueOf).orNull, h.map(Integer.valueOf).orNull)
              case None =>
                Row(r.getLong(0), false, null, null, null, null, null, null, null)
            }
          }
        }
      }(enc)
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
