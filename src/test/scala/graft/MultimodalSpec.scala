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

  /** Deterministic real WAV: 16-bit signed little-endian PCM, `ch`
    * channels; channel c is a constant-amplitude square wave at
    * amplitude (c+1)/4 of full scale (RMS of a square wave = its
    * amplitude, making the expected per-channel RMS exact).
    */
  private def wavBytes(rate: Int, ch: Int, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch, true, false)
    val pcm = new Array[Byte](nFrames * ch * 2)
    for (f <- 0 until nFrames; c <- 0 until ch) {
      val amp = ((c + 1) * 32768 / 4 - 1).toShort
      val v: Short = if (f % 2 == 0) amp else (-amp).toShort
      val base = (f * ch + c) * 2
      pcm(base) = (v & 0xff).toByte
      pcm(base + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL audio decode: JDK javax.sound extracts rate, duration, per-channel RMS") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, wavBytes(44100, 2, 4410)),
      (2L, wavBytes(8000, 1, 8000)),
      (3L, "definitely not audio".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("media_id", "payload")
    val out = Multimodal.extractAudioFeatures(df).orderBy("media_id").collect()
    assert(out.length == 4)
    // stereo 44.1k clip: exact rate/channels/frames, duration = n/rate
    assert(out(0).getBoolean(1))
    assert(out(0).getInt(2) == 44100 && out(0).getInt(3) == 2)
    assert(out(0).getLong(4) == 4410L)
    assert(math.abs(out(0).getDouble(5) - 0.1) < 1e-9)
    // square-wave RMS == amplitude: ch0 ~ 0.25, ch1 ~ 0.5 of full scale
    val rms = out(0).getSeq[Double](6)
    assert(rms.length == 2)
    assert(math.abs(rms(0) - 0.25) < 1e-3, s"ch0 rms ${rms(0)}")
    assert(math.abs(rms(1) - 0.5) < 1e-3, s"ch1 rms ${rms(1)}")
    // mono 8k clip: one full second
    assert(out(1).getBoolean(1) && out(1).getInt(2) == 8000 &&
      out(1).getInt(3) == 1 && math.abs(out(1).getDouble(5) - 1.0) < 1e-9)
    // garbage and null payloads quarantined in-band, not thrown
    assert(!out(2).getBoolean(1) && out(2).isNullAt(2))
    assert(!out(3).getBoolean(1))
  }

  test("REAL audio decode is deterministic and batch-shape independent") {
    val s = spark
    import s.implicits._
    val df = (1L to 30L).map(i => (i, wavBytes(8000, 1 + (i % 2).toInt, 100 + i.toInt)))
      .toDF("media_id", "payload")
    def collectFeats(bs: Int) =
      Multimodal.extractAudioFeatures(df, batchSize = bs)
        .orderBy("media_id").collect()
        .map(r => (r.getLong(0), r.getInt(3), r.getLong(4), r.getSeq[Double](6))).toSeq
    assert(collectFeats(7) == collectFeats(64), "features must not depend on batch size")
  }

  private def u32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Minimal real RIFF/AVI writer: RIFF(AVI [LIST hdrl [avih]]
    * [LIST movi [frame chunks]]) — the structure every AVI muxer emits.
    */
  private def aviBytes(frames: Seq[Array[Byte]], frameId: String,
                       w: Int, h: Int, usPerFrame: Long): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(id.getBytes("US-ASCII"))
      bos.write(u32(data.length))
      bos.write(data)
      if (data.length % 2 == 1) bos.write(0) // even padding
      bos.toByteArray
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = chunk("avih",
      u32(usPerFrame) ++ u32(0) ++ u32(0) ++ u32(0) ++
        u32(frames.length) ++ u32(0) ++ u32(1) ++ u32(0) ++
        u32(w) ++ u32(h) ++ Array.fill[Byte](16)(0))
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", avih) ++
      list("movi", frames.toArray.flatMap(f => chunk(frameId, f)))
    "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
  }

  private def jpegBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(w - 1, 1) + seed * 20) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("REAL video decode: MJPEG AVI yields header metadata + sampled-frame luma") {
    val s = spark
    import s.implicits._
    val mjpeg = aviBytes((0 until 6).map(i => jpegBytes(16, 12, i)), "00dc",
      w = 16, h = 12, usPerFrame = 40000L) // 25 fps
    val rows = Seq(
      (1L, mjpeg),
      (2L, "definitely not a video".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.extractVideoFeatures(rows.toDF("media_id", "payload"))
      .orderBy("media_id").collect()
    assert(out(0).getBoolean(1), "MJPEG AVI must decode")
    assert(out(0).getInt(2) == 16 && out(0).getInt(3) == 12)
    assert(math.abs(out(0).getDouble(4) - 25.0) < 1e-9) // fps from avih
    assert(out(0).getLong(5) == 6)                      // n_frames from avih
    assert(out(0).getInt(6) == 2)                       // frames 0 and 4 sampled
    val hist = out(0).getSeq[Double](8)
    assert(hist.length == Multimodal.LumaBins && math.abs(hist.sum - 1.0) < 1e-9)
    // garbage and null quarantine in-band
    assert(!out(1).getBoolean(1) && out(1).isNullAt(2))
    assert(!out(2).getBoolean(1))
  }

  test("REAL video decode: uncompressed bottom-up DIB frames give exact luma") {
    val s = spark
    import s.implicits._
    // 4x2 frames, every pixel gray v=100 -> Rec.601 luma exactly 100
    val w = 4; val h = 2
    val rowBytes = (w * 3 + 3) & ~3
    val frame = Array.fill[Byte](rowBytes * h)(100.toByte)
    val dib = aviBytes(Seq(frame, frame, frame), "00db", w, h, usPerFrame = 100000L)
    val out = Multimodal.extractVideoFeatures(Seq((1L, dib)).toDF("media_id", "payload"))
      .collect()(0)
    assert(out.getBoolean(1))
    assert(out.getInt(2) == w && out.getInt(3) == h)
    assert(math.abs(out.getDouble(4) - 10.0) < 1e-9) // 100000 us/frame = 10 fps
    assert(out.getLong(5) == 3 && out.getInt(6) == 1) // only frame 0 sampled (every 4th)
    assert(out.getDouble(7) == 100.0, s"exact luma, got ${out.getDouble(7)}")
    val hist = out.getSeq[Double](8)
    assert(hist(100 * Multimodal.LumaBins / 256) == 1.0)
  }

  test("REAL video decode: hostile header dims quarantine instead of allocating") {
    val s = spark
    import s.implicits._
    // avih declares absurd dimensions; the tiny 00db chunk must be
    // rejected by the bounded-dims check, not trigger a giant allocation
    // or an overflow-defeated size check.
    val hostile = aviBytes(Seq(Array.fill[Byte](64)(1)), "00db",
      w = 1 << 20, h = 1 << 20, usPerFrame = 40000L)
    val out = Multimodal.extractVideoFeatures(
      Seq((1L, hostile)).toDF("media_id", "payload")).collect()(0)
    assert(!out.getBoolean(1), "hostile dims must quarantine in-band")
  }

  test("video decode rejects a non-positive sample stride instead of spinning") {
    val ok = aviBytes(Seq(Array.fill[Byte](64)(1)), "00db", 4, 4, 40000L)
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideo(ok, sampleEvery = 0)
    }
  }

  test("MJPEG frame whose own header declares hostile dims is skipped pre-decode") {
    // a real tiny JPEG, then patch the SOF0 dimension fields to 60000x60000:
    // the header-dims gate must skip it without handing it to ImageIO.read
    val jpg = jpegBytes(8, 8, 0)
    var i = 2
    var patched = false
    while (i + 9 < jpg.length && !patched) {
      if ((jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0) {
        // SOF0: ff c0 len prec height(2) width(2)
        jpg(i + 5) = ((60000 >> 8) & 0xff).toByte; jpg(i + 6) = (60000 & 0xff).toByte
        jpg(i + 7) = ((60000 >> 8) & 0xff).toByte; jpg(i + 8) = (60000 & 0xff).toByte
        patched = true
      }
      i += 1
    }
    assert(patched, "test JPEG should contain an SOF0 marker")
    val hostile = aviBytes(Seq(jpg), "00dc", 8, 8, 40000L)
    val out = Multimodal.decodeVideo(hostile)
    assert(out.isEmpty, "all frames hostile -> quarantine (None), not an OOM")
  }

  test("REAL video decode is deterministic and batch-shape independent") {
    val s = spark
    import s.implicits._
    val df = (1L to 20L).map { i =>
      (i, aviBytes((0 until 5).map(f => jpegBytes(8 + (i % 4).toInt * 4, 8, f)), "00dc",
        8 + (i % 4).toInt * 4, 8, 33333L))
    }.toDF("media_id", "payload")
    def collectFeats(bs: Int) =
      Multimodal.extractVideoFeatures(df, batchSize = bs)
        .orderBy("media_id").collect()
        .map(r => (r.getLong(0), r.getInt(2), r.getDouble(7))).toSeq
    assert(collectFeats(3) == collectFeats(64), "features must not depend on batch size")
  }

  // ---- MP4/MOV atom-walk tests: planted ISO-BMFF headers, no codec ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def atom(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body

  /** Minimal well-formed MP4: ftyp(isom) + moov{mvhd(v0), video trak
    * (tkhd dims 16.16 + mdia/hdlr 'vide'), audio trak (hdlr 'soun')}.
    */
  private def mp4Bytes(timescale: Long, duration: Long, w: Int, h: Int): Array[Byte] = {
    val ftyp = atom("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++ "isomiso2".getBytes("US-ASCII"))
    val mvhd = atom("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration)
        ++ Array.fill[Byte](80)(0))
    def tkhd(w: Int, h: Int) = atom("tkhd",
      Array[Byte](0, 0, 0, 0) ++ Array.fill[Byte](72)(0)
        ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
    def hdlr(kind: String) = atom("hdlr",
      Array.fill[Byte](8)(0) ++ kind.getBytes("US-ASCII") ++ Array.fill[Byte](12)(0))
    val vTrak = atom("trak", tkhd(w, h) ++ atom("mdia", hdlr("vide")))
    val aTrak = atom("trak", tkhd(0, 0) ++ atom("mdia", hdlr("soun")))
    ftyp ++ atom("moov", mvhd ++ vTrak ++ aTrak)
  }

  test("MP4 parse: planted moov yields brand, duration, track counts, video dims") {
    val bytes = mp4Bytes(timescale = 600, duration = 3000, w = 1920, h = 1080)
    val (brand, dur, nt, nv, na, w, h) = Multimodal.parseMp4Meta(bytes).get
    assert(brand == "isom" && dur == 5.0 && nt == 2 && nv == 1 && na == 1)
    assert(w.contains(1920) && h.contains(1080))
    // and through the batched Spark path with quarantine for garbage
    val s = spark
    import s.implicits._
    val df = Seq((1L, bytes), (2L, Array.fill[Byte](64)(7))).toDF("media_id", "payload")
    val out = Multimodal.extractMp4Meta(df).orderBy("media_id").collect()
    assert(out(0).getBoolean(1) && out(0).getInt(7) == 1920)
    assert(!out(1).getBoolean(1), "garbage bytes must quarantine in-band")
  }

  test("MP4 parse: 64-bit largesize boxes and mvhd v1 are honored") {
    // moov with size==1 + 64-bit largesize; mvhd version 1 (8-byte times)
    val mvhdV1 = atom("mvhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) // v1: ctime+mtime 8+8
        ++ be32(1000) ++ be32(0) ++ be32(7500) // timescale, duration u64
        ++ Array.fill[Byte](80)(0))
    val moovBody = mvhdV1
    val moov64 = be32(1) ++ "moov".getBytes("US-ASCII") ++
      be32(0) ++ be32(moovBody.length + 16L) ++ moovBody
    val bytes = atom("ftyp", "qt  ".getBytes("US-ASCII") ++ be32(0)) ++ moov64
    val (brand, dur, nt, _, _, _, _) = Multimodal.parseMp4Meta(bytes).get
    assert(brand == "qt" && dur == 7.5 && nt == 0)
  }

  test("MP4 parse: hostile headers degrade to None, never error or spin") {
    val good = mp4Bytes(600, 3000, 640, 480)
    // truncated mid-moov
    assert(Multimodal.parseMp4Meta(good.take(good.length / 2)).isEmpty ||
      !Multimodal.parseMp4Meta(good.take(good.length / 2)).exists(_._6.isDefined))
    // box size overflowing the payload
    val overflow = atom("ftyp", "isom".getBytes("US-ASCII")) ++
      be32(0x7fffffffL) ++ "moov".getBytes("US-ASCII")
    assert(Multimodal.parseMp4Meta(overflow).isEmpty)
    // size==0 box at top level must terminate, not loop
    val zeroSize = be32(0) ++ "free".getBytes("US-ASCII") ++ Array.fill[Byte](32)(0)
    assert(Multimodal.parseMp4Meta(zeroSize).isEmpty)
    // 64-bit largesize smaller than its own header
    val tinyLarge = be32(1) ++ "moov".getBytes("US-ASCII") ++ be32(0) ++ be32(4)
    assert(Multimodal.parseMp4Meta(tinyLarge).isEmpty)
    // deep nesting beyond the depth limit parses to a bounded result
    var nested = atom("mvhd", Array.fill[Byte](100)(0))
    for (_ <- 1 to 20) nested = atom("moov", nested)
    assert(Multimodal.parseMp4Meta(nested ++ Array.fill[Byte](8)(0)).isEmpty)
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
