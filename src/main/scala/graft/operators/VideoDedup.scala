package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftCache
import graft.sources.Tables

/** Perceptual video dedup (SURVEY.md §2 C12d) — the third codec lens,
  * completing the image (C12b) / audio (C12c) / video trio: a 64-bit
  * temporal fingerprint per clip from REAL container-decoded frames,
  * then near-duplicate pairs via the shared [[BandedPairs]] machinery
  * (reference domain: the scraper's reel/video media payloads,
  * instagram_scraper.py's media fields).
  *
  * The corpus: DuckDB cannot parse AVI, so the oracle-able corpus is
  * DERIVED exactly like the image lens — each `documents` row becomes
  * a real RIFF/AVI clip of [[FrameCount]] uncompressed bottom-up BGR24
  * DIB frames ([[Dim]]×[[Dim]], the `00db` encoding
  * [[Multimodal.decodeVideo]] frame-decodes), whose gray levels are a
  * pure md5 function of (doc_id % [[NumGroups]], frame, x, y) plus a
  * per-doc perturbation of up to 3 cells. The Spark side goes through
  * the REAL codec path both ways (hand-assembled RIFF writer →
  * bounds-checked container walk + DIB row decode — the same
  * bottom-up/stride rules as Multimodal's fuzz-tested walk); the
  * oracle recomputes the pixel function directly in SQL. They agree
  * because DIB is lossless and r=g=b=v makes the Rec.601 integer luma
  * exactly v.
  *
  * Fingerprint: per-frame aHash — bit(f,x,y) = 16·luma > Σluma(frame)
  * (integer compare, no division) — concatenated over the first
  * [[FrameCount]] frames, so each [[BandedPairs]] band IS one frame's
  * hash: two clips are candidates iff some sampled frame matches
  * exactly, the standard temporal-phash blocking rule.
  *
  * Scale: identical posture to C12b — one shuffle on (band, value),
  * bucket occupancy capped, raw payload bytes touched only in the
  * hash-build mapPartitions kernel, quarantine in-band (undecodable →
  * dropped before the join). Frame dims are required to equal [[Dim]]
  * BEFORE any per-pixel work, so a hostile header can neither allocate
  * nor scan beyond Dim² bytes per frame.
  */
object VideoDedup {

  val Dim = 4
  val FrameCount = 4
  val NumGroups = 50
  val NumBands: Int = FrameCount // one band per frame
  val BandBits: Int = Dim * Dim // 16
  val HammingThreshold = 10
  val MicroSecPerFrame = 40000L // 25 fps

  private val CellCount = FrameCount * Dim * Dim // 64

  /** Gray level v(doc, f, x, y) ∈ [0, 255]: first md5 hex pair of the
    * group-keyed cell name, plus +64 (mod 256) on up to (doc_id % 4)
    * perturbed cells — mirrored verbatim in the oracle.
    */
  def pixelValue(docId: Long, f: Int, x: Int, y: Int): Int = {
    val base = Integer.parseInt(
      BandedPairs.md5Hex(s"vid_${docId % NumGroups}_${f}_${x}_$y").substring(0, 2), 16)
    val idx = f * Dim * Dim + y * Dim + x
    val perturbed = (0 until (docId % 4).toInt)
      .exists(t => (docId * 7 + t * 13) % CellCount == idx)
    (base + (if (perturbed) 64 else 0)) % 256
  }

  // ---- RIFF/AVI writer (the encode half of the real roundtrip) ----

  private def u32le(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** Assemble a real RIFF/AVI byte stream: `avih` MainAVIHeader (the
    * fields [[Multimodal.decodeVideo]] reads: microSecPerFrame,
    * totalFrames, width, height) + one `00db` chunk per frame holding
    * bottom-up BGR24 rows padded to 4-byte multiples — the layout the
    * decoder's stride math expects. MultimodalSpec-adjacent check:
    * VideoDedupSpec asserts `Multimodal.decodeVideo` accepts this
    * writer's output, pinning the writer to the fuzz-tested parser.
    */
  def encodeAvi(frames: Array[Array[Int]], width: Int, height: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val frameBytes = rowBytes * height
    val hdrlPayload = 4 + 8 + 56 // 'hdrl' + avih chunk
    val moviPayload = 4 + frames.length * (8 + frameBytes)
    val riffPayload = 4 + (8 + hdrlPayload) + (8 + moviPayload)

    val out = new ByteArrayOutputStream(12 + riffPayload)
    fourcc(out, "RIFF"); u32le(out, riffPayload.toLong); fourcc(out, "AVI ")

    fourcc(out, "LIST"); u32le(out, hdrlPayload.toLong); fourcc(out, "hdrl")
    fourcc(out, "avih"); u32le(out, 56L)
    u32le(out, MicroSecPerFrame) // dwMicroSecPerFrame
    u32le(out, 0L); u32le(out, 0L); u32le(out, 0L) // maxBytesPerSec, pad, flags
    u32le(out, frames.length.toLong) // dwTotalFrames
    u32le(out, 0L); u32le(out, 1L); u32le(out, 0L) // initialFrames, streams, bufSize
    u32le(out, width.toLong); u32le(out, height.toLong)
    u32le(out, 0L); u32le(out, 0L); u32le(out, 0L); u32le(out, 0L) // reserved

    fourcc(out, "LIST"); u32le(out, moviPayload.toLong); fourcc(out, "movi")
    frames.foreach { px =>
      fourcc(out, "00db"); u32le(out, frameBytes.toLong)
      var y = height - 1 // bottom-up rows
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val v = px(y * width + x)
          out.write(v); out.write(v); out.write(v) // B G R, all = v
          x += 1
        }
        var pad = rowBytes - width * 3
        while (pad > 0) { out.write(0); pad -= 1 }
        y -= 1
      }
    }
    out.toByteArray
  }

  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** The derived video corpus: one real AVI clip per document, encoded
    * by the RIFF writer in a batched mapPartitions kernel. CPU-bound:
    * spread over every core (one-partition parquet input would
    * serialize the encode — the AudioDedup measurement).
    */
  def videoCorpus(documents: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(corpusSchema)
    val spark = documents.sparkSession
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val frames = Array.tabulate(FrameCount) { f =>
            Array.tabulate(Dim * Dim)(i => pixelValue(id, f, i % Dim, i / Dim))
          }
          Row(id, encodeAvi(frames, Dim, Dim))
        }
      }(enc)
  }

  // ---- real decode: shared container walk + DIB rows ----

  /** 64-bit temporal fingerprint from a REAL decode: the SHARED
    * fuzz-tested [[Multimodal.walkAvi]] container walk (one parser for
    * both video consumers — a hardening fix can never be missing
    * here), bottom-up BGR24 row reads at the same stride math as
    * [[Multimodal.decodeVideo]], per-frame aHash bits by integer
    * compare. None unless the clip is exactly [[FrameCount]] decodable
    * [[Dim]]×[[Dim]] `00db` frames — the dims gate runs BEFORE any
    * per-pixel work (decompression-bomb rule: nothing is allocated
    * from untrusted sizes).
    */
  def vhash64(payload: Array[Byte]): Option[String] = {
    val layout = Multimodal.walkAvi(payload) match {
      case Some(l) => l
      case None => return None
    }
    try {
      val width = layout.width
      val height = layout.height
      // dims gate before any pixel read: this lens only fingerprints
      // Dim×Dim clips, so nothing untrusted ever sizes an allocation
      if (width != Dim || height != Dim) return None
      val frames = layout.frames.collect { case (start, size, "00db") => (start, size) }
      if (frames.length < FrameCount) return None

      val rowBytes = (width * 3 + 3) & ~3
      val sb = new StringBuilder(FrameCount * Dim * Dim)
      var fi = 0
      while (fi < FrameCount) {
        val (start, size) = frames(fi)
        if (size < rowBytes * height) return None
        val lumas = new Array[Int](Dim * Dim)
        var sum = 0
        var y = 0
        while (y < height) {
          val row = start + (height - 1 - y) * rowBytes // bottom-up
          var x = 0
          while (x < width) {
            val b0 = payload(row + x * 3) & 0xff
            val g = payload(row + x * 3 + 1) & 0xff
            val r = payload(row + x * 3 + 2) & 0xff
            val luma = (299 * r + 587 * g + 114 * b0) / 1000
            lumas(y * Dim + x) = luma
            sum += luma
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < lumas.length) {
          sb.append(if (lumas(i) * (Dim * Dim) > sum) '1' else '0')
          i += 1
        }
        fi += 1
      }
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  /** Stateless payload→fingerprint kernel (the C12b
    * [[ImageDedup.phashPayloads]] contract: pure mapPartitions +
    * filter, no persist, no shuffle — runs unchanged on batch and
    * streaming frames). Undecodable payloads quarantined by the null
    * filter.
    */
  def vhashPayloads(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("vhash", StringType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), vhash64(r.getAs[Array[Byte]](1)).orNull)
        }
      }(enc)
      .filter(col("vhash").isNotNull)
  }

  /** (doc_id, 64-char temporal fingerprint) via the real roundtrip;
    * persisted — both branches of the band self-join read it.
    */
  def videoPhash(documents: DataFrame): DataFrame =
    GraftCache.persistTracked(vhashPayloads(videoCorpus(documents)))

  /** C12d: near-duplicate clip pairs — the shared [[BandedPairs]]
    * engine; a band is one frame's hash, so blocking is
    * "some sampled frame identical", the temporal-phash rule.
    */
  def videoPhashPairs(documents: DataFrame): DataFrame =
    BandedPairs.pairs(videoPhash(documents), "doc_id", "vhash",
      NumBands, BandBits, HammingThreshold)

  /** Oracle: the same pixel function, per-frame hash, banding, and
    * verify in pure SQL ([[BandedPairs.pairsSqlTail]] supplies the
    * band/cap/verify tail).
    */
  val videoPhashPairsSql: String = {
    val hex2 = TextOps.hexPrefixValSql(
      s"md5('vid_' || CAST(doc_id % $NumGroups AS VARCHAR) || '_' || CAST(f AS VARCHAR)" +
        " || '_' || CAST(x AS VARCHAR) || '_' || CAST(y AS VARCHAR))", 2)
    s"""WITH cells AS (
       |  SELECT doc_id, f, x, y, f * ${Dim * Dim} + y * $Dim + x AS idx
       |  FROM documents, range(0, $FrameCount) rf(f),
       |       range(0, $Dim) rx(x), range(0, $Dim) ry(y)),
       |px AS (
       |  SELECT doc_id, f, x, y,
       |    ($hex2
       |     + CASE WHEN len(list_filter(range(0, CAST(doc_id % 4 AS INT)),
       |         t -> (doc_id * 7 + t * 13) % $CellCount = idx)) > 0
       |       THEN 64 ELSE 0 END) % 256 AS v
       |  FROM cells),
       |tot AS (SELECT doc_id, f, sum(v) AS s FROM px GROUP BY 1, 2),
       |bits AS (
       |  SELECT px.doc_id, px.f, px.y, px.x,
       |    CASE WHEN ${Dim * Dim} * px.v > tot.s THEN '1' ELSE '0' END AS bit
       |  FROM px JOIN tot ON px.doc_id = tot.doc_id AND px.f = tot.f),
       |h AS (
       |  SELECT doc_id, string_agg(bit, '' ORDER BY f, y, x) AS vhash
       |  FROM bits GROUP BY 1),
       |${BandedPairs.pairsSqlTail("h", "vhash", CellCount,
            NumBands, BandBits, HammingThreshold)}""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_video_phash" -> ((s, d) => videoPhashPairs(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_video_phash" -> videoPhashPairsSql)
}
