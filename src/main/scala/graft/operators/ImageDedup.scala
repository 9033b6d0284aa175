package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftCache
import graft.sources.Tables

/** Perceptual image dedup (SURVEY.md §2 C12b) — the multimodal dedup
  * lens an LLM-data pipeline runs over its image corpus: a 64-bit
  * average hash (aHash) per image from REAL decoded pixels, then
  * near-duplicate pairs via LSH banding + exact Hamming verify — the
  * image twin of C3's simhash text dedup (reference domain: the
  * scraper's profile-image payloads, instagram_scraper.py's media
  * fields).
  *
  * The corpus: DuckDB cannot decode PNG, so the oracle-able corpus is
  * DERIVED — each `documents` row becomes an 8x8 RGB PNG whose pixel
  * gray levels are a pure md5 function of (doc_id % NumGroups, x, y)
  * plus a per-doc perturbation of up to 3 pixels. The Spark side goes
  * through the REAL codec path both ways (ImageIO PNG encode in a
  * batched mapPartitions kernel, then ImageIO decode + Rec.601 luma —
  * the same integer luma as Multimodal.decodeImage); the oracle
  * recomputes the same pixel function directly in SQL. They agree
  * because PNG is lossless and RGB carries 8-bit channels verbatim —
  * so the oracle is genuinely checking that encode→decode→hash
  * round-trips the pixel function bit-exactly.
  *
  * Hash: bit(x,y) = 64·luma(x,y) > Σluma (integer compare — no mean
  * division to round differently cross-engine), row-major 64-char
  * '0'/'1' string.
  *
  * Scale: banding splits the 64 bits into 4 bands of 16; candidate
  * pairs share at least one exact band (Hamming ≤ 3 guarantees a
  * shared band by pigeonhole). The self-join is per (band index, band
  * value) bucket — never all-pairs — and cross-band duplicates are
  * removed map-side by the first-equal-band rule (C5's
  * first-colliding-table trick: a pair is emitted only from its first
  * matching band, decided by bit math on the two full signatures — no
  * distinct shuffle). Exact Hamming verify runs only on candidates via
  * the codegen [[Exprs.hamming]]. At 100 TB: one shuffle on (band,
  * value), bucket sizes bounded by corpus duplication structure, raw
  * pixels touched only at hash build.
  */
object ImageDedup {

  // ImageIO stream caches default to FILE-backed: every encode/decode
  // of an in-memory byte[] creates and deletes a temp file — thousands
  // of avoidable syscalls per phash run, and the cold-run noise
  // amplifier on a contended disk. Payload sizes here are bounded
  // (ImgDim² pixels), so memory-backed caches are strictly better.
  // JVM-global and idempotent; object init runs on first access in
  // every executor JVM, i.e. before any kernel's first codec call.
  ImageIO.setUseCache(false)

  val ImgDim = 8
  val NumGroups = 50
  val NumBands = 4
  val BandBits: Int = ImgDim * ImgDim / NumBands // 16
  val HammingThreshold = 10

  /** Pixel gray level g(doc, x, y) ∈ [0, 255]: first md5 hex pair of
    * the group-keyed cell name, plus +64 (mod 256) on up to
    * (doc_id % 4) perturbed cells — mirrored verbatim in the oracle.
    */
  def pixelValue(docId: Long, x: Int, y: Int): Int = {
    val base = Integer.parseInt(
      BandedPairs.md5Hex(s"img_${docId % NumGroups}_${x}_$y").substring(0, 2), 16)
    val idx = y * ImgDim + x
    val perturbed = (0 until (docId % 4).toInt)
      .exists(t => (docId * 7 + t * 13) % (ImgDim * ImgDim) == idx)
    (base + (if (perturbed) 64 else 0)) % 256
  }

  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** The derived image corpus: one real PNG per document, encoded by
    * the JDK codec in a batched mapPartitions kernel (the C12 plumbing
    * contract). TYPE_INT_RGB with r=g=b=v — byte-gray would pass
    * through Java's linear-gray color space and getRGB would remap the
    * levels; RGB round-trips them verbatim.
    */
  def imageCorpus(documents: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(corpusSchema)
    val spark = documents.sparkSession
    // CPU-bound codec kernel: spread it over every core — a small
    // parquet input is one partition and would serialize the encode
    // into one task (see AudioDedup.audioCorpus for the measurement).
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = new java.awt.image.BufferedImage(
            ImgDim, ImgDim, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < ImgDim) {
            var x = 0
            while (x < ImgDim) {
              val v = pixelValue(id, x, y)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** 64-bit average hash from a REAL decode: ImageIO + the same integer
    * Rec.601 luma as [[Multimodal.decodeImage]]; bit = 64·luma > Σluma.
    * None for undecodable payloads (quarantined upstream of the join).
    */
  def phash64(payload: Array[Byte]): Option[String] = {
    if (payload == null || payload.isEmpty) return None
    try {
      // header-dims gate BEFORE any pixel decode (the Multimodal video
      // path's decompression-bomb rule): a crafted header claiming huge
      // dimensions must be rejected from the codec header alone, never
      // allocated by ImageIO.read
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      val dims =
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
            finally r.dispose()
          }
        } catch { case _: Exception => None } finally iis.close()
      if (!dims.contains((ImgDim, ImgDim))) return None
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null || img.getWidth != ImgDim || img.getHeight != ImgDim) return None
      val lumas = new Array[Long](ImgDim * ImgDim)
      var sum = 0L
      var y = 0
      while (y < ImgDim) {
        var x = 0
        while (x < ImgDim) {
          val rgb = img.getRGB(x, y)
          val luma = (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)) / 1000L
          lumas(y * ImgDim + x) = luma
          sum += luma
          x += 1
        }
        y += 1
      }
      val sb = new StringBuilder(ImgDim * ImgDim)
      var i = 0
      while (i < lumas.length) {
        sb.append(if (lumas(i) * (ImgDim * ImgDim) > sum) '1' else '0')
        i += 1
      }
      Some(sb.toString)
    } catch { case _: Exception => None }
  }

  /** Stateless payload→aHash kernel over any (idCol: Long, payload:
    * binary) frame: pure mapPartitions + filter, no persist, no
    * shuffle — so it runs UNCHANGED on batch and STREAMING frames
    * (EventStream's continuous phash dedup drives exactly this body).
    * Undecodable payloads are quarantined by the null filter.
    */
  def phashPayloads(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("phash", StringType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), phash64(r.getAs[Array[Byte]](1)).orNull)
        }
      }(enc)
      .filter(col("phash").isNotNull)
  }

  /** (doc_id, 64-char phash) via the batched decode kernel; persisted —
    * both branches of the band self-join and the verify read it.
    */
  def imagePhash(documents: DataFrame): DataFrame =
    GraftCache.persistTracked(phashPayloads(imageCorpus(documents)))

  /** C12b: near-duplicate image pairs — the shared [[BandedPairs]]
    * machinery (banded candidates, first-equal-band dedup, codegen
    * Hamming verify at ≤ [[HammingThreshold]]; see BandedPairs for the
    * recall contract past numBands − 1 differing bits).
    */
  def imagePhashPairs(documents: DataFrame): DataFrame =
    BandedPairs.pairs(imagePhash(documents), "doc_id", "phash",
      NumBands, BandBits, HammingThreshold)

  /** The pixel-function → luma → 64-bit-hash CTE chain, shared by the
    * pairs oracle and the registry-scan oracle (ends with `h(doc_id,
    * phash)`). */
  private val phashCtesSql: String = {
    val hex2 = TextOps.hexPrefixValSql(
      s"md5('img_' || CAST(doc_id % $NumGroups AS VARCHAR) || '_' || CAST(x AS VARCHAR) || '_' || CAST(y AS VARCHAR))", 2)
    s"""cells AS (
       |  SELECT doc_id, x, y, y * $ImgDim + x AS idx
       |  FROM documents, range(0, $ImgDim) rx(x), range(0, $ImgDim) ry(y)),
       |px AS (
       |  SELECT doc_id, x, y,
       |    ($hex2
       |     + CASE WHEN len(list_filter(range(0, CAST(doc_id % 4 AS INT)),
       |         t -> (doc_id * 7 + t * 13) % ${ImgDim * ImgDim} = idx)) > 0
       |       THEN 64 ELSE 0 END) % 256 AS v
       |  FROM cells),
       |tot AS (SELECT doc_id, sum(v) AS s FROM px GROUP BY 1),
       |bits AS (
       |  SELECT px.doc_id, px.y, px.x,
       |    CASE WHEN ${ImgDim * ImgDim} * px.v > tot.s THEN '1' ELSE '0' END AS bit
       |  FROM px JOIN tot ON px.doc_id = tot.doc_id),
       |h AS (
       |  SELECT doc_id, string_agg(bit, '' ORDER BY y, x) AS phash
       |  FROM bits GROUP BY 1)""".stripMargin
  }

  /** Oracle: the same pixel function, hash, banding, and verify in pure
    * SQL — candidate dedup via DISTINCT instead of the first-equal-band
    * projection (same pair set).
    */
  val imagePhashPairsSql: String =
    s"""WITH $phashCtesSql,
       |${BandedPairs.pairsSqlTail("h", "phash", ImgDim * ImgDim,
            NumBands, BandBits, HammingThreshold)}""".stripMargin

  /** C109: media HASH-LIST registry scan — the compliance primitive
    * every media pipeline runs (an NCMEC-style banned-hash-list check,
    * as a query): a registry of banned perceptual hashes (fingerprints
    * ONLY — the banned payloads never ship, the EvalRegistry
    * leak-safety rule) is probed against the corpus's image hashes
    * with the SAME banded Hamming machinery the dedup path uses; one
    * verdict row per corpus image (matched, lowest matching banned id,
    * min hamming). Banned slice = doc_id % 100 < 10, probes the rest —
    * probes with doc_id % 100 in 50..59 share pixel groups with banned
    * images (near-dup plants), everything else is clean. Scale: the
    * registry is hash-list-sized and its banded side is
    * occupancy-capped; the corpus streams once through the banded
    * probe join — never all-pairs.
    */
  def mediaRegistryScan(documents: DataFrame): DataFrame = {
    val fps = imagePhash(documents)
    val banned = fps.filter(pmod(col("doc_id"), lit(100L)) < 10L)
      .select(col("doc_id").as("banned_id"), col("phash"))
    val probes = fps.filter(pmod(col("doc_id"), lit(100L)) >= 10L)
    val hits = BandedPairs.probeJoin(probes, "doc_id", banned, "banned_id",
      "phash", NumBands, BandBits, HammingThreshold)
      .groupBy("doc_id")
      .agg(min(col("banned_id")).as("mid"),
        min(col("hamming")).as("mham"))
    probes.select("doc_id").join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("mid").isNotNull.as("matched"),
        coalesce(col("mid"), lit(-1L)).as("match_id"),
        coalesce(col("mham"), lit(-1L)).as("min_hamming"))
  }

  val mediaRegistryScanSql: String =
    s"""WITH $phashCtesSql,
       |reg AS (SELECT doc_id AS banned_id, phash FROM h WHERE doc_id % 100 < 10),
       |probe AS (SELECT doc_id, phash FROM h WHERE doc_id % 100 >= 10),
       |rb AS (
       |  SELECT banned_id, phash, b,
       |    substr(phash, b * $BandBits + 1, $BandBits) AS band,
       |    ${TextOps.hexPrefixValSql("md5(CAST(banned_id AS VARCHAR))")} AS rkey
       |  FROM reg, range(0, $NumBands) rband(b)),
       |rkept AS (
       |  SELECT banned_id, phash, b, band FROM (
       |    SELECT *, row_number() OVER (PARTITION BY b, band
       |      ORDER BY rkey, banned_id) AS occ
       |    FROM rb) WHERE occ <= ${BandedPairs.DefaultBucketCap}),
       |pb AS (
       |  SELECT doc_id, phash AS ha, b,
       |    substr(phash, b * $BandBits + 1, $BandBits) AS band
       |  FROM probe, range(0, $NumBands) rband(b)),
       |cand AS (
       |  SELECT DISTINCT p.doc_id, r.banned_id, p.ha, r.phash AS hb
       |  FROM pb p JOIN rkept r ON p.b = r.b AND p.band = r.band),
       |hit AS (
       |  SELECT doc_id, banned_id, hamming FROM (
       |    SELECT doc_id, banned_id,
       |      CAST(list_sum(list_transform(range(1, ${ImgDim * ImgDim + 1}),
       |        k -> CASE WHEN substr(ha, k, 1) = substr(hb, k, 1) THEN 0 ELSE 1 END))
       |        AS BIGINT) AS hamming
       |    FROM cand)
       |  WHERE hamming <= $HammingThreshold),
       |agg AS (SELECT doc_id, min(banned_id) AS match_id,
       |    min(hamming) AS min_hamming
       |  FROM hit GROUP BY doc_id)
       |SELECT p.doc_id,
       |  agg.match_id IS NOT NULL AS matched,
       |  CAST(coalesce(agg.match_id, -1) AS BIGINT) AS match_id,
       |  CAST(coalesce(agg.min_hamming, -1) AS BIGINT) AS min_hamming
       |FROM probe p LEFT JOIN agg ON p.doc_id = agg.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_image_phash" -> ((s, d) => imagePhashPairs(Tables.documents(s, d))),
    "q_media_registry_scan" -> ((s, d) => mediaRegistryScan(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_image_phash" -> imagePhashPairsSql,
    "q_media_registry_scan" -> mediaRegistryScanSql)
}
