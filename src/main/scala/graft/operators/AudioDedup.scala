package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftCache
import graft.sources.Tables

/** Perceptual AUDIO dedup (SURVEY.md §2 C12c) — the audio twin of
  * C12b's image lens, completing the per-modality dedup story: a
  * 64-bit energy-sign fingerprint per clip from a REAL PCM roundtrip
  * (javax.sound WAV encode in a batched mapPartitions kernel, then the
  * JDK WAV reader back to samples), near-duplicate pairs via the same
  * LSH banding + codegen Hamming verify as C3/C12b.
  *
  * The corpus: DuckDB cannot parse WAV, so the oracle-able corpus is
  * DERIVED — each `documents` row becomes a 1024-sample mono 16-bit
  * PCM clip of 64 constant-amplitude blocks (alternating-sign square
  * wave, amplitude a pure md5 function of (doc_id % NumGroups, block)
  * plus a per-doc perturbation of up to 3 blocks). The Spark side goes
  * bytes→WAV→decode→fingerprint through the real codec; the oracle
  * recomputes block energies from the amplitude function directly.
  * They agree because WAV PCM is lossless — the oracle genuinely
  * checks that encode→decode round-trips the samples bit-exactly.
  *
  * Fingerprint: block energy E_b = Σ s² over the block's 16 samples;
  * bit b = 64·E_b > Σ E (integer compare, no mean division) — the
  * energy-profile analog of aHash, robust to sample order within a
  * block and mirroring chromaprint-style energy-band signs without a
  * float FFT (which could not face a bit-exact cross-engine oracle).
  *
  * Scale: identical shape to C12b — banding into 4×16-bit buckets, one
  * shuffle on (band, value), first-equal-band map-side dedup, exact
  * Hamming only on candidates. Raw audio bytes are touched once at
  * fingerprint build; the pair join moves 64-char strings.
  */
object AudioDedup {

  val NumBlocks = 64
  val BlockLen = 16
  val NumSamples: Int = NumBlocks * BlockLen
  val SampleRate = 8000f
  val NumGroups = 50
  val NumBands = 4
  val BandBits: Int = NumBlocks / NumBands // 16
  val HammingThreshold = 10
  /** Amplitude unit: block amplitudes (0..255) scale by 64 to use the
    * int16 range; the factor cancels in the energy comparison.
    */
  val AmpUnit = 64

  /** Block amplitude a(doc, b) ∈ [0, 255]: first md5 hex pair of the
    * group-keyed block name, +64 (mod 256) on up to (doc_id % 4)
    * perturbed blocks — mirrored verbatim in the oracle.
    */
  def blockAmp(docId: Long, block: Int): Int = {
    val base = Integer.parseInt(
      BandedPairs.md5Hex(s"aud_${docId % NumGroups}_$block").substring(0, 2), 16)
    val perturbed = (0 until (docId % 4).toInt)
      .exists(t => (docId * 7 + t * 13) % NumBlocks == block)
    (base + (if (perturbed) 64 else 0)) % 256
  }

  private val corpusSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** The derived audio corpus: one real WAV per document (mono 16-bit
    * signed little-endian PCM through the JDK writer), batched
    * mapPartitions kernel per the C12 plumbing contract. Sample t of
    * block b is ±(a(doc,b)·AmpUnit), sign alternating per sample.
    */
  def audioCorpus(documents: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(corpusSchema)
    val spark = documents.sparkSession
    // The encode kernel is CPU-bound (~7.5ms/clip through the javax.sound
    // writer+reader); a small parquet input arrives as ONE partition and
    // would serialize the whole corpus into one task (measured: 31s for
    // 5k clips on one core vs ~1.5s spread across 32). Repartitioning
    // the 8-byte doc_id frame costs a negligible shuffle and is exactly
    // what a real cluster does before a per-row codec stage.
    documents.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val pcm = new Array[Byte](NumSamples * 2)
          var t = 0
          while (t < NumSamples) {
            val amp = blockAmp(id, t / BlockLen) * AmpUnit
            val s = (if (t % 2 == 0) amp else -amp).toShort
            pcm(2 * t) = (s & 0xff).toByte
            pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
            t += 1
          }
          val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
          val ais = new AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, NumSamples.toLong)
          val bos = new ByteArrayOutputStream()
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
          Row(id, bos.toByteArray)
        }
      }(enc)
  }

  /** 64-bit energy-sign fingerprint from a REAL decode: JDK WAV reader
    * back to int16 samples, per-block Σs² in exact longs,
    * bit = 64·E_b > ΣE. None for undecodable or wrong-shape payloads.
    */
  def fingerprint64(payload: Array[Byte]): Option[String] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getChannels != 1 || fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) return None
        val buf = new Array[Byte](NumSamples * 2)
        var off = 0
        var n = ais.read(buf, 0, buf.length)
        while (n > 0 && off + n < buf.length) { off += n; n = ais.read(buf, off, buf.length - off) }
        val read = if (n > 0) off + n else off
        if (read != NumSamples * 2) return None
        // wrong-shape contract: a LONGER clip must quarantine too, not
        // silently fingerprint its first 1024 samples (two long clips
        // sharing a prefix would dedup as identical)
        if (ais.read(new Array[Byte](2)) > 0) return None
        val energies = new Array[Long](NumBlocks)
        var total = 0L
        var t = 0
        while (t < NumSamples) {
          val lo = buf(2 * t) & 0xff
          val s: Long =
            if (fmt.isBigEndian) ((buf(2 * t) << 8) | (buf(2 * t + 1) & 0xff)).toShort.toLong
            else ((buf(2 * t + 1) << 8) | lo).toShort.toLong
          val e = s * s
          energies(t / BlockLen) += e
          total += e
          t += 1
        }
        val sb = new StringBuilder(NumBlocks)
        var b = 0
        while (b < NumBlocks) {
          sb.append(if (energies(b) * NumBlocks > total) '1' else '0')
          b += 1
        }
        Some(sb.toString)
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Stateless payload→fingerprint kernel over any (idCol: Long,
    * payload: binary) frame — pure mapPartitions + filter, no persist,
    * no shuffle, so it runs UNCHANGED on batch and STREAMING frames
    * (the [[ImageDedup.phashPayloads]] contract; undecodable payloads
    * quarantine in the null filter).
    */
  def fpPayloads(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("afp", StringType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), fingerprint64(r.getAs[Array[Byte]](1)).orNull)
        }
      }(enc)
      .filter(col("afp").isNotNull)
  }

  /** (doc_id, 64-char fingerprint) via the batched decode kernel;
    * persisted for the band self-join branches.
    */
  def audioFingerprint(documents: DataFrame): DataFrame =
    GraftCache.persistTracked(fpPayloads(audioCorpus(documents)))

  /** C12c: near-duplicate audio pairs — the shared [[BandedPairs]]
    * machinery (see there for the recall contract past numBands − 1
    * differing bits).
    */
  def audioFingerprintPairs(documents: DataFrame): DataFrame =
    BandedPairs.pairs(audioFingerprint(documents), "doc_id", "afp",
      NumBands, BandBits, HammingThreshold)

  /** Oracle: block energies from the amplitude function directly (the
    * 16·AmpUnit² factor cancels in the 64·E_b > ΣE compare), then the
    * same banding and verify; DISTINCT replaces the first-equal-band
    * projection (same pair set).
    */
  val audioFingerprintPairsSql: String = {
    val hex2 = TextOps.hexPrefixValSql(
      s"md5('aud_' || CAST(doc_id % $NumGroups AS VARCHAR) || '_' || CAST(b AS VARCHAR))", 2)
    s"""WITH blocks AS (
       |  SELECT doc_id, b FROM documents, range(0, $NumBlocks) rb(b)),
       |amp AS (
       |  SELECT doc_id, b,
       |    ($hex2
       |     + CASE WHEN len(list_filter(range(0, CAST(doc_id % 4 AS INT)),
       |         t -> (doc_id * 7 + t * 13) % $NumBlocks = b)) > 0
       |       THEN 64 ELSE 0 END) % 256 AS a
       |  FROM blocks),
       |tot AS (SELECT doc_id, sum(a * a) AS s FROM amp GROUP BY 1),
       |bits AS (
       |  SELECT amp.doc_id, amp.b,
       |    CASE WHEN $NumBlocks * amp.a * amp.a > tot.s THEN '1' ELSE '0' END AS bit
       |  FROM amp JOIN tot ON amp.doc_id = tot.doc_id),
       |h AS (
       |  SELECT doc_id, string_agg(bit, '' ORDER BY b) AS afp
       |  FROM bits GROUP BY 1),
       |${BandedPairs.pairsSqlTail("h", "afp", NumBlocks,
            NumBands, BandBits, HammingThreshold)}""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_fingerprint" -> ((s, d) => audioFingerprintPairs(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_audio_fingerprint" -> audioFingerprintPairsSql)
}
