package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC-shaped crawl ingest (SURVEY.md §2 C68) — the front door BEFORE
  * the front door: real crawl corpora arrive as WARC container files
  * (ISO 28500 — Common Crawl's format), not as clean parquet text
  * columns, so the very first distributed step of a 100 TB pipeline is
  * splitting concatenated WARC records and recovering (url, headers,
  * payload) rows that C60's HTML extraction can consume. The reference
  * pipeline scrapes via a live browser and never touches archive
  * files; this lens exists for the brief's LLM-pipeline surface.
  *
  * Format (public spec): each record is `WARC/1.0\r\n` + header lines
  * (`Name: value\r\n`) + `\r\n` + exactly Content-Length payload bytes
  * + `\r\n\r\n`. Because payloads are LENGTH-framed, a payload may
  * contain anything — including the record magic and blank lines — and
  * the splitter must not be fooled; that is the property the fuzz suite
  * pins and the reason naive delimiter splitting is wrong.
  *
  * Parser contract (the multimodal codec rule): never throws, never
  * loops — a malformed header block or an out-of-bounds Content-Length
  * abandons that candidate and RESYNCS at the next magic, so one
  * corrupt record cannot take down the intact records after it.
  *
  * Scale: records are synthesized/parsed inside `mapPartitions` — the
  * one place imperative byte-walking belongs (the Multimodal
  * convention: a length-framed binary scan cannot be a Catalyst
  * expression) — embarrassingly parallel, one WARC blob per row, no
  * shuffle beyond the grouping that builds multi-record files. The
  * registered query round-trips documents → planted HTML → WARC blobs
  * (8 records per file) → split → rows, and the DuckDB oracle
  * reconstructs the expected rows directly — so the hash-compare pins
  * that the splitter inverts the writer bit-exactly, Content-Length
  * framing included (the C12b codec-roundtrip trick).
  */
object Warc {

  val Magic = "WARC/1.0"
  val RecordsPerFile = 8L

  final case class WarcRecord(headers: Seq[(String, String)], payload: Array[Byte])

  /** Encode one record with a deterministic header set (fixed order —
    * determinism is what lets the oracle reconstruct byte counts).
    */
  def encodeRecord(targetUri: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append(Magic).append("\r\n")
    sb.append("WARC-Type: response\r\n")
    sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    sb.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
    sb.append("Content-Type: text/html\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  def encodeFile(records: Seq[(String, Array[Byte])]): Array[Byte] =
    records.map { case (uri, p) => encodeRecord(uri, p) }
      .foldLeft(Array.emptyByteArray)(_ ++ _)

  private val MagicBytes = Magic.getBytes(UTF_8)

  private def indexOfMagic(bytes: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = bytes.length - MagicBytes.length
    while (i <= last) {
      var j = 0
      while (j < MagicBytes.length && bytes(i + j) == MagicBytes(j)) j += 1
      if (j == MagicBytes.length) return i
      i += 1
    }
    -1
  }

  /** Split a blob into its intact records. Total work is O(n): the scan
    * position strictly advances — a rejected candidate resumes the
    * magic search one byte past the candidate's magic.
    */
  def parseRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    while (pos >= 0 && pos < bytes.length) {
      val at = indexOfMagic(bytes, pos)
      if (at < 0) pos = bytes.length
      else {
        parseOne(bytes, at) match {
          case Some((rec, next)) => out += rec; pos = next
          case None => pos = at + 1 // resync past a malformed candidate
        }
      }
    }
    out.result()
  }

  /** One candidate record starting at the magic offset: header lines to
    * the blank line (each needing ": "), a parseable in-bounds
    * Content-Length, then the framed payload. Any violation → None.
    */
  /** Header-block byte cap per candidate: spec headers are tiny, and
    * WITHOUT a cap an adversarial blob (many magics in front of a huge
    * CRLF-less run) makes every candidate rescan the run — O(n²) total.
    * With it, a rejected candidate costs O(MaxHeaderBytes) and the scan
    * stays linear.
    */
  val MaxHeaderBytes = 8192

  private def parseOne(bytes: Array[Byte], at: Int): Option[(WarcRecord, Int)] = {
    val headerLimit = math.min(bytes.length.toLong, at.toLong + MaxHeaderBytes).toInt
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < headerLimit && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < headerLimit) i else -1
    }
    var p = at + MagicBytes.length
    if (p + 1 >= bytes.length || bytes(p) != '\r' || bytes(p + 1) != '\n') return None
    p += 2
    val headers = Seq.newBuilder[(String, String)]
    var done = false
    while (!done) {
      val e = lineEnd(p)
      if (e < 0) return None
      if (e == p) { done = true; p += 2 } // the blank line
      else {
        val line = new String(bytes, p, e - p, UTF_8)
        val cut = line.indexOf(": ")
        if (cut <= 0) return None
        headers += line.substring(0, cut) -> line.substring(cut + 2)
        p = e + 2
      }
    }
    val hs = headers.result()
    val len = hs.collectFirst { case ("Content-Length", v) => v }
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(-1)
    // Long arithmetic: a near-Int.MaxValue Content-Length would wrap
    // p + len + 4 negative and sneak past the bound, breaking the
    // never-throws resync contract on adversarial records.
    if (len < 0 || p.toLong + len + 4 > bytes.length) return None
    val payload = java.util.Arrays.copyOfRange(bytes, p, p + len)
    val t = p + len
    if (bytes(t) != '\r' || bytes(t + 1) != '\n' ||
      bytes(t + 2) != '\r' || bytes(t + 3) != '\n') return None
    Some((WarcRecord(hs, payload), t + 4))
  }

  // ------------------------------------------------- Spark plumbing

  private val fileSchema = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))

  private val recordSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("html", StringType, nullable = false)))

  def urlFor(docId: Long): String = s"https://example.org/doc/$docId"

  /** Synthesize multi-record WARC files from (doc_id, html) rows —
    * [[RecordsPerFile]] records per blob, record order = doc order.
    */
  def warcFiles(docsHtml: DataFrame): Dataset[Row] =
    docsHtml
      .groupBy(expr(s"doc_id div $RecordsPerFile").as("file_id"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("html")))).as("recs"))
      .mapPartitions { rows =>
        rows.map { r =>
          val recs = r.getSeq[Row](1).map(x => (urlFor(x.getLong(0)),
            x.getString(1).getBytes(UTF_8)))
          Row(r.getLong(0), encodeFile(recs))
        }
      }(RowEncoder.encoderFor(fileSchema))

  /** Split WARC blobs into (doc_id, url, content_length, html) rows —
    * the doc identity recovered ONLY from the parsed WARC-Target-URI,
    * as a real ingest must.
    */
  def splitWarc(files: Dataset[Row]): DataFrame = {
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        parseRecords(r.getAs[Array[Byte]](1)).flatMap { rec =>
          rec.headers.collectFirst { case ("WARC-Target-URI", u) => u }.flatMap { u =>
            scala.util.Try(u.substring(u.lastIndexOf('/') + 1).toLong).toOption
              .map(id => Row(id, u, rec.payload.length.toLong,
                new String(rec.payload, UTF_8)))
          }
        }
      }
    }(RowEncoder.encoderFor(recordSchema))
  }

  /** C68's registered query: documents → planted HTML (C60's corpus) →
    * WARC files → split → rows; oracle reconstructs the rows directly,
    * pinning writer∘splitter == identity through the length framing.
    */
  def warcIngest(documents: DataFrame): DataFrame =
    splitWarc(warcFiles(documents
      .select(col("doc_id"), graft.operators.Html.plantedHtml.as("html"))))

  val warcIngestSql: String =
    s"""SELECT doc_id,
       |  'https://example.org/doc/' || CAST(doc_id AS VARCHAR) AS url,
       |  CAST(octet_length(CAST(${graft.operators.Html.plantedHtmlSql} AS BLOB)) AS BIGINT) AS content_length,
       |  ${graft.operators.Html.plantedHtmlSql} AS html
       |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_warc_ingest" -> ((s, d) => warcIngest(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_warc_ingest" -> warcIngestSql)
}
