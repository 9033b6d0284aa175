package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** HTML/markup text extraction — the front door of a crawl-corpus
  * pipeline. Every curation operator downstream (C45 line dedup, C23
  * quality rules, the dedup family) assumes clean `text`; a real crawl
  * delivers markup, so the engine needs the extraction pass that turns
  * it into that clean text: drop non-content machinery (head, script,
  * style), strip tags, and remove BOILERPLATE blocks by link density —
  * the classic content-extraction heuristic (Kohlschütter et al.,
  * WSDM 2010: boilerplate text is dominated by anchor text; body prose
  * is not).
  *
  * Spark-first shape: the whole pass is codegen'd string expressions —
  * regexp_replace / split / posexplode / regexp_extract_all — one
  * narrow map stage plus ONE doc_id-keyed aggregation to reassemble
  * kept blocks in document order. No UDFs, no collects; at 100 TB the
  * pass is embarrassingly parallel over the scan with a single shuffle
  * keyed on doc_id (and even that disappears if the corpus is already
  * laid out by doc_id).
  *
  * Determinism/oracle: link density is compared in exact integers
  * (3·link_chars ≤ text_chars, i.e. density ≤ 1/3 — nav/footer rows of
  * links sit far above, prose with an inline citation far below), and
  * block reassembly orders by the block's position, so the DuckDB
  * mirror ([[htmlExtractSql]]) hash-matches bit-for-bit.
  *
  * The reference pipeline scrapes rendered profile fields and never
  * parses markup (instagram_scraper.py hands structured fields to the
  * DB), so this lens has no reference query to mirror; it exists for
  * the crawl-scale curation surface the brief's LLM-pipeline section
  * asks for.
  */
object Html {

  /** Block-level link-density threshold as an exact rational: keep a
    * block iff `DensityNum * link_chars <= DensityDen * text_chars`
    * (⅓ — boilerplate link rows measure ≳ 0.5, prose ≲ 0.1).
    */
  val DensityNum = 3
  val DensityDen = 1

  /** Strip the document head and any script/style blocks — the
    * machinery no extractor should ever surface as text. Non-greedy
    * spans with (?s) so a block can contain newlines; the same RE2-safe
    * subset DuckDB runs.
    */
  private def dropMachinery(html: Column): Column = {
    val noHead = regexp_replace(html, "(?s)<head>.*?</head>", " ")
    val noScript = regexp_replace(noHead, "(?s)<script[^>]*>.*?</script>", " ")
    regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
  }

  /** Extract clean text from an HTML column: drop head/script/style,
    * split into `</div>`-delimited blocks, strip tags, and keep only
    * blocks whose anchor-text share is at most ⅓ — reassembled in
    * document order as `clean_text`, with per-doc keep/drop telemetry.
    * Output: (doc_id, clean_text, n_kept, n_dropped, boiler_chars).
    *
    * Shape: a document's blocks never leave its row — the whole pass is
    * higher-order array expressions (split → transform → filter →
    * array_join) in ONE projection, so the plan has ZERO Exchanges
    * (PlanSpec pins this): at 100 TB extraction is pure scan
    * throughput, and the same body runs stateless on a streaming frame
    * ([[graft.streaming.EventStream.streamingHtmlExtract]]) in append
    * mode with no watermark — an aggregation-based formulation would
    * have needed foreachBatch. Block order is array order: document
    * order for free, no sort anywhere.
    */
  def htmlExtract(docs: DataFrame, htmlCol: Column): DataFrame = {
    val parts = transform(
      split(dropMachinery(htmlCol), "</div>"),
      b => {
        val btxt = trim(regexp_replace(
          regexp_replace(b, "<[^>]*>", " "), "\\s+", " "))
        val linkChars = length(array_join(
          regexp_extract_all(b, lit("(?s)<a [^>]*>(.*?)</a>"), lit(1)), ""))
        struct(
          btxt.as("btxt"),
          (btxt =!= "" &&
            lit(DensityNum) * linkChars <= lit(DensityDen) * length(btxt)).as("keep"))
      })
    // STAGED projections, not one: lambda-bearing subtrees are exempt
    // from codegen subexpression elimination, so a single Project that
    // names `parts` in five output columns re-runs the whole
    // regex-extraction transform five times per row. Aliasing it once
    // per stage makes CollapseProject keep the stages separate (a
    // non-cheap alias referenced more than once is never inlined) —
    // the regex pass runs exactly once per document.
    docs.select(col("doc_id"), parts.as("parts"))
      .select(
        col("doc_id"),
        filter(col("parts"), p => p.getField("keep")).as("kept"),
        filter(col("parts"), p => !p.getField("keep")).as("dropped"))
      .select(
        col("doc_id"),
        array_join(transform(col("kept"), p => p.getField("btxt")), " ").as("clean_text"),
        size(col("kept")).cast("long").as("n_kept"),
        size(filter(col("dropped"), p => p.getField("btxt") =!= ""))
          .cast("long").as("n_dropped"),
        aggregate(col("dropped"), lit(0L),
          (acc, p) => acc + length(p.getField("btxt"))).as("boiler_chars"))
  }

  /** The planted-markup corpus: `documents` wrapped in a deterministic
    * page skeleton — head with title/style/script, a pure-link nav div
    * (boilerplate), the document text as the main div (every third doc
    * gets an inline citation link, which must NOT trip the boilerplate
    * rule), and a link-heavy footer div. Exercises every drop path
    * (head, script, nav/footer by density) and the keep path with and
    * without anchors, while staying a pure string expression both
    * engines evaluate identically.
    */
  private[graft] def plantedHtml: Column =
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>p{margin:0}</style><script>var a=1;</script></head><body>"),
      lit("<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a></div>"),
      lit("<div id=\"main\"><p>"), col("text"),
      when(pmod(col("doc_id"), lit(3L)) === 0L,
        lit(" See <a href=\"/ref\">reference</a>")).otherwise(lit("")),
      lit("</p></div>"),
      lit("<div id=\"footer\">(c) 2024 <a href=\"/terms\">Terms</a> " +
        "<a href=\"/privacy\">Privacy</a><script>track();</script></div>"),
      lit("</body></html>"))

  private[graft] val plantedHtmlSql: String =
    """'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |'</title><style>p{margin:0}</style><script>var a=1;</script></head><body>' ||
      |'<div id="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>' ||
      |'<div id="main"><p>' || text ||
      |CASE WHEN doc_id % 3 = 0 THEN ' See <a href="/ref">reference</a>' ELSE '' END ||
      |'</p></div>' ||
      |'<div id="footer">(c) 2024 <a href="/terms">Terms</a> <a href="/privacy">Privacy</a><script>track();</script></div>' ||
      |'</body></html>'""".stripMargin

  /** Oracle: the identical synthesis + extraction in DuckDB SQL — same
    * RE2-compatible patterns (with the 'g' flag DuckDB needs for
    * replace-all), same integer density rule, `string_agg ... ORDER BY
    * pos` mirroring the array_sort reassembly.
    */
  def htmlExtractSql: String =
    s"""WITH h AS (SELECT doc_id, $plantedHtmlSql AS html FROM documents),
       |m AS (SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(html,
       |    '(?s)<head>.*?</head>', ' ', 'g'),
       |    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
       |    '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS body FROM h),
       |p AS (SELECT doc_id, string_split(body, '</div>') AS parts FROM m),
       |i AS (SELECT doc_id, parts, unnest(range(1, len(parts) + 1)) AS pos1 FROM p),
       |b AS (SELECT doc_id, pos1 - 1 AS pos,
       |  trim(regexp_replace(regexp_replace(parts[pos1],
       |    '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')) AS btxt,
       |  CAST(coalesce(len(array_to_string(regexp_extract_all(parts[pos1],
       |    '(?s)<a [^>]*>(.*?)</a>', 1), '')), 0) AS BIGINT) AS link_chars
       |  FROM i),
       |k AS (SELECT doc_id, pos, btxt, link_chars,
       |  btxt <> '' AND $DensityNum * link_chars <= $DensityDen * len(btxt) AS keep
       |  FROM b)
       |SELECT doc_id,
       |  coalesce(string_agg(btxt, ' ' ORDER BY pos) FILTER (WHERE keep), '') AS clean_text,
       |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       |  CAST(count(*) FILTER (WHERE NOT keep AND btxt <> '') AS BIGINT) AS n_dropped,
       |  CAST(coalesce(sum(len(btxt)) FILTER (WHERE NOT keep), 0) AS BIGINT) AS boiler_chars
       |FROM k GROUP BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> ((s, d) =>
      htmlExtract(Tables.documents(s, d), plantedHtml)))

  def oracle: Map[String, String] = Map(
    "q_html_extract" -> htmlExtractSql)
}
