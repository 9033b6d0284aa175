package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exprs
import graft.sources.Tables

/** Corpus-hygiene operators a crawl-scale pipeline runs before any
  * dedup or quality pass: Unicode normalization (C62) and URL/domain
  * curation (C63).
  *
  * Both are upstream of the hash-dedup family on purpose — the SAME
  * logical text arriving as precomposed vs combining-mark codepoints
  * (or with zero-width/BOM litter from different crawlers) fingerprints
  * apart in C1/C2/C3 unless this pass runs first, and per-domain caps
  * are how production corpora (C4, RefinedWeb) stop one mega-site from
  * dominating the token budget.
  *
  * The reference pipeline stores scraped profile text verbatim and has
  * no normalization or domain layer (instagram_scraper.py hands raw
  * fields to postgres); these lenses exist for the brief's LLM-pipeline
  * surface, shaped like the rest of the curation family.
  *
  * All non-ASCII codepoints in this file are written as \u escapes —
  * an invisible ZWSP in a source literal is exactly the bug this
  * operator removes.
  */
object Curation {

  // ---------------------------------------------------------------- C62

  /** Characters the cleanup strips outright: zero-width space (U+200B),
    * BOM / zero-width no-break space (U+FEFF), soft hyphen (U+00AD) —
    * invisible litter that breaks tokenization and fingerprinting but
    * carries no content.
    */
  val StripClass = "[\u200B\uFEFF\u00AD]"

  /** Planted dirt: a deterministic per-doc suffix cycling through the
    * classic normalization hazards — combining acute (e+U+0301 → é),
    * combining ring above + NBSP (A+U+030A → Å), the OHM-sign singleton
    * (U+2126 → U+03A9 Ω), combining diaeresis (o+U+0308 → ö) — each
    * salted with an invisible (ZWSP / BOM / soft hyphen); every 5th doc
    * stays clean so the `changed` flag exercises both values. Mirrored
    * codepoint-for-codepoint by `chr()` concatenation in the oracle.
    */
  private[graft] def plantedDirty: Column = {
    val m = pmod(col("doc_id"), lit(5L))
    concat(
      col("text"),
      when(m === 0L, lit(" e\u0301\u200B"))
        .when(m === 1L, lit(" A\u030A\u00A0x"))
        .when(m === 2L, lit(" \u2126\u00AD"))
        .when(m === 3L, lit(" o\u0308\uFEFF"))
        .otherwise(lit("")))
  }

  /** C62: Unicode text normalization — strip invisibles (ZWSP/BOM/soft
    * hyphen), map NBSP (U+00A0) to plain space, then NFC-compose via
    * the native [[graft.functions.Exprs.NfcNormalize]] expression. One
    * codegen'd projection, ZERO exchanges (PlanSpec pins it): at 100 TB
    * this is scan throughput, and the identical body runs stateless on
    * a stream ([[graft.streaming.EventStream.streamingTextNormalize]]).
    *
    * Output: (doc_id, norm_text, n_raw, n_norm, changed) — the length
    * columns are code-point counts (Spark `length` == DuckDB `len`),
    * so `changed` doubles as a cheap corpus-dirt-rate telemetry column.
    */
  def textNormalize(docs: DataFrame, dirty: Column): DataFrame = {
    val stripped = regexp_replace(dirty, StripClass, "")
    val spaced = translate(stripped, "\u00A0", " ")
    val norm = Exprs.nfc(spaced)
    docs.select(
      col("doc_id"),
      norm.as("norm_text"),
      length(dirty).cast("long").as("n_raw"),
      length(norm).cast("long").as("n_norm"),
      (length(norm) < length(dirty)).as("changed"))
  }

  /** Oracle: identical strip/space/NFC pipeline in DuckDB —
    * `nfc_normalize` is utf8proc's NFC, byte-identical to the JDK's on
    * every assigned codepoint (canonical composition is frozen by the
    * Unicode stability policy; CurationSpec pins the planted set); the
    * strip class is built from the same codepoints via chr():
    * 769=U+0301, 778=U+030A, 776=U+0308, 8486=U+2126, 8203=U+200B,
    * 65279=U+FEFF, 173=U+00AD, 160=U+00A0.
    */
  def textNormalizeSql: String =
    """WITH d AS (SELECT doc_id,
      |  text || CASE doc_id % 5
      |    WHEN 0 THEN ' e' || chr(769) || chr(8203)
      |    WHEN 1 THEN ' A' || chr(778) || chr(160) || 'x'
      |    WHEN 2 THEN ' ' || chr(8486) || chr(173)
      |    WHEN 3 THEN ' o' || chr(776) || chr(65279)
      |    ELSE '' END AS dirty FROM documents),
      |n AS (SELECT doc_id, dirty,
      |  nfc_normalize(replace(regexp_replace(dirty,
      |    '[' || chr(8203) || chr(65279) || chr(173) || ']', '', 'g'),
      |    chr(160), ' ')) AS norm_text FROM d)
      |SELECT doc_id, norm_text,
      |  CAST(len(dirty) AS BIGINT) AS n_raw,
      |  CAST(len(norm_text) AS BIGINT) AS n_norm,
      |  len(norm_text) < len(dirty) AS changed
      |FROM n""".stripMargin

  // ---------------------------------------------------------------- C63

  /** Per-host document cap. */
  val HostCap = 3

  /** The planted domain blocklist — in production a broadcast dim table
    * of abuse/spam/opt-out domains; here a fixed triple so the anti-join
    * path is exercised deterministically.
    */
  val Blocklist: Seq[String] =
    Seq("src0-0.example.com", "src1-3.example.com", "src7-2.example.com")

  /** Deterministic URL synthesis: `documents` carries no URL column, so
    * the lens derives one from (source, doc_id) — ~7 hosts per source,
    * several docs per host at every SF. Mirrored verbatim in SQL.
    */
  private[graft] def plantedUrl: Column =
    concat(
      lit("https://"), col("source"), lit("-"),
      pmod(col("doc_id"), lit(7L)).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"))

  /** C63: URL/domain curation — extract the host, drop blocklisted
    * domains, and keep at most [[HostCap]] docs per host (smallest
    * doc_id first, the deterministic "first crawled wins" rule).
    *
    * Scale shape: the blocklist is a BROADCAST anti-join (a few
    * thousand rows against the corpus — never a shuffle), and the cap
    * is the bounded [[graft.functions.Exprs.MinKLong]] heap aggregate,
    * NOT `row_number() OVER (PARTITION BY host)`: a mega-site with 10⁹
    * pages costs K longs of aggregation state instead of an
    * unsplittable 10⁹-row sort task, partials merge map-side, and the
    * shuffle moves O(hosts·K) ids. Output: (doc_id, host, host_rank).
    */
  /** The reusable core over any (doc_id, host) frame: broadcast
    * blocklist anti-join, then the bounded-heap per-host cap. The
    * registered query wraps it with the planted URL synthesis.
    */
  def hostCap(
      withHost: DataFrame,
      blocklist: Seq[String] = Blocklist,
      cap: Int = HostCap): DataFrame = {
    val spark = withHost.sparkSession
    import spark.implicits._
    val block = blocklist.toDF("host")
    withHost
      .join(broadcast(block), Seq("host"), "left_anti")
      .groupBy("host")
      .agg(Exprs.minK(col("doc_id"), cap).as("ids"))
      .select(col("host"), posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select(
        col("doc_id"),
        col("host"),
        (col("pos") + 1).cast("long").as("host_rank"))
  }

  def urlHostCap(docs: DataFrame, cap: Int = HostCap): DataFrame =
    hostCap(
      docs.select(
        col("doc_id"),
        regexp_extract(plantedUrl, "^https://([^/]+)/", 1).as("host")),
      Blocklist, cap)

  /** Oracle: same synthesis + host regex; the cap expressed as the
    * row_number window DuckDB runs comfortably at test SF (the Spark
    * side deliberately does NOT use that plan — see [[urlHostCap]]).
    */
  def urlHostCapSql: String = {
    val blocked = Blocklist.map(h => s"'$h'").mkString(", ")
    s"""WITH u AS (SELECT doc_id,
       |  'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR) ||
       |  '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents),
       |h AS (SELECT doc_id,
       |  regexp_extract(url, '^https://([^/]+)/', 1) AS host FROM u
       |  WHERE regexp_extract(url, '^https://([^/]+)/', 1) NOT IN ($blocked)),
       |r AS (SELECT doc_id, host,
       |  row_number() OVER (PARTITION BY host ORDER BY doc_id) AS host_rank FROM h)
       |SELECT doc_id, host, CAST(host_rank AS BIGINT) AS host_rank
       |FROM r WHERE host_rank <= $HostCap""".stripMargin
  }

  // ---------------------------------------------------------------- C82

  /** Deterministic MESSY URL synthesis — the same page reached through
    * the representational noise real crawls carry: upper/lower scheme
    * and host case, a `www.` prefix, an explicit default port,
    * duplicated and trailing slashes, tracking parameters in varying
    * order, and a fragment. doc_id % 10 is the page key, so several
    * docs per (source, page) arrive as DIFFERENT strings naming the
    * SAME resource. Mirrored verbatim in SQL.
    */
  private[graft] def plantedMessyUrl: Column =
    concat(
      when(pmod(col("doc_id"), lit(2L)) === 0L, lit("HTTPS://")).otherwise(lit("https://")),
      when(pmod(col("doc_id"), lit(3L)) === 0L, lit("WWW.")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(4L)) === 0L, upper(col("source"))).otherwise(col("source")),
      lit(".Example.COM"),
      when(pmod(col("doc_id"), lit(2L)) === 0L, lit(":443")).otherwise(lit("")),
      lit("/p//"),
      pmod(col("doc_id"), lit(10L)).cast("string"),
      when(pmod(col("doc_id"), lit(2L)) === 1L, lit("/")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(3L)) === 0L, lit("?utm_source=feed&ref=1"))
        .when(pmod(col("doc_id"), lit(3L)) === 1L, lit("?ref=1&utm_campaign=x"))
        .otherwise(lit("?ref=1")),
      when(pmod(col("doc_id"), lit(5L)) === 0L, lit("#section")).otherwise(lit("")))

  /** RFC-3986-style URL canonicalization as one codegen projection —
    * the crawl-dedup prep stage every CommonCrawl-scale pipeline runs
    * BEFORE content dedup (the same page re-crawled through referral
    * links, session params, or a www alias would otherwise be fetched
    * and fingerprinted once per spelling): lowercase scheme+host, strip
    * `www.` and the https default port, collapse duplicate slashes,
    * strip the trailing slash (root kept), drop `utm_*` tracking
    * params, SORT the surviving query params (order never identifies a
    * resource), drop the fragment. Pure builtin regexp/array
    * expressions — engine-portable, whole-stage codegen, zero shuffle.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
        "^www\\.", ""),
      ":443$", "")
    val path1 = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/{2,}", "/")
    val path = when(path1 === "", lit("/"))
      .otherwise(regexp_replace(path1, "(.)/$", "$1"))
    val params = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** C82: URL canonicalization + canonical-URL dedup — (doc_id, url,
    * canon_url, keep_id, is_dup) with keep_id the smallest doc_id
    * sharing the canonical form ("first crawled wins", C41's rule).
    * The canonicalizer rides the scan; the keeper pick is a
    * groupBy(canon).min + join-back — the skew-safe two-phase shape
    * ([[Dedup.capBands]]'s reasoning: a mega-page crawled 10⁸ times is
    * absorbed by map-side partials, and AQE can skew-split the join,
    * never a window partition).
    */
  def urlCanonicalize(docs: DataFrame): DataFrame = {
    val canon = docs
      .select(col("doc_id"), plantedMessyUrl.as("url"))
      .withColumn("canon_url", canonicalizeUrl(col("url")))
    val keepers = canon.groupBy("canon_url").agg(min("doc_id").as("keep_id"))
    canon.join(keepers, "canon_url")
      .select(col("doc_id"), col("url"), col("canon_url"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).as("is_dup"))
  }

  val urlCanonicalizeSql: String =
    """WITH u AS (SELECT doc_id,
      |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
      |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
      |  (CASE WHEN doc_id % 4 = 0 THEN upper(source) ELSE source END) ||
      |  '.Example.COM' ||
      |  (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END) ||
      |  '/p//' || CAST(doc_id % 10 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
      |  (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=1'
      |        WHEN doc_id % 3 = 1 THEN '?ref=1&utm_campaign=x'
      |        ELSE '?ref=1' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN '#section' ELSE '' END) AS url
      |  FROM documents),
      |c AS (SELECT doc_id, url,
      |  lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
      |  regexp_replace(regexp_replace(
      |    lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
      |    '^www\.', ''), ':443$', '') ||
      |  (CASE WHEN regexp_replace(regexp_extract(url,
      |           '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/{2,}', '/', 'g') = ''
      |        THEN '/'
      |        ELSE regexp_replace(regexp_replace(regexp_extract(url,
      |           '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/{2,}', '/', 'g'),
      |           '(.)/$', '\1') END) ||
      |  (CASE WHEN array_to_string(list_sort(list_filter(
      |          string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |          p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') = ''
      |        THEN ''
      |        ELSE '?' || array_to_string(list_sort(list_filter(
      |          string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
      |          p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') END)
      |  AS canon_url FROM u),
      |k AS (SELECT canon_url, min(doc_id) AS keep_id FROM c GROUP BY 1)
      |SELECT c.doc_id, c.url, c.canon_url, k.keep_id,
      |  c.doc_id <> k.keep_id AS is_dup
      |FROM c JOIN k USING (canon_url)""".stripMargin

  // ------------------------------------------------- C62b: NFKC fold

  /** C62b (spec-pinned — DuckDB 1.0 has no NFKC, so no SQL oracle, the
    * C58 convention): the AGGRESSIVE normalization for spam-robust
    * dedup KEYS — C62's NFC pass plus NFKC compatibility folding
    * (fullwidth ＡＢＣ, ligature ﬁ, superscript ²) and the fixed
    * cross-script confusable map (Cyrillic/Greek homoglyphs), via the
    * native [[Exprs.NfkcFold]] expression. Evasive duplicates swap a
    * Latin letter for its identical-glyph Cyrillic twin precisely so
    * NFC-normalized fingerprints DON'T match; this pass makes the two
    * spellings C1-fingerprint together. Key derivation only — NFKC is
    * lossy by design, so stored text keeps the C62 output.
    * Shuffle-free scan projection, stateless on streams, like C62.
    */
  def nfkcFoldKeys(docs: DataFrame, text: Column): DataFrame =
    docs.select(
      col("doc_id"),
      Exprs.nfkcFold(
        Exprs.nfc(translate(regexp_replace(text, StripClass, ""), "\u00A0", " ")))
        .as("fold_key"))

  // ------------------------------------------------------------ registry

  // ------------------------------------------------ C70: host-level split

  /** C70: leakage-free train/val/test split at HOST granularity — C35's
    * md5-bucket split re-keyed on the url host. Template pages, site
    * mirrors, and near-duplicates cluster BY SITE, so a doc-keyed split
    * (C35) routinely puts members of the same near-dup cluster on both
    * sides of the train/test fence — the classic web-corpus eval leak;
    * the standard hygiene rule is to carve the split at the host (or
    * domain) level so every page of a site lands in ONE split. Same
    * planted-url synthesis as C63, same two-nibble 240/8/8 carve as
    * C35 under a distinct salt ('hsplit:') so host buckets are
    * independent of doc buckets. The leakage guarantee is BY
    * CONSTRUCTION: split is a pure function of host, which the
    * row-identical oracle hash-compare therefore pins. Scan-shaped —
    * one projection, zero shuffle, zero state; reruns, engines, and
    * partitionings all agree (the C35 determinism contract).
    */
  def hostSplit(docs: DataFrame,
                trainUpto: Int = 240, valUpto: Int = 248): DataFrame =
    docs.select(col("doc_id"),
        regexp_extract(plantedUrl, "^https://([^/]+)/", 1).as("host"))
      .withColumn("bucket",
        expr(TextOps.hexPrefixValSql("md5('hsplit:' || host)", 2)))
      .withColumn("split",
        when(col("bucket") < trainUpto, "train")
          .when(col("bucket") < valUpto, "val")
          .otherwise("test"))

  def hostSplitSql(trainUpto: Int = 240, valUpto: Int = 248): String = {
    val bucket = TextOps.hexPrefixValSql("md5('hsplit:' || host)", 2)
    s"""WITH u AS (SELECT doc_id,
       |  'https://' || source || '-' || CAST(doc_id % 7 AS VARCHAR) ||
       |  '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url FROM documents),
       |h AS (SELECT doc_id,
       |  regexp_extract(url, '^https://([^/]+)/', 1) AS host FROM u),
       |b AS (SELECT doc_id, host, $bucket AS bucket FROM h)
       |SELECT doc_id, host, bucket,
       |  CASE WHEN bucket < $trainUpto THEN 'train'
       |       WHEN bucket < $valUpto THEN 'val'
       |       ELSE 'test' END AS split
       |FROM b""".stripMargin
  }

  // --------------------------------------------- C75: mojibake repair

  /** The clean suffix every doc gets (Latin-1 letters é ï ñ ü — chars
    * whose Latin-1 re-encoding is INVALID UTF-8 next to ASCII, the
    * repair guard's negative case), and its single/double UTF-8→Latin-1
    * misdecodes, computed by the real encoding roundtrip at plan build.
    */
  private[graft] val MojiClean = " caf\u00E9 na\u00EFve jalape\u00F1o \u00FCber"
  private[graft] val Moji1 = new String(
    MojiClean.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    java.nio.charset.StandardCharsets.ISO_8859_1)
  private[graft] val Moji2 = new String(
    Moji1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
    java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Planted corruption: every doc carries the suffix; every 3rd doc
    * gets it UTF-8→Latin-1 misdecoded once, every 9th twice (the
    * iterated-repair case). Deterministic, mirrored chr-for-chr in SQL.
    */
  private[graft] def plantedMoji: Column =
    concat(col("text"),
      when(pmod(col("doc_id"), lit(9L)) === 0L, lit(Moji2))
        .when(pmod(col("doc_id"), lit(3L)) === 0L, lit(Moji1))
        .otherwise(lit(MojiClean)))

  /** C75: mojibake detection + repair — the encoding-hygiene pass a real
    * crawl corpus needs BEFORE C62 (a UTF-8→Latin-1 misdecode survives
    * NFC untouched and fingerprints apart from its clean twin in every
    * dedup lens). Detection is the classic 0xC3-lead-byte signature
    * (`Ã` followed by a continuation-range char); repair is the native
    * [[Exprs.FixMojibake]] roundtrip heuristic, iterated for
    * doubly-mangled text.
    *
    * Oracle strategy is the C12b codec-roundtrip trick: the corruption
    * is planted by the REAL encoding roundtrip, so the oracle simply
    * constructs the clean text directly — `fixed_md5` hash-matching
    * pins repair∘corrupt == identity (single and double), and `changed`
    * pins the no-false-repair guard on the clean-but-accented docs.
    * Staged projections (the C60 lesson): `dirty`/`fixed` are each
    * aliased once, so the repair pass runs once per row. Scan-shaped,
    * zero shuffle, stateless on streams.
    */
  def mojibakeRepair(docs: DataFrame, dirty: Column): DataFrame =
    docs.select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"), col("dirty"),
        Exprs.fixMojibake(col("dirty")).as("fixed"))
      .select(col("doc_id"),
        regexp_count(col("dirty"), lit("\u00C3[\u0080-\u00BF]"))
          .cast("long").as("n_moji"),
        md5(col("fixed")).as("fixed_md5"),
        (col("fixed") =!= col("dirty")).as("changed"))

  private def chrConcat(s: String): String =
    s.map(c => s"chr(${c.toInt})").mkString(" || ")

  def mojibakeRepairSql: String =
    s"""WITH d AS (SELECT doc_id, text,
       |  text || CASE WHEN doc_id % 9 = 0 THEN ${chrConcat(Moji2)}
       |    WHEN doc_id % 3 = 0 THEN ${chrConcat(Moji1)}
       |    ELSE ${chrConcat(MojiClean)} END AS dirty
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(dirty,
       |    chr(195) || '[' || chr(128) || '-' || chr(191) || ']')) AS BIGINT)
       |    AS n_moji,
       |  md5(text || ${chrConcat(MojiClean)}) AS fixed_md5,
       |  (doc_id % 3 = 0) AS changed
       |FROM d""".stripMargin

  // ------------------------- C95: markdown code-fence extraction

  /** Deterministically planted markdown (the C60 plantedHtml pattern —
    * the synthetic corpus has no markup, so the query plants it
    * codepoint-for-codepoint mirrorable): a heading, the doc text as
    * prose, one fenced code block whose language tag cycles
    * python/js/sql/untagged on doc_id, the block body = the doc's
    * first six whitespace tokens one-per-line, and for every fifth doc
    * a SECOND bare (untagged) fence — so tagged/untagged and
    * one/two-fence branches all carry rows at every SF.
    */
  private[graft] def plantedMarkdown: org.apache.spark.sql.Column = concat(
    lit("# Doc "), col("doc_id").cast("string"), lit("\n\n"),
    col("text"), lit("\n\n```"),
    when(pmod(col("doc_id"), lit(4L)) === 0L, lit("python"))
      .when(pmod(col("doc_id"), lit(4L)) === 1L, lit("js"))
      .when(pmod(col("doc_id"), lit(4L)) === 2L, lit("sql"))
      .otherwise(lit("")),
    lit("\n"), expr("array_join(slice(split(text, ' '), 1, 6), '\n')"),
    lit("\n```\n\nafter the block more prose follows here\n"),
    when(pmod(col("doc_id"), lit(5L)) === 0L,
      concat(lit("\n```\nraw block "), col("doc_id").cast("string"),
        lit("\n```\n"))).otherwise(lit("")))

  private[graft] val plantedMarkdownSql: String =
    """'# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
      |text || chr(10) || chr(10) || '```' ||
      |CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'python' WHEN 1 THEN 'js'
      |     WHEN 2 THEN 'sql' ELSE '' END || chr(10) ||
      |array_to_string(string_split(text, ' ')[1:6], chr(10)) ||
      |chr(10) || '```' || chr(10) || chr(10) ||
      |'after the block more prose follows here' || chr(10) ||
      |CASE WHEN doc_id % 5 = 0 THEN chr(10) || '```' || chr(10) ||
      |  'raw block ' || CAST(doc_id AS VARCHAR) || chr(10) || '```' || chr(10)
      |  ELSE '' END""".stripMargin

  /** C95: markdown code-fence extraction — the code-corpus prep stage
    * (The Stack / StarCoder shape): pull fenced blocks out of
    * markdown/README-like documents with their language tag, so code
    * routes to the code pipeline (per-language dedup, license scan)
    * and prose to the text one. Fence grammar by SEGMENT PARITY: split
    * on the ``` delimiter — odd segments are inside fences (no regex
    * backtracking over document-sized strings; RE2-safe and
    * O(doc length)), tag = the fence's first line, body = the rest.
    * Output one row per fence: (doc_id, fence_idx, lang_tag, n_lines,
    * n_code_chars). Zero shuffles — synthesis, split, explode, and the
    * line counts are all map-side; at 100 TB this runs at scan speed
    * next to C60's HTML front door.
    */
  def codeFenceExtract(documents: DataFrame,
                       md: org.apache.spark.sql.Column): DataFrame =
    documents
      .select(col("doc_id"), md.as("md"))
      .select(col("doc_id"),
        posexplode(split(col("md"), "```")).as(Seq("pos", "seg")))
      .filter(pmod(col("pos"), lit(2)) === 1)
      .select(
        col("doc_id"),
        ((col("pos") + 1) / 2).cast("long").as("fence_idx"),
        trim(regexp_extract(col("seg"), "^([^\n]*)", 1)).as("lang_tag"),
        // instr = 0 (no newline in the segment: unterminated ``` at
        // EOF, or ```lang with no body) must yield an EMPTY body — the
        // raw substring(seg, 1) would double-count the lang tag as code.
        when(instr(col("seg"), "\n") === 0, lit(""))
          .otherwise(expr("substring(seg, instr(seg, '\n') + 1)"))
          .as("body"))
      .select(col("doc_id"), col("fence_idx"), col("lang_tag"),
        size(filter(split(col("body"), "\n"), l => l =!= lit("")))
          .cast("long").as("n_lines"),
        length(col("body")).cast("long").as("n_code_chars"))

  val codeFenceExtractSql: String =
    s"""WITH m AS (SELECT doc_id, $plantedMarkdownSql AS md FROM documents),
       |p AS (SELECT doc_id, string_split(md, '${"`" * 3}') AS parts FROM m),
       |f AS (SELECT doc_id, u.i AS i, u.s AS s FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, len(parts) + 1),
       |    i -> struct_pack(i := i, s := parts[i]))) AS u FROM p)),
       |b AS (SELECT doc_id, CAST(i // 2 AS BIGINT) AS fence_idx,
       |  trim(regexp_extract(s, '^([^\\n]*)', 1)) AS lang_tag,
       |  CASE WHEN instr(s, chr(10)) = 0 THEN ''
       |       ELSE s[instr(s, chr(10)) + 1:] END AS body
       |  FROM f WHERE i % 2 = 0)
       |SELECT doc_id, fence_idx, lang_tag,
       |  CAST(len(list_filter(string_split(body, chr(10)), l -> l <> ''))
       |    AS BIGINT) AS n_lines,
       |  CAST(len(body) AS BIGINT) AS n_code_chars
       |FROM b""".stripMargin

  // ------------------------------- C96: license scan (code corpora)

  /** Deterministically planted source-file text (the plantedMarkdown
    * discipline): doc_id cycles five license shapes — an SPDX tag
    * (MIT / Apache-2.0), a license BODY phrase with no tag (the MIT
    * grant sentence / the Apache boilerplate line), or nothing — with
    * a copyright line on the even ids, over the doc's own tokens as
    * code body. Every detector branch carries rows at every SF.
    */
  private[graft] def plantedCodeFile: org.apache.spark.sql.Column = concat(
    when(pmod(col("doc_id"), lit(5L)) === 0L,
      lit("// SPDX-License-Identifier: MIT\n"))
      .when(pmod(col("doc_id"), lit(5L)) === 1L,
        lit("// SPDX-License-Identifier: Apache-2.0\n"))
      .when(pmod(col("doc_id"), lit(5L)) === 2L,
        lit("// Permission is hereby granted, free of charge\n"))
      .when(pmod(col("doc_id"), lit(5L)) === 3L,
        lit("// Licensed under the Apache License, Version 2.0\n"))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(2L)) === 0L,
      lit("// Copyright (c) 2024 Example Authors\n")).otherwise(lit("")),
    lit("\nfunction main() {\n  // "), col("text"), lit("\n}\n"))

  private[graft] val plantedCodeFileSql: String =
    """CASE CAST(doc_id % 5 AS INTEGER)
      |  WHEN 0 THEN '// SPDX-License-Identifier: MIT' || chr(10)
      |  WHEN 1 THEN '// SPDX-License-Identifier: Apache-2.0' || chr(10)
      |  WHEN 2 THEN '// Permission is hereby granted, free of charge' || chr(10)
      |  WHEN 3 THEN '// Licensed under the Apache License, Version 2.0' || chr(10)
      |  ELSE '' END ||
      |CASE WHEN doc_id % 2 = 0
      |  THEN '// Copyright (c) 2024 Example Authors' || chr(10) ELSE '' END ||
      |chr(10) || 'function main() {' || chr(10) || '  // ' || text ||
      |chr(10) || '}' || chr(10)""".stripMargin

  /** C96: license scan for code corpora — the compliance gate between
    * C95's fence extraction and training (a code pipeline must route
    * permissively-licensed files in and everything else out, and
    * EVIDENCE the decision): two detector modes like real scanners —
    * the SPDX tag when present (authoritative), else license-body
    * PHRASE matching (the MIT grant sentence, the Apache boilerplate
    * line), else none — plus the copyright-notice flag and the keep
    * verdict under a permissive-only policy. Pure map-side
    * regexp/contains over the file text: scan-speed at 100 TB, no
    * shuffle, no window.
    */
  def licenseScan(documents: DataFrame,
                  code: org.apache.spark.sql.Column): DataFrame = {
    val spdx = regexp_extract(col("code"),
      "SPDX-License-Identifier: ([A-Za-z0-9.+-]+)", 1)
    val lic = when(spdx =!= "", spdx)
      .when(col("code").contains("Permission is hereby granted"), lit("MIT-text"))
      .when(col("code").contains("Licensed under the Apache License"),
        lit("Apache-text"))
      .otherwise(lit("none"))
    documents
      .select(col("doc_id"), code.as("code"))
      .select(col("doc_id"), lic.as("license"),
        col("code").contains("Copyright").as("has_copyright"))
      .withColumn("keep",
        col("license").isin("MIT", "Apache-2.0", "MIT-text", "Apache-text"))
  }

  val licenseScanSql: String =
    s"""WITH c AS (SELECT doc_id, $plantedCodeFileSql AS code FROM documents),
       |d AS (SELECT doc_id,
       |  regexp_extract(code, 'SPDX-License-Identifier: ([A-Za-z0-9.+-]+)', 1)
       |    AS spdx,
       |  contains(code, 'Permission is hereby granted') AS mit_text,
       |  contains(code, 'Licensed under the Apache License') AS apache_text,
       |  contains(code, 'Copyright') AS has_copyright
       |  FROM c)
       |SELECT doc_id,
       |  CASE WHEN spdx <> '' THEN spdx
       |       WHEN mit_text THEN 'MIT-text'
       |       WHEN apache_text THEN 'Apache-text'
       |       ELSE 'none' END AS license,
       |  has_copyright,
       |  CASE WHEN spdx <> '' THEN spdx
       |       WHEN mit_text THEN 'MIT-text'
       |       WHEN apache_text THEN 'Apache-text'
       |       ELSE 'none' END
       |    IN ('MIT', 'Apache-2.0', 'MIT-text', 'Apache-text') AS keep
       |FROM d""".stripMargin

  // --------------------------- C107: code-quality filters (r13)

  /** C107: code-file quality filters — the curation stage between C96's
    * license gate and training for a code corpus (The Stack /
    * StarCoder's structural filters): per file, line-shape stats
    * (non-empty line count, max and total line length), comment-line
    * count, and alphanumeric density, with the keep verdict under the
    * standard thresholds (max line ≤ 1000 chars — minified/generated
    * files; mean line ≤ 100 chars and alnum ≥ 25% — data blobs and
    * binary-ish text masquerading as code). All arithmetic is exact
    * integers (mean-line-length as `sum ≤ 100 × n_lines`, density as
    * `alnum × 100 ≥ 25 × chars` — no float thresholds to drift across
    * engines). Pure map-side array/regexp work over each file: zero
    * shuffle, scan-speed at 100 TB next to C95/C96.
    */
  def codeQuality(documents: DataFrame,
                  code: org.apache.spark.sql.Column): DataFrame = {
    val lines = filter(split(col("code"), "\n"), l => l =!= lit(""))
    documents
      .select(col("doc_id"), code.as("code"))
      .select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        // n_lines = 0 special case (r14 advice): array_max over an empty
        // array is NULL, which made keep NULL — the doc silently vanished
        // from both filter(keep) and filter(!keep). Stats coalesce to 0
        // and keep gets an explicit n_lines > 0 conjunct, so every row
        // carries a concrete boolean and both engines agree.
        coalesce(array_max(transform(lines, l => length(l))).cast("long"),
          lit(0L)).as("max_line_len"),
        aggregate(lines, lit(0L), (acc, l) => acc + length(l))
          .as("sum_line_chars"),
        size(filter(lines, l => trim(l).startsWith("//"))).cast("long")
          .as("n_comment_lines"),
        length(regexp_replace(col("code"), "[^A-Za-z0-9]", "")).cast("long")
          .as("n_alnum"),
        length(col("code")).cast("long").as("n_chars"))
      .withColumn("keep",
        col("n_lines") > 0L &&
          col("max_line_len") <= 1000L &&
          col("sum_line_chars") <= lit(100L) * col("n_lines") &&
          col("n_alnum") * 100L >= lit(25L) * col("n_chars"))
  }

  val codeQualitySql: String =
    s"""WITH c AS (SELECT doc_id, $plantedCodeFileSql AS code FROM documents),
       |l AS (SELECT doc_id, code,
       |  list_filter(string_split(code, chr(10)), x -> x <> '') AS lines
       |  FROM c),
       |s AS (SELECT doc_id,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  COALESCE(CAST(list_aggregate(list_transform(lines, x -> len(x)), 'max')
       |    AS BIGINT), 0) AS max_line_len,
       |  COALESCE(CAST(list_aggregate(list_transform(lines, x -> len(x)), 'sum')
       |    AS BIGINT), 0) AS sum_line_chars,
       |  CAST(len(list_filter(lines, x -> trim(x) LIKE '//%'))
       |    AS BIGINT) AS n_comment_lines,
       |  CAST(len(regexp_replace(code, '[^A-Za-z0-9]', '', 'g'))
       |    AS BIGINT) AS n_alnum,
       |  CAST(len(code) AS BIGINT) AS n_chars
       |  FROM l)
       |SELECT doc_id, n_lines, max_line_len, sum_line_chars,
       |  n_comment_lines, n_alnum, n_chars,
       |  (n_lines > 0 AND max_line_len <= 1000
       |    AND sum_line_chars <= 100 * n_lines
       |    AND n_alnum * 100 >= 25 * n_chars) AS keep
       |FROM s""".stripMargin

  // ------------------- C108: code-corpus pipeline composition (r13)

  /** Deterministically planted repo file for the composition query: a
    * license header cycling MIT / Apache-2.0 / GPL-3.0 / none on
    * doc_id, over a code body SHARED BY THE DOC'S DECADE (the same
    * vendored file under different headers in ten repos — the case the
    * dedup stage exists for), plus a minified 1200-char blob line on
    * every 7th doc (the file the quality gate exists for). Every stage
    * of the pipeline discriminates at every SF.
    */
  private[graft] def plantedRepoHeader: Column =
    when(pmod(col("doc_id"), lit(5L)) === 0L,
      lit("// SPDX-License-Identifier: MIT\n"))
      .when(pmod(col("doc_id"), lit(5L)) === 1L,
        lit("// SPDX-License-Identifier: Apache-2.0\n"))
      .when(pmod(col("doc_id"), lit(5L)) === 2L,
        lit("// SPDX-License-Identifier: GPL-3.0\n"))
      .otherwise(lit(""))

  private[graft] def plantedRepoContent: Column = concat(
    expr("array_join(transform(sequence(1, 8), " +
      "i -> concat('code', CAST(doc_id - doc_id % 10 AS STRING), " +
      "'line', CAST(i AS STRING))), '\n')"),
    when(pmod(col("doc_id"), lit(7L)) === 0L,
      concat(lit("\n"), expr("repeat('x', 1200)"))).otherwise(lit("")))

  /** C108: The Stack / StarCoder end-to-end code-corpus prep in ONE
    * plan — the C28 composition discipline applied to code: license
    * gate ([[licenseScan]], permissive-only) → structural quality gate
    * ([[codeQuality]]) → exact content dedup ACROSS repos (same
    * vendored file under different license headers collapses to its
    * lowest doc_id — dedup keys on the content md5, header excluded,
    * exactly the real pipeline's post-extraction dedup). The stages are
    * the REGISTERED operators, not re-implementations, so the composed
    * verdicts can never drift from the per-stage queries. Output one
    * row per file: per-gate verdicts, the dup-group keeper (−1 when a
    * gate already dropped the file), and the final kept bit.
    *
    * Scale shape: both gates are map-side scans; the dedup is ONE
    * md5-keyed groupBy + join-back (the C1 two-phase shape — never a
    * window over a content fingerprint), bounded by distinct bodies.
    */
  def codeCorpus(documents: DataFrame): DataFrame = {
    val file = concat(plantedRepoHeader, plantedRepoContent)
    val lic = licenseScan(documents, file)
      .select(col("doc_id"), col("license"),
        col("keep").as("keep_license"))
    val qual = codeQuality(documents, file)
      .select(col("doc_id"), col("keep").as("keep_quality"))
    val verdicts = documents
      .select(col("doc_id"), md5(plantedRepoContent).as("fp"))
      .join(lic, "doc_id").join(qual, "doc_id")
    val keepers = verdicts
      .filter(col("keep_license") && col("keep_quality"))
      .groupBy("fp").agg(min("doc_id").as("keep_id"))
    // keeper table is bounded by DISTINCT bodies, not files — still
    // corpus-proportional at crawl scale, so no broadcast hint: the
    // equi-join shuffles on the fingerprint and AQE splits a hot body
    // (the boilerplate-file case)
    verdicts.join(keepers, Seq("fp"), "left")
      .select(col("doc_id"), col("license"), col("keep_license"),
        col("keep_quality"),
        coalesce(
          when(col("keep_license") && col("keep_quality"), col("keep_id")),
          lit(-1L)).as("keep_id"))
      .withColumn("kept", col("keep_id") === col("doc_id"))
  }

  val codeCorpusSql: String =
    """WITH f AS (SELECT doc_id,
      |  CASE CAST(doc_id % 5 AS INTEGER)
      |    WHEN 0 THEN '// SPDX-License-Identifier: MIT' || chr(10)
      |    WHEN 1 THEN '// SPDX-License-Identifier: Apache-2.0' || chr(10)
      |    WHEN 2 THEN '// SPDX-License-Identifier: GPL-3.0' || chr(10)
      |    ELSE '' END AS header,
      |  array_to_string(list_transform(range(1, 9),
      |    i -> 'code' || CAST(doc_id - doc_id % 10 AS VARCHAR) ||
      |         'line' || CAST(i AS VARCHAR)), chr(10)) ||
      |  CASE WHEN doc_id % 7 = 0 THEN chr(10) || repeat('x', 1200)
      |       ELSE '' END AS content
      |  FROM documents),
      |c AS (SELECT doc_id, header || content AS code, content FROM f),
      |lic AS (SELECT doc_id,
      |  CASE WHEN regexp_extract(code,
      |         'SPDX-License-Identifier: ([A-Za-z0-9.+-]+)', 1) <> ''
      |       THEN regexp_extract(code,
      |         'SPDX-License-Identifier: ([A-Za-z0-9.+-]+)', 1)
      |       WHEN contains(code, 'Permission is hereby granted')
      |       THEN 'MIT-text'
      |       WHEN contains(code, 'Licensed under the Apache License')
      |       THEN 'Apache-text'
      |       ELSE 'none' END AS license
      |  FROM c),
      |licv AS (SELECT doc_id, license,
      |  license IN ('MIT', 'Apache-2.0', 'MIT-text', 'Apache-text')
      |    AS keep_license FROM lic),
      |ql AS (SELECT doc_id,
      |  list_filter(string_split(code, chr(10)), x -> x <> '') AS lines,
      |  code FROM c),
      |qs AS (SELECT doc_id,
      |  CAST(len(lines) AS BIGINT) AS n_lines,
      |  CAST(list_aggregate(list_transform(lines, x -> len(x)), 'max')
      |    AS BIGINT) AS max_line_len,
      |  CAST(list_aggregate(list_transform(lines, x -> len(x)), 'sum')
      |    AS BIGINT) AS sum_line_chars,
      |  CAST(len(regexp_replace(code, '[^A-Za-z0-9]', '', 'g'))
      |    AS BIGINT) AS n_alnum,
      |  CAST(len(code) AS BIGINT) AS n_chars
      |  FROM ql),
      |qualv AS (SELECT doc_id,
      |  (max_line_len <= 1000 AND sum_line_chars <= 100 * n_lines
      |    AND n_alnum * 100 >= 25 * n_chars) AS keep_quality FROM qs),
      |v AS (SELECT f.doc_id, md5(f.content) AS fp, licv.license,
      |  licv.keep_license, qualv.keep_quality
      |  FROM f JOIN licv ON f.doc_id = licv.doc_id
      |         JOIN qualv ON f.doc_id = qualv.doc_id),
      |k AS (SELECT fp, min(doc_id) AS keep_id FROM v
      |  WHERE keep_license AND keep_quality GROUP BY fp)
      |SELECT v.doc_id, v.license, v.keep_license, v.keep_quality,
      |  CAST(coalesce(CASE WHEN v.keep_license AND v.keep_quality
      |    THEN k.keep_id END, -1) AS BIGINT) AS keep_id,
      |  coalesce(CASE WHEN v.keep_license AND v.keep_quality
      |    THEN k.keep_id END, -1) = v.doc_id AS kept
      |FROM v LEFT JOIN k ON v.fp = k.fp""".stripMargin

  // --------------------------- C111: script-mix telemetry (r13)

  /** Planted multiscript phrases, every codepoint \u-escaped (the file
    * rule) and mirrored `chr()`-for-`chr()` in the oracle. Cyrillic
    * "privet mir", Greek "geia kosme", CJK "ni hao shi jie", and the
    * classic confusable spoof: a Latin token carrying one Cyrillic
    * U+0430 lookalike `a`.
    */
  private[graft] val ScriptCyr =
    " \u043F\u0440\u0438\u0432\u0435\u0442 \u043C\u0438\u0440"
  private[graft] val ScriptGreek =
    " \u03B3\u03B5\u03B9\u03B1 \u03BA\u03CC\u03C3\u03BC\u03B5"
  private[graft] val ScriptCjk = " \u4F60\u597D\u4E16\u754C"
  private[graft] val ScriptConfusable = " p\u0430ypal"

  /** Planted multiscript corpus (the C62/C75 pattern): every 12th+5 doc
    * is REPLACED by a pure-Cyrillic doc (the dominant-flips case — the
    * only branch where Latin does not win); otherwise the doc keeps its
    * Latin text and gains a script suffix cycling Cyrillic / Greek /
    * CJK / none on doc_id%4, plus the confusable token on every 6th doc
    * (12k+5 is never ≡0 mod 6, so the replaced docs stay spoof-free).
    */
  private[graft] def plantedMultiscript: Column =
    when(pmod(col("doc_id"), lit(12L)) === 5L,
      lit((ScriptCyr + ScriptCyr).trim))
      .otherwise(concat(
        col("text"),
        when(pmod(col("doc_id"), lit(4L)) === 0L, lit(ScriptCyr))
          .when(pmod(col("doc_id"), lit(4L)) === 1L, lit(ScriptGreek))
          .when(pmod(col("doc_id"), lit(4L)) === 2L, lit(ScriptCjk))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(6L)) === 0L, lit(ScriptConfusable))
          .otherwise(lit(""))))

  /** C111: per-document script composition — the routing signal a
    * multilingual corpus needs BEFORE lang-id (C8's n-gram heuristic
    * assumes one script per doc; a Cyrillic/Latin mix fed to it scores
    * as neither language) and the spoof lens (a Latin token hiding a
    * Cyrillic confusable is the classic homoglyph evasion C62b folds —
    * here it is COUNTED, so the router can quarantine instead of
    * silently folding).
    *
    * Per doc: letter counts for the four script classes (explicit
    * codepoint ranges — Latin A–z, Cyrillic U+0400–U+04FF, Greek
    * U+0370–U+03FF, CJK U+4E00–U+9FFF), the count of ADJACENT
    * cross-script letter pairs (`n_confusable` — adjacency is what
    * separates a quoted foreign phrase from an intra-word spoof), the
    * distinct-script count, the dominant script (fixed priority order
    * latin>cyr>greek>cjk breaks ties deterministically in both
    * engines), and the router verdict: `review` when a confusable pair
    * exists, `multi` for honest mixed-script docs, else the dominant
    * script. All counts BIGINT, no ratios — the exact-integer oracle
    * rule.
    *
    * Oracle portability is the r13 candidate's own note: the planted
    * corpus is literal (`chr()`-mirrored), and the char classes are
    * built from `chr(cp)` range endpoints on the DuckDB side so the
    * same codepoint intervals drive java.util.regex and RE2 — no
    * engine-specific `\\p{Script=...}` classes. Scale: one codegen'd
    * projection riding the scan, ZERO exchanges (PlanSpec pins it),
    * stateless on streams.
    */
  def scriptMix(docs: DataFrame, mixed: Column): DataFrame =
    docs.select(col("doc_id"), mixed.as("t"))
      .select(col("doc_id"),
        regexp_count(col("t"), lit("[A-Za-z]")).cast("long").as("n_latin"),
        regexp_count(col("t"), lit("[\u0400-\u04FF]")).cast("long")
          .as("n_cyr"),
        regexp_count(col("t"), lit("[\u0370-\u03FF]")).cast("long")
          .as("n_greek"),
        regexp_count(col("t"), lit("[\u4E00-\u9FFF]")).cast("long")
          .as("n_cjk"),
        regexp_count(col("t"),
          lit("[A-Za-z][\u0400-\u04FF]|[\u0400-\u04FF][A-Za-z]"))
          .cast("long").as("n_confusable"))
      .withColumn("n_scripts",
        (col("n_latin") > 0L).cast("long") + (col("n_cyr") > 0L).cast("long") +
          (col("n_greek") > 0L).cast("long") + (col("n_cjk") > 0L).cast("long"))
      .withColumn("dominant",
        when(col("n_latin") >= col("n_cyr") &&
          col("n_latin") >= col("n_greek") &&
          col("n_latin") >= col("n_cjk"), "latin")
          .when(col("n_cyr") >= col("n_greek") &&
            col("n_cyr") >= col("n_cjk"), "cyrillic")
          .when(col("n_greek") >= col("n_cjk"), "greek")
          .otherwise("cjk"))
      .withColumn("route",
        when(col("n_confusable") > 0L, "review")
          .when(col("n_scripts") >= 2L, "multi")
          .otherwise(col("dominant")))

  /** DuckDB char class over a codepoint interval, built from `chr()`
    * endpoints so the pattern carries no literal non-ASCII. */
  private def chrClass(lo: Int, hi: Int): String =
    s"'[' || chr($lo) || '-' || chr($hi) || ']'"

  def scriptMixSql: String = {
    val cyr = chrClass(0x0400, 0x04FF)
    val greek = chrClass(0x0370, 0x03FF)
    val cjk = chrClass(0x4E00, 0x9FFF)
    def count(cls: String) =
      s"CAST(len(regexp_extract_all(t, $cls)) AS BIGINT)"
    s"""WITH t AS (SELECT doc_id,
       |  CASE WHEN doc_id % 12 = 5
       |    THEN ${chrConcat((ScriptCyr + ScriptCyr).trim)}
       |    ELSE text ||
       |      CASE WHEN doc_id % 4 = 0 THEN ${chrConcat(ScriptCyr)}
       |           WHEN doc_id % 4 = 1 THEN ${chrConcat(ScriptGreek)}
       |           WHEN doc_id % 4 = 2 THEN ${chrConcat(ScriptCjk)}
       |           ELSE '' END ||
       |      CASE WHEN doc_id % 6 = 0 THEN ${chrConcat(ScriptConfusable)}
       |           ELSE '' END
       |  END AS t FROM documents),
       |c AS (SELECT doc_id,
       |  ${count("'[A-Za-z]'")} AS n_latin,
       |  ${count(cyr)} AS n_cyr,
       |  ${count(greek)} AS n_greek,
       |  ${count(cjk)} AS n_cjk,
       |  CAST(len(regexp_extract_all(t,
       |    '[A-Za-z]' || $cyr || '|' || $cyr || '[A-Za-z]'))
       |    AS BIGINT) AS n_confusable
       |  FROM t),
       |s AS (SELECT *,
       |  CAST(n_latin > 0 AS BIGINT) + CAST(n_cyr > 0 AS BIGINT) +
       |    CAST(n_greek > 0 AS BIGINT) + CAST(n_cjk > 0 AS BIGINT)
       |    AS n_scripts,
       |  CASE WHEN n_latin >= n_cyr AND n_latin >= n_greek
       |         AND n_latin >= n_cjk THEN 'latin'
       |       WHEN n_cyr >= n_greek AND n_cyr >= n_cjk THEN 'cyrillic'
       |       WHEN n_greek >= n_cjk THEN 'greek'
       |       ELSE 'cjk' END AS dominant
       |  FROM c)
       |SELECT doc_id, n_latin, n_cyr, n_greek, n_cjk, n_confusable,
       |  n_scripts, dominant,
       |  CASE WHEN n_confusable > 0 THEN 'review'
       |       WHEN n_scripts >= 2 THEN 'multi'
       |       ELSE dominant END AS route
       |FROM s""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_normalize" -> ((s, d) =>
      textNormalize(Tables.documents(s, d), plantedDirty)),
    "q_url_host_cap" -> ((s, d) => urlHostCap(Tables.documents(s, d))),
    "q_url_canonicalize" -> ((s, d) => urlCanonicalize(Tables.documents(s, d))),
    "q_host_split" -> ((s, d) => hostSplit(Tables.documents(s, d))),
    "q_mojibake_repair" -> ((s, d) =>
      mojibakeRepair(Tables.documents(s, d), plantedMoji)),
    "q_code_extract" -> ((s, d) =>
      codeFenceExtract(Tables.documents(s, d), plantedMarkdown)),
    "q_license_scan" -> ((s, d) =>
      licenseScan(Tables.documents(s, d), plantedCodeFile)),
    "q_code_quality" -> ((s, d) =>
      codeQuality(Tables.documents(s, d), plantedCodeFile)),
    "q_code_corpus" -> ((s, d) => codeCorpus(Tables.documents(s, d))),
    "q_script_mix" -> ((s, d) =>
      scriptMix(Tables.documents(s, d), plantedMultiscript)))

  def oracle: Map[String, String] = Map(
    "q_text_normalize" -> textNormalizeSql,
    "q_url_host_cap" -> urlHostCapSql,
    "q_url_canonicalize" -> urlCanonicalizeSql,
    "q_host_split" -> hostSplitSql(),
    "q_mojibake_repair" -> mojibakeRepairSql,
    "q_code_extract" -> codeFenceExtractSql,
    "q_license_scan" -> licenseScanSql,
    "q_code_quality" -> codeQualitySql,
    "q_code_corpus" -> codeCorpusSql,
    "q_script_mix" -> scriptMixSql)
}
