package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md §2 C):
  * exact dedup, language-ID heuristic, quality scoring, token counting,
  * document fingerprinting. All map-side, codegen-friendly builtins — the
  * per-document work is embarrassingly parallel; only dedup groups shuffle,
  * and then only the narrow (fingerprint, doc_id) projection.
  *
  * Cross-engine parity: `md5` hex strings are identical in Spark and
  * DuckDB; ratios are exact-int divisions done in double then round(…,4).
  */
object TextOps {

  private val toks: Column = split(col("text"), " ")

  /** C1: exact dedup. Fingerprint = md5(text); keeper = min doc_id in the
    * group (a window over the fingerprint hash-partition — no global
    * sort). Emits every doc with its keeper so downstream can either drop
    * dups or remap references.
    */
  def dedupExact(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("fp")
    documents
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("keeper_id")).cast("boolean"))
  }

  val dedupExactSql: String =
    """SELECT doc_id, md5(text) AS fp,
      |  min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
      |  doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
      |FROM documents""".stripMargin

  /** C8: language-ID heuristic — stopword-profile scoring (the n-gram
    * analog of fastText's char-profile approach, reduced to a portable
    * deterministic rule). The synthetic corpus shares one vocabulary, so
    * the interesting output is the score itself, not accuracy.
    */
  val enStopwords = Seq("the", "a", "or")

  def langId(documents: DataFrame): DataFrame = {
    val hits = size(filter(toks, t => t.isInCollection(enStopwords))).cast("long")
    val n = size(toks).cast("long")
    documents.select(
      col("doc_id"),
      col("lang"),
      when(hits > 0, lit("en")).otherwise(lit("und")).as("pred_lang"),
      round(hits.cast("double") / n.cast("double"), 4).as("stop_ratio"))
  }

  val langIdSql: String = {
    val inList = enStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, lang,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ($inList))) AS BIGINT) AS hits,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
       |FROM documents)
       |SELECT doc_id, lang,
       |  CASE WHEN hits > 0 THEN 'en' ELSE 'und' END AS pred_lang,
       |  round(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 4) AS stop_ratio
       |FROM t""".stripMargin
  }

  /** C9: quality scoring — length saturation + lexical diversity +
    * stopword share, the classic cheap pre-filters before expensive
    * model-based quality judges.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val n = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    val stops = size(filter(toks, t => t.isInCollection(enStopwords))).cast("long")
    val lenScore = least(col("n_chars").cast("double") / 400.0, lit(1.0))
    documents
      .select(col("doc_id"), col("n_chars"), n.as("n_tok"), nd.as("n_distinct"), stops.as("n_stop"),
        lenScore.as("len_score"))
      // raw IEEE doubles: every input is bit-identical across engines and
      // scalar double arithmetic is deterministic — round() here would
      // *introduce* cross-engine ties (BigDecimal vs float-multiply
      // rounding), not remove them.
      .withColumn("diversity", col("n_distinct").cast("double") / col("n_tok"))
      .withColumn("quality",
        lit(0.5) * col("len_score") + lit(0.5) * (col("n_distinct").cast("double") / col("n_tok")))
      .select("doc_id", "n_tok", "n_distinct", "n_stop", "diversity", "quality")
  }

  val qualityScoreSql: String = {
    val inList = enStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, n_chars,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ($inList))) AS BIGINT) AS n_stop
       |FROM documents)
       |SELECT doc_id, n_tok, n_distinct, n_stop,
       |  CAST(n_distinct AS DOUBLE) / n_tok AS diversity,
       |  0.5 * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
       |      + 0.5 * (CAST(n_distinct AS DOUBLE) / n_tok) AS quality
       |FROM t""".stripMargin
  }

  /** C10: token counting — whitespace tokens plus a BPE-style estimate
    * (bytes/4, the standard rule of thumb when the real tokenizer is too
    * expensive for a first pass).
    */
  def tokenCount(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(toks).cast("long").as("ws_tokens"),
      octet_length(col("text")).cast("long").as("n_bytes"),
      ceil(octet_length(col("text")).cast("double") / 4.0).cast("long").as("est_bpe_tokens"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  CAST(ceil(CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE) / 4.0) AS BIGINT) AS est_bpe_tokens
      |FROM documents""".stripMargin

  /** Distinct w-token shingles of a token-array column (shared by the
    * fingerprint and the MinHash family). 1-based `slice`, same as the
    * oracle's `list_slice`.
    */
  def shingles(tokArr: Column, w: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(tokArr) - (w - 1), lit(1))),
        i => concat_ws(" ", slice(tokArr, i, lit(w)))))

  def shinglesSqlExpr(w: Int): String =
    s"""list_distinct(list_transform(
       |    range(1, greatest(len(string_split(text, ' ')) - ${w - 1}, 1) + 1),
       |    i -> array_to_string(list_slice(string_split(text, ' '), i, i + ${w - 1}), ' ')))""".stripMargin

  /** C11: document fingerprint — min-hash-of-shingles (a 1-permutation
    * MinHash): robust to local edits unlike md5-of-text, and a pure
    * map-side computation. Matching fingerprints = near-identical prefixes
    * of content.
    */
  def fingerprint(documents: DataFrame, w: Int = 5): DataFrame =
    documents.select(
      col("doc_id"),
      array_min(transform(shingles(toks, w), s => md5(s))).as("fp"))

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  list_aggregate(list_transform(${shinglesSqlExpr(5)}, s -> md5(s)), 'min') AS fp
       |FROM documents""".stripMargin

  /** C13: per-language corpus profile — the rollup a data curator reads
    * before sampling a training mix. All aggregates are integer sums
    * (order-independent); the diversity ratio is one double division at
    * the end (deterministic cross-engine).
    */
  def langStats(documents: DataFrame): DataFrame = {
    val n = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    documents
      .select(col("lang"), col("n_chars"), n.as("n_tok"), nd.as("n_distinct"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tok")).as("total_tokens"),
        (sum(col("n_distinct")).cast("double") / sum(col("n_tok")).cast("double"))
          .as("diversity_ratio"))
  }

  val langStatsSql: String =
    """WITH t AS (SELECT lang, n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
      |FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
      |  CAST(sum(n_distinct) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE) AS diversity_ratio
      |FROM t GROUP BY lang""".stripMargin

  /** C14: deterministic training-mix sampling — per-language keep rates
    * applied via a content-stable hash selector (first md5 nibble of the
    * doc id ∈ [0,16)), so the sample is reproducible across runs,
    * engines and partitionings — unlike `rand()`-based sampling, which
    * is none of those. This is how curation pipelines downsample
    * over-represented languages/sources into a target mix.
    */
  val mixRates: Map[String, Int] = // keep nibbles < rate, i.e. rate/16 of docs
    Map("en" -> 16, "de" -> 8, "fr" -> 8, "es" -> 4, "zh" -> 4)

  def sampleMix(documents: DataFrame): DataFrame = {
    val sel = expr("CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 AS BIGINT)")
    val rate = mixRates.foldLeft(lit(0L)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r.toLong)).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"), col("source"), sel.as("selector"), rate.as("keep_rate"))
      .filter(col("selector") < col("keep_rate"))
  }

  val sampleMixSql: String = {
    val cases = mixRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""WITH t AS (SELECT doc_id, lang, source,
       |  CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS selector,
       |  CAST(CASE $cases ELSE 0 END AS BIGINT) AS keep_rate
       |FROM documents)
       |SELECT doc_id, lang, source, selector, keep_rate
       |FROM t WHERE selector < keep_rate""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) => dedupExact(Tables.documents(s, d))),
    "q_lang_id" -> ((s, d) => langId(Tables.documents(s, d))),
    "q_quality_score" -> ((s, d) => qualityScore(Tables.documents(s, d))),
    "q_token_count" -> ((s, d) => tokenCount(Tables.documents(s, d))),
    "q_fingerprint" -> ((s, d) => fingerprint(Tables.documents(s, d))),
    "q_lang_stats" -> ((s, d) => langStats(Tables.documents(s, d))),
    "q_sample_mix" -> ((s, d) => sampleMix(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" -> dedupExactSql,
    "q_lang_id" -> langIdSql,
    "q_quality_score" -> qualityScoreSql,
    "q_token_count" -> tokenCountSql,
    "q_fingerprint" -> fingerprintSql,
    "q_lang_stats" -> langStatsSql,
    "q_sample_mix" -> sampleMixSql)
}
