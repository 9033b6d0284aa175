package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftCache
import graft.functions.Exprs
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
    * group, computed as a `groupBy(fp).min` + join-back (the C82
    * [[Curation.urlCanonicalize]] shape) — NEVER a window over the
    * fingerprint: at crawl scale a boilerplate page duplicated 10⁸ times
    * (empty pages, cookie banners) would be ONE unsplittable WindowExec
    * partition, whereas the two-phase agg absorbs it in map-side partials
    * and AQE can skew-split the join-back. Emits every doc with its keeper
    * so downstream can either drop dups or remap references.
    */
  def dedupExact(documents: DataFrame): DataFrame = {
    // Null-safe (<=>) join-back, the capBands rule: md5(NULL text) is
    // NULL, groupBy keeps the NULL-fp group exactly like the old window
    // partition did, and a plain equi-join would silently DROP those
    // docs (the oracle keeps window semantics and would emit them).
    val fps = documents.select(col("doc_id"), md5(col("text")).as("fp"))
    val keepers = fps.groupBy("fp")
      .agg(min("doc_id").as("keeper_id"))
      .withColumnRenamed("fp", "keep_fp")
    fps.join(keepers, col("fp") <=> col("keep_fp"))
      .select(col("doc_id"), col("fp"), col("keeper_id"),
        (col("doc_id") =!= col("keeper_id")).cast("boolean").as("is_dup"))
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
      array_min(transform(Exprs.shingles(toks, w), s => md5(s))).as("fp"))

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

  /** C15: benchmark decontamination — flag training docs sharing any
    * w-token shingle with a held-out benchmark set (here: the
    * deterministic doc_id % benchMod == 0 subset standing in for an eval
    * suite). This is the standard pre-training decontamination pass:
    * explode distinct shingles, semi-join the benchmark shingle set,
    * count distinct overlaps per doc. Shuffle carries only (shingle
    * hash, doc_id) pairs; the benchmark side is the small relation and
    * broadcasts.
    */
  def contamination(documents: DataFrame, w: Int = 8, benchMod: Int = 10): DataFrame = {
    // shingles are joined and counted by their 64-bit md5 prefix, not the
    // raw ~w-token string: the shuffle/broadcast carries 16 hex chars per
    // shingle, and because BOTH engines apply the SAME hash, any
    // collision collapses identically on both sides — counts stay
    // hash-comparable. NOT persisted: the doc_id % benchMod filters push
    // below the explode, so each branch computes shingles only for its
    // own doc subset — materializing the full relation would cost more
    // than the one-sided recompute it saves.
    val sh = documents
      .select(col("doc_id"), explode(Exprs.shingles(toks, w)).as("s"))
      .select(col("doc_id"), substring(md5(col("s")), 1, 16).as("h"))
    val bench = sh.filter(col("doc_id") % benchMod === 0)
      .select(col("h")).distinct()
    sh.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), "h")
      .groupBy("doc_id")
      .agg(countDistinct(col("h")).as("n_shared"))
  }

  val contaminationSql: String =
    s"""WITH sh AS (SELECT doc_id, substr(md5(unnest(${shinglesSqlExpr(8)})), 1, 16) AS h FROM documents),
       |bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 10 = 0)
       |SELECT sh.doc_id, count(DISTINCT sh.h) AS n_shared
       |FROM sh JOIN bench USING (h)
       |WHERE sh.doc_id % 10 <> 0
       |GROUP BY sh.doc_id""".stripMargin

  /** C16: stopword pruning — the cheap boilerplate-reduction pass before
    * tokenization/featurization. Emits the cleaned text plus how much
    * was removed (the observable a curation pipeline monitors).
    */
  def stopwordStrip(documents: DataFrame): DataFrame = {
    val kept = filter(toks, t => !t.isInCollection(enStopwords))
    documents.select(
      col("doc_id"),
      concat_ws(" ", kept).as("clean_text"),
      size(kept).cast("long").as("n_kept"),
      (size(toks) - size(kept)).cast("long").as("n_removed"))
  }

  val stopwordStripSql: String = {
    val inList = enStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |k AS (SELECT doc_id, toks, list_filter(toks, x -> x NOT IN ($inList)) AS kept FROM t)
       |SELECT doc_id, array_to_string(kept, ' ') AS clean_text,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
       |FROM k""".stripMargin
  }

  /** C17: corpus document-frequency table — per-token df and corpus
    * share, the statistic behind tf-idf weighting and rare-token
    * filters. Two aggregates: distinct (token, doc) pairs then
    * per-token counts (both partial-agg friendly); the corpus size is a
    * broadcast one-row aggregate. The ORACLE-CHECKED output carries only
    * exact integers and one exact-int division: `ln` is NOT
    * correctly-rounded IEEE, and Java's Math.log and DuckDB's libm
    * diverge by 1 ulp on real inputs (measured) — transcendentals never
    * belong in a hash-compared column. [[idf]] layers the log on top for
    * library users.
    */
  def docFreq(documents: DataFrame): DataFrame = {
    val n = documents.agg(count(lit(1)).as("n_docs"))
    documents
      .select(col("doc_id"), explode(array_distinct(toks)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(
        col("token"), col("df"),
        (col("df").cast("double") / col("n_docs").cast("double")).as("doc_share"))
  }

  val docFreqSql: String =
    """WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
      |  FROM documents),
      |df AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT token, df, CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE) AS doc_share
      |FROM df, n""".stripMargin

  /** idf = −ln(doc_share) over [[docFreq]] — for library use; not
    * oracle-hashed (see docFreq's note on transcendental rounding). */
  def idf(documents: DataFrame): DataFrame =
    docFreq(documents).withColumn("idf", -log(col("doc_share")))

  /** C21: per-document top-k TF-IDF terms — the keyword-extraction /
    * salient-term operator behind relevance scoring and topic spotting.
    *
    * Score stays hash-exact cross-engine: tf·(N+1)/(df+1) computed as
    * one exact-integer product then ONE double division (IEEE division
    * is correctly rounded and bit-identical in both engines; `ln` is
    * not — see [[docFreq]]). Shapes at scale: token explode is map-side;
    * (doc, term) tf and per-term df are partial-agg counts; the df join
    * shuffles on term (the term dictionary is SF-proportional — never
    * broadcast); the final top-k window partitions by doc_id
    * (max-cardinality key, splits freely).
    */
  def tfidfTopTerms(documents: DataFrame, k: Int = 3): DataFrame = {
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val tf = documents
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * (col("n_docs") + 1)).cast("double") / (col("df") + 1).cast("double"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rn"))
  }

  val tfidfTopTermsSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / CAST(df.df + 1 AS DOUBLE) AS score
      |  FROM tf JOIN df ON tf.term = df.term, n
      |)
      |SELECT doc_id, term, tf, df, score, rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      |  FROM scored) WHERE rn <= 3""".stripMargin

  /** C23: composite quality-rules filter — the published-rules battery
    * (Gopher/C4-style) run before any model-based quality judge:
    * document-length bounds, mean-word-length bounds, stopword
    * presence, and a repetition rule (share of duplicated bigrams —
    * boilerplate/spam detector). Pure map-side arithmetic over each
    * document's own tokens; `keep` is the conjunction. Thresholds are
    * the standard published ballpark, parameterized for tuning.
    */
  def qualityRules(documents: DataFrame,
                   minWords: Int = 5, maxWords: Int = 100000,
                   minMeanWordLen: Double = 2.0, maxMeanWordLen: Double = 12.0,
                   minStopwords: Int = 1,
                   maxDupBigramRatio: Double = 0.5): DataFrame = {
    val n = size(toks).cast("long")
    // sum of token lengths == len(text) - (n-1): split(text, ' ') removes
    // exactly n-1 single-space separators (empty tokens from runs of
    // spaces included) — same long, same IEEE division, no HOF fold
    val meanLen = (length(col("text")).cast("long") - (n - 1L))
      .cast("double") / n.cast("double")
    val stops = Exprs.countInSet(toks, enStopwords)
    val totalBigrams = greatest(n - 1, lit(1L))
    val distinctBigrams = size(Exprs.shingles(toks, 2)).cast("long")
    val dupRatio = lit(1.0) - distinctBigrams.cast("double") / totalBigrams.cast("double")
    documents
      .select(col("doc_id"), n.as("n_words"), meanLen.as("mean_word_len"),
        stops.as("n_stop"), dupRatio.as("dup_bigram_ratio"))
      .withColumn("ok_length",
        (col("n_words") >= minWords && col("n_words") <= maxWords).cast("boolean"))
      .withColumn("ok_word_len",
        (col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen).cast("boolean"))
      .withColumn("ok_stopwords", (col("n_stop") >= minStopwords).cast("boolean"))
      .withColumn("ok_repetition",
        (col("dup_bigram_ratio") <= maxDupBigramRatio).cast("boolean"))
      .withColumn("keep",
        (col("ok_length") && col("ok_word_len") && col("ok_stopwords") &&
          col("ok_repetition")).cast("boolean"))
  }

  val qualityRulesSql: String = {
    val inList = enStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       |  CAST(list_sum(list_transform(string_split(text, ' '), w -> len(w))) AS DOUBLE)
       |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len,
       |  CAST(len(list_filter(string_split(text, ' '), x -> x IN ($inList))) AS BIGINT) AS n_stop,
       |  1.0 - CAST(len(${shinglesSqlExpr(2)}) AS DOUBLE)
       |    / CAST(greatest(len(string_split(text, ' ')) - 1, 1) AS DOUBLE) AS dup_bigram_ratio
       |FROM documents)
       |SELECT doc_id, n_words, mean_word_len, n_stop, dup_bigram_ratio,
       |  n_words >= 5 AND n_words <= 100000 AS ok_length,
       |  mean_word_len >= 2.0 AND mean_word_len <= 12.0 AS ok_word_len,
       |  n_stop >= 1 AS ok_stopwords,
       |  dup_bigram_ratio <= 0.5 AS ok_repetition,
       |  (n_words >= 5 AND n_words <= 100000) AND (mean_word_len >= 2.0 AND mean_word_len <= 12.0)
       |    AND n_stop >= 1 AND dup_bigram_ratio <= 0.5 AS keep
       |FROM t""".stripMargin
  }

  /** C18: corpus-frequency top n-grams — the bigram table behind
    * phrase-level statistics and boilerplate spotting. Explode bigrams
    * (map-side, native shingles), partial-agg count, deterministic
    * top-k via sort+limit (count desc, gram asc) →
    * TakeOrderedAndProject.
    */
  def topNgrams(documents: DataFrame, n: Int = 2, k: Int = 50): DataFrame =
    documents
      .select(explode(Exprs.shingles(toks, n)).as("gram"))
      .filter(size(split(col("gram"), " ")) === n) // drop short-doc remainders
      .groupBy("gram")
      .agg(count(lit(1)).as("n_occ")) // once per containing doc (shingles are per-doc distinct)
      .orderBy(col("n_occ").desc, col("gram"))
      .limit(k)

  val topNgramsSql: String =
    s"""WITH g AS (SELECT unnest(${shinglesSqlExpr(2)}) AS gram FROM documents)
       |SELECT gram, count(*) AS n_occ FROM g
       |WHERE len(string_split(gram, ' ')) = 2
       |GROUP BY gram ORDER BY n_occ DESC, gram LIMIT 50""".stripMargin

  /** C43: tokenizer induction — the first BPE iteration's merge
    * candidates: corpus-wide counts of adjacent CHARACTER pairs inside
    * whitespace tokens, top-k by count (the pair a byte-pair-encoding
    * trainer would merge first, then re-run — each further round is the
    * same query over the re-segmented corpus). Token explode and the
    * pair explode are both map-side (builtin sequence/substring stay in
    * whole-stage codegen); the count is a partial+final hash agg on the
    * bounded pair space (≤ |alphabet|²), and top-k is sort+limit
    * (TakeOrderedAndProject), never a global rank window.
    */
  def bpeMerges(documents: DataFrame, k: Int = 20): DataFrame =
    documents
      .select(explode(toks).as("tok"))
      .filter(length(col("tok")) >= 2) // sequence(1, len-1) must ascend
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("pair"))
      .limit(k)

  def bpeMergesSql(k: Int = 20): String =
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |p AS (
       |  SELECT unnest(list_transform(range(1, len(tok)), i -> substr(tok, i, 2))) AS pair
       |  FROM tok WHERE len(tok) >= 2)
       |SELECT pair, count(*) AS n_occ FROM p
       |GROUP BY pair ORDER BY n_occ DESC, pair LIMIT $k""".stripMargin

  /** Separator for BPE symbol sequences — U+001F (unit separator), not a
    * character that occurs in document text, so a symbol string
    * `␟a␟b␟c␟` delimits every symbol on BOTH sides and a literal search
    * for `␟a␟b␟` can only match a genuine adjacent (a, b) symbol pair,
    * never a substring of a longer symbol.
    */
  private val BpeSep = "\u001f"
  private val BpeRounds = 8

  /** Vocab-table admission floor: a whitespace token must occur at
    * least this many times in the corpus to enter the trainer's
    * collected frequency table (SQL-mirrored in [[bpeVocabSeedSql]], so
    * the oracle trains on the identical vocab). The collect is
    * Heaps'-law-sized WITHOUT a floor — a 100 TB web crawl's raw
    * whitespace vocabulary (typos, URLs, hex hashes) reaches billions
    * of distinct SINGLETON strings, and the driver would hold all of
    * them for merge rounds they can barely influence. Production
    * trainers prune at count ≥ 2 (subword-nmt's min-frequency); the
    * floor is a semantic parameter of the tokenizer, not a silent cap —
    * pass `minCount = 1` for exact-tail training on bounded corpora,
    * and the trainer logs the dropped token mass whenever the floor
    * binds.
    */
  val BpeMinCount = 2L

  /** Hard ceiling on the collected vocab rows — the fail-loudly guard
    * behind the floor: if the floored vocab still exceeds this, the
    * trainer REFUSES before collecting (raise `minCount`) rather than
    * silently truncating the tokenizer's view of the corpus or OOMing
    * the driver mid-collect. 8M rows ≈ low hundreds of MB of driver
    * heap — the same order as the committed codebook artifacts.
    */
  val BpeMaxVocab = 8000000L

  /** C43 full trainer: k BPE merge rounds with re-segmentation between
    * rounds (the fixpoint [[bpeMerges]] computes only round 1 of).
    * Classic two-tier formulation — the shape every production BPE
    * trainer has: ONE distributed pass aggregates the corpus to the
    * distinct-token frequency table (vocab-sized, not corpus-sized —
    * the only corpus-wide shuffle), and the k merge rounds run
    * DRIVER-SIDE over that collected table with incremental pair
    * counting ([[bpeTrainDriver]]). The round-8 formulation kept the
    * rounds distributed — one Spark job + 1-row collect per round —
    * which is the right algebra but the wrong shape past k≈100: a
    * 32k-merge tokenizer would be 32k chained plans. The vocab table is
    * the model-artifact boundary (the codebook rule): everything after
    * the collect is bounded by vocabulary, not corpus.
    *
    * Greedy-merge semantics are unchanged and still fuzz-pinned
    * (exactly greedy left-to-right, overlapping self-pair runs merge
    * `aaaaaa`→3 not 2; ties by (n_occ DESC, left, right) under the
    * UTF-8 byte collation both engines sort varchars by); the DuckDB
    * oracle mirrors them via its per-round replace/list_reduce CTE
    * chain. If the pair space dries up before k rounds the trainer
    * stops early; the generated oracle's empty-CTE cascade degrades
    * identically. The merge table is memoized per (input, k) — k rows,
    * a driver-local relation. The distributed fold kernel
    * ([[graft.functions.Exprs.bpeMerge]]) remains the ENCODE path: the
    * corpus-sized side of tokenization stays on the cluster.
    */
  /** One greedy merge round over a ␟-wrapped symbol string — the
    * codegen'd single-pass kernel [[graft.functions.Exprs.bpeMergeGreedy]]
    * (exactly greedy for every pair, self pairs included; fuzz-pinned in
    * PropertySpec). The SQL oracle mirrors the same greedy semantics
    * with its replace/list_reduce hybrid — both formulations are
    * greedy-exact, so parity holds per round.
    */
  private def foldMergePair(seg: Column, l: String, r: String): Column =
    Exprs.bpeMerge(seg, l, r)

  def bpeTrain(documents: DataFrame, k: Int = BpeRounds,
               minCount: Long = BpeMinCount): DataFrame = {
    val spark = documents.sparkSession
    GraftCache.memoArtifact(spark,
      ("bpeTrain", documents.queryExecution.analyzed.canonicalized, k, minCount)) {
      // The ONE corpus-wide pass: aggregate to the distinct-token
      // frequency table, then train from it ([[bpeTrainFromCounts]] —
      // the same core the committed vocab artifact feeds).
      bpeTrainFromCounts(spark,
        GraftCache.persistTracked(bpeTokFacts(documents)
          .groupBy("tok")
          .agg(count(lit(1)).as("cnt"))), k, minCount)
    }
  }

  /** The trainer core over an already-aggregated (tok, cnt) frequency
    * frame — fed by [[bpeTrain]]'s fresh corpus pass OR by the
    * committed vocab artifact ([[loadBpeVocab]]). The [[BpeMinCount]]
    * admission floor binds HERE, on the (possibly cross-crawl MERGED)
    * counts — flooring earlier would break extend∘train == train(union)
    * (a token appearing once in each of two crawls must survive a
    * floor of 2).
    */
  private def bpeTrainFromCounts(spark: SparkSession, vocabAll: DataFrame,
                                 k: Int, minCount: Long,
                                 symbolize: String => Array[String] = toSymbols)
      : DataFrame = {
      // Apply the floor and collect WHAT SURVIVES. Distinct tokens grow
      // sublinearly in corpus size (Heaps' law) but the law's tail is
      // almost entirely singletons — the floor is what makes the
      // collect a genuinely bounded model-artifact collect (the
      // codebook rule) instead of a tail-proportional one. Everything
      // after it is driver-local.
      // no-silent-caps: measure what the floor drops, log when it binds
      val st = vocabAll.agg(
        count(lit(1)).as("n_all"),
        sum(col("cnt")).as("m_all"),
        count(when(col("cnt") >= minCount, 1)).as("n_kept"),
        sum(when(col("cnt") >= minCount, col("cnt")).otherwise(0L)).as("m_kept"))
        .head()
      val (nAll, nKept) = (st.getLong(0), st.getLong(2))
      val (mAll, mKept) =
        (if (st.isNullAt(1)) 0L else st.getLong(1),
          if (st.isNullAt(3)) 0L else st.getLong(3))
      if (nKept < nAll)
        println(s"[bpe] vocab floor cnt>=$minCount: kept $nKept of $nAll distinct " +
          s"tokens (dropped ${mAll - mKept} of $mAll corpus occurrences)")
      require(nKept <= BpeMaxVocab,
        s"bpeTrain: floored vocab $nKept exceeds BpeMaxVocab $BpeMaxVocab — " +
          s"raise minCount (currently $minCount) rather than collecting an " +
          "unbounded table to the driver")
      val vocab = vocabAll
        .filter(col("cnt") >= minCount)
        .collect()
        .map(r => (symbolize(r.getString(0)), r.getLong(1)))
      val merges = bpeTrainDriver(vocab, k)
      import spark.implicits._
      merges.toDF("round", "left_sym", "right_sym", "merged", "n_occ")
        .orderBy("round")
  }

  /** Code-point symbols (a surrogate pair is ONE symbol, matching
    * DuckDB's `string_split(tok, '')` over UTF-8 varchars — a UTF-16
    * code-unit split would tear emoji into unpaired surrogates). */
  private def toSymbols(tok: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < tok.length) {
      val n = Character.charCount(tok.codePointAt(i))
      out += tok.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** UTF-8 byte comparison — the collation BOTH engines sort varchars
    * by (Spark UTF8String, DuckDB binary). Driver-side `String.compareTo`
    * is UTF-16 code-unit order, which disagrees above U+FFFF. */
  private def u8cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** The driver-side greedy BPE loop over the collected word-frequency
    * table — classic incremental pair counting (the subword-nmt shape):
    * a pair→count map plus a pair→word-ids occurrence index, updated by
    * subtracting a touched word's old adjacencies and adding its merged
    * ones, so each round costs O(words containing the winning pair),
    * not O(vocab). This replaced the round-8 formulation (one
    * distributed job + 1-row collect PER ROUND): right algebra, wrong
    * shape past k≈100 — a 32k-merge tokenizer is 32k chained Spark
    * plans, while here k=1024 over an sf0.1 vocab trains in seconds.
    *
    * Exactness contract (the oracle recomputes counts from scratch per
    * round, so the increments must be exact):
    *  - counts weight every adjacent occurrence by word frequency,
    *    overlapping self-pairs included ([a,a,a] contributes 2), the
    *    same position-based count as the SQL pair explode;
    *  - ties break by (n_occ DESC, left, right) under UTF-8 byte order
    *    ([[u8cmp]]) — both engines' varchar collation;
    *  - the merge is exactly-greedy left-to-right ([a,a,a]→[aa,a]),
    *    the [[graft.functions.Exprs.bpeMerge]] semantics the encode
    *    path still applies distributed;
    *  - a merged pair CAN re-form in a later round (merging (b,c)
    *    mints new "bc" symbols that may land next to an "x" whose
    *    (x,bc) pair an earlier round already consumed) — the occurrence
    *    index is rebuilt on re-add, so the loop handles it; the
    *    fuzz pin (BpeTrainProps) checks against a from-scratch
    *    reference per round.
    */
  private[graft] def bpeTrainDriver(vocab: Array[(Array[String], Long)], k: Int)
      : IndexedSeq[(Int, String, String, String, Long)] = {
    import scala.collection.mutable
    // Intern symbols into one pool: a naive per-word Array of singleton
    // Strings costs ~60 bytes per occurrence (500k 32-char words ≈ 1 GB
    // and an OOM, measured); interned, a word is 8-byte references into
    // a pool bounded by |alphabet| + |merges|.
    val pool = mutable.HashMap.empty[String, String]
    def intern(s: String): String = pool.getOrElseUpdate(s, s)
    val words: Array[Array[String]] = vocab.map(_._1.map(intern))
    val cnts: Array[Long] = vocab.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    // Exact occurrence index (add on +1, remove on -1): total entries
    // stay bounded by the CURRENT number of adjacencies — an append-only
    // index would re-accumulate a hot word's full pair list on every
    // touch across thousands of rounds.
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def index(wi: Int, sign: Long): Unit = {
      val w = words(wi)
      val c = cnts(wi) * sign
      var i = 0
      while (i + 1 < w.length) {
        val p = (w(i), w(i + 1))
        val nc = counts.getOrElse(p, 0L) + c
        if (nc == 0L) counts.remove(p) else counts.update(p, nc)
        if (sign > 0L) where.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        else where.get(p).foreach { s => s -= wi; if (s.isEmpty) where.remove(p) }
        i += 1
      }
    }
    var wi = 0
    while (wi < words.length) { index(wi, 1L); wi += 1 }
    // `lr` is the ROUND's one interned merged symbol — building l + r
    // per occurrence would mint millions of equal strings per round
    def mergeWord(w: Array[String], l: String, r: String, lr: String): Array[String] = {
      val out = Array.newBuilder[String]
      out.sizeHint(w.length)
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && (w(i) eq l) && (w(i + 1) eq r)) { out += lr; i += 2 }
        else { out += w(i); i += 1 }
      }
      out.result()
    }
    val merges = IndexedSeq.newBuilder[(Int, String, String, String, Long)]
    var round = 1
    while (round <= k && counts.nonEmpty) {
      // max by (count, then lexicographically-least pair): a linear scan
      // of the live pair map — at 1M+ distinct pairs an indexed heap
      // would win, but the scan is exact-tie-break-simple and k·|pairs|
      // stays comfortably sub-second at the vocab sizes a single
      // trainer node holds
      var bestL: String = null; var bestR: String = null
      var bestN = Long.MinValue
      counts.foreach { case ((l, r), n) =>
        if (n > bestN) { bestL = l; bestR = r; bestN = n }
        else if (n == bestN) {
          val c = u8cmp(l, bestL)
          if (c < 0 || (c == 0 && u8cmp(r, bestR) < 0)) { bestL = l; bestR = r }
        }
      }
      val merged = intern(bestL + bestR)
      merges += ((round, bestL, bestR, merged, bestN))
      // snapshot before mutating (index() edits these sets); the recheck
      // below keeps the loop correct even for duplicate/stale entries
      val hits = where.get((bestL, bestR)).map(_.toArray).getOrElse(Array.empty[Int])
      hits.foreach { w0 =>
        val w = words(w0)
        var has = false
        var i = 0
        while (!has && i + 1 < w.length) { has = (w(i) eq bestL) && (w(i + 1) eq bestR); i += 1 }
        if (has) {
          index(w0, -1L)
          words(w0) = mergeWord(w, bestL, bestR, merged)
          index(w0, 1L)
        }
      }
      where.remove((bestL, bestR))
      round += 1
    }
    merges.result()
  }

  /** Unrolled-round oracle (pageRankSql pattern): the winning pair is
    * re-derived per round in SQL — a static query cannot inline values
    * the trainer discovers at runtime — so each round is a (pair-count,
    * top-1, re-segment) CTE triple over the previous round's
    * segmentation, with the same list_reduce greedy fold and the same
    * (n_occ DESC, left, right) tie-break.
    */
  /** Shared per-round oracle CTE triple: pair counts over the previous
    * segmentation, the (n_occ DESC, left, right) top-1, and the
    * list_reduce greedy fold re-segmentation — one generator, so the
    * trainer and encoder oracles can never desynchronize. With
    * `withDoc`, a fourth CTE threads the doc-level segmentation through
    * the same round (LEFT JOIN ON TRUE: a dried-up round must leave
    * docs unchanged, not erase them like a cross join would).
    */
  private def bpeRoundCtes(i: Int, withDoc: Boolean): String = {
    // mirrors foldMergePair's hybrid: linear replace for non-self
    // pairs, list_reduce greedy fold for self pairs
    def fold(segCol: String): String =
      s"""CASE WHEN lft <> rgt THEN
         |      replace(replace($segCol,
         |        chr(31) || lft || chr(31) || rgt || chr(31), chr(31) || lft || rgt || chr(31)),
         |        chr(31) || lft || chr(31) || rgt || chr(31), chr(31) || lft || rgt || chr(31))
         |    ELSE list_reduce(
         |      list_prepend('', list_filter(string_split($segCol, chr(31)), x -> x <> '')),
         |      (acc, s) -> CASE WHEN regexp_extract(acc, '[^' || chr(31) || ']*$$') = lft
         |                        AND s = rgt
         |                  THEN acc || rgt ELSE acc || chr(31) || s END) || chr(31) END""".stripMargin
    val core =
      s"""p$i AS (
         |  SELECT pr.l AS lft, pr.r AS rgt, CAST(sum(cnt) AS BIGINT) AS n_occ
         |  FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(syms)),
         |                 j -> struct_pack(l := syms[j], r := syms[j+1]))) AS pr
         |    FROM (SELECT cnt,
         |            list_filter(string_split(seg, chr(31)), x -> x <> '') AS syms
         |          FROM s${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS (SELECT lft, rgt, n_occ FROM p$i ORDER BY n_occ DESC, lft, rgt LIMIT 1),
         |s$i AS (
         |  SELECT cnt, ${fold("seg")} AS seg
         |  FROM s${i - 1} CROSS JOIN b$i)""".stripMargin
    if (!withDoc) core
    else core + s""",
         |d$i AS (
         |  SELECT doc_id, n_ws_tokens,
         |    CASE WHEN lft IS NULL THEN dseg ELSE ${fold("dseg")} END AS dseg
         |  FROM d${i - 1} LEFT JOIN b$i ON TRUE)""".stripMargin
  }

  /** The oracle's vocab seed — including the [[BpeMinCount]] admission
    * floor, so Spark and DuckDB train over the identical token table
    * (the floor is tokenizer semantics, mirrored like every other rule).
    */
  private val bpeVocabSeedSql: String =
    s"""WITH tokx AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |t0 AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tokx
      |       WHERE len(tok) > 0 GROUP BY tok HAVING count(*) >= $BpeMinCount),
      |s0 AS (SELECT cnt,
      |         chr(31) || array_to_string(string_split(tok, ''), chr(31)) || chr(31) AS seg
      |       FROM t0)""".stripMargin

  /** Unrolled-round oracle (pageRankSql pattern): the winning pair is
    * re-derived per round in SQL — a static query cannot inline values
    * the trainer discovers at runtime — with the same list_reduce greedy
    * fold and the same (n_occ DESC, left, right) tie-break.
    */
  def bpeTrainSql(k: Int = BpeRounds): String = {
    val rounds = (1 to k).map(bpeRoundCtes(_, withDoc = false)).mkString(",\n")
    val out = (1 to k).map { i =>
      s"SELECT $i AS round, lft AS left_sym, rgt AS right_sym, lft || rgt AS merged, n_occ FROM b$i"
    }.mkString("\n  UNION ALL ")
    s"""$bpeVocabSeedSql,
       |$rounds
       |SELECT * FROM (
       |  $out
       |) ORDER BY round""".stripMargin
  }

  /** C43c: tokenizer APPLY — encode the corpus with the merge table
    * [[bpeTrain]] learned and report per-doc whitespace-token vs
    * BPE-token counts (the compression telemetry a tokenizer-induction
    * pipeline ships). Zero shuffle: the k learned merges are a
    * constant-size model artifact (memoized collect), inlined as k
    * chained greedy merge folds over a WHOLE-DOC symbol string — the
    * space character rides along as an ordinary symbol that no learned
    * pair can bridge (pairs were counted inside whitespace tokens
    * only), so whole-doc application ≡ per-token application without
    * exploding the corpus. Map-side only; plan-pinned shuffle-free.
    */
  /** Train-and-collect the ordered merge list — the ONE place the
    * collect lives: merge order IS the model, guaranteed only by
    * bpeTrain's trailing round sort, so every consumer must share this
    * exact collect (a re-select that dropped the sort in one copy
    * would silently desynchronize the tokenizer).
    */
  private def collectMerges(documents: DataFrame, k: Int): Seq[(String, String)] =
    bpeTrain(documents, k)
      .select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1))).toIndexedSeq

  def bpeEncode(documents: DataFrame, k: Int = BpeRounds): DataFrame =
    bpeEncodeWith(documents, collectMerges(documents, k))

  /** Encode against an EXPLICIT ordered merge list (the tokenizer
    * model) — the body [[bpeEncode]] and the committed-tokenizer serve
    * path share: a pure map-side chain of k greedy folds, streaming-
    * safe (no shuffle, no state). Merge ORDER is the model: BPE applies
    * rules in learned order, so callers must pass the round-sorted list.
    */
  def bpeEncodeWith(documents: DataFrame, merges: Seq[(String, String)],
                    extraCols: Seq[String] = Nil): DataFrame = {
    val sep = lit(BpeSep)
    val seg0 = concat(sep, concat_ws(BpeSep,
      filter(split(col("text"), ""), s => s =!= lit(""))), sep)
    val segFinal = merges.foldLeft(seg0) { case (acc, (l, r)) =>
      foldMergePair(acc, l, r)
    }
    documents.select(
      Seq(col("doc_id")) ++ extraCols.map(col) ++ Seq(
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(filter(split(segFinal, BpeSep),
          s => s =!= lit("") && s =!= lit(" "))).cast("long").as("n_bpe_tokens")): _*)
  }

  /** C79: per-language tokenizer fertility — BPE tokens per whitespace
    * word by language, the tokenizer-quality dashboard number every
    * multilingual pretraining run watches (a tokenizer trained on the
    * majority language over-fragments the minority ones; fertility per
    * lang is how that shows up before any training loss does). The
    * encode is C43c's zero-shuffle fold with the lang column riding
    * along; the rollup is one bounded lang-keyed agg. Fertility =
    * round(Σbpe / Σws, 4) — exact int sums, one IEEE division.
    */
  def tokenizerFertility(documents: DataFrame, k: Int = BpeRounds): DataFrame =
    fertilityWith(documents, collectMerges(documents, k))

  /** The fertility rollup against an EXPLICIT merge list — the shape
    * the tokenizer bundle commits (stats measured with the COMMITTED
    * merges, never a fresh train's).
    */
  private[graft] def fertilityWith(documents: DataFrame,
                                   merges: Seq[(String, String)]): DataFrame =
    bpeEncodeWith(documents, merges, Seq("lang"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_ws_tokens").as("ws_tokens"),
        sum("n_bpe_tokens").as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        round(col("bpe_tokens").cast("double") / col("ws_tokens"), 4).as("fertility"))

  def tokenizerFertilitySql(k: Int = BpeRounds): String = {
    val rounds = (1 to k).map(bpeRoundCtes(_, withDoc = true)).mkString(",\n")
    s"""$bpeVocabSeedSql,
       |d0 AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |         chr(31) || array_to_string(string_split(text, ''), chr(31)) || chr(31) AS dseg
       |       FROM documents),
       |$rounds,
       |enc AS (SELECT doc_id, n_ws_tokens,
       |    CAST(len(list_filter(string_split(dseg, chr(31)),
       |         x -> x <> '' AND x <> ' ')) AS BIGINT) AS n_bpe_tokens
       |  FROM d$k)
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(e.n_ws_tokens) AS BIGINT) AS ws_tokens,
       |  CAST(sum(e.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
       |  round(CAST(sum(e.n_bpe_tokens) AS DOUBLE) / sum(e.n_ws_tokens), 4) AS fertility
       |FROM enc e JOIN documents d ON e.doc_id = d.doc_id
       |GROUP BY d.lang""".stripMargin
  }

  /** Commit the trained tokenizer through the transactional format —
    * the C61/C65 model-artifact promotion: every downstream encode
    * (C43c, C25 packing, the streaming encode) LOADS the tokenizer a
    * training job committed, because a pipeline that retrains its
    * tokenizer per job ships incompatible token ids. The WHOLE ordered
    * merge list lives in ONE latest-wins row (an ordered model is
    * replaced wholesale — per-round keying would leave a shorter
    * retrain's stale tail rounds behind), so a retrain of any length
    * replaces it atomically under readers.
    */
  /** `sub`: which merge table the row lands in — "merges" (the char
    * model) or "merges_bytes" (the byte model, r13): one bundle serves
    * both tokenizers, each an atomically-replaced single-row model.
    */
  def commitBpe(merges: DataFrame, path: String, buildV: Long = 0L,
                sub: String = "merges"): Unit = {
    val row = merges
      .agg(collect_list(
        struct(col("round"), col("left_sym"), col("right_sym"))).as("m"))
      .select(lit("model").as("id"), array_sort(col("m")).as("m"),
        lit(buildV).as("build_v"))
    graft.sources.Sinks.VersionedTable.mergeUpsert(
      merges.sparkSession, s"$path/$sub", row,
      Seq("id"), "build_v", numBuckets = 1)
  }

  /** The committed tokenizer, round-ordered — ready for
    * [[bpeEncodeWith]]. Resolves through the bundle's ROOT SNAPSHOT
    * when one exists (a [[commitTokenizer]] bundle), so a reader
    * loading merges next to [[loadTokenizerFertility]] mid-extend gets
    * the pair ONE commit produced; a bare [[commitBpe]] artifact has no
    * snapshot and reads per-table latest as before.
    */
  def loadBpeMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    loadMergesSub(spark, path, "merges")

  /** The committed BYTE tokenizer (r13) — the bundle's second model;
    * snapshot-resolved like [[loadBpeMerges]], ready for
    * [[bpeEncodeBytesWith]]. Throws on a pre-r13 bundle with no byte
    * table (re-run [[commitTokenizer]] to add it).
    */
  def loadBpeMergesBytes(spark: SparkSession, path: String): Seq[(String, String)] =
    loadMergesSub(spark, path, "merges_bytes")

  private def loadMergesSub(spark: SparkSession, path: String,
                            sub: String): Seq[(String, String)] =
    graft.sources.Sinks.ArtifactSnapshot.read(spark, path, sub)
      .select("m").head().getSeq[org.apache.spark.sql.Row](0)
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq

  // ------------------------------------- committed vocab artifact (C43d)

  /** The committed BPE VOCAB artifact's shape: per-token occurrence
    * counts — a pure count monoid, so it rides [[RollupIndex]]'s
    * generic maintained-rollup machinery verbatim (per-delta partial
    * rows + ledger replay guard + fold compaction). This is what makes
    * [[bpeTrain]] resumable across crawls: each crawl commits ONE
    * token-count delta (its own corpus scan), and a retrain reads the
    * merged counts instead of rescanning every crawl ever ingested.
    *
    * The artifact stores RAW counts, not floored ones — the
    * [[BpeMinCount]] floor is a TRAIN-TIME parameter that must bind on
    * the cross-crawl MERGED counts ([[bpeTrainFromCounts]]), or
    * extend∘train would diverge from train(union): a token appearing
    * once in each of two crawls survives a floor of 2 only if the
    * counts merge first. Raw counts are fine AS A TABLE (bucketed,
    * distributed — Heaps' tail is data, not driver state); the floor
    * still guards the one driver collect, exactly as before.
    */
  val BpeVocabShape: RollupIndex.RollupShape = RollupIndex.RollupShape(
    Seq("tok"), Seq(RollupIndex.AggSpec("count", "", "cnt")))

  /** The whitespace-token fact rows [[bpeTrain]]'s corpus pass and the
    * vocab artifact's deltas both aggregate — ONE definition, so the
    * committed path can never count differently from the fresh path.
    */
  private[graft] def bpeTokFacts(documents: DataFrame): DataFrame =
    documents.select(explode(toks).as("tok")).filter(length(col("tok")) > 0)

  private def vocabPath(path: String) = s"$path/vocab"

  /** Commit one crawl's token counts into the vocab artifact (idempotent
    * per deltaId — the rollup ledger makes a replayed ingest a no-op).
    */
  def commitBpeVocab(documents: DataFrame, path: String, deltaId: String): Unit =
    RollupIndex.applyDelta(bpeTokFacts(documents), vocabPath(path), deltaId,
      BpeVocabShape)

  /** The merged (tok, cnt) table at the latest committed version. This
    * is the RETRAIN's read ([[bpeTrainCommitted]]) — a retrain must see
    * every merged crawl, never a snapshot.
    */
  def loadBpeVocab(spark: SparkSession, path: String): DataFrame =
    RollupIndex.read(spark, vocabPath(path), BpeVocabShape)

  /** The vocab counts AT THE BUNDLE SNAPSHOT — the counts the currently
    * served merges actually trained on (the bundle's root manifest pins
    * `vocab/state` alongside merges+fertility). An audit reading vocab
    * next to [[loadBpeMerges]] gets the tuple one [[commitTokenizer]]
    * produced, even while a newer crawl's counts have merged in but its
    * retrain hasn't committed yet. Falls back to latest when the path
    * has no bundle snapshot (a bare C43d vocab artifact).
    */
  def loadBpeVocabPinned(spark: SparkSession, path: String): DataFrame =
    RollupIndex.read(spark, vocabPath(path), BpeVocabShape,
      version = graft.sources.Sinks.ArtifactSnapshot
        .pinnedVersion(spark, path, "vocab/state")
        .filter(v => graft.sources.Sinks.VersionedTable
          .manifestExists(spark, RollupIndex.statePath(vocabPath(path)), v)))

  /** Fold the per-crawl partial rows (run on the ingest cadence; train
    * results are identical across it — the count monoid is associative).
    */
  def maintainBpeVocab(spark: SparkSession, path: String): Unit =
    RollupIndex.foldPartials(spark, vocabPath(path), BpeVocabShape)

  /** Train from the COMMITTED vocab: bit-identical merge sequence to a
    * fresh [[bpeTrain]] over the union of every committed crawl
    * (spec-pinned) — the resume path a 100 TB deployment actually runs:
    * no re-scan of historical corpora, just the vocab-sized merged
    * counts. Pair with [[commitBpe]] to commit the trained merges.
    */
  def bpeTrainCommitted(spark: SparkSession, path: String,
                        k: Int = BpeRounds,
                        minCount: Long = BpeMinCount): DataFrame =
    bpeTrainFromCounts(spark,
      GraftCache.persistTracked(loadBpeVocab(spark, path)), k, minCount)

  /** UTF-8 bytes as fixed-width lowercase hex pairs — the symbol
    * alphabet of the BYTE-level trainer (C91). Rendering bytes as hex
    * keeps every symbol a plain ASCII string, so the whole symbol
    * machinery is reused VERBATIM: the U+001F-separated segment
    * strings, the driver loop's interning and incremental pair counts,
    * the (n_occ DESC, left, right) tie-break (lexicographic order over
    * fixed-width lowercase hex IS numeric byte order, and both engines
    * compare the identical hex strings), and the oracle's per-round CTE
    * chain. A merged symbol is the concatenation of its parts' hex —
    * injective on byte sequences, so distinct byte strings can never
    * alias one symbol.
    */
  private[graft] def toByteSymbols(tok: String): Array[String] =
    tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x")

  /** C91: BYTE-level BPE training (the GPT-2/tiktoken formulation) next
    * to the code-point trainer (C43b): merges count over adjacent UTF-8
    * BYTE pairs inside whitespace tokens, so multi-byte scripts
    * genuinely train through byte fallback — exactly where the
    * fertility dashboard (C79) is most interesting — and no OOV symbol
    * can exist by construction (every byte is in the base alphabet).
    * Same ONE corpus-wide aggregation to the (tok, cnt) table (shared
    * with C43b/C43d — byte symbolization happens at train time, so the
    * committed vocab artifact feeds BOTH trainers), same driver-side
    * greedy loop, same admission floor and ceiling.
    */
  def bpeTrainBytes(documents: DataFrame, k: Int = BpeRounds,
                    minCount: Long = BpeMinCount): DataFrame = {
    val spark = documents.sparkSession
    GraftCache.memoArtifact(spark,
      ("bpeTrainBytes", documents.queryExecution.analyzed.canonicalized, k, minCount)) {
      bpeTrainFromCounts(spark,
        GraftCache.persistTracked(bpeTokFacts(documents)
          .groupBy("tok")
          .agg(count(lit(1)).as("cnt"))), k, minCount,
        symbolize = toByteSymbols)
    }
  }

  /** [[bpeTrainCommitted]]'s byte-level twin — the SAME committed
    * (tok, cnt) vocab artifact feeds both trainers (symbolization is a
    * train-time choice, not an ingest-time one), so one crawl-ingest
    * lifecycle serves char AND byte tokenizers.
    */
  def bpeTrainBytesCommitted(spark: SparkSession, path: String,
                             k: Int = BpeRounds,
                             minCount: Long = BpeMinCount): DataFrame =
    bpeTrainFromCounts(spark,
      GraftCache.persistTracked(loadBpeVocab(spark, path)), k, minCount,
      symbolize = toByteSymbols)

  /** The byte oracle's vocab seed: the same floored token table, each
    * token split into hex byte pairs (DuckDB hexes the raw UTF-8 via
    * the BLOB cast; `regexp_extract_all(..., '..')` chunks fixed-width
    * pairs). Rounds are [[bpeRoundCtes]] UNCHANGED — the round algebra
    * never looks inside a symbol.
    */
  private val bpeByteVocabSeedSql: String =
    s"""WITH tokx AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |t0 AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tokx
      |       WHERE len(tok) > 0 GROUP BY tok HAVING count(*) >= $BpeMinCount),
      |s0 AS (SELECT cnt,
      |         chr(31) || array_to_string(
      |           regexp_extract_all(lower(hex(CAST(tok AS BLOB))), '..'),
      |           chr(31)) || chr(31) AS seg
      |       FROM t0)""".stripMargin

  def bpeTrainBytesSql(k: Int = BpeRounds): String = {
    val rounds = (1 to k).map(bpeRoundCtes(_, withDoc = false)).mkString(",\n")
    val out = (1 to k).map { i =>
      s"SELECT $i AS round, lft AS left_sym, rgt AS right_sym, lft || rgt AS merged, n_occ FROM b$i"
    }.mkString("\n  UNION ALL ")
    s"""$bpeByteVocabSeedSql,
       |$rounds
       |SELECT * FROM (
       |  $out
       |) ORDER BY round""".stripMargin
  }

  /** C91b: encode the corpus with the BYTE-level merges — C43c's
    * zero-shuffle whole-doc fold over the hex-pair symbol string: the
    * space byte (hex "20") rides along as an ordinary symbol no learned
    * pair can bridge (pairs were counted inside whitespace tokens
    * only), so whole-doc application ≡ per-token application; token
    * count = symbols that are neither empty nor the space byte — an
    * unmerged multi-byte code point legitimately counts one token per
    * remaining byte (byte fallback's honest cost, the number
    * [[fertilityBytes]] dashboards).
    */
  def bpeEncodeBytesWith(documents: DataFrame, merges: Seq[(String, String)],
                         extraCols: Seq[String] = Nil): DataFrame = {
    val sep = lit(BpeSep)
    val seg0 = concat(sep, concat_ws(BpeSep,
      expr("regexp_extract_all(lower(hex(text)), '..', 0)")), sep)
    val segFinal = merges.foldLeft(seg0) { case (acc, (l, r)) =>
      foldMergePair(acc, l, r)
    }
    documents.select(
      Seq(col("doc_id")) ++ extraCols.map(col) ++ Seq(
        size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
        size(filter(split(segFinal, BpeSep),
          s => s =!= lit("") && s =!= lit("20"))).cast("long").as("n_bpe_tokens")): _*)
  }

  /** Ordered byte-merge list — the [[collectMerges]] discipline (merge
    * order IS the model; one shared collect keeps every consumer on the
    * round-sorted sequence). */
  private def collectByteMerges(documents: DataFrame, k: Int): Seq[(String, String)] =
    bpeTrainBytes(documents, k)
      .select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1))).toIndexedSeq

  def bpeEncodeBytes(documents: DataFrame, k: Int = BpeRounds): DataFrame =
    bpeEncodeBytesWith(documents, collectByteMerges(documents, k))

  def bpeEncodeBytesSql(k: Int = BpeRounds): String = {
    val rounds = (1 to k).map(bpeRoundCtes(_, withDoc = true)).mkString(",\n")
    s"""$bpeByteVocabSeedSql,
       |d0 AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |         chr(31) || array_to_string(
       |           regexp_extract_all(lower(hex(CAST(text AS BLOB))), '..'),
       |           chr(31)) || chr(31) AS dseg
       |       FROM documents),
       |$rounds
       |SELECT doc_id, n_ws_tokens,
       |  CAST(len(list_filter(string_split(dseg, chr(31)),
       |       x -> x <> '' AND x <> '20')) AS BIGINT) AS n_bpe_tokens
       |FROM d$k""".stripMargin
  }

  /** C79b: per-language fertility of the BYTE tokenizer — C79's twin
    * where the byte formulation earns its keep: a script the merges
    * under-cover pays one token per raw BYTE (not per code point), so
    * multi-byte-script fertility visibly exceeds the char trainer's —
    * the exact signal a multilingual tokenizer budget review needs.
    */
  def fertilityBytes(documents: DataFrame, k: Int = BpeRounds): DataFrame =
    fertilityBytesWith(documents, collectByteMerges(documents, k))

  /** [[fertilityWith]]'s byte twin — the byte-fertility rollup against
    * an EXPLICIT merge list (what the tokenizer bundle commits, r13).
    */
  private[graft] def fertilityBytesWith(documents: DataFrame,
                                        merges: Seq[(String, String)]): DataFrame =
    bpeEncodeBytesWith(documents, merges, Seq("lang"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_ws_tokens").as("ws_tokens"),
        sum("n_bpe_tokens").as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        round(col("bpe_tokens").cast("double") / col("ws_tokens"), 4).as("fertility"))

  def fertilityBytesSql(k: Int = BpeRounds): String = {
    val rounds = (1 to k).map(bpeRoundCtes(_, withDoc = true)).mkString(",\n")
    s"""$bpeByteVocabSeedSql,
       |d0 AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |         chr(31) || array_to_string(
       |           regexp_extract_all(lower(hex(CAST(text AS BLOB))), '..'),
       |           chr(31)) || chr(31) AS dseg
       |       FROM documents),
       |$rounds,
       |enc AS (SELECT doc_id, n_ws_tokens,
       |    CAST(len(list_filter(string_split(dseg, chr(31)),
       |         x -> x <> '' AND x <> '20')) AS BIGINT) AS n_bpe_tokens
       |  FROM d$k)
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(e.n_ws_tokens) AS BIGINT) AS ws_tokens,
       |  CAST(sum(e.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
       |  round(CAST(sum(e.n_bpe_tokens) AS DOUBLE) / sum(e.n_ws_tokens), 4) AS fertility
       |FROM enc e JOIN documents d ON e.doc_id = d.doc_id
       |GROUP BY d.lang""".stripMargin
  }

  // -------------------------------------------- tokenizer bundle (C43e)

  /** C43e: the tokenizer as ONE deployable versioned unit under
    * `path/` — what actually ships to a training run:
    *  - `vocab` — the C43d count rollup (cross-crawl resumable),
    *  - `merges` — the ordered merge list ([[commitBpe]]'s row),
    *  - `fertility` — per-lang fertility measured WITH the committed
    *    merges over the committing crawl (the model card's numbers;
    *    `build_v` records which tokenizer version measured each lang,
    *    so staleness is visible, never silent).
    * Bootstrap = [[commitTokenizer]]; each further crawl =
    * [[extendTokenizer]] — its counts merge into the vocab artifact
    * and the retrain reads MERGED counts, so by the C43d pin the new
    * merges are bit-identical to a fresh train on the union corpus
    * without rescanning history.
    */
  /** `byteMode` (r13): also train the BYTE tokenizer from the same
    * merged vocab ([[bpeTrainBytesCommitted]] — symbolization is a
    * train-time choice) and commit it as `merges_bytes` +
    * `fertility_bytes` in the SAME root snapshot, so one committed unit
    * serves both tokenizers and the pair can never tear apart across an
    * extend. Default on; pass false to keep the pre-r13 char-only
    * bundle (half the retrain cost).
    */
  def commitTokenizer(documents: DataFrame, path: String, deltaId: String,
                      k: Int = BpeRounds, minCount: Long = BpeMinCount,
                      byteMode: Boolean = true): Unit = {
    val spark = documents.sparkSession
    commitBpeVocab(documents, path, deltaId)
    // buildV DERIVED from the vocab ledger's applied-delta count, never
    // caller-supplied: a fixed default (r11 review) stamps every extend
    // with the same version, so fertility rows measured under older
    // merges become indistinguishable from fresh ones — exactly the
    // silent staleness build_v exists to expose. The ledger count is
    // monotone per NEW delta and flat on replays, so a replayed commit
    // re-files byte-identical versions.
    val buildV = graft.operators.RollupIndex
      .appliedDeltas(spark, vocabPath(path)).size.toLong
    val merges = bpeTrainCommitted(spark, path, k, minCount)
    commitBpe(merges, path, buildV)
    val mergeSeq = merges.orderBy("round").collect()
      .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
    graft.sources.Sinks.VersionedTable.mergeUpsert(spark, s"$path/fertility",
      fertilityWith(documents, mergeSeq).withColumn("build_v", lit(buildV)),
      Seq("lang"), "build_v", numBuckets = 4)
    val byteSubs = if (!byteMode) Nil else {
      val mergesB = bpeTrainBytesCommitted(spark, path, k, minCount)
      commitBpe(mergesB, path, buildV, sub = "merges_bytes")
      val mergeSeqB = mergesB.orderBy("round").collect()
        .map(r => (r.getString(1), r.getString(2))).toIndexedSeq
      graft.sources.Sinks.VersionedTable.mergeUpsert(
        spark, s"$path/fertility_bytes",
        fertilityBytesWith(documents, mergeSeqB)
          .withColumn("build_v", lit(buildV)),
        Seq("lang"), "build_v", numBuckets = 4)
      Seq("merges_bytes", "fertility_bytes")
    }
    // the bundle's ROOT SNAPSHOT publishes LAST (the AnnIndex/DedupIndex
    // discipline): merges and fertility pin as the pair THIS commit
    // produced — a reader can no longer load retrained merges next to
    // the previous crawl's fertility mid-extend. vocab/state is recorded
    // for provenance (readers of the vocab are retrains, not serves).
    // NOTE: a bare commitBpe deliberately does not refresh a bundle
    // snapshot — on a bundle path, mutate through commitTokenizer.
    graft.sources.Sinks.ArtifactSnapshot.commit(spark, path,
      Seq("merges", "fertility", "vocab/state") ++ byteSubs,
      refresh = Seq("merges", "fertility", "vocab/state") ++ byteSubs)
  }

  /** Ingest one more crawl into the bundle and retrain from the merged
    * vocab — train(union) semantics at delta cost. Same signature
    * discipline as the other extends: a replayed deltaId is a vocab
    * no-op (rollup ledger) and the retrain is deterministic.
    */
  def extendTokenizer(newDocs: DataFrame, path: String, deltaId: String,
                      k: Int = BpeRounds, minCount: Long = BpeMinCount,
                      byteMode: Boolean = true): Unit =
    commitTokenizer(newDocs, path, deltaId, k, minCount, byteMode)

  /** True iff the bundle at `path` has a committed merges table — the
    * stream-start fail-fast probe (the [[EvalRegistry.isRegistered]]
    * discipline): an encode stream pointed at an uncommitted or typo'd
    * bundle must be a clear config error at start(), not a per-batch
    * crash loop.
    */
  def isTokenizerCommitted(spark: SparkSession, path: String): Boolean =
    graft.sources.Sinks.VersionedTable
      .latestManifest(spark, s"$path/merges").isDefined

  /** The committed per-lang fertility stats at the bundle's snapshot
    * version (lang, n_docs, ws_tokens, bpe_tokens, fertility, build_v). */
  def loadTokenizerFertility(spark: SparkSession, path: String): DataFrame =
    graft.sources.Sinks.ArtifactSnapshot.read(spark, path, "fertility")
      .select("lang", "n_docs", "ws_tokens", "bpe_tokens", "fertility", "build_v")

  /** The BYTE tokenizer's committed per-lang fertility (r13) — same
    * snapshot resolution, so merges_bytes and fertility_bytes always
    * read as the pair one commit produced. */
  def loadTokenizerFertilityBytes(spark: SparkSession, path: String): DataFrame =
    graft.sources.Sinks.ArtifactSnapshot.read(spark, path, "fertility_bytes")
      .select("lang", "n_docs", "ws_tokens", "bpe_tokens", "fertility", "build_v")

  /** Oracle: re-derive the merge table with [[bpeTrainSql]]'s CTE chain,
    * then thread a doc-level segmentation column through the same k
    * (pair → greedy fold) rounds.
    */
  /** Oracle: re-derive the merge table with [[bpeRoundCtes]]'s shared
    * chain, threading a doc-level segmentation column through the same
    * k (pair → greedy fold) rounds.
    */
  def bpeEncodeSql(k: Int = BpeRounds): String = {
    val rounds = (1 to k).map(bpeRoundCtes(_, withDoc = true)).mkString(",\n")
    s"""$bpeVocabSeedSql,
       |d0 AS (SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       |         chr(31) || array_to_string(string_split(text, ''), chr(31)) || chr(31) AS dseg
       |       FROM documents),
       |$rounds
       |SELECT doc_id, n_ws_tokens,
       |  CAST(len(list_filter(string_split(dseg, chr(31)),
       |       x -> x <> '' AND x <> ' ')) AS BIGINT) AS n_bpe_tokens
       |FROM d$k""".stripMargin
  }

  /** C52: deterministic corpus shuffle — the global pseudorandom
    * training-order permutation every epoch needs: `shuffle_rank` =
    * 1-based rank under a seeded md5 order, stable across engines,
    * partitionings and reruns. The naive formulation is
    * `row_number() OVER (ORDER BY md5(...))` — a GLOBAL window that
    * funnels 100 TB through one task, exactly the hazard WindowAudit
    * exists to block — so the rank is assembled from
    * [[DistributedRank]] range-bucket offsets (hash-prefix buckets →
    * broadcast prefix-sum counts → LOCAL per-bucket row_number + offset,
    * parallel across 1024 buckets). The order key is the first 15 hex
    * chars of the seeded md5 parsed as int64 (exact in both engines:
    * `conv(…,16,10)` / hex-digit horner with bigint shifts), ties
    * broken by doc_id — a full 2⁶⁰-point keyspace, so ranks are a
    * permutation and bucket ranges stay balanced regardless of corpus
    * skew (hash keys are uniform by construction).
    */
  def corpusShuffle(documents: DataFrame, buckets: Int = 1024): DataFrame = {
    val hkey = conv(substring(
      md5(concat(lit("shuf"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val base = documents.select(col("doc_id"), hkey.as("hkey"), lit("all").as("g"))
    val w = Window.partitionBy("g", DistributedRank.BucketCol)
      .orderBy(col("hkey"), col("doc_id"))
    DistributedRank.withBucketOffsets(base, "g", "hkey", lit(1L), buckets)
      .withColumn("shuffle_rank",
        col(DistributedRank.OffsetCol) + row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shuffle_rank"))
  }

  val corpusShuffleSql: String =
    """WITH h AS (SELECT doc_id,
      |  CAST(list_sum(list_transform(range(1, 16), i ->
      |    (strpos('0123456789abcdef',
      |            substr(md5('shuf' || CAST(doc_id AS VARCHAR)), i, 1)) - 1)
      |    * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS BIGINT) AS hkey
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(row_number() OVER (ORDER BY hkey, doc_id) AS BIGINT) AS shuffle_rank
      |FROM h""".stripMargin

  /** C19: token-budget mix — training mixes are specified in TOKENS, not
    * documents: per language, keep documents in deterministic doc_id
    * order until the cumulative whitespace-token count reaches the
    * budget (the last document may overshoot; the budget bounds the
    * running count BEFORE each doc, the standard greedy fill).
    *
    * `lang` is a bounded catalog — a per-lang running-sum window over
    * the raw frame would single-task the dominant language at scale.
    * Distributed ranking instead ([[DistributedRank]]): range-bucket
    * doc_id, prefix-sum per-(lang, bucket) token counts on the bounded
    * aggregate, then run the running sum locally per bucket and add the
    * offset. Buckets whose offset already meets the budget are pruned
    * BEFORE the local window — at 100 TB the plan touches only the
    * prefix of each language that can still fit, not the whole corpus.
    */
  def tokenBudgetMix(documents: DataFrame, budget: Long = 5000L,
                     buckets: Int = 1024): DataFrame = {
    val base = documents
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tok"))
    val wLocal = Window.partitionBy("lang", DistributedRank.BucketCol)
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    DistributedRank.withBucketOffsets(base, "lang", "doc_id", col("n_tok"), buckets)
      .filter(col(DistributedRank.OffsetCol) < budget)
      .withColumn("cum_tok",
        col(DistributedRank.OffsetCol) + sum(col("n_tok")).over(wLocal))
      .filter(col("cum_tok") - col("n_tok") < budget)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("cum_tok"))
  }

  val tokenBudgetMixSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |FROM documents),
      |c AS (SELECT doc_id, lang, n_tok,
      |  CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
      |FROM t)
      |SELECT doc_id, lang, n_tok, cum_tok FROM c
      |WHERE cum_tok - n_tok < 5000""".stripMargin

  /** C20: composed curation pass — the end-to-end "what actually ships
    * to training" query: exact-dedup keepers ∩ quality threshold ∩
    * deterministic mix sample, in ONE DataFrame plan (three operators
    * composing; Catalyst fuses the per-doc map work into a single scan
    * pipeline, and only the dedup window shuffles).
    */
  def curatedCorpus(documents: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val keepers = dedupExact(documents).filter(!col("is_dup")).select("doc_id")
    val quality = qualityScore(documents)
      .filter(col("quality") >= minQuality)
      .select(col("doc_id"), col("quality"))
    sampleMix(documents)
      .join(keepers, "doc_id")
      .join(quality, "doc_id")
      .select(col("doc_id"), col("lang"), col("source"), col("quality"))
  }

  val curatedCorpusSql: String = {
    val inList = enStopwords.map(s => s"'$s'").mkString(", ")
    val cases = mixRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")
    s"""WITH keepers AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
       |    FROM documents) WHERE NOT is_dup),
       |q AS (SELECT doc_id,
       |    0.5 * least(CAST(n_chars AS DOUBLE) / 400.0, 1.0)
       |      + 0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |               / len(string_split(text, ' '))) AS quality
       |  FROM documents),
       |sampled AS (SELECT doc_id, lang, source FROM (
       |    SELECT doc_id, lang, source,
       |      CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) AS selector,
       |      CAST(CASE $cases ELSE 0 END AS BIGINT) AS keep_rate
       |    FROM documents) WHERE selector < keep_rate)
       |SELECT s.doc_id, s.lang, s.source, q.quality
       |FROM sampled s JOIN keepers k ON s.doc_id = k.doc_id
       |  JOIN q ON s.doc_id = q.doc_id
       |WHERE q.quality >= 0.5""".stripMargin
  }

  /** C26: incremental dedup — dedup a NEW ingest batch against the
    * historical corpus (the daily shape of a 100 TB pipeline: the
    * historical side is a fingerprint index maintained by
    * `Sinks.mergeUpsertBucketed`, not a rescan of the corpus; here both
    * sides derive from the documents table with a deterministic 80/20
    * split so the oracle can re-create them). One shuffle on the
    * fingerprint — the historical side ships only its (distinct) fp
    * column, never text.
    */
  def dedupIncremental(documents: DataFrame): DataFrame = {
    val fp = documents.select(col("doc_id"), md5(col("text")).as("fp"))
    val hist = fp.filter(pmod(col("doc_id"), lit(10)) < 8)
      .select("fp").distinct()
    fp.filter(pmod(col("doc_id"), lit(10)) >= 8)
      .join(hist.withColumn("is_known", lit(true)), Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        coalesce(col("is_known"), lit(false)).as("is_known"))
  }

  val dedupIncrementalSql: String =
    """WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |hist AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 < 8)
      |SELECT f.doc_id, f.fp, h.fp IS NOT NULL AS is_known
      |FROM fp f LEFT JOIN hist h ON f.fp = h.fp
      |WHERE f.doc_id % 10 >= 8""".stripMargin

  /** C27: tokenizer-vocabulary coverage — per-document out-of-vocabulary
    * rate against the corpus top-`vocabSize` tokens by document
    * frequency (deterministic df-desc/token-asc tie-break). The vocab is
    * a bounded model artifact (`vocabSize` rows regardless of corpus
    * size), so the per-token membership join is a broadcast — the same
    * collected-artifact pattern as the streaming IVF codebook, with zero
    * shuffle on the token stream; only the final per-doc agg shuffles.
    */
  def oovRate(documents: DataFrame, vocabSize: Int = 20): DataFrame = {
    val vocab = documents
      .select(col("doc_id"), explode(array_distinct(toks)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token")).limit(vocabSize)
      .select("token")
    documents
      .select(col("doc_id"), explode(toks).as("token"))
      .join(broadcast(vocab.withColumn("in_vocab", lit(true))), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tok").cast("double"), 4))
  }

  val oovRateSql: String =
    """WITH tok AS (SELECT doc_id,
      |  unnest(list_distinct(string_split(text, ' '))) AS token FROM documents),
      |vocab AS (SELECT token FROM (
      |  SELECT token, count(*) AS df FROM tok GROUP BY token
      |  ORDER BY df DESC, token LIMIT 20)),
      |allt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      |SELECT a.doc_id, count(*) AS n_tok,
      |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  round(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS oov_rate
      |FROM allt a LEFT JOIN vocab v ON a.token = v.token
      |GROUP BY a.doc_id""".stripMargin

  /** C24: context-window chunking — split each document's token stream
    * into overlapping chunks of `chunkSize` tokens every `stride` tokens
    * (overlap = chunkSize - stride), the standard pre-tokenization shape
    * for long-document training and embedding-indexing pipelines. Pure
    * map-side explode (sequence of chunk starts, then an array slice per
    * start): no shuffle anywhere, embarrassingly parallel at any scale.
    * chunk_idx = start_tok / stride, so ordinals are derived, not
    * row-numbered — identical in any engine without a window.
    */
  def chunkDocs(documents: DataFrame, chunkSize: Int = 64, stride: Int = 48,
                carry: Seq[String] = Nil): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      "chunkDocs: need 0 < stride <= chunkSize")
    // `carry` columns ride along unchanged (one copy per chunk) so
    // compositions don't need a second join back to the source frame.
    val carried = carry.map(col)
    documents
      .select(col("doc_id") +: toks.as("t") +: size(toks).cast("long").as("n_tok") +: carried: _*)
      .select(col("doc_id") +: col("t") +:
        explode(sequence(lit(0L), col("n_tok") - 1, lit(stride.toLong))).as("start_tok") +:
        carried: _*)
      .select(col("doc_id") +:
        (col("start_tok") / stride).cast("long").as("chunk_idx") +:
        col("start_tok") +:
        slice(col("t"), (col("start_tok") + 1).cast("int"), lit(chunkSize)).as("chunk") +:
        carried: _*)
      .select(col("doc_id") +: col("chunk_idx") +: col("start_tok") +:
        size(col("chunk")).cast("long").as("n_chunk_tok") +:
        array_join(col("chunk"), " ").as("chunk_text") +: carried: _*)
  }

  val chunkDocsSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |s AS (SELECT doc_id, toks, n_tok,
      |  unnest(range(0, n_tok, 48)) AS start_tok FROM t)
      |SELECT doc_id, start_tok // 48 AS chunk_idx, start_tok,
      |  CAST(len(list_slice(toks, start_tok + 1, least(start_tok + 64, n_tok))) AS BIGINT) AS n_chunk_tok,
      |  array_to_string(list_slice(toks, start_tok + 1, least(start_tok + 64, n_tok)), ' ') AS chunk_text
      |FROM s""".stripMargin

  /** C25: sequence packing — assign documents to fixed token-budget bins
    * (training context windows are filled with concatenated docs; the
    * mix is specified in tokens, SURVEY §2 C19's sibling). Deterministic
    * contiguous fill per (lang, shard) stream: bin = floor(tokens-before
    * / budget), the standard approximate packing (a bin may overshoot by
    * at most one document — exact first-fit is inherently sequential).
    * Sharding bounds the running-sum window: the default shard count
    * derives from the CLUSTER ([[autoShards]] — 4 ×
    * defaultParallelism), so no window partition is ever the whole
    * corpus and a 1000-executor run doesn't silently inherit a
    * 32-shard layout tuned to the test box; pass `shards` explicitly
    * for a pinned layout (the oracle-checked queries pin 32 to match
    * the SQL's `% 32`). Output is per-bin telemetry,
    * O(total_tokens / budget) rows.
    */
  /** Shard count for the packing-family running-sum windows: an
    * explicit positive `shards` wins (pinned layouts, oracle parity);
    * otherwise 4 × the cluster's defaultParallelism — enough streams
    * that every core packs concurrently with headroom for stragglers,
    * while each (lang, shard) window partition stays ~1/(4·cores) of a
    * language's corpus rather than a box-tuned constant.
    */
  private[graft] def resolvedShards(documents: DataFrame, shards: Int): Int =
    if (shards > 0) shards
    else math.max(1, 4 * documents.sparkSession.sparkContext.defaultParallelism)

  def packSequences(documents: DataFrame, budget: Long = 512L, shards: Int = 0): DataFrame = {
    val nShards = resolvedShards(documents, shards)
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(toks).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("bin_id", expr(s"(cum_tok - n_tok) DIV $budget"))
      .groupBy("lang", "shard", "bin_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val packSequencesSql: String =
    """WITH t AS (SELECT doc_id, lang, doc_id % 32 AS shard,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |c AS (SELECT doc_id, lang, shard, n_tok,
      |  CAST(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok FROM t)
      |SELECT lang, shard, (cum_tok - n_tok) // 512 AS bin_id,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY lang, shard, bin_id""".stripMargin

  /** C106: length-sorted inference batching (r13) — [[packSequences]]'
    * SERVING-side twin. Batch inference (reward scoring, classifier
    * sweeps, embedding backfills over the corpus) pads every sequence
    * in a batch to the batch max, so random batching burns compute on
    * pad tokens; the standard fix is sorting by length and batching
    * consecutively, which this emits with the padding-waste telemetry
    * (`pad_waste` = n_docs × max_tokens − sum_tokens) a capacity plan
    * reads. Same scale shape as the packing family: the only window is
    * a row_number per (lang, shard) stream — [[resolvedShards]] keeps
    * each partition ~1/(4·cores) of a language's corpus — and the
    * output is batch-level telemetry, O(docs / batchSize) rows.
    */
  def lengthBatches(documents: DataFrame, batchSize: Int = 16,
                    shards: Int = 0): DataFrame = {
    val nShards = resolvedShards(documents, shards)
    val w = Window.partitionBy("lang", "shard").orderBy("n_tok", "doc_id")
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(toks).cast("long").as("n_tok"))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_idx", expr(s"CAST((rn - 1) DIV $batchSize AS BIGINT)"))
      .groupBy("lang", "shard", "batch_idx")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        max(col("n_tok")).as("max_tokens"),
        (max(col("n_tok")) * count(lit(1)) - sum(col("n_tok"))).as("pad_waste"))
  }

  val lengthBatchesSql: String =
    """WITH t AS (SELECT doc_id, lang, doc_id % 32 AS shard,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang, shard
      |  ORDER BY n_tok, doc_id) AS rn FROM t)
      |SELECT lang, shard, CAST((rn - 1) // 16 AS BIGINT) AS batch_idx,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(max(n_tok) AS BIGINT) AS max_tokens,
      |  CAST(max(n_tok) * count(*) - sum(n_tok) AS BIGINT) AS pad_waste
      |FROM r GROUP BY lang, shard, batch_idx""".stripMargin

  /** C28: the end-to-end training-batch pipeline in ONE plan — what a
    * 100 TB run actually executes nightly: curate (dedup keepers ∩
    * quality ∩ mix sample), chunk the survivors into context windows,
    * pack the chunks into token-budget bins per (lang, shard) stream.
    * Composes three operators ([[curatedCorpus]] → [[chunkDocs]] →
    * the [[packSequences]] fill) so Catalyst fuses the per-doc map work;
    * the only shuffles are the curation joins (doc_id-keyed), the
    * bounded per-shard running sum, and the final per-bin agg.
    */
  def trainingBatches(documents: DataFrame, budget: Long = 512L, shards: Int = 0): DataFrame = {
    val nShards = resolvedShards(documents, shards)
    // ONE doc_id join: lang rides through the chunker via `carry`, so
    // the curation subtree executes once, not once per consumer.
    val curated = curatedCorpus(documents).select(col("doc_id"), col("lang"))
    val chunks = chunkDocs(
      documents.select("doc_id", "text").join(curated, "doc_id"),
      carry = Seq("lang"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum_tok", sum(col("n_chunk_tok")).over(w))
      .withColumn("bin_id", expr(s"(cum_tok - n_chunk_tok) DIV $budget"))
      .groupBy("lang", "shard", "bin_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  def trainingBatchesSql: String =
    s"""WITH curated AS (SELECT doc_id, lang FROM ($curatedCorpusSql)),
       |t AS (SELECT d.doc_id, c.lang, string_split(d.text, ' ') AS toks,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents d JOIN curated c ON d.doc_id = c.doc_id),
       |s AS (SELECT doc_id, lang, toks, n_tok,
       |  unnest(range(0, n_tok, 48)) AS start_tok FROM t),
       |ch AS (SELECT doc_id, lang, doc_id % 32 AS shard, start_tok // 48 AS chunk_idx,
       |  CAST(len(list_slice(toks, start_tok + 1, least(start_tok + 64, n_tok))) AS BIGINT) AS n_chunk_tok
       |  FROM s),
       |cum AS (SELECT *, CAST(sum(n_chunk_tok) OVER (PARTITION BY lang, shard
       |    ORDER BY doc_id, chunk_idx ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok FROM ch)
       |SELECT lang, shard, (cum_tok - n_chunk_tok) // 512 AS bin_id,
       |  count(*) AS n_chunks, CAST(sum(n_chunk_tok) AS BIGINT) AS n_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum GROUP BY lang, shard, bin_id""".stripMargin

  /** C29: PII redaction — scrub emails and phone numbers from document
    * text before it can enter a training mix, with per-doc telemetry
    * (how many of each were hit) so the curation report can audit scrub
    * coverage. Pure map-side regexp work (codegen'd `RegExpReplace` /
    * `RegExpCount` — embarrassingly parallel, zero shuffle at any scale).
    *
    * The synthetic `documents` corpus is word-salad with no digits, so a
    * redactor run straight over it proves nothing; the query plants a
    * DETERMINISTIC contact line per doc (derived from doc_id, identical
    * expression in the oracle) and must then scrub exactly that. The
    * redacted text is surfaced as md5 so the driver compares the full
    * post-redaction bytes without shipping wide rows.
    *
    * Regex subset chosen to evaluate identically in Java regex (Spark)
    * and RE2 (DuckDB): character classes, bounded repetition — no
    * lookaround, no backrefs.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"

  def piiRedact(documents: DataFrame): DataFrame = {
    val planted = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    documents
      .select(col("doc_id"), planted.as("t"))
      .select(
        col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("redacted_md5"))
  }

  val piiRedactSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  text || ' contact user' || CAST(doc_id AS VARCHAR)
       |       || '@mail.example.com or +1-555-'
       |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |      '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM t""".stripMargin

  /** C34: intra-document repetition profile — the Gopher/MassiveText
    * repetition signals (duplicated n-gram fraction, most-frequent
    * n-gram share) computed per document, entirely map-side: every
    * metric is a higher-order-function pass over the doc's own token
    * array, so the operator is a zero-shuffle projection at any corpus
    * size. Per-doc cost is O(distinct·len) — bounded by doc length, the
    * same contract as the quality rules; a corpus of book-length docs
    * chunks first (C24) and profiles the chunks.
    *
    * Thresholds are parameters: Gopher's published cuts (top 2-gram
    * share 0.18, dup-line fraction 0.30) target web text; the defaults
    * here are tuned down so the flag actually fires on the synthetic
    * word-salad corpus — the reference would tune them per-source the
    * same way.
    */
  def repetitionProfile(documents: DataFrame,
                        topBigramThresh: Double = 0.08,
                        dupBigramThresh: Double = 0.05): DataFrame = {
    val n = size(toks).cast("long")
    val nb = greatest(size(toks) - 1, lit(1)).cast("long")
    documents
      .select(col("doc_id"), n.as("n_tokens"), nb.as("nb"),
        Exprs.repStats(toks).as("rs"))
      // raw IEEE doubles, same rationale as qualityScore
      .select(col("doc_id"), col("n_tokens"),
        (col("rs.top_tok").cast("double") / col("n_tokens")).as("top_tok_share"),
        (col("rs.top_bg").cast("double") / col("nb")).as("top_bigram_share"),
        (lit(1.0) - col("rs.nd_bg").cast("double") / col("nb")).as("dup_bigram_frac"))
      .withColumn("repetitive",
        col("top_bigram_share") > topBigramThresh ||
          col("dup_bigram_frac") > dupBigramThresh)
  }

  def repetitionProfileSql(topBigramThresh: Double = 0.08,
                           dupBigramThresh: Double = 0.05): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |b AS (SELECT doc_id, w,
       |    list_transform(range(1, greatest(len(w) - 1, 1) + 1),
       |      i -> array_to_string(list_slice(w, i, i + 1), ' ')) AS bg
       |  FROM t),
       |m AS (SELECT doc_id,
       |    CAST(len(w) AS BIGINT) AS n_tokens,
       |    CAST(list_max(list_transform(list_distinct(w),
       |      tk -> len(list_filter(w, x -> x = tk)))) AS DOUBLE) / len(w) AS top_tok_share,
       |    CAST(list_max(list_transform(list_distinct(bg),
       |      tk -> len(list_filter(bg, x -> x = tk)))) AS DOUBLE)
       |      / greatest(len(w) - 1, 1) AS top_bigram_share,
       |    1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
       |      / greatest(len(w) - 1, 1) AS dup_bigram_frac
       |  FROM b)
       |SELECT doc_id, n_tokens, top_tok_share, top_bigram_share, dup_bigram_frac,
       |  (top_bigram_share > $topBigramThresh OR dup_bigram_frac > $dupBigramThresh)
       |    AS repetitive
       |FROM m""".stripMargin

  /** Portable SQL for the BIGINT value of the first `n` hex nibbles of
    * the string expression `h` (Horner form; every operand is cast to
    * BIGINT up front so neither engine does 32-bit arithmetic). Same
    * nibble trick as [[sampleMix]]'s selector — `instr`/`substr`/`md5`
    * agree byte-for-byte between Spark and DuckDB. The single
    * definition behind every hash-rank operator (sampled LSH overflow,
    * reservoir sampling).
    */
  def hexPrefixValSql(h: String, n: Int = 8): String =
    (2 to n).foldLeft(s"CAST(instr('0123456789abcdef', substr($h, 1, 1)) - 1 AS BIGINT)") {
      (acc, i) => s"($acc * 16 + instr('0123456789abcdef', substr($h, $i, 1)) - 1)"
    }

  /** C35: deterministic train/val/test split assignment — two md5
    * nibbles of the doc key give a 0..255 bucket, carved 240/8/8
    * (93.75% / 3.125% / 3.125%). Hash-keyed (never random()): the same
    * doc lands in the same split on every engine, every partitioning,
    * every rerun — the property that makes a held-out set trustworthy
    * across pipeline versions. Pure map-side projection, zero shuffle,
    * same selector idiom as C14's sample mix.
    */
  def splitAssign(documents: DataFrame,
                  trainUpto: Int = 240, valUpto: Int = 248): DataFrame = {
    val bucket = expr(
      "CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1 AS BIGINT) * 16" +
        " + CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1 AS BIGINT)")
    documents.select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpto, "train")
          .when(col("bucket") < valUpto, "val")
          .otherwise("test"))
  }

  def splitAssignSql(trainUpto: Int = 240, valUpto: Int = 248): String =
    s"""WITH t AS (SELECT doc_id, lang,
       |  CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS BIGINT) * 16
       |    + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS BIGINT) AS bucket
       |FROM documents)
       |SELECT doc_id, lang, bucket,
       |  CASE WHEN bucket < $trainUpto THEN 'train'
       |       WHEN bucket < $valUpto THEN 'val'
       |       ELSE 'test' END AS split
       |FROM t""".stripMargin

  /** C36: cross-source duplication matrix — for every unordered source
    * pair, how many near-dup fingerprints (C11's w=5 min-hash) they
    * share. The go/no-go artifact for adding a new crawl source: high
    * overlap with an existing source means mostly-redundant data.
    *
    * Scale shape: NO fingerprint self-join. Group by fp, collect the
    * distinct sources carrying it — the set is bounded by the source
    * catalog (a dim, not data-proportional) — then expand ordered pairs
    * map-side and count. One shuffle on fp, one on the ≤|sources|²
    * pair frame. The oracle takes the equivalent self-join form
    * (fine single-node).
    */
  def sourceOverlap(documents: DataFrame, w: Int = 5): DataFrame = {
    // no pre-distinct: collect_set dedups sources itself, so the raw
    // (source, fp) projection goes straight into ONE shuffle on fp
    // (partial collect_sets combine map-side and stay catalog-bounded)
    documents
      .select(col("source"),
        array_min(transform(Exprs.shingles(toks, w), s => md5(s))).as("fp"))
      .groupBy("fp")
      .agg(array_sort(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("source_a"), col("p.b").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  def sourceOverlapSql(w: Int = 5): String =
    s"""WITH f AS (SELECT source,
       |    list_aggregate(list_transform(${shinglesSqlExpr(w)}, s -> md5(s)), 'min') AS fp
       |  FROM documents),
       |ds AS (SELECT DISTINCT fp, source FROM f)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_shared
       |FROM ds a JOIN ds b ON a.fp = b.fp AND a.source < b.source
       |GROUP BY 1, 2""".stripMargin

  /** C37: corpus heavy hitters (bigrams above a 1/k frequency share)
    * via the two-pass sketch-then-verify pattern:
    *
    * pass 1 — ONE [[graft.functions.Exprs.MisraGries]] aggregate over
    * the bigram stream: k counters per partition, merged to a global
    * candidate summary + the exact stream length N, no vocabulary-wide
    * shuffle anywhere. MG guarantees every true heavy hitter (freq >
    * N/k) is among the candidates, whatever the merge order.
    *
    * pass 2 — exact counts for the ≤k candidates only: broadcast the
    * candidate list, count matching occurrences (the partial hash-agg
    * reduces each partition to ≤k rows before the exchange), keep
    * `cnt * k > N` (integer arithmetic, no division).
    *
    * The candidate CONTENT is merge-order dependent; the final output
    * is not — the superset guarantee plus exact verification makes it
    * engine-reproducible, which is why it can face a plain exact SQL
    * oracle. k=800 sits below the 916-bigram vocabulary so eviction is
    * genuinely exercised at every test SF.
    */
  def heavyHitters(documents: DataFrame, k: Int = 800): DataFrame = {
    // native Ngrams, not the transform/slice builtin: the occurrence
    // stream is the hot path here (scanned twice), and the interpreted
    // lambda chain alone cost ~1.8 s of the query's 3.5 s at sf0.1
    val bg = documents.select(explode(Exprs.ngrams(toks, 2)).as("gram"))
    val cand = bg.agg(
      Exprs.misraGries(col("gram"), k).as("cand"),
      count(lit(1)).as("n"))
    val candG = cand.select(col("n"), explode(col("cand")).as("c"))
      .select(col("c.token").as("gram"), col("n"))
    bg.join(broadcast(candG), "gram")
      .groupBy("gram", "n")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > col("n"))
      .select(col("gram"), col("cnt"))
  }

  def heavyHittersSql(k: Int = 800): String =
    s"""WITH tw AS (SELECT string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 1) + 1),
       |    i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS gram FROM tw),
       |n AS (SELECT count(*) AS nn FROM bg),
       |c AS (SELECT gram, count(*) AS cnt FROM bg GROUP BY 1)
       |SELECT gram, cnt FROM c, n WHERE cnt * $k > nn""".stripMargin

  /** C38: exact-size-N deterministic sample ("reservoir" semantics,
    * engine-reproducible): the N docs with the smallest md5 hash rank.
    * Rate-based sampling (C14) can't hit an exact target count; this
    * can — the distributed idiom is a bounded top-k AGGREGATE over the
    * hash rank ([[graft.functions.Exprs.MaxKScored]], k-bounded partials,
    * one shuffle of O(partitions × N) pairs), never `ORDER BY rand()
    * LIMIT N` (global sort + nondeterminism) and never a rank window.
    * The ≤N winners broadcast back for the attribute join.
    */
  def reservoirSample(documents: DataFrame, n: Int = 100): DataFrame = {
    val rkey = expr(hexPrefixValSql("md5(CAST(doc_id AS STRING))"))
    val keep = documents
      .select(col("doc_id"), rkey.as("rkey"))
      .agg(Exprs.maxKScored(col("rkey").cast("double") * -1d, col("doc_id"), n).as("keep"))
      .select(posexplode(col("keep")).as(Seq("pos", "t")))
      .select(col("t.id").as("doc_id"), (col("pos") + 1).cast("long").as("rn"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(broadcast(keep), "doc_id")
  }

  def reservoirSampleSql(n: Int = 100): String =
    s"""WITH r AS (SELECT doc_id, lang, source,
       |    ${hexPrefixValSql("md5(CAST(doc_id AS VARCHAR))")} AS rkey
       |  FROM documents)
       |SELECT doc_id, lang, source, rn FROM (
       |  SELECT *, row_number() OVER (ORDER BY rkey, doc_id) AS rn FROM r)
       |WHERE rn <= $n""".stripMargin

  /** C47: stratified exact-size sampling — N docs per language stratum
    * (eval-set construction / per-language probes want equal-size
    * samples regardless of how skewed the corpus mix is). Same
    * deterministic md5-rank selection as C38, but the bounded
    * [[graft.functions.Exprs.MaxKScored]] aggregate runs PER STRATUM:
    * map-side partials stay k-bounded per (partition, lang), the
    * shuffle moves O(strata × N) pairs, and no per-stratum rank window
    * ever sorts the raw corpus (at 100 TB the dominant language would
    * be one unsplittable window partition). Strata come from the
    * bounded lang catalog, so the winner set broadcasts back for the
    * attribute join.
    */
  def stratifiedSample(documents: DataFrame, n: Int = 40): DataFrame = {
    val rkey = expr(hexPrefixValSql("md5(CAST(doc_id AS STRING))"))
    val keep = documents
      .select(col("lang"), col("doc_id"), rkey.as("rkey"))
      .groupBy("lang")
      .agg(Exprs.maxKScored(col("rkey").cast("double") * -1d, col("doc_id"), n).as("keep"))
      .select(posexplode(col("keep")).as(Seq("pos", "t")))
      .select(col("t.id").as("doc_id"), (col("pos") + 1).cast("long").as("rn"))
    documents.select(col("doc_id"), col("lang"), col("source"))
      .join(broadcast(keep), "doc_id")
  }

  def stratifiedSampleSql(n: Int = 40): String =
    s"""WITH r AS (SELECT doc_id, lang, source,
       |    ${hexPrefixValSql("md5(CAST(doc_id AS VARCHAR))")} AS rkey
       |  FROM documents)
       |SELECT doc_id, lang, source, rn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY rkey, doc_id) AS rn
       |  FROM r)
       |WHERE rn <= $n""".stripMargin

  /** C39: epoch-weighted upsampling — training-mix recipes specify
    * EPOCHS per source (replicate high-quality sources, single-pass the
    * rest); this materializes the replicated stream with an epoch index
    * per copy. Pure map-side explode (output rows = Σ epochs·docs, no
    * shuffle); the epoch column keeps copies distinguishable so a
    * downstream shuffler/packer (C25) interleaves rather than
    * back-to-back repeats.
    */
  def epochMix(documents: DataFrame): DataFrame = {
    // deterministic per-source weight 1..3 from the source id's digits
    val epochs = expr("CAST(substr(source, 4) AS BIGINT) % 3 + 1")
    documents
      .select(col("doc_id"), col("lang"), col("source"), epochs.as("epochs"))
      .select(col("doc_id"), col("lang"), col("source"), col("epochs"),
        explode(sequence(lit(1L), col("epochs"))).as("epoch"))
  }

  val epochMixSql: String =
    """SELECT doc_id, lang, source, epochs,
      |  unnest(range(1, epochs + 1)) AS epoch
      |FROM (SELECT doc_id, lang, source,
      |    CAST(substr(source, 4) AS BIGINT) % 3 + 1 AS epochs
      |  FROM documents)""".stripMargin

  /** C73: temperature-smoothed source mixing — the mT5/PaLM sampling
    * knob. Where C14/C39 apply FIXED per-group rates, temperature
    * mixing derives the rate from the corpus itself: target share
    * q_s ∝ n_s^α (token mass n_s, α = 1/2 here — "temperature 2"),
    * flattening the source distribution so a dominant crawl can't
    * drown the small high-quality sources. With the standard
    * no-upsampling normalization (largest rate = 1, i.e. the smallest
    * source keeps everything) the per-source keep rate collapses to
    * r_s = √(n_min / n_s) — realized share after sampling is exactly
    * the α-smoothed target.
    *
    * Exactness: α = 1/2 means the draw rule u/10⁶ < √(n_min/n_s)
    * squares into pure integers — u²·n_s < 10¹²·n_min — evaluated in
    * DECIMAL(38,0) (DuckDB HUGEINT), so there is no pow/sqrt anywhere
    * and no float in the decision: the same doc draws the same verdict
    * on every engine, partitioning and rerun (C35's property). The
    * per-doc u is the C65b md5-prefix draw with its own salt.
    *
    * Shape at 100 TB: one bounded per-source token agg (catalog-sized,
    * broadcast back), a 1-row min broadcast, the map-side decision,
    * and one bounded per-source summary agg — the corpus is scanned
    * once and never shuffled.
    */
  /** The per-source rate table the temperature draw needs:
    * (source, src_tok, min_tok) — one bounded agg plus a 1-row min
    * broadcast, catalog-sized, and therefore a committable model
    * artifact ([[commitTemperature]]) exactly like the DSIR ratio
    * table: train once on the trusted corpus snapshot, gate live
    * ingest from the committed table without rescanning the corpus.
    */
  def temperatureRates(documents: DataFrame): DataFrame = {
    val masses = documents
      .groupBy("source")
      .agg(sum(size(toks).cast("long")).as("src_tok"))
    masses.crossJoin(broadcast(masses.agg(min("src_tok").as("min_tok"))))
  }

  /** Per-doc temperature verdicts against a rate table (in-session or
    * committed): broadcast join + the exact integer draw — stateless,
    * zero-shuffle beyond the broadcast, the same body batch and
    * streaming ([[graft.streaming.EventStream.streamingTemperatureGate]]).
    */
  def temperatureDecisions(documents: DataFrame, rates: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val u = expr(hexPrefixValSql("md5(concat('tm_', CAST(doc_id AS STRING)))")) % lit(1000000L)
    documents
      .select(col("doc_id"), col("source"), size(toks).cast("long").as("n_tok"), u.as("u"))
      .join(broadcast(rates), "source")
      .select(col("doc_id"), col("source"), col("n_tok"),
        ((col("u") * col("u")).cast(dec) * col("src_tok").cast(dec) <
          lit(1000000000000L).cast(dec) * col("min_tok").cast(dec)).as("kept"))
  }

  def temperatureMix(documents: DataFrame): DataFrame =
    temperatureDecisions(documents, temperatureRates(documents))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tok"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("kept_tok"))
      .select(col("source"), col("n_docs"), col("n_tok"), col("n_kept"), col("kept_tok"),
        round(col("n_kept").cast("double") / col("n_docs"), 4).as("kept_rate"))

  /** Commit the temperature rate table through the transactional
    * format (the DSIR `commit`/`loadLr` promotion): keyed by source,
    * single bucket (catalog-sized), latest build_v wins — a retrain on
    * corpus growth commits atomically under live readers and rewrites
    * every source row (min_tok is global, so a retrain is always a
    * full-table upsert, never a partial one).
    */
  def commitTemperature(rates: DataFrame, path: String, buildV: Long = 0L): Unit = {
    val spark = rates.sparkSession
    graft.sources.Sinks.VersionedTable.mergeUpsert(spark, path + "/temp_rates",
      rates.withColumn("build_v", lit(buildV)),
      Seq("source"), "build_v", numBuckets = 1)
  }

  def loadTemperature(spark: SparkSession, path: String): DataFrame =
    graft.sources.Sinks.VersionedTable.read(spark, path + "/temp_rates")
      .select("source", "src_tok", "min_tok")

  val temperatureMixSql: String =
    s"""WITH m AS (SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS src_tok
       |  FROM documents GROUP BY source),
       |mn AS (SELECT min(src_tok) AS min_tok FROM m),
       |d AS (SELECT d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |    (${hexPrefixValSql("md5('tm_' || CAST(doc_id AS VARCHAR))")} % 1000000) AS u,
       |    m.src_tok, mn.min_tok
       |  FROM documents d JOIN m ON d.source = m.source CROSS JOIN mn),
       |k AS (SELECT source, n_tok,
       |    CAST(u * u AS HUGEINT) * src_tok
       |      < CAST(1000000000000 AS HUGEINT) * min_tok AS kept
       |  FROM d)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tok,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tok,
       |  round(CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
       |    AS kept_rate
       |FROM k GROUP BY source""".stripMargin

  /** The UniMax waterfill over a collected per-source mass table
    * (Chung et al. 2023): sources ascending by (mass, name); each takes
    * the uniform share of the REMAINING budget over the REMAINING
    * sources, capped at `epochCap` epochs of its own mass. Pure integer
    * floor arithmetic — deterministic, engine-portable (the oracle runs
    * the identical fold as a recursive CTE). Driver-side over the
    * catalog-sized mass list (the codebook convention: constant-size
    * model artifacts may collect; the corpus never does).
    */
  private[graft] def unimaxAlloc(masses: Seq[(String, Long)], budget: Long,
                                 epochCap: Long): Seq[(String, Long, Long)] = {
    var brem = budget
    var k = masses.length
    masses.sortBy { case (s, n) => (n, s) }.map { case (s, n) =>
      val t = math.min(epochCap * n, brem / k)
      brem -= t
      k -= 1
      (s, n, t)
    }
  }

  /** C76: UniMax epoch-capped uniform mixing — the OTHER principled
    * mixer next to C74's temperature smoothing (Chung et al. 2023:
    * temperature sampling still over-allocates head sources and
    * over-epochs tail ones; UniMax instead spreads the token budget as
    * UNIFORMLY as possible subject to a per-source repetition cap).
    * Ascending waterfill: small sources hit the epoch cap (every token
    * used, ≤ cap repeats), large ones get the uniform share of what
    * remains. Output per source: the allocation, its exact
    * full-epoch/remainder split (`alloc div n`, `alloc mod n` — what
    * C39's replicator and C19's budget truncation realize downstream),
    * and the fractional epochs for telemetry.
    *
    * Budget defaults to (27·total) div 10 tokens with cap 3 — chosen so
    * BOTH waterfill branches fire on the near-uniform synthetic source
    * masses (LlmOpsSpec plants a skewed table to pin the branch
    * algebra; the budget-conservation property Σalloc == B holds unless
    * even the largest source capped, which the spec also pins).
    *
    * Scale shape: ONE bounded per-source agg (partial+final, keyed on
    * the catalog-sized source column); the fold itself touches k rows
    * on the driver and the corpus is never collected, shuffled, or
    * rescanned. The oracle mirrors the fold with a recursive CTE over
    * the same ordered mass table.
    */
  def unimaxMix(documents: DataFrame, epochCap: Long = 3L,
                budgetNum: Long = 27L, budgetDen: Long = 10L): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val masses = documents
      .groupBy("source")
      .agg(sum(size(toks).cast("long")).as("n_tok"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    val budget = budgetNum * masses.map(_._2).sum / budgetDen
    unimaxAlloc(masses, budget, epochCap)
      .toDF("source", "n_tok", "alloc_tok")
      .select(col("source"), col("n_tok"), col("alloc_tok"),
        expr("alloc_tok div n_tok").as("full_epochs"),
        (col("alloc_tok") % col("n_tok")).as("rem_tok"),
        round(col("alloc_tok").cast("double") / col("n_tok"), 4).as("epochs"))
  }

  /** The waterfill fold as a reusable recursive-CTE chain (ends with
    * `w`) — the SINGLE SQL definition of the allocation rule, spliced
    * by both C76's summary oracle and C76b's realization oracle so the
    * two can never disagree on an allocation.
    */
  private def unimaxAllocCtes(epochCap: Long, budgetNum: Long,
                              budgetDen: Long): String =
    s"""m AS (SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
       |  FROM documents GROUP BY source),
       |o AS (SELECT source, n_tok,
       |    row_number() OVER (ORDER BY n_tok, source) AS rn FROM m),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(n_tok) AS BIGINT) AS tot FROM m),
       |w AS (
       |  SELECT CAST(0 AS BIGINT) AS rn,
       |    ($budgetNum * tot) // $budgetDen AS brem, k AS krem,
       |    CAST(NULL AS VARCHAR) AS source,
       |    CAST(0 AS BIGINT) AS n_tok, CAST(0 AS BIGINT) AS alloc_tok
       |  FROM t
       |  UNION ALL
       |  SELECT o.rn,
       |    w.brem - least($epochCap * o.n_tok, w.brem // w.krem),
       |    w.krem - 1, o.source, o.n_tok,
       |    least($epochCap * o.n_tok, w.brem // w.krem)
       |  FROM w JOIN o ON o.rn = w.rn + 1)""".stripMargin

  def unimaxMixSql(epochCap: Long = 3L,
                   budgetNum: Long = 27L, budgetDen: Long = 10L): String =
    s"""WITH RECURSIVE
       |${unimaxAllocCtes(epochCap, budgetNum, budgetDen)}
       |SELECT source, n_tok, alloc_tok,
       |  alloc_tok // n_tok AS full_epochs,
       |  alloc_tok % n_tok AS rem_tok,
       |  round(CAST(alloc_tok AS DOUBLE) / n_tok, 4) AS epochs
       |FROM w WHERE rn > 0""".stripMargin

  /** C76b: REALIZE the UniMax allocation — the doc-level epoch-stamped
    * stream C76's summary promises, composed from the pieces that
    * already exist: the waterfill's exact (full_epochs, rem_tok) split,
    * C39's epoch replication for the full epochs, and C19's
    * budget-prefix truncation for the remainder epoch. Every doc row
    * carries `emit_tok` — the tokens this copy contributes (= n_tok on
    * full epochs; the remainder epoch's BOUNDARY doc is truncated
    * mid-doc to land the allocation exactly) — so conservation is an
    * algebraic identity the oracle pins: Σ emit_tok per source =
    * full_epochs·n_tok + rem_tok = alloc_tok. Exact integer arithmetic
    * end to end; deterministic doc order (doc_id) for the remainder
    * prefix, C35's rerun-stability property.
    *
    * Scale shape: the allocation is a catalog-sized broadcast; full
    * epochs are a map-side explode (no shuffle beyond the source agg
    * the waterfill already paid); the remainder epoch is C19's
    * DistributedRank prefix — range-bucketed offsets on a bounded agg,
    * local running sums per (source, bucket), buckets past the
    * remainder pruned BEFORE the window, so at 100 TB the plan touches
    * only each source's remainder-sized prefix, never the corpus-wide
    * running sum in one task.
    */
  def unimaxApply(documents: DataFrame, epochCap: Long = 3L,
                  budgetNum: Long = 27L, budgetDen: Long = 10L,
                  buckets: Int = 1024): DataFrame = {
    val alloc = unimaxMix(documents, epochCap, budgetNum, budgetDen)
      .select(col("source"), col("full_epochs"), col("rem_tok"))
    val base = documents
      .select(col("doc_id"), col("source"), size(toks).cast("long").as("n_tok"))
    val fullRep = base.join(broadcast(alloc), "source")
      // the >= 1 guard is load-bearing: sequence(1, 0) is the DESCENDING
      // two-element array [1, 0], not empty
      .filter(col("full_epochs") >= 1L)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("full_epochs"))).as("epoch"),
        col("n_tok"), col("n_tok").as("emit_tok"))
    val wLocal = Window.partitionBy("source", DistributedRank.BucketCol)
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val part = DistributedRank
      .withBucketOffsets(base, "source", "doc_id", col("n_tok"), buckets)
      .join(broadcast(alloc), "source")
      .filter(col(DistributedRank.OffsetCol) < col("rem_tok"))
      .withColumn("cum_tok",
        col(DistributedRank.OffsetCol) + sum(col("n_tok")).over(wLocal))
      .filter(col("cum_tok") - col("n_tok") < col("rem_tok"))
      .select(col("doc_id"), col("source"),
        (col("full_epochs") + 1L).as("epoch"), col("n_tok"),
        least(col("n_tok"),
          col("rem_tok") - (col("cum_tok") - col("n_tok"))).as("emit_tok"))
    fullRep.unionByName(part)
  }

  def unimaxApplySql(epochCap: Long = 3L,
                     budgetNum: Long = 27L, budgetDen: Long = 10L): String =
    s"""WITH RECURSIVE
       |${unimaxAllocCtes(epochCap, budgetNum, budgetDen)},
       |alloc AS (SELECT source, alloc_tok // n_tok AS full_epochs,
       |    alloc_tok % n_tok AS rem_tok
       |  FROM w WHERE rn > 0),
       |d AS (SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |full_rep AS (
       |  SELECT d.doc_id, d.source,
       |    unnest(range(1, a.full_epochs + 1)) AS epoch, d.n_tok,
       |    d.n_tok AS emit_tok
       |  FROM d JOIN alloc a USING (source) WHERE a.full_epochs >= 1),
       |cum AS (SELECT d.*,
       |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |  FROM d),
       |part AS (
       |  SELECT c.doc_id, c.source, a.full_epochs + 1 AS epoch, c.n_tok,
       |    least(c.n_tok, a.rem_tok - (c.cum_tok - c.n_tok)) AS emit_tok
       |  FROM cum c JOIN alloc a USING (source)
       |  WHERE c.cum_tok - c.n_tok < a.rem_tok)
       |SELECT doc_id, source, epoch, n_tok, emit_tok FROM full_rep
       |UNION ALL
       |SELECT doc_id, source, epoch, n_tok, emit_tok FROM part""".stripMargin

  /** C40: per-source duplication telemetry — the dashboard number behind
    * C36's pair matrix: how internally redundant each source is
    * (1 − distinct texts / docs). Exact count-distinct compiles to
    * Spark's standard two-phase hash agg: partial distinct on
    * (source, fp) map-side, then the per-source rollup — both keyed
    * shuffles, nothing vocabulary- or corpus-wide in one task. (r14
    * audit: a single countDistinct plans without an Expand, so the
    * manual stacked-agg rewrite was a plan no-op and was dropped.)
    */
  def dupRateBySource(documents: DataFrame): DataFrame =
    documents
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct"))
      .withColumn("dup_rate",
        lit(1.0) - col("n_distinct").cast("double") / col("n_docs"))

  val dupRateBySourceSql: String =
    """SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_distinct,
      |  1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*) AS dup_rate
      |FROM documents GROUP BY source""".stripMargin

  /** C45: line-level dedup (RefinedWeb/CCNet boilerplate removal) —
    * lines that recur across ≥ `minDocs` documents are boilerplate
    * (nav bars, cookie banners, license footers) and are stripped from
    * every document, keeping the per-doc remainder in original order.
    * The synthetic corpus has no newlines, so a "line" is a
    * non-overlapping `lineTok`-token tile of the token stream — same
    * explode → doc-frequency → strip → reassemble dataflow, different
    * splitter.
    *
    * Scale shape: the line frame is a map-side explode; doc frequency
    * is a two-phase hash agg on the md5 fingerprint (partial distinct
    * (fp, doc_id) map-side, so a boilerplate line repeated millions of
    * times ships once per input partition, not once per occurrence);
    * the frequency join is fp-keyed (both sides already narrow); the
    * reassembly groups by doc_id, and a single document's lines always
    * fit one task. Order is restored with array_sort over (pos, line)
    * structs — no window anywhere.
    */
  def lineDedup(documents: DataFrame, lineTok: Int = 4, minDocs: Int = 2): DataFrame = {
    val lines = docLines(documents, lineTok)
    stripBoilerplate(lines, lineDocFreq(lines), minDocs)
  }

  /** The (doc_id, pos, line, fp) line relation of [[lineDedup]] —
    * map-side explode, shared verbatim by the streaming twin.
    */
  def docLines(documents: DataFrame, lineTok: Int = 4): DataFrame = {
    require(lineTok > 0, "docLines: need lineTok > 0")
    documents
      .select(col("doc_id"), toks.as("t"), size(toks).cast("long").as("n_tok"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_tok") - 1, lit(lineTok.toLong))).as("start_tok"),
        col("t"))
      .select(col("doc_id"),
        (col("start_tok") / lineTok).cast("long").as("pos"),
        array_join(slice(col("t"), (col("start_tok") + 1).cast("int"), lit(lineTok)), " ")
          .as("line"))
      .withColumn("fp", md5(col("line")))
  }

  /** Cross-document line frequency: (fp, ndocs). */
  def lineDocFreq(lines: DataFrame): DataFrame =
    lines.groupBy("fp").agg(countDistinct(col("doc_id")).as("ndocs"))

  /** Strip lines whose frequency (in `freq`: fp → ndocs) reaches
    * `minDocs` and reassemble each document in original order.
    *
    * Only the BOILERPLATE fps (ndocs ≥ minDocs) join: a line keeps its
    * document either way, so below-threshold rows of `freq` carry no
    * information and a left join against the filtered set is the same
    * relation as the inner join against all of it (r14, guide §2.3/§3.2
    * — the join's build side shrinks from every distinct line in the
    * corpus to just the repeated ones, which is what lets the planner
    * broadcast it instead of shuffling the full line payload by fp).
    */
  def stripBoilerplate(lines: DataFrame, freq: DataFrame, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "stripBoilerplate: need minDocs >= 2")
    val boiler = freq.filter(col("ndocs") >= minDocs).select("fp")
      .withColumn("is_boiler", lit(true))
    val kept = when(col("is_boiler").isNull, struct(col("pos"), col("line")))
    lines
      .join(boiler, Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("lines_total"),
        sum(when(col("is_boiler").isNotNull, 1L).otherwise(0L)).as("lines_removed"),
        coalesce(sum(when(col("is_boiler").isNull,
          size(split(col("line"), " ")).cast("long"))), lit(0L)).as("n_tok_after"),
        // collect_list drops the nulls from the unmatched `when`, so only
        // kept lines survive; array_sort on (pos, line) structs restores
        // document order without a window.
        array_join(transform(array_sort(collect_list(kept)), x => x.getField("line")), " ")
          .as("cleaned_text"))
  }

  val lineDedupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
      |s AS (SELECT doc_id, toks, n_tok,
      |  unnest(range(0, n_tok, 4)) AS start_tok FROM t),
      |l AS (SELECT doc_id, start_tok // 4 AS pos,
      |  array_to_string(list_slice(toks, start_tok + 1, least(start_tok + 4, n_tok)), ' ') AS line
      |  FROM s),
      |f AS (SELECT md5(line) AS fp, count(DISTINCT doc_id) AS ndocs
      |  FROM l GROUP BY 1)
      |SELECT l.doc_id, count(*) AS lines_total,
      |  CAST(sum(CASE WHEN f.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS lines_removed,
      |  CAST(coalesce(sum(CASE WHEN f.ndocs < 2
      |    THEN len(string_split(l.line, ' ')) END), 0) AS BIGINT) AS n_tok_after,
      |  coalesce(string_agg(CASE WHEN f.ndocs < 2 THEN l.line END, ' ' ORDER BY l.pos), '')
      |    AS cleaned_text
      |FROM l JOIN f ON md5(l.line) = f.fp
      |GROUP BY l.doc_id""".stripMargin

  /** Query terms for [[bm25TopDocs]] — a fixed dictionary standing in for
    * a search request; in production this is a small broadcast frame.
    */
  val Bm25Terms: Seq[String] = Seq("vector", "stream", "window", "hash")

  /** C48: BM25 relevance — per query term, the top-k documents by the
    * Okapi BM25 score (k1=1.2, b=0.75). The retrieval primitive behind
    * corpus search, contamination triage, and quality-by-query probes.
    *
    * Cross-engine hash exactness: the textbook `ln`-idf is transcendental
    * (not bit-reproducible across engines — see [[docFreq]]), so the
    * score keeps the RATIO idf surrogate (N − df + ½)/(df + ½) and
    * clears every fraction: with k1 = 6/5, b = 3/4 and avgdl = S/N
    * (S = corpus tokens, N = docs),
    *
    *   score = (2N − 2df + 1)·22·S·tf
    *         / [(2df + 1)·(10·S·tf + 3·S + 9·dl·N)]
    *
    * — numerator and denominator are EXACT int64 products (documented
    * bound: |num| < 2^63 through ~sf1; beyond that swap both sides to
    * decimal(38,0)/HUGEINT), so the single double division is the only
    * rounding and IEEE division is correctly rounded in both engines.
    *
    * Shapes at scale: dl is map-side; (N, S) is a one-row broadcast
    * scalar; tf filters to the query dictionary BEFORE the (doc, term)
    * agg (the explode never shuffles non-query tokens); df is a
    * |terms|-row broadcast. Per-term top-k uses the bounded MaxKScored
    * heap — k map-side per term, shuffle O(terms × k) — never a rank
    * window over the scored frame (`term` is a bounded key; the window
    * would put one term's whole posting list in one task).
    */
  def bm25TopDocs(documents: DataFrame, k: Int = 10): DataFrame = {
    val lens = documents.select(col("doc_id"), size(toks).cast("long").as("dl"))
      .transform(GraftCache.persistTracked)
    val corpus = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tok"))
    val tf = documents
      .select(col("doc_id"), explode(toks).as("term"))
      .filter(col("term").isInCollection(Bm25Terms))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(corpus))
      .withColumn("score",
        ((lit(2L) * col("n_docs") - lit(2L) * col("df") + 1L) * 22L * col("s_tok") * col("tf"))
          .cast("double") /
          ((lit(2L) * col("df") + 1L) *
            (lit(10L) * col("s_tok") * col("tf") + lit(3L) * col("s_tok")
              + lit(9L) * col("dl") * col("n_docs"))).cast("double"))
    scored
      .groupBy("term")
      .agg(Exprs.maxKScored(col("score"), col("doc_id"), k).as("top"))
      .select(col("term"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("term"), col("t.id").as("doc_id"), col("t.score").as("score"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** The BM25 scored-documents CTE chain (tokenize → lengths → corpus
    * totals → tf → df → exact-integer score), SHARED by the C48 oracle
    * and C54's hybrid-RRF oracle ([[Retrieval.hybridRrfSql]]) — one
    * definition of the score formula, so an adjustment to C48 can
    * never silently drift the fused oracle. `name` is the final
    * (scored) CTE's name in the caller's WITH chain.
    */
  private[operators] def bm25ScoredCtes(name: String): String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
       |g AS (SELECT count(*) AS n_docs, sum(dl) AS s_tok FROM dl),
       |tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |  WHERE term IN ($terms) GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |$name AS (
       |  SELECT tf.term, tf.doc_id,
       |    CAST((2*g.n_docs - 2*df.df + 1) * 22 * g.s_tok * tf.tf AS DOUBLE) /
       |    CAST((2*df.df + 1) * (10*g.s_tok*tf.tf + 3*g.s_tok + 9*dl.dl*g.n_docs) AS DOUBLE)
       |      AS score
       |  FROM tf JOIN df ON tf.term = df.term JOIN dl ON tf.doc_id = dl.doc_id, g)""".stripMargin
  }

  def bm25TopDocsSql(k: Int = 10): String = {
    s"""WITH ${bm25ScoredCtes("scored")}
       |SELECT term, doc_id, score, rn FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id)
       |    AS INTEGER) AS rn
       |  FROM scored) WHERE rn <= $k""".stripMargin
  }

  /** C49: per-language percentile normalization — each document's length
    * percentile within its language stratum ((rank − 1)/(n − 1), the
    * percent_rank definition). Rank-normalizing a raw quality signal
    * within strata is how heterogeneous scorers become comparable before
    * a global keep-threshold (length stands in for any integral score).
    *
    * `percent_rank() OVER (PARTITION BY lang ORDER BY n_chars)` is the
    * bounded-catalog-key window WindowAudit polices: at 100 TB one
    * dominant language is one unsplittable sort task. This routes
    * through [[DistributedRank]] instead — range-bucket the order
    * column, prefix-sum the bounded (lang, bucket) count table, then a
    * LOCAL rank per (lang, bucket) + offset. Ties share a bucket (equal
    * keys ⇒ equal bucket), so local rank + offset = global `rank()`
    * exactly. Per-lang n is a bounded broadcast; the final
    * (rank−1)/(n−1) is one exact-int double division.
    */
  def percentileNorm(documents: DataFrame): DataFrame = {
    val bucketed = DistributedRank.withBucketOffsets(
      documents.select(col("doc_id"), col("lang"), col("n_chars")),
      key = "lang", ord = "n_chars", value = lit(1L))
    val localW = Window
      .partitionBy(col("lang"), col(DistributedRank.BucketCol))
      .orderBy(col("n_chars"))
    val n = documents.groupBy("lang").agg(count(lit(1)).as("n"))
    bucketed
      .withColumn("rk", rank().over(localW) + col(DistributedRank.OffsetCol))
      .join(broadcast(n), "lang")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        when(col("n") === 1L, lit(0.0))
          .otherwise((col("rk") - 1L).cast("double") / (col("n") - 1L).cast("double"))
          .as("pct"))
  }

  val percentileNormSql: String =
    """WITH r AS (SELECT doc_id, lang, n_chars,
      |    rank() OVER (PARTITION BY lang ORDER BY n_chars) AS rk,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang, n_chars,
      |  CASE WHEN n = 1 THEN 0.0
      |       ELSE CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS pct
      |FROM r""".stripMargin

  /** C51: token-rarity quality signal — each document's mean global
    * token frequency ("commonness") plus its rarest token's corpus
    * count. The transcendental-free stand-in for unigram-LM perplexity
    * filtering (CCNet-style): gibberish and mojibake score LOW
    * commonness (tokens the corpus has never seen), boilerplate scores
    * HIGH; both tails are what a curation pass wants flagged. All
    * aggregates are exact int64; the single double division keeps the
    * oracle hash-exact (no `ln`, per SURVEY §6).
    *
    * Scale: occurrences collapse to distinct (doc, term, c) BEFORE the
    * vocabulary join — the join then carries one row per distinct term
    * per doc (stopword skew deduped away), keyed on `term`, the
    * high-cardinality key a vocabulary at 100 TB demands (the vocab
    * side is corpus-wide — never broadcastable). Both groupBys and the
    * final per-doc agg are two-phase partial-agg shapes.
    */
  def tokenRarity(documents: DataFrame): DataFrame = {
    val dt = documents
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("c"))
      .transform(GraftCache.persistTracked)
    val gtf = dt.groupBy("term").agg(sum(col("c")).as("gtf"))
    dt.join(gtf, "term")
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_tok"),
        sum(col("c") * col("gtf")).as("sum_gtf"),
        min(col("gtf")).as("rarest_gtf"))
      .withColumn("commonness",
        col("sum_gtf").cast("double") / col("n_tok").cast("double"))
  }

  val tokenRaritySql: String =
    """WITH dt AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  GROUP BY doc_id, term),
      |gtf AS (SELECT term, CAST(sum(c) AS BIGINT) AS gtf FROM dt GROUP BY term)
      |SELECT dt.doc_id,
      |  CAST(sum(dt.c) AS BIGINT) AS n_tok,
      |  CAST(sum(dt.c * gtf.gtf) AS BIGINT) AS sum_gtf,
      |  CAST(min(gtf.gtf) AS BIGINT) AS rarest_gtf,
      |  CAST(sum(dt.c * gtf.gtf) AS DOUBLE) / CAST(sum(dt.c) AS DOUBLE) AS commonness
      |FROM dt JOIN gtf USING (term)
      |GROUP BY dt.doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_token_rarity" -> ((s, d) => tokenRarity(Tables.documents(s, d))),
    "q_bm25" -> ((s, d) => bm25TopDocs(Tables.documents(s, d))),
    "q_percentile_norm" -> ((s, d) => percentileNorm(Tables.documents(s, d))),
    "q_line_dedup" -> ((s, d) => lineDedup(Tables.documents(s, d))),
    "q_dup_rate_by_source" -> ((s, d) => dupRateBySource(Tables.documents(s, d))),
    "q_reservoir_sample" -> ((s, d) => reservoirSample(Tables.documents(s, d))),
    "q_stratified_sample" -> ((s, d) => stratifiedSample(Tables.documents(s, d))),
    "q_epoch_mix" -> ((s, d) => epochMix(Tables.documents(s, d))),
    "q_temperature_mix" -> ((s, d) => temperatureMix(Tables.documents(s, d))),
    "q_unimax_mix" -> ((s, d) => unimaxMix(Tables.documents(s, d))),
    "q_unimax_apply" -> ((s, d) => unimaxApply(Tables.documents(s, d))),
    "q_tokenizer_fertility" -> ((s, d) => tokenizerFertility(Tables.documents(s, d))),
    "q_heavy_hitters" -> ((s, d) => heavyHitters(Tables.documents(s, d))),
    "q_split_assign" -> ((s, d) => splitAssign(Tables.documents(s, d))),
    "q_source_overlap" -> ((s, d) => sourceOverlap(Tables.documents(s, d))),
    "q_repetition_profile" -> ((s, d) => repetitionProfile(Tables.documents(s, d))),
    "q_pii_redact" -> ((s, d) => piiRedact(Tables.documents(s, d))),
    // shards pinned to 32: the oracle SQL's `% 32` must see the same
    // layout regardless of the bench box's core count
    "q_training_batches" -> ((s, d) => trainingBatches(Tables.documents(s, d), shards = 32)),
    "q_chunk_docs" -> ((s, d) => chunkDocs(Tables.documents(s, d))),
    "q_pack_sequences" -> ((s, d) => packSequences(Tables.documents(s, d), shards = 32)),
    "q_length_batches" -> ((s, d) => lengthBatches(Tables.documents(s, d), shards = 32)),
    "q_dedup_incremental" -> ((s, d) => dedupIncremental(Tables.documents(s, d))),
    "q_oov_rate" -> ((s, d) => oovRate(Tables.documents(s, d))),
    "q_token_budget_mix" -> ((s, d) => tokenBudgetMix(Tables.documents(s, d))),
    "q_curated_corpus" -> ((s, d) => curatedCorpus(Tables.documents(s, d))),
    "q_top_ngrams" -> ((s, d) => topNgrams(Tables.documents(s, d))),
    "q_bpe_merges" -> ((s, d) => bpeMerges(Tables.documents(s, d))),
    "q_bpe_train" -> ((s, d) => bpeTrain(Tables.documents(s, d))),
    "q_bpe_bytes" -> ((s, d) => bpeTrainBytes(Tables.documents(s, d))),
    "q_bpe_bytes_encode" -> ((s, d) => bpeEncodeBytes(Tables.documents(s, d))),
    "q_fertility_bytes" -> ((s, d) => fertilityBytes(Tables.documents(s, d))),
    "q_bpe_encode" -> ((s, d) => bpeEncode(Tables.documents(s, d))),
    "q_corpus_shuffle" -> ((s, d) => corpusShuffle(Tables.documents(s, d))),
    "q_contamination" -> ((s, d) => contamination(Tables.documents(s, d))),
    "q_stopword_strip" -> ((s, d) => stopwordStrip(Tables.documents(s, d))),
    "q_doc_freq" -> ((s, d) => docFreq(Tables.documents(s, d))),
    "q_tfidf_topterms" -> ((s, d) => tfidfTopTerms(Tables.documents(s, d))),
    "q_quality_rules" -> ((s, d) => qualityRules(Tables.documents(s, d))),
    "q_dedup_exact" -> ((s, d) => dedupExact(Tables.documents(s, d))),
    "q_lang_id" -> ((s, d) => langId(Tables.documents(s, d))),
    "q_quality_score" -> ((s, d) => qualityScore(Tables.documents(s, d))),
    "q_token_count" -> ((s, d) => tokenCount(Tables.documents(s, d))),
    "q_fingerprint" -> ((s, d) => fingerprint(Tables.documents(s, d))),
    "q_lang_stats" -> ((s, d) => langStats(Tables.documents(s, d))),
    "q_sample_mix" -> ((s, d) => sampleMix(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_token_rarity" -> tokenRaritySql,
    "q_bm25" -> bm25TopDocsSql(),
    "q_percentile_norm" -> percentileNormSql,
    "q_line_dedup" -> lineDedupSql,
    "q_dup_rate_by_source" -> dupRateBySourceSql,
    "q_reservoir_sample" -> reservoirSampleSql(),
    "q_stratified_sample" -> stratifiedSampleSql(),
    "q_epoch_mix" -> epochMixSql,
    "q_temperature_mix" -> temperatureMixSql,
    "q_unimax_mix" -> unimaxMixSql(),
    "q_unimax_apply" -> unimaxApplySql(),
    "q_tokenizer_fertility" -> tokenizerFertilitySql(),
    "q_heavy_hitters" -> heavyHittersSql(),
    "q_split_assign" -> splitAssignSql(),
    "q_source_overlap" -> sourceOverlapSql(),
    "q_repetition_profile" -> repetitionProfileSql(),
    "q_pii_redact" -> piiRedactSql,
    "q_training_batches" -> trainingBatchesSql,
    "q_chunk_docs" -> chunkDocsSql,
    "q_pack_sequences" -> packSequencesSql,
    "q_length_batches" -> lengthBatchesSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_oov_rate" -> oovRateSql,
    "q_token_budget_mix" -> tokenBudgetMixSql,
    "q_curated_corpus" -> curatedCorpusSql,
    "q_top_ngrams" -> topNgramsSql,
    "q_bpe_merges" -> bpeMergesSql(),
    "q_bpe_train" -> bpeTrainSql(),
    "q_bpe_bytes" -> bpeTrainBytesSql(),
    "q_bpe_bytes_encode" -> bpeEncodeBytesSql(),
    "q_fertility_bytes" -> fertilityBytesSql(),
    "q_bpe_encode" -> bpeEncodeSql(),
    "q_corpus_shuffle" -> corpusShuffleSql,
    "q_contamination" -> contaminationSql,
    "q_stopword_strip" -> stopwordStripSql,
    "q_doc_freq" -> docFreqSql,
    "q_tfidf_topterms" -> tfidfTopTermsSql,
    "q_quality_rules" -> qualityRulesSql,
    "q_dedup_exact" -> dedupExactSql,
    "q_lang_id" -> langIdSql,
    "q_quality_score" -> qualityScoreSql,
    "q_token_count" -> tokenCountSql,
    "q_fingerprint" -> fingerprintSql,
    "q_lang_stats" -> langStatsSql,
    "q_sample_mix" -> sampleMixSql)
}
