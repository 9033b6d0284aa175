package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Hashed linear text classification (SURVEY.md §2 C53) — the
  * fastText-style quality classifier an LLM-data pipeline runs between
  * the cheap heuristics (C9/C23) and an expensive model pass: unigram +
  * token-bigram features, the HASHING TRICK (feature → fixed bucket
  * table, collisions and all — Weinberger et al., ICML'09; fastText's
  * `-hash` bucket table), a linear score, and a keep/drop gate
  * (reference domain: interest_analyzer.py's per-user text
  * classification, re-expressed as the corpus-scale filter it becomes
  * at 100 TB).
  *
  * The "trained" model is derived, not learned: bucket b's weight is a
  * pure md5 function of b, so the DuckDB oracle reproduces the entire
  * model bit-exactly and the gate hash-compares scores — what's under
  * test is the FEATURE PIPELINE (tokenize → bigram → hash → bucket →
  * weight-sum), which is exactly the part that must be deterministic
  * and engine-portable in production (swap the md5 weight for a
  * broadcast learned table and nothing else changes).
  *
  * Exactness: weights are integers in [-1000, 1000], scores are exact
  * BIGINT sums — no float dot product to drift cross-engine.
  *
  * Scale: a pure per-row projection — tokenize, build features, fold a
  * weight sum inside one codegen'd `aggregate` lambda. ZERO shuffle,
  * zero joins, no UDF: the whole classifier rides the parquet scan
  * (model-free weights mean there isn't even a broadcast to ship), so
  * it runs at full scan throughput on any corpus size.
  */
object Classify {

  /** Feature buckets (2^12): small enough that collisions genuinely
    * occur on this corpus — the hashing-trick behavior under test —
    * large enough that scores stay discriminative.
    */
  val NumBuckets = 4096

  /** w(feature) = md5(feature) → bucket → md5(bucket) → integer weight
    * in [-1000, 1000]; engine-portable SQL (concat/md5/instr/substr
    * only), shared verbatim by the Spark expression and the oracle.
    */
  def weightSql(feat: String): String = {
    val bucket =
      s"(${TextOps.hexPrefixValSql(s"md5(concat('tk_', $feat))")} % $NumBuckets)"
    s"((${TextOps.hexPrefixValSql(s"md5(concat('wb_', CAST($bucket AS STRING)))")} % 2001) - 1000)"
  }

  /** C53: (doc_id, n_features, score, keep) — unigrams + bigrams
    * hashed into [[NumBuckets]], score = Σ bucket weight (exact
    * BIGINT), keep = score > 0.
    */
  def qualityClassifier(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit("_"), b))
    documents
      .select(col("doc_id"), concat(toks, bigrams).as("feats"))
      .select(
        col("doc_id"),
        size(col("feats")).cast("long").as("n_features"),
        expr(s"aggregate(feats, 0L, (acc, t) -> acc + ${weightSql("t")})").as("score"))
      .withColumn("keep", col("score") > 0)
  }

  val qualityClassifierSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |f AS (
       |  SELECT doc_id, unnest(toks) AS feat FROM t
       |  UNION ALL
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |    i -> toks[i] || '_' || toks[i + 1])) AS feat
       |  FROM t),
       |w AS (SELECT doc_id, ${weightSql("feat")} AS w FROM f)
       |SELECT doc_id, count(*) AS n_features,
       |  CAST(sum(w) AS BIGINT) AS score,
       |  CAST(sum(w) AS BIGINT) > 0 AS keep
       |FROM w GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_classifier" -> ((s, d) => qualityClassifier(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_quality_classifier" -> qualityClassifierSql)
}
