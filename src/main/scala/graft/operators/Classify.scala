package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exprs
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
    *
    * Round-9 correction of a round-8 conclusion: the builtin weight
    * CHAIN (two md5 hex chains per feature) was kept then because a
    * native-expression variant "measured 6× slower" — but that
    * measurement was `count()`-PRUNED (the score column never
    * evaluated; both variants timed the scan). C73's calibration bins
    * are the first consumer that forces full evaluation, and the chain
    * costs ~30 s at sf0.1 there; the [[Exprs.md5Bucket]] +
    * driver-precomputed [[weightTable]] form measures 16× faster under
    * REAL evaluation (2.0 s cold) and is value-identical (both oracles
    * stay green). Lesson recorded: never grade a projection variant
    * with a pruning action.
    */
  /** The bucket→weight table as a driver-precomputed 4096-entry array:
    * value-identical to `weightSql`'s second md5 chain (pinned by the
    * oracle hash-compare), computed once at plan build instead of once
    * per FEATURE — the codebook rule applied to the hashing trick.
    */
  private lazy val weightTable: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until NumBuckets).map { b =>
      val hex = md.digest(s"wb_$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2001L - 1000L
    }.toArray
  }

  def qualityClassifier(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit("_"), b))
    // per-feature work = ONE native md5-bucket eval + one array index:
    // w(t) = table[md5Bucket('tk_', t)], value-identical to the full
    // weightSql chain (the oracle pins it). The chain form evaluated
    // TWO md5 hex chains per feature — fine under count()-pruned
    // benches, but ~30 s at sf0.1 once a consumer (C73's calibration
    // bins) actually evaluates scores; this form measures ~10x less.
    // litLongArray converts ONCE at plan build (the typedLit trap), and
    // Md5BucketMod is the DSIR-style single-eval kernel.
    val w = graft.functions.Exprs.litLongArray(weightTable.toIndexedSeq)
    documents
      .select(col("doc_id"), concat(toks, bigrams).as("feats"))
      .select(
        col("doc_id"),
        size(col("feats")).cast("long").as("n_features"),
        aggregate(col("feats"), lit(0L),
          (acc, t) => acc + element_at(w,
            (Exprs.md5Bucket(t, "tk_", NumBuckets) + lit(1L)).cast("int")))
          .as("score"))
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

  /** Fixed-point scale for the bigram LM score: each bigram contributes
    * ⌊10⁶·P(w₂|w₁)⌋ exactly.
    */
  val LmScale = 1000000L

  private val Sep = "\u001f" // unit separator - never appears in tokens

  /** C55: corpus bigram-LM fluency score — the CCNet/Gopher-style
    * "perplexity filter" niche: documents whose token transitions are
    * improbable under a language model trained ON THE CORPUS ITSELF
    * score low (gibberish, shuffled text, boilerplate soup), fluent
    * text scores high. The LM is the corpus's own bigram MLE —
    * P(w₂|w₁) = c(w₁w₂)/c(w₁·) — and the score is the per-doc sum (and
    * mean) of ⌊10⁶·P⌋ per bigram: FIXED-POINT floor division on
    * positive int64 counts instead of the textbook Σlog P, because a
    * transcendental log is not bit-reproducible across engines (the
    * C48 idf trade) while floor division is — monotone per bigram in
    * P, which is all a keep/drop threshold consumes.
    *
    * Scale: train = one (bg) hash agg + one (w1) hash agg over the
    * exploded bigram stream; score = two keyed equi-joins back onto the
    * same stream + a doc-keyed agg. All shuffles are keyed on
    * high-cardinality grams/docs — no windows, no collects. At 100 TB
    * the LM table is pruned to a top-V vocabulary and BROADCAST (absent
    * grams backing off to a floor score); here the exact full join is
    * kept so the oracle can reproduce it.
    */
  /** (doc_id, bg, w1) bigram stream of a (doc_id, text) frame — pure
    * projection + explode, so it runs unchanged on batch AND streaming
    * frames (the streaming LM gate drives exactly this body).
    */
  def bigramStream(documents: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    documents
      .select(col("doc_id"), explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(Sep), b))).as("bg"))
      .withColumn("w1", split(col("bg"), Sep).getItem(0))
  }

  /** Train the corpus bigram LM: the (bg, cb) transition counts and
    * (w1, cw) context totals — two hash aggs over one bigram stream.
    */
  def lmTrain(documents: DataFrame): (DataFrame, DataFrame) = {
    val bb = graft.GraftCache.persistTracked(bigramStream(documents))
    (bb.groupBy("bg").agg(count(lit(1)).as("cb")),
      bb.groupBy("w1").agg(count(lit(1)).as("cw")))
  }

  /** Score a (doc_id, text) frame against a TRAINED model: two keyed
    * equi-joins + a doc agg. Every step is stream-safe (projection,
    * explode, stream-static inner join, per-batch agg), so the
    * streaming gate reuses this body verbatim against committed model
    * frames. Grams absent from the model drop out of the inner join —
    * the back-off-to-floor rule; `n_bigrams` counts MODELED bigrams.
    */
  def lmScoreAgainst(documents: DataFrame, cb: DataFrame, cw: DataFrame): DataFrame =
    bigramStream(documents)
      .join(cb, "bg")
      .join(cw, "w1")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr(s"($LmScale * cb) div cw")).as("score_fp"))

  def lmBigramScore(documents: DataFrame): DataFrame = {
    val (cb, cw) = lmTrain(documents)
    val perDoc = lmScoreAgainst(documents, cb, cw)
    documents.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"),
        when(coalesce(col("n_bigrams"), lit(0L)) > 0,
          expr("score_fp div n_bigrams")).otherwise(lit(0L)).as("avg_fp"))
  }

  val lmBigramScoreSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       |bb AS (
       |  SELECT doc_id, bg, string_split(bg, chr(31))[1] AS w1 FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || chr(31) || toks[i + 1])) AS bg
       |    FROM t)),
       |cb AS (SELECT bg, count(*) AS cb FROM bb GROUP BY 1),
       |cw AS (SELECT w1, count(*) AS cw FROM bb GROUP BY 1),
       |sc AS (
       |  SELECT bb.doc_id, count(*) AS n_bigrams,
       |    CAST(sum(($LmScale * cb.cb) // cw.cw) AS BIGINT) AS score_fp
       |  FROM bb JOIN cb ON bb.bg = cb.bg JOIN cw ON bb.w1 = cw.w1
       |  GROUP BY 1),
       |base AS (SELECT doc_id FROM documents)
       |SELECT base.doc_id,
       |  coalesce(sc.n_bigrams, 0) AS n_bigrams,
       |  coalesce(sc.score_fp, 0) AS score_fp,
       |  CASE WHEN coalesce(sc.n_bigrams, 0) > 0
       |    THEN sc.score_fp // sc.n_bigrams ELSE 0 END AS avg_fp
       |FROM base LEFT JOIN sc ON base.doc_id = sc.doc_id""".stripMargin

  // ----------------------------------------- committed model artifact

  /** Commit the trained bigram LM (transition counts + context totals)
    * through the transactional format — train once on the curated
    * corpus, and every serving/streaming gate LOADS the model instead
    * of retraining; a retrain commits atomically under the readers
    * (the same promotion the IVF-PQ codebooks and the DSIR ratio table
    * got). Keyed by the gram, so an incremental retrain on corpus
    * growth merges only changed counts.
    */
  def commitLm(cb: DataFrame, cw: DataFrame, path: String, buildV: Long = 0L): Unit = {
    val spark = cb.sparkSession
    graft.sources.Sinks.VersionedTable.mergeUpsert(spark, s"$path/cb",
      cb.withColumn("build_v", lit(buildV)), Seq("bg"), "build_v", numBuckets = 8)
    graft.sources.Sinks.VersionedTable.mergeUpsert(spark, s"$path/cw",
      cw.withColumn("build_v", lit(buildV)), Seq("w1"), "build_v", numBuckets = 8)
  }

  /** The committed LM at its latest version — frames shaped exactly
    * like [[lmTrain]]'s output, so [[lmScoreAgainst]] and the streaming
    * gate consume them unchanged.
    */
  def loadLm(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (graft.sources.Sinks.VersionedTable.read(spark, s"$path/cb").select("bg", "cb"),
      graft.sources.Sinks.VersionedTable.read(spark, s"$path/cw").select("w1", "cw"))

  /** C73: classifier calibration curve — the reliability diagram every
    * learned quality gate needs before its threshold is trusted: bucket
    * docs by classifier score (fixed-width bins, the B42 histogram
    * convention — IEEE division + floor are identical cross-engine;
    * quantile bins would need a sketch with engine-specific
    * interpolation) and report each bin's population, its agreement
    * rate with the INDEPENDENT rule-based gate (C23's keep, the
    * pseudo-label — in production this column is held-out human
    * labels, and nothing else changes), and its mean score. A
    * well-calibrated score shows agreement rising monotonically with
    * the bin; a flat curve means the score carries no signal at the
    * chosen threshold. Scale: two scan-shaped scoring passes, one
    * doc_id join, one bounded hash agg (buckets ≈ score-range/width) —
    * no windows, no collect.
    */
  def scoreCalibration(documents: DataFrame, width: Long = 10000L): DataFrame =
    // both scoring passes are MATERIALIZED before the join on purpose:
    // fused into the join's whole-stage, the classifier's `aggregate`
    // weight-chain lambda loses codegen (the generated method outgrows
    // the JIT/codegen limits and the HOF falls back to interpreted
    // eval) — measured 200x: 0.14 s/side alone vs 32 s fused at sf0.1.
    // Persisting the two NARROW (doc_id, value) frames keeps each chain
    // in its own codegen'd scan stage; the join then reads columns.
    graft.GraftCache.persistTracked(
      qualityClassifier(documents).select(col("doc_id"), col("score")))
      .join(graft.GraftCache.persistTracked(
        TextOps.qualityRules(documents).select(col("doc_id"), col("keep"))), "doc_id")
      .withColumn("bucket",
        floor(col("score").cast("double") / lit(width.toDouble)).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_rule_keep"),
        sum(col("score")).as("sum_score"))
      .select(col("bucket"), col("n"), col("n_rule_keep"),
        round(col("n_rule_keep").cast("double") / col("n").cast("double"), 4)
          .as("rule_keep_rate"),
        round(col("sum_score").cast("double") / col("n").cast("double"), 2)
          .as("avg_score"))

  def scoreCalibrationSql(width: Long = 10000L): String =
    s"""WITH c AS (SELECT doc_id, score FROM (${qualityClassifierSql}) qc),
       |r AS (SELECT doc_id, keep FROM (${TextOps.qualityRulesSql}) qr),
       |j AS (SELECT c.doc_id, score, keep FROM c JOIN r ON c.doc_id = r.doc_id),
       |b AS (SELECT CAST(floor(CAST(score AS DOUBLE) / $width.0) AS BIGINT) AS bucket,
       |        score, keep FROM j)
       |SELECT bucket, count(*) AS n,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_rule_keep,
       |  round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
       |    AS rule_keep_rate,
       |  round(CAST(sum(score) AS DOUBLE) / count(*), 2) AS avg_score
       |FROM b GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_classifier" -> ((s, d) => qualityClassifier(Tables.documents(s, d))),
    "q_score_calibration" -> ((s, d) => scoreCalibration(Tables.documents(s, d))),
    "q_lm_bigram_score" -> ((s, d) => lmBigramScore(Tables.documents(s, d))))

  def oracle: Map[String, String] = Map(
    "q_quality_classifier" -> qualityClassifierSql,
    "q_score_calibration" -> scoreCalibrationSql(),
    "q_lm_bigram_score" -> lmBigramScoreSql)
}
