package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exprs
import graft.sources.Tables

/** Hybrid retrieval (SURVEY.md §2 C54) — reciprocal-rank fusion of the
  * two retrieval families the engine already serves: sparse BM25
  * (C48's exact-int64 Okapi score) and dense cosine ANN (the C6 family)
  * — the standard RAG/search-stack composition (RRF: Cormack et al.,
  * SIGIR'09; every production hybrid searcher ships it because it
  * needs no score calibration between incommensurable scorers).
  *
  * Per query term: the term's BM25 top-k document list is fused with
  * the cosine top-k list of a term-anchored query vector (the anchor is
  * an md5-derived corpus vector standing in for an encoder's query
  * embedding — deterministic, so the oracle reproduces it; in
  * production the anchor column is the query encoder's output). Fusion:
  * rrf(d) = Σ_lists 1/(60 + rank_d), absent-from-list contributes 0 —
  * rank-only, so the two scorers' incomparable scales never meet.
  *
  * Exactness: ranks are exact ints from both engines (both sides'
  * tie-breaks pinned), each 1/(60+r) is one correctly-rounded IEEE
  * division, and the fusion is ONE addition of two doubles written in
  * the same order in both engines.
  *
  * Scale: the fusion stage touches only O(terms × k) rows — two
  * already-bounded top-k lists full-outer-joined on (term, doc) and
  * re-topped via the bounded MaxKScored heap. The dense side here is
  * the brute-force C6 baseline (probes broadcast, corpus streamed
  * once); at 100 TB swap it for `annIvfPq` routing — the fusion
  * contract (term, doc_id, rank) is unchanged, which is the point of
  * fusing on ranks.
  */
object Retrieval {

  val RrfC = 60 // the published RRF damping constant
  val TopK = 10

  /** term → anchor vector id: md5-derived, bounded by
    * [[Embeddings.NumProbes]] so the anchor exists at every SF.
    */
  private val anchorIdSql: String =
    s"(${TextOps.hexPrefixValSql("md5(concat('anchor_', term))")} % ${Embeddings.NumProbes})"

  /** C54: (term, doc_id, rrf, rn) — per query term, the top
    * [[TopK]] documents by reciprocal-rank fusion of BM25 and
    * anchor-cosine rankings.
    */
  def hybridRrf(documents: DataFrame, embeddings: DataFrame, k: Int = TopK): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    val sparse = TextOps.bm25TopDocs(documents, k)
      .select(col("term"), col("doc_id"), col("rn").as("rn_s"))

    val anchors = TextOps.Bm25Terms.toDF("term")
      .withColumn("q_id", expr(anchorIdSql))
    val q = Embeddings.quantized(embeddings)
    val anchorIds = anchors.select("q_id").distinct()
    val probes = q
      .join(broadcast(anchorIds), col("vec_id") === col("q_id"))
      .select(col("q_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val scored = q
      .join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (Exprs.dotLong(col("q_qv"), col("qv")).cast("double") /
          (sqrt(col("q_nrm").cast("double")) * sqrt(col("nrm").cast("double")))).as("cos"))
    val denseTop = scored
      .groupBy("q_id")
      .agg(Exprs.maxKScored(col("cos"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rn_d"))
    val dense = anchors.join(denseTop, "q_id").select("term", "doc_id", "rn_d")

    val fused = sparse.join(dense, Seq("term", "doc_id"), "full_outer")
      .select(col("term"), col("doc_id"),
        (coalesce(lit(1.0) / (lit(RrfC) + col("rn_s")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + col("rn_d")), lit(0.0))).as("rrf"))
    fused
      .groupBy("term")
      .agg(Exprs.maxKScored(col("rrf"), col("doc_id"), k).as("top"))
      .select(col("term"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("term"), col("t.id").as("doc_id"), col("t.score").as("rrf"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Oracle: both rankings and the fusion in SQL — the BM25 CTEs share
    * C48's exact-integer score formula, the dense CTEs share C6's
    * quantized-cosine, the per-list ranks are `row_number` with the
    * same tie-breaks, and the fusion addition is written in the same
    * sparse-then-dense order as the Spark column.
    */
  def hybridRrfSql(k: Int = TopK): String = {
    val terms = TextOps.Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH ${TextOps.bm25ScoredCtes("bscored")},
       |sparse AS (
       |  SELECT term, doc_id, rn_s FROM (
       |    SELECT term, doc_id, CAST(row_number() OVER (
       |      PARTITION BY term ORDER BY score DESC, doc_id) AS INTEGER) AS rn_s
       |    FROM bscored) WHERE rn_s <= $k),
       |q AS (SELECT vec_id, ${Embeddings.qvSqlExpr} AS qv FROM embeddings),
       |n AS (SELECT vec_id, qv, ${Embeddings.dotSqlFmt.format("qv", "qv")} AS nrm FROM q),
       |t AS (SELECT unnest([$terms]) AS term),
       |a AS (SELECT term, $anchorIdSql AS q_id FROM t),
       |p AS (SELECT DISTINCT q_id FROM a),
       |pq AS (SELECT p.q_id, n.qv, n.nrm FROM n JOIN p ON n.vec_id = p.q_id),
       |dscored AS (
       |  SELECT pq.q_id, c.vec_id AS n_id,
       |    ${Embeddings.dotSqlFmt.format("pq.qv", "c.qv")} / (sqrt(pq.nrm) * sqrt(c.nrm)) AS cos
       |  FROM pq JOIN n c ON c.vec_id <> pq.q_id),
       |dtop AS (
       |  SELECT q_id, n_id, rn_d FROM (
       |    SELECT q_id, n_id, CAST(row_number() OVER (
       |      PARTITION BY q_id ORDER BY cos DESC, n_id) AS INTEGER) AS rn_d
       |    FROM dscored) WHERE rn_d <= $k),
       |dense AS (SELECT a.term, dtop.n_id AS doc_id, dtop.rn_d
       |  FROM a JOIN dtop ON a.q_id = dtop.q_id),
       |fused AS (
       |  SELECT coalesce(s.term, de.term) AS term,
       |    coalesce(s.doc_id, de.doc_id) AS doc_id,
       |    coalesce(CAST(1 AS DOUBLE) / ($RrfC + s.rn_s), 0.0) +
       |    coalesce(CAST(1 AS DOUBLE) / ($RrfC + de.rn_d), 0.0) AS rrf
       |  FROM sparse s FULL OUTER JOIN dense de
       |    ON s.term = de.term AND s.doc_id = de.doc_id)
       |SELECT term, doc_id, rrf, rn FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY term ORDER BY rrf DESC, doc_id) AS INTEGER) AS rn
       |  FROM fused) WHERE rn <= $k""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hybrid_rrf" -> ((s, d) =>
      hybridRrf(Tables.documents(s, d), Tables.embeddings(s, d))))

  def oracle: Map[String, String] = Map(
    "q_hybrid_rrf" -> hybridRrfSql())
}
