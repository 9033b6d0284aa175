package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Exprs

/** Shared LSH-banding machinery for fixed-width bit-string fingerprints
  * (the C3/C12b/C12c pattern): split the signature into `numBands`
  * bands of `bandBits`, candidate pairs share at least one EXACT band,
  * cross-band duplicates are removed map-side by the first-equal-band
  * rule (a pair is emitted only from the first band where the two full
  * signatures agree — pure projection on the joined row, no distinct
  * shuffle), and the exact codegen Hamming verify runs only on
  * candidates.
  *
  * RECALL CONTRACT (the standard LSH trade): pigeonhole guarantees a
  * shared band only up to hamming ≤ numBands − 1 (3 for 4 bands) — a
  * pair differing by more bits is found only when some band happens to
  * be untouched, i.e. recall is probabilistic between numBands and the
  * verify threshold. Every consumer's ORACLE applies the identical
  * band rule, so the two engines share the blind spot by construction
  * and cross-engine parity is unaffected; what the threshold buys is
  * extra detected pairs, not a completeness guarantee past numBands−1.
  */
object BandedPairs {

  private[operators] def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Default per-(band index, band value) occupancy cap. A duplicate
    * MEGA-CLUSTER (boilerplate images, a logo crawled a million times)
    * puts its whole population in one bucket, and an uncapped
    * bucket-join emits |cluster|² pairs — measured: a 50x-replicated
    * corpus whose replicas share pixel groups produced 600M pairs from
    * 250k docs. Same answer as the text-dedup family's C2b: over-cap
    * buckets keep a bounded DETERMINISTIC md5-rank subsample, so a hot
    * bucket contributes at most cap² pairs (a bounded detection path —
    * the cluster is still discovered, its full pair list is not
    * enumerated). The cap is a no-op below 256 occupants, so test-SF
    * oracles see identical output.
    */
  val DefaultBucketCap = 256

  /** The same deterministic engine-portable selector as C38/C47: the
    * first 8 md5 hex digits of the id as an integer rank.
    */
  private[graft] def md5Rank(docId: Long): Long =
    java.lang.Long.parseLong(md5Hex(docId.toString).substring(0, 8), 16)

  /** Near-dup pairs over `fps(idCol: Long, fpCol: '0'/'1' string)`:
    * (id_a, id_b, hamming) with id_a < id_b, hamming ≤ threshold, each
    * pair emitted exactly once. Bucket populations are capped at
    * `bucketCap` by deterministic md5 rank (see [[DefaultBucketCap]]);
    * the per-bucket selection is the bounded MaxKScored heap (k
    * map-side per bucket — the cap must not itself be a per-bucket
    * sort window, the bucket being oversized is the hazard). Pair
    * dedup is the first-shared-KEPT-band rule: with caps, a pair can
    * agree on band b's VALUE while one partner was evicted from b's
    * bucket, so each id carries a bitmask of the bands it survived in
    * and a pair is emitted only from the first band where the values
    * match AND both survived — pure bit math on the joined row, no
    * distinct shuffle.
    */
  def pairs(fps: DataFrame, idCol: String, fpCol: String,
            numBands: Int, bandBits: Int, threshold: Int,
            bucketCap: Int = DefaultBucketCap): DataFrame = {
    val bandStruct = (0 until numBands).map { b =>
      struct(lit(b).as("b"), substring(col(fpCol), b * bandBits + 1, bandBits).as("band"))
    }
    // rkey BEFORE the band explode: the md5 rank is per-id, and the
    // ~24-node hex chain evaluated per (id × band) row would cost
    // numBands× for the same value
    val banded = fps.select(col(idCol), col(fpCol),
      expr(TextOps.hexPrefixValSql(s"md5(CAST($idCol AS STRING))")).as("rkey"),
      explode(array(bandStruct: _*)).as("tb"))
      .select(col(idCol), col(fpCol), col("rkey"),
        col("tb.b").as("b"), col("tb.band").as("band"))
    // bounded per-bucket survivors: min-k by (md5 rank, id)
    val kept = banded.groupBy("b", "band")
      .agg(Exprs.maxKScored(-col("rkey").cast("double"), col(idCol), bucketCap).as("keep"))
      .select(col("b"), col("band"), explode(col("keep")).as("t"))
      .select(col("b"), col("band"), col("t.id").as(idCol))
    // per-id bitmask of survived bands + the full signature back
    val masks = kept.groupBy(idCol)
      .agg(sum(expr("shiftleft(1L, b)")).as("mask"))
    val enriched = kept
      .join(fps.select(col(idCol), col(fpCol)), Seq(idCol))
      .join(masks, Seq(idCol))
    val firstSharedKeptBand = (numBands - 1 to 0 by -1)
      .foldLeft(lit(-1): Column) { (acc, b) =>
        when(substring(col("ha"), b * bandBits + 1, bandBits) ===
          substring(col("hb"), b * bandBits + 1, bandBits) &&
          shiftright(col("ma"), b).bitwiseAND(lit(1L)) === 1L &&
          shiftright(col("mb"), b).bitwiseAND(lit(1L)) === 1L, lit(b)).otherwise(acc)
      }
    val cand = enriched.select(col(idCol).as("id_a"), col(fpCol).as("ha"),
        col("mask").as("ma"), col("b"), col("band"))
      .join(enriched.select(col(idCol).as("id_b"), col(fpCol).as("hb"),
        col("mask").as("mb"), col("b"), col("band")), Seq("b", "band"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("b") === firstSharedKeptBand)
    cand
      .select(col("id_a"), col("id_b"),
        Exprs.hamming(col("ha"), col("hb")).as("hamming"))
      .filter(col("hamming") <= threshold)
  }

  /** Banded PROBE join: match a probe frame against a (different)
    * index frame — (probeId, indexId, hamming) with hamming ≤
    * threshold, each matched pair exactly once (first-equal-band rule,
    * stateless). Every transform here is a projection, an explode, or
    * an equi-join, so `probe` may be a STREAMING frame (stream-static
    * inner join, append mode, no state store) — the continuous twin of
    * [[pairs]]: incoming media checked against a committed fingerprint
    * index.
    */
  def probeJoin(probe: DataFrame, probeId: String,
                index: DataFrame, indexId: String, fpCol: String,
                numBands: Int, bandBits: Int, threshold: Int,
                bucketCap: Int = DefaultBucketCap): DataFrame = {
    def banded(df: DataFrame, idCol: String, fpAs: String): DataFrame = {
      val bandStruct = (0 until numBands).map { b =>
        struct(lit(b).as("b"), substring(col(fpCol), b * bandBits + 1, bandBits).as("band"))
      }
      df.select(col(idCol), col(fpCol), explode(array(bandStruct: _*)).as("tb"))
        .select(col(idCol), col(fpCol).as(fpAs), col("tb.b").as("b"), col("tb.band").as("band"))
    }
    // The INDEX side carries the mega-cluster hazard (a boilerplate
    // image indexed a million times would match every probe a million
    // times); cap its buckets exactly like [[pairs]]. The aggregations
    // run on the STATIC side only, so `probe` may stay a streaming
    // frame. Probe rows are per-batch and never capped — a pair is
    // emitted from the first band where the values agree AND the index
    // member survived that band's cut.
    val bandedIdx = banded(index, indexId, "hb")
      .withColumn("rkey", expr(
        TextOps.hexPrefixValSql(s"md5(CAST($indexId AS STRING))")))
    val keptIdx = bandedIdx.groupBy("b", "band")
      .agg(Exprs.maxKScored(-col("rkey").cast("double"), col(indexId), bucketCap).as("keep"))
      .select(col("b"), col("band"), explode(col("keep")).as("t"))
      .select(col("b"), col("band"), col("t.id").as(indexId))
    val maskIdx = keptIdx.groupBy(indexId)
      .agg(sum(expr("shiftleft(1L, b)")).as("mb"))
    val enrichedIdx = keptIdx
      .join(index.select(col(indexId), col(fpCol).as("hb")), Seq(indexId))
      .join(maskIdx, Seq(indexId))
    val firstSharedBand = (numBands - 1 to 0 by -1)
      .foldLeft(lit(-1): Column) { (acc, b) =>
        when(substring(col("ha"), b * bandBits + 1, bandBits) ===
          substring(col("hb"), b * bandBits + 1, bandBits) &&
          shiftright(col("mb"), b).bitwiseAND(lit(1L)) === 1L, lit(b)).otherwise(acc)
      }
    banded(probe, probeId, "ha")
      .join(enrichedIdx, Seq("b", "band"))
      .filter(col("b") === firstSharedBand)
      .select(col(probeId), col(indexId),
        Exprs.hamming(col("ha"), col("hb")).as("hamming"))
      .filter(col("hamming") <= threshold)
  }

  /** The oracle's tail: bands/cap/cand CTEs + the final verify SELECT
    * over a prior CTE `hashCte(doc_id, fpCol)` — the same md5-rank
    * bucket cap as [[pairs]] (a per-bucket rank window is fine in the
    * oracle), DISTINCT replacing the first-shared-kept-band projection
    * (same pair set). The caller interpolates this after its hash CTE
    * (which must end with a comma).
    */
  def pairsSqlTail(hashCte: String, fpCol: String, fpLen: Int,
                   numBands: Int, bandBits: Int, threshold: Int,
                   bucketCap: Int = DefaultBucketCap): String =
    s"""bands AS (
       |  SELECT doc_id, $fpCol, b, substr($fpCol, b * $bandBits + 1, $bandBits) AS band,
       |    ${TextOps.hexPrefixValSql("md5(CAST(doc_id AS VARCHAR))")} AS rkey
       |  FROM $hashCte, range(0, $numBands) rband(b)),
       |bkept AS (
       |  SELECT doc_id, $fpCol, b, band FROM (
       |    SELECT *, row_number() OVER (PARTITION BY b, band ORDER BY rkey, doc_id) AS occ
       |    FROM bands) WHERE occ <= $bucketCap),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.$fpCol AS ha, b.$fpCol AS hb
       |  FROM bkept a JOIN bkept b ON a.b = b.b AND a.band = b.band
       |  WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b,
       |    CAST(list_sum(list_transform(range(1, ${fpLen + 1}),
       |      k -> CASE WHEN substr(ha, k, 1) = substr(hb, k, 1) THEN 0 ELSE 1 END)) AS BIGINT) AS hamming
       |  FROM cand)
       |WHERE hamming <= $threshold""".stripMargin
}
