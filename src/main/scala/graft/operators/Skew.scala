package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5): salted joins for hot keys.
  *
  * At 100 TB a single hot key (the celebrity account in the reference's
  * follower graph) lands one shuffle partition with most of the data.
  * AQE's skew-join split handles sort-merge cases; salting is the
  * explicit fallback that also works for aggregations:
  *
  *  - fact side: append a random-ish salt in [0, S) to the key;
  *  - dim side: explode each row into all S salt values;
  *  - join on (key, salt) — the hot key now spreads over S partitions.
  *
  * The salt here is `pmod(hash(unique_col), S)` — deterministic per row
  * (reproducible runs), uniform across rows of the same key.
  */
object Skew {

  /** Salted equi-join: semantically identical to
    * `fact.join(dim, fact(key) === dim(key))` (SkewSpec proves it), with
    * the fact side spread over `salts` partitions per key.
    *
    * @param saltOn a fact column that varies within a key (row id /
    *               event id) — the salt source.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 saltOn: String, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(col(saltOn)), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Spark's hash aggregate already does
    * map-side partial combine; explicit salting is for the pathological
    * case of a hot key whose *partials* still overload one reducer
    * (e.g. collect_list / exact distinct on the hot key).
    */
  def saltedCountDistinct(df: DataFrame, key: String, distinctCol: String,
                          saltOn: String, salts: Int = 8): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltOn)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(distinctCol)).as("__partial"))
      .groupBy(col(key))
      .agg(size(array_distinct(flatten(collect_list(col("__partial")))))
        .cast("long").as("n_distinct"))

  /** B40: keyed-skew telemetry — the probe you run BEFORE committing a
    * join/agg strategy on a 100 TB frame: per-key row counts rolled into
    * a frequency-of-frequencies histogram (the Good-Turing artifact)
    * banded to two significant decimal digits, with each band's hottest
    * key via one deterministic `max(struct(cnt, key))` argmax. A long
    * tail of single-digit bands plus a lone 10^7 band is the signature
    * that says "salt this" ([[saltedJoin]]) or "let AQE split it".
    *
    * The band is pure string arithmetic — the count's first two digits
    * right-padded with zeros back to its own length (17 → 17,
    * 1234 → 1200) — deliberately NOT `floor(log…)` or `power(10, …)`,
    * whose float behavior at exact powers can differ across engines;
    * substr/rpad/length agree byte-for-byte. Band count stays bounded:
    * ≤ 9 one-digit bands + 90 per decade × 18 int64 decades.
    *
    * Scale: per-key count is the standard two-phase hash agg on the
    * high-cardinality key; the band rollup reduces |keys| rows to the
    * bounded band table with partial-agg-friendly count/sum/max — no
    * window, no sort, nothing driver-side.
    */
  def keySkew(fact: DataFrame, key: String = "o_custkey"): DataFrame =
    fact.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket", expr(
        "CAST(rpad(substr(CAST(cnt AS STRING), 1, 2)," +
          " length(CAST(cnt AS STRING)), '0') AS BIGINT)"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(struct(col("cnt").as("c"), col("k").as("u"))).as("m"))
      .select(col("bucket"), col("n_keys"), col("n_rows"),
        col("m.c").as("max_cnt"), col("m.u").as("hot_key"))

  val keySkewSql: String =
    """WITH k AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cnt
      |  FROM orders GROUP BY o_custkey),
      |b AS (SELECT CAST(rpad(substr(CAST(cnt AS VARCHAR), 1, 2),
      |    CAST(length(CAST(cnt AS VARCHAR)) AS INTEGER), '0') AS BIGINT) AS bucket,
      |  k, cnt FROM k)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(cnt) AS BIGINT) AS n_rows,
      |  (max({'c': cnt, 'u': k})).c AS max_cnt,
      |  (max({'c': cnt, 'u': k})).u AS hot_key
      |FROM b GROUP BY bucket""".stripMargin
}
