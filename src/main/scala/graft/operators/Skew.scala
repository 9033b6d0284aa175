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
}
