package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Ingest-edge readers (SURVEY.md §2: sources): schema-enforced CSV and
  * JSON-lines with an explicit corrupt-record policy. At 100 TB the
  * ingest edge is where garbage enters; the pattern here is PERMISSIVE
  * parsing with corrupt rows captured in-band (`_corrupt_record`), so
  * bad data is quarantined by a filter, not by a job crash — and the
  * quarantine rate is observable per batch.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(StructField(CorruptCol, StringType, nullable = true))

  /** Schema-enforced CSV read; malformed lines land in `_corrupt_record`
    * instead of failing the job (PERMISSIVE), schema is never inferred
    * (inference = an extra full scan + nondeterministic types).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Schema-enforced JSON-lines read, same corrupt-record policy. */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split into (clean, quarantined). Spark requires the parsed rows to
    * be cached/materialized before `_corrupt_record` can be filtered —
    * handled here so callers can't hit AnalysisException.
    */
  def quarantine(parsed: DataFrame): (DataFrame, DataFrame) = {
    val cached = parsed.cache()
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = cached.filter(col(CorruptCol).isNotNull).select(col(CorruptCol))
    (clean, bad)
  }
}
