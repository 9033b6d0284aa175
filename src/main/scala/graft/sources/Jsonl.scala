package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) crawl ingest — the OTHER front door
  * next to C68's WARC: most published corpora and crawl derivatives
  * ship as .jsonl, one JSON object per line, and a real ingest must
  * survive the torn/garbled lines a multi-writer crawl dump contains.
  *
  * Spark-first shape: this is exactly what the native JSON DataSource
  * is for — the registered query writes REAL line files to disk and
  * reads them back through `spark.read.json` in PERMISSIVE mode with a
  * corrupt-record column, so the lens exercises the production reader
  * (JacksonParser, schema projection, per-file parallelism), not a
  * reimplementation. A corrupt line quarantines IN-BAND (ok = false,
  * sentinel fields — never NULL, the oracle-dtype convention) instead
  * of failing the task: the multimodal codec contract applied to the
  * text front door.
  *
  * Oracle strategy is C68's: the line corpus is synthesized
  * deterministically from `documents` (every 7th line torn by
  * replacing its opening brace, so nothing is partially parseable —
  * PERMISSIVE "partial result" semantics never enter the compare), and
  * the oracle reconstructs the expected parse directly, pinning
  * writer∘reader == identity through the real file roundtrip.
  */
object Jsonl {

  /** One JSON object per doc, built by deterministic concat (NOT
    * to_json, whose field order/float formatting the oracle would have
    * to chase): doc identity, the lang tag, and the text fingerprint.
    * lang/source values are [a-z0-9-], md5 is hex — no JSON escaping
    * hazards by construction.
    */
  private[graft] def plantedLine =
    concat(
      lit("{\"doc_id\":"), col("doc_id").cast("string"),
      lit(",\"lang\":\""), col("lang"),
      lit("\",\"fp\":\""), md5(col("text")), lit("\"}"))

  /** Every 7th line torn at the opening brace — unparseable as a whole,
    * so PERMISSIVE yields all-null fields + the corrupt column, never a
    * partial parse.
    */
  private[graft] def plantedJsonl(documents: DataFrame): DataFrame =
    documents.select(
      when(pmod(col("doc_id"), lit(7L)) === 0L,
        concat(lit("!"), substring(plantedLine, 2, Int.MaxValue)))
        .otherwise(plantedLine).as("line"))

  private val parseSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("fp", StringType),
    StructField("_corrupt", StringType)))

  /** Write the line corpus once per (session, corpus) — the memoized
    * artifact convention, so Verify/Bench query rebuilds reuse one
    * write and a released cache honestly re-pays it on the next cold
    * run — then read it back through the native JSON source.
    */
  def jsonlIngest(spark: SparkSession, documents: DataFrame, key: String): DataFrame = {
    val dirDf = graft.GraftCache.memoArtifact(spark, ("jsonl_dir", key)) {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
      plantedJsonl(documents).write.mode("overwrite").text(dir)
      Seq(dir).toDF("dir")
    }
    val dir = dirDf.collect()(0).getString(0)
    spark.read
      .schema(parseSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
      .select(
        coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
        coalesce(col("lang"), lit("??")).as("lang"),
        coalesce(col("fp"), lit("")).as("fp"),
        col("_corrupt").isNull.as("ok"))
  }

  val jsonlIngestSql: String =
    """SELECT
      |  CASE WHEN doc_id % 7 = 0 THEN -1 ELSE doc_id END AS doc_id,
      |  CASE WHEN doc_id % 7 = 0 THEN '??' ELSE lang END AS lang,
      |  CASE WHEN doc_id % 7 = 0 THEN '' ELSE md5(text) END AS fp,
      |  doc_id % 7 <> 0 AS ok
      |FROM documents""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jsonl_ingest" -> ((s, d) => jsonlIngest(s, Tables.documents(s, d), d)))

  def oracle: Map[String, String] = Map(
    "q_jsonl_ingest" -> jsonlIngestSql)
}
