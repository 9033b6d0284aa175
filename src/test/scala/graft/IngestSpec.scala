package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

class IngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local(2)
  lazy val tmp: String = Files.createTempDirectory("graft_ingest").toString

  override def afterAll(): Unit = spark.stop()

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv: valid rows parse, malformed rows quarantined, not crashed") {
    val p = s"$tmp/in.csv"
    Files.writeString(Paths.get(p),
      """id,name,score
        |1,alice,0.5
        |2,bob,0.75
        |not_a_long,carol,xyz
        |4,dora,1.0
        |""".stripMargin)
    val (clean, bad) = Ingest.quarantine(Ingest.readCsv(spark, p, schema))
    assert(clean.count() == 3)
    assert(bad.count() == 1)
    assert(bad.head().getString(0).startsWith("not_a_long"))
    assert(clean.schema.fieldNames.toSeq == Seq("id", "name", "score"))
  }

  test("jsonl: schema enforced, corrupt lines captured") {
    val p = s"$tmp/in.jsonl"
    Files.writeString(Paths.get(p),
      """{"id": 1, "name": "alice", "score": 0.5}
        |{"id": 2, "name": "bob", "score": 0.75}
        |{this is not json
        |{"id": 4, "name": "dora", "score": 1.0}
        |""".stripMargin)
    val (clean, bad) = Ingest.quarantine(Ingest.readJsonLines(spark, p, schema))
    assert(clean.count() == 3)
    assert(bad.count() == 1)
  }

  test("quarantine rate is observable (counts add up)") {
    val p = s"$tmp/in2.csv"
    Files.writeString(Paths.get(p), "id,name,score\n1,a,0.1\nbad,row,row\n")
    val parsed = Ingest.readCsv(spark, p, schema)
    val (clean, bad) = Ingest.quarantine(parsed)
    assert(clean.count() + bad.count() == 2)
  }
}
