package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Scale-hazard audit: flags queries whose *executed* plan contains a
  * WindowExec with an empty partition spec (single-partition global
  * window — the one shape that cannot survive a large input). Exits
  * non-zero if any query trips it, so CI keeps the property.
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(4)
    // AQE wraps the plan in AdaptiveSparkPlanExec, hiding WindowExec from
    // a pre-execution collect — turn it off so the audit sees real nodes.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      System.err.println(s"[audit] building $name"); System.err.flush()
      val df = fn(spark, sfDir)
      val n = df.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.size
      if (n > 0) { bad += 1; println(s"GLOBAL-WINDOW $name: $n empty-partition WindowExec node(s)") }
    }
    println(s"== $bad queries with global windows ==")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
