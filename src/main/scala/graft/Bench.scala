package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query cold and warm seconds.
  *
  * Methodology: a first pass executes every query once (JIT +
  * whole-stage-codegen compilation + parquet footer caching). Then per
  * query: `GraftCache.releaseAll` drops every graft-persisted frame, a
  * timed COLD run pays the full cost including signature/quantization
  * materialization, and three timed WARM runs reuse the frames the cold
  * run persisted; warm = median of the three (steady-state,
  * long-running-job view, robust to one load spike).
  *
  * Regression gate: compared against the committed `bench_baseline.json`
  * (prior round's numbers; overridable via SPARK_GRAFT_BASELINE). Round-2
  * taught that a warm-only gate cries wolf — the driver flagged 3
  * regressions that a clean re-run reduced to zero (machine-load noise).
  * A query is listed under `regressions` only when BOTH its warm (median)
  * AND its cold run exceed 1.5x their baselines — a genuine code
  * regression moves both; background load rarely hits the same query in
  * all four samples. `loadavg` (1/5/15-min) is echoed into the JSON so a
  * loaded box is visible in the artifact itself.
  */
object Bench {
  private val RegressionFactor = 1.5
  // Sub-second queries are scheduler-noise-dominated: a 0.1s query
  // doubling under background load is jitter, not a regression. Flag
  // only when the warm slowdown also costs real time.
  private val MinWarmDeltaSec = 0.25
  // Warm-ONLY escape hatch: a broken warm path (e.g. cache-reuse keying
  // defeated) moves warm hard while cold is unchanged, which the dual
  // cold+warm rule would miss. A severe warm regression (3x the
  // baseline and at least half a second of real cost, as the median of
  // three runs) is flagged regardless of cold.
  private val SevereWarmFactor = 3.0
  private val SevereWarmDeltaSec = 0.5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    // ERROR: WARN-level noise around the JSON line broke the round-1
    // driver parse (BENCH_r01.json has parsed:null, tail full of WARNs).
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Optional focus list for local iteration (the driver never sets it):
    // SPARK_GRAFT_QUERIES=q5_local_supplier_volume,q_ann_pq
    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      sys.env.get("SPARK_GRAFT_QUERIES")
        .map(csv => { val want = csv.split(",").map(_.trim).toSet; all.filter(want) })
        .getOrElse(all)
    }
    names.foreach(runOnce) // warmup: codegen + JIT + IO caches
    val results = names.map { n =>
      GraftCache.releaseAll(spark) // drop graft-tracked frames -> honest cold run
      val cold = runOnce(n)
      val ws = Seq(runOnce(n), runOnce(n), runOnce(n))
      val warm = if (ws.exists(_ < 0)) -1.0 else ws.sorted.apply(1) // median of 3
      (n, cold, warm)
    }
    GraftCache.releaseAll(spark)

    // Baseline sections parsed separately: the file carries cold numbers
    // under "queries" and warm under "queries_warm" with the same keys.
    def section(txt: String, key: String): Map[String, Double] = {
      val start = txt.indexOf("\"" + key + "\":{")
      if (start < 0) Map.empty
      else {
        val body = txt.substring(start + key.length + 4, txt.indexOf('}', start))
        "\"([A-Za-z0-9_]+)\":(-?[0-9]+\\.?[0-9Ee-]*)".r
          .findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .toMap
      }
    }
    val (priorCold, priorWarm) = {
      val p = Paths.get(sys.env.getOrElse("SPARK_GRAFT_BASELINE", "bench_baseline.json"))
      if (!Files.exists(p)) (Map.empty[String, Double], Map.empty[String, Double])
      else {
        val txt = Files.readString(p)
        (section(txt, "queries"), section(txt, "queries_warm"))
      }
    }
    val regressions = results.flatMap { case (n, cold, warm) =>
      (priorCold.get(n), priorWarm.get(n)) match {
        case (Some(oc), Some(ow)) if oc > 0 && ow > 0 =>
          val dual = cold > oc * RegressionFactor && warm > ow * RegressionFactor &&
            warm - ow > MinWarmDeltaSec
          val severeWarm = warm > ow * SevereWarmFactor && warm - ow > SevereWarmDeltaSec
          if (dual || severeWarm) {
            System.err.println(
              f"[bench] REGRESSION $n: warm $warm%.3fs vs $ow%.3fs (${warm / ow}%.2fx), " +
                f"cold $cold%.3fs vs $oc%.3fs (${cold / oc}%.2fx)" +
                (if (severeWarm && !dual) " [severe warm-only]" else ""))
            Some(n -> BigDecimal(warm / ow).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          } else None
        case _ => None
      }
    }

    val loadavg =
      try Files.readString(Paths.get("/proc/loadavg")).trim.split(" ").take(3).toSeq
      catch { case _: Throwable => Seq("-1", "-1", "-1") }

    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val totalCold = results.map(_._2).filter(_ >= 0).sum
    val totalWarm = results.map(_._3).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$totalCold,"unit":"sec"""" +
      s""","queries":${obj(results.map(r => r._1 -> r._2))}""" +
      s""","queries_warm":${obj(results.map(r => r._1 -> r._3))}""" +
      s""","total_warm":$totalWarm""" +
      s""","regressions":${obj(regressions)}""" +
      s""","loadavg":[${loadavg.mkString(",")}]""" +
      s""","sf":"$sfDir"}""")
    spark.stop()
  }
}
