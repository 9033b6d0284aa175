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
  * Round-3 taught that even the dual cold+warm rule fires under a loaded
  * box (q5 flagged at 3.68x with loadavg 4.45; idle re-run 1.0x): load
  * inflates EVERY query's ratio roughly uniformly, and the slowest query
  * crosses the absolute-delta bar first. So ratios are now normalized by
  * the run-level MEDIAN ratio before gating — uniform inflation cancels,
  * while a genuine single-query regression still stands out against the
  * median. A query is listed under `regressions` only when BOTH its
  * normalized warm (median-of-3) AND its normalized cold run exceed 1.5x
  * their baselines; `loadavg` (1/5/15-min) and the norm factors are
  * echoed into the JSON so a loaded box is visible in the artifact.
  *
  * Two round-4 lessons are wired in:
  *  - the median normalization is CAPPED (1.3×): an uncapped norm would
  *    absorb a uniform genuine regression (e.g. a GraftSession.tune
  *    change slowing everything) into the normalizer itself. Past the
  *    cap, per-query gates tighten again AND an UNNORMALIZED run-level
  *    guard fires when the shared-query cold/warm totals exceed their
  *    baseline totals by the regression factor.
  *  - the baseline is APPEND-ONLY, maintained by `tools/baseline_merge.py`:
  *    new queries are added with their first-run numbers; existing
  *    entries move only via an explicit `--rebase <reason>` logged in the
  *    file. `queries_first`/`queries_warm_first` freeze each query's
  *    first-landing numbers FOREVER (never rebased) and feed an
  *    informational `drift` report, so slow cross-round creep that
  *    successive rebases would launder stays visible in the artifact.
  *
  * Output: ONE compact JSON line on stdout (3-decimal per-query cold
  * seconds — round-3's full-precision line overflowed the driver's
  * tail-capture window and parsed as null) plus the full-precision
  * document, including the per-query warm map, at `bench_last.json`
  * (merge into bench_baseline.json via tools/baseline_merge.py).
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
  // Ceiling on the median-ratio normalizer: load inflation on this box
  // measures ~1.1-1.3x; anything past that is as likely a genuine
  // uniform regression as load, and an uncapped norm would cancel it
  // out of every per-query ratio (the gate would go blind exactly when
  // everything got slower).
  private val NormCap = 1.3
  // Informational drift thresholds vs the FROZEN first-landing numbers:
  // warm at this SF swings up to ~1.7x run-to-run on a loaded box, so
  // drift is only reported past 2x and a quarter second.
  private val DriftFactor = 2.0
  private val DriftDeltaSec = 0.25

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
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
    val (priorCold, priorWarm, firstCold, firstWarm) = {
      val p = Paths.get(sys.env.getOrElse("SPARK_GRAFT_BASELINE", "bench_baseline.json"))
      if (!Files.exists(p))
        (Map.empty[String, Double], Map.empty[String, Double],
          Map.empty[String, Double], Map.empty[String, Double])
      else {
        val txt = Files.readString(p)
        (section(txt, "queries"), section(txt, "queries_warm"),
          section(txt, "queries_first"), section(txt, "queries_warm_first"))
      }
    }
    // Run-level inflation: the median of per-query ratios vs baseline.
    // Clamped to >= 1.0 — a globally FASTER run must not raise the bar
    // for queries that merely didn't speed up as much as the median.
    // Needs a real population (>= 8 baselined queries) to be meaningful;
    // focus-list runs fall back to no normalization.
    def medianRatio(now: Map[String, Double], prior: Map[String, Double]): Double = {
      val rs = now.flatMap { case (n, v) =>
        prior.get(n).filter(_ > 0).filter(_ => v > 0).map(v / _)
      }.toSeq.sorted
      if (rs.size < 8) 1.0 else math.max(1.0, rs(rs.size / 2))
    }
    val nowCold = results.map(r => r._1 -> r._2).toMap
    val nowWarm = results.map(r => r._1 -> r._3).toMap
    val normC = math.min(medianRatio(nowCold, priorCold), NormCap)
    val normW = math.min(medianRatio(nowWarm, priorWarm), NormCap)
    val regressions = results.flatMap { case (n, cold, warm) =>
      (priorCold.get(n), priorWarm.get(n)) match {
        case (Some(oc), Some(ow)) if oc > 0 && ow > 0 && cold > 0 && warm > 0 =>
          val dual = cold > oc * normC * RegressionFactor &&
            warm > ow * normW * RegressionFactor &&
            warm - ow * normW > MinWarmDeltaSec
          // The severe warm-only rule exists for a broken warm path
          // (cache-reuse keying defeated): its signature is warm moving
          // hard while cold stays put. Its cold ceiling is EXACTLY the
          // dual rule's cold floor, so the two rules partition the
          // space: a severe warm regression with cold <= 1.5x lands
          // here; with cold > 1.5x the dual rule fires (its warm and
          // delta conditions are implied by the severe ones) — no dead
          // zone between the thresholds.
          val severeWarm = warm > ow * normW * SevereWarmFactor &&
            warm - ow * normW > SevereWarmDeltaSec &&
            cold <= oc * normC * RegressionFactor
          if (dual || severeWarm) {
            System.err.println(
              f"[bench] REGRESSION $n: warm $warm%.3fs vs $ow%.3fs (${warm / ow}%.2fx), " +
                f"cold $cold%.3fs vs $oc%.3fs (${cold / oc}%.2fx), norm ($normC%.2f, $normW%.2f)" +
                (if (severeWarm && !dual) " [severe warm-only]" else ""))
            Some(n -> BigDecimal(warm / (ow * normW)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          } else None
        case _ => None
      }
    }

    // Unnormalized run-level guard over the SHARED query set (totals of
    // different query sets are incomparable): a uniform regression that
    // the capped norm only partially absorbs still moves the raw totals,
    // so past RegressionFactor the run itself is flagged. Uses the same
    // dual cold+warm rule as per-query gating — pure load noise inflates
    // both, but so does a genuine global regression, and the artifact
    // carries loadavg precisely so the reader can tell them apart.
    val sharedTotals = {
      val shared = results.collect {
        case (n, c, w) if c > 0 && w > 0 &&
          priorCold.get(n).exists(_ > 0) && priorWarm.get(n).exists(_ > 0) => n
      }
      val nc = shared.map(nowCold).sum; val bc = shared.map(priorCold).sum
      val nw = shared.map(nowWarm).sum; val bw = shared.map(priorWarm).sum
      if (shared.size >= 8 && nc > bc * RegressionFactor && nw > bw * RegressionFactor) {
        System.err.println(
          f"[bench] RUN-LEVEL REGRESSION: shared-query totals cold $nc%.1fs vs " +
            f"$bc%.1fs, warm $nw%.1fs vs $bw%.1fs (unnormalized)")
        Seq("__total_cold__" -> BigDecimal(nc / bc).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
          "__total_warm__" -> BigDecimal(nw / bw).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
      } else Seq.empty
    }
    val allRegressions = regressions ++ sharedTotals

    // Informational drift vs the FROZEN first-landing numbers: not a
    // gate (warm noise at this SF reaches ~1.7x), but creep that
    // successive baseline rebases would otherwise launder shows up here
    // round after round until addressed.
    val drift = results.flatMap { case (n, _, warm) =>
      firstWarm.get(n).filter(_ > 0) match {
        case Some(fw) if warm > 0 && warm > fw * normW * DriftFactor &&
          warm - fw * normW > DriftDeltaSec =>
          Some(n -> BigDecimal(warm / (fw * normW)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
        case _ => None
      }
    }

    val loadavg =
      try Files.readString(Paths.get("/proc/loadavg")).trim.split(" ").take(3).toSeq
      catch { case _: Throwable => Seq("-1", "-1", "-1") }

    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def r3(v: Double): Double = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    val totalCold = results.map(_._2).filter(_ >= 0).sum
    val totalWarm = results.map(_._3).filter(_ >= 0).sum
    // Full-precision document (incl. per-query warm) for baseline rebases.
    val full = s"""{"metric":"total","value":$totalCold,"unit":"sec"""" +
      s""","queries":${obj(results.map(r => r._1 -> r._2))}""" +
      s""","queries_warm":${obj(results.map(r => r._1 -> r._3))}""" +
      s""","total_warm":$totalWarm""" +
      s""","regressions":${obj(allRegressions)}""" +
      s""","drift":${obj(drift)}""" +
      s""","norm":[$normC,$normW]""" +
      s""","loadavg":[${loadavg.mkString(",")}]""" +
      s""","sf":"$sfDir"}""" + "\n"
    Files.writeString(Paths.get("bench_last.json"), full)
    // Compact stdout line: the driver tail-captures ~4 KB of output. At
    // 123 queries even a 3-decimal per-query map alone exceeds that
    // (round 5's line truncated -> parsed:null, five rounds running), so
    // stdout now carries ONLY the dozen slowest cold queries as a
    // representative "queries" sample plus totals/regressions/drift;
    // the complete per-query cold+warm maps live in bench_last.json.
    val slowest = results.filter(_._2 > 0).sortBy(-_._2).take(12)
    println(s"""{"metric":"total","value":${r3(totalCold)},"unit":"sec"""" +
      s""","queries":${obj(slowest.map(r => r._1 -> r3(r._2)))}""" +
      s""","n_queries":${results.size}""" +
      s""","total_warm":${r3(totalWarm)}""" +
      s""","regressions":${obj(allRegressions)}""" +
      s""","drift":${obj(drift)}""" +
      s""","norm":[${r3(normC)},${r3(normW)}]""" +
      s""","loadavg":[${loadavg.mkString(",")}]""" +
      s""","queries_full":"bench_last.json"""" +
      s""","sf":"$sfDir"}""")
    spark.stop()
  }
}
