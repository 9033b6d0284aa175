package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for selected queries
  * (args, or a representative default set) so scan pruning, filter
  * pushdown, broadcast choices and codegen spans can be inspected.
  * `sbt 'runMain graft.Explain q1_pricing_summary ...'`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(4)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q_join_pushdown", "q_mutual_edges",
        "q_category_rollup", "q_dedup_minhash_lsh", "q_ann_lsh", "q_daily_quota",
        "q_neardup_cosine", "q_tfidf_topterms", "q_rolling_7d",
        "q18_large_orders", "q_cube_revenue", "q_dedup_incremental_bloom",
        "q_props_stats", "q_above_avg_orders",
        "q4_order_priority", "q7_volume_shipping", "q2_min_cost_supplier",
        "q_heavy_hitters", "q_source_overlap", "q_reservoir_sample",
        "q_bpe_train", "q_bpe_encode", "q_corpus_shuffle")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
