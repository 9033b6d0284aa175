package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Designed for a real cluster (1000 executors / 100 TB): AQE owns runtime
  * re-planning (partition coalescing, skew-join splitting), broadcast
  * threshold is explicit, and shuffle partitions are sized to the local
  * parallelism here (the driver overrides per-deployment).
  */
object GraftSession {

  /** Apply graft's tuned configs to an existing builder. */
  def tune(b: SparkSession.Builder, cores: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]"), cores)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
