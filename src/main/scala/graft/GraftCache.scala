package graft

import java.util.concurrent.{ConcurrentHashMap, FutureTask}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.storage.StorageLevel

/** Input-keyed registry for graft's operator-internal persists.
  *
  * Several operators materialize a narrow intermediate (MinHash
  * signatures, quantized vectors, LSH buckets, follow edges) because
  * multiple self-join branches would otherwise recompute the map-side
  * work per branch. Spark's CacheManager already dedupes *storage* for
  * equivalent plans, but nothing ever released those entries: a
  * long-lived session embedding the operators accumulated orphaned
  * cached lineages (round-1 and round-2 advice).
  *
  * This registry makes the lifecycle explicit:
  *
  *  - [[persistTracked]] keys the persist by (session, canonicalized
  *    analyzed plan): the same operator over the same input reuses the
  *    one registered frame — repeated calls never grow the cache set.
  *  - [[releaseAll]] unpersists everything graft registered for a
  *    session — unlike `spark.catalog.clearCache()` it cannot clobber
  *    caches the *user* created. Call it when a batch of operator
  *    queries is done (Bench and Verify do, between queries; a library
  *    caller does at its own checkpoint boundaries).
  *  - Entries belonging to a STOPPED session are purged lazily on every
  *    registry call, so sessions that end without a releaseAll don't
  *    pin their object graphs in these process-global maps for the JVM
  *    lifetime.
  *
  * Operator-internal persists that are fully consumed inside one call
  * (k-means training iterations) do NOT go through the registry — they
  * unpersist themselves before returning.
  */
object GraftCache {

  private val entries = new ConcurrentHashMap[(SparkSession, LogicalPlan), DataFrame]()

  private def key(df: DataFrame): (SparkSession, LogicalPlan) =
    (df.sparkSession, df.queryExecution.analyzed.canonicalized)

  private def purgeStopped(): Unit = {
    val it = entries.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val ait = artifacts.keySet().iterator()
    while (ait.hasNext) if (ait.next()._1.sparkContext.isStopped) ait.remove()
  }

  /** Persist `df` (MEMORY_AND_DISK) and track it; if an equivalent frame
    * is already tracked for this session, return the tracked one instead
    * of re-registering.
    */
  def persistTracked(df: DataFrame): DataFrame = {
    purgeStopped()
    val k = key(df)
    // Persist BEFORE registering, so tracked == persisted always holds:
    // a concurrent loser that receives the winner's frame sees it already
    // persisted, and a persist() failure never leaves an unpersisted
    // frame registered. If two callers race past putIfAbsent, both
    // persist the same canonical plan — CacheManager dedupes that to ONE
    // cache entry (the second persist is a no-op), and releaseAll's
    // single unpersist of the tracked frame drops it. The loser must NOT
    // unpersist its handle: cached data is keyed by plan, so that would
    // evict the winner's entry too.
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val prev = entries.putIfAbsent(k, df)
    if (prev != null) prev else df
  }

  /** Run `body` and afterwards unpersist-and-forget every frame it
    * newly tracked for `spark` — the hygiene a LONG-RUNNING caller
    * needs around per-micro-batch work: a streaming foreachBatch that
    * routes through an operator using [[persistTracked]] would
    * otherwise register one cache entry per micro-batch (each batch has
    * a distinct plan) and grow without bound over days of serving.
    * Pre-existing entries (the session's static frames and memos) are
    * untouched.
    */
  def releaseCreatedDuring[T](spark: SparkSession)(body: => T): T = {
    val before = new java.util.HashSet[(SparkSession, LogicalPlan)]()
    entries.forEach((k, _) => if (k._1 eq spark) before.add(k))
    try body
    finally {
      val it = entries.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if ((e.getKey._1 eq spark) && !before.contains(e.getKey)) {
          e.getValue.unpersist(blocking = false)
          it.remove()
        }
      }
    }
  }

  /** Finished model artifacts (e.g. the 16-row k-means codebook): tiny
    * local-relation DataFrames memoized by (session, key) so repeated
    * query builds don't re-run training; dropped by [[releaseAll]] so a
    * session reset also re-trains.
    *
    * Values are held as FutureTasks so `compute` (which may be a
    * multi-second Spark training loop) runs OUTSIDE any map lock:
    * concurrent callers with the SAME key share one computation (the
    * losers block on `get`), while callers with different keys — e.g.
    * pqCodebooks' four concurrent subspace trainings — never serialize
    * behind each other's bin lock the way `computeIfAbsent` would force.
    */
  private val artifacts = new ConcurrentHashMap[(SparkSession, Any), FutureTask[DataFrame]]()

  def memoArtifact(spark: SparkSession, k: Any)(compute: => DataFrame): DataFrame = {
    purgeStopped()
    val task = new FutureTask[DataFrame](() => compute)
    val prev = artifacts.putIfAbsent((spark, k), task)
    val winner = if (prev != null) prev else { task.run(); task }
    try winner.get()
    catch {
      case e: java.util.concurrent.ExecutionException =>
        // a failed compute must not poison the memo for retries
        artifacts.remove((spark, k), winner)
        throw Option(e.getCause).getOrElse(e)
    }
  }

  /** Number of tracked entries for a session (test observability). */
  def trackedCount(spark: SparkSession): Int = {
    var n = 0
    entries.forEach((k, _) => if (k._1 eq spark) n += 1)
    n
  }

  /** Unpersist (blocking) and forget every frame tracked for `spark`;
    * also drop its memoized artifacts.
    */
  def releaseAll(spark: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        e.getValue.unpersist(blocking = true)
        it.remove()
      }
    }
    val ait = artifacts.keySet().iterator()
    while (ait.hasNext) if (ait.next()._1 eq spark) ait.remove()
  }
}
