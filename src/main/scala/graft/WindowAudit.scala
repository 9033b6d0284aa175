package graft

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Crc32, Expression, Md5, Month, Murmur3Hash, Pmod, Remainder, Sha1, Sha2, TruncDate, TruncTimestamp, XxHash64, Year}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Window => LogicalWindow}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-hazard audit over every registered query. Three checks:
  *
  *  1. Executed plan contains a WindowExec with an empty partition spec —
  *     a single-partition global window, the one shape that cannot
  *     survive a large input.
  *  2. Analyzed plan contains a Window partitioned by a *time-bucket*
  *     expression (date_trunc / trunc / year / month over a raw column)
  *     with no aggregate or limit between the window and the scan. One
  *     day/month = one window partition AQE cannot split; at production
  *     volume that is a full sort of every row of the heaviest bucket in
  *     one task (the q_daily_quota hazard — fixed via the bounded
  *     [[graft.functions.Exprs.MinKLong]] aggregate; this check keeps it
  *     fixed).
  *  3. Analyzed plan contains a Window partitioned only by
  *     *bounded-catalog* attributes (source/lang/status/…) over a raw
  *     frame — the same hazard keyed on an enum (the r04 `batchAssign`
  *     shape, fixed via [[graft.operators.DistributedRank]]).
  *
  * Exits non-zero if any query trips either check, so CI keeps the
  * property.
  */
object WindowAudit {

  /** Expand attributes through Project aliases so a partition key like
    * `day` is seen as the `to_date(date_trunc(...))` that produced it.
    * Iterated to a fixpoint: one transformUp pass does not re-visit the
    * substituted subtrees, so an alias-of-an-alias (two chained
    * Projects) needs further passes; the bound guards against any
    * pathological alias cycle.
    */
  private def expand(e: Expression, aliases: Map[Long, Expression]): Expression = {
    var cur = e
    var i = 0
    while (i < 20) {
      val next = cur.transformUp {
        case a: Attribute if aliases.contains(a.exprId.id) => aliases(a.exprId.id)
      }
      if (next.fastEquals(cur)) return next
      cur = next
      i += 1
    }
    cur
  }

  private def isTimeBucket(e: Expression): Boolean =
    e.exists {
      case _: TruncDate | _: TruncTimestamp | _: Year | _: Month => true
      case _ => false
    }

  /** Catalog attributes with bounded cardinality: a window partitioned
    * ONLY by these has at most |catalog| partitions, so one dominant
    * value (one source, one language) becomes one unsplittable task at
    * production volume — the same hazard class as a time bucket, keyed
    * on an enum instead. Curated from the testdata schema + TPC-H
    * enum-like columns.
    */
  private val boundedCatalog: Set[String] = Set(
    "source", "lang", "language", "split", "event_type", "status",
    "o_orderstatus", "o_orderpriority", "l_returnflag", "l_linestatus",
    "l_shipmode", "r_name", "n_name", "c_mktsegment", "p_brand",
    "p_container", "p_type")

  /** True if the expression references at least one attribute and every
    * attribute it references is a bounded catalog column. A partition
    * key mixing in any unbounded attribute (doc_id, a hash bucket, a
    * shard) splits the bounded value across tasks and is safe.
    */
  private def isBoundedCatalogOnly(e: Expression): Boolean = {
    val attrs = e.collect { case a: Attribute => a }
    attrs.nonEmpty && attrs.forall(a => boundedCatalog.contains(a.name.toLowerCase))
  }

  /** True if the expression computes a full-width content fingerprint —
    * md5 / sha / crc32 / murmur3 / xxhash64 over data columns. A window
    * partitioned by such a key groups ALL identical content into one
    * partition: a boilerplate page duplicated 10⁸ times (empty pages,
    * cookie banners) is ONE unsplittable WindowExec task at crawl scale
    * (the r10 C1-keeper finding). The two-phase `groupBy(fp)` + join-back
    * shape computes the same answer with map-side partials and AQE
    * skew-splittable joins.
    */
  private def isFingerprint(e: Expression): Boolean =
    e.exists {
      case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: Murmur3Hash | _: XxHash64 => true
      case _ => false
    }

  /** True if the expression is bounded by a modulo or an equal-depth
    * bucketing — a salt / bucket key (`pmod(hash(...), n)`, or
    * [[graft.functions.Exprs.SearchSortedLong]] over the DistributedRank
    * cut points). Those exist to SPLIT hot keys across a bounded task
    * space and are the fix, not the hazard; they are excluded from the
    * fingerprint check (a bucket key whose one value dominates is the
    * bounded-key hazard class, and DistributedRank's local windows rank
    * WITHIN a bucket by construction).
    */
  private def isModBounded(e: Expression): Boolean =
    e.exists {
      case _: Pmod | _: Remainder => true
      case _: graft.functions.Exprs.SearchSortedLong => true
      case _ => false
    }

  /** True if every path from this window's child to the leaves passes
    * through an aggregate or limit — i.e. the window runs over an
    * already-reduced frame, where per-bucket cardinality is bounded.
    */
  private def reducedBelow(p: LogicalPlan): Boolean = p match {
    case _: Aggregate | _: GlobalLimit | _: LocalLimit => true
    case l if l.children.isEmpty => false
    case l => l.children.forall(reducedBelow)
  }

  /** True if every path from this physical node to its leaves passes
    * through an aggregate or limit — the executed-plan twin of
    * [[reducedBelow]]: a global window over a fully-reduced frame (the
    * DistributedRank offsets prefix-sum, ≤ `buckets` rows by
    * construction) is bounded work in one task, not a scale hazard.
    * Same documented blind spot as the logical checks: an aggregate
    * grouped by an unbounded key would be exempted too — every current
    * reduced-frame window aggregates onto a literal-bounded bucket
    * space.
    */
  private def reducedBelowPhysical(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
    p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
      case _ if p.nodeName.contains("Limit") => true
      // a physical top-k IS a limit: output bounded to k rows by
      // construction (q_embed_outliers' rank window over its top-k)
      case _ if p.nodeName.contains("TakeOrderedAndProject") => true
      case l if l.children.isEmpty => false
      case l => l.children.forall(reducedBelowPhysical)
    }

  /** Count of single-partition (global) WindowExec nodes over a
    * NON-reduced frame in the executed plan. Run with AQE off so
    * WindowExec is visible pre-execution.
    */
  def globalWindows(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !reducedBelowPhysical(w.child) => w
    }.size

  private def aliasMap(analyzed: LogicalPlan): Map[Long, Expression] =
    analyzed.collect { case p =>
      p.expressions.flatMap(_.collect { case a: Alias => a.exprId.id -> a.child })
    }.flatten.toMap

  /** Count of logical Window nodes partitioned ONLY by time-bucket
    * expressions over a non-reduced (raw) frame.
    */
  def timeBucketWindows(df: org.apache.spark.sql.DataFrame): Int = {
    val analyzed = df.queryExecution.analyzed
    val aliases = aliasMap(analyzed)
    analyzed.collect {
      case w: LogicalWindow
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(ps => isTimeBucket(expand(ps, aliases))) &&
            !reducedBelow(w.child) =>
        w
    }.size
  }

  /** Count of logical Window nodes partitioned ONLY by bounded-catalog
    * attributes over a non-reduced (raw) frame — the r04 `batchAssign`
    * shape (`Window.partitionBy("source")` over raw documents). Windows
    * over reduced frames (e.g. a prefix-sum over a per-bucket aggregate,
    * the [[graft.operators.DistributedRank]] scaffold) are fine: their
    * per-partition row count is bounded by the aggregate.
    */
  def boundedKeyWindows(df: org.apache.spark.sql.DataFrame): Int = {
    val analyzed = df.queryExecution.analyzed
    val aliases = aliasMap(analyzed)
    analyzed.collect {
      case w: LogicalWindow
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(ps => isBoundedCatalogOnly(expand(ps, aliases))) &&
            !reducedBelow(w.child) =>
        w
    }.size
  }

  /** Count of logical Window nodes whose partition spec includes a
    * non-mod-bounded content-fingerprint key over a non-reduced (raw)
    * frame — the r10 C1-keeper shape (`Window.partitionBy("fp")` with
    * `fp = md5(text)` over raw documents). Salted windows
    * (`partitionBy(key, pmod(hash(...), n))`) are exempt: the salt
    * element is mod-bounded and the remaining elements carry no hash.
    */
  def fingerprintKeyWindows(df: org.apache.spark.sql.DataFrame): Int = {
    val analyzed = df.queryExecution.analyzed
    val aliases = aliasMap(analyzed)
    analyzed.collect {
      case w: LogicalWindow
          if w.partitionSpec.nonEmpty && {
            val expanded = w.partitionSpec.map(ps => expand(ps, aliases))
            expanded.filterNot(isModBounded).exists(isFingerprint)
          } && !reducedBelow(w.child) =>
        w
    }.size
  }

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

      val nGlobal = globalWindows(df)
      if (nGlobal > 0) {
        bad += 1
        println(s"GLOBAL-WINDOW $name: $nGlobal empty-partition WindowExec node(s)")
      }

      val nTimeBucket = timeBucketWindows(df)
      if (nTimeBucket > 0) {
        bad += 1
        println(s"TIME-BUCKET-WINDOW $name: $nTimeBucket window(s) partitioned only " +
          "by a time bucket over a raw frame (unsplittable per-bucket sort at scale)")
      }

      val nBoundedKey = boundedKeyWindows(df)
      if (nBoundedKey > 0) {
        bad += 1
        println(s"BOUNDED-KEY-WINDOW $name: $nBoundedKey window(s) partitioned only " +
          "by bounded catalog attributes over a raw frame (one dominant value = " +
          "one unsplittable task at scale)")
      }

      val nFingerprint = fingerprintKeyWindows(df)
      if (nFingerprint > 0) {
        bad += 1
        println(s"FINGERPRINT-KEY-WINDOW $name: $nFingerprint window(s) partitioned " +
          "by a content fingerprint over a raw frame (a 10^8-duplicated boilerplate " +
          "doc = one unsplittable task at scale; use groupBy(fp) + join-back)")
      }
    }
    println(s"== $bad queries with scale-hazard windows ==")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
