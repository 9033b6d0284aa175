package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal operators Spark lacks natively, re-expressed scale-safe.
  *
  * The headline is the backward as-of join. The naive formulation is a
  * range join (`l.key = r.key AND r.t <= l.t` + argmax per left row) —
  * a per-pair explosion Spark plans as BroadcastNestedLoop or an
  * exploded theta join, both unusable at 100 TB. This one is the
  * union-and-running-last trick: tag both sides, union, ONE hash
  * shuffle on the key, sort within the (key) window, carry the latest
  * right value forward. Cost is a single window over |L|+|R| rows —
  * the same shape sessionize uses, linear, skew-bounded by the key.
  */
object Temporal {

  private def tUs(c: org.apache.spark.sql.Column) = unix_micros(c)

  /** Backward as-of join: for each left row, the latest right row with
    * the same `key` and `t` ≤ the left row's `t` (inclusive). Output =
    * left columns + `asof_t` / `asof_val` (null when no right row
    * precedes). The right side is pre-aggregated to one row per
    * (key, t) — max of `rightVal` — so equal-timestamp right rows can't
    * make the result order-dependent (DuckDB's native ASOF leaves that
    * tie unspecified; we pin it on both sides).
    *
    * Left must not already contain columns named `asof_t` / `asof_val`
    * / `__src`.
    */
  def asOfBackward(left: DataFrame, right: DataFrame,
                   key: String, t: String, rightVal: String): DataFrame = {
    val r = right.groupBy(col(key), col(t)).agg(max(col(rightVal)).as(rightVal))
      .withColumn("__src", lit(0))
    val l = left.withColumn("__src", lit(1))
    // right rows sort BEFORE left rows at equal t (ties are inclusive)
    val w = Window.partitionBy(key).orderBy(col(t), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("asof_t",
        last(when(col("__src") === 0, col(t)), ignoreNulls = true).over(w))
      .withColumn("asof_val",
        last(when(col("__src") === 0, col(rightVal)), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .drop("__src", rightVal)
  }

  /** A18: last click before each purchase, per user — the attribution
    * query every event pipeline runs, and the as-of join's test vehicle.
    * The oracle uses DuckDB's NATIVE `ASOF LEFT JOIN`, so two
    * independent formulations (running-last window vs. ASOF) must agree
    * row for row.
    */
  def asofLastClick(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), tUs(col("ts")).as("t_us"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), tUs(col("ts")).as("t_us"), col("event_id").as("click_id"))
    asOfBackward(purchases, clicks, "user_id", "t_us", "click_id")
      .select(col("event_id"), col("user_id"), col("t_us"),
        col("asof_t").as("click_t_us"), col("asof_val").as("click_id"))
  }

  val asofLastClickSql: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS t_us, event_id
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, t_us, max(click_id) AS click_id FROM
      |        (SELECT user_id, epoch_us(ts) AS t_us, event_id AS click_id
      |         FROM events WHERE event_type = 'click')
      |      GROUP BY 1, 2)
      |SELECT p.event_id, p.user_id, p.t_us,
      |       c.t_us AS click_t_us, c.click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t_us >= c.t_us""".stripMargin

  /** A19: range self-join — pairs of same-user events within
    * `windowUs` of each other (the burst detector for the reference's
    * ≥3 s anti-detection pacing rule; the synthetic corpus needs a
    * 10-minute window to be non-vacuous). The naive formulation is a
    * per-user theta join (quadratic); this is the bucketed range join:
    * quantize time to window-width buckets, explode the LEFT side into
    * its own and the next bucket, equi-join on (user, bucket) — each
    * qualifying ordered pair (Δt ≤ window ⇒ right bucket ∈ {left,
    * left+1}) matches exactly once, no post-dedup — then filter the
    * exact range. Shuffle cost is linear in events; per-task work is
    * bounded by bucket occupancy, not user history.
    */
  def burstPairs(events: DataFrame, windowUs: Long = 600L * 1000000L): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"), tUs(col("ts")).as("t"))
    val l = e.select(col("user_id"), col("event_id").as("e1"), col("t").as("t1"))
      .withColumn("b", explode(array(
        expr(s"t1 div $windowUs"), expr(s"t1 div $windowUs") + 1)))
    val r = e.select(col("user_id"), col("event_id").as("e2"), col("t").as("t2"))
      .withColumn("b", expr(s"t2 div $windowUs"))
    l.join(r, Seq("user_id", "b"))
      .filter(col("t2") > col("t1") ||
        (col("t2") === col("t1") && col("e2") > col("e1")))
      .filter(col("t2") - col("t1") <= windowUs)
      .select(col("user_id"), col("e1"), col("e2"), (col("t2") - col("t1")).as("dt_us"))
  }

  val burstPairsSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events)
      |SELECT a.user_id, a.event_id AS e1, b.event_id AS e2, b.t - a.t AS dt_us
      |FROM e a JOIN e b ON a.user_id = b.user_id
      |  AND (b.t > a.t OR (b.t = a.t AND b.event_id > a.event_id))
      |  AND b.t - a.t <= 600000000""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_last_click" -> ((s, d) => asofLastClick(Tables.events(s, d))),
    "q_burst_pairs" -> ((s, d) => burstPairs(Tables.events(s, d))))

  def oracle: Map[String, String] = Map(
    "q_asof_last_click" -> asofLastClickSql,
    "q_burst_pairs" -> burstPairsSql)
}
