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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_last_click" -> ((s, d) => asofLastClick(Tables.events(s, d))))

  def oracle: Map[String, String] = Map(
    "q_asof_last_click" -> asofLastClickSql)
}
