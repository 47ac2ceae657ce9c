package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as primitives —
  * as-of join and range (interval) join — expressed in the only shapes
  * that survive 100 TB:
  *
  *  - **As-of join** = union + single hash-partition on the key + one
  *    sort + a running `last(..., ignoreNulls)` window. NO join node at
  *    all: the classic sort-merge-asof. One shuffle whose payload is
  *    (key, ts, id) — never a per-key gather, never an inequality-join
  *    range explosion. Skew profile is identical to sessionization
  *    (bounded by the hottest key's event count).
  *
  *  - **Range join** = the bucketed interval join: intervals are exploded
  *    into the fixed-width time bins they overlap (bin width == interval
  *    width ⇒ ≤ 2 bins per interval), points map to exactly one bin, and
  *    the join is a plain EQUI-join on (key, bin) + an exact residual
  *    filter. Candidate pairs are bounded by true bin co-occupancy
  *    instead of the per-key cartesian an inequality join degrades to;
  *    Catalyst would otherwise plan `l.ts BETWEEN r.ts AND r.ts+W` with a
  *    key-equality as a SortMergeJoin whose per-key inner loop is
  *    quadratic in the hot key.
  *
  * Both oracles are native DuckDB: `ASOF LEFT JOIN` for the former (the
  * standard operator semantics, not our reimplementation of it) and a raw
  * inequality join for the latter — so the hash compare proves the
  * Spark-shaped plans reproduce the canonical operator definitions.
  * Timestamps compare in epoch microseconds (`unix_micros` / `epoch_us`,
  * session TZ pinned UTC) so no engine-side timestamp formatting is in
  * the hashed output.
  */
object Temporal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Range-join interval width: 2 h in microseconds. Also the bin width —
    * equal widths keep every interval inside ≤ 2 bins. */
  val RangeWindowUs: Long = 7200L * 1000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: for every click, the latest view by the same user at or
    // before the click (ties at equal ts include the view — the right side
    // sorts first). (user_id, ts) is unique in the events table, so the
    // match is total-order deterministic.
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"), us(col("ts")).as("us"), lit(1).as("side"),
        col("event_id").as("click_id"), lit(null).cast("long").as("view_id"))
      val views = ev.filter(col("event_type") === "view").select(
        col("user_id"), us(col("ts")).as("us"), lit(0).as("side"),
        lit(null).cast("long").as("click_id"), col("event_id").as("view_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the union carries view ids in their own column; a running
      // last-non-null is exactly "most recent right row at or before me"
      clicks.unionByName(views)
        .withColumn("m_view_id", last(col("view_id"), ignoreNulls = true).over(w))
        .withColumn("m_vus",
          last(when(col("side") === 0, col("us")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("click_id"), col("user_id"),
          col("m_view_id").as("view_id"),
          (col("us") - col("m_vus")).as("lag_us"))
    }),

    // Range join: clicks landing inside any [error_ts, error_ts + 2 h)
    // window of the same user. Each error window explodes into the ≤ 2
    // bins it overlaps; each click has exactly one bin, so a qualifying
    // (click, error) pair is produced exactly once.
    "q_range_join" -> ((s, dir) => {
      val W  = RangeWindowUs
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click").select(
        col("event_id").as("click_id"), col("user_id"), us(col("ts")).as("c_us"))
        .withColumn("c_bin", expr(s"c_us DIV $W"))
      val errors = ev.filter(col("event_type") === "error").select(
        col("event_id").as("error_id"), col("user_id").as("e_user"),
        us(col("ts")).as("e_us"))
        .withColumn("e_bin",
          explode(sequence(expr(s"e_us DIV $W"), expr(s"(e_us + ${W - 1}) DIV $W"))))
      clicks.join(errors,
          col("user_id") === col("e_user") && col("c_bin") === col("e_bin"))
        .filter(col("c_us") >= col("e_us") && col("c_us") < col("e_us") + W)
        .select(col("click_id"), col("error_id"), col("user_id"),
          (col("c_us") - col("e_us")).as("gap_us"))
    }))

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
        |      FROM events WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id, c.c_us - v.v_us AS lag_us
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.c_us >= v.v_us""".stripMargin,
    "q_range_join" ->
      s"""WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
         |           FROM events WHERE event_type = 'click'),
         |e AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS e_us
         |      FROM events WHERE event_type = 'error')
         |SELECT c.click_id, e.error_id, c.user_id, c.c_us - e.e_us AS gap_us
         |FROM c JOIN e ON c.user_id = e.user_id
         | AND c.c_us >= e.e_us AND c.c_us < e.e_us + $RangeWindowUs""".stripMargin)
}
