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

  /** q_debounce: minimum quiet period before an event is kept */
  val DebounceGapUs: Long = 3600L * 1000000L

  /** Funnel step window: each stage must follow the previous within 24 h
    * (microseconds) — sized to the events table's time spread (median
    * intra-user gap ≈ 12 h, p90 ≈ 41 h), so the funnel discriminates:
    * plenty of real conversions, plenty of timed-out sequences. */
  val FunnelGapUs: Long = 86400L * 1000000L

  /** q_burst_detect: rate bucket width (1 h) and the burst threshold — a
    * bucket is a burst when its count is ≥ [[BurstFactor]]× the type's
    * mean per-bucket rate over its active span AND ≥ [[BurstMinCnt]]
    * absolute events. The floor is load-bearing, not cosmetic: a type
    * whose total mass is under span/3 buckets has a mean rate < 1/3, so a
    * SINGLE event beats 3× the mean — rate-only thresholds flag every
    * lonely event of every sparse stream (the sf corpus has hundreds of
    * such buckets). */
  val BurstBucketUs: Long = 3600L * 1000000L
  val BurstFactor: Long   = 3L
  val BurstMinCnt: Long   = 3L

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
    // 3-step event-sequence funnel (view → click → purchase, each step
    // within FunnelGapUs of the previous): the SAME no-join union+window
    // shape as the as-of join, chained — one hash shuffle on user_id, one
    // sort, then two running last(ignoreNulls) passes over the same
    // partitioning (Catalyst reuses the Exchange+Sort for the second
    // Window): pass 1 carries the latest view time, pass 2 the latest
    // QUALIFIED click time (a click within the gap of that view), and a
    // purchase converts iff it sits within the gap of a qualified click.
    // The naive alternative is two inequality self-joins — per-key
    // quadratic on hot users; this is linear in events after one shuffle.
    // Weekly retention cohorts — the classic product-analytics matrix
    // (cohort = a user's first-activity week; cell (c, +k) = how many of
    // cohort c's users were active k weeks later, as exact ppm of the
    // cohort). Scale shape: first-activity is one partial min-agg per
    // user; activity cells are a distinct over (user, week) — both
    // shuffles carry (user, int) pairs; cohort sizes are a
    // weeks-cardinality frame broadcast back. Offset 0 is the cohort
    // itself (retention_ppm = 10⁶ by construction — kept as the
    // self-check row).
    "q_retention_cohorts" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 604800000000").as("week"))
      val firsts = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val sizes = firsts.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("cohort_size"))
      val cells = ev.distinct()
        .join(firsts, Seq("user_id"))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      cells.join(broadcast(sizes), Seq("cohort_week"))
        .withColumn("retention_ppm",
          expr("(n_active * 1000000) div cohort_size"))
    }),

    "q_event_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), us(col("ts")).as("us"), col("event_id"),
          when(col("event_type") === "view", 0)
            .when(col("event_type") === "click", 1).otherwise(2).as("stage"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("stage").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev
        .withColumn("v_us",
          last(when(col("stage") === 0, col("us")), ignoreNulls = true).over(w))
        .withColumn("qc",
          when(col("stage") === 1 && col("us") - col("v_us") <= FunnelGapUs, col("us")))
        .withColumn("qc_us", last(col("qc"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(
          count(when(col("stage") === 0, 1)).as("n_views"),
          count(when(col("stage") === 1, 1)).as("n_clicks"),
          count(when(col("stage") === 2, 1)).as("n_purchases"),
          count(when(col("stage") === 2 && col("us") - col("qc_us") <= FunnelGapUs, 1))
            .as("n_conversions"))
        .withColumn("converted", col("n_conversions") > 0)
    }),

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
    }),

    // SCD2 version-interval build (the time-travel table a recrawl store
    // keeps per URL): events replay as fetch observations of ~97 URLs
    // (user_id mod 97, the q_recrawl_schedule corpus), event_type as the
    // content-version stand-in. Consecutive same-version observations
    // collapse into one run; each run becomes a row with
    // [valid_from, valid_to) — valid_to = the NEXT run's first
    // observation (null for the current version). This is the table
    // "what did this URL look like at time T?" queries probe with the
    // catalog's as-of join. Scale shape: the sessionize discipline — one
    // url-keyed window pass over the observation stream (change flag +
    // running run_id), then a (url, run) aggregation and one more
    // url-keyed window for the lead(); runs ≪ observations, timestamps
    // compare in epoch-µs integers on both engines.
    // Quiet-period debounce (the clickstream-cleaning twin of the
    // streaming rate limiter): an event is KEPT iff it is its user's
    // first or at least DebounceGapUs after the previous raw event —
    // the duplicate-fire suppression every event pipeline runs before
    // counting anything. One lag() pass per user partition; emitted
    // grain = every event with its gap and verdict, so downstream both
    // keeps and drops stay auditable. Suppresses ~8.5% of this corpus.
    "q_debounce" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), us(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("kept", col("gap_us").isNull || col("gap_us") > DebounceGapUs)
    }),

    // Burst (rate-anomaly) detection — the monitoring primitive every
    // ingest pipeline runs over its event firehose: bucket each event
    // type's stream into fixed 1 h rate buckets and flag buckets whose
    // count is ≥ BurstFactor× the type's mean per-bucket rate across its
    // active span (max−min+1 buckets — quiet hours count, so a type that
    // fires once a week doesn't self-flag). The comparison is the usual
    // integer-lattice move: rate_ppm = (cnt·n_buckets·10^6) div total —
    // exact int64, no float mean. A burst is PLANTED so the detector has
    // a guaranteed true positive on every corpus: copies of the
    // user_id%10==0 view events re-stamped to the stream's first bucket
    // (~10% of view mass collapsed into one hour ≫ 3× the mean). Scale
    // shape: one groupBy(type, bucket) count with map-side partial agg —
    // shuffles carry (type, int64, int64); the per-type span/total rollup
    // is ≤ |types| rows, broadcast back.
    "q_burst_detect" -> ((s, dir) => {
      val base = t(s, dir, "events")
        .select(col("event_type"), us(col("ts")).as("u"), col("user_id"))
      val mn = base.agg(min(col("u")).as("mnu"))
      val planted = base
        .filter(col("event_type") === "view" && col("user_id") % 10 === 0)
        .crossJoin(broadcast(mn))
        .select(col("event_type"), col("mnu").as("u"))
      val cnt = base.select(col("event_type"), col("u"))
        .unionByName(planted)
        .withColumn("bucket", expr(s"u div $BurstBucketUs"))
        .groupBy(col("event_type"), col("bucket")).agg(count(lit(1)).as("cnt"))
      val tot = cnt.groupBy(col("event_type"))
        .agg(sum(col("cnt")).as("total"),
          (max(col("bucket")) - min(col("bucket")) + 1).as("n_buckets"))
      cnt.join(broadcast(tot), Seq("event_type"))
        .withColumn("rate_ppm", expr("(cnt * n_buckets * 1000000) div total"))
        .withColumn("is_burst",
          col("rate_ppm") >= BurstFactor * 1000000L && col("cnt") >= BurstMinCnt)
        .select(col("event_type"), col("bucket"), col("cnt"), col("n_buckets"),
          col("total"), col("rate_ppm"), col("is_burst"))
    }),

    "q_url_version_intervals" -> ((s, dir) => {
      val obs = t(s, dir, "events").select(
        (col("user_id") % 97L).as("url_id"), col("event_id"),
        us(col("ts")).as("us"), col("event_type").as("version"))
      val w = Window.partitionBy(col("url_id")).orderBy(col("us"), col("event_id"))
      val prev = lag(col("version"), 1).over(w)
      val runs = obs
        .withColumn("chg",
          when(prev.isNull || prev =!= col("version"), 1L).otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val iv = runs.groupBy(col("url_id"), col("run_id"), col("version"))
        .agg(min(col("us")).as("valid_from_us"), max(col("us")).as("last_seen_us"),
          count(lit(1)).as("n_obs"))
      val w2 = Window.partitionBy(col("url_id")).orderBy(col("run_id"))
      iv.withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
        .withColumn("is_current", col("valid_to_us").isNull)
    }))

  val oracles: Map[String, String] = Map(
    "q_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events),
        |firsts AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
        |sizes AS (
        |  SELECT cohort_week, count(*)::BIGINT AS cohort_size
        |  FROM firsts GROUP BY 1),
        |cells AS (
        |  SELECT cohort_week, week - cohort_week AS week_offset,
        |    count(*)::BIGINT AS n_active
        |  FROM (SELECT DISTINCT user_id, week FROM ev) a
        |  JOIN firsts USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_active, cohort_size,
        |  ((n_active * 1000000) // cohort_size)::BIGINT AS retention_ppm
        |FROM cells JOIN sizes USING (cohort_week)""".stripMargin,

    "q_asof_join" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
        |      FROM events WHERE event_type = 'view')
        |SELECT c.click_id, c.user_id, v.view_id, c.c_us - v.v_us AS lag_us
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.c_us >= v.v_us""".stripMargin,
    "q_event_funnel" -> {
      val over = "OVER (PARTITION BY user_id ORDER BY us, stage, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id,
         |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS stage
         |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
         |s1 AS (
         |  SELECT *, last_value(CASE WHEN stage = 0 THEN us END IGNORE NULLS) $over AS v_us
         |  FROM e),
         |s2 AS (
         |  SELECT *, last_value(
         |      CASE WHEN stage = 1 AND us - v_us <= $FunnelGapUs THEN us END IGNORE NULLS)
         |    $over AS qc_us
         |  FROM s1)
         |SELECT user_id,
         |  count(CASE WHEN stage = 0 THEN 1 END)::BIGINT AS n_views,
         |  count(CASE WHEN stage = 1 THEN 1 END)::BIGINT AS n_clicks,
         |  count(CASE WHEN stage = 2 THEN 1 END)::BIGINT AS n_purchases,
         |  count(CASE WHEN stage = 2 AND us - qc_us <= $FunnelGapUs THEN 1 END)::BIGINT AS n_conversions,
         |  count(CASE WHEN stage = 2 AND us - qc_us <= $FunnelGapUs THEN 1 END) > 0 AS converted
         |FROM s2 GROUP BY 1""".stripMargin
    },
    "q_range_join" ->
      s"""WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS c_us
         |           FROM events WHERE event_type = 'click'),
         |e AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS e_us
         |      FROM events WHERE event_type = 'error')
         |SELECT c.click_id, e.error_id, c.user_id, c.c_us - e.e_us AS gap_us
         |FROM c JOIN e ON c.user_id = e.user_id
         | AND c.c_us >= e.e_us AND c.c_us < e.e_us + $RangeWindowUs""".stripMargin,

    "q_debounce" ->
      s"""SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
         |  (epoch_us(ts) - lag(epoch_us(ts)) OVER w) IS NULL
         |    OR (epoch_us(ts) - lag(epoch_us(ts)) OVER w) > $DebounceGapUs AS kept
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin,

    "q_burst_detect" ->
      s"""WITH base AS (
         |  SELECT event_type, epoch_us(ts) AS u, user_id FROM events),
         |planted AS (
         |  SELECT event_type, (SELECT min(u) FROM base) AS u
         |  FROM base WHERE event_type = 'view' AND user_id % 10 = 0),
         |c AS (
         |  SELECT event_type, u // $BurstBucketUs AS bucket, count(*)::BIGINT AS cnt
         |  FROM (SELECT event_type, u FROM base
         |        UNION ALL SELECT event_type, u FROM planted)
         |  GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, sum(cnt)::BIGINT AS total,
         |    (max(bucket) - min(bucket) + 1)::BIGINT AS n_buckets
         |  FROM c GROUP BY 1)
         |SELECT c.event_type, bucket, cnt, n_buckets, total,
         |  ((cnt * n_buckets * 1000000) // total)::BIGINT AS rate_ppm,
         |  ((cnt * n_buckets * 1000000) // total >= ${BurstFactor * 1000000L}
         |   AND cnt >= $BurstMinCnt) AS is_burst
         |FROM c JOIN t USING (event_type)""".stripMargin,

    "q_url_version_intervals" ->
      """WITH o AS (
        |  SELECT user_id % 97 AS url_id, event_id, epoch_us(ts) AS us,
        |    event_type AS version
        |  FROM events),
        |c AS (
        |  SELECT *, (CASE WHEN lag(version) OVER w IS NULL
        |    OR lag(version) OVER w <> version THEN 1 ELSE 0 END)::BIGINT AS chg
        |  FROM o WINDOW w AS (PARTITION BY url_id ORDER BY us, event_id)),
        |r AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY url_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run_id
        |  FROM c),
        |iv AS (
        |  SELECT url_id, run_id, version, min(us)::BIGINT AS valid_from_us,
        |    max(us)::BIGINT AS last_seen_us, count(*)::BIGINT AS n_obs
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT url_id, run_id, version, valid_from_us, last_seen_us, n_obs,
        |  (lead(valid_from_us) OVER w2)::BIGINT AS valid_to_us,
        |  lead(valid_from_us) OVER w2 IS NULL AS is_current
        |FROM iv WINDOW w2 AS (PARTITION BY url_id ORDER BY run_id)""".stripMargin)
}
