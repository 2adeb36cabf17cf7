package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Det.{r4, r4Sql}
import graft.sources.Tables

/** Event-stream operators over the `events` table: top-n per group,
  * gap-based sessionization, tumbling-window aggregation, and JSON props
  * extraction. The tumbling-window query is the batch twin of the
  * Structured Streaming job in `graft.streaming` (same grouping, same
  * results once the stream is drained) — batch/stream parity is the Spark
  * way to test streaming semantics.
  *
  * Timestamp convention: the parquet stores nanosecond timestamps; both
  * Spark and DuckDB truncate to microseconds on read, so all comparisons
  * and bucket keys are computed in epoch-µs longs (never raw timestamps in
  * the output — µs longs hash identically everywhere).
  */
object EventOps {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  // ---- Q27: top-3 events by value per event type ----------------------

  /** Top-3 per type through the bounded-heap [[graft.functions.TopKAgg]]
    * instead of a `row_number` window: `event_type` is a handful of
    * values, so a window partitioned by it sorts corpus-sized runs in
    * ≤|types| tasks — the q26 straggler shape. The heap cut keeps only
    * (event_id, value) pairs; `user_id` is enriched onto the ≤ 3×|types|
    * winners by broadcasting them against one narrow (event_id, user_id)
    * scan — the rank-preserving-enrichment pattern, never a second
    * shuffle. Ordering ((value desc, event_id asc)) is identical to the
    * window formulation, which remains the oracle. */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    val top = events(spark, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.TopKAgg.topk(col("value"), col("event_id"), 3,
        descending = true).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("event_id"), col("col.score").as("value"))
    events(spark, dir).select(col("event_id"), col("user_id"))
      .join(broadcast(top), Seq("event_id"))
      .select(col("event_type"), col("rank"), col("event_id"),
        col("user_id"), r4(col("value")).as("value"))
      .orderBy(col("event_type"), col("rank"))
  }

  val q27Sql: String =
    s"""SELECT event_type, rank::INT AS rank, event_id, user_id, ${r4Sql("value")} AS value
       |FROM (
       |  SELECT event_type, event_id, user_id, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value DESC, event_id) AS rank
       |  FROM events)
       |WHERE rank <= 3
       |ORDER BY event_type, rank""".stripMargin

  // ---- Q28: gap-based sessionization (30-min inactivity) --------------
  // Per user: lag over (ts, event_id), a new session starts when the gap
  // exceeds 30 min. One shuffle on user_id; the window sort is per-user.

  // private[graft]: the streaming sessionizer (EventStream) keys its
  // state breaks off THIS gap — a re-declared copy could silently drift
  private[graft] val GapUs = 30L * 60 * 1000000

  def q28(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > GapUs, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("brk")).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  val q28Sql: String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |                                 ORDER BY epoch_us(ts), event_id) AS prev_us
       |  FROM events),
       |y AS (
       |  SELECT user_id,
       |         CASE WHEN prev_us IS NULL OR ts_us - prev_us > $GapUs
       |              THEN 1 ELSE 0 END AS brk
       |  FROM x)
       |SELECT user_id, count(*) AS n_events, sum(brk)::BIGINT AS n_sessions
       |FROM y GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- Q29: tumbling 1-hour window aggregation ------------------------
  // Batch twin of the streaming job (streaming/EventStream.scala).

  def q29(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), r4(sum(col("value"))).as("sum_value"))
      .select(unix_micros(col("w.start")).as("bucket_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("bucket_us"), col("event_type"))

  val q29Sql: String =
    s"""SELECT epoch_us(date_trunc('hour', ts)) AS bucket_us, event_type,
       |       count(*) AS n, ${r4Sql("sum(value)")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY bucket_us, event_type""".stripMargin

  // ---- Q30: JSON props extraction -------------------------------------

  def q30(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        r4(avg(col("k"))).as("avg_k"),
        max(col("k")).as("max_k"),
        min(col("k")).as("min_k"))
      .orderBy(col("event_type"))

  val q30Sql: String =
    s"""SELECT event_type, count(*) AS n,
       |       ${r4Sql("avg(json_extract_string(props, '$.k')::INT)")} AS avg_k,
       |       max(json_extract_string(props, '$$.k')::INT) AS max_k,
       |       min(json_extract_string(props, '$$.k')::INT) AS min_k
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- Q43: as-of join — click → most recent view ---------------------
  // The event-time point-in-time lookup (attribution / feature-at-time
  // shape). Spark has no ASOF JOIN operator; the idiomatic composition is
  // a running `last(…, ignoreNulls)` over a RANGE frame on the UNIONED
  // event stream — one shuffle on user_id, one per-user sort, no join at
  // all. The frame is `[unbounded, current row]` over the ts ORDER, so a
  // view sharing the click's exact timestamp is matched (inclusive ≤ — the
  // same tie rule as DuckDB's native ASOF JOIN, which is the oracle).
  // At 100 TB this beats the naive range-join formulation outright: the
  // window never materializes candidate pairs.

  def q43(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .where(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("view_ts",
        last(when(col("event_type") === "view", col("ts_us")), ignoreNulls = true)
          .over(w))
      .where(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        count(col("view_ts")).as("n_matched"),
        // average the exact integer µs gaps (order-exact sums), divide
        // once — per-row /1e6 made a non-representable grid whose mean
        // can sit ON an r4 half-boundary (the q117 lesson)
        r4(avg(col("ts_us") - col("view_ts")) / lit(1e6)).as("avg_gap_s"))
      .orderBy(col("user_id"))
  }

  val q43Sql: String =
    s"""WITH c AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
       |           WHERE event_type = 'click'),
       |v AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events
       |      WHERE event_type = 'view')
       |SELECT c.user_id, count(*) AS n_clicks, count(v.ts_us) AS n_matched,
       |       ${r4Sql("avg(c.ts_us - v.ts_us) / 1e6")} AS avg_gap_s
       |FROM c ASOF LEFT JOIN v
       |  ON c.user_id = v.user_id AND v.ts_us <= c.ts_us
       |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin

  // ---- Q82: bin-bucketed interval join --------------------------------
  // "Errors within ±5 min of each purchase" — the proximity join every
  // incident/attribution analysis needs. Spark's naive plan for a pure
  // range predicate is a nested-loop join (O(n·m) pairs evaluated); the
  // scalable form quantizes time into window-sized bins: an error within
  // ±W of a purchase must land in the purchase's bin or an adjacent one,
  // so exploding the ERROR side to its 3 covering bins turns the range
  // join into an equi-join on the bin key (+ the exact |Δt| ≤ W residual
  // as a post-filter). The shuffle carries 3× the error rows — a
  // constant — instead of evaluating n·m candidate pairs; each true pair
  // matches exactly once because the purchase keeps its single home bin.
  // PlanSpec pins the no-nested-loop shape. At 100 TB, a hot bin (error
  // storm) is the q49/q52 salting problem — same remedy, inside the bin.

  // private[graft]: the streaming twin (EventStream.q88) shares the SAME
  // window so its batch-parity claim can never drift on a retune
  private[graft] val RangeUs = 5L * 60 * 1000000 // ±5 min

  def q82(spark: SparkSession, dir: String): DataFrame = {
    val p = events(spark, dir).where(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("p_us"),
        (unix_micros(col("ts")) / RangeUs).cast("long").as("bin"))
    val err = events(spark, dir).where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("e_us"))
      .withColumn("bin", explode(array(
        (col("e_us") / RangeUs).cast("long") - 1,
        (col("e_us") / RangeUs).cast("long"),
        (col("e_us") / RangeUs).cast("long") + 1)))
    p.join(err,
        p("bin") === err("bin") &&
          abs(col("e_us") - col("p_us")) <= RangeUs,
        "left_outer")
      .groupBy(col("event_id"), col("p_us"))
      .agg(count(col("err_id")).as("n_nearby"))
      .orderBy(col("event_id"))
  }

  val q82Sql: String =
    s"""SELECT p.event_id, epoch_us(p.ts) AS p_us, count(e.event_id) AS n_nearby
       |FROM events p
       |LEFT JOIN events e
       |  ON e.event_type = 'error'
       | AND abs(epoch_us(e.ts) - epoch_us(p.ts)) <= $RangeUs
       |WHERE p.event_type = 'purchase'
       |GROUP BY 1, 2 ORDER BY p.event_id""".stripMargin

  // ---- Q84: ordered conversion funnel ---------------------------------
  // view → click (≤24h after first view) → purchase (≤24h after first
  // qualifying click), per user; output is users per funnel depth. The
  // ORDERING constraint is what separates this from three filters: a
  // click only counts after a view, a purchase only after a qualifying
  // click. Shape: one shuffle on user_id, one per-user sort, two stacked
  // running-min windows over the SAME (partition, order) — the second
  // window reuses the first's sort (no re-exchange, no re-sort; Spark
  // sees the required distribution/ordering already satisfied). No
  // self-joins: the naive formulation (events ⋈ events ⋈ events on
  // user + ts ranges) is quadratic per user; the running-min form is
  // linear and never materializes candidate pairs — the q43 as-of
  // argument applied to sequential-pattern matching.

  private val DayUs = 24L * 3600 * 1000000

  def q84(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = events(spark, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    // running first-view ts as of each row (includes the current row, so
    // a click sharing the first view's exact ts qualifies — same tie
    // rule on both sides)
    val clickOk = col("event_type") === "click" &&
      col("first_v").isNotNull && col("ts_us") <= col("first_v") + DayUs
    val purchaseOk = col("event_type") === "purchase" &&
      col("first_c").isNotNull && col("ts_us") <= col("first_c") + DayUs
    e.withColumn("first_v",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("first_c", min(when(clickOk, col("ts_us"))).over(w))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("v_us"),
        min(when(clickOk, col("ts_us"))).as("c_us"),
        min(when(purchaseOk, col("ts_us"))).as("p_us"))
      .select(
        when(col("p_us").isNotNull, 3)
          .when(col("c_us").isNotNull, 2)
          .when(col("v_us").isNotNull, 1)
          .otherwise(0).as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("depth"))
  }

  val q84Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
       |  FROM events),
       |x AS (
       |  SELECT *,
       |         min(CASE WHEN event_type = 'view' THEN ts_us END)
       |           OVER w AS first_v
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
       |               ROWS UNBOUNDED PRECEDING)),
       |y AS (
       |  SELECT *,
       |         min(CASE WHEN event_type = 'click' AND first_v IS NOT NULL
       |                   AND ts_us <= first_v + $DayUs THEN ts_us END)
       |           OVER w AS first_c
       |  FROM x
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
       |               ROWS UNBOUNDED PRECEDING)),
       |u AS (
       |  SELECT user_id,
       |         min(CASE WHEN event_type = 'view' THEN ts_us END) AS v_us,
       |         min(CASE WHEN event_type = 'click' AND first_v IS NOT NULL
       |                   AND ts_us <= first_v + $DayUs THEN ts_us END) AS c_us,
       |         min(CASE WHEN event_type = 'purchase' AND first_c IS NOT NULL
       |                   AND ts_us <= first_c + $DayUs THEN ts_us END) AS p_us
       |  FROM y GROUP BY user_id)
       |SELECT CASE WHEN p_us IS NOT NULL THEN 3
       |            WHEN c_us IS NOT NULL THEN 2
       |            WHEN v_us IS NOT NULL THEN 1
       |            ELSE 0 END AS depth,
       |       count(*) AS n_users
       |FROM u GROUP BY 1 ORDER BY depth""".stripMargin

  // ---- Q85: zero-filled hourly grid (gap fill / resample) --------------
  // Hourly purchase revenue with EVERY hour present — the resample shape
  // every time-series consumer (charting, anomaly scoring, forecasting
  // features) needs, because "no row" and "zero" are different facts.
  // The heavy input collapses in the FIRST aggregation; the dense grid is
  // generated from the 1-row min/max agg via sequence+explode (never
  // collected to the driver) and is time-range-sized — independent of
  // data volume, so the left join is a broadcast of the grid at any SF.

  private val HourUs = 3600L * 1000000

  def q85(spark: SparkSession, dir: String): DataFrame = {
    val p = events(spark, dir).where(col("event_type") === "purchase")
      .select((unix_micros(col("ts")) / HourUs).cast("long").as("bucket"),
        col("value"))
    val agg = p.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_raw"), r4(sum(col("value"))).as("sum_raw"))
    val grid = p.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bucket"))
    grid.join(agg, Seq("bucket"), "left_outer")
      .select((col("bucket") * HourUs).as("bucket_us"),
        coalesce(col("n_raw"), lit(0L)).as("n"),
        coalesce(col("sum_raw"), lit(0.0)).as("sum_value"))
      .orderBy(col("bucket_us"))
  }

  val q85Sql: String =
    s"""WITH p AS (
       |  SELECT epoch_us(ts) // $HourUs AS bucket, value
       |  FROM events WHERE event_type = 'purchase'),
       |a AS (
       |  SELECT bucket, count(*) AS n, ${r4Sql("sum(value)")} AS sum_value
       |  FROM p GROUP BY 1),
       |g AS (
       |  SELECT unnest(generate_series((SELECT min(bucket) FROM p),
       |                                (SELECT max(bucket) FROM p))) AS bucket)
       |SELECT g.bucket * $HourUs AS bucket_us,
       |       coalesce(a.n, 0) AS n,
       |       coalesce(a.sum_value, 0)::DOUBLE AS sum_value
       |FROM g LEFT JOIN a USING (bucket)
       |ORDER BY bucket_us""".stripMargin

  // ---- Q86: weekly retention cohorts ----------------------------------
  // Users bucketed by first-active week (cohort); for each (cohort,
  // weeks-since-cohort) cell, how many of that cohort's users were active.
  // The classic retention triangle. Shape: the raw stream reduces to
  // DISTINCT (user, week) first — map-side-combinable and activity-sized, so
  // the expensive part is one hash agg over the scan; cohort assignment is
  // a user-sized self-aggregation joined back on user_id. Counting rows of
  // the distinct frame per cell gives count(DISTINCT user) without a
  // second distinct pass.

  private val WeekUs = 7L * 24 * 3600 * 1000000

  def q86(spark: SparkSession, dir: String): DataFrame = {
    val a = events(spark, dir)
      .select(col("user_id"),
        (unix_micros(col("ts")) / WeekUs).cast("long").as("wk"))
      .distinct()
    val cohort = a.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    a.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_wk"), col("week_offset"))
  }

  val q86Sql: String =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekUs AS wk FROM events),
       |c AS (SELECT user_id, min(wk) AS cohort_wk FROM a GROUP BY 1)
       |SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
       |       count(*) AS n_users
       |FROM a JOIN c USING (user_id)
       |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin

  // ---- registry -------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_top_per_type" -> (q27 _),
    "q28_sessionize" -> (q28 _),
    "q29_event_window" -> (q29 _),
    "q30_props_json" -> (q30 _),
    "q43_asof_join" -> (q43 _),
    "q82_range_join" -> (q82 _),
    "q84_funnel" -> (q84 _),
    "q85_gap_fill" -> (q85 _),
    "q86_retention" -> (q86 _))

  val oracles: Map[String, String] = Map(
    "q27_top_per_type" -> q27Sql,
    "q28_sessionize" -> q28Sql,
    "q29_event_window" -> q29Sql,
    "q30_props_json" -> q30Sql,
    "q43_asof_join" -> q43Sql,
    "q82_range_join" -> q82Sql,
    "q84_funnel" -> q84Sql,
    "q85_gap_fill" -> q85Sql,
    "q86_retention" -> q86Sql)
}
