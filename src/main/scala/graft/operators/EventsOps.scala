package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table (event_id, ts, user_id,
  * event_type, value, props JSON): tumbling/sliding windows, gap-based
  * sessionization, pivoted per-user activity, and JSON extraction.
  *
  * The batch sessionization here is the lag+cumulative-flag formulation so
  * the DuckDB oracle can reproduce it exactly; `graft.streaming` holds the
  * Structured Streaming twin (session_window + watermark) of the same
  * semantics. Window starts are emitted as epoch seconds (BIGINT) to avoid
  * cross-engine timestamp formatting drift.
  */
object EventsOps {

  val SessionGapMinutes = 30

  /** events.ts normalization, dispatched on the FILE's actual encoding —
    * the driver has shipped this column two ways across testdata
    * generations, and the engine reads both:
    *
    *  - TIMESTAMP(NANOS): Spark's TimestampType (micros) refuses it
    *    outright; the session must set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (done in every
    *    entry-point builder: Bench/Verify/Cli/TestSpark — NOT mutated
    *    here, so a read never changes session-wide conf as a side
    *    effect), the column arrives as raw nanos LONG, and `DIV 1000`
    *    floor-converts to micros (truncation = floor for these
    *    post-epoch values).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; cast to TimestampType under the session's UTC
    *    zone (every builder pins spark.sql.session.timeZone=UTC), which
    *    is value-preserving and matches DuckDB's naive epoch(ts).
    */
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "session must set spark.sql.legacy.parquet.nanosAsLong=true (see entry-point builders)")
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  // ---- q60: tumbling hourly windows ---------------------------------------

  def hourlyEventStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        r6(dsum(col("value"))).as("sum_value"),
        r6(davg(col("value"))).as("avg_value"))
      .orderBy("hour_epoch", "event_type")

  val hourlyEventStatsSql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
      |  event_type, count(*) AS n,
      |  floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS sum_value,
      |  floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) / count(*)) * 1000000 + 0.5) / 1000000 AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_epoch, event_type""".stripMargin

  // ---- q61: sliding 2h windows, 1h slide ----------------------------------

  def slidingWindowStats(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), r6(dsum(col("value"))).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val slidingWindowStatsSql: String =
    """WITH w AS (
      |  SELECT event_type, value,
      |    unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR])
      |      AS window_start
      |  FROM events)
      |SELECT CAST(floor(epoch(window_start)) AS BIGINT) AS window_start,
      |  event_type, count(*) AS n,
      |  floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  // ---- q62: gap-based sessionization --------------------------------------

  /** Sessions = runs of per-user events with < 30 min between consecutive
    * events. lag → new-session flag → cumulative session index → aggregate;
    * two shuffles on user_id total (the window and the group share the
    * partitioning, so AQE/exchange-reuse collapses them to one). */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val flagged = events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > SessionGapMinutes * 60L,
          1L).otherwise(0L))
      .withColumn("session_idx",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy("user_id", "session_idx")
      .agg(
        min(col("ts").cast("long")).as("session_start"),
        count(lit(1)).as("n_events"),
        r6(dsum(col("value"))).as("sum_value"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_s"))
      .orderBy("user_id", "session_idx")
  }

  val userSessionsSql: String =
    s"""WITH lagged AS (
       |  SELECT user_id, event_id, ts, value,
       |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |      OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT)
       |         > ${SessionGapMinutes * 60} THEN 1 ELSE 0 END AS new_session
       |  FROM lagged),
       |sess AS (
       |  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
       |    ORDER BY ts ASC, event_id ASC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx,
       |  CAST(min(floor(epoch(ts))) AS BIGINT) AS session_start,
       |  count(*) AS n_events,
      |  floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS sum_value,
       |  CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS duration_s
       |FROM sess GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  // ---- q63: per-user pivoted activity -------------------------------------

  def userActivityPivot(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        r6(dsum(col("value"))).as("total_value"))
      .orderBy("user_id")

  val userActivityPivotSql: String =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  floor((CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS total_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q64: JSON property extraction --------------------------------------

  def jsonPropHistogram(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy((col("k") - col("k") % lit(10L)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("k_bucket")

  val jsonPropHistogramSql: String =
    """SELECT k - (k % 10) AS k_bucket, count(*) AS n,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT json_extract(props, '$.k')::BIGINT AS k FROM events)
      |GROUP BY 1 ORDER BY k_bucket""".stripMargin

  // ---- q59: cross-key interval (range) join via bin bucketing -------------

  /** Half-width of the q59 interval, seconds. Also the bin width: a
    * ±W window around any instant spans at most the 3 consecutive
    * W-wide bins {b−1, b, b+1} of that instant's bin b, which is what
    * makes the probe-side explode exact AND bounded. */
  val IntervalS = 600L

  /** Interval join ACROSS keys — for every purchase, the surrounding
    * site-wide view activity within ±[[IntervalS]] (any user): the shape
    * q65's per-key window cannot express (Flink's interval join /
    * DuckDB's IEJoin). A naive theta-join is a cross product that
    * Spark plans as BroadcastNestedLoopJoin — O(P·V) comparisons and a
    * broadcast of a whole side; at 100 TB it never finishes.
    *
    * The Spark-first shape is bin bucketing: views land in ONE
    * time bin of width = interval, purchases probe their 3 covering
    * bins (a 3× explode of the smaller/probe side only), and the join
    * becomes a plain co-partitioned equi-join on `bin` — one shuffle,
    * candidate pairs bounded by per-bin density, exact predicate
    * re-checked post-join. Each (purchase, view) pair appears at most
    * once because a view has exactly one bin and the 3 probed bins are
    * distinct. At 1000 executors this scales like any hash join: bin
    * width tunes candidate fan-in, and a hot bin (traffic spike) is
    * ordinary join skew — AQE skew-join splits it.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("ts_s"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ts_s").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("ts_s").as("v_ts"), col("user_id").as("v_user"), col("value"))

    val binned = v.withColumn("bin", floor(col("v_ts") / IntervalS))
    val probes = p.withColumn("b", floor(col("p_ts") / IntervalS))
      .withColumn("bin", explode(array(col("b") - 1, col("b"), col("b") + 1)))
    val matched = probes.join(binned, "bin")
      .filter(abs(col("v_ts") - col("p_ts")) <= IntervalS)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_views"),
        count_distinct(col("v_user")).as("n_users"),
        r6(dsum(col("value"))).as("sum_view_value"))

    p.join(matched, Seq("event_id"), "left")
      .select(col("event_id"), col("p_ts"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_users"), lit(0L)).as("n_users"),
        coalesce(col("sum_view_value"), lit(0.0)).as("sum_view_value"))
      .orderBy("event_id")
  }

  val intervalJoinSql: String =
    s"""WITH p AS (
       |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_ts
       |  FROM events WHERE event_type = 'purchase'),
       |v AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS v_ts, user_id, value
       |  FROM events WHERE event_type = 'view'),
       |j AS (
       |  SELECT p.event_id, count(*) AS n_views,
       |    count(DISTINCT v.user_id) AS n_users,
       |    CAST(sum(CAST(v.value AS DECIMAL(30,8))) AS DOUBLE) AS sv
       |  FROM p JOIN v ON v.v_ts BETWEEN p.p_ts - $IntervalS AND p.p_ts + $IntervalS
       |  GROUP BY 1)
       |SELECT p.event_id, p.p_ts,
       |  coalesce(n_views, 0) AS n_views,
       |  coalesce(n_users, 0) AS n_users,
       |  coalesce(floor(sv * 1000000 + 0.5) / 1000000, 0.0) AS sum_view_value
       |FROM p LEFT JOIN j USING (event_id) ORDER BY event_id""".stripMargin

  // ---- q65: as-of attribution join ----------------------------------------

  /** As-of join expressed as a running window — for every purchase, the
    * most recent PRECEDING click by the same user (last-touch attribution).
    * The windowed formulation is the idiomatic Spark shape for per-key
    * as-of semantics: one shuffle on the key, no range-join explosion;
    * a custom SparkPlan would only pay off for cross-key as-of matching.
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts").cast("long"))).over(byUser))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("purchase_ts"),
        coalesce(col("last_click_ts"), lit(-1L)).as("last_click_ts"),
        when(col("last_click_ts").isNull, -1L)
          .otherwise(col("ts").cast("long") - col("last_click_ts")).as("gap_s"))
      .orderBy("event_id")
  }

  val purchaseAttributionSql: String =
    """WITH w AS (
      |  SELECT event_id, user_id, event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |    max(CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT) END)
      |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      |  FROM events)
      |SELECT event_id, user_id, ts_s AS purchase_ts,
      |  coalesce(last_click_ts, -1) AS last_click_ts,
      |  CASE WHEN last_click_ts IS NULL THEN -1 ELSE ts_s - last_click_ts END AS gap_s
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  // ---- q66: ordered conversion funnel -------------------------------------

  val FunnelWindowS = 86400L

  /** Time-bound view → click → purchase funnel: a user advances a stage
    * only with an event AFTER their first qualifying event of the previous
    * stage AND within the 24-hour conversion window (first view, then
    * first later click within the window, then first later purchase
    * within the window of that click) — the standard product-analytics
    * funnel. Each stage is one filtered per-user aggregate joined on
    * user_id; comparisons use the same epoch-second longs as q65 so both
    * engines see identical values. */
  // Memoized cached funnel stage frames per (appId, dir): the stages chain
  // (p embeds c embeds v), so uncached frames re-scan the events parquet
  // ~6× across the union's action branches (same leak-free pattern as the
  // other per-dir caches).
  private val funnelCache =
    Memo.frames3()

  private def funnelStages(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) =
    funnelCache.getOrElseUpdate(s"${spark.sparkContext.applicationId}:$dir", {
      val e = events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts").cast("long").as("ts_s"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_s").as("t_view")).cache()
      val c = e.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts_s") > col("t_view") && col("ts_s") <= col("t_view") + FunnelWindowS)
        .groupBy("user_id").agg(min("ts_s").as("t_click")).cache()
      val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts_s") > col("t_click") && col("ts_s") <= col("t_click") + FunnelWindowS)
        .groupBy("user_id").agg(min("ts_s").as("t_purchase")).cache()
      (v, c, p)
    })

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val (v, c, p) = funnelStages(spark, dir)
    val stages = v.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
      .unionByName(c.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_click")))
      .unionByName(p.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_purchase")))
    val w = Window.orderBy("stage")
    val prev = lag("n_users", 1).over(w)
    // Explicit 0-denominator arm: Spark's 0/0 is NULL but DuckDB's is NaN
    // (IEEE float ops), so a coalesce-over-division would silently diverge
    // the engines on a dataset where a stage empties out.
    stages.select(col("stage"), col("n_users"),
      r6(when(prev.isNull, 1.0)
        .when(prev === 0, 0.0)
        .otherwise(col("n_users").cast("double") / prev)).as("conv_from_prev"))
      .orderBy("stage")
  }

  val funnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events),
      |v AS (SELECT user_id, min(ts_s) AS t_view FROM e
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts_s) AS t_click FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts_s > t_view
      |        AND ts_s <= t_view + $FunnelWindowS GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_s) AS t_purchase FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_s > t_click
      |        AND ts_s <= t_click + $FunnelWindowS GROUP BY e.user_id),
      |s AS (SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |      UNION ALL SELECT '2_click', count(*) FROM c
      |      UNION ALL SELECT '3_purchase', count(*) FROM p),
      |w AS (SELECT stage, n_users, lag(n_users) OVER (ORDER BY stage) AS prev FROM s)
      |SELECT stage, CAST(n_users AS BIGINT) AS n_users,
      |  floor((CASE WHEN prev IS NULL THEN 1.0
      |              WHEN prev = 0 THEN 0.0
      |              ELSE n_users::DOUBLE / prev END) * 1000000 + 0.5) / 1000000
      |    AS conv_from_prev
      |FROM w ORDER BY stage""".stripMargin

  // ---- q67: cohort retention ----------------------------------------------

  /** Classic day-cohort retention: users grouped by their first-seen day,
    * counted on each later day they were active. Day arithmetic runs on
    * epoch-day longs (ts DIV 86400) — post-epoch data, so truncation ==
    * floor — to keep both engines in integer space. Two shuffles: one
    * distinct on (user, day), one aggregate on (cohort, offset); the
    * per-user min-day is a partial-aggregate-friendly groupBy, and at
    * 100 TB the (user, day) distinct is the only wide op, keyed on a
    * high-cardinality column — scale-safe. */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val days = events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .distinct()
    val cohorts = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  val retentionCohortsSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
      |SELECT cohort_day, day - cohort_day AS day_offset,
      |  count(DISTINCT d.user_id) AS n_users
      |FROM d JOIN c ON d.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  // ---- q161: per-user activity streaks (gaps-and-islands on days) ---------

  /** q161: per user, consecutive-day activity runs — total active days,
    * number of streaks, and the longest streak. The canonical
    * gaps-and-islands: over each user's DISTINCT active epoch-days in
    * order, day − row_number is constant exactly within a consecutive
    * run, so grouping on that difference materializes the islands
    * without any self-join. Day arithmetic stays on epoch-day longs
    * (post-epoch data: truncation == floor, q67's convention), and every
    * output is a count — pure integers end to end, nothing near a
    * rounding boundary.
    *
    * Scale shape: one (user, day) distinct (the only wide op, keyed on
    * the high-cardinality user column), one row_number window bounded by
    * each user's own day count, then user-keyed aggregates — the same
    * cost envelope as q67's retention scan. The engagement-streak report
    * every activity dashboard ships. */
  def userStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .distinct()
    val islands = days
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("day")))
      .withColumn("island", col("day") - col("rn"))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
    islands.groupBy("user_id")
      .agg(sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"))
      .orderBy("user_id")
  }

  val userStreaksSql: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |g AS (SELECT user_id, day,
      |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
      |      FROM d),
      |isl AS (SELECT user_id, island, count(*) AS len
      |        FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  CAST(count(*) AS BIGINT) AS n_streaks,
      |  CAST(max(len) AS BIGINT) AS longest_streak
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q169: active-user ratios (DAU / WAU / MAU stickiness) --------------

  /** Trailing window widths in days. final literals: constant-folded at
    * use sites (object-init-cycle-proof). */
  final val WauDays = 7
  final val MauDays = 28

  /** q169: per observed day, DAU plus trailing-window WAU (7 d) and MAU
    * (28 d) with the DAU/WAU, DAU/MAU, WAU/MAU stickiness ratios — the
    * growth-analytics engagement table. The trailing distinct-user
    * windows can't ride a window function (count DISTINCT over a RANGE
    * frame isn't supported anywhere), and a day × user-day range join is
    * a nested-loop at scale — so each (user, day) activity row EXPLODES
    * into the WauDays (resp. MauDays) cover days it supports, turning
    * the trailing window into an equi-keyed distinct count: user active
    * on day x supports cover days x..x+w−1, so the count at day d is
    * exactly the users active in (d−w, d]. Constant-factor row growth
    * (7× / 28× of the DISTINCT (user, day) frame — already the compact
    * day grain, not raw events), all equi-shuffles.
    *
    * Output keeps only days that themselves appear in the data (the
    * explode manufactures cover days past the stream's end; early days
    * carry partial windows — the standard convention). Ratios divide
    * exact longs. */
  def activeUserRatios(spark: SparkSession, dir: String): DataFrame = {
    val days = events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .distinct()
    def trailing(w: Int, name: String): DataFrame = days
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (w - 1))).as("cover_day"))
      .groupBy("cover_day").agg(countDistinct("user_id").as(name))
    val dau = days.groupBy(col("day").as("cover_day"))
      .agg(countDistinct("user_id").as("dau"))
    dau
      .join(trailing(WauDays, "wau"), "cover_day")
      .join(trailing(MauDays, "mau"), "cover_day")
      .select(col("cover_day").as("day"), col("dau"), col("wau"), col("mau"),
        r6(col("dau").cast("double") / col("wau")).as("dau_wau"),
        r6(col("dau").cast("double") / col("mau")).as("dau_mau"),
        r6(col("wau").cast("double") / col("mau")).as("wau_mau"))
      .orderBy("day")
  }

  val activeUserRatiosSql: String =
    s"""WITH ad AS (
       |  SELECT DISTINCT user_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
       |  FROM events),
       |adau AS (SELECT day AS cover_day, count(DISTINCT user_id) AS dau
       |         FROM ad GROUP BY 1),
       |awau AS (SELECT cover_day, count(DISTINCT user_id) AS wau
       |         FROM (SELECT user_id,
       |                 unnest(generate_series(day, day + ${WauDays - 1})) AS cover_day
       |               FROM ad) GROUP BY 1),
       |amau AS (SELECT cover_day, count(DISTINCT user_id) AS mau
       |         FROM (SELECT user_id,
       |                 unnest(generate_series(day, day + ${MauDays - 1})) AS cover_day
       |               FROM ad) GROUP BY 1)
       |SELECT cover_day AS day, CAST(dau AS BIGINT) AS dau,
       |  CAST(wau AS BIGINT) AS wau, CAST(mau AS BIGINT) AS mau,
       |  floor((dau::DOUBLE / wau) * 1000000 + 0.5) / 1000000 AS dau_wau,
       |  floor((dau::DOUBLE / mau) * 1000000 + 0.5) / 1000000 AS dau_mau,
       |  floor((wau::DOUBLE / mau) * 1000000 + 0.5) / 1000000 AS wau_mau
       |FROM adau JOIN awau USING (cover_day) JOIN amau USING (cover_day)
       |ORDER BY day""".stripMargin

  // ---- q68: event-type transition matrix ----------------------------------

  /** First-order Markov transition matrix over per-user event streams:
    * (event_type, next event_type) bigrams via lead(), counted globally,
    * with the per-source transition probability. One shuffle on user_id
    * for the lead window (high-cardinality key — no hot partition), then
    * a tiny |types|² aggregate; the probability normalizer is a window
    * over ≤|types| rows. The ratio divides two exact longs, so the double
    * is identical cross-engine. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val pairs = events(spark, dir)
      .withColumn("to_type", lead("event_type", 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p", r6(col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type"))))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsSql: String =
    """WITH s AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |      AS to_type
      |  FROM events),
      |t AS (SELECT event_type AS from_type, to_type, count(*) AS n
      |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  floor((n::DOUBLE / sum(n) OVER (PARTITION BY from_type)) * 1000000 + 0.5) / 1000000
      |    AS p
      |FROM t ORDER BY from_type, to_type""".stripMargin

  // ---- q69: hourly-volume anomaly detection -------------------------------

  /** Per-type hourly volume z-scores with an anomaly flag (|z| > 2) — the
    * monitoring-style outlier scan. Cross-engine determinism trick: the
    * moments accumulate as EXACT integer sums (n, Σc, Σc²) and mean /
    * variance / z derive from those longs with the SAME double expression
    * shape in both engines — no stddev_samp, whose internal accumulation
    * order differs across engines. Sample variance
    * (Σc² − Σc·Σc/n)/(n−1); a constant series (sd = 0) z-scores to 0.
    * Two tiny aggregates after the hourly rollup; scale-safe. */
  def eventAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
    val moments = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"), sum(col("c") * col("c")).as("sq"))
      .filter(col("n") > 1)
      .select(col("event_type"),
        (col("s").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("sq").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n").cast("double")) /
          (col("n").cast("double") - 1.0)).as("sd"))
    hourly.join(moments, "event_type")
      .select(col("event_type"), col("hour_epoch"), col("c"),
        r6(when(col("sd") === 0.0, 0.0)
          .otherwise((col("c").cast("double") - col("mean")) / col("sd"))).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 2.0)
      .orderBy("event_type", "hour_epoch")
  }

  val eventAnomaliesSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
      |    CAST(sum(c * c) AS BIGINT) AS sq
      |  FROM h GROUP BY event_type HAVING count(*) > 1),
      |ms AS (
      |  SELECT event_type, s::DOUBLE / n::DOUBLE AS mean,
      |    sqrt((sq::DOUBLE - s::DOUBLE * s::DOUBLE / n::DOUBLE) / (n::DOUBLE - 1.0)) AS sd
      |  FROM m),
      |z AS (
      |  SELECT h.event_type, hour_epoch, c,
      |    floor((CASE WHEN sd = 0.0 THEN 0.0 ELSE (c::DOUBLE - mean) / sd END) * 1000000 + 0.5) / 1000000 AS z
      |  FROM h JOIN ms ON h.event_type = ms.event_type)
      |SELECT event_type, hour_epoch, c, z, abs(z) > 2.0 AS is_anomaly
      |FROM z ORDER BY event_type, hour_epoch""".stripMargin

  // ---- q123: hour-of-day seasonality (chi-square uniformity) --------------

  /** χ² critical value at α = 0.01 for df = 23 (24 hour bins − 1) — the
    * published table constant, compared on identically-derived doubles
    * in both engines. */
  val ChiSq23Crit01 = 41.638

  /** q123: per-event-type hour-of-day profile with a chi-square
    * uniformity test — the diurnal-rhythm check behind bot/synthetic
    * traffic detection (human traffic is seasonal, χ² huge; scripted
    * uniform traffic fails to reject). Reports each type's event count,
    * peak hour and its share, and χ² against the uniform 24-bin null,
    * flagged at the α = 0.01 critical value.
    *
    * Empty bins MUST contribute (0 − e)²/e, so the bin frame is the
    * DENSE type × 24 grid (|types|·24 rows — metadata scale, built from
    * a sequence explode) left-joined with observed counts. One
    * corpus-sized aggregate (type, hour) with map-side combine; χ² sums
    * 24 DECIMAL terms per type. */
  def hourSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val counts = events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("h"))
      .agg(count(lit(1)).as("c"))
    val types = counts.select("event_type").distinct()
    val grid = types.select(col("event_type"),
        explode(sequence(lit(0L), lit(23L))).as("h"))
      .join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), coalesce(col("c"), lit(0L)).as("c"))
    val tot = grid.groupBy("event_type").agg(sum("c").as("n_events"))
    val chi = grid.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("h"), col("c"), col("n_events"),
        (col("n_events").cast("double") / lit(24.0)).as("e"))
      .groupBy("event_type")
      .agg(
        dsum((col("c").cast("double") - col("e")) * (col("c").cast("double") - col("e")) /
          col("e")).as("chi2"),
        min(struct((-col("c")).as("nc"), col("h"))).as("peak"))
    chi.join(tot, "event_type")
      .select(col("event_type"), col("n_events"),
        col("peak.h").as("peak_hour"),
        r6((-col("peak.nc")).cast("double") / col("n_events").cast("double"))
          .as("peak_share"),
        r6(col("chi2")).as("chi2_uniform"),
        (col("chi2") > ChiSq23Crit01).as("seasonal"))
      .orderBy("event_type")
  }

  val hourSeasonalitySql: String =
    s"""WITH hc AS (SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
       |              count(*) AS c
       |            FROM events GROUP BY 1, 2),
       |ht AS (SELECT DISTINCT event_type FROM hc),
       |hg AS (SELECT ht.event_type, g.h, coalesce(hc.c, 0) AS c
       |       FROM ht CROSS JOIN (SELECT unnest(range(0, 24)) AS h) g
       |       LEFT JOIN hc ON hc.event_type = ht.event_type AND hc.h = g.h),
       |htot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events
       |         FROM hg GROUP BY 1),
       |hchi AS (SELECT hg.event_type,
       |    CAST(sum(CAST((hg.c::DOUBLE - n_events / 24.0) * (hg.c::DOUBLE - n_events / 24.0) /
       |      (n_events / 24.0) AS DECIMAL(30,8))) AS DOUBLE) AS chi2
       |  FROM hg JOIN htot USING (event_type) GROUP BY 1),
       |hpk AS (SELECT event_type, h AS peak_hour, c AS peak_c FROM (
       |          SELECT event_type, h, c,
       |            row_number() OVER (PARTITION BY event_type
       |                               ORDER BY c DESC, h ASC) AS rn
       |          FROM hg) WHERE rn = 1)
       |SELECT event_type, n_events, peak_hour,
       |  floor((peak_c::DOUBLE / n_events) * 1000000 + 0.5) / 1000000 AS peak_share,
       |  floor(chi2 * 1000000 + 0.5) / 1000000 AS chi2_uniform,
       |  chi2 > $ChiSq23Crit01 AS seasonal
       |FROM hchi JOIN htot USING (event_type) JOIN hpk USING (event_type)
       |ORDER BY event_type""".stripMargin

  // ---- q124: per-user inter-arrival burstiness ----------------------------

  /** q124: per-user inter-arrival statistics — mean gap, coefficient of
    * variation, and the Goh–Barabási burstiness B = (cv − 1)/(cv + 1):
    * B → −1 for metronomic (scripted) activity, ≈ 0 for Poisson, → 1
    * for bursty human sessions. The behavioral fingerprint behind rate
    * anomaly and bot scoring, complementing q123's population-level
    * rhythm with a per-actor statistic.
    *
    * Gaps derive from second-floored epochs via one lag window
    * partitioned by user (the q62 sessionization shape — per-user
    * partitions, no global window); moments are exact-integer sums
    * DECIMAL-accumulated, and users need ≥ 3 events (2 gaps) for the
    * sample sd to exist. */
  def userBurstiness(spark: SparkSession, dir: String): DataFrame = {
    // Ordering by (ep, event_id) rather than raw ts is gap-equivalent:
    // floor-to-seconds is monotone, so any non-decreasing-in-ep order
    // yields the same consecutive-difference sequence per user.
    val w = Window.partitionBy("user_id").orderBy(col("ep").asc, col("event_id").asc)
    val gaps = events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(w))
      .filter(col("gap").isNotNull)
    val m = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap").as("s"),
        sum(col("gap") * col("gap")).as("sq"))
      .filter(col("n_gaps") >= 2)
    m.select(col("user_id"), (col("n_gaps") + 1).as("n_events"), col("n_gaps"),
        (col("s").cast("double") / col("n_gaps").cast("double")).as("mean_gap"),
        sqrt((col("sq").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n_gaps").cast("double")) /
          (col("n_gaps").cast("double") - 1.0)).as("sd"))
      .select(col("user_id"), col("n_events"), col("n_gaps"),
        r6(col("mean_gap")).as("mean_gap_s"),
        r6(when(col("mean_gap") === 0.0, 0.0).otherwise(col("sd") / col("mean_gap")))
          .as("cv"),
        r6(when(col("mean_gap") === 0.0, lit(-1.0))
          .otherwise((col("sd") / col("mean_gap") - 1.0) / (col("sd") / col("mean_gap") + 1.0)))
          .as("burstiness"))
      .orderBy("user_id")
  }

  val userBurstinessSql: String =
    """WITH be AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep
      |            FROM events),
      |bg AS (SELECT user_id,
      |         ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ep ASC, event_id ASC) AS gap
      |       FROM be),
      |bm AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |         CAST(sum(gap) AS BIGINT) AS s, CAST(sum(gap * gap) AS BIGINT) AS sq
      |       FROM bg WHERE gap IS NOT NULL GROUP BY user_id
      |       HAVING count(*) >= 2),
      |bs AS (SELECT user_id, n_gaps + 1 AS n_events, n_gaps,
      |         s::DOUBLE / n_gaps AS mean_gap,
      |         sqrt((sq::DOUBLE - s::DOUBLE * s::DOUBLE / n_gaps) / (n_gaps::DOUBLE - 1.0)) AS sd
      |       FROM bm)
      |SELECT user_id, n_events, n_gaps,
      |  floor(mean_gap * 1000000 + 0.5) / 1000000 AS mean_gap_s,
      |  floor((CASE WHEN mean_gap = 0.0 THEN 0.0 ELSE sd / mean_gap END) * 1000000 + 0.5) / 1000000 AS cv,
      |  floor((CASE WHEN mean_gap = 0.0 THEN -1.0
      |              ELSE (sd / mean_gap - 1.0) / (sd / mean_gap + 1.0) END) * 1000000 + 0.5) / 1000000 AS burstiness
      |FROM bs ORDER BY user_id""".stripMargin

  // ---- q151: stationary event mix (damped power iteration) ----------------

  /** Power-iteration count and the damping split for q151. Teleport and
    * damping are SEPARATE declared constants that sum to 1: deriving
    * one from the other in Scala (1 − 0.85 = 0.15000000000000002)
    * would not equal the oracle's parsed 0.15 literal. */
  val PowerIters = 12
  val PowerDamping = 0.85
  val PowerTeleport = 0.15

  /** q151: where does user attention settle — the stationary
    * distribution of the event-type Markov chain (the PageRank
    * construction on q68's transition matrix): π ← teleport/K +
    * damping·πᵀP, iterated a FIXED PowerIters times from uniform, with
    * the per-type last-step residual |π_t − π_{t−1}| reported so the
    * table carries its own convergence evidence instead of claiming a
    * limit (the q51/q97 fixed-iteration discipline; residual bound
    * spec-pinned). The steady-state mix is the number a capacity plan
    * or an anomaly baseline wants — "what fraction of events is
    * `error` once transients wash out" — and differs from the raw
    * event-type histogram exactly where behavior is sticky.
    *
    * State space = from-types; edges into types that never emit are
    * dropped and rows renormalized (their mass re-enters via teleport —
    * the standard dangling-node treatment). Per-step sums accumulate in
    * DECIMAL so both engines iterate bit-identically.
    *
    * Scale shape: the chain is |event types|² — METADATA scale — and
    * everything after the one corpus-shuffling lead/groupBy pass (shared
    * with q68's shape) is K-row arithmetic; the 12 iterations cost 12
    * tiny joins, corpus-size-independent like q97's matrix frame. */
  def stationaryEventMix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val counts = events(spark, dir)
      .withColumn("to_type", lead("event_type", 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val states = counts.select(col("from_type").as("state")).distinct()
    val pmat = counts
      .join(states.select(col("state").as("to_type")), "to_type")
      .withColumn("p", col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")))
      .select("from_type", "to_type", "p")
    val kf = states.agg(count(lit(1)).as("k"))
    var pi = states.crossJoin(broadcast(kf))
      .select(col("state"), (lit(1.0) / col("k")).as("pi"))
    var prev = pi
    for (_ <- 1 to PowerIters) {
      prev = pi
      val incoming = pi.join(pmat, col("state") === col("from_type"))
        .groupBy(col("to_type").as("in_state"))
        .agg(dsum(col("pi") * col("p")).as("m"))
      pi = states.crossJoin(broadcast(kf))
        .join(incoming, col("state") === col("in_state"), "left")
        .select(col("state"),
          (lit(PowerTeleport) / col("k") +
            lit(PowerDamping) * coalesce(col("m"), lit(0.0))).as("pi"))
    }
    pi.join(prev.select(col("state"), col("pi").as("pi_prev")), "state")
      .select(col("state"), r6(col("pi")).as("pi"),
        r6(abs(col("pi") - col("pi_prev"))).as("residual"))
      .orderBy("state")
  }

  /** Shared q151/q156 oracle chain ending in pp[PowerIters](state, pi). */
  private val stationaryCtes: String = {
    def step(t: Int): String =
      s"""inc$t AS MATERIALIZED (SELECT to_type AS state,
         |    CAST(sum(CAST(pi * p AS DECIMAL(30,8))) AS DOUBLE) AS m
         |  FROM pp${t - 1} JOIN ppm ON pp${t - 1}.state = ppm.from_type GROUP BY 1),
         |pp$t AS MATERIALIZED (SELECT sk.state,
         |    CAST($PowerTeleport AS DOUBLE) / k + CAST($PowerDamping AS DOUBLE) * coalesce(m, 0.0) AS pi
         |  FROM (SELECT state, k FROM pst, pkk) sk
         |  LEFT JOIN inc$t USING (state))""".stripMargin
    s"""ps AS (
       |  SELECT user_id, event_type,
       |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |      AS to_type
       |  FROM events),
       |pt AS (SELECT event_type AS from_type, to_type, count(*) AS n
       |       FROM ps WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |pst AS (SELECT DISTINCT from_type AS state FROM pt),
       |pkk AS (SELECT count(*) AS k FROM pst),
       |ppm AS (SELECT from_type, to_type,
       |          n::DOUBLE / sum(n) OVER (PARTITION BY from_type) AS p
       |        FROM pt JOIN pst ON pt.to_type = pst.state),
       |pp0 AS (SELECT state, CAST(1 AS DOUBLE) / k AS pi FROM pst, pkk),
       |${(1 to PowerIters).map(step).mkString(",\n")}""".stripMargin
  }

  val stationaryEventMixSql: String =
    s"""WITH $stationaryCtes
       |SELECT pp$PowerIters.state,
       |  floor(pp$PowerIters.pi * 1000000 + 0.5) / 1000000 AS pi,
       |  floor(abs(pp$PowerIters.pi - pp${PowerIters - 1}.pi) * 1000000 + 0.5) / 1000000 AS residual
       |FROM pp$PowerIters JOIN pp${PowerIters - 1} USING (state)
       |ORDER BY state""".stripMargin

  // ---- q156: empirical vs stationary mix (stickiness report) --------------

  /** q156: where behavior is sticky — per event type, the EMPIRICAL
    * share of raw events next to the q151 STATIONARY share and their
    * delta. The two agree on a memoryless stream; a type whose
    * stationary share exceeds its empirical share is one users funnel
    * INTO (the chain keeps returning there), and the reverse marks
    * transient entry points. This is the actionable reading of q151: a
    * capacity plan provisions for π, an anomaly baseline for the
    * empirical mix, and the delta column says when those two diverge
    * enough to matter.
    *
    * Scale shape: q151's fixed-iteration frame joined with one
    * event_type-keyed count (map-side combined) — the K-row comparison
    * costs one more corpus aggregate than q151 itself. */
  def mixStickiness(spark: SparkSession, dir: String): DataFrame = {
    val emp = events(spark, dir).groupBy(col("event_type").as("state"))
      .agg(count(lit(1)).as("n_events"))
    val tot = emp.agg(sum(col("n_events")).as("te"))
    val pi = stationaryEventMix(spark, dir).select("state", "pi")
    emp.crossJoin(broadcast(tot))
      .withColumn("emp_share", col("n_events").cast("double") / col("te"))
      .join(pi, Seq("state"), "left")
      .select(col("state"), col("n_events"),
        r6(col("emp_share")).as("emp_share"),
        coalesce(col("pi"), lit(0.0)).as("stationary_pi"),
        r6(coalesce(col("pi"), lit(0.0)) - r6(col("emp_share"))).as("pi_minus_emp"))
      .orderBy("state")
  }

  val mixStickinessSql: String =
    s"""WITH $stationaryCtes,
       |semp AS (SELECT event_type AS state, CAST(count(*) AS BIGINT) AS n_events
       |         FROM events GROUP BY 1),
       |ste AS (SELECT sum(n_events) AS te FROM semp),
       |spi AS (SELECT state, floor(pi * 1000000 + 0.5) / 1000000 AS pi
       |        FROM pp$PowerIters)
       |SELECT state, n_events,
       |  floor((n_events::DOUBLE / te) * 1000000 + 0.5) / 1000000 AS emp_share,
       |  coalesce(pi, 0.0) AS stationary_pi,
       |  floor((coalesce(pi, 0.0) -
       |    floor((n_events::DOUBLE / te) * 1000000 + 0.5) / 1000000) * 1000000 + 0.5) / 1000000 AS pi_minus_emp
       |FROM (SELECT semp.state, n_events, te FROM semp, ste) se
       |LEFT JOIN spi USING (state)
       |ORDER BY state""".stripMargin

  // -------------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_stationary_event_mix" -> (stationaryEventMix _),
    "q156_mix_stickiness" -> (mixStickiness _),
    "q123_hour_seasonality" -> (hourSeasonality _),
    "q124_user_burstiness" -> (userBurstiness _),
    "q69_event_anomalies" -> (eventAnomalies _),
    "q67_retention_cohorts" -> (retentionCohorts _),
    "q161_user_streaks" -> (userStreaks _),
    "q169_active_user_ratios" -> (activeUserRatios _),
    "q68_event_transitions" -> (eventTransitions _),
    "q66_funnel" -> (funnel _),
    "q65_purchase_attribution" -> (purchaseAttribution _),
    "q59_interval_join" -> (intervalJoin _),
    "q60_hourly_event_stats" -> (hourlyEventStats _),
    "q61_sliding_window_stats" -> (slidingWindowStats _),
    "q62_user_sessions" -> (userSessions _),
    "q63_user_activity_pivot" -> (userActivityPivot _),
    "q64_json_prop_histogram" -> (jsonPropHistogram _))

  val oracles: Map[String, String] = Map(
    "q123_hour_seasonality" -> hourSeasonalitySql,
    "q124_user_burstiness" -> userBurstinessSql,
    "q69_event_anomalies" -> eventAnomaliesSql,
    "q67_retention_cohorts" -> retentionCohortsSql,
    "q161_user_streaks" -> userStreaksSql,
    "q169_active_user_ratios" -> activeUserRatiosSql,
    "q68_event_transitions" -> eventTransitionsSql,
    "q151_stationary_event_mix" -> stationaryEventMixSql,
    "q156_mix_stickiness" -> mixStickinessSql,
    "q66_funnel" -> funnelSql,
    "q65_purchase_attribution" -> purchaseAttributionSql,
    "q59_interval_join" -> intervalJoinSql,
    "q60_hourly_event_stats" -> hourlyEventStatsSql,
    "q61_sliding_window_stats" -> slidingWindowStatsSql,
    "q62_user_sessions" -> userSessionsSql,
    "q63_user_activity_pivot" -> userActivityPivotSql,
    "q64_json_prop_histogram" -> jsonPropHistogramSql)
}
