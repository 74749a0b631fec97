package graft.ops

import graft.{QueryDef, T, X}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier C temporal-analytics family: the time-series operations a
  * warehouse-grade engine layers over an event log — gap-filled daily
  * series, slowly-changing-dimension (SCD2) history, gaps-and-islands
  * streaks, and snapshot diffing. The reference's analytics layer slices
  * a day at a time (/root/reference/main.py:280,288); these are the
  * standard generalizations of that slice to full temporal series, built
  * as window functions over the natural partition key so each query is
  * one or two hash-shuffles regardless of corpus size.
  */
object TemporalOps {

  private def events(s: SparkSession, d: String) = T(s, d, "events")

  // ---------------------------------------------------------------------
  // q_ts_gapfill
  // ---------------------------------------------------------------------

  /** q_ts_gapfill — per-user daily series with a generated date spine and
    * forward fill: each user's days between their first and last active
    * day, a gap marker for absent days, and the last observed daily value
    * carried forward. NO spine join: each daily row emits ITSELF plus the
    * gap days up to (exclusive) the user's next active day — `sequence
    * (day, lead(day) − 1)` exploded — each generated day carrying its
    * origin row's value, which IS the forward fill. Shuffle economics at
    * 100 TB: the daily hash agg and one user_id window — the classic
    * spine formulation (per-user min/max agg + spine explode + left join
    * + running `last(ignoreNulls)`) pays two more exchanges and shuffles
    * the whole spine through the join; this one materializes nothing
    * wider than the output. Day sums are exact decimal (graft.X.dsum2)
    * so the carried value is bit-identical cross-engine.
    */
  private def tsGapfill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"day")
    events(s, d)
      .select($"user_id", to_date($"ts").as("day"), $"value")
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"), X.dsum2($"value").as("day_value"))
      .withColumn(
        "run_end",
        coalesce(date_sub(lead($"day", 1).over(w), 1), $"day"))
      .select(
        $"user_id",
        $"day".as("obs_day"),
        $"n_events",
        $"day_value",
        explode(sequence($"day", $"run_end", expr("interval 1 day")))
          .as("day"))
      .select(
        $"user_id",
        $"day",
        ($"day" =!= $"obs_day").as("is_gap"),
        when($"day" === $"obs_day", $"n_events").otherwise(lit(0L)).as("n_events"),
        $"day_value".as("filled_value"))
      .orderBy($"user_id", $"day")
  }

  private val GapfillSql =
    "WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value FROM events), " +
      "daily AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events, " +
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value FROM e GROUP BY 1, 2), " +
      "spine AS (SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), " +
      "CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day " +
      "FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)), " +
      "j AS (SELECT s.user_id, s.day, d.n_events, d.day_value " +
      "FROM spine s LEFT JOIN daily d USING (user_id, day)) " +
      "SELECT user_id, day, n_events IS NULL AS is_gap, " +
      "CAST(coalesce(n_events, 0) AS BIGINT) AS n_events, " +
      "last_value(day_value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value " +
      "FROM j ORDER BY user_id, day"

  // ---------------------------------------------------------------------
  // q_scd2_history
  // ---------------------------------------------------------------------

  /** q_scd2_history — type-2 slowly-changing-dimension build: each user's
    * engagement tier (a CASE ladder over event value) collapsed into
    * [valid_from, valid_to) intervals — one row per tier *change*, with a
    * version counter and an open-ended current row. This is the standard
    * dimension-history pattern (detect-change via lag, interval-close via
    * lead) expressed as two windows over the SAME (user_id × time) sort,
    * so Catalyst plans ONE exchange + ONE sort for the whole build; no
    * MERGE loop, no per-key driver pass. Ordering ties break on event_id,
    * making the history retry- and partitioning-invariant.
    */
  private def scd2History(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // change rows keep the event_id tie-break too: (user_id, ts) is unique
    // in today's testdata, but version numbering must not silently become
    // engine-arbitrary if that ever changes
    val wc = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tiers = events(s, d)
      .select(
        $"user_id",
        $"event_id",
        $"ts",
        when($"value" >= 90, "high")
          .when($"value" >= 50, "mid")
          .otherwise("low")
          .as("tier"))
      .withColumn("prev_tier", lag($"tier", 1).over(w))
      .filter($"prev_tier".isNull || $"prev_tier" =!= $"tier")
    tiers
      .select(
        $"user_id",
        row_number().over(wc).cast("long").as("version"),
        $"tier",
        $"ts".as("valid_from"),
        lead($"ts", 1).over(wc).as("valid_to"))
      .withColumn("is_current", $"valid_to".isNull)
      .orderBy($"user_id", $"version")
  }

  private val Scd2Sql =
    "WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, " +
      "CASE WHEN value >= 90 THEN 'high' WHEN value >= 50 THEN 'mid' ELSE 'low' END AS tier " +
      "FROM events), " +
      "c AS (SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tier FROM e), " +
      "ch AS (SELECT user_id, event_id, ts, tier FROM c WHERE prev_tier IS NULL OR prev_tier <> tier) " +
      "SELECT user_id, CAST(row_number() OVER w AS BIGINT) AS version, tier, " +
      "ts AS valid_from, lead(ts) OVER w AS valid_to, lead(ts) OVER w IS NULL AS is_current " +
      "FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY user_id, version"

  // ---------------------------------------------------------------------
  // q_win_islands
  // ---------------------------------------------------------------------

  /** q_win_islands — gaps-and-islands: each user's maximal runs of
    * consecutive active days (the streak primitive behind retention and
    * engagement scoring), reduced to the per-user longest streak plus
    * streak/active-day counts. Uses the classic anchor trick — day minus
    * row_number is constant within a run — so streak detection is one
    * window + one agg, both keyed on user_id; the distinct-day prepass is
    * the only other exchange. Longest-streak ties resolve to the earliest
    * start, keeping the pick deterministic under any partitioning.
    */
  private def winIslands(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    islandsOf(
      events(s, d)
        .select($"user_id", to_date($"ts").as("day"))
        .distinct())
  }

  /** The islands kernel over an explicit DISTINCT (user_id, day) frame —
    * split out so TemporalPropertySpec can drive it over generated
    * streak patterns.
    */
  private[graft] def islandsOf(days: DataFrame): DataFrame = {
    import days.sparkSession.implicits._
    val anchored = days.withColumn(
      "anchor",
      date_sub(
        $"day",
        row_number()
          .over(Window.partitionBy($"user_id").orderBy($"day"))))
    val streaks = anchored
      .groupBy($"user_id", $"anchor")
      .agg(
        count(lit(1)).as("streak_len"),
        min($"day").as("streak_start"),
        max($"day").as("streak_end"))
    val pu = Window.partitionBy($"user_id")
    streaks
      .withColumn("n_streaks", count(lit(1)).over(pu))
      .withColumn("n_active_days", sum($"streak_len").over(pu))
      .withColumn(
        "rn",
        row_number().over(
          pu.orderBy($"streak_len".desc, $"streak_start".asc)))
      .filter($"rn" === 1)
      .select(
        $"user_id",
        $"streak_len".as("best_len"),
        $"streak_start".as("best_start"),
        $"streak_end".as("best_end"),
        $"n_streaks",
        $"n_active_days")
      .orderBy($"user_id")
  }

  private val IslandsSql =
    "WITH d AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events), " +
      "r AS (SELECT user_id, day, day - CAST(row_number() OVER " +
      "(PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor FROM d), " +
      "s AS (SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_len, " +
      "min(day) AS streak_start, max(day) AS streak_end FROM r GROUP BY 1, 2), " +
      "k AS (SELECT user_id, streak_len, streak_start, streak_end, " +
      "CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_streaks, " +
      "CAST(sum(streak_len) OVER (PARTITION BY user_id) AS BIGINT) AS n_active_days, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY streak_len DESC, streak_start ASC) AS rn FROM s) " +
      "SELECT user_id, streak_len AS best_len, streak_start AS best_start, " +
      "streak_end AS best_end, n_streaks, n_active_days FROM k WHERE rn = 1 ORDER BY user_id"

  // ---------------------------------------------------------------------
  // q_snapshot_diff
  // ---------------------------------------------------------------------

  /** q_snapshot_diff — CDC-style diff of two per-customer snapshots (order
    * count + exact revenue for 2000 vs 2001), classifying every key as
    * added / removed / changed / same. The change-data-capture primitive
    * for feeds without a transaction log: both snapshots aggregate from
    * the same scan (Catalyst prunes each side's dates into the parquet
    * scan), then a single full-outer hash join on the key aligns them —
    * both sides arrive hash-partitioned on o_custkey from their aggs, so
    * the join adds no exchange. Value equality is on exact decimal sums,
    * so 'same' vs 'changed' is bit-deterministic cross-engine.
    */
  private def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def snap(yr: Int, n: String, t: String): DataFrame =
      T(s, d, "orders")
        .filter(year($"o_orderdate") === yr)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as(n), X.dsum2($"o_totalprice").as(t))
    val a = snap(2000, "n_old", "total_old")
    val b = snap(2001, "n_new", "total_new")
    a.join(b, Seq("o_custkey"), "full_outer")
      .select(
        $"o_custkey",
        when($"n_old".isNull, "added")
          .when($"n_new".isNull, "removed")
          .when($"total_old" =!= $"total_new" || $"n_old" =!= $"n_new", "changed")
          .otherwise("same")
          .as("status"),
        coalesce($"n_old", lit(0L)).as("n_old"),
        coalesce($"n_new", lit(0L)).as("n_new"),
        coalesce($"total_old", lit(0.0d)).as("total_old"),
        coalesce($"total_new", lit(0.0d)).as("total_new"))
      .orderBy($"o_custkey")
  }

  private val SnapshotDiffSql =
    "WITH a AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_old, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_old " +
      "FROM orders WHERE year(CAST(o_orderdate AS TIMESTAMP)) = 2000 GROUP BY 1), " +
      "b AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_new, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_new " +
      "FROM orders WHERE year(CAST(o_orderdate AS TIMESTAMP)) = 2001 GROUP BY 1) " +
      "SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey, " +
      "CASE WHEN a.o_custkey IS NULL THEN 'added' WHEN b.o_custkey IS NULL THEN 'removed' " +
      "WHEN a.total_old <> b.total_new OR a.n_old <> b.n_new THEN 'changed' ELSE 'same' END AS status, " +
      "CAST(coalesce(a.n_old, 0) AS BIGINT) AS n_old, CAST(coalesce(b.n_new, 0) AS BIGINT) AS n_new, " +
      "coalesce(a.total_old, CAST(0.0 AS DOUBLE)) AS total_old, " +
      "coalesce(b.total_new, CAST(0.0 AS DOUBLE)) AS total_new " +
      "FROM a FULL JOIN b ON a.o_custkey = b.o_custkey ORDER BY o_custkey"

  // ---------------------------------------------------------------------
  // q_ts_anomaly
  // ---------------------------------------------------------------------

  /** q_ts_anomaly — z-score anomaly flags over each event type's daily
    * volume series (the monitoring primitive: "did ingest spike or crater
    * today?"). Statistical moments are EXACT integer arithmetic — daily
    * counts are integers, so Σn and Σn² are exact BIGINTs and the sample
    * variance is the single division `(days·Σn² − (Σn)²) / (days·(days−1))`
    * — followed only by IEEE-exact ops (division, sqrt, subtraction), so
    * the z-scores are bit-identical cross-engine with no rounding ladder.
    * The per-type stats frame is |types| rows joined back broadcast; the
    * daily agg is the only real shuffle at any scale.
    */
  private def tsAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"))
    val stats = daily
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("days"),
        sum($"n").as("s1"),
        sum($"n" * $"n").as("s2"))
    val mean = $"s1".cast("double") / $"days".cast("double")
    val variance =
      ($"days" * $"s2" - $"s1" * $"s1").cast("double") /
        ($"days" * ($"days" - 1)).cast("double")
    // guard the degenerate series (constant counts, or a single day):
    // an unguarded 0/0 yields NaN, and the two engines ORDER NaN
    // differently (Spark: NaN > 2 is false; DuckDB: NaN sorts greatest),
    // so the guard is a cross-engine-correctness requirement, not polish
    val z = when($"days" > 1 && variance > 0, ($"n" - mean) / sqrt(variance))
    daily
      .join(broadcast(stats), Seq("event_type"))
      .select(
        $"event_type",
        $"day",
        $"n",
        mean.as("mean_n"),
        z.as("z"),
        coalesce(abs(z) > 2.0, lit(false)).as("is_anomaly"))
      .orderBy($"event_type", $"day")
  }

  private val AnomalySql =
    "WITH d AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
      "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
      "s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS days, " +
      "CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2 FROM d GROUP BY 1) " +
      "SELECT d.event_type, d.day, d.n, " +
      "CAST(s1 AS DOUBLE) / CAST(days AS DOUBLE) AS mean_n, " +
      "CASE WHEN days > 1 AND days * s2 - s1 * s1 > 0 THEN " +
      "(d.n - CAST(s1 AS DOUBLE) / CAST(days AS DOUBLE)) / " +
      "sqrt(CAST(days * s2 - s1 * s1 AS DOUBLE) / CAST(days * (days - 1) AS DOUBLE)) END AS z, " +
      "coalesce(CASE WHEN days > 1 AND days * s2 - s1 * s1 > 0 THEN " +
      "abs((d.n - CAST(s1 AS DOUBLE) / CAST(days AS DOUBLE)) / " +
      "sqrt(CAST(days * s2 - s1 * s1 AS DOUBLE) / CAST(days * (days - 1) AS DOUBLE))) > 2.0 END, false) AS is_anomaly " +
      "FROM d JOIN s USING (event_type) ORDER BY d.event_type, d.day"

  // ---------------------------------------------------------------------
  // q_merge_upsert
  // ---------------------------------------------------------------------

  /** Every 100th delta key is re-keyed past the customer range to exercise
    * the not-matched (insert) branch on FK-complete testdata.
    */
  private val InsertKeyOffset = 10000000L

  /** q_merge_upsert — MERGE INTO semantics (the lakehouse upsert, apply
    * side of the CDC pair whose detect side is q_snapshot_diff): target
    * customers merged with a change feed (2001 order revenue per
    * customer), matched rows updating their balance, unmatched source
    * rows inserting, untouched target rows kept — every row tagged with
    * its action. Declaratively a single full-outer hash join: both sides
    * arrive hash-partitioned on the key from their own aggregates, so
    * MERGE costs ONE co-partitioned join at any scale — no row-by-row
    * driver loop, and deterministic (re-running the merge on the same
    * inputs yields the identical table, the idempotence a lakehouse
    * MERGE promises). Balance math is exact decimal, emitted as DOUBLE.
    */
  private def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val delta = T(s, d, "orders")
      .filter(year($"o_orderdate") === 2001)
      .groupBy($"o_custkey".as("k"))
      .agg(count(lit(1)).as("n_orders"), X.dsum2($"o_totalprice").as("rev"))
    val src = delta
      .unionByName(
        delta
          .filter($"k" % 100 === 0)
          .select(($"k" + InsertKeyOffset).as("k"), $"n_orders", $"rev"))
      .withColumnRenamed("k", "sk")
    val tgt = T(s, d, "customer")
      .select($"c_custkey".as("k"), $"c_name", $"c_acctbal")
    tgt
      .join(src, $"k" === $"sk", "full_outer")
      .select(
        coalesce($"k", $"sk").as("c_custkey"),
        when($"k".isNull, "insert")
          .when($"sk".isNull, "keep")
          .otherwise("update")
          .as("action"),
        coalesce($"c_name", concat(lit("NEW#"), $"sk".cast("string"))).as("c_name"),
        (coalesce($"c_acctbal", lit(0.0d)).cast("decimal(18,2)") +
          coalesce($"rev", lit(0.0d)).cast("decimal(18,2)"))
          .cast("double")
          .as("new_acctbal"),
        coalesce($"n_orders", lit(0L)).as("n_new_orders"))
      .orderBy($"c_custkey")
  }

  private val MergeUpsertSql =
    "WITH delta AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders, " +
      "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev " +
      "FROM orders WHERE year(CAST(o_orderdate AS TIMESTAMP)) = 2001 GROUP BY 1), " +
      s"src AS (SELECT k, n_orders, rev FROM delta UNION ALL " +
      s"SELECT k + $InsertKeyOffset, n_orders, rev FROM delta WHERE k % 100 = 0), " +
      "t AS (SELECT c_custkey AS k, c_name, c_acctbal FROM customer) " +
      "SELECT coalesce(t.k, s.k) AS c_custkey, " +
      "CASE WHEN t.k IS NULL THEN 'insert' WHEN s.k IS NULL THEN 'keep' ELSE 'update' END AS action, " +
      "coalesce(t.c_name, concat('NEW#', CAST(s.k AS VARCHAR))) AS c_name, " +
      "CAST(CAST(coalesce(t.c_acctbal, 0.0) AS DECIMAL(18,2)) + " +
      "CAST(coalesce(s.rev, 0.0) AS DECIMAL(18,2)) AS DOUBLE) AS new_acctbal, " +
      "CAST(coalesce(s.n_orders, 0) AS BIGINT) AS n_new_orders " +
      "FROM t FULL JOIN src s ON t.k = s.k ORDER BY c_custkey"

  // ---------------------------------------------------------------------
  // q_stat_linreg
  // ---------------------------------------------------------------------

  /** q_stat_linreg — least-squares trend per event type (is daily volume
    * trending up or down? — the capacity-planning primitive over the
    * monitoring series q_ts_anomaly flags). Every moment is an EXACT
    * BIGINT — x is an integer day index, y an integer daily count, so Σx,
    * Σy, Σx², Σxy and both numerators/denominators are exact integer
    * arithmetic; the ONLY floating-point operations are the two final
    * divisions, evaluated identically in both engines. Same shuffle
    * economics as q_ts_anomaly: one daily hash agg, then a |types|-row
    * moment aggregate; same degenerate-series guard (constant x → NULL
    * slope, not an engine-ordered NaN).
    */
  private def statLinreg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .select(
        $"event_type",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
          .cast("long")
          .as("x"))
      .groupBy($"event_type", $"x")
      .agg(count(lit(1)).as("y"))
    val m = daily
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"),
        sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"),
        sum($"x" * $"y").as("sxy"))
    val den = $"n" * $"sxx" - $"sx" * $"sx"
    val slope = ($"n" * $"sxy" - $"sx" * $"sy").cast("double") / den.cast("double")
    m.select(
      $"event_type",
      $"n",
      when($"n" > 1 && den > 0, slope).as("slope"),
      when(
        $"n" > 1 && den > 0,
        ($"sy".cast("double") - slope * $"sx".cast("double")) /
          $"n".cast("double")).as("intercept"))
      .orderBy($"event_type")
  }

  private val LinregSql =
    "WITH d AS (SELECT event_type, CAST(date_diff('day', DATE '2024-01-01', " +
      "CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS x, " +
      "CAST(count(*) AS BIGINT) AS y FROM events GROUP BY event_type, x), " +
      "m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, " +
      "CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy FROM d GROUP BY 1) " +
      "SELECT event_type, n, " +
      "CASE WHEN n > 1 AND n * sxx - sx * sx > 0 THEN " +
      "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope, " +
      "CASE WHEN n > 1 AND n * sxx - sx * sx > 0 THEN " +
      "(CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE) / " +
      "CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept " +
      "FROM m ORDER BY event_type"

  // ---------------------------------------------------------------------
  // q_ts_decompose
  // ---------------------------------------------------------------------

  /** q_ts_decompose — classical additive decomposition of each type's
    * daily series: trend (centered 7-day moving average), seasonal (mean
    * weekday deviation from trend), residual — with the identity
    * n ≡ trend + seasonal + residual holding EXACTLY (spec-asserted).
    * Cross-engine float discipline: a naive `avg(n − trend)` sums doubles
    * in partition order, which the engines need not share; instead the
    * trend is floor-rounded to 6 dp (graft.X.r6) and CARRIED AS
    * DECIMAL(18,6), so the weekday deviations sum exactly and
    * order-independently, and the residual is pure decimal subtraction.
    * Two window passes over the tiny per-type daily frame (|types|×days
    * rows) after the one real shuffle (the daily agg).
    */
  private def tsDecompose(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = events(s, d)
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"))
    val w7 = Window
      .partitionBy($"event_type")
      .orderBy($"day")
      .rowsBetween(-3, 3)
    val t = daily
      .withColumn("dow", weekday($"day"))
      .withColumn(
        "trend6",
        graft.X
          .r6(sum($"n").over(w7).cast("double") /
            count(lit(1)).over(w7).cast("double"))
          .cast("decimal(18,6)"))
    val wd = Window.partitionBy($"event_type", $"dow")
    t.withColumn(
      "seasonal6",
      graft.X
        .r6(sum($"n".cast("decimal(18,6)") - $"trend6").over(wd).cast("double") /
          count(lit(1)).over(wd).cast("double"))
        .cast("decimal(18,6)"))
      .select(
        $"event_type",
        $"day",
        $"n",
        $"trend6".cast("double").as("trend"),
        $"seasonal6".cast("double").as("seasonal"),
        ($"n".cast("decimal(18,6)") - $"trend6" - $"seasonal6")
          .cast("double")
          .as("residual"))
      .orderBy($"event_type", $"day")
  }

  private val DecomposeSql =
    "WITH d AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, " +
      "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), " +
      "t AS (SELECT event_type, day, n, CAST(isodow(day) - 1 AS INTEGER) AS dow, " +
      "CAST(floor(CAST(sum(n) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE) * 1e6 + 0.5) / 1e6 " +
      "AS DECIMAL(18,6)) AS trend6 " +
      "FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)), " +
      "s AS (SELECT *, CAST(floor(CAST(sum(CAST(n AS DECIMAL(18,6)) - trend6) " +
      "OVER (PARTITION BY event_type, dow) AS DOUBLE) / " +
      "CAST(count(*) OVER (PARTITION BY event_type, dow) AS DOUBLE) * 1e6 + 0.5) / 1e6 " +
      "AS DECIMAL(18,6)) AS seasonal6 FROM t) " +
      "SELECT event_type, day, n, CAST(trend6 AS DOUBLE) AS trend, " +
      "CAST(seasonal6 AS DOUBLE) AS seasonal, " +
      "CAST(CAST(n AS DECIMAL(18,6)) - trend6 - seasonal6 AS DOUBLE) AS residual " +
      "FROM s ORDER BY event_type, day"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_ts_gapfill", tsGapfill, Some(GapfillSql)),
    QueryDef("q_scd2_history", scd2History, Some(Scd2Sql)),
    QueryDef("q_win_islands", winIslands, Some(IslandsSql)),
    QueryDef("q_snapshot_diff", snapshotDiff, Some(SnapshotDiffSql)),
    QueryDef("q_ts_anomaly", tsAnomaly, Some(AnomalySql)),
    QueryDef("q_merge_upsert", mergeUpsert, Some(MergeUpsertSql)),
    QueryDef("q_stat_linreg", statLinreg, Some(LinregSql)),
    QueryDef("q_ts_decompose", tsDecompose, Some(DecomposeSql)))
}
