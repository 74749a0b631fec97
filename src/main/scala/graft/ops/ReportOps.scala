package graft.ops

import graft.{QueryDef, T, X}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tier A aggregation + report surface (SURVEY §2): the reference's daily
  * report query (/root/reference/main.py:278-342) generalized. All ratio
  * math uses the portable floor-rounding in [[graft.X]] so DuckDB and Spark
  * hash-match bit-for-bit.
  */
object ReportOps {

  private def events(s: SparkSession, d: String) = T(s, d, "events")

  /** Day slice as a half-open timestamp range: unlike to_date(ts) = d, a
    * raw range on ts is pushed down to the parquet scan (row-group
    * min/max skipping — the difference between reading one day and reading
    * 100 TB). Semantics identical in UTC.
    */
  private def dayRange(day: String): Column =
    col("ts") >= to_timestamp(lit(day)) &&
      col("ts") < to_timestamp(date_add(lit(day).cast("date"), 1))

  private def pct(num: Column, den: Column): Column =
    X.r2(num.cast("double") * lit(100d) /
      when(den === 0, lit(null)).otherwise(den).cast("double"))

  /** Shared SQL fragment: floor-rounded percentage a*100/b. */
  private def pctSql(a: String, b: String): String =
    s"floor(($a * 100.0 / NULLIF($b, 0)) * 100 + 0.5) / 100"

  /** The daily aggregate of main.py:278-288 parameterized on a day:
    * total / successful / pct / distinct users / two type-conditional
    * counts. One partial+final hash aggregate; countDistinct adds the
    * expand+two-phase plan Catalyst picks automatically.
    */
  private[ops] def dailyAgg(s: SparkSession, d: String, day: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .filter(dayRange(day))
      .agg(
        count(lit(1)).as("total_attempts"),
        count(when($"event_type" === "purchase", 1)).as("successful_attempts"),
        countDistinct($"user_id").as("unique_users"),
        count(when($"event_type" === "view", 1)).as("run_attempts"),
        count(when($"event_type" === "click", 1)).as("check_attempts"))
      .select(
        lit(day).cast("date").as("report_date"),
        $"total_attempts",
        $"successful_attempts",
        pct($"successful_attempts", $"total_attempts").as("success_percentage"),
        $"unique_users",
        $"run_attempts",
        $"check_attempts")
  }

  private def dailyAggSql(day: String): String =
    s"SELECT DATE '$day' AS report_date, " +
      "COUNT(*) AS total_attempts, " +
      "COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS successful_attempts, " +
      pctSql("COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)", "COUNT(*)") +
      " AS success_percentage, " +
      "COUNT(DISTINCT user_id) AS unique_users, " +
      "COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS run_attempts, " +
      "COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS check_attempts " +
      s"FROM events WHERE CAST(ts AS DATE) = DATE '$day'"

  /** q_agg_daily — the flagship (SURVEY §7.2 step 1). */
  def aggDaily(s: SparkSession, d: String): DataFrame = dailyAgg(s, d, T.AsOf)

  /** q_agg_cond_count — COUNT(CASE WHEN …) over the whole table
    * (main.py:282,285,286).
    */
  private def aggCondCount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).agg(
      count(when($"event_type" === "purchase", 1)).as("purchases"),
      count(when($"event_type" === "error", 1)).as("errors"),
      count(when($"value" > 100d, 1)).as("big_values"))
  }

  /** q_agg_distinct — exact distinct counts (main.py:284). */
  private def aggDistinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d).agg(
      countDistinct($"user_id").as("unique_users"),
      countDistinct($"event_type").as("unique_types"))
  }

  /** q_expr_pct — derived ratio with a NULLIF zero guard (main.py:283;
    * division-by-zero trap discussion SURVEY §7.4.3).
    */
  private def exprPct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        count(when($"value" > 50d, 1)).as("big"))
      .select(
        $"event_type",
        $"n",
        $"big",
        pct($"big", $"n").as("pct_big"))
      .orderBy("event_type")
  }

  private val ExprPctSql =
    "SELECT event_type, COUNT(*) AS n, " +
      "COUNT(CASE WHEN value > 50 THEN 1 END) AS big, " +
      pctSql("COUNT(CASE WHEN value > 50 THEN 1 END)", "COUNT(*)") +
      " AS pct_big FROM events GROUP BY event_type ORDER BY event_type"

  /** q_filter_date_eq — day slicing (main.py:288), pushed to the scan. */
  private def filterDateEq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .filter(dayRange(T.AsOf))
      .orderBy("event_id")
  }

  /** q_report_unpivot — the 1×7 aggregate row → 7×2 Metric/Value grid
    * (main.py:297-306,324-333), heterogeneous values stringified
    * (main.py:320).
    */
  private def reportUnpivot(s: SparkSession, d: String): DataFrame =
    aggDaily(s, d)
      .select(expr(
        """stack(7,
          |  'report_date', CAST(report_date AS STRING),
          |  'total_attempts', CAST(total_attempts AS STRING),
          |  'successful_attempts', CAST(successful_attempts AS STRING),
          |  'success_percentage', format_string('%.2f%%', success_percentage),
          |  'unique_users', CAST(unique_users AS STRING),
          |  'run_attempts', CAST(run_attempts AS STRING),
          |  'check_attempts', CAST(check_attempts AS STRING)) AS (metric, value)
          |""".stripMargin))
      .orderBy("metric")

  private val ReportUnpivotSql =
    s"WITH daily AS (${dailyAggSql(T.AsOf)}) " +
      "SELECT metric, value FROM (" +
      "SELECT 'report_date' AS metric, CAST(report_date AS VARCHAR) AS value FROM daily " +
      "UNION ALL SELECT 'total_attempts', CAST(total_attempts AS VARCHAR) FROM daily " +
      "UNION ALL SELECT 'successful_attempts', CAST(successful_attempts AS VARCHAR) FROM daily " +
      "UNION ALL SELECT 'success_percentage', printf('%.2f%%', success_percentage) FROM daily " +
      "UNION ALL SELECT 'unique_users', CAST(unique_users AS VARCHAR) FROM daily " +
      "UNION ALL SELECT 'run_attempts', CAST(run_attempts AS VARCHAR) FROM daily " +
      "UNION ALL SELECT 'check_attempts', CAST(check_attempts AS VARCHAR) FROM daily" +
      ") ORDER BY metric"

  /** q_pivot — the inverse reshape of [[reportUnpivot]]: long → wide on a
    * FIXED pivot-value list (an unbounded pivot needs a driver-side
    * distinct pass — the fixed list keeps the plan one shuffle and is what
    * a production report schema declares anyway). Each cell is a
    * conditional count, which is also how the oracle expresses it.
    */
  private val PivotTypes = Seq("click", "error", "purchase", "signup", "view")
  private def pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T(s, d, "events")
      .select(to_date($"ts").as("d"), $"event_type")
      .groupBy($"d")
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotTypes)
      .orderBy("d")
  }

  private val PivotSql =
    "SELECT CAST(ts AS DATE) AS d, " +
      PivotTypes
        .map(t => s"COUNT(*) FILTER (WHERE event_type = '$t') AS \"$t\"")
        .mkString(", ") +
      " FROM events GROUP BY 1 ORDER BY d"

  /** q_pivot_auto — [[pivot]] with DISCOVERED pivot values: the unbounded
    * `pivot(col)` form Spark resolves by running a driver-side distinct
    * over the pivot column before planning (values come back sorted, so
    * the wide schema is deterministic). That extra scan is the price of an
    * unknown report schema — two jobs instead of one — which is why
    * [[pivot]]'s fixed-list form stays the scale default; this variant is
    * the discovery story for schemas no one declared. Same oracle as
    * q_pivot: on this data the discovered values ARE the declared list, so
    * the two must agree cell for cell. Known coupling (accepted): on a
    * dataset where one of the five declared event_type values is absent
    * (or a new one appears) the discovered wide schema would diverge from
    * the fixed-list oracle and the check would flag a schema mismatch even
    * though the query is behaving correctly — the oracle pins the
    * discovery on THIS corpus, it is not a schema contract.
    */
  private def pivotAuto(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = T(s, d, "events")
      .select(to_date($"ts").as("d"), $"event_type")
      .groupBy($"d")
      .pivot("event_type")
      .agg(count(lit(1)))
    wide.na.fill(0L, wide.columns.filter(_ != "d").toSeq).orderBy("d")
  }

  /** q_zero_fallback — empty-day default report (main.py:293-315): all
    * zeros and '0.00%' instead of the Postgres division-by-zero error path.
    */
  private def zeroFallback(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    dailyAgg(s, d, "2024-02-15") // a day with no data at any sf
      .select(
        $"report_date",
        $"total_attempts",
        $"successful_attempts",
        when($"total_attempts" === 0, lit("0.00%"))
          .otherwise(format_string("%.2f%%", $"success_percentage"))
          .as("success_percentage"),
        $"unique_users",
        $"run_attempts",
        $"check_attempts")
  }

  private val ZeroFallbackSql =
    s"WITH daily AS (${dailyAggSql("2024-02-15")}) " +
      "SELECT report_date, total_attempts, successful_attempts, " +
      "CASE WHEN total_attempts = 0 THEN '0.00%' " +
      "ELSE printf('%.2f%%', success_percentage) END AS success_percentage, " +
      "unique_users, run_attempts, check_attempts FROM daily"

  /** q_fmt_pct — percent formatting '%.2f%%' (main.py:320), applied after
    * the portable rounding so both engines format the same double.
    */
  private def fmtPct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        count(when($"value" > 50d, 1)).as("big"))
      .select(
        $"event_type",
        format_string("%.2f%%", pct($"big", $"n")).as("pct_str"))
      .orderBy("event_type")
  }

  private val FmtPctSql =
    "SELECT event_type, printf('%.2f%%', " +
      pctSql("COUNT(CASE WHEN value > 50 THEN 1 END)", "COUNT(*)") +
      ") AS pct_str FROM events GROUP BY event_type ORDER BY event_type"

  /** q_date_parse — date parse out of structured filenames + cutoff
    * arithmetic (the log-retention date logic, main.py:72-84).
    */
  private def dateParse(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .select(
        $"event_id",
        concat(lit("log_"), to_date($"ts").cast("string"), lit(".txt")).as("fname"))
      .select(
        $"event_id",
        $"fname",
        to_date(substring($"fname", 5, 10), "yyyy-MM-dd").as("file_date"))
      .withColumn(
        "is_old",
        $"file_date" < date_sub(lit(T.AsOf).cast("date"), 3))
      .orderBy("event_id")
  }

  private val DateParseSql =
    "SELECT event_id, fname, file_date, " +
      s"file_date < (DATE '${T.AsOf}' - 3) AS is_old FROM (" +
      "SELECT event_id, fname, " +
      "CAST(strptime(substring(fname, 5, 10), '%Y-%m-%d') AS DATE) AS file_date " +
      "FROM (SELECT event_id, " +
      "'log_' || CAST(CAST(ts AS DATE) AS VARCHAR) || '.txt' AS fname " +
      "FROM events)) ORDER BY event_id"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_agg_daily", aggDaily, Some(dailyAggSql(T.AsOf))),
    QueryDef(
      "q_agg_cond_count",
      aggCondCount,
      Some(
        "SELECT COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases, " +
          "COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors, " +
          "COUNT(CASE WHEN value > 100 THEN 1 END) AS big_values FROM events")),
    QueryDef(
      "q_agg_distinct",
      aggDistinct,
      Some(
        "SELECT COUNT(DISTINCT user_id) AS unique_users, " +
          "COUNT(DISTINCT event_type) AS unique_types FROM events")),
    QueryDef("q_expr_pct", exprPct, Some(ExprPctSql)),
    QueryDef(
      "q_filter_date_eq",
      filterDateEq,
      Some(
        "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, " +
          s"value, props FROM events WHERE CAST(ts AS DATE) = DATE '${T.AsOf}' " +
          "ORDER BY event_id")),
    QueryDef("q_report_unpivot", reportUnpivot, Some(ReportUnpivotSql)),
    QueryDef("q_pivot", pivot, Some(PivotSql)),
    QueryDef("q_pivot_auto", pivotAuto, Some(PivotSql)),
    QueryDef("q_zero_fallback", zeroFallback, Some(ZeroFallbackSql)),
    QueryDef("q_fmt_pct", fmtPct, Some(FmtPctSql)),
    QueryDef("q_date_parse", dateParse, Some(DateParseSql))
  )
}
