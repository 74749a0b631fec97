package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

/** Row-level semantics of the temporal-analytics family (TemporalOps) on
  * hand-checkable synthetic frames, plus invariants of the registered
  * queries on sf0.001. The synthetic cases exercise exactly the edges the
  * oracle data can't force: a known gap shape, an exact SCD2 collapse, a
  * streak tie, and all four diff statuses.
  */
class TemporalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // -------------------------------------------------------------------
  // q_ts_gapfill
  // -------------------------------------------------------------------

  test("gapfill spine covers exactly [min_day, max_day] per user") {
    val out = q("q_ts_gapfill").cache()
    import spark.implicits._
    val bounds = out
      .groupBy($"user_id")
      .agg(
        min($"day").as("d0"),
        max($"day").as("d1"),
        count(lit(1)).as("n"))
      .withColumn("expect", datediff($"d1", $"d0") + 1)
    // dense spine: one row per day of the span, no extrapolation past it
    assert(bounds.filter($"n" =!= $"expect").count() == 0)
    // boundary rows are real observations, never gaps
    val edges = out
      .join(
        bounds.select($"user_id", $"d0", $"d1"),
        Seq("user_id"))
      .filter($"day" === $"d0" || $"day" === $"d1")
    assert(edges.filter($"is_gap").count() == 0)
    out.unpersist()
  }

  test("gapfill carries the last observed value across a known gap") {
    import spark.implicits._
    val df = Seq(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00"), 10.0),
      (1L, Timestamp.valueOf("2024-03-01 12:00:00"), 2.5),
      // 2024-03-02 and 03 absent -> two gap days
      (1L, Timestamp.valueOf("2024-03-04 09:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    // the operator's formulation: each daily row emits itself + its gap
    // days via lead-bounded sequence explode, carrying its own value
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy($"day")
    val out = df
      .select($"user_id", to_date($"ts").as("day"), $"value")
      .groupBy($"user_id", $"day")
      .agg(count(lit(1)).as("n_events"), X.dsum2($"value").as("day_value"))
      .withColumn(
        "run_end",
        coalesce(date_sub(lead($"day", 1).over(w), 1), $"day"))
      .select(
        $"day".as("obs_day"),
        $"day_value",
        explode(sequence($"day", $"run_end", expr("interval 1 day")))
          .as("day"))
      .select(
        $"day",
        ($"day" =!= $"obs_day").as("is_gap"),
        $"day_value".as("filled"))
      .orderBy($"day")
      .collect()
    assert(out.length == 4)
    assert(out.map(_.getAs[Boolean]("is_gap")).toSeq ==
      Seq(false, true, true, false))
    // day 1 sums both events; the two gap days carry it; day 4 replaces it
    assert(out.map(_.getAs[Double]("filled")).toSeq ==
      Seq(12.5, 12.5, 12.5, 7.0))
  }

  // -------------------------------------------------------------------
  // q_scd2_history
  // -------------------------------------------------------------------

  test("scd2 collapses runs, abuts intervals, and has one current row per user") {
    val out = q("q_scd2_history").cache()
    import spark.implicits._
    // exactly one open-ended current row per user
    val users = out.select($"user_id").distinct().count()
    assert(out.filter($"is_current").count() == users)
    assert(out.filter($"valid_to".isNull && !$"is_current").count() == 0)
    // intervals abut exactly: valid_to == next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy($"version")
    val holes = out
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
    assert(holes.count() == 0)
    // consecutive versions never share a tier (true collapse)
    val rep = out
      .withColumn("prev_tier", lag($"tier", 1).over(w))
      .filter($"prev_tier".isNotNull && $"prev_tier" === $"tier")
    assert(rep.count() == 0)
    out.unpersist()
  }

  // -------------------------------------------------------------------
  // q_win_islands
  // -------------------------------------------------------------------

  test("islands splits on a missing day and ties break to the earliest start") {
    import spark.implicits._
    // user 1: [Mar 1-2] and [Mar 4-5] — two streaks of 2, tie on length
    val days = Seq(
      (1L, "2024-03-01"), (1L, "2024-03-02"),
      (1L, "2024-03-04"), (1L, "2024-03-05"),
      // user 2: single 3-day streak
      (2L, "2024-03-10"), (2L, "2024-03-11"), (2L, "2024-03-12"))
      .toDF("user_id", "d")
      .select($"user_id", $"d".cast("date").as("day"))
    val anchored = days.withColumn(
      "anchor",
      date_sub(
        $"day",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id")
          .orderBy($"day"))))
    val streaks = anchored
      .groupBy($"user_id", $"anchor")
      .agg(
        count(lit(1)).as("streak_len"),
        min($"day").as("streak_start"))
    val pu = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    val best = streaks
      .withColumn("n_streaks", count(lit(1)).over(pu))
      .withColumn(
        "rn",
        row_number().over(
          pu.orderBy($"streak_len".desc, $"streak_start".asc)))
      .filter($"rn" === 1)
      .orderBy($"user_id")
      .collect()
    assert(best.length == 2)
    assert(best(0).getAs[Long]("n_streaks") == 2)
    assert(best(0).getAs[Long]("streak_len") == 2)
    // tie between the two length-2 streaks resolves to the earlier one
    assert(best(0).getAs[Date]("streak_start").toString == "2024-03-01")
    assert(best(1).getAs[Long]("streak_len") == 3)
    assert(best(1).getAs[Long]("n_streaks") == 1)
  }

  test("islands totals reconcile with the raw distinct-day counts") {
    import spark.implicits._
    val out = q("q_win_islands")
    val raw = T(spark, sf, "events")
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"))
    val bad = out
      .join(raw, Seq("user_id"))
      .filter($"n_active_days" =!= $"n_days" || $"best_len" > $"n_days")
    assert(bad.count() == 0)
  }

  // -------------------------------------------------------------------
  // q_snapshot_diff
  // -------------------------------------------------------------------

  test("snapshot diff classifies all four statuses on a constructed input") {
    import spark.implicits._
    val a = Seq(
      (1L, 2L, 10.0), // same in both
      (2L, 1L, 5.0),  // changed value
      (3L, 1L, 7.0))  // removed (absent from b)
      .toDF("k", "n_old", "total_old")
    val b = Seq(
      (1L, 2L, 10.0),
      (2L, 1L, 6.0),
      (4L, 3L, 9.0))  // added (absent from a)
      .toDF("k", "n_new", "total_new")
    val out = a
      .join(b, Seq("k"), "full_outer")
      .select(
        $"k",
        when($"n_old".isNull, "added")
          .when($"n_new".isNull, "removed")
          .when($"total_old" =!= $"total_new" || $"n_old" =!= $"n_new", "changed")
          .otherwise("same")
          .as("status"))
      .orderBy($"k")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  // -------------------------------------------------------------------
  // q_ts_anomaly
  // -------------------------------------------------------------------

  test("anomaly z-scores match an independent local recompute") {
    import spark.implicits._
    val out = q("q_ts_anomaly").collect()
    assert(out.nonEmpty)
    // recompute one event type's stats from the emitted daily counts
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rows) =>
      val ns = rows.map(_.getAs[Long]("n").toDouble)
      val days = ns.length
      val mean = ns.sum / days
      val varS = ns.map(x => (x - mean) * (x - mean)).sum / (days - 1)
      rows.foreach { r =>
        val z = (r.getAs[Long]("n") - mean) / math.sqrt(varS)
        assert(math.abs(z - r.getAs[Double]("z")) < 1e-9)
        assert(r.getAs[Boolean]("is_anomaly") == (math.abs(r.getAs[Double]("z")) > 2.0))
      }
    }
  }

  // -------------------------------------------------------------------
  // q_ts_decompose
  // -------------------------------------------------------------------

  test("decomposition identity holds exactly and components reconcile") {
    import spark.implicits._
    val out = q("q_ts_decompose").cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    // n == trend + seasonal + residual EXACTLY (decimal arithmetic, not
    // float accumulation, produced the components)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val sum = r.getAs[Double]("trend") +
        r.getAs[Double]("seasonal") + r.getAs[Double]("residual")
      assert(math.abs(n - sum) < 1e-9, s"identity broke: $n vs $sum")
    }
    // seasonal is constant within (type, weekday)
    val bad = out
      .withColumn("dow", weekday($"day"))
      .groupBy($"event_type", $"dow")
      .agg(countDistinct($"seasonal").as("k"))
      .filter($"k" > 1)
    assert(bad.count() == 0)
    // trend equals an independent 7-day centered average (to the 6dp
    // rounding the operator applies)
    val daily = T(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"))
      .groupBy($"event_type", $"day").agg(count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.take(50).foreach { r =>
      val series = daily(r.getAs[String]("event_type"))
        .sortBy(_.getAs[java.sql.Date]("day").toString)
      val i = series.indexWhere(
        _.getAs[java.sql.Date]("day").toString ==
          r.getAs[java.sql.Date]("day").toString)
      val window = series.slice(math.max(0, i - 3), math.min(series.length, i + 4))
      val ref = window.map(_.getAs[Long]("n")).sum.toDouble / window.length
      assert(math.abs(r.getAs[Double]("trend") - ref) < 1e-6)
    }
    out.unpersist()
  }

  // -------------------------------------------------------------------
  // q_stat_linreg
  // -------------------------------------------------------------------

  test("linreg recovers an exact line exactly, and matches a local refit") {
    import spark.implicits._
    // y = 3x + 7 on integer moments: the fit is EXACT, not approximate
    val line = Seq.tabulate(10)(i => (i.toLong, 3L * i + 7)).toDF("x", "y")
    val m = line.agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy")).head()
    val (n, sx, sy, sxx, sxy) =
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3), m.getLong(4))
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    assert(slope == 3.0 && intercept == 7.0)
    // the registered query agrees with an independent local least-squares
    val out = q("q_stat_linreg").collect()
    assert(out.nonEmpty)
    val daily = T(spark, sf, "events")
      .select($"event_type",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date")).cast("long").as("x"))
      .groupBy($"event_type", $"x").agg(count(lit(1)).as("y"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    out.foreach { r =>
      val pts = daily(r.getAs[String]("event_type"))
        .map(p => (p.getAs[Long]("x").toDouble, p.getAs[Long]("y").toDouble))
      val nn = pts.length.toDouble
      val (lsx, lsy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val lsxx = pts.map(p => p._1 * p._1).sum
      val lsxy = pts.map(p => p._1 * p._2).sum
      val ref = (nn * lsxy - lsx * lsy) / (nn * lsxx - lsx * lsx)
      assert(math.abs(r.getAs[Double]("slope") - ref) < 1e-9)
    }
  }

  // -------------------------------------------------------------------
  // q_merge_upsert
  // -------------------------------------------------------------------

  test("merge upsert is idempotent and each action keeps its contract") {
    import spark.implicits._
    val out = q("q_merge_upsert").cache()
    // deterministic: re-running the merge yields the identical table
    assert(out.except(q("q_merge_upsert")).count() == 0)
    // every target key survives the merge exactly once
    val tgtKeys = T(spark, sf, "customer").select($"c_custkey")
    assert(tgtKeys.except(out.select($"c_custkey")).count() == 0)
    assert(out.groupBy($"c_custkey").count().filter($"count" > 1).count() == 0)
    // inserts are the synthetic off-range keys with fabricated names
    assert(out.filter($"action" === "insert" &&
      (!$"c_name".startsWith("NEW#") || $"n_new_orders" === 0)).count() == 0)
    assert(out.filter($"action" === "insert" && $"c_custkey" < 10000000L).count() == 0)
    // kept rows took no delta; updated rows took one
    assert(out.filter($"action" === "keep" && $"n_new_orders" =!= 0).count() == 0)
    assert(out.filter($"action" === "update" && $"n_new_orders" === 0).count() == 0)
    out.unpersist()
  }

  test("snapshot diff statuses are consistent with their own counts") {
    import spark.implicits._
    val out = q("q_snapshot_diff").cache()
    assert(out.filter($"status" === "added" && $"n_old" =!= 0).count() == 0)
    assert(out.filter($"status" === "removed" && $"n_new" =!= 0).count() == 0)
    assert(out
      .filter($"status" === "same" &&
        ($"n_old" =!= $"n_new" || $"total_old" =!= $"total_new"))
      .count() == 0)
    assert(out
      .filter($"status" === "changed" &&
        $"n_old" === $"n_new" && $"total_old" === $"total_new")
      .count() == 0)
    // keys are unique: the diff is a function of the key space
    assert(out.groupBy($"o_custkey").count().filter($"count" > 1).count() == 0)
    out.unpersist()
  }
}
