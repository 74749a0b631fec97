package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Scan pruning on a date-partitioned layout (SURVEY §4.2 waived DPP
  * because the driver testdata is single parquet files — this spec writes
  * the partitioned layout a production deployment would use and proves
  * both pruning paths against it):
  *   - static: a day-equality filter reaches the scan as a
  *     PartitionFilter (directory pruning), not a row filter;
  *   - dynamic: a join against a filtered dim plants a
  *     dynamicpruningexpression on the fact scan, so only the dim's
  *     surviving dates are read at all.
  * At 100 TB/30 days, either path is the difference between reading one
  * partition and reading the fleet.
  */
class PartitionPruningSpec extends SparkSpec {

  /** events rewritten date-partitioned, as an ingest job would land them. */
  private lazy val dir: String = {
    import spark.implicits._
    val p = Files.createTempDirectory("graft_part").toString
    T(spark, sf, "events")
      .withColumn("d", to_date($"ts"))
      .write
      .mode("overwrite")
      .partitionBy("d")
      .parquet(p)
    p
  }

  test("day filter prunes partitions statically (PartitionFilters, not row filter)") {
    import spark.implicits._
    val day = lit("2024-01-30").cast("date")
    val df = spark.read
      .parquet(dir)
      .filter($"d" === day)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*\\(d[^\\]]* = 2024-01-30\\)[^\\]]*\\].*"),
      s"day equality did not land in PartitionFilters:\n$plan")
    // same rows as filtering the unpartitioned table
    val expected = T(spark, sf, "events").filter(to_date($"ts") === day).count()
    val got = spark.read.parquet(dir).filter($"d" === day).count()
    assert(got == expected && got > 0)
  }

  test("join against a filtered dim triggers dynamic partition pruning") {
    import spark.implicits._
    // two DPP preconditions worth documenting: the dim must be a real
    // source (Catalyst folds a filter over in-memory rows into the
    // relation, leaving no Filter for the DPP rule to see), and the filter
    // must be one Spark considers likely-selective (an equality — a bare
    // boolean attribute is not on the isLikelySelective list)
    val dimPath = Files.createTempDirectory("graft_dim").toString
    (1 to 30)
      .map(i => (java.sql.Date.valueOf(f"2024-01-$i%02d"), i % 7))
      .toDF("d", "audit_group")
      .write
      .mode("overwrite")
      .parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val out = spark.read
      .parquet(dir)
      .join(dim.filter($"audit_group" === 3), Seq("d"))
      .groupBy($"d")
      .agg(count(lit(1)).as("n"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(
      plan.contains("dynamicpruningexpression"),
      s"no dynamicpruningexpression on the fact scan:\n$plan")
  }
}
