package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_agg_sketch_merge — sketch state as data: per-day HLL sketches
  * persisted as a parquet BINARY column, read back, unioned across days,
  * and the merged estimate must equal the whole-data sketch exactly
  * (register-wise max is associative). This is the property that turns a
  * sketch from a per-query approximation into the warehouse rollup
  * primitive — yesterday's state never recomputes.
  */
class SketchMergeSpec extends SparkSpec {

  test("persisted per-day sketches union to the whole-data sketch exactly") {
    import spark.implicits._
    val ev = T(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_sketch_state").toString
    ev.groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(hll_sketch_agg($"user_id").as("sk"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("m"))
    val whole = ev.groupBy($"event_type")
      .agg(
        hll_sketch_estimate(hll_sketch_agg($"user_id")).as("w"),
        countDistinct($"user_id").as("exact"))
    val joined = merged.join(whole, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("m") === r.getAs[Long]("w"),
        s"merged != whole for ${r.getString(0)}")
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(r.getAs[Long]("m") - exact) <= math.max(1d, exact * 0.05),
        s"estimate off >5% for ${r.getString(0)}")
    }
  }

  test("q_agg_sketch_merge reports the contract green on testdata") {
    val out = SparkEntry.queries("q_agg_sketch_merge")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("merge_exact"), r.toString)
      assert(r.getAs[Boolean]("err_ok"), r.toString)
    }
  }
}
