package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.ops.StreamOps
import org.apache.spark.sql.functions._

/** Continuous sketch rollup ([[StreamOps.liftSketchRollup]]): per-day HLL
  * sketches built as STREAMING aggregation state must union to exactly
  * the batch whole-data sketch — the mergeable-state contract of
  * q_agg_sketch_merge holding across the batch/stream boundary, so a
  * warehouse can roll up days regardless of which engine mode built them.
  */
class StreamingSketchSpec extends SparkSpec {

  private def stage(): String = {
    val dir = Files.createTempDirectory("graft_sketch_stream")
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streamed day sketches union to the batch whole-data sketch exactly") {
    import spark.implicits._
    val q = StreamOps
      .liftSketchRollup(spark, stage())
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_sketch_out")
      .option(
        "checkpointLocation",
        Files.createTempDirectory("graft_sketch_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("graft_sketch_out")
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("streamed_users"))
      val batch = T(spark, sf, "events")
        .groupBy($"event_type")
        .agg(
          hll_sketch_estimate(hll_sketch_agg($"user_id")).as("batch_users"),
          countDistinct($"user_id").as("exact"))
      val joined = streamed.join(batch, "event_type").collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        assert(r.getAs[Long]("streamed_users") === r.getAs[Long]("batch_users"),
          s"stream-built union != batch sketch for ${r.getString(0)}")
        val exact = r.getAs[Long]("exact").toDouble
        assert(
          math.abs(r.getAs[Long]("streamed_users") - exact) <= math.max(1d, exact * 0.05),
          s"estimate off >5% for ${r.getString(0)}")
      }
    } finally q.stop()
  }
}
