package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.ops.StreamOps
import org.apache.spark.sql.functions._

/** Continuous sketch rollup ([[StreamOps.liftSketchRollup]]): per-day HLL
  * sketches built as STREAMING aggregation state must union to exactly
  * what the BATCH-BUILT day sketches union to — like-for-like states, so
  * equality is exact and the engine mode that built a day is invisible to
  * the rollup. (Equality against a direct whole-data sketch is NOT the
  * contract: sparse-input unions and dense direct sketches read different
  * Datasketches estimators — see q_agg_sketch_merge / SketchMergeSpec —
  * so that comparison is bounded, asserted here against exact distinct.)
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

  test("streamed day sketches union exactly like batch-built day sketches") {
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
      // like-for-like: the batch side builds the SAME per-day sketches
      // and unions them the same way — exact equality expected
      val batchDaily = T(spark, sf, "events")
        .groupBy(window($"ts", "1 day"), $"event_type")
        .agg(hll_sketch_agg($"user_id").as("sk"))
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("batch_users"))
      val exact = T(spark, sf, "events")
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact"))
      val joined = streamed.join(batchDaily, "event_type").join(exact, "event_type").collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        assert(r.getAs[Long]("streamed_users") === r.getAs[Long]("batch_users"),
          s"stream-built day rollup != batch-built day rollup for ${r.getString(0)}")
        val ex = r.getAs[Long]("exact").toDouble
        assert(
          math.abs(r.getAs[Long]("streamed_users") - ex) <= math.max(1d, ex * 0.05),
          s"estimate off >5% for ${r.getString(0)}")
      }
    } finally q.stop()
  }
}
