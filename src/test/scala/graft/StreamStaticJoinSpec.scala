package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.ops.StreamOps
import org.apache.spark.sql.functions._

/** Stream-static join: each micro-batch enriches against a static
  * dimension snapshot with NO join state. Contract: the streamed result
  * is row-for-row the batch join, and the plan carries no streaming
  * state store (stateless enrichment is the point of this join mode).
  */
class StreamStaticJoinSpec extends SparkSpec {

  test("stream-static enrichment equals the batch join, statelessly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ss_src")
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val q = StreamOps
      .liftStreamStaticJoin(spark, dir.toString)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ss_join_out")
      .option(
        "checkpointLocation",
        Files.createTempDirectory("graft_ss_ckpt").toString)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("ss_join_out")
    val batch = T(spark, sf, "events")
      .select($"event_id", $"user_id", $"event_type")
      .join(
        T(spark, sf, "events")
          .groupBy($"user_id")
          .agg(min(to_date($"ts")).as("cohort_day")),
        Seq("user_id"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    // stateless: no state-store operator in the executed streaming plan
    val progress = q.lastProgress
    assert(progress == null || progress.stateOperators.isEmpty)
  }
}
