package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.ops.StreamOps
import org.apache.spark.sql.functions._

/** The streaming lift (SURVEY §0: the reference's run loop IS a micro-batch
  * stream): the tumbling-day report computed by Structured Streaming over
  * the same events must equal the batch q_stream_tumble counts.
  */
class StreamingLiftSpec extends SparkSpec {

  test("readStream tumbling-window report equals the batch result") {
    // file streaming source wants a directory
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(
      Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val q = StreamOps
      .liftTumble(spark, dir.toString)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_stream_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .table("graft_stream_out")
        .select("win_start", "event_type", "n")
        .collect()
        .map(_.toString)
        .sorted
        .toSeq
      val batch = SparkEntry
        .queries("q_stream_tumble")(spark, sf)
        .select("win_start", "event_type", "n")
        .collect()
        .map(_.toString)
        .sorted
        .toSeq
      assert(streamed == batch)
    } finally q.stop()
  }
}
