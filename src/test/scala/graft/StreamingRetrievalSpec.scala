package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.ops.{SimilarityOps, StreamOps, Vec}
import org.apache.spark.sql.functions._

/** Continuous retrieval: streamed probes multi-probe the static
  * sign-LSH-bucketed corpus. Contracts: the streamed hit set equals the
  * identical batch formulation probe-for-probe, and the join is stateless
  * (no streaming state operators) — the property that makes retrieval
  * latency one micro-batch at any probe volume.
  */
class StreamingRetrievalSpec extends SparkSpec {

  test("streamed ANN hits equal the batch multi-probe, statelessly") {
    import spark.implicits._
    // stage the whole embeddings table as the probe stream
    val probesDir = Files.createTempDirectory("graft_probe_src")
    Files.copy(
      Paths.get(s"$sf/embeddings.parquet"),
      probesDir.resolve("embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val q = StreamOps
      .liftSimRetrieve(spark, sf, probesDir.toString, minCos = 0.2)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("retrieval_out")
      .option(
        "checkpointLocation",
        Files.createTempDirectory("graft_probe_ckpt").toString)
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("retrieval_out")
    assert(streamed.count() > 0)
    // identical batch formulation
    val corpus = T(spark, sf, "embeddings")
      .select(
        $"vec_id", $"embedding",
        Vec.norm2($"embedding").as("n2"),
        SimilarityOps.bucketCol.as("bucket"))
    val probes = T(spark, sf, "embeddings")
      .select(
        $"vec_id".as("probe_id"), $"embedding".as("p"),
        Vec.norm2($"embedding").as("pn2"),
        SimilarityOps.bucketCol.as("pb"))
      .select(
        $"probe_id", $"p", $"pn2",
        explode(
          array(
            $"pb" +: (0 until SimilarityOps.SignBits)
              .map(j => $"pb".bitwiseXOR(lit(1L << j))): _*)).as("bucket"))
    val batch = probes
      .join(corpus, Seq("bucket"))
      .filter($"vec_id" =!= $"probe_id")
      .select(
        $"probe_id", $"vec_id",
        X.r6(Vec.cosine(Vec.dot($"embedding", $"p"), $"n2", $"pn2")).as("cos"))
      .filter($"cos" >= 0.2)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    // stateless: the stream-static join holds no state store
    val progress = q.lastProgress
    assert(progress == null || progress.stateOperators.isEmpty)
  }
}
