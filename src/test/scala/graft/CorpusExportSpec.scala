package graft

import java.nio.file.Files

import graft.ops.{DedupOps, Sinks}
import org.apache.spark.sql.functions._

/** The production loop closed end-to-end: the corpus build's kept universe
  * (quality gate → exact dedup → near-dup closure → split) exported as
  * JSONL trainer shards and read back — the shards must reconcile EXACTLY
  * with q_pipeline_corpus2's accounting, and the trainer's split=train
  * read must be partition-pruned, not a full-corpus filter scan.
  */
class CorpusExportSpec extends SparkSpec {

  test("JSONL shards of the kept universe reconcile with the pipeline accounting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_export").toFile
    val path = dir.getAbsolutePath + "/corpus"

    // kept universe + payload text fetched back by key (the accounting
    // query itself never carries text through the closure)
    val kept = DedupOps.corpusKept(spark, sf)
    val payload = kept.join(
      T(spark, sf, "documents").select($"doc_id", $"text"),
      Seq("doc_id"))
    Sinks.writeJsonlShards(
      payload.select($"doc_id", $"text", $"n_chars", $"lang", $"split"),
      path)

    val back = spark.read
      .schema("doc_id LONG, text STRING, n_chars LONG, lang STRING, split STRING")
      .json(path)

    // shard accounting == the registered pipeline accounting, cell for cell
    val fromShards = back
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
    val accounting = SparkEntry.queries("q_pipeline_corpus2")(spark, sf)
    assert(fromShards.except(accounting).count() == 0)
    assert(accounting.except(fromShards).count() == 0)

    // every exported doc is a cluster representative exactly once
    assert(back.groupBy($"doc_id").count().filter($"count" > 1).count() == 0)
    assert(back.select($"doc_id").except(kept.select($"doc_id")).count() == 0)

    // the trainer's split=train read is partition-pruned at the scan
    val train = spark.read
      .schema("doc_id LONG, text STRING, n_chars LONG, lang STRING, split STRING")
      .json(path)
      .filter($"split" === "train")
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(split"), plan)
  }
}
