package graft

import java.nio.file.Files

import graft.index.GenLog
import graft.ops.{SimilarityOps, StreamOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[GenLog.maybeCompact]] — the self-tuning compaction cadence: a
  * composed pipeline calls it once per batch and the policy decides,
  * from what actually accumulated, whether this batch pays for a fold.
  * Count trigger bounds merge-on-read fan-in; bytes trigger bounds the
  * fraction of the corpus living in un-folded generations. Every
  * decision must be read-invariant: the served answer before and after
  * any policy-driven fold is identical.
  */
// Tagged slow (r19, verdict item 1): multi-generation compaction soak; excluded from the
// default `sbt test` so the suite fits the driver budget — run via
// `sbt -Dgraft.slow.tests=true test` (see build.sbt).
@org.scalatest.tags.Slow
class CompactionPolicySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def setup(): (String, Seq[DataFrame], Seq[String]) = {
    val all = T(spark, sf, "embeddings")
    val maxId = all.agg(max($"vec_id")).head().getLong(0)
    val Batches = 6
    val cuts = (0 to Batches).map(i => maxId / 2 + (maxId - maxId / 2) * i / Batches)
    val dir = Files.createTempDirectory("graft_policy_idx").toString
    StreamOps.seedAnnIndex(spark, all.filter($"vec_id" <= cuts(0)), dir)
    val slices = (1 to Batches).map(i =>
      all.filter($"vec_id" > cuts(i - 1) && $"vec_id" <= cuts(i)))
    val probes = SimilarityOps.batchProbeFrame(spark, sf).localCheckpoint(true)
    val expect = rows(SparkEntry.queries("q_sim_batch")(spark, sf))
    (dir, slices, expect.map(_.toString))
  }

  private def probeRows(dir: String): Seq[String] =
    rows(StreamOps.serveAnnContinuous(
      spark, dir, SimilarityOps.batchProbeFrame(spark, sf)))

  test("count trigger: gens accumulate below maxGens, fold exactly at it, reads invariant") {
    val (dir, slices, expect) = setup()
    spark.conf.set(GenLog.CompactMaxGensKey, "4")
    // bytes trigger neutralized so the count policy is isolated
    spark.conf.set(GenLog.CompactGenBytesFracKey, "1e9")
    try {
      var folds = 0
      slices.zipWithIndex.foreach { case (b, i) =>
        GenLog.commitGeneration(StreamOps.AnnFamily, b, dir, batchId = i.toLong)
        val before = probeRows(dir)
        val did = GenLog.maybeCompact(spark, dir, StreamOps.AnnFamily)
        if (did) folds += 1
        val gensAbove = {
          val f = GenLog.versions(spark, dir, requiring = "full").max
          GenLog.versions(spark, dir, requiring = "gen").count(_ > f)
        }
        // the policy's bound: never more than maxGens-1 gens survive a
        // maybeCompact call (it folds the moment the count reaches 4)
        assert(gensAbove <= 3, s"batch $i left $gensAbove gens above the full")
        assert(did === ((i + 1) % 4 === 0),
          s"batch $i: fold ran=$did — cadence must be every 4th batch")
        assert(probeRows(dir) === before, s"fold after batch $i changed the answer")
      }
      assert(folds === 1, s"6 batches at maxGens=4 pay for exactly one fold, got $folds")
      // quiesce: final answer is the full corpus
      GenLog.compact(spark, dir, StreamOps.AnnFamily)
      assert(probeRows(dir) === expect)
    } finally {
      spark.conf.unset(GenLog.CompactMaxGensKey)
      spark.conf.unset(GenLog.CompactGenBytesFracKey)
    }
  }

  test("composed pipeline: the report leg self-tunes its compaction in-stream") {
    import java.nio.file.Files
    val all = T(spark, sf, "documents")
    val mx = all.agg(max($"doc_id")).head().getLong(0)
    val base = Files.createTempDirectory("graft_policy_pipe").toString
    val url = s"jdbc:derby:$base/db;create=true"
    val pipe = StreamOps.CorpusPipeline(
      lakeDir = s"$base/lake",
      dedupIndexDir = s"$base/dedup",
      bm25IndexDir = s"$base/bm25",
      boilerStatsDir = s"$base/boiler",
      passageGramsDir = s"$base/passage",
      bigramStatsDir = s"$base/bigram",
      reportSummaryDir = s"$base/report",
      jdbcUrl = url,
      reportTable = "corpus_report")
    // the EndToEndPipelineSpec curation shape: gate ∧ mix → per-slice md5
    // first-writer dedup → pure-function split tag
    def curated(lo: Long, hi: Long): DataFrame = {
      val df = all.filter($"doc_id" > lo && $"doc_id" <= hi)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5($"text")).orderBy($"doc_id")
      val bucket = pmod(graft.ops.Hashing.h32($"doc_id".cast("string")), lit(100L))
      graft.ops.CurationOps.qualityGate(df)
        .filter(graft.ops.CurationOps.mixPredicate)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).drop("rn")
        .withColumn("split",
          when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"))
    }
    StreamOps.seedCorpusPipeline(spark, curated(-1L, mx / 2), pipe)
    // 6 per-batch summary generations at maxGens=3: the policy must fold
    // mid-stream (a committed full above v0) with no day-2 call, and the
    // published accounting must equal the monolithic composition
    spark.conf.set(GenLog.CompactMaxGensKey, "3")
    try {
      val cuts = (0 to 6).map(i => mx / 2 + (mx - mx / 2) * i / 6)
      (1 to 6).foreach { b =>
        StreamOps.corpusPipelineBatch(
          curated(cuts(b - 1), cuts(b)), (b - 1).toLong, pipe)
      }
      val fulls = GenLog.versions(spark, s"$base/report", requiring = "full")
      assert(fulls.max > 0L,
        s"the in-stream policy never folded the report summaries: $fulls")
      val gensLeft = GenLog.versions(spark, s"$base/report", requiring = "gen")
        .count(_ > fulls.max)
      assert(gensLeft <= 2, s"fan-in unbounded: $gensLeft gens above the full")
      // additivity contract of the report leg: published ≡ the aggregate
      // of exactly the curated frames fed (seed + 6 batches)
      val fed = (curated(-1L, mx / 2) +:
        (1 to 6).map(b => curated(cuts(b - 1), cuts(b))))
        .reduce(_ unionByName _)
      assert(
        rows(StreamOps.publishedCorpusReport(spark, s"$base/report")
          .orderBy("split", "lang")) ===
          rows(StreamOps.corpusReport(fed).orderBy("split", "lang")),
        "self-tuned folds changed the published accounting")
    } finally spark.conf.unset(GenLog.CompactMaxGensKey)
  }

  test("bytes trigger: a gen mass exceeding the configured fraction of the full forces a fold") {
    val (dir, slices, _) = setup()
    // any nonzero gen mass trips a 0-fraction threshold; count neutralized
    spark.conf.set(GenLog.CompactMaxGensKey, "1000")
    spark.conf.set(GenLog.CompactGenBytesFracKey, "0.0")
    try {
      assert(!GenLog.maybeCompact(spark, dir, StreamOps.AnnFamily),
        "no gens yet: nothing to fold regardless of thresholds")
      GenLog.commitGeneration(StreamOps.AnnFamily, slices.head, dir, batchId = 0L)
      val before = probeRows(dir)
      assert(GenLog.maybeCompact(spark, dir, StreamOps.AnnFamily),
        "one committed gen must trip the 0-fraction bytes trigger")
      assert(probeRows(dir) === before)
      // and a fraction no realistic gen mass reaches never fires
      GenLog.commitGeneration(StreamOps.AnnFamily, slices(1), dir, batchId = 1L)
      spark.conf.set(GenLog.CompactGenBytesFracKey, "1e9")
      assert(!GenLog.maybeCompact(spark, dir, StreamOps.AnnFamily))
    } finally {
      spark.conf.unset(GenLog.CompactMaxGensKey)
      spark.conf.unset(GenLog.CompactGenBytesFracKey)
    }
  }
}
