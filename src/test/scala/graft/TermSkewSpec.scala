package graft

import java.nio.file.Files

import graft.ops.{LmOps, TextOps}
import org.apache.spark.sql.DataFrame

/** The term-keyed twin of [[EmbedSkewSpec]]: natural-language token
  * frequencies are Zipfian — "the" alone is ~5 % of English tokens — so
  * every join that shuffles on `term` (the LM score family's token ⋈
  * counts join, the BM25 scoring joins) concentrates the hot term's rows
  * in one shuffle partition. The plans deliberately leave the key
  * UNSALTED and rely on AQE's skew-split for the mitigation (the join
  * output feeds a doc-keyed aggregate, so an extra shuffle from
  * splitting is already paid); this spec plants a one-term-dominant
  * corpus and pins that contract: the split activates, and the scores
  * are byte-identical to the default-conf run.
  */
class TermSkewSpec extends SparkSpec {
  import spark.implicits._

  // 500 docs, each 9× the hot term + one per-doc unique term: 'the' is
  // 90 % of all tokens — one hot shuffle key towering over a 501-term
  // vocabulary (a realistic exaggeration of Zipf's head)
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_termskew").toString
    (0 until 500)
      .map(i => (i.toLong, (Seq.fill(9)("the") :+ s"uniq$i").mkString(" "),
        "en", "synthetic", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      // MULTIPLE files: AQE splits a skewed reduce partition by MAP
      // OUTPUT ranges, so a single-mapper token scan is detectable but
      // unsplittable ("number of skewed partitions: left 0") — the
      // 100 TB reality this spec models has thousands of mappers
      .repartition(8)
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def score(): DataFrame = {
    val docs = T(spark, dir, "documents")
    val ft = TextOps.bm25TokensOf(docs)
    LmOps.lmScoreOf(docs, LmOps.rarityAggOf(ft, LmOps.unigramCountsOf(ft)))
  }

  test("hot term is AQE skew-split in the LM score join; scores invariant") {
    // reference run under the suite's default conf (vocab broadcasts)
    val want = score().collect().map(_.toString).toSeq
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k))
    try {
      // at test scale the counts side fits the broadcast threshold; at
      // the 100 TB scale this guards, the vocabulary is corpus-sized —
      // force the shuffle join the production plan would take
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // token rows are slim and compress hard: scale the byte thresholds
      // to what this corpus actually shuffles (EmbedSkewSpec rationale)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      // skew detection is max-vs-median across partitions: a thin median
      // needs enough partitions (EmbedSkewSpec rationale)
      conf.set("spark.sql.shuffle.partitions", "64")
      val df = score()
      val got = df.collect().map(_.toString).toSeq
      assert(got === want, "skew-split must not move a single score")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split marker in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
