package graft

import org.apache.spark.sql.DataFrame

/** The cluster-shape sanity gate (verdict-r11 #8): everything else runs
  * at local[4] / shuffle.partitions=4, so the 100×-cluster posture
  * (plans that survive `spark.sql.shuffle.partitions` ≫ cores) was
  * plan-asserted but never EXECUTED. This spec runs the ten hottest
  * registry queries (the r11 bench ranking) twice — at the session
  * default and at shuffle.partitions=256, a realistic 1000-executor
  * default — and requires:
  *
  *  - byte-identical results: a query whose answer depends on the
  *    partition count (non-deterministic tie-break, partition-local
  *    state leaking into output) is wrong on any real cluster;
  *  - no plan regression: the exchange count is unchanged — raising the
  *    partition count must scale the SAME shuffles wider, not introduce
  *    new ones (or silently drop a broadcast to a 256-way SMJ).
  */
class ShufflePartitionsSpec extends SparkSpec {

  // the r11 bench's ten most expensive queries at sf0.1 — the plans with
  // the most shuffle surface, where a partition-count sensitivity or a
  // shape regression would cost the most at cluster scale — plus the
  // round-12 text-frequency additions (shingle/gram hash aggregates and
  // the islands window, all shuffle-heavy shapes new to the registry)
  // and the round-13 min-match passage contract (run-grouping window
  // over the md5 gram ladder)
  private val Hottest = Seq(
    "q_dedup_cc", "q_pipeline_corpus2", "q_join_fuzzy",
    "q_retrieval_rrf_served", "q_retrieval_rrf", "q_dedup_near",
    "q_parse_literal", "q_join_range", "q_dedup_incr", "q_profile_table",
    "q_text_boilerplate_frac", "q_text_passage_dup", "q_text_passage_spans",
    "q_text_passage_dup50", "q_text_passage_spans50", "q_text_scrub50",
    // round-13 batch 2: the LM family (vocab join + doc agg + per-lang
    // ntile window) and the passage-share closure (fingerprint distinct
    // + hub star + ccAssign)
    "q_lm_unigram", "q_lm_score", "q_lm_bucket", "q_dedup_passage_cc",
    "q_lm_bigram", "q_lm_bigram_score", "q_lm_apply")

  private def exchanges(df: DataFrame): Int =
    "(?<!Broadcast)Exchange".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString)
      .size

  private def run(name: String): (Seq[String], Int) = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    // exchange count from the STATIC plan, before AQE finalizes: runtime
    // re-plans (skew splits, SMJ→BHJ promotion) are data-sized, and
    // counting them would make the shape gate depend on host timing
    val ex = exchanges(df)
    (df.collect().map(_.toString).sorted.toSeq, ex)
  }

  test("the ten hottest queries at shuffle.partitions=256: identical results, same exchange count") {
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    for (name <- Hottest) {
      spark.conf.set("spark.sql.shuffle.partitions", prior)
      val (base, exBase) = run(name)
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      try {
        val (wide, exWide) = run(name)
        assert(base === wide,
          s"$name: the answer depends on the shuffle partition count")
        assert(exBase === exWide,
          s"$name: exchange count changed $exBase -> $exWide at 256 partitions")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    }
  }
}
