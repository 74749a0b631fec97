package graft

/** Determinism gate (SURVEY §5.2-4): every query must produce identical
  * rows under different shuffle-partition settings — partition count is the
  * one thing guaranteed to differ between local[32] and a 1000-executor
  * cluster, so order- or partition-dependent results would fail both the
  * oracle and production.
  */
class DeterminismSpec extends SparkSpec {

  // representative cross-section: shuffles, windows, folds, topk, floats
  private val names = Seq(
    "q_agg_daily",
    "q_join_inner",
    "q_win_lag",
    "q_sort_limit",
    "q_stream_session",
    "q_dedup_near",
    "q_dedup_lsh",
    "q_sim_topk",
    "q_text_fingerprint",
    "q_agg_rollup",
    // round-7 ops whose mechanics are exactly what partition-count
    // invariance guards: the funnel's collect_list is unordered until the
    // array_sort, the quota rank must not depend on input partitioning
    "q_funnel_paths",
    "q_sample_quota",
    // temporal/retrieval family: SCD2 version numbering rides a window
    // sort, the fuzzy join dedups a multiplicity-bearing candidate set,
    // the inverted index samples postings through a window rank, listagg
    // renders a collected set, and the exact-moment stats must not see
    // partial-agg combine order
    "q_scd2_history",
    "q_join_fuzzy",
    "q_index_inverted",
    "q_agg_listagg",
    "q_merge_upsert",
    "q_stat_corr",
    "q_ts_gapfill",
    // round-8 ops: the incremental closure mixes a driver union-find
    // finish with distributed hook rounds (partition count must not
    // change which path runs the same labels), the served variants read
    // back partitioned indexes they just wrote, and the sketch-merge
    // booleans ride register merges that must be combine-order-free
    "q_dedup_incr",
    "q_sim_served",
    "q_sim_ivf_served",
    "q_agg_sketch_merge",
    "q_dedup_embed_incr",
    "q_index_bm25_served", // reads back the index it just wrote (bm25 itself runs)
    "q_index_bm25_incr",   // same: serves the generations it just wrote
    "q_retrieval_rrf_served", // same: serves the three artifacts it just wrote
    // round-10 SemDeDup family: the argmin tie-break and the anchor
    // prune must not depend on partitioning, and the incr variant serves
    // the cell store it just wrote through the build-once catalog
    "q_dedup_semantic",
    "q_dedup_semantic_incr",
    "q_cluster_stats",
    "q_cluster_terms") // window rank ties broken by (n desc, term asc)

  test("identical results at shuffle.partitions = 4 vs 13") {
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$n differs across shuffle settings")
    }
  }

  test("repeated execution is bytewise stable") {
    for (n <- Seq("q_agg_daily", "q_sim_cosine", "q_dedup_minhash")) {
      val fn = SparkEntry.queries(n)
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b, s"$n unstable across runs")
    }
  }
}
