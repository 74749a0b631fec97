package graft

/** Plan-shape assertions (the 100 TB posture, SURVEY §7.4.7): broadcasts
  * where intended, pushdown reaching the parquet scan, no cartesian
  * products where an equi-key exists.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_join_broadcast actually broadcasts the dim") {
    assert(plan("q_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q_multi_join broadcasts nation") {
    assert(plan("q_multi_join").contains("BroadcastHashJoin"))
  }

  test("q_window_7d pushes the ts range into the parquet scan") {
    val p = plan("q_window_7d")
    // nanos are read as longs, so the pushed filter is on the raw int64
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"), p)
  }

  test("q_agg_daily pushes the day range into the parquet scan") {
    val p = plan("q_agg_daily")
    assert(
      p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,"),
      p)
  }

  test("column pruning: q_sort_limit reads only user_id") {
    val p = plan("q_sort_limit")
    assert(p.contains("ReadSchema: struct<user_id:bigint>"), p)
  }

  test("q_sort_limit is a TakeOrderedAndProject, not a global sort") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q_join_range is an equi-join on user_id, not a nested loop") {
    val p = plan("q_join_range")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_stream_join is an equi-join on user_id, not a nested loop") {
    val p = plan("q_stream_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_dedup_near banded join is an equi-join, not a nested loop") {
    val p = plan("q_dedup_near")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("sorted_intersect_count"), p)
  }

  test("q_dedup_incr: every index join is an equi-join, not a nested loop") {
    // the final job: no cartesian anywhere (the only nested-loop joins are
    // the one-row broadcast thr attachments, the accepted crossJoin shape)
    val p = plan("q_dedup_incr")
    assert(!p.contains("CartesianProduct"), p)
    // the probe-vs-index band join (checkpointed out of the final plan by
    // the closure) asserted on its own frame: equi-keyed shuffle join +
    // the codegen'd merge-walk verify, never a nested loop
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = T(spark, sf, "documents").select($"doc_id", $"lang", $"text")
    val (_, bandIndex) = ops.DedupOps.buildDedupIndex(spark, docs.filter($"doc_id" <= 40))
    val probe = ops.DedupOps.indexProbePairs(
      spark,
      ops.DedupOps.hashedToksOf(docs.filter($"doc_id" > 40)),
      bandIndex)
    val pp = probe.queryExecution.executedPlan.toString
    assert(!pp.contains("CartesianProduct") && !pp.contains("BroadcastNestedLoopJoin"), pp)
    assert(pp.contains("sorted_intersect_count"), pp)
  }

  test("q_dedup_embed and q_sim_cosine use the codegen'd dot kernel, no nested loop") {
    Seq("q_dedup_embed", "q_sim_cosine").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), q)
      assert(p.contains("dot_product"), q)
    }
  }

  test("q_dedup_semantic: codegen'd dot verify, cell equi-join, fused argmin") {
    val p = plan("q_dedup_semantic")
    // the only nested loop is the one-row broadcast codebook attach
    // (PlanHygieneSpec's documented set); the within-cell τ-verify is a
    // cell-keyed equi-join over the codegen'd kernels
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("dot_product"), p)
    assert(p.contains("codebook_scores"), p)
  }

  test("q_multi_join2 broadcasts dims and pushes the p_name filter to the part scan") {
    val p = plan("q_multi_join2")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("StringContains(p_name,red)"), p)
  }

  test("q_sim_topk broadcasts the probe (no corpus shuffle)") {
    val p = plan("q_sim_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q_sim_batch broadcasts the probe set: the only hash shuffle moves candidates") {
    val p = plan("q_sim_batch")
    // corpus joins the broadcast probe table in place; the row_number
    // window may shuffle the bucket-pruned candidates by probe_id, but the
    // corpus itself must not be hash-exchanged (one probe batch = one pass)
    assert(p.contains("BroadcastHashJoin"), p)
    val exchanges =
      "Exchange hashpartitioning\\(probe_id".r.findAllIn(p).length
    val allExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(allExchanges == exchanges, s"corpus-side hash exchange present:\n$p")
  }

  test("q_sim_quantized: broadcast probe equi-join, no corpus shuffle, staged cuts") {
    val p = plan("q_sim_quantized")
    // the quantized scan tier joins the broadcast multi-probe frame on the
    // bucket equi-key — never a nested loop over the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // both stage cuts are TakeOrdered (driver-bounded 20 then 10), never a
    // global sort exchange of candidates
    assert("TakeOrderedAndProject".r.findAllIn(p).length == 2, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    // the corpus is never hash-exchanged: candidate pruning is the scan
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_sim_ivf_batch: corpus joins its cell once; only candidates shuffle") {
    val p = plan("q_sim_ivf_batch")
    // probe cells are broadcast onto the cell-assigned corpus; the only
    // hash Exchange allowed is the per-probe top-k window moving the
    // cell-pruned candidate set, never the corpus
    assert(p.contains("BroadcastHashJoin"), p)
    val candExchanges =
      "Exchange hashpartitioning\\(probe_id".r.findAllIn(p).length
    val allExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(allExchanges == candExchanges, s"corpus-side hash exchange present:\n$p")
  }

  test("q_join_asof is one window pass over one shuffle — no join operator") {
    val p = plan("q_join_asof")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q_sim_ivf cell assignment is map-side: no row-expanding shuffle") {
    val p = plan("q_sim_ivf")
    // the only shuffle allowed is the single-partition collect of the
    // 16-row codebook; the corpus itself must go scan → broadcast-join →
    // argmin projection with no Exchange (the old crossJoin+row_number
    // shape pushed a 16×-expanded corpus through hashpartitioning)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("banded dedup self-join reuses one exchange: the hash pass runs once") {
    Seq("q_dedup_near", "q_dedup_ngram").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // AQE reuse only shows in the final adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"), s"$q: no ReusedExchange")
      // and the inferred join-key null checks must NOT drag the tokenize+
      // hash expression into the parquet scan as a duplicated DataFilter
      assert(!p.contains("DataFilters: [isnotnull(size("), q)
      // the pair-verify merge walk — the whole point of the codegen'd
      // SortedIntersectCount — must sit inside a WholeStageCodegen span
      // (rendered as a `*(n)` node prefix in the final plan)
      val verifyLines = p.split("== Initial Plan ==").head.linesIterator
        .filter(_.contains("sorted_intersect_count"))
        .toSeq
      assert(verifyLines.nonEmpty, s"$q: no sorted_intersect_count node")
      assert(
        verifyLines.forall(_.matches(""".*\*\(\d+\) .*""")),
        s"$q: merge walk outside WholeStageCodegen:\n$p")
    }
  }

  test("q_text_repetition is map-side: the only exchange is the oracle sort") {
    val p = plan("q_text_repetition")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("bigram_stats"), p)
  }

  test("q_embed_quantize is map-side: the only exchange is the oracle sort") {
    val p = plan("q_embed_quantize")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("quantize_stats"), p)
  }

  test("q_text_chunk is a map-side expansion: the only exchange is the oracle sort") {
    val p = plan("q_text_chunk")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("q_split_contamination joins shingles on an equi-key, no nested loop") {
    val p = plan("q_split_contamination")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("shingle_hashes"), p)
  }

  test("q_index_inverted: df window, rn filter and final agg ride ONE token exchange") {
    val p = plan("q_index_inverted")
    // window partition-by token is the only hash exchange; the groupBy(token)
    // after the rn≤cap filter reuses it, so the bounded-postings design costs
    // one shuffle total (+ the oracle sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_sample_weighted is map-side: the only exchange is the oracle sort") {
    val p = plan("q_sample_weighted")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("q_agg_histogram is one scan + one tiny agg") {
    val p = plan("q_agg_histogram")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_join_fuzzy joins on the variant equi-key, never a nested loop") {
    val p = plan("q_join_fuzzy")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.toLowerCase.contains("variant"), p)
  }

  test("q_ts_gapfill: no spine join — daily agg + ONE fill window, then the sort") {
    val p = plan("q_ts_gapfill")
    // lead-bounded sequence explode makes each daily row emit its own gap
    // days: the (user, day) agg + the user window are the only hash
    // exchanges, and there is no join operator at all
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Join"), p)
  }

  test("q_ts_anomaly broadcasts the per-type stats back to the daily frame") {
    val p = plan("q_ts_anomaly")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_stat_chisq: marginals are window sums, grand total a one-row broadcast") {
    val df = SparkEntry.queries("q_stat_chisq")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // no data-sized join: row/col marginals stay window sums over the tiny
    // cell frame; the grand total attaches as a one-row broadcast (which
    // also keeps the suite log free of partition-less WindowExec warnings)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("CartesianProduct"), p)
    // ONE exchange sees event-sized data (the partial-agg cell build, on
    // the (type, dow) pair key); the grand-total branch REUSES it instead
    // of rescanning events, and the window exchanges move the bounded
    // |types|*7 frame
    val finalSection = p.split("== Initial Plan ==").head
    val cellExchanges = finalSection.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(event_type") && l.contains("dow") &&
        !l.contains("ReusedExchange"))
    assert(cellExchanges == 1, finalSection)
    assert(finalSection.contains("ReusedExchange"), finalSection)
  }

  test("q_merge_upsert is one full-outer join, never a nested loop") {
    val p = plan("q_merge_upsert")
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_scd2_history: both windows share one user_id exchange") {
    val p = plan("q_scd2_history")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_snapshot_diff: the full-outer join reuses the snapshot aggs' partitioning") {
    val p = plan("q_snapshot_diff")
    // one exchange per snapshot agg; the join on o_custkey adds none
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(p.contains("FullOuter"), p)
  }

  test("q_win_islands: streak agg and per-user windows ride the window exchanges") {
    val p = plan("q_win_islands")
    // distinct (user, day) + the user_id window; the (user, anchor) agg and
    // both per-user windows reuse the user_id partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("q_funnel_paths: session agg reuses the window's user_id partitioning") {
    val p = plan("q_funnel_paths")
    // one exchange for the per-user window (the session agg rides it: hash
    // on user_id co-locates every (user_id, sess) group), one for the tiny
    // path ranking — and the top-20 is a TakeOrdered, not a global sort
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_profile_table: distinct agg shuffles on the distributed (col, v) key") {
    val p = plan("q_profile_table")
    // two-phase distinct: partial on (col_name, v), final on col_name —
    // never a per-column global aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
  }

  test("q_cohort_retention: events shuffle once for the first-touch window") {
    val p = plan("q_cohort_retention")
    // user_id window exchange + the tiny distinct-agg exchange; the heavy
    // event rows move exactly once
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    // and the scan reads only (ts, user_id) — ts arrives as a raw bigint
    // on nano-generation testdata, as a native timestamp on µs generations
    assert(
      p.contains("ReadSchema: struct<ts:bigint,user_id:bigint>") ||
        p.contains("ReadSchema: struct<ts:timestamp,user_id:bigint>"),
      p)
  }

  test("q_source_filter broadcasts the stats and prunes the stats scan") {
    val p = plan("q_source_filter")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the reputation pass must read only (source, n_chars), never text
    assert(p.contains("ReadSchema: struct<source:string,n_chars:bigint>"), p)
  }

  test("q_sample_quota ranks a slim projection and broadcasts the picks") {
    val p = plan("q_sample_quota")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the window input is the slim (doc_id, lang, hash) projection — its
    // scan must not read text/source/n_chars
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
  }

  test("q_index_bm25: postings prune via broadcast semi; df/stats attach broadcast") {
    val p = plan("q_index_bm25")
    // the 11-term query frame, the df rows and the one-row (N, L) stats all
    // arrive broadcast — the only shuffles move matching postings, doc
    // lengths, and the per-(query, doc) score sum
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // four (r18 opt — was six): the full-vocab tf frame materializes
    // ONCE behind an eager checkpoint (its (doc, term) exchange runs in
    // that job, not here) and dl/stats derive from it, so this plan
    // keeps only df (term), dl (doc) + the tf⋈dl doc_id side, the
    // (query, doc) score sum, and the per-query rank window
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 4, p)
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1, p)
  }

  test("q_retrieval_rrf: bucket-pruned semantic leg, no corpus cartesian, broadcast fusion") {
    val p = plan("q_retrieval_rrf")
    // the seed probes and the two ≤10-per-query leg frames all arrive
    // broadcast; the embedding side joins ONCE on its bucket column —
    // never an all-pairs cosine
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the embeddings scan feeding the cosine leg reads only the vector
    // columns, not the label
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"), p)
  }

  test("q_bpe_pairs: one corpus shuffle, pairs explode off the vocab frame") {
    val p = plan("q_bpe_pairs")
    // two hash exchanges — the word histogram (the only corpus-sized
    // shuffle, with map-side partial agg) and the vocabulary-sized pair
    // count; the top-20 is a TakeOrdered, not a global sort exchange
    assert(
      "Exchange hashpartitioning".r
        .findAllIn(p.split("== Initial Plan ==").head)
        .size == 2,
      p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the scan reads only text — pair counting needs no other column
    assert(p.contains("ReadSchema: struct<text:string>"), p)
  }

  test("q_sample_temperature: quota frame broadcast, one rank window, slim scans") {
    val p = plan("q_sample_temperature")
    // the |languages|-sized quota frame comes back broadcast; the corpus
    // side pays only the per-language rank window
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // both corpus passes read only (doc_id, lang) — never text
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
    assert(!p.contains("text:string"), p)
  }

  test("q_agg_quantile_incr serve: |types|-row report broadcast onto ONE " +
    "events pass; no sort-merge join anywhere") {
    import graft.ops.RelationalOps
    val (build, serve) = RelationalOps.quantileIncrSplit(spark, sf)
    build()
    val p = serve().queryExecution.executedPlan.toString
    // the served report (≤ |event types| rows) attaches broadcast; the
    // contract's rank counts, exact_users, and n all come out of that
    // single joined aggregation — one raw pass arms every boolean
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // exactly one scan of the raw events feeds the armor (the state side
    // reads the sketch parquet, not events)
    assert("events\\.parquet".r.findAllIn(p).size == 1, p)
  }

  test("q_agg_rollup_daily serve: |days x types|-row report broadcast onto " +
    "ONE events pass; no sort-merge join anywhere") {
    import graft.ops.RelationalOps
    val (build, serve) = RelationalOps.rollupDailySplit(spark, sf)
    build()
    val p = serve().queryExecution.executedPlan.toString
    // same one-pass contract armor as the quantile-incr serve: the
    // straddle-merged daily report attaches broadcast and every boolean
    // comes out of the single joined aggregation over raw events
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert("events\\.parquet".r.findAllIn(p).size == 1, p)
  }
}
