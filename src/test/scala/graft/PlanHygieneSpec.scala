package graft

/** Registry-wide plan anti-pattern sweep: builds (without executing) the
  * physical plan of EVERY registered batch query and rejects the two
  * shapes that kill a 100 TB run — a cartesian product, and a
  * broadcast-nested-loop join anywhere one wasn't deliberately chosen.
  * The allowlist is exactly the similarity queries that crossJoin a
  * broadcast single-row probe/codebook (a ≤16-row side by construction —
  * the documented design, not an accident); everything else must plan
  * equi-joins. A new query that accidentally plans a BNLJ fails here
  * before it ever reaches the bench.
  */
class PlanHygieneSpec extends SparkSpec {

  /** The exact queries whose plan carries a BroadcastNestedLoopJoin: the
    * single-row broadcast probe / codebook crossJoins
    * (SimilarityOps.scala:87,294,314,366,443). Kept as an EXACT set, not
    * an allowlist — a query leaving the set (plan improved) must be
    * removed here just as a query entering it must be justified.
    */
  private val BnljExpected = Set(
    "q_sim_topk",
    "q_sim_ivf",
    "q_sim_ivf_batch",
    "q_sim_ivf_trained",
    // r8 one-row attaches: the IVF codebook row read back from the
    // persisted index, q_dedup_incr's max-id threshold frame (twice:
    // base/delta split + the is_new_cluster flag), and q_stat_chisq's
    // grand-total row (replacing the partition-less window)
    "q_sim_ivf_served",
    // r10: same one-row broadcast codebook crossJoin as q_sim_ivf
    // (q_dedup_semantic_incr plans NO BNLJ: its batch assignment is
    // severed behind a localCheckpoint before the final join)
    "q_dedup_semantic",
    "q_dedup_semantic_trained",
    "q_cluster_stats",
    "q_cluster_terms",
    "q_dedup_incr",
    // r18: q_lm_score_incr's base-epoch threshold frame (the dedupIncr
    // max-id split shape) rides in the delta-scoring leg's plan.
    // q_dedup_cc_incr plans NO BNLJ: its returned view is the slim
    // state read — the threshold attach runs in the eagerly-executed
    // commit jobs, not the served frame's lineage.
    "q_lm_score_incr",
    "q_dedup_embed_incr", // same one-row threshold frame as q_dedup_incr
    "q_stat_chisq",
    // r9: BM25's one-row (N, L) corpus-stats attach (TextOps.bm25Frames)
    "q_index_bm25",
    "q_index_bm25_served",
    "q_index_bm25_incr",
    // q_retrieval_rrf_served left this set in r9 and q_retrieval_rrf in
    // r19: each one's lexical leg (the only BNLJ carrier, the one-row
    // (N, L) attach) is now scored once into a bounded LocalRelation, so
    // the fused plan plans no BNLJ at all
    // r9: one-row temperature-weight total attach (CurationOps)
    "q_sample_temperature",
    // r12: one-row corpus-scaled boilerplate threshold attach
    // (TextOps.boilerplateFracReportOf — the df-fraction cut is a
    // broadcast scalar, same idiom as the BM25 (N, L) stats row)
    "q_text_boilerplate_frac",
    // q_lm_unigram / q_lm_score / q_lm_apply: the one-row corpus-total
    // attach (crossJoin(broadcast(N)) — the boilerplate_frac idiom).
    // q_lm_score and q_lm_apply joined this set in r19: the redundant
    // re-pin of the already-checkpoint-backed counts frame was removed
    // (rarityAggOf), so the one-row attach now shows in the final plan
    // instead of inside a pure-overhead checkpoint job; the _lang
    // variants attach per-language totals by a keyed broadcast join,
    // never a cross
    "q_lm_unigram",
    "q_lm_score",
    "q_lm_apply",
    // r15 q_lm_interp: the one-row corpus-length attach (the BM25 (N, L)
    // stats idiom) — the interpolation denominator 10·cfl·L needs the
    // corpus token total on every pair row
    "q_lm_interp",
    // r15 q_lm_kn: the one-row distinct-pair-total (npairs) attach —
    // the continuation denominator needs it on every pair row; the
    // per-pair model joins are keyed (checkpointed behind pinned)
    "q_lm_kn",
    // the PQ family: every member attaches ONE-ROW broadcast state by
    // construction — the PqM-sub-codebook bundle for the map-side encode
    // and the probe's ADC lookup-table row (plus the one-row coarse
    // codebook inside q_sim_ivfpq's IVF leg). PqSpec separately pins
    // that these plans carry zero corpus-side hash exchanges.
    "q_sim_pq",
    "q_sim_pq_batch",
    "q_sim_pq_served",
    "q_sim_pq_incr",
    "q_sim_pq_trained",
    "q_sim_ivfpq")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> SparkEntry
        .queries(name)(spark, sf)
        .queryExecution
        .executedPlan
        .toString
    }.toMap

  test("no cartesian product in any registered query plan") {
    val offenders = plans.collect {
      case (n, p) if p.contains("CartesianProduct") => n
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("broadcast-nested-loop joins are exactly the single-row-probe set") {
    val have = plans.collect {
      case (n, p) if p.contains("BroadcastNestedLoopJoin") => n
    }.toSet
    assert(have == BnljExpected, s"BNLJ set drifted: got $have")
  }
}
