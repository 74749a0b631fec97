package graft

import org.apache.spark.sql.functions._

/** Semantics + plan shape of the curation family (q_dedup_cc,
  * q_sample_mix, q_pack_sequences): closure on hand-built graphs, packing
  * invariants, and the zero/one-shuffle plan claims.
  */
class CurationSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("connectedComponents closes a path graph and leaves singletons alone") {
    import spark.implicits._
    // path 1-2-3-4-5 (diameter 4 → several propagation rounds), clique
    // 10-11-12, isolated universe nodes 20, 21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a_id", "b_id")
    val universe = ((1L to 5L) ++ (10L to 12L) ++ Seq(20L, 21L)).toDF("doc_id")
    val out = graft.ops.DedupOps
      .connectedComponents(spark, edges, universe)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    (1L to 5L).foreach(id => assert(out(id) == (1L, 5L), s"path node $id"))
    (10L to 12L).foreach(id => assert(out(id) == (10L, 3L), s"clique node $id"))
    Seq(20L, 21L).foreach(id => assert(out(id) == (id, 1L), s"singleton $id"))
  }

  test("q_dedup_cc puts every near-dup pair in one cluster; labels are component minima") {
    import spark.implicits._
    val cc = q("q_dedup_cc").cache()
    val pairs = q("q_dedup_near").select($"a_id", $"b_id")
    val split = pairs
      .join(cc.select($"doc_id".as("a_id"), $"cluster_id".as("ca")), "a_id")
      .join(cc.select($"doc_id".as("b_id"), $"cluster_id".as("cb")), "b_id")
      .filter($"ca" =!= $"cb")
    assert(split.count() == 0, "a verified pair was split across clusters")
    // a cluster id is a member of its own cluster, and the minimum of it
    assert(cc.filter($"cluster_id" > $"doc_id").count() == 0)
    val ids = cc.select($"cluster_id").distinct().except(cc.select($"doc_id")).count()
    assert(ids == 0, "cluster_id must be an existing doc_id")
    cc.unpersist()
  }

  test("q_sample_importance: planted corpus matches the hand-computed " +
    "ratios; target-unseen tokens weigh exactly 0; the keep cut is > 1") {
    import spark.implicits._
    // en "aaa bbb" / fr "aaa ccc" / fr "zzz" / en "x" (no model tokens):
    // cf_all = {aaa:2, bbb:1, ccc:1, zzz:1}, cf_tgt = {aaa:1, bbb:1},
    // L_all = 5, L_tgt = 2 → r(aaa) = 5/4 = 1.25, r(bbb) = 5/2 = 2.5,
    // r(ccc) = r(zzz) = 0 → doc1 mean 1.875 (keep), doc2 0.625, doc3 0
    val planted = Seq(
      (1L, "en", "aaa bbb"),
      (2L, "fr", "aaa ccc"),
      (3L, "fr", "zzz"),
      (4L, "en", "x"))
      .toDF("doc_id", "lang", "text")
    val got = graft.ops.CurationOps.sampleImportanceOf(planted).collect()
    assert(got.length === 4)
    assert(got(0).getLong(1) == 2L && got(0).getDouble(2) == 1.875 &&
      got(0).getBoolean(3))
    assert(got(1).getLong(1) == 2L && got(1).getDouble(2) == 0.625 &&
      !got(1).getBoolean(3))
    assert(got(2).getLong(1) == 1L && got(2).getDouble(2) == 0.0 &&
      !got(2).getBoolean(3))
    assert(got(3).getLong(1) == 0L && got(3).isNullAt(2) &&
      !got(3).getBoolean(3))
  }

  test("q_pack_sequences conserves docs/tokens; bins are contiguous and bounded") {
    import spark.implicits._
    val docs = T(spark, sf, "documents")
      .select(size(split(coalesce($"text", lit("")), " ")).cast("long").as("n_tok"))
      .agg(count(lit(1)).as("docs"), sum($"n_tok").as("toks"), max($"n_tok").as("mx"))
      .head()
    val out = q("q_pack_sequences").cache()
    assert(out.agg(sum($"n_docs")).head().getLong(0) == docs.getLong(0))
    assert(out.agg(sum($"n_tokens")).head().getLong(0) == docs.getLong(1))
    // no-split straddle bound: a bin holds at most window + (last doc - 1)
    assert(out.filter($"n_tokens" >= lit(512L) + docs.getLong(2)).count() == 0)
    // bins are dense per (lang, shard): max bin + 1 == bin count
    val holes = out
      .groupBy($"lang", $"shard")
      .agg(max($"bin").as("mb"), count(lit(1)).as("nb"), min($"bin").as("b0"))
      .filter($"b0" =!= 0 || $"mb" + 1 =!= $"nb")
    assert(holes.count() == 0, "bin ids must be 0..n-1 per group")
    out.unpersist()
  }

  test("q_sample_mix plan is map-side: the only exchange is the oracle sort") {
    val p = q("q_sample_mix").queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("q_pack_sequences aggregation reuses the window's partitioning") {
    // scan → Exchange(hash lang,shard) → sort+window → agg (no exchange:
    // grouping keys extend the partition keys) → Exchange(range) for the
    // oracle sort. Any third exchange means the agg re-shuffled.
    val p = q("q_pack_sequences").queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).size == 2, p)
  }
}
