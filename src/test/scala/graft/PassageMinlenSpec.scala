package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_text_passage_dup50 / q_text_passage_spans50 — the corpus-scale
  * min-match-length passage contract (Lee et al. arXiv:2107.06499
  * deduplicate ≥ 50-token exact matches). Planted semantics: a chain of
  * ≥ 46 consecutive shared 5-gram positions (= a ≥ 50-token exact
  * match) flags; 49 tokens does NOT; an isolated common phrase NEVER
  * flags no matter how many documents carry it — the saturation
  * resistance the plain df ≥ 2 cut lacks; kept runs separated by a
  * sub-K position gap still merge into one reported span. Kernel-level
  * cases drive hand-crafted (doc_id, pos, g5) frames for exact boundary
  * control; end-to-end cases go through the registry query on staged
  * parquet.
  */
class PassageMinlenSpec extends SparkSpec {
  import spark.implicits._

  private def gramsOf(rows: Seq[(Long, Long, String)]) =
    rows.toDF("doc_id", "pos", "g5")

  /** Both docs carry the same gram string at the same positions — every
    * listed position is shared (df = 2).
    */
  private def sharedPair(positions: Seq[Long]): Seq[(Long, Long, String)] =
    for (d <- Seq(0L, 1L); p <- positions) yield (d, p, s"g$p")

  private def spansOf(rows: Seq[(Long, Long, String)]): Map[Long, Seq[(Long, Long, Long)]] =
    ops.TextOps.passageMinlenSpansOf(gramsOf(rows))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSeq }

  test("a 46-position chain (= 50-token match) flags; 45 (= 49) does not") {
    assert(spansOf(sharedPair(1L to 46L)).get(0L) === Some(Seq((1L, 50L, 50L))),
      "exactly 50 tokens is IN contract")
    assert(spansOf(sharedPair(1L to 45L)).isEmpty,
      "49 tokens is below the match floor")
  }

  test("a broken chain never flags even when total shared positions exceed the floor") {
    // 60 shared positions but no run longer than 30: every other block
    // of 30 positions has a hole after it
    val holes = (1L to 100L).filter(p => p % 31L != 0L).take(60)
    assert(spansOf(sharedPair(holes)).isEmpty,
      "consecutiveness, not total count, is the contract")
  }

  test("kept runs with a sub-K gap between them merge into ONE span") {
    // run A: positions 1..46 → tokens [1,50]; hole at 47; run B:
    // positions 48..93 → tokens [48,97]. Both kept (50 tokens each);
    // their token intervals overlap (48 ≤ 50) → one maximal span [1,97].
    val sp = spansOf(sharedPair((1L to 46L) ++ (48L to 93L)))
    assert(sp(0L) === Seq((1L, 97L, 97L)))
  }

  test("kept runs with a ≥K gap stay separate spans") {
    // run A: 1..46 → [1,50]; holes 47..51; run B: 52..97 → [52,101]:
    // 52 > 50 → two spans
    val sp = spansOf(sharedPair((1L to 46L) ++ (52L to 97L)))
    assert(sp(0L) === Seq((1L, 50L, 50L), (52L, 101L, 50L)))
  }

  test("a ubiquitous short phrase never flags — the saturation resistance") {
    // one gram shared by 50 documents (plus a doc-unique tail) — the df
    // cut would cover every doc; the chain contract covers none
    val rows = (0L until 50L).flatMap(d =>
      Seq((d, 1L, "common phrase gram here now"), (d, 7L, s"unique$d tail")))
    assert(spansOf(rows).isEmpty)
  }

  private def stage(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_passage50").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("end-to-end: a planted 50-token copy flags in both carriers; common chrome does not") {
    val passage = (1 to 50).map(i => s"pp$i").mkString(" ")
    val chrome = "all rights reserved by acme" // 5 tokens, in docs 2 & 3
    val dir = stage(Seq(
      s"$passage taila1 tailb1 tailc1 taild1 taile1",
      s"lead1 lead2 $passage taila2 tailb2 tailc2 taild2 taile2",
      s"unique1 unique2 unique3 unique4 unique5 unique6 $chrome",
      s"otherly distinct body words entirely $chrome"))
    val rep = SparkEntry.queries("q_text_passage_dup50")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rep(0L) === ((55L, 50L, 1L, 50.0 / 55.0)))
    assert(rep(1L) === ((57L, 50L, 1L, 50.0 / 57.0)))
    // chrome-only docs: the 5-gram is shared corpus-wide but chains for
    // only 1 position — dup_frac must be exactly 0 under the 50-token
    // contract (the plain cut reports them > 0)
    assert(rep(2L)._4 === 0.0 && rep(3L)._4 === 0.0)
    val plain = SparkEntry.queries("q_text_passage_dup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(plain(2L) > 0.0, "sanity: the df cut DOES flag the chrome doc")
    // spans surface: positions match the planted copies
    val sp = SparkEntry.queries("q_text_passage_spans50")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSeq }
    assert(sp(0L) === Seq((1L, 50L, 50L)))
    assert(sp(1L) === Seq((3L, 52L, 50L)))
    assert(!sp.contains(2L) && !sp.contains(3L))
  }

  test("scrub: the planted copy is deleted from both carriers, everything else survives verbatim") {
    val passage = (1 to 50).map(i => s"pp$i").mkString(" ")
    val dir = stage(Seq(
      s"$passage ta1 ta2 ta3 ta4 ta5",
      s"lead1 lead2 $passage tb1 tb2 tb3 tb4 tb5",
      "short doc", // 2 tokens: below K, no gram — must pass through untouched
      passage)) // the WHOLE doc is the copy → empty clean_text, still a row
    val got = SparkEntry.queries("q_text_scrub50")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(0L) === (("ta1 ta2 ta3 ta4 ta5", 55L, 50L)))
    assert(got(1L) === (("lead1 lead2 tb1 tb2 tb3 tb4 tb5", 57L, 50L)))
    assert(got(2L) === (("short doc", 2L, 0L)),
      "a sub-K document must survive byte-identical")
    assert(got(3L) === (("", 50L, 50L)),
      "a fully-copied document emits an empty row, not a dropped one")
    // account consistency: n_removed ≡ the dup50 report's n_covered
    val rep = SparkEntry.queries("q_text_passage_dup50")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.view.filterKeys(rep.contains).mapValues(_._3).toMap ===
      rep.filter { case (d, _) => got.contains(d) })
  }

  test("scrub plan shape: the token pass is within-row — no posexplode, no token-level shuffle") {
    val df = SparkEntry.queries("q_text_scrub50")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // the text side must never explode into per-token rows: the only
    // Generate (explode) nodes allowed are the gram ladder's, which are
    // fed by the SPAN side; the clean_text projection is higher-order
    // functions over the intact tk array
    assert(plan.contains("array_join") && plan.contains("transform"),
      "clean_text must be computed by within-row higher-order functions")
  }

  test("plan shape: equi-joins only, no cartesian product") {
    for (q <- Seq("q_text_passage_dup50", "q_text_passage_spans50")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$q:\n" + plan.linesIterator.take(20).mkString("\n"))
    }
  }
}
