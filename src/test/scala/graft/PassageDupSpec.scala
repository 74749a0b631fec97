package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_text_passage_dup — cross-document exact-passage duplication
  * coverage (the Lee-et-al suffix-array scrub as a window statistic).
  * Planted-corpus semantics: a token 5-gram in ≥ 2 DISTINCT docs marks a
  * shared passage; a doc's report is the interval UNION of its shared
  * occurrences — overlapping grams merge into one span, disjoint
  * passages count separate spans, within-document repetition alone
  * never counts, and sub-5-token docs are out of scope. Plus the plan
  * gate: the shared⋈occurrence join is an equi-join, no cartesian.
  */
class PassageDupSpec extends SparkSpec {
  import spark.implicits._

  private def stage(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_passage").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[Long, (Long, Long, Long, Double)] =
    SparkEntry.queries("q_text_passage_dup")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap

  private val P = (1 to 8).map(i => s"pp$i").mkString(" ") // 8-token passage

  test("a shared 8-token passage covers exactly its span in both carriers") {
    val out = run(stage(Seq(
      s"$P aa1 aa2 aa3",        // passage at positions 1-8 of 11 tokens
      s"bb1 bb2 $P cc1",        // passage at positions 3-10 of 11 tokens
      "totally distinct words here nothing shared with anyone else")))
    // 4 pure-passage 5-grams; their interval union is the 8-token span
    assert(out(0L) === ((11L, 8L, 1L, 8.0 / 11.0)))
    assert(out(1L) === ((11L, 8L, 1L, 8.0 / 11.0)))
    assert(out(2L) === ((9L, 0L, 0L, 0.0)), "unique doc scores zero")
  }

  test("within-document repetition alone never counts as shared") {
    val rep = (1 to 5).map(i => s"rr$i").mkString(" ")
    val out = run(stage(Seq(
      s"$rep $rep", // the same 5-gram occurs twice — in ONE document
      "unique filler document body words",
      "another unique document filler body")))
    assert(out(0L)._2 === 0L, "distinct-doc frequency, not occurrence count")
  }

  test("documents with fewer than 5 tokens are out of scope by contract") {
    val out = run(stage(Seq("a b c d", s"$P x1", s"$P y1")))
    assert(!out.contains(0L))
    assert(out(1L)._2 === 8L && out(2L)._2 === 8L)
  }

  test("identical documents are fully covered: dup_frac exactly 1.0") {
    val six = "s1 s2 s3 s4 s5 s6"
    val out = run(stage(Seq(six, six, "some other unique words entirely")))
    assert(out(0L) === ((6L, 6L, 1L, 1.0)))
    assert(out(1L) === ((6L, 6L, 1L, 1.0)))
  }

  test("disjoint shared passages count separate spans; the gap stays uncovered") {
    val Q = (1 to 5).map(i => s"qq$i").mkString(" ")
    val R = (1 to 5).map(i => s"zz$i").mkString(" ")
    val out = run(stage(Seq(
      s"$Q gap1 gap2 gap3 $R", // Q at 1-5, R at 9-13 of 13 tokens
      s"$Q other tail words here",
      s"lead words before $R end")))
    val (nt, nc, ns, frac) = out(0L)
    assert(nt === 13L && nc === 10L && ns === 2L)
    assert(frac === 10.0 / 13.0)
  }

  private def spans(dir: String): Map[Long, Seq[(Long, Long, Long)]] =
    SparkEntry.queries("q_text_passage_spans")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSeq }

  test("q_text_passage_spans emits exactly the maximal spans the report accounts") {
    val Q = (1 to 5).map(i => s"qq$i").mkString(" ")
    val R = (1 to 5).map(i => s"zz$i").mkString(" ")
    val dir = stage(Seq(
      s"$Q gap1 gap2 gap3 $R",
      s"$Q other tail words here",
      s"lead words before $R end",
      "totally unique body with no shared content at all"))
    val sp = spans(dir)
    // doc 0: two maximal spans with the 3-token gap between them
    assert(sp(0L) === Seq((1L, 5L, 5L), (9L, 13L, 5L)))
    assert(sp(1L) === Seq((1L, 5L, 5L)))
    assert(sp(2L) === Seq((4L, 8L, 5L)))
    assert(!sp.contains(3L), "a doc with no shared passage emits no span rows")
    // account identity: the report's n_covered/n_spans are this frame's
    // per-doc sums — one islands computation, two surfaces
    val rep = run(dir)
    sp.foreach { case (d, xs) =>
      assert(rep(d)._2 === xs.map(_._3).sum, s"doc $d covered mismatch")
      assert(rep(d)._3 === xs.size.toLong, s"doc $d span-count mismatch")
    }
  }

  test("plan shape: equi-join on the gram key, no cartesian product") {
    val plan = SparkEntry.queries("q_text_passage_dup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(20).mkString("\n"))
  }
}
