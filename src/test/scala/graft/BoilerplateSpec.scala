package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_text_boilerplate — CCNet-style cross-document boilerplate
  * detection. Planted-corpus semantics: a 3-shingle is boilerplate iff
  * it occurs in ≥ 3 DISTINCT documents (within-document repetition must
  * not count), the shared-chrome docs score exactly their chrome
  * shingles, a fully-unique doc scores 0, and the 2-doc/3-doc boundary
  * is exact. Plus the plan gate: one explode, hash aggregates, one
  * equi-join on the shingle key — no cartesian product.
  */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def stage(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_boiler").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries("q_text_boilerplate")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("chrome in >=3 docs is boilerplate; unique text is not; ratio exact") {
    val chrome = "copyright acme corp all rights reserved" // 6 tokens -> 4 internal shingles
    val out = run(stage(Seq(
      s"$chrome alpha beta gamma",
      s"$chrome delta epsilon zeta",
      s"$chrome eta theta iota",
      "completely unique document body nothing shared here at all")))
    // chrome docs: 9 tokens -> 7 shingles; the 4 chrome-internal
    // shingles are in 3 docs (boiler), the 3 chrome→tail bridge
    // shingles are unique per doc
    for (d <- 0L to 2L) {
      val (ns, nb, pct) = out(d)
      assert(ns === 7L && nb === 4L, s"doc $d: $ns/$nb")
      assert(pct === 4.0 / 7.0)
    }
    assert(out(3L) === ((7L, 0L, 0.0)), "unique doc must score zero")
  }

  test("the distinct-document threshold is exact at the 2-vs-3 boundary") {
    val two = "twodoc shared shingle"    // in exactly 2 docs
    val three = "threedoc shared shingle" // in exactly 3 docs
    val out = run(stage(Seq(
      s"$two a1 a2 a3",
      s"$two b1 b2 b3",
      s"$three c1 c2 c3",
      s"$three d1 d2 d3",
      s"$three e1 e2 e3")))
    assert(out(0L)._2 === 0L && out(1L)._2 === 0L,
      "a shingle in exactly 2 docs is below the threshold")
    for (d <- 2L to 4L)
      assert(out(d)._2 === 1L, s"doc $d: the 3-doc shingle is boilerplate")
  }

  test("within-document repetition does not reach the distinct-doc threshold") {
    val rep = "spam spam spam spam spam spam spam spam spam spam"
    val out = run(stage(Seq(rep, "unique one body", "unique two body")))
    // 'spam spam spam' occurs 8 times in doc 0 but in ONE document
    assert(out(0L)._2 === 0L, "multiplicity within one doc must not count")
  }

  test("plan shape: equi-join on the shingle key, no cartesian product") {
    val plan = SparkEntry.queries("q_text_boilerplate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.linesIterator.take(20).mkString("\n"))
  }

  private def runFrac(dir: String): Map[Long, (Long, Long, Double)] =
    SparkEntry.queries("q_text_boilerplate_frac")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("frac variant: below the fraction knee the scaled cut IS the fixed >=3 cut") {
    // 4 docs: ceil(4*2/1000) = 1 → max(3, 1) = 3 — q_text_boilerplate_frac
    // must agree byte-for-byte with q_text_boilerplate on small corpora
    val chrome = "copyright acme corp all rights reserved"
    val dir = stage(Seq(
      s"$chrome alpha beta gamma",
      s"$chrome delta epsilon zeta",
      s"$chrome eta theta iota",
      "completely unique document body nothing shared here at all"))
    assert(runFrac(dir) === run(dir))
  }

  test("frac variant: past the knee the cut scales and demotes small families") {
    // 1600 shingled docs → thr = max(3, ceil(1600*2/1000)) = max(3, 4) = 4:
    // a 3-doc family is boilerplate under the FIXED cut but NOT under the
    // scaled one; a 10-doc chrome family stays boilerplate under both
    val dir = Files.createTempDirectory("graft_boiler_frac").toString
    val filler = spark.range(1587).select(
      ($"id" + 100L).as("doc_id"),
      concat(lit("solo"), $"id", lit(" body"), $"id", lit(" text"), $"id")
        .as("text"),
      lit("en").as("lang"),
      lit("synthetic").as("source"),
      lit(20L).as("n_chars"))
    val fam3 = (0L until 3L).map(i =>
      (i, s"threefam shared shingle tail$i x$i", "en", "synthetic", 20L))
    val fam10 = (10L until 20L).map(i =>
      (i, s"tenfam common chrome tail$i y$i", "en", "synthetic", 20L))
    (fam3 ++ fam10).toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(filler)
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val fixed = run(dir)
    val frac = runFrac(dir)
    for (d <- 0L until 3L) {
      assert(fixed(d)._2 === 1L, s"doc $d: 3-doc family flags under the fixed cut")
      assert(frac(d)._2 === 0L, s"doc $d: 3-doc family must NOT flag under thr=4")
    }
    for (d <- 10L until 20L)
      assert(fixed(d)._2 === 1L && frac(d)._2 === 1L,
        s"doc $d: the 10-doc chrome flags under both cuts")
  }

  test("frac variant: a family EXACTLY at the scaled threshold flags (integer thr)") {
    // 1600 shingled docs → thr = max(3, ⌈1600·2/1000⌉) = 4 EXACTLY. A
    // 4-doc family must flag: nd = 4 ≥ thr = 4. Under Column double
    // division the expression (1600·2+999)/1000 evaluates to 4.199 and
    // 4 ≥ 4.199 is FALSE — the boundary family silently demotes, and
    // the sf0.01 oracle can't see it (its fraction sits under the
    // max(3,·) floor). This is the ADVICE-r12 exact-integer regression
    // gate.
    val dir = Files.createTempDirectory("graft_boiler_thr").toString
    val filler = spark.range(1596).select(
      ($"id" + 100L).as("doc_id"),
      concat(lit("solo"), $"id", lit(" body"), $"id", lit(" text"), $"id")
        .as("text"),
      lit("en").as("lang"),
      lit("synthetic").as("source"),
      lit(20L).as("n_chars"))
    val fam4 = (0L until 4L).map(i =>
      (i, s"fourfam boundary shingle tail$i z$i", "en", "synthetic", 20L))
    fam4.toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(filler)
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    val frac = runFrac(dir)
    for (d <- 0L until 4L)
      assert(frac(d)._2 === 1L,
        s"doc $d: nd=4 must flag at thr=4 — a 4.199 double threshold is the bug")
  }
}
