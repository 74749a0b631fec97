package graft

import graft.ops.RelationalOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ∀-grade gate on the SymSpell deletion-neighborhood fuzzy join
  * ([[RelationalOps.fuzzyPairsOf]]): over generated vocabularies the
  * verified pair set must equal brute-force `editDistance ≤ 1` over all
  * O(n²) pairs. The generator is deliberately adversarial for the
  * blocking scheme: a 2-letter alphabet with lengths 0–5, so
  * deletion-variant COLLISIONS between distance-2 strings (the false
  * positives the exact filter must remove) are everywhere, plus empty
  * strings (the sequence(0,-1) parity trap), exact duplicates, and a
  * multi-byte character ('é') to pin char-not-byte substring semantics.
  * FuzzyJoinSpec proves the same identity once on the real corpus; this
  * closes the ∀ gap.
  */
class FuzzyPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Levenshtein (full DP, no cutoffs). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("SymSpell pairs == brute-force edit distance on 200 generated vocabularies") {
    val word = Gen.choose(0, 5).flatMap(l =>
      Gen.listOfN(l, Gen.oneOf('a', 'b', 'é')).map(_.mkString))
    val genVocab = Gen.choose(2, 25).flatMap(n => Gen.listOfN(n, word))
    val vocabs = Gen.listOfN(200, genVocab)
      .pureApply(Gen.Parameters.default, Seed(29L))

    vocabs.zipWithIndex.foreach { case (words, ci) =>
      val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, 0, w) }
      val df = rows.toDF("c_custkey", "c_nationkey", "c_name")
      val got = RelationalOps.fuzzyPairsOf(df)
        .select($"k_a", $"k_b")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val want = (for {
        a <- rows
        b <- rows
        if a._1 < b._1 && lev(a._3, b._3) <= 1
      } yield (a._1, b._1)).toSet
      assert(got === want, s"vocabulary #$ci diverged: $words")
    }
  }
}
