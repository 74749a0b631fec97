package graft

import graft.ops.TextOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ∀-grade gate on the interval-union islands kernel
  * ([[TextOps.intervalSpansOf]]) — the one machinery behind FOUR §2
  * surfaces (q_text_passage_spans, q_split_decontaminate, and both
  * ≥50-token min-match variants) — plus the min-match pipeline on top
  * of it. The constructed cases (PassageDupSpec / DecontaminateSpec /
  * PassageMinlenSpec) pin the semantics; this closes the spec-vs-∀
  * gap against brute-force scalar references:
  *
  *  - kernel: random variable-width interval sets per doc (positions
  *    from a tiny range so adjacency, full containment, equal starts,
  *    and chains are the NORM, not the tail) vs a scalar overlap-merge
  *    reference for the spans AND a per-token coverage BITMAP for the
  *    covered-token account (split-independent ground truth — the
  *    kernel's split-on-touch is coverage-neutral by construction) —
  *    with a carried extra column, the decontaminate shape;
  *  - min-match: random partially-shared gram position sets vs a
  *    scalar reference that recomputes shared → consecutive runs →
  *    ≥50-token keep → interval union from first principles.
  */
class IslandsPropertySpec extends SparkSpec {
  import spark.implicits._

  /** The kernel's declared island semantics, from first principles:
    * sort intervals by start and merge while the next START is ≤ the
    * running max END — true OVERLAP merges, an exactly-touching pair
    * (next start = prev end + 1) stays two spans. That split-on-touch
    * is the contract the DuckDB oracles replay (`pos > prev_max_end`),
    * and it is coverage-neutral: [[coveredCount]] pins that the spans
    * sum to the per-token bitmap regardless.
    */
  private def overlapMergeSpans(ivs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    if (ivs.isEmpty) Seq.empty
    else {
      val sorted = ivs.sorted
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (s, e) = sorted.head
      for ((p, q) <- sorted.tail) {
        if (p <= e) e = math.max(e, q)
        else { runs += ((s, e)); s = p; e = q }
      }
      runs += ((s, e))
      runs.map { case (a, b) => (a, b, b - a + 1) }.toSeq
    }
  }

  /** Per-token coverage bitmap cardinality — the order- and
    * split-independent ground truth for covered-token accounting.
    */
  private def coveredCount(ivs: Seq[(Long, Long)]): Long =
    ivs.flatMap { case (p, q) => p to q }.toSet.size.toLong

  test("interval-union kernel == coverage bitmap on 300 generated interval sets") {
    // per doc: n intervals with unique starts in 1..24 (dense → constant
    // overlap/adjacency/containment) and widths 1..12; 1-3 docs per
    // case, each carrying a per-doc extra column through the kernel
    val genCase: Gen[Seq[(Long, String, Long, Long)]] = for {
      ndocs <- Gen.choose(1, 3)
      docs <- Gen.sequence[Seq[Seq[(Long, String, Long, Long)]], Seq[(Long, String, Long, Long)]](
        (0 until ndocs).map { d =>
          for {
            starts <- Gen.someOf(1L to 24L)
            widths <- Gen.listOfN(starts.size, Gen.choose(1L, 12L))
          } yield starts.toSeq.zip(widths).map { case (p, w) =>
            (d.toLong, if (d % 2 == 0) "even" else "odd", p, p + w - 1)
          }
        })
    } yield docs.flatten

    val cases = Gen.listOfN(300, genCase)
      .pureApply(Gen.Parameters.default, Seed(13L))

    cases.zipWithIndex.foreach { case (ivs, ci) =>
      if (ivs.nonEmpty) {
        val df = ivs.toDF("doc_id", "tag", "pos", "pend")
        val got = TextOps.intervalSpansOf(df, Seq("tag"))
          .collect()
          .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
          .groupBy(_._1)
          .map { case (k, xs) => k -> xs.map(_._2).toSeq }
        val byDoc = ivs.groupBy(iv => (iv._1, iv._2))
        val want = byDoc.map { case (k, xs) =>
          k -> overlapMergeSpans(xs.map { case (_, _, p, q) => (p, q) })
        }
        assert(got === want, s"case $ci: intervals $ivs")
        // split-independent ground truth: spans sum to the bitmap count
        byDoc.foreach { case (k, xs) =>
          assert(got(k).map(_._3).sum ===
            coveredCount(xs.map { case (_, _, p, q) => (p, q) }),
            s"case $ci doc $k: covered-token account diverges from the bitmap")
        }
      }
    }
  }

  test("min-match pipeline == scalar reference on 150 generated shared-gram sets") {
    // doc 0 carries positions 1..N with gram g<pos>; a generated subset
    // is ALSO carried by doc 1 (making exactly those positions shared);
    // dense ranges make ≥46-position chains reachable, sparse ones make
    // near-boundary runs the norm
    val genCase: Gen[(Int, Seq[Long])] = for {
      n <- Gen.choose(40, 120)
      dropEvery <- Gen.choose(2, 60) // higher → denser shared set
      shared <- Gen.someOf(1L to n.toLong)
      dense <- Gen.oneOf(true, false)
    } yield (n, if (dense) (1L to n.toLong).filterNot(_ % dropEvery == 0) else shared.toSeq)

    val cases = Gen.listOfN(150, genCase)
      .pureApply(Gen.Parameters.default, Seed(17L))

    cases.zipWithIndex.foreach { case ((n, shared), ci) =>
      val sharedSet = shared.toSet
      val grams =
        (1L to n.toLong).map(p => (0L, p, s"g$p")) ++ shared.map(p => (1L, p, s"g$p"))
      val got = TextOps.passageMinlenSpansOf(grams.toDF("doc_id", "pos", "g5"))
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(_._2).toSeq }
      // scalar reference, per doc: consecutive runs of shared positions,
      // kept iff spanning >= 50 tokens as 5-gram chains, then the token
      // bitmap union of [rs, re+4]
      def reference(positions: Seq[Long]): Seq[(Long, Long, Long)] = {
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        positions.sorted.foreach { p =>
          if (runs.nonEmpty && runs.last._2 == p - 1)
            runs(runs.length - 1) = (runs.last._1, p)
          else runs += ((p, p))
        }
        val kept = runs.filter { case (a, b) => b - a + 5 >= 50 }
        overlapMergeSpans(kept.map { case (a, b) => (a, b + 4) }.toSeq)
      }
      val want = Seq(0L -> reference(sharedSet.toSeq), 1L -> reference(sharedSet.toSeq))
        .filter(_._2.nonEmpty).toMap
      assert(got === want, s"case $ci: n=$n shared=$shared")
    }
  }
}
