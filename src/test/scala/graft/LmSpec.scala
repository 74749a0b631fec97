package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The unigram-LM quality family (q_lm_unigram / q_lm_score /
  * q_lm_bucket — CCNet's filtering role, Wenzek et al. arXiv:1911.00359,
  * under the house no-transcendentals rule: mean inverse relative
  * frequency instead of log-perplexity). Hand-computable corpora pin the
  * model probabilities, the tokenizer contract, the score ladder
  * (per-token r6, decimal sum, one IEEE division), unscorable-doc
  * totality, and the tercile assignment with its doc_id tie-break.
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private def stage(rows: Seq[(String, String)]): String = {
    val dir = Files.createTempDirectory("graft_lm").toString
    rows.zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l, "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  // the portable rounding ladder, replicated for expectations
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  // aaa: cf 5, bbb: cf 3, ccc: cf 1, N = 9; doc 2 has no model token
  // (zz is 2 chars, ! is punctuation); doc 3 exercises lowercasing
  private lazy val dir = stage(Seq(
    ("aaa aaa aaa bbb", "en"),
    ("aaa bbb ccc", "en"),
    ("zz !", "en"),
    ("AAA Bbb", "en")))

  test("q_lm_unigram: exact counts, N, and fixed-point MLE probabilities") {
    val got = SparkEntry.queries("q_lm_unigram")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      ("aaa", 5L, 9L, r6(5.0 / 9.0)),
      ("bbb", 3L, 9L, r6(3.0 / 9.0)),
      ("ccc", 1L, 9L, r6(1.0 / 9.0))))
  }

  test("q_lm_score: per-doc mean rarity via the decimal ladder; zero-token docs stay total") {
    val got = SparkEntry.queries("q_lm_score")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    // rarities: aaa → r6(9/5) = 1.8, bbb → 3.0, ccc → 9.0; the engine
    // sums them EXACTLY in decimal(38,6), so expectations use the exact
    // decimal total as a literal (3·1.8 + 3 = 8.4 etc.), not chained
    // double additions whose intermediate rounding could drift an ulp
    assert(got(0L) === ((4L, Some(r6(8.4 / 4)))), "3·aaa + bbb over 4")
    assert(got(1L) === ((3L, Some(r6(13.8 / 3)))), "aaa + bbb + ccc over 3")
    assert(got(2L) === ((0L, None)), "unscorable doc: a row with n_tokens=0, NULL score")
    assert(got(3L) === ((2L, Some(r6(4.8 / 2)))), "lowercased aaa + bbb over 2")
  }

  test("q_lm_bucket: per-language terciles, commonest language = bucket 1, unscorable excluded") {
    val got = SparkEntry.queries("q_lm_bucket")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    // rarity order: doc0 2.1 < doc3 2.4 < doc1 4.6 → buckets 1,2,3
    assert(got === Array((0L, "en", 1L), (1L, "en", 3L), (3L, "en", 2L)))
  }

  test("bucket ties break by doc_id; languages bucket independently") {
    // four identical en docs (all tie) + one fr doc: en ntile(3) over the
    // tie order (doc_id) gives 1,1,2,3; fr's single doc is its bucket 1
    val d2 = stage(Seq(
      ("tok1 tok2", "en"), ("tok1 tok2", "en"),
      ("tok1 tok2", "en"), ("tok1 tok2", "en"),
      ("tok1 tok2", "fr")))
    val got = SparkEntry.queries("q_lm_bucket")(spark, d2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(got === Array(
      (0L, "en", 1L), (1L, "en", 1L), (2L, "en", 2L), (3L, "en", 3L),
      (4L, "fr", 1L)))
  }

  // bigram corpus: cf2(aaa,bbb)=3 (one via a DROPPED token bridge),
  // cf2(bbb,aaa)=1, cf2(aaa,ccc)=1; cfl(aaa)=4, cfl(bbb)=1
  private lazy val bdir = stage(Seq(
    ("aaa bbb aaa bbb", "en"),
    ("aaa ccc", "en"),
    ("aaa zz bbb", "en"), // zz is sub-3-chars: dropped, aaa-bbb still pair
    ("solo", "en")))      // one model token: no bigram, stays total

  test("q_lm_bigram: exact pair counts, left-context totals, conditional p6; filter-then-pair") {
    val got = SparkEntry.queries("q_lm_bigram")(spark, bdir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got === Array(
      ("aaa", "bbb", 3L, 4L, r6(3.0 / 4.0)),
      ("aaa", "ccc", 1L, 4L, r6(1.0 / 4.0)),
      ("bbb", "aaa", 1L, 1L, r6(1.0 / 1.0))),
      "a dropped sub-3-char token must BRIDGE its neighbors, not break the pair")
  }

  test("q_lm_bigram_score: per-doc mean inverse conditional frequency; sub-2-token docs stay total") {
    val got = SparkEntry.queries("q_lm_bigram_score")(spark, bdir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    // rarities: (aaa,bbb) → r6(4/3), (bbb,aaa) → 1.0, (aaa,ccc) → 4.0;
    // exact decimal sums as literals (2·1.333333 + 1 = 3.666666)
    assert(got(0L) === ((3L, Some(r6(3.666666 / 3)))))
    assert(got(1L) === ((1L, Some(r6(4.0 / 1)))))
    assert(got(2L) === ((1L, Some(r6(1.333333 / 1)))))
    assert(got(3L) === ((0L, None)), "a one-token doc emits n_bigrams=0, NULL")
  }

  test("q_lm_apply: train-only model, OOV accounted, eval rows stay total") {
    // every doc = "shared common token{i}": the per-doc token is OOV for
    // every eval doc (it never occurs in train), the two common tokens
    // are in-vocab with cf = |train| each, N = 3·|train|
    val n = 50
    val dir = stage((0 until n).map(i => (s"shared common token$i", "en")))
    // replicate the split ladder to partition ids the way the engine does
    val buckets = spark.range(n)
      .select($"id", pmod(ops.Hashing.h32($"id".cast("string")), lit(100L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainIds = buckets.filter(_._2 < 80).keySet
    val evalIds = buckets.keySet -- trainIds
    assert(trainIds.nonEmpty && evalIds.nonEmpty, "fixture must split both ways")
    val nTrain = trainIds.size.toLong
    val r = r6((3.0 * nTrain) / nTrain) // = 3.0: rarity of each common token
    val got = SparkEntry.queries("q_lm_apply")(spark, dir)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) None else Some(x.getDouble(4)))))
      .toMap
    assert(got.keySet === evalIds, "exactly the eval docs are scored")
    for ((id, (split, nt, oov, sc)) <- got) {
      assert(split === (if (buckets(id) < 90) "valid" else "test"))
      assert(nt === 3L && oov === 1L, s"doc $id: the per-doc token must be OOV")
      // sum = 2r in exact decimal, / 2 in-vocab tokens = r
      assert(sc === Some(r6(2 * r / 2)), s"doc $id")
    }
  }

  test("score direction: a rare-token doc outranks a common-token doc (the filter's premise)") {
    val sc = SparkEntry.queries("q_lm_score")(spark, dir)
      .collect().filterNot(_.isNullAt(2))
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(sc(1L) > sc(0L), "doc with the hapax scores rarer than the common-token doc")
  }

  test("q_lm_interp: planted corpus matches the hand-computed mixture, and " +
    "the back-off keeps every pair finite where the MLE table has no mass") {
    import spark.implicits._
    // corpus "aaa bbb" / "aaa ccc" / "aaa": cf2 = 1 each, cfl(aaa) = 2,
    // cf1 = {aaa: 3, bbb: 1, ccc: 1}, L = 5 →
    // p(bbb|aaa) = 0.7·(1/2) + 0.3·(1/5) = (7·1·5 + 3·1·2)/(10·2·5)
    // = 41/100 = 0.41 (ccc symmetric); one bigram per doc, so
    // interp6 = 0.410000 exactly
    val planted = Seq(
      (1L, "aaa bbb"),
      (2L, "aaa ccc"),
      (3L, "aaa")) // < 2 model tokens → NULL score, row kept
      .toDF("doc_id", "text")
    val got = ops.LmOps.lmInterpOf(planted).collect()
    assert(got.length === 3)
    assert(got(0).getLong(1) == 1L && got(0).getDouble(2) == 0.41)
    assert(got(1).getLong(1) == 1L && got(1).getDouble(2) == 0.41)
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(2))
  }

  test("q_lm_kn: planted corpus matches the hand-computed Kneser-Ney mixture, " +
    "and the discounted mass re-normalizes exactly on a closed context") {
    import spark.implicits._
    // corpus "aaa bbb" / "ccc bbb" / 2×"ccc ddd":
    // cf2 = {(aaa,bbb):1, (ccc,bbb):1, (ccc,ddd):2}, cfl = {aaa:1, ccc:3},
    // n1 = {aaa:1, ccc:2}, ncont = {bbb:2, ddd:1}, npairs = 3 →
    //   p(bbb|aaa) = ((4−3)·3 + 3·1·2)/(4·1·3)  = 9/12  = 0.75
    //   p(bbb|ccc) = ((4−3)·3 + 3·2·2)/(4·3·3)  = 15/36 → 0.416667
    //   p(ddd|ccc) = ((8−3)·3 + 3·2·1)/(4·3·3)  = 21/36 → 0.583333
    // (and Σ p(·|ccc) = 36/36: the D = 3/4 discount's freed mass returns
    // exactly through the continuation back-off — the KN invariant)
    val planted = Seq(
      (1L, "aaa bbb"),
      (2L, "ccc bbb"),
      (3L, "ccc ddd"),
      (4L, "ccc ddd"),
      (5L, "aaa")) // < 2 model tokens → NULL score, row kept
      .toDF("doc_id", "text")
    val got = ops.LmOps.lmKnOf(planted).collect()
    assert(got.length === 5)
    assert(got(0).getLong(1) == 1L && got(0).getDouble(2) == 0.75)
    assert(got(1).getLong(1) == 1L && got(1).getDouble(2) == 0.416667)
    assert(got(2).getLong(1) == 1L && got(2).getDouble(2) == 0.583333)
    assert(got(3).getLong(1) == 1L && got(3).getDouble(2) == 0.583333)
    assert(got(4).getLong(1) == 0L && got(4).isNullAt(2))
  }

  test("langTerciles ≡ the window ntile formulation on generated skewed corpora") {
    // the two-pass distributed rank must be ROW-IDENTICAL to
    // ntile(3) over (partition by lang order by rarity6, doc_id) — the
    // formulation it replaces for scale — across language skew (90 %+
    // one lang), heavy rarity ties, languages with n < 3, and empty
    // slices from range boundaries
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 30) {
      val langs = Seq("en", "fr", "de", "sw").take(1 + rnd.nextInt(4))
      val n = 1 + rnd.nextInt(200)
      val rows = (0 until n).map { i =>
        // Zipf-ish lang choice: index 0 dominates
        val lang = langs(math.min(langs.size - 1, (math.abs(rnd.nextGaussian()) * 0.8).toInt))
        // coarse rarity grid forces cross-partition ties
        (i.toLong, lang, (rnd.nextInt(5) + 1) / 2.0)
      }
      val scored = rows.toDF("doc_id", "lang", "rarity6")
      val w = Window.partitionBy($"lang").orderBy($"rarity6", $"doc_id")
      val want = scored
        .select($"doc_id", $"lang", $"rarity6",
          ntile(3).over(w).cast("long").as("bucket"))
        .collect().map(_.toString).sorted.toSeq
      val got = ops.LmOps.langTerciles(scored)
        .collect().map(_.toString).sorted.toSeq
      assert(got === want, s"trial $trial (n=$n, langs=$langs)")
    }
  }

  test("q_lm_bucket plan: no per-language window over the full scored frame") {
    // the round-13 scale defect was ntile(3) over partitionBy(lang) —
    // one task sorts an entire language. The replacement may only use
    // single-column lang windows over AGGREGATED (P×|langs|) inputs; any
    // window over raw scored rows must partition by (pid, lang), whose
    // size is bounded by the range slice
    import org.apache.spark.sql.catalyst.plans.logical
    val plan = SparkEntry.queries("q_lm_bucket")(spark, dir)
      .queryExecution.optimizedPlan
    val wins = plan.collect { case w: logical.Window => w }
    assert(wins.nonEmpty, "expected window nodes in the bucket plan")
    for (w <- wins if w.partitionSpec.size == 1) {
      val aggregated =
        w.child.collectFirst { case a: logical.Aggregate => a }.isDefined
      assert(aggregated,
        s"single-column window over a non-aggregated input: ${w.partitionSpec}")
    }
  }

  test("range partitioning balances a 90%-one-language corpus (the shape the window lacked)") {
    // directly pins the load-balance claim: with 9 of 10 docs in one
    // language, partitioning by the RANK KEY spreads the hot language
    // over many partitions, where partitionBy(lang) would put it in one
    val n = 2000
    val scored = (0 until n)
      .map(i => (i.toLong, if (i % 10 == 0) "fr" else "en", (i % 7) / 2.0))
      .toDF("doc_id", "lang", "rarity6")
    val parts = 16
    val sizes = scored
      .repartitionByRange(parts, $"lang", $"rarity6", $"doc_id")
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .groupBy($"pid").count().collect().map(_.getLong(1))
    assert(sizes.length > 1, "hot language must span multiple partitions")
    assert(sizes.max <= 2L * n / parts,
      s"range partitions must stay balanced, got ${sizes.mkString(",")}")
  }

  // two-language corpus: en as in `dir`, plus fr docs sharing the same
  // SURFACE tokens — under per-language models fr's counts are its own
  private lazy val dirLang = stage(Seq(
    ("aaa aaa aaa bbb", "en"),
    ("aaa bbb ccc", "en"),
    ("zz !", "en"),
    ("AAA Bbb", "en"),
    ("aaa ddd", "fr"),
    ("aaa aaa", "fr")))

  test("q_lm_unigram_lang: per-language counts and totals, self-contained per language") {
    val got = SparkEntry.queries("q_lm_unigram_lang")(spark, dirLang)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // en: aaa 5, bbb 3, ccc 1 over N=9 — IDENTICAL to the single-lang
    // fixture even though fr adds three more aaa; fr: aaa 3, ddd 1, N=4
    assert(got.toSet === Set(
      ("en", "aaa", 5L, 9L, r6(5.0 / 9.0)),
      ("en", "bbb", 3L, 9L, r6(3.0 / 9.0)),
      ("en", "ccc", 1L, 9L, r6(1.0 / 9.0)),
      ("fr", "aaa", 3L, 4L, r6(3.0 / 4.0)),
      ("fr", "ddd", 1L, 4L, r6(1.0 / 4.0))))
  }

  test("q_lm_score_lang: a doc scores only against its own language's model") {
    val got = SparkEntry.queries("q_lm_score_lang")(spark, dirLang)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    // en docs: byte-identical to the single-language fixture's q_lm_score
    assert(got(0L) === (("en", 4L, Some(r6(8.4 / 4)))))
    assert(got(1L) === (("en", 3L, Some(r6(13.8 / 3)))))
    assert(got(2L) === (("en", 0L, None)))
    assert(got(3L) === (("en", 2L, Some(r6(4.8 / 2)))))
    // fr: rarity(aaa) = r6(4/3), rarity(ddd) = 4.0 — from fr counts only
    assert(got(4L) === (("fr", 2L, Some(r6((r6(4.0 / 3) + 4.0) / 2)))))
    assert(got(5L) === (("fr", 2L, Some(r6(4.0 / 3)))))
  }

  test("per-language isolation: fr scores invariant under any change to the en sub-corpus") {
    val base = Seq(("aaa ddd", "fr"), ("aaa aaa", "fr"))
    val d1 = stage(Seq(("aaa bbb", "en")) ++ base)
    val d2 = stage(Seq(("xxx yyy zzz xxx", "en"), ("aaa aaa aaa", "en")) ++ base)
    def fr(d: String): Seq[String] =
      SparkEntry.queries("q_lm_score_lang")(spark, d)
        .filter($"lang" === "fr")
        .drop("doc_id") // fixture doc_ids shift with the en row count
        .collect().map(_.toString).toSeq
    assert(fr(d1) === fr(d2),
      "per-language scoring must not see other languages' counts")
    // ...which is exactly what the corpus-global q_lm_score cannot offer
    def frGlobal(d: String): Seq[String] =
      SparkEntry.queries("q_lm_score")(spark, d)
        .join(T(spark, d, "documents").select($"doc_id", $"lang"), Seq("doc_id"))
        .filter($"lang" === "fr")
        .drop("doc_id")
        .collect().map(_.toString).toSeq
    assert(frGlobal(d1) !== frGlobal(d2),
      "the global model's fr scores move with the en corpus — the gap the _lang family closes")
  }

  test("q_lm_bigram_apply: train-only pair model, per-pair OOV, eval rows stay total") {
    // every doc = "shared common token{i}": pairs are (shared, common) —
    // in-vocab for eval docs, cf2 = cfl = |train| so r = 1.0 — and
    // (common, token{i}) — OOV for eval docs (train never saw the pair)
    val n = 50
    val dir = stage((0 until n).map(i => (s"shared common token$i", "en")))
    val buckets = spark.range(n)
      .select($"id", pmod(ops.Hashing.h32($"id".cast("string")), lit(100L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalIds = buckets.filter(_._2 >= 80).keySet
    assert(evalIds.nonEmpty && evalIds.size < n, "fixture must split both ways")
    val got = SparkEntry.queries("q_lm_bigram_apply")(spark, dir)
      .collect()
      .map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3),
          if (x.isNullAt(4)) None else Some(x.getDouble(4)))))
      .toMap
    assert(got.keySet === evalIds, "exactly the eval docs are scored")
    for ((id, (split, nb, oov, sc)) <- got) {
      assert(split === (if (buckets(id) < 90) "valid" else "test"))
      assert(nb === 2L && oov === 1L, s"doc $id: (common, token$id) must be OOV")
      assert(sc === Some(1.0), s"doc $id: the surviving pair scores cfl/cf2 = 1")
    }
  }
}
