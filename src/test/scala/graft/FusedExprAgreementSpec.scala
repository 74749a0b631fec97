package graft

import graft.expr.{CodebookScores, DotProduct, PlaneSignBits}
import graft.ops.Vec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The two round-5 fused kernels must agree with the composed expression
  * chains they replaced — per-cell struct scoring (CodebookScores vs
  * element_at + DotProduct + struct) and per-plane sign banding
  * (PlaneSignBits vs the when(dot > 0) bit sum) — in BOTH the codegen and
  * interpreted paths, on random and adversarial (null/mismatched) inputs.
  */
class FusedExprAgreementSpec extends SparkSpec {

  private def vecs(n: Int, seed: Long): Seq[Seq[Float]] =
    Gen
      .listOfN(n, Gen.listOfN(64, Gen.choose(-4.0f, 4.0f)))
      .pureApply(Gen.Parameters.default, Seed(seed))

  private def collectBoth(df: DataFrame): (Seq[Row], Seq[Row]) = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.collect().toSeq
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      (interp, df.collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("CodebookScores equals the composed element_at+dot+struct chain, both paths") {
    import spark.implicits._
    val k = 16
    val cents = vecs(k, 3L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val cb = cents
      .toDF("c_id", "c")
      .select($"c_id", $"c", Vec.dot($"c", $"c").as("cn2"))
      .groupBy()
      .agg(sort_array(collect_list(struct($"c_id", $"c", $"cn2"))).as("cb"))
    val e = vecs(50, 4L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding", Vec.dot($"embedding", $"embedding").as("n2"))
      .crossJoin(broadcast(cb))
    val composed = array((1 to k).map { i =>
      val ct = element_at(col("cb"), i)
      struct(
        (DotProduct(col("embedding"), ct.getField("c")) /
          (sqrt(col("n2")) * sqrt(ct.getField("cn2")))).as("ccos"),
        (-ct.getField("c_id")).as("nid"))
    }: _*)
    val df = e.select(
      $"vec_id",
      CodebookScores($"embedding", $"n2", $"cb").as("fused"),
      composed.as("ref"))
    val (interp, codegen) = collectBoth(df)
    (interp ++ codegen).foreach { r =>
      assert(r.getSeq[Row](1) == r.getSeq[Row](2), s"vec_id=${r.getLong(0)}")
    }
    assert(interp.map(_.toString).sorted == codegen.map(_.toString).sorted)
  }

  test("PlaneSignBits equals the per-bit when(dot > 0) sum, both paths") {
    import spark.implicits._
    val planes = graft.ops.DedupOps.rhPlanes
    val bits = 8
    val composed = array((0 until planes.length / bits).map { j =>
      (0 until bits)
        .map(k =>
          when(
            DotProduct(col("embedding"), typedLit(planes(bits * j + k))) > 0d,
            lit(1L << k)).otherwise(lit(0L)))
        .reduce(_ + _)
    }: _*)
    val df = vecs(80, 5L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(
        $"vec_id",
        PlaneSignBits($"embedding", typedLit(planes), bits).as("fused"),
        composed.as("ref"))
    val (interp, codegen) = collectBoth(df)
    (interp ++ codegen).foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"vec_id=${r.getLong(0)}")
    }
    assert(interp.map(_.toString) == codegen.map(_.toString))
  }

  test("TokenHashes/MinHashLanes/SimHashFold equal the HOF chains, both paths") {
    import graft.expr.{MinHashLanes, SimHashFold, TokenHashes}
    import graft.ops.Hashing
    import spark.implicits._
    // adversarial corpus: empty text, repeated/whitespace-heavy tokens,
    // unicode, plus generated ascii strings
    val texts = Seq(
      "",
      " ",
      "a a a",
      "the quick brown fox the lazy dog the",
      "tab\tinside one token",
      "café naïve 中文 tokens",
      "trailing space ") ++
      Gen
        .listOfN(60, Gen.asciiPrintableStr)
        .pureApply(Gen.Parameters.default, Seed(29L))
    val df0 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def h32c(t: org.apache.spark.sql.Column) = Hashing.h32(t)
    val refTh = array_sort(transform(array_distinct(split($"text", " ")), tk => h32c(tk)))
    val refHt = transform(split($"text", " "), tk => h32c(tk))
    val refLanes = array((0 until Hashing.NumHashes).map(j =>
      array_min(transform($"th", h =>
        pmod(lit(Hashing.mhA(j)) * h + lit(Hashing.mhB(j)), lit(Hashing.P))))): _*)
    val refSim = (0 until 16)
      .map(b =>
        when(
          aggregate($"th", lit(0L), (acc, x) => acc + (shiftright(x, b) % 2L) * 2L - 1L) > 0,
          lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    val df = df0
      .select(
        $"id",
        TokenHashes($"text", sortedDistinct = true).as("th"),
        refTh.as("refTh"),
        TokenHashes($"text", sortedDistinct = false).as("ht"),
        refHt.as("refHt"))
      .select(
        $"id",
        $"th",
        $"refTh",
        $"ht",
        $"refHt",
        MinHashLanes($"th").as("lanes"),
        refLanes.as("refLanes"),
        SimHashFold($"th", 16).as("sim"),
        refSim.as("refSim"))
    val (interp, codegen) = collectBoth(df)
    (interp ++ codegen).foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"th mismatch id=${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"ht mismatch id=${r.getLong(0)}")
      assert(r.getSeq[Long](5) == r.getSeq[Long](6), s"lanes mismatch id=${r.getLong(0)}")
      assert(r.getLong(7) == r.getLong(8), s"simhash mismatch id=${r.getLong(0)}")
    }
    assert(interp.map(_.toString) == codegen.map(_.toString))
  }

  test("ShingleHashes/BigramConcat/RollingFingerprint equal their chains, both paths") {
    import graft.expr.{BigramConcat, RollingFingerprint, ShingleHashes, TokenHashes}
    import graft.ops.Hashing.P
    import spark.implicits._
    // astral-plane + combining chars exercise the ascii()/length() corner
    // (code point of the first char; length in chars, not bytes)
    val texts = Seq(
      "",
      " ",
      "one",
      "one two",
      "a a a a a",
      "the quick brown fox jumps over the lazy dog",
      "café naïve 中文 字 tokens",
      "😀 astral 𝔘 chars",
      "trailing space ",
      "  double  spaces") ++
      Gen
        .listOfN(60, Gen.asciiPrintableStr)
        .pureApply(Gen.Parameters.default, Seed(31L))
    val df0 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def combine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      pmod(a * lit(131L) + b, lit(P))
    val refShingle = when(
      size($"ht") >= 3,
      array_sort(
        array_distinct(
          transform(
            sequence(lit(1), size($"ht") - 2),
            i =>
              combine(
                combine(element_at($"ht", i), element_at($"ht", i + 1)),
                element_at($"ht", i + 2))))))
      .otherwise(array(aggregate($"ht", lit(0L), (acc, h) => combine(acc, h))))
    val refBigrams =
      expr("transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i]))")
    val refFp = aggregate(
      split($"text", " "),
      lit(0L),
      (acc, t) => pmod(acc * 131L + (ascii(t) * 131 + length(t)).cast("bigint"), lit(P)))
    val df = df0
      .select(
        $"id",
        $"text",
        TokenHashes($"text", sortedDistinct = false).as("ht"),
        split($"text", " ").as("tk"))
      .select(
        $"id",
        ShingleHashes($"ht").as("sh"),
        refShingle.as("refSh"),
        // bigram contract holds for n >= 2 only (q_text_ngrams filters first)
        when(size($"tk") >= 2, BigramConcat($"tk")).as("bg"),
        when(size($"tk") >= 2, refBigrams).as("refBg"),
        RollingFingerprint($"text").as("fp"),
        refFp.as("refFp"))
    val (interp, codegen) = collectBoth(df)
    (interp ++ codegen).foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"shingles mismatch id=${r.getLong(0)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"bigrams mismatch id=${r.getLong(0)}")
      assert(r.getLong(5) == r.getLong(6), s"fingerprint mismatch id=${r.getLong(0)}")
    }
    assert(interp.map(_.toString) == codegen.map(_.toString))
  }

  test("BigramStats equals the composed bigram-multiplicity chain, both paths") {
    import graft.expr.BigramStats
    import spark.implicits._
    val texts = Seq(
      "",
      " ",
      "one",
      "one two",
      "a a a a a",
      "x y x y x y",
      "the quick brown fox jumps over the lazy dog",
      "café naïve 中文 字 tokens",
      "😀 astral 𝔘 chars",
      "trailing space ",
      "  double  spaces") ++
      Gen
        .listOfN(60, Gen.asciiPrintableStr)
        .pureApply(Gen.Parameters.default, Seed(37L))
    val df0 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val refBgs =
      expr("transform(sequence(1, size(tk) - 1), i -> concat(tk[i-1], ' ', tk[i]))")
    val df = df0
      .select($"id", split($"text", " ").as("tk"))
      .select(
        $"id",
        BigramStats($"tk").as("bs"),
        when(size($"tk") >= 2, refBgs)
          .otherwise(array().cast("array<string>"))
          .as("bgs"))
      .select(
        $"id",
        $"bs",
        array(
          size($"bgs").cast("long"),
          size(array_distinct($"bgs")).cast("long"),
          coalesce(
            array_max(transform($"bgs", b => size(filter($"bgs", x => x === b)))),
            lit(0)).cast("long")).as("refBs"))
    val (interp, codegen) = collectBoth(df)
    (interp ++ codegen).foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"bigram stats mismatch id=${r.getLong(0)}")
    }
    assert(interp.map(_.toString) == codegen.map(_.toString))
  }

  test("PlaneSignBits null/mismatch contract: zero bits, never null") {
    import spark.implicits._
    val planes = Seq(Seq(1f, 1f), Seq(-1f, 1f))
    val df = Seq(
      (0L, Some(Seq(2f, 1f))),   // dots: +3 > 0, -1 → band = 1
      (1L, None),                // null vec → 0
      (2L, Some(Seq(1f, 1f, 1f))) // length mismatch → 0
    ).toDF("vec_id", "embedding")
      .select($"vec_id", PlaneSignBits($"embedding", typedLit(planes), 2).as("b"))
    val (interp, codegen) = collectBoth(df)
    Seq(interp, codegen).foreach { rows =>
      assert(rows.map(r => (r.getLong(0), r.getSeq[Long](1))) ==
        Seq((0L, Seq(1L)), (1L, Seq(0L)), (2L, Seq(0L))))
    }
  }
}
