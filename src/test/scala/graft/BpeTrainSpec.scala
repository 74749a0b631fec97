package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Pins q_bpe_train's two moving parts beyond the DuckDB oracle:
  * the greedy non-overlapping merge fold on adversarial tokenizations
  * the corpus can't be counted on to contain (overlapping pairs,
  * multi-char merge sides, boundary positions), and the full multi-round
  * loop against an INDEPENDENT driver-side reference implementation of
  * BPE training (plain Scala maps — no Spark, no SQL), so a bug shared
  * by the Spark and DuckDB formulations of the fold would still be
  * caught.
  */
class BpeTrainSpec extends SparkSpec {

  private def foldOne(w: String, pa: String, pb: String): String = {
    import spark.implicits._
    Seq(w)
      .toDF("w")
      .select(TextOps.bpeMergeFold($"w", lit(pa), lit(pb)).as("m"))
      .head()
      .getString(0)
  }

  test("merge fold: greedy left-to-right, non-overlapping") {
    // classic overlap: only the leftmost pair of "a a a" merges
    assert(foldOne("a a a", "a", "a") == "aa a")
    assert(foldOne("a a a a", "a", "a") == "aa aa")
    assert(foldOne("a a a a a", "a", "a") == "aa aa a")
    // merge at start, middle, end
    assert(foldOne("a b c", "a", "b") == "ab c")
    assert(foldOne("c a b", "a", "b") == "c ab")
    assert(foldOne("c a b d a b", "a", "b") == "c ab d ab")
    // no occurrence: unchanged
    assert(foldOne("a c b", "a", "b") == "a c b")
    // single token: no pair to merge
    assert(foldOne("a", "a", "a") == "a")
  }

  test("merge fold: multi-char sides and lookalike suffixes") {
    // multi-char pa from an earlier round
    assert(foldOne("ab c d", "ab", "c") == "abc d")
    assert(foldOne("x ab ab y", "ab", "ab") == "x abab y")
    // last token ENDS with pa but is not pa: must not merge
    assert(foldOne("xab c", "ab", "c") == "xab c")
    // pb matches but the preceding token differs: must not merge
    assert(foldOne("b c a c", "a", "c") == "b c ac")
    // a just-merged tail must not cascade within the pass
    assert(foldOne("a ab b", "a", "ab") == "aab b")
  }

  /** Reference BPE trainer: [[BpeReference.train]] (plain Scala, no
    * Spark) — shared with ScaleSpec's 64-round depth test.
    */
  private def referenceBpe(
      hist: Map[String, Long],
      rounds: Int): Seq[(Int, String, String, Long)] =
    BpeReference.train(hist, rounds)

  test("4-round merge table equals an independent driver-side BPE trainer") {
    import spark.implicits._
    val hist = T(spark, sf, "documents")
      .select(explode(split(lower($"text"), " ")).as("term"))
      .filter($"term".rlike("^[a-z0-9]{3,}$"))
      .groupBy($"term")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = referenceBpe(hist, TextOps.BpeRounds)
    val got = SparkEntry
      .queries("q_bpe_train")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("encode applies the trained vocab: per-doc counts match the reference") {
    import spark.implicits._
    // reference: train on the histogram, tokenize each word driver-side,
    // then account per document over the same filtered token stream
    val toks = T(spark, sf, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .filter($"term".rlike("^[a-z0-9]{3,}$"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val hist = toks.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val merges = referenceBpe(hist, TextOps.BpeRounds)
    val vocabTok: Map[String, Int] = hist.keys.map { t =>
      var tl = t.map(_.toString).toList
      for ((_, pair, merged, _) <- merges) {
        val Array(pa, pb) = pair.split(" ", 2)
        val out = collection.mutable.ListBuffer.empty[String]
        for (x <- tl) {
          if (out.nonEmpty && out.last == pa && x == pb)
            out(out.size - 1) = merged
          else out += x
        }
        tl = out.toList
      }
      t -> tl.size
    }.toMap
    val want = toks
      .groupBy(_._1)
      .map { case (doc, xs) =>
        (doc, xs.length.toLong,
          xs.map(x => vocabTok(x._2).toLong).sum,
          xs.map(_._2.length.toLong).sum)
      }
      .toSeq
      .sortBy(_._1)
    val got = SparkEntry
      .queries("q_bpe_encode")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // and BPE actually compresses: tokens strictly below characters
    assert(got.forall { case (_, _, tok, ch) => tok < ch })
  }

  test("training touches the corpus once: file-scan stage budget") {
    // Each round's lazy lineage would re-derive every earlier round
    // INCLUDING the corpus scan (the naive plan held 15 parquet scans for
    // 4 rounds); the lineage-severed design must scan the file in exactly
    // one stage — the histogram build — with every later round running on
    // the checkpointed vocabulary-sized state.
    val group = s"bpe-scan-budget-${System.nanoTime()}"
    val scanStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageInfos.foreach(si =>
            if (si.rddInfos.exists(_.name.contains("FileScan")))
              scanStages.add(si.stageId))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "bpe scan budget")
      try SparkEntry.queries("q_bpe_train")(spark, sf).collect()
      finally spark.sparkContext.clearJobGroup()
      org.apache.spark.graftaccess.ListenerDrain.drain(spark.sparkContext, 60000)
      val n = {
        import scala.jdk.CollectionConverters._
        scanStages.iterator().asScala.size
      }
      assert(n > 0, "listener captured nothing — scoping broke")
      assert(n <= 2, s"file-scan stages across the training run: $n (budget 2)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("merge fold: property — agrees with the reference on random tokenizations") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random tokenizations over a tiny alphabet (maximizes adjacent-pair
    // collisions) and random single/multi-char merge sides, including
    // lookalike suffixes — one DataFrame pass for all cases
    val tok = Gen.oneOf("a", "b", "c", "ab", "bc", "xab")
    val cases = Gen
      .listOfN(
        300,
        Gen.zip(
          Gen.nonEmptyListOf(tok).map(_.take(12)),
          Gen.zip(tok, tok)))
      .pureApply(Gen.Parameters.default, Seed(11L))
      .map { case (toks, (pa, pb)) => (toks.mkString(" "), pa, pb) }
    def refFold(w: String, pa: String, pb: String): String = {
      val out = collection.mutable.ListBuffer.empty[String]
      for (t <- w.split(" ")) {
        if (out.nonEmpty && out.last == pa && t == pb)
          out(out.size - 1) = pa + pb
        else out += t
      }
      out.mkString(" ")
    }
    val got = cases
      .toDF("w", "pa", "pb")
      .select(
        $"w", $"pa", $"pb",
        TextOps.bpeMergeFold($"w", $"pa", $"pb").as("m"))
      .collect()
    got.foreach { r =>
      val want = refFold(r.getString(0), r.getString(1), r.getString(2))
      assert(r.getString(3) == want,
        s"fold('${r.getString(0)}', '${r.getString(1)}', '${r.getString(2)}') = '${r.getString(3)}', want '$want'")
    }
  }

  test("later rounds merge multi-char tokens when the corpus demands it") {
    // Synthetic histogram where round 2's argmax has a merged left side:
    // "abab" dominates, so round 1 merges (a,b) and round 2 (ab,ab).
    val hist = Map("abab" -> 100L, "abcd" -> 1L)
    val merges = referenceBpe(hist, 2)
    assert(merges(0)._2 == "a b" && merges(0)._4 == 201L)
    assert(merges(1)._2 == "ab ab" && merges(1)._4 == 100L)
    // and the Spark fold applies that multi-char merge identically
    assert(foldOne("ab ab", "ab", "ab") == "abab")
  }
}
