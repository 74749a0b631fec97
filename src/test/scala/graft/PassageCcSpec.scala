package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_dedup_passage_cc — connected components over the exact ≥50-token
  * shared-passage relation (Lee et al. arXiv:2107.06499's duplication
  * relation as a doc grouping). Planted semantics: a shared 50-token
  * passage links its carriers; 49 shared tokens do not; linkage is
  * transitive through a middle doc carrying two different passages; a
  * ubiquitous SHORT phrase links nothing (the saturation resistance);
  * labels are component minima and cluster_size counts members.
  */
class PassageCcSpec extends SparkSpec {
  import spark.implicits._

  private def stage(texts: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_pcc").toString
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def clusters(dir: String): Map[Long, (Long, Long)] =
    SparkEntry.queries("q_dedup_passage_cc")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared 50-token passage clusters its carriers; 49 shared tokens never does") {
    val p50 = toks("pp", 50)
    val p49 = toks("qq", 49)
    val got = clusters(stage(Seq(
      s"$p50 taila1 taila2 taila3",            // 0 ─┐ share p50
      s"lead1 lead2 $p50 tailb1",              // 1 ─┘
      s"$p49 xx1 xx2 xx3",                     // 2: 49-token overlap only
      s"yy1 $p49 yy2 yy3",                     // 3: (different neighbors)
      "short doc")))                           // 4: below K, gram-free
    assert(got(0L) === ((0L, 2L)) && got(1L) === ((0L, 2L)),
      "carriers cluster under the min doc_id")
    assert(got(2L) === ((2L, 1L)) && got(3L) === ((3L, 1L)),
      "a 49-token overlap is below the match floor")
    assert(got(4L) === ((4L, 1L)))
  }

  test("linkage is transitive through a doc carrying two different passages") {
    val pa = toks("aa", 50)
    val pb = toks("bb", 50)
    val got = clusters(stage(Seq(
      s"$pa tail1 tail2",        // 0 shares pa with 1
      s"$pa middle words $pb",   // 1 shares pb with 2
      s"lead $pb tail3",         // 2
      "unrelated document body entirely")))
    assert(got(0L) === ((0L, 3L)) && got(1L) === ((0L, 3L)) && got(2L) === ((0L, 3L)),
      "A–B–C is one component via the hub stars")
    assert(got(3L) === ((3L, 1L)))
  }

  test("a ubiquitous short phrase links nothing — the saturation resistance") {
    val chrome = "all rights reserved by acme inc" // 6 tokens, everywhere
    val docs = (0 until 8).map(i => s"${toks(s"u$i", 45)} $chrome")
    val got = clusters(stage(docs))
    assert(got.values.forall(_._2 == 1L),
      "every doc ≥50 tokens and shares 6-token chrome corpus-wide, yet no 50-token window matches")
  }
}
