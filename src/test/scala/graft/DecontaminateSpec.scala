package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q_split_decontaminate — eval-set decontamination at passage
  * granularity (the GPT-3 n-gram scrub): a valid/test document's
  * contaminated spans are exactly the token intervals covered by a
  * 5-gram that also occurs in some TRAIN document. Planted semantics:
  * train→eval leakage emits the precise span with its split label,
  * train-train sharing emits nothing (train docs are never scrubbed),
  * and eval-eval sharing without a train carrier is NOT contamination.
  * Doc ids are chosen to land in their splits under the q_split_assign
  * hash ladder (md5-derived, engine-independent): 0-5 train, 16 valid,
  * 8 test.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def stage(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_decontam").toString
    rows
      .map { case (i, t) => (i, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(dir: String): Seq[(Long, String, Long, Long, Long)] =
    SparkEntry.queries("q_split_decontaminate")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

  private val P = (1 to 6).map(i => s"pp$i").mkString(" ") // 6-token passage
  private val E = (1 to 5).map(i => s"ee$i").mkString(" ") // eval-only passage

  test("a train passage quoted in eval docs emits exactly its spans; nothing else") {
    val out = run(stage(Seq(
      0L -> s"$P train tail words one",       // train carrier of P
      1L -> s"other train body $P",           // second train carrier
      2L -> "plain train filler text entirely", // train doc carrying neither passage
      8L -> s"lead in $P end bits",           // test doc quoting P at 3-8 of 10
      16L -> s"$P starts this valid doc here",// valid doc quoting P at 1-6
      20L -> s"$E and unique test filler",    // test doc sharing E with 25 — no train carrier
      25L -> s"closing words then $E")))      // valid? 25 is test bucket
    // only the P-quoting eval docs appear, each with its exact span
    assert(out.toSet === Set(
      (8L, "test", 3L, 8L, 6L),
      (16L, "valid", 1L, 6L, 6L)),
      s"got $out")
  }

  test("train-train sharing is never scrubbed; clean eval docs emit nothing") {
    val out = run(stage(Seq(
      0L -> s"$P shared among train docs",
      1L -> s"$P also in this train doc",
      8L -> "a completely clean test document body")))
    assert(out.isEmpty, s"got $out")
  }

  test("doc 2 staged with E keeps eval-eval sharing uncontaminated until a train doc carries it") {
    // without a train carrier: E shared by test docs 20 and 25 — clean
    val clean = run(stage(Seq(
      0L -> "train doc with nothing shared here at all",
      20L -> s"$E and unique test filler",
      25L -> s"closing words then $E")))
    assert(clean.isEmpty, s"got $clean")
    // the SAME corpus plus a train carrier of E: both eval docs now flag
    val dirty = run(stage(Seq(
      0L -> "train doc with nothing shared here at all",
      2L -> s"$E inside a train document",
      20L -> s"$E and unique test filler",
      25L -> s"closing words then $E")))
    assert(dirty.map(r => (r._1, r._2)).toSet === Set((20L, "test"), (25L, "test")),
      s"got $dirty")
  }
}
