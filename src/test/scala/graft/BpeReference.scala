package graft

/** Independent driver-side BPE trainer (plain Scala maps — no Spark, no
  * SQL): greedy argmax with the (count DESC, pair ASC) tie-break and
  * non-overlapping left-to-right apply — the declared q_bpe_train
  * semantics. Shared by BpeTrainSpec (4-round agreement at sf) and
  * ScaleSpec (64-round agreement on the 10× corpus), so a bug shared by
  * the Spark and DuckDB formulations of the fold would still be caught.
  */
object BpeReference {
  def train(
      hist: Map[String, Long],
      rounds: Int): Seq[(Int, String, String, Long)] = {
    var words = hist.map { case (t, c) => t.map(_.toString).toList -> c }.toSeq
    val out = collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((toks, c) <- words; Seq(a, b) <- toks.sliding(2) if toks.size > 1)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((pa, pb), n) =
          counts.toSeq.minBy { case ((a, b), m) => (-m, s"$a $b") }
        words = words.map { case (toks, c) =>
          val w = collection.mutable.ListBuffer.empty[String]
          for (t <- toks) {
            if (w.nonEmpty && w.last == pa && t == pb)
              w(w.size - 1) = pa + pb
            else w += t
          }
          w.toList -> c
        }
        out += ((r, s"$pa $pb", pa + pb, n))
        r += 1
      }
    }
    out.toSeq
  }
}
