package graft

import java.sql.{Date, Timestamp}

import graft.ops.{RelationalOps, TemporalOps}
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ∀-grade gates on the two temporal kernels whose tie semantics are the
  * classic wrong-answer generators, driven over generated tie-heavy
  * inputs against independent scalar references:
  *
  *  - AS-OF join ([[RelationalOps.asofOf]]): timestamps drawn from a
  *    tiny range so same-user same-instant view/purchase collisions —
  *    the "at or before" boundary — occur constantly. Reference: for
  *    each purchase, max view ts ≤ its ts for the user, null if none.
  *  - gaps-and-islands ([[TemporalOps.islandsOf]]): day sets from a
  *    tiny range so runs, singleton islands, and tied longest streaks
  *    are the norm. Reference: split the sorted day set on gaps > 1,
  *    longest streak with earliest-start tie-break.
  *
  * Both kernels are oracle-checked on the real corpus (DuckDB native
  * ASOF JOIN / anchor SQL); this closes the ∀ gap the fixed corpus
  * leaves open.
  */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("as-of join == scalar reference on 300 tie-heavy generated streams") {
    val genStream: Gen[Seq[(Long, Long, Int, String)]] = for {
      n <- Gen.choose(1, 60)
      rowsG <- Gen.listOfN(
        n,
        for {
          u <- Gen.choose(1L, 5L)   // few users → dense per-user streams
          t <- Gen.choose(0, 15)    // tiny ts range → constant collisions
          k <- Gen.oneOf("view", "purchase")
        } yield (u, t, k))
    } yield rowsG.zipWithIndex.map { case ((u, t, k), i) => (i.toLong, u, t, k) }

    val streams = Gen.listOfN(300, genStream)
      .pureApply(Gen.Parameters.default, Seed(7L))

    streams.zipWithIndex.foreach { case (ev, ci) =>
      val df = ev
        .map { case (id, u, t, k) => (id, u, new Timestamp(t * 1000L), k) }
        .toDF("event_id", "user_id", "ts", "event_type")
      val got = RelationalOps.asofOf(df)
        .collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(3)).map(_.getTime)))
        .toSeq
      val want = ev
        .filter(_._4 == "purchase")
        .sortBy(_._1)
        .map { case (id, u, t, _) =>
          val lastView = ev.collect {
            case (_, vu, vt, "view") if vu == u && vt <= t => vt
          }
          (id, if (lastView.isEmpty) None else Some(lastView.max * 1000L))
        }
      assert(got === want, s"stream #$ci diverged: $ev")
    }
  }

  test("gaps-and-islands == scalar reference on 300 generated day sets") {
    val base = Date.valueOf("2024-01-01").toLocalDate
    val genDays: Gen[Seq[(Long, Int)]] = for {
      n <- Gen.choose(1, 40)
      rowsG <- Gen.listOfN(
        n,
        for {
          u <- Gen.choose(1L, 4L)
          d <- Gen.choose(0, 12) // tiny range → runs + tied streaks
        } yield (u, d))
    } yield rowsG.distinct

    val sets = Gen.listOfN(300, genDays)
      .pureApply(Gen.Parameters.default, Seed(13L))

    sets.zipWithIndex.foreach { case (ud, ci) =>
      val df = ud
        .map { case (u, d) => (u, Date.valueOf(base.plusDays(d.toLong))) }
        .toDF("user_id", "day")
      val got = rows(TemporalOps.islandsOf(df))
      val want = ud
        .groupBy(_._1)
        .toSeq
        .sortBy(_._1)
        .map { case (u, ds) =>
          val days = ds.map(_._2).distinct.sorted
          // split on gaps > 1 day
          val streaks = days.foldLeft(List.empty[List[Int]]) {
            case (cur :: rest, d) if d == cur.head + 1 => (d :: cur) :: rest
            case (acc, d)                              => List(d) :: acc
          }.map(_.reverse).reverse
          val best = streaks.maxBy(st => (st.size, -st.head)) // longest, earliest start
          org.apache.spark.sql.Row(
            u,
            best.size.toLong,
            Date.valueOf(base.plusDays(best.head.toLong)),
            Date.valueOf(base.plusDays(best.last.toLong)),
            streaks.size.toLong,
            days.size.toLong
          ).toString
        }
      assert(got === want, s"day set #$ci diverged: $ud")
    }
  }
}
