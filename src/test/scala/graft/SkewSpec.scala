package graft

import graft.ops.{DedupOps, Hashing}

/** The one untested 100 TB risk in the dedup family: a HOT band bucket
  * (thousands of near-identical documents hash to one LSH band value, so
  * one shuffle partition holds a quadratic verify workload). The banded
  * join is a shuffle join precisely so AQE can skew-split it — this spec
  * synthesizes the hot bucket and asserts the split actually happens,
  * with the pair output unchanged under the split.
  */
class SkewSpec extends SparkSpec {

  test("hot band bucket is AQE skew-split in the banded Jaccard join") {
    import spark.implicits._
    // 600 near-identical docs (the pathological corpus: one boilerplate
    // page crawled 600 times with a one-token footer change). Every doc =
    // 40 shared tokens + 1 unique token chosen to be minhash-neutral
    // (larger than the shared minimum under every hash lane), so all 600
    // collide in every band bucket while the rows stay incompressible
    // enough for byte-based skew detection to see the hot partition.
    val shared = (0 until 40).map(k => 13L * k + 3).sorted
    val sharedMin = (0 until Hashing.NumHashes).map(j =>
      shared.map(h => Math.floorMod(Hashing.mhA(j) * h + Hashing.mhB(j), Hashing.P)).min)
    val extras = Iterator
      .iterate(1000L)(_ + 1)
      .filter(x =>
        (0 until Hashing.NumHashes).forall(j =>
          Math.floorMod(Hashing.mhA(j) * x + Hashing.mhB(j), Hashing.P) > sharedMin(j)))
      .take(600)
      .toSeq
    val hot = extras.zipWithIndex.map { case (x, i) =>
      (i.toLong, "en", (shared :+ x).sorted)
    }
    val cold = (0 until 100).map { i =>
      (10000L + i, "en", Seq(7L * i + 2, 7L * i + 3, 7L * i + 5).sorted)
    }
    val sets = (hot ++ cold)
      .toDF("doc_id", "lang", "th")
      .selectExpr("doc_id", "lang", "th", "size(th) AS n")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> conf.getOption(k))
    try {
      // production thresholds are MB-scale; scale them to a KB-scale corpus
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // the join feeds a distinct (its own exchange), so an extra shuffle
      // from splitting is already paid — force the split even so
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = DedupOps.bandedJaccardPairs(spark, sets, 9, 10)
      // collect THIS DataFrame (not count(), a different query tree) so the
      // adaptive plan below is the final executed one. Correctness under
      // the split: every hot pair shares 40 of 42 distinct tokens
      // (J = 40/42 ≈ 0.952 ≥ 0.9), so all C(600,2) pairs must survive
      assert(df.collect().length == 600 * 599 / 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split marker in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
