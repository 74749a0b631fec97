package graft

import graft.ops.{SimilarityOps, Vec}

/** The semantic-dedup twin of [[EmbedSkewSpec]]: a HOT CELL — one
  * boilerplate page embedded hundreds of times, every copy assigned to
  * the same k-means cell (the realistic SemDeDup skew case; the paper's
  * clusters are deliberately content-coherent, so boilerplate
  * concentrates BY DESIGN). The cell is the shuffle key of the
  * within-cell τ-verify join precisely so AQE can skew-split it; this
  * spec synthesizes the hot cell and asserts the split happens with the
  * survivor set unchanged.
  */
class SemanticSkewSpec extends SparkSpec {

  test("hot semantic cell is AQE skew-split in the within-cell verify join") {
    import spark.implicits._
    // 16 one-hot centroids (ids 0-15, each its own cell) + 600 copies of
    // a boilerplate vector: EXACTLY 1.0 on the 16 centroid dims (equal
    // ccos to every centroid → the argmin tie-break sends ALL copies to
    // cell 0 — one deterministic hot cell, never scattered by noise) and
    // per-copy noise on dims 16+ only (pairwise cos stays ≈ 1 > τ).
    val dim = 64
    val oneHots = (0 until 16).map { i =>
      (i.toLong, Array.tabulate(dim)(d => if (d == i) 1f else 0f))
    }
    val copies = (0 until 600).map { i =>
      (100L + i, Array.tabulate(dim) { d =>
        if (d < 16) 1f else 1f + 0.001f * ((i + d) % 7)
      })
    }
    val e = (oneHots ++ copies)
      .toDF("vec_id", "embedding")
      .withColumn("n2", Vec.norm2($"embedding"))
    val cents = SimilarityOps.semCentsOf(
      e, math.max(16L, math.ceil(math.sqrt(616d)).toLong))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k))
    try {
      // same threshold rationale as EmbedSkewSpec: the shuffled rows are
      // slim and compress hard, so scale the MB-class production
      // thresholds to the byte sizes this corpus actually produces, and
      // use enough partitions that the median partition is thin
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2048")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1024")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.shuffle.partitions", "64")
      val survivors = SimilarityOps.semSurvivorsWith(e, cents)
      val got = survivors.collect().map(_.getLong(0)).toSet
      // anchor rule under the hot cell: every copy is witnessed by the
      // lowest copy id; centroids are below τ against the boilerplate
      // (cos ≈ 1/8), so exactly the 16 centroids + one copy survive
      assert(got === ((0L until 16L).toSet + 100L), got.toString)
      val plan = survivors.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split marker in plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
