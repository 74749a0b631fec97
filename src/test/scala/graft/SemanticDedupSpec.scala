package graft

import org.apache.spark.sql.functions._

/** q_dedup_semantic — SemDeDup-style cluster-then-prune (arXiv:2303.09540)
  * checked against an INDEPENDENT driver-side reference: plain-Scala
  * argmin cell assignment + the anchor prune rule (a vector survives iff
  * it has no lower-id τ-neighbor in its cell) recomputed from the raw
  * vectors, no Spark expression shared with the query under test. Also
  * pins the structural contract: survivors ∪ dropped partition the
  * corpus, every dropped vector has a lower-id same-cell τ-witness, and
  * no surviving pair within a cell exceeds τ with the LOWER id as
  * witness (the exact complement of the drop rule).
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.4

  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.indices.foldLeft(0d)((acc, i) => acc + a(i).toDouble * b(i).toDouble)

  test("q_dedup_semantic equals a driver-side reference at sf0.001") {
    val vecs = T(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val byId = vecs.toMap
    val k = math.max(16L, math.ceil(math.sqrt(vecs.length.toDouble)).toLong)
    val cents = vecs.filter(_._1 < k)

    // argmin assignment, tie-break (cos desc, c_id asc) — recomputed
    // from scratch with scalar arithmetic
    val cellOf = vecs.map { case (id, v) =>
      val best = cents
        .map { case (cid, c) =>
          (dot(v, c) / (math.sqrt(n2(id)) * math.sqrt(n2(cid))), cid)
        }
        .minBy { case (cos, cid) => (-cos, cid) }
      id -> best._2
    }.toMap

    val ids = vecs.map(_._1)
    val expectSurvivors = ids.filter { b =>
      !ids.exists(a =>
        a < b && cellOf(a) == cellOf(b) &&
          dot(byId(a), byId(b)) / (math.sqrt(n2(a)) * math.sqrt(n2(b))) > Tau)
    }.toSet

    val got = SparkEntry
      .queries("q_dedup_semantic")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val gotIds = got.map(_._1).toSet

    assert(gotIds === expectSurvivors, "survivor set diverged from the reference")
    got.foreach { case (id, cell) =>
      assert(cell === cellOf(id), s"cell diverged for vec $id")
    }

    // structural contract: dropped = corpus minus survivors, each with a
    // lower-id same-cell τ-witness
    val dropped = ids.filterNot(gotIds)
    assert(dropped.nonEmpty, "τ too high: the query pruned nothing at this sf")
    assert(gotIds.nonEmpty && gotIds.size < ids.length)
    dropped.foreach { b =>
      assert(
        ids.exists(a =>
          a < b && cellOf(a) == cellOf(b) &&
            dot(byId(a), byId(b)) / (math.sqrt(n2(a)) * math.sqrt(n2(b))) > Tau),
        s"dropped vec $b has no lower-id same-cell witness")
    }
  }

  test("q_cluster_stats equals per-cell counts over the rebuilt survivor set") {
    val survivors = SparkEntry
      .queries("q_dedup_semantic")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val members = T(spark, sf, "embeddings").count()
    val got = SparkEntry
      .queries("q_cluster_stats")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sum === members, "cells must partition the corpus")
    val keptByCell = survivors.groupBy(_._2).map { case (c, xs) => c -> xs.length.toLong }
    got.foreach { case (cell, nVecs, nKept) =>
      assert(nKept === keptByCell.getOrElse(cell, 0L), s"cell $cell kept count")
      assert(nKept >= 1 && nKept <= nVecs, s"cell $cell bounds")
    }
  }

  test("q_dedup_semantic_trained equals a scalar reference on its own centroids") {
    import graft.ops.{SimilarityOps, Vec}
    val e = T(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
      .withColumn("n2", Vec.norm2($"embedding"))
    val vecs = e
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    val k = math.max(16L, math.ceil(math.sqrt(vecs.length.toDouble)).toLong)
    // the engine's own trained centroids (deterministic — IvfTrainSpec);
    // from here the scalar reference replays assignment + anchor prune
    // with the same left-fold float ops, so equality is bit-exact
    val cb = SimilarityOps.trainCodebook(e, k.toInt, iters = 2)
    val cents = cb.map { case (cid, c) => cid -> c.toArray }
    val cn2 = cents.map { case (cid, c) => cid -> dot(c, c) }.toMap
    val n2 = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val byId = vecs.toMap
    val cellOf = vecs.map { case (id, v) =>
      id -> cents
        .map { case (cid, c) =>
          (dot(v, c) / (math.sqrt(n2(id)) * math.sqrt(cn2(cid))), cid)
        }
        .minBy { case (cos, cid) => (-cos, cid) }
        ._2
    }.toMap
    val ids = vecs.map(_._1)
    val want = ids.filter { b =>
      !ids.exists(a =>
        a < b && cellOf(a) == cellOf(b) &&
          dot(byId(a), byId(b)) / (math.sqrt(n2(a)) * math.sqrt(n2(b))) > Tau)
    }.map(id => id -> cellOf(id))

    val fn = SparkEntry.queries("q_dedup_semantic_trained")
    def got(): Seq[(Long, Long)] =
      fn(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got() === want.toSeq, "trained survivors diverged from the scalar reference")
    // stable under a different partitioning (the cluster-vs-local[32] gap)
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try assert(got() === want.toSeq, "trained variant unstable across partitionings")
    finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }

  test("boilerplate cell: 500 identical vectors collapse to one survivor") {
    // the adversarial shape of a real corpus — one boilerplate page
    // embedded 500× — lands ALL copies in one cell (equal cos to every
    // centroid; the argmin tie-break picks c_id 0 deterministically) and
    // the anchor prune must keep exactly the lowest id. Centroids are
    // the 16 one-hot basis vectors (pairwise cos 0 — all survive), the
    // boilerplate is all-ones (cos 1/4 to every centroid, below τ, so
    // no cross-witnessing in the shared cell; cos 1 to its copies).
    import spark.implicits._
    val dim = 16
    val oneHots = (0 until 16).map { i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i) 1f else 0f))
    }
    val ones = Array.fill(dim)(1f)
    val copies = (100L until 600L).map(id => (id, ones))
    val e = (oneHots ++ copies)
      .toDF("vec_id", "embedding")
      .withColumn("n2", graft.ops.Vec.norm2($"embedding"))
    // k = max(16, ceil(sqrt(516))) = 23, but only ids < 23 present are
    // the 16 one-hots — the codebook is exactly the basis
    val k = math.max(16L, math.ceil(math.sqrt(516d)).toLong)
    val cents = graft.ops.SimilarityOps.semCentsOf(e, k)
    val got = graft.ops.SimilarityOps
      .semSurvivorsWith(e, cents)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.keySet === ((0L until 16L).toSet + 100L),
      "survivors must be the 16 centroids plus the lowest boilerplate id")
    assert(got(100L) === 0L, "tied argmin must break to the lowest c_id")
  }

  test("q_dedup_semantic_incr equals the full rebuild restricted to batch ids") {
    val full = SparkEntry
      .queries("q_dedup_semantic")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val thr = T(spark, sf, "embeddings").agg(max($"vec_id")).head().getLong(0) / 2
    val got = SparkEntry
      .queries("q_dedup_semantic_incr")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === full.filter(_._1 > thr).toSeq,
      "incremental apply diverged from the rebuild restriction")
    assert(got.nonEmpty)
  }
}
