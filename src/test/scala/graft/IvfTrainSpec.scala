package graft

import graft.ops.{SimilarityOps, Vec}
import org.apache.spark.sql.functions._

/** Agreement validation for the trained-IVF path (SURVEY §2 q_sim_ivf):
  * k-means is not oracle-expressible for the driver's DuckDB hash compare,
  * so the trained codebook is held to (a) bit-determinism across runs —
  * the exact-decimal mean must make training independent of partition
  * order — and (b) a recall floor vs the brute-force exact top-k.
  */
class IvfTrainSpec extends SparkSpec {

  private def e = {
    import spark.implicits._
    T(spark, sf, "embeddings")
      .select($"vec_id", $"embedding", Vec.norm2($"embedding").as("n2"))
  }

  test("codebook training is deterministic and actually moves centroids") {
    val a = SimilarityOps.trainCodebook(e, 16, 4)
    val b = SimilarityOps.trainCodebook(e.repartition(7), 16, 4)
    assert(a == b, "training depends on partitioning")
    val seeds = SimilarityOps.trainCodebook(e, 16, 0)
    assert(a.map(_._2) != seeds.map(_._2), "Lloyd iterations were a no-op")
    assert(a.size == 16 && a.forall(_._2.length == 64))
  }

  test("trained IVF recall vs exact top-10 meets the contract floor") {
    import spark.implicits._
    val got = SimilarityOps
      .simIvfTrained(spark, sf)
      .select($"vec_id")
      .as[Long]
      .collect()
      .toSet
    val exact = e
      .filter($"vec_id" =!= 0)
      .crossJoin(broadcast(
        e.filter($"vec_id" === 0).select($"embedding".as("p"), $"n2".as("pn2"))))
      .select(
        $"vec_id",
        Vec.cosine(Vec.dot($"embedding", $"p"), $"n2", $"pn2").as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
      .select($"vec_id")
      .as[Long]
      .collect()
      .toSet
    val recall = (got & exact).size / 10.0
    // nprobe=2 of 16 cells over isotropic random vectors: partial recall is
    // inherent to IVF (it trades recall for reading 2/16 of the corpus);
    // the floor guards against a broken quantizer (recall ~uniform ≈ 0.125)
    assert(recall >= 0.5, s"recall $recall < 0.5 (got=$got exact=$exact)")
  }
}
