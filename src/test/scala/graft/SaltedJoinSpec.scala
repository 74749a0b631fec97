package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Manual skew salting ([[graft.ops.Skew.saltedJoin]]): the explicit
  * counterpart to the AQE skew-split proofs (SkewSpec, EmbedSkewSpec) for
  * joins where the skew is known a priori or AQE cannot see it. Proves
  * (1) exact result equality with the unsalted join, (2) the hot key's
  * rows actually spread across the salted reduce-key space, and (3) the
  * physical join keys include the salt.
  */
class SaltedJoinSpec extends SparkSpec {

  // 10k fact rows, 80% on one hot key — the classic power-law fact table —
  // joined to a 50-row dim
  private def fixtures = {
    import spark.implicits._
    val fact = spark
      .range(10000)
      .select(
        $"id".as("row_id"),
        when(pmod($"id", lit(10L)) < 8, 7L).otherwise(pmod($"id", lit(50L))).as("k"),
        ($"id" * 3).as("payload"))
    val dim = spark.range(50).select($"id".as("k"), concat(lit("d"), $"id").as("label"))
    (fact, dim)
  }

  test("salted join equals the plain join exactly") {
    val (fact, dim) = fixtures
    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8, factSaltSource = col("row_id"))
    assert(salted.count() == plain.count())
    assert(
      salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
    // schema untouched: the salt column does not leak
    assert(salted.columns.toSeq == plain.columns.toSeq)
  }

  test("the hot key's rows spread across the salted reduce-key space") {
    import spark.implicits._
    val (fact, dim) = fixtures
    val salts = 8
    // reconstruct the salted fact side the way saltedJoin derives it and
    // measure the reduce-key histogram of the hot key
    val saltedKeys = fact
      .withColumn("s", pmod(xxhash64($"row_id"), lit(salts.toLong)).cast("int"))
      .filter($"k" === 7L)
      .groupBy($"s")
      .count()
      .collect()
    assert(saltedKeys.length == salts, s"expected $salts sub-keys, got ${saltedKeys.length}")
    val counts = saltedKeys.map(_.getAs[Long]("count"))
    val hot = counts.sum
    // before salting: one reduce key held all `hot` rows; after: the
    // largest sub-key holds a ~1/salts share (allow 2× imbalance slack)
    assert(counts.max <= 2L * hot / salts, s"max=${counts.max} of $hot")
  }

  test("the physical join keys include the salt") {
    val (fact, dim) = fixtures
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8, factSaltSource = col("row_id"))
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
