package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable hashing primitives for the Tier C dedup family.
  * Both engines ship md5; a 32-bit integer hash derived from the md5 hex
  * prefix is bit-identical in Spark and DuckDB, which makes MinHash/SimHash
  * signatures (pure integer arithmetic on top) oracle-checkable — unlike
  * engine-native hash functions (xxhash64 vs DuckDB's hash), which differ.
  */
object Hashing {
  /** Modulus for all signature arithmetic: fits 17 * 2^32 * safety in a
    * long, so a*h+b never overflows (DuckDB errors on BIGINT overflow;
    * Spark wraps — both avoided).
    */
  val P = 1000000007L

  /** 32-bit token hash from the md5 hex prefix. */
  def h32(t: Column): Column = conv(substring(md5(t), 1, 8), 16, 10).cast("bigint")

  /** DuckDB rendering of [[h32]]. */
  def h32Sql(t: String): String =
    s"CAST(concat('0x', substring(md5($t), 1, 8)) AS BIGINT)"

  /** MinHash family: NumHashes universal-hash functions (a_j*h + b_j) mod P
    * with small odd multipliers.
    */
  val NumHashes = 8
  def mhA(j: Int): Long = 2L * j + 3L
  def mhB(j: Int): Long = 97L * j + 13L
}

/** Embedding math as pure higher-order built-ins (no UDF, stays inside
  * whole-stage codegen). Fold order is the left fold both engines use for
  * aggregate/list_reduce, so dot products are bit-identical (SURVEY §2
  * Tier C).
  */
object Vec {
  /** Codegen'd fused kernel (see [[graft.expr.DotProduct]]): bit-identical
    * to [[dotHof]] but one zero-allocation loop per row.
    */
  def dot(a: Column, b: Column): Column = graft.expr.DotProduct(a, b)

  /** Higher-order-function formulation of the same left fold; kept as the
    * reference implementation for the interpreted-vs-codegen agreement spec.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d),
      (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** cosine from precomputed squared norms — written identically in SQL so
    * every IEEE operation matches.
    */
  def cosine(dotAB: Column, n2a: Column, n2b: Column): Column =
    dotAB / (sqrt(n2a) * sqrt(n2b))

  /** DuckDB rendering of [[dot]]: left fold seeded with 0.0. */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      s"list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  def norm2Sql(a: String): String = dotSql(a, a)
}

/** Manual key-salting for skewed equi-joins — the explicit tool for skew
  * that is known a priori or that AQE cannot see (AQE skew-splitting only
  * fires on sort-merge shuffle stages of the final plan; a streaming join
  * or a first-run stage without runtime stats gets no help). The skewed
  * fact side derives a deterministic salt in [0, salts) from a
  * high-cardinality column; the dim side is replicated once per salt
  * value, so every (key, salt) fact row meets exactly one replica of its
  * key's dim row and the hot key's rows spread across `salts` reduce keys
  * instead of one. Equality with the unsalted join and the key-space
  * split are both spec-proven (SaltedJoinSpec).
  */
object Skew {
  import org.apache.spark.sql.DataFrame

  /** Column name reserved for the salt during the join. */
  private val SaltCol = "__graft_salt"

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      salts: Int,
      factSaltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = fact.withColumn(
      SaltCol,
      pmod(xxhash64(factSaltSource), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn(
      SaltCol,
      explode(array((0 until salts).map(i => lit(i)): _*)))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }
}
