package graft.ops

import graft.{QueryDef, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier C deduplication family (SURVEY §2 Tier C + charter): exact,
  * near-dup by exact Jaccard, MinHash signatures, LSH banding, SimHash —
  * the operators a 100 TB training-data pipeline runs first. Design
  * posture: everything is a shuffle on a derived key column (hash, band,
  * block) — never driver-side state — so each op scales out by
  * partitioning alone.
  */
object DedupOps {

  import Hashing._

  private def docs(s: SparkSession, d: String) = T(s, d, "documents")

  /** q_dedup_exact — content-hash dedup, first-writer-wins (the md5 group
    * is the shuffle key; at scale this is one hash partition pass).
    */
  private def dedupExact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    docs(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy("doc_id")
  }

  /** q_dedup_near — exact token-set Jaccard over lang-blocked candidate
    * pairs (the verification step LSH candidates feed at scale).
    *
    * Two scale measures, both semantics-preserving:
    *   - the block key is salted: the a-side is replicated k ways and joined
    *     on (lang, salt = b.doc_id mod k), turning one task per language
    *     (raw skew: one language can be most of the corpus) into k balanced
    *     tasks per language;
    *   - a size filter prunes before the intersection: J(A,B) ≥ 0.9 requires
    *     10·|A| ≥ 9·|B| and 10·|B| ≥ 9·|A| (integer-exact in both engines).
    */
  private val SaltK = 8

  /** Token sets pre-hashed (md5-derived 64-bit-safe values) and pre-sorted
    * ONCE per document, so the per-pair intersection is the codegen'd
    * merge walk in [[graft.expr.SortedIntersectCount]] instead of a
    * hash-set build per pair. Cardinalities equal the string-set
    * intersection unless h32 collides (probability ~n²/2^32 per doc pair's
    * shared-token check — zero in practice), so the DuckDB oracle keeps the
    * direct token-set formulation.
    */
  private def dedupNear(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = docs(s, d)
      .select($"doc_id", $"lang", array_distinct(split($"text", " ")).as("t"))
      .select(
        $"doc_id",
        $"lang",
        array_sort(transform($"t", tk => h32(tk))).as("th"),
        size($"t").as("n"))
    val salted = toks.withColumn("salt", pmod($"doc_id", lit(SaltK)).cast("int"))
    val replicated = toks.withColumn(
      "salt",
      explode(lit((0 until SaltK).toArray)))
    replicated
      .as("a")
      .join(
        salted.as("b"),
        $"a.lang" === $"b.lang" && $"a.salt" === $"b.salt" &&
          $"a.doc_id" < $"b.doc_id" &&
          $"a.n" * 10 >= $"b.n" * 9 && $"b.n" * 10 >= $"a.n" * 9)
      .select(
        $"a.doc_id".as("a_id"),
        $"b.doc_id".as("b_id"),
        graft.expr.SortedIntersectCount($"a.th", $"b.th").as("i"),
        ($"a.n" + $"b.n").as("sz"))
      .withColumn("jaccard", $"i".cast("double") / ($"sz" - $"i").cast("double"))
      .filter($"jaccard" >= 0.9)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy("a_id", "b_id")
  }

  private val NearSql =
    "WITH tok AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS t " +
      "FROM documents) " +
      "SELECT a_id, b_id, jaccard FROM (" +
      "SELECT a.doc_id AS a_id, b.doc_id AS b_id, " +
      "CAST(len(list_intersect(a.t, b.t)) AS DOUBLE) / " +
      "(len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) AS jaccard " +
      "FROM tok a JOIN tok b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
      "AND len(a.t) * 10 >= len(b.t) * 9 AND len(b.t) * 10 >= len(a.t) * 9) " +
      "WHERE jaccard >= 0.9 ORDER BY a_id, b_id"

  /** Distinct-token column shared by the signature ops. */
  private def toksCol: Column = array_distinct(split(col("text"), " "))

  /** One MinHash value: min over tokens of (a_j*h32(t)+b_j) mod P. */
  private def minhash(j: Int): Column =
    array_min(
      transform(
        toksCol,
        t => pmod(lit(mhA(j)) * h32(t) + lit(mhB(j)), lit(P))))

  private def minhashSql(j: Int): String =
    s"list_min(list_transform(t, tk -> (${mhA(j)} * ${h32Sql("tk")} + ${mhB(j)}) % $P))"

  /** q_dedup_minhash — 8-permutation MinHash signature per document.
    * Portable md5-derived hashes make the whole signature oracle-checked
    * (engine-native hashes would not be); at scale the signature is a
    * narrow map-only projection.
    */
  private def dedupMinhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    docs(s, d)
      .select(
        $"doc_id" +: (0 until NumHashes).map(j => minhash(j).as(s"mh$j")): _*)
      .orderBy("doc_id")
  }

  private val MinhashSql =
    "WITH tok AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t " +
      "FROM documents) SELECT doc_id, " +
      (0 until NumHashes).map(j => s"${minhashSql(j)} AS mh$j").mkString(", ") +
      " FROM tok ORDER BY doc_id"

  /** Band keys over the signature: 4 bands × 2 rows. */
  private val NumBands = 4
  private def bandCol(j: Int): Column =
    pmod(col(s"mh${2 * j}") * lit(131L) + col(s"mh${2 * j + 1}"), lit(P))
  private def bandSql(j: Int): String =
    s"(mh${2 * j} * 131 + mh${2 * j + 1}) % $P"

  /** q_dedup_lsh — banded-LSH dedup as cluster assignment: every document
    * gets canonical_id = min(doc_id) over all band buckets it lands in, and
    * is a duplicate iff canonical_id ≠ doc_id.
    *
    * Deliberately NOT materialized as candidate pairs: bucket contents are
    * quadratic in bucket size (a hot bucket of 10^4 docs is 5·10^7 pairs —
    * on a self-similar corpus at 100 TB that join never finishes). Bucket
    * min + per-doc min is two window/aggregate passes, O(n·bands) total,
    * and is the assignment an actual dedup sink consumes.
    */
  private def dedupLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sig = docs(s, d).select(
      $"doc_id" +: (0 until NumHashes).map(j => minhash(j).as(s"mh$j")): _*)
    val bands = sig.select(
      $"doc_id",
      posexplode(array((0 until NumBands).map(bandCol): _*))
        .as(Seq("band_idx", "band_val")))
    val w = Window.partitionBy($"band_idx", $"band_val")
    bands
      .withColumn("bucket_min", min($"doc_id").over(w))
      .groupBy($"doc_id")
      .agg(min($"bucket_min").as("canonical_id"))
      .withColumn("is_dup", $"doc_id" =!= $"canonical_id")
      .orderBy("doc_id")
  }

  private val LshSql = {
    val sigSelect =
      "SELECT doc_id, " +
        (0 until NumHashes).map(j => s"${minhashSql(j)} AS mh$j").mkString(", ") +
        " FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM documents)"
    val bandUnion = (0 until NumBands)
      .map(j => s"SELECT doc_id, $j AS band_idx, ${bandSql(j)} AS band_val FROM sig")
      .mkString(" UNION ALL ")
    s"WITH sig AS ($sigSelect), bands AS ($bandUnion) " +
      "SELECT doc_id, canonical_id, doc_id <> canonical_id AS is_dup FROM (" +
      "SELECT doc_id, MIN(bucket_min) AS canonical_id FROM (" +
      "SELECT doc_id, MIN(doc_id) OVER (PARTITION BY band_idx, band_val) AS bucket_min " +
      "FROM bands) GROUP BY doc_id) ORDER BY doc_id"
  }

  /** q_dedup_simhash — 16-bit SimHash signature: per-bit ±1 vote over token
    * hashes. Integer-exact, so order-independent and oracle-checked.
    */
  private val SimBits = 16
  private def dedupSimhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hs = transform(toksCol, t => h32(t))
    def bit(b: Int): Column =
      when(
        aggregate(
          hs,
          lit(0L),
          (acc, x) => acc + (shiftright(x, b) % 2L) * 2L - 1L) > 0,
        lit(1L << b)).otherwise(lit(0L))
    docs(s, d)
      .select(
        $"doc_id",
        (0 until SimBits).map(bit).reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  private val SimhashSql = {
    def bit(b: Int): String =
      "CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(t, tk -> ((${h32Sql("tk")} >> $b) % 2) * 2 - 1)), " +
        s"(a, v) -> a + v) > 0 THEN ${1L << b} ELSE 0 END"
    "SELECT doc_id, " + (0 until SimBits).map(bit).mkString(" + ") +
      " AS simhash FROM (SELECT doc_id, list_distinct(string_split(text, ' ')) AS t " +
      "FROM documents) ORDER BY doc_id"
  }

  /** q_dedup_embed — embedding-cosine near-dup pairs, label-blocked: the
    * semantic-dedup step of an LLM data pipeline. Norms are precomputed per
    * row so the pairwise step is one dot product.
    */
  private def dedupEmbed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = T(s, d, "embeddings")
      .select($"vec_id", $"label", $"embedding", Vec.norm2($"embedding").as("n2"))
    e.as("a")
      .join(e.as("b"), $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
      .select(
        $"a.vec_id".as("a_id"),
        $"b.vec_id".as("b_id"),
        Vec.cosine(Vec.dot($"a.embedding", $"b.embedding"), $"a.n2", $"b.n2")
          .as("cos"))
      .filter($"cos" >= 0.4)
      .orderBy("a_id", "b_id")
  }

  private val EmbedSql =
    s"WITH e AS (SELECT vec_id, label, embedding, ${Vec.norm2Sql("embedding")} AS n2 " +
      "FROM embeddings) " +
      "SELECT a_id, b_id, cos FROM (" +
      "SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
      s"${Vec.dotSql("a.embedding", "b.embedding")} / (sqrt(a.n2) * sqrt(b.n2)) AS cos " +
      "FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) " +
      "WHERE cos >= 0.4 ORDER BY a_id, b_id"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_dedup_exact",
      dedupExact,
      Some(
        "SELECT doc_id, lang, source, n_chars FROM documents " +
          "QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 " +
          "ORDER BY doc_id")),
    QueryDef("q_dedup_near", dedupNear, Some(NearSql)),
    QueryDef("q_dedup_minhash", dedupMinhash, Some(MinhashSql)),
    QueryDef("q_dedup_lsh", dedupLsh, Some(LshSql)),
    QueryDef("q_dedup_simhash", dedupSimhash, Some(SimhashSql)),
    QueryDef("q_dedup_embed", dedupEmbed, Some(EmbedSql))
  )
}
