package graft

import org.apache.spark.sql.functions._

/** q_join_fuzzy: the SymSpell deletion-neighborhood blocking is LOSSLESS
  * for edit distance ≤ 1 — proven here by exact equality with the O(n²)
  * brute force — and skew-free by construction (variant keys are
  * near-unique, unlike the constant "Customer#" prefix a prefix-block
  * would hash on).
  */
class FuzzyJoinSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("deletion-neighborhood candidates find exactly the brute-force pairs") {
    import spark.implicits._
    val cust = T(spark, sf, "customer")
    // brute force: all O(n²) pairs, exact levenshtein filter
    val a = cust.select($"c_custkey".as("k_a"), $"c_nationkey".as("nat_a"),
      $"c_name".as("name_a"))
    val b = cust.select($"c_custkey".as("k_b"), $"c_name".as("name_b"))
    val brute = a
      .crossJoin(b)
      .filter($"k_a" < $"k_b" && levenshtein($"name_a", $"name_b") <= 1)
      .groupBy($"nat_a".as("c_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
    val fuzzy = q("q_join_fuzzy").select($"c_nationkey", $"n_pairs")
    assert(fuzzy.except(brute).count() == 0)
    assert(brute.except(fuzzy).count() == 0)
    // and there genuinely are pairs to find (non-vacuous)
    assert(fuzzy.agg(sum($"n_pairs")).head().getLong(0) > 0)
  }

  test("variant keys are near-unique (no disguised cross join)") {
    import spark.implicits._
    // the largest variant bucket bounds the candidate-join fan-out; with
    // 150 18-char names the deletion space must keep buckets tiny, while
    // a prefix-9 block would put ALL rows in one bucket
    val cust = T(spark, sf, "customer")
    val variants = cust.select(
      explode(
        array_distinct(
          concat(
            transform(
              sequence(lit(0), length($"c_name") - 1),
              i => concat(
                $"c_name".substr(lit(1), i),
                $"c_name".substr(i + lit(2), length($"c_name")))),
            array($"c_name")))).as("variant"))
    val maxBucket = variants
      .groupBy($"variant").count().agg(max($"count")).head().getLong(0)
    val n = cust.count()
    assert(maxBucket < n / 4, s"variant bucket $maxBucket too hot for $n rows")
    val prefixBucket = cust
      .groupBy(substring($"c_name", 1, 9)).count()
      .agg(max($"count")).head().getLong(0)
    assert(prefixBucket == n) // the motivating skew: prefix blocking degenerates
  }
}
