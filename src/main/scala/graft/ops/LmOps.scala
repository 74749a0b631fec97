package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, T, X}

/** Unigram language-model quality scoring — the CCNet-style corpus
  * filter (Wenzek et al., arXiv:1911.00359): train a cheap LM on the
  * corpus, score every document by how "expected" its tokens are, and
  * bucket documents head/middle/tail per language so a curation
  * pipeline can keep the well-formed fraction. The reference has no
  * notion of this (its 456-line ETL scores nothing); the family is
  * charter surface — what a 100 TB training-data pipeline needs next to
  * dedup (q_dedup_*) and heuristic quality (q_text_quality).
  *
  * House determinism rule (SURVEY §7.5): no cross-libm transcendentals
  * in oracle-checked queries, so the score is NOT log-perplexity — it is
  * the mean INVERSE RELATIVE FREQUENCY of the document's tokens
  * (Σ N/cf(t) / n_tokens), a rational surrogate computed with one IEEE
  * division per token, portable half-up rounding (X.r6), and an
  * order-independent decimal(38,6) sum — the exact ladder q_index_bm25
  * uses for its rational idf. Rare-token-heavy (ill-modeled) documents
  * score HIGH, common-language documents LOW, the same direction as
  * perplexity; it is a different statistic (arithmetic, not geometric,
  * mean of 1/p), documented as such — the FILTERING role (rank + bucket
  * per language) is what CCNet prescribes, and ranks only need a
  * monotone per-token score.
  *
  * Tokenizer: exactly [[TextOps.bm25TokensOf]] (lower, space-split,
  * `[a-z0-9]{3,}`), so the model is derivable from the maintained BM25
  * postings state (cf = Σ tf per term, N = stats.l) — the continuous
  * serve ([[StreamOps.serveLmUnigramContinuous]]) reads the SAME index
  * the lexical family already maintains: one state, one more serve, no
  * new stream.
  *
  * Scale shape at 100 TB: the model is ONE hash aggregate over tokens
  * (map-side partial combine); scoring joins tokens to the vocab-sized
  * cf table (bounded by language, ~1e7-1e8 rows — AQE auto-broadcasts
  * it at small scale, shuffle-hash on `term` beyond) plus one broadcast
  * one-row total; the per-doc reduce is the corpus's one doc-keyed
  * aggregate. Sum headroom: rarity ≤ N (hapax), so a doc's sum is
  * ≤ n_tokens·N ~ 1e18 at N=1e13 — inside decimal(38,6)'s 32 integer
  * digits where a double sum would both overflow precision and be
  * order-dependent.
  */
object LmOps {

  private def docs(s: SparkSession, d: String) = T(s, d, "documents")

  /** (term, cf, n_total) — the unigram counts every query here shares;
    * also exactly reconstructible from the BM25 postings generations.
    */
  private[graft] def unigramCountsOf(ft: DataFrame): DataFrame = {
    import ft.sparkSession.implicits._
    ft.groupBy($"term")
      .agg(count(lit(1)).as("cf"))
      .crossJoin(broadcast(ft.agg(count(lit(1)).as("n_total"))))
  }

  /** The model projection over any (term, cf, n_total) counts frame —
    * the seam the continuous serve shares with the registry query, so
    * counts derived from the maintained BM25 postings (cf = Σ tf,
    * n_total = Σ stats.l) produce the byte-identical model.
    */
  private[graft] def lmUnigramFromCounts(counts: DataFrame): DataFrame = {
    import counts.sparkSession.implicits._
    counts
      .select(
        $"term",
        $"cf",
        $"n_total",
        X.r6($"cf".cast("double") / $"n_total".cast("double")).as("p6"))
      .orderBy($"cf".desc, $"term")
  }

  /** q_lm_unigram — the model table: every vocabulary term with its
    * corpus frequency and (rounded) relative frequency. p6 is the one
    * IEEE division cf/N, half-up at 6dp — the portable fixed-point form
    * of the maximum-likelihood unigram probability.
    */
  private[graft] def lmUnigramOf(docsDf: DataFrame): DataFrame =
    lmUnigramFromCounts(unigramCountsOf(TextOps.bm25TokensOf(docsDf)))

  /** Per-doc scores STRAIGHT FROM THE POSTINGS STATE: the registry sums
    * r6(N/cf) once per token; the postings carry (term, doc_id, tf), and
    * tf occurrences of a term all round to the same fixed-point rarity,
    * so Σ_tokens r6(N/cf) = Σ_terms tf·r6(N/cf) EXACTLY in decimal
    * arithmetic (tf ≤ 1e12 as decimal(12,0) × rarity ≤ 1e12 at 6dp as
    * decimal(18,6) → decimal(31,6), no precision loss). n_tokens = Σ tf.
    * The serve therefore never touches the corpus text — the model AND
    * the scores ride the index the lexical family already maintains.
    */
  private[graft] def lmScoreFromPostings(
      postings: DataFrame,
      nTotal: DataFrame): DataFrame = {
    import postings.sparkSession.implicits._
    val counts = postings
      .groupBy($"term")
      .agg(sum($"tf").as("cf"))
      .crossJoin(broadcast(nTotal.select($"n_total")))
    postings
      .join(counts, Seq("term"))
      .select(
        $"doc_id",
        ($"tf".cast("decimal(12,0)") *
          X.r6($"n_total".cast("double") / $"cf".cast("double"))
            .cast("decimal(18,6)")).as("rterm"),
        $"tf")
      .groupBy($"doc_id")
      .agg(sum($"rterm").as("sr"), sum($"tf").as("n_tokens"))
      .select(
        $"doc_id",
        $"n_tokens",
        X.r6($"sr".cast("double") / $"n_tokens".cast("double")).as("rarity6"))
      .orderBy($"doc_id")
  }

  private def lmUnigram(s: SparkSession, d: String): DataFrame =
    lmUnigramOf(docs(s, d))

  // the oracle-side mirror of bm25TokensOf, shared by all three oracles
  private val FtCte =
    "tok AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS term " +
      "FROM documents), " +
      "ft AS (SELECT doc_id, term FROM tok " +
      "WHERE regexp_full_match(term,'[a-z0-9]{3,}')), " +
      "cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM ft GROUP BY 1), " +
      "tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ft)"

  private val LmUnigramSql =
    s"WITH $FtCte " +
      "SELECT term, cf, n_total, " +
      "floor(CAST(cf AS DOUBLE) / CAST(n_total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS p6 " +
      "FROM cf CROSS JOIN tot ORDER BY cf DESC, term"

  /** Per-doc score frame (doc_id, n_tokens, sr): the decimal-exact sum
    * of per-token rounded rarities — the seam q_lm_score and q_lm_bucket
    * share, parameterized by the token and count frames so the
    * continuous serve can feed index-derived counts.
    */
  private[graft] def rarityAggOf(ft: DataFrame, counts: DataFrame): DataFrame = {
    import ft.sparkSession.implicits._
    ft.join(counts, Seq("term"))
      .select(
        $"doc_id",
        X.r6($"n_total".cast("double") / $"cf".cast("double")).as("r"))
      .groupBy($"doc_id")
      .agg(
        sum($"r".cast("decimal(38,6)")).as("sr"),
        count(lit(1)).as("n_tokens"))
  }

  /** q_lm_score — every document's mean token rarity. Total over the
    * corpus: a document with zero model tokens (nothing survives the
    * tokenizer) emits n_tokens = 0 with a NULL score rather than
    * disappearing — the curation caller decides what an unscorable doc
    * means.
    */
  private[graft] def lmScoreOf(docsDf: DataFrame, agg: DataFrame): DataFrame = {
    import docsDf.sparkSession.implicits._
    docsDf
      .select($"doc_id")
      .join(agg, Seq("doc_id"), "left")
      .select(
        $"doc_id",
        coalesce($"n_tokens", lit(0L)).as("n_tokens"),
        when(
          $"n_tokens" > 0,
          X.r6($"sr".cast("double") / $"n_tokens".cast("double")))
          .as("rarity6"))
      .orderBy($"doc_id")
  }

  private def lmScore(s: SparkSession, d: String): DataFrame = {
    val ft = TextOps.bm25TokensOf(docs(s, d))
    lmScoreOf(docs(s, d), rarityAggOf(ft, unigramCountsOf(ft)))
  }

  private val ScoreCtes =
    s"WITH $FtCte, " +
      "sc AS (SELECT doc_id, floor(CAST(n_total AS DOUBLE) / CAST(cf AS DOUBLE) " +
      "* 1e6 + 0.5) / 1e6 AS r FROM ft JOIN cf USING (term) CROSS JOIN tot), " +
      "agg AS (SELECT doc_id, CAST(sum(CAST(r AS DECIMAL(38,6))) AS DOUBLE) AS sr, " +
      "CAST(count(*) AS BIGINT) AS n_tokens FROM sc GROUP BY 1), " +
      "score AS (SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens, " +
      "CASE WHEN a.n_tokens > 0 THEN " +
      "floor(a.sr / a.n_tokens * 1e6 + 0.5) / 1e6 END AS rarity6 " +
      "FROM documents d LEFT JOIN agg a USING (doc_id))"

  private val LmScoreSql =
    ScoreCtes + " SELECT doc_id, n_tokens, rarity6 FROM score ORDER BY doc_id"

  /** q_lm_bucket — the CCNet head/middle/tail assignment: per LANGUAGE,
    * scored documents ranked by rarity (commonest language first) and
    * cut into terciles with ntile(3) — bucket 1 is the "head" CCNet
    * keeps unconditionally, 3 the "tail" it drops or down-samples. The
    * rank order is total (rarity6, then doc_id), so the assignment is
    * deterministic under ties; unscorable docs (n_tokens = 0) carry no
    * rank and are excluded — q_lm_score still reports them. One window
    * over the per-language partition: the same single-exchange shape as
    * every q_win_* operator, and languages partition a corpus far finer
    * than executor counts at 100 TB.
    */
  private def lmBucket(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ft = TextOps.bm25TokensOf(docs(s, d))
    val scored = lmScoreOf(docs(s, d), rarityAggOf(ft, unigramCountsOf(ft)))
      .filter($"n_tokens" > 0)
    val w = Window.partitionBy($"lang").orderBy($"rarity6", $"doc_id")
    scored
      .join(docs(s, d).select($"doc_id", $"lang"), Seq("doc_id"))
      .select(
        $"doc_id",
        $"lang",
        $"rarity6",
        ntile(3).over(w).cast("long").as("bucket"))
      .orderBy($"doc_id")
  }

  private val LmBucketSql =
    ScoreCtes +
      " SELECT s.doc_id, d.lang, s.rarity6, " +
      "CAST(ntile(3) OVER (PARTITION BY d.lang ORDER BY s.rarity6, s.doc_id) " +
      "AS BIGINT) AS bucket " +
      "FROM score s JOIN documents d USING (doc_id) WHERE s.n_tokens > 0 " +
      "ORDER BY s.doc_id"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_lm_unigram", lmUnigram, Some(LmUnigramSql)),
    QueryDef("q_lm_score", lmScore, Some(LmScoreSql)),
    QueryDef("q_lm_bucket", lmBucket, Some(LmBucketSql)))
}
