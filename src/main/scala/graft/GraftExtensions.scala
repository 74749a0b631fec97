package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Production registration point for graft's Catalyst machinery — the
  * `SparkSessionExtensions` mechanism third-party engines use:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * injects [[graft.plans.NanoTsPushdown]] into every session built on the
  * cluster, so nanosecond-timestamp pushdown works for any user of the
  * library without touching their code. [[graft.T]] additionally
  * self-registers the rule through `experimental.extraOptimizations` as a
  * fallback for ad-hoc sessions created without the conf; both paths are
  * idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    extensions.injectOptimizerRule(_ => plans.NanoTsPushdown)
}
