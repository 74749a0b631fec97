package graft

import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}

/** The spark.sql.extensions entry point must inject the same optimizer
  * rule graft.T registers ad-hoc (functional effect of the rule itself is
  * plan-asserted in PlanShapeSpec).
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects NanoTsPushdown as an optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = GraftBridge.optimizerRules(ext, spark)
    assert(rules.contains(graft.plans.NanoTsPushdown))
  }
}
