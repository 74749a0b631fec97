package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet filter pushdown through graft's nanosecond-timestamp
  * conversion.
  *
  * The testdata stores TIMESTAMP(NANOS), which Spark 4 can only read as raw
  * longs ([[graft.T]] then projects `timestamp_micros(ts div 1000)`). A
  * predicate on the converted column — `converted >= TIMESTAMP'…'` — is a
  * function of the raw column, so FileSourceStrategy cannot push it into
  * the scan and a day-slice reads the entire table. At 100 TB that is the
  * difference between one row group and the whole corpus.
  *
  * This rule rewrites comparisons of `MicrosToTimestamp(IntegralDivide(c,
  * 1000))` against timestamp literals into equivalent raw-long comparisons
  * on `c` (exact for non-negative epochs, which is all the data we accept):
  *
  *   conv >= L  ⇔  c >= L·1000          conv >  L  ⇔  c >= (L+1)·1000
  *   conv <  L  ⇔  c <  L·1000          conv <= L  ⇔  c <  (L+1)·1000
  *   conv =  L  ⇔  L·1000 <= c < L·1000 + 1000
  *
  * Registered via [[graft.GraftExtensions]] (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations` (runs after
  * constant folding, before physical planning, so the rewritten predicate
  * is a plain column-vs-literal comparison FileSourceStrategy pushes down).
  */
object NanoTsPushdown extends Rule[LogicalPlan] {

  /** Matches the conversion pattern and yields the raw long column. */
  private object Conv {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(c, Literal(1000L, LongType), _))
          if c.dataType == LongType =>
        Some(c)
      case _ => None
    }
  }

  /** Matches a foldable timestamp literal, yielding epoch micros. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType) => Some(us)
      case _ => None
    }
  }

  private def nanos(us: Long): Literal = Literal(us * 1000L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(Conv(c), TsLit(us)) => GreaterThanOrEqual(c, nanos(us))
      case GreaterThan(Conv(c), TsLit(us)) => GreaterThanOrEqual(c, nanos(us + 1))
      case LessThan(Conv(c), TsLit(us)) => LessThan(c, nanos(us))
      case LessThanOrEqual(Conv(c), TsLit(us)) => LessThan(c, nanos(us + 1))
      case EqualTo(Conv(c), TsLit(us)) =>
        And(GreaterThanOrEqual(c, nanos(us)), LessThan(c, nanos(us + 1)))
      // literal-on-left mirror forms
      case LessThanOrEqual(TsLit(us), Conv(c)) => GreaterThanOrEqual(c, nanos(us))
      case LessThan(TsLit(us), Conv(c)) => GreaterThanOrEqual(c, nanos(us + 1))
      case GreaterThan(TsLit(us), Conv(c)) => LessThan(c, nanos(us))
      case GreaterThanOrEqual(TsLit(us), Conv(c)) => LessThan(c, nanos(us + 1))
      case EqualTo(TsLit(us), Conv(c)) =>
        And(GreaterThanOrEqual(c, nanos(us)), LessThan(c, nanos(us + 1)))
    }
}
