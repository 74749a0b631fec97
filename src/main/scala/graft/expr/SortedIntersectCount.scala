package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** |A ∩ B| for two SORTED ARRAY<BIGINT> columns via a linear merge walk —
  * the hot inner loop of set-similarity joins (q_dedup_near).
  *
  * Spark's built-in array_intersect builds a hash set per row pair; on a
  * candidate-pair join that is O(pairs × set-build). With token sets
  * pre-hashed and pre-sorted once per document, the per-pair cost drops to
  * a branchy O(n+m) scan with zero allocation, and doGenCode keeps it
  * inside whole-stage codegen. Duplicate values (hash collisions) advance
  * both sides, i.e. multiset-intersection semantics.
  *
  * Inputs must be sorted ascending (array_sort upstream); nulls inside the
  * arrays are not expected (null input arrays yield null).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        // Locals must be freshName'd: with non-nullable inputs nullSafeCodeGen
        // omits its scoping braces, so two instances of this expression in one
        // generated function would otherwise redefine the same variables.
        val i = ctx.freshName("sicI")
        val j = ctx.freshName("sicJ")
        val c = ctx.freshName("sicC")
        val na = ctx.freshName("sicNa")
        val nb = ctx.freshName("sicNb")
        val x = ctx.freshName("sicX")
        val y = ctx.freshName("sicY")
        s"""
        |int $i = 0, $j = 0, $c = 0;
        |int $na = $a.numElements(), $nb = $b.numElements();
        |while ($i < $na && $j < $nb) {
        |  long $x = $a.getLong($i);
        |  long $y = $b.getLong($j);
        |  if ($x == $y) { $c++; $i++; $j++; }
        |  else if ($x < $y) { $i++; }
        |  else { $j++; }
        |}
        |${ev.value} = $c;
        |""".stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
