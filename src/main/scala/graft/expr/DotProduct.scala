package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused dot product over two ARRAY<FLOAT> columns as one codegen'd loop —
  * the hot inner kernel of every similarity/embedding-dedup operator
  * (q_sim_cosine / q_sim_topk / q_sim_ann / q_dedup_embed / norms).
  *
  * Semantically identical to the higher-order formulation
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, _+_)` (see [[graft.ops.Vec]]):
  * a strict left fold, so every IEEE add happens in the same order and the
  * result is bit-identical to the DuckDB oracle's list_reduce — but without
  * materializing the zipped intermediate array per row, without the
  * per-element lambda-call overhead, and with zero allocation. Mismatched
  * lengths or null elements yield null, exactly as null-padded zip_with does.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Must be true even for non-nullable children: mismatched lengths or
    * null elements produce null from non-null inputs. Without this,
    * nullSafeCodeGen's non-nullable branch never declares `ev.isNull`, the
    * generated `isNull = true` assignment references an undeclared
    * variable, and janino rejects the class ("not an rvalue") — silently
    * de-optimizing every stage containing a dot over a filtered-non-null
    * embedding column to interpreted execution.
    */
  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        // Locals must be freshName'd: with non-nullable inputs nullSafeCodeGen
        // omits its scoping braces, so two instances of this expression in one
        // generated function would otherwise redefine the same variables.
        val n = ctx.freshName("dotN")
        val s = ctx.freshName("dotS")
        val i = ctx.freshName("dotI")
        s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $s = 0d;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        |  }
        |  ${ev.value} = $s;
        |}
        |""".stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))
}
