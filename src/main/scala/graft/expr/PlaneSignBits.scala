package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All random-hyperplane sign bands of one embedding row in a single fused
  * loop — the map-side LSH kernel of q_dedup_embed_rh.
  *
  * Input: `vec ARRAY<FLOAT>` and the broadcast-literal plane matrix
  * `planes ARRAY<ARRAY<FLOAT>>` (bands·bitsPerBand rows). Output:
  * `ARRAY<BIGINT>` of `planes.length / bitsPerBand` band values, where
  * band j's bit k is set iff `dot(vec, planes[bitsPerBand·j + k]) > 0` —
  * exactly the `when(dot > 0d, 1L<<k).otherwise(0L)` sum it replaces, with
  * the same strict-left-fold dot as [[DotProduct]] (bit-identical signs vs
  * the DuckDB oracle literals) and the same null contract: a null dot
  * (null vec, length mismatch, null element) contributes a 0 bit and the
  * band values themselves are never null.
  *
  * Why fused: the per-bit formulation builds 32 independent expression
  * trees that each re-decode the vector and the literal; one expression =
  * one pass over the planes with the vector decoded once, inside a single
  * short whole-stage-codegen block — the shape you want for the per-row
  * signature pass over a 100 TB corpus.
  */
case class PlaneSignBits(left: Expression, right: Expression, bitsPerBand: Int)
    extends BinaryExpression {

  require(bitsPerBand > 0 && bitsPerBand <= 63, s"bitsPerBand=$bitsPerBand")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "plane_sign_bits"

  override def eval(input: InternalRow): Any = {
    val planes = right.eval(input).asInstanceOf[ArrayData]
    val vec = left.eval(input).asInstanceOf[ArrayData]
    val nPlanes = planes.numElements()
    val bands = new Array[Long](nPlanes / bitsPerBand)
    var m = 0
    while (m < nPlanes) {
      val p = planes.getArray(m)
      var positive = false
      if (vec != null && p != null && vec.numElements() == p.numElements()) {
        var s = 0d
        var i = 0
        var anyNull = false
        val n = vec.numElements()
        while (i < n && !anyNull) {
          if (vec.isNullAt(i) || p.isNullAt(i)) anyNull = true
          else s += vec.getFloat(i).toDouble * p.getFloat(i).toDouble
          i += 1
        }
        positive = !anyNull && s > 0d
      }
      if (positive) bands(m / bitsPerBand) |= 1L << (m % bitsPerBand)
      m += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecG = left.genCode(ctx)
    val planesG = right.genCode(ctx)
    val nPlanes = ctx.freshName("psbNPlanes")
    val bands = ctx.freshName("psbBands")
    val m = ctx.freshName("psbM")
    val p = ctx.freshName("psbP")
    val pos = ctx.freshName("psbPos")
    val s = ctx.freshName("psbS")
    val i = ctx.freshName("psbI")
    val n = ctx.freshName("psbN")
    val anyNull = ctx.freshName("psbAnyNull")
    val vecNull = if (left.nullable) vecG.isNull.toString else "false"
    ev.copy(
      code = code"""
        |${vecG.code}
        |${planesG.code}
        |int $nPlanes = ${planesG.value}.numElements();
        |long[] $bands = new long[$nPlanes / $bitsPerBand];
        |for (int $m = 0; $m < $nPlanes; $m++) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $p = ${planesG.value}.getArray($m);
        |  boolean $pos = false;
        |  if (!$vecNull && $p != null) {
        |    int $n = ${vecG.value}.numElements();
        |    if ($n == $p.numElements()) {
        |      double $s = 0d;
        |      boolean $anyNull = false;
        |      for (int $i = 0; $i < $n && !$anyNull; $i++) {
        |        if (${vecG.value}.isNullAt($i) || $p.isNullAt($i)) { $anyNull = true; }
        |        else { $s += (double) ${vecG.value}.getFloat($i) * (double) $p.getFloat($i); }
        |      }
        |      $pos = !$anyNull && $s > 0d;
        |    }
        |  }
        |  if ($pos) $bands[$m / $bitsPerBand] |= 1L << ($m % $bitsPerBand);
        |}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
        |""".stripMargin,
      isNull =
        org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PlaneSignBits {
  /** Column-level entry point: band values of `vec` against `planes`. */
  def apply(vec: Column, planes: Column, bitsPerBand: Int): Column =
    GraftBridge.column(
      PlaneSignBits(
        GraftBridge.expression(vec),
        GraftBridge.expression(planes),
        bitsPerBand))
}
