package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Score one embedding row against every cell of a broadcast IVF codebook in
  * a single fused loop — the map-side cell-assignment kernel of q_sim_ivf /
  * q_sim_ivf_trained.
  *
  * Input: `vec ARRAY<FLOAT>`, its precomputed squared norm `n2 DOUBLE`, and
  * the codebook `cb ARRAY<STRUCT<c_id BIGINT, c ARRAY<FLOAT>, cn2 DOUBLE>>`
  * (one broadcast row, c_id-sorted). Output, per codebook entry in order:
  * `STRUCT<ccos DOUBLE, nid BIGINT>` with
  * `ccos = dot(vec, c) / (sqrt(n2) * sqrt(cn2))` and `nid = -c_id`, so
  * `array_max` over the result is the argmin assignment with a
  * (cos desc, c_id asc) tie-break and `reverse(array_sort(_))` ranks cells
  * for the probe — exactly the contract of the per-cell
  * `struct(cosine(dot(...)), -c_id)` projection it replaces.
  *
  * Why an expression and not k inline struct expressions: 16 independent
  * dot products in one Project exceed Spark's generated-method split threshold
  * and the split functions referenced out-of-scope locals — janino rejected
  * the class ("not an rvalue") and the whole assignment stage silently ran
  * interpreted. One expression = one short generated block that stays
  * inside whole-stage codegen, and the codebook struct is decoded once per
  * row instead of 16 element_at calls. The dot accumulation is the same
  * strict left fold as [[DotProduct]], so ccos is bit-identical to the
  * composed form (and to the DuckDB oracle).
  */
case class CodebookScores(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def vec = first
  private def n2 = second
  private def cb = third

  override def dataType: DataType = ArrayType(
    StructType(
      Seq(
        StructField("ccos", DoubleType, nullable = true),
        StructField("nid", LongType, nullable = true))),
    containsNull = false)

  override def nullable: Boolean = cb.nullable

  override def prettyName: String = "codebook_scores"

  override def eval(input: InternalRow): Any = {
    val cbV = cb.eval(input)
    if (cbV == null) return null
    val cbArr = cbV.asInstanceOf[ArrayData]
    val vecV = vec.eval(input).asInstanceOf[ArrayData]
    val n2V = n2.eval(input)
    val k = cbArr.numElements()
    val rows = new Array[Any](k)
    var j = 0
    while (j < k) {
      var ccos: Any = null
      var nid: Any = null
      if (!cbArr.isNullAt(j)) {
        val ct = cbArr.getStruct(j, 3)
        if (!ct.isNullAt(0)) nid = java.lang.Long.valueOf(-ct.getLong(0))
        if (vecV != null && n2V != null && !ct.isNullAt(1) && !ct.isNullAt(2)) {
          val c = ct.getArray(1)
          val n = vecV.numElements()
          if (n == c.numElements()) {
            var s = 0d
            var i = 0
            var anyNull = false
            while (i < n && !anyNull) {
              if (vecV.isNullAt(i) || c.isNullAt(i)) anyNull = true
              else s += vecV.getFloat(i).toDouble * c.getFloat(i).toDouble
              i += 1
            }
            if (!anyNull)
              ccos = java.lang.Double.valueOf(
                s / (java.lang.Math.sqrt(n2V.asInstanceOf[Double]) *
                  java.lang.Math.sqrt(ct.getDouble(2))))
          }
        }
      }
      rows(j) = new GenericInternalRow(Array[Any](ccos, nid))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecG = vec.genCode(ctx)
    val n2G = n2.genCode(ctx)
    val cbG = cb.genCode(ctx)
    val k = ctx.freshName("cbsK")
    val rows = ctx.freshName("cbsRows")
    val j = ctx.freshName("cbsJ")
    val ccos = ctx.freshName("cbsCcos")
    val nid = ctx.freshName("cbsNid")
    val ct = ctx.freshName("cbsCt")
    val carr = ctx.freshName("cbsC")
    val n = ctx.freshName("cbsN")
    val s = ctx.freshName("cbsS")
    val i = ctx.freshName("cbsI")
    val anyNull = ctx.freshName("cbsAnyNull")
    val vecNull = if (vec.nullable) vecG.isNull.toString else "false"
    val n2Null = if (n2.nullable) n2G.isNull.toString else "false"
    val cbNull = if (cb.nullable) cbG.isNull.toString else "false"
    ev.copy(code = code"""
        |${vecG.code}
        |${n2G.code}
        |${cbG.code}
        |boolean ${ev.isNull} = $cbNull;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  int $k = ${cbG.value}.numElements();
        |  Object[] $rows = new Object[$k];
        |  for (int $j = 0; $j < $k; $j++) {
        |    Object $ccos = null;
        |    Object $nid = null;
        |    if (!${cbG.value}.isNullAt($j)) {
        |      org.apache.spark.sql.catalyst.InternalRow $ct = ${cbG.value}.getStruct($j, 3);
        |      if (!$ct.isNullAt(0)) $nid = java.lang.Long.valueOf(-$ct.getLong(0));
        |      if (!$vecNull && !$n2Null && !$ct.isNullAt(1) && !$ct.isNullAt(2)) {
        |        org.apache.spark.sql.catalyst.util.ArrayData $carr = $ct.getArray(1);
        |        int $n = ${vecG.value}.numElements();
        |        if ($n == $carr.numElements()) {
        |          double $s = 0d;
        |          boolean $anyNull = false;
        |          for (int $i = 0; $i < $n && !$anyNull; $i++) {
        |            if (${vecG.value}.isNullAt($i) || $carr.isNullAt($i)) { $anyNull = true; }
        |            else { $s += (double) ${vecG.value}.getFloat($i) * (double) $carr.getFloat($i); }
        |          }
        |          if (!$anyNull) $ccos = java.lang.Double.valueOf(
        |            $s / (java.lang.Math.sqrt(${n2G.value}) * java.lang.Math.sqrt($ct.getDouble(2))));
        |        }
        |      }
        |    }
        |    $rows[$j] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |      new Object[]{$ccos, $nid});
        |  }
        |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
        |}
        |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression,
      newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CodebookScores {
  /** Column-level entry point: scores(vec, n2) against codebook `cb`. */
  def apply(vec: Column, n2: Column, cb: Column): Column =
    GraftBridge.column(
      CodebookScores(
        GraftBridge.expression(vec),
        GraftBridge.expression(n2),
        GraftBridge.expression(cb)))
}
