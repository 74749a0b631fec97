package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Symmetric int8 quantization summary of a float embedding in one fused
  * pass — the storage-path math of a 100 TB vector pipeline (4× smaller
  * vectors, dot products in integer SIMD): scale = max|v|/127,
  * q_i = clamp(floor(v_i/scale + 0.5), ±127), and the reconstruction
  * error stats a pipeline gates on. Output [scale, max_abs_err,
  * sum_sq_err, n_saturated]. Every step is plain IEEE arithmetic —
  * explicit floor(x + 0.5) rounding (graft.X: `round()` half-away
  * differs between JVM and DuckDB on negative halves), the error
  * sum-of-squares a left fold in index order — so the oracle matches
  * bit-for-bit. The all-zero (or empty) vector quantizes to scale 0 with
  * zero error by definition.
  */
object QuantizeKernel {
  def quantStats(e: ArrayData): ArrayData = {
    val n = e.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(e.getFloat(i).toDouble)
      if (v > amax) amax = v
      i += 1
    }
    if (n == 0 || amax == 0.0)
      return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0))
    val scale = amax / 127.0
    var maxErr = 0.0
    var sse = 0.0
    var sat = 0L
    i = 0
    while (i < n) {
      val v = e.getFloat(i).toDouble
      var q = math.floor(v / scale + 0.5)
      if (q > 127.0) q = 127.0
      if (q < -127.0) q = -127.0
      if (q == 127.0 || q == -127.0) sat += 1
      val err = v - q * scale
      val ae = math.abs(err)
      if (ae > maxErr) maxErr = ae
      sse += err * err
      i += 1
    }
    new GenericArrayData(Array(scale, maxErr, sse, sat.toDouble))
  }
}

case class QuantizeStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "quantize_stats"

  override def nullSafeEval(e: Any): Any =
    QuantizeKernel.quantStats(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.QuantizeKernel.quantStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeStats {
  def apply(c: Column): Column =
    GraftBridge.column(QuantizeStats(GraftBridge.expression(c)))
}
