package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftBridge}

/** Elementwise exact-decimal vector sum — the fused aggregate behind the
  * Lloyd decimal means (r19 opt, guide §4.1 / §2.4): the trainLloyd loop
  * used to `posexplode` every sample vector into dim× (grp, cell, pos, v)
  * rows, run a (grp, cell, pos)-keyed decimal mean, then a second
  * (grp, cell) aggregate to re-collect the centroid arrays — two shuffles
  * and a dim× row blow-up per Lloyd pass. This aggregate sums the
  * decimal-cast vectors elementwise in ONE (grp, cell) aggregation
  * (map-side partial combine, object-hash agg), so a pass is one shuffle
  * of k·|groups| slim buffers and the explode never happens.
  *
  * EXACTNESS CONTRACT (what keeps the trained centroids bit-identical to
  * the posexplode form): the input is the ALREADY-CAST
  * array<decimal(27,10)> (the caller applies Spark's own float→decimal
  * cast, so this expression never re-implements cast semantics); decimal
  * addition at a fixed scale is exact and order-independent, identical
  * to Spark's `sum(decimal(27,10))`; the output type is decimal(37,10) —
  * the exact result type of that `sum` — so the downstream
  * `(element / count).cast(float)` division sees the same operand types,
  * the same (38,11) result scale, and the same HALF_UP rounding as
  * before. Overflow past 37 digits yields NULL, matching non-ANSI sum.
  * IvfTrainSpec / PqSpec / SemanticDedupSpec pin trained values.
  *
  * Vectors of one group must share a length (the embedding-dim
  * contract); a mismatch fails loudly rather than mis-summing.
  */
case class VecDecimalSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[java.math.BigDecimal]]
    with UnaryLike[Expression] {

  // input contract: array<decimal(27,10)> (AbstractDataType is
  // private[sql], so the check is explicit rather than ExpectsInputTypes)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(d: DecimalType, _) if d.precision == 27 && d.scale == 10 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_decimal_sum expects array<decimal(27,10)>, got $t")
    }

  override def dataType: DataType =
    ArrayType(DecimalType(37, 10), containsNull = true)

  override def nullable: Boolean = true

  override def prettyName: String = "vec_decimal_sum"

  override def createAggregationBuffer(): Array[java.math.BigDecimal] = null

  override def update(
      buffer: Array[java.math.BigDecimal],
      input: InternalRow): Array[java.math.BigDecimal] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val b =
        if (buffer == null) Array.fill(n)(java.math.BigDecimal.ZERO)
        else buffer
      require(
        b.length == n,
        s"vec_decimal_sum: vector length $n != accumulated ${b.length}")
      var i = 0
      while (i < n) {
        // a null element contributes nothing — Spark's sum() semantics
        if (!arr.isNullAt(i))
          b(i) = b(i).add(arr.getDecimal(i, 27, 10).toJavaBigDecimal)
        i += 1
      }
      b
    }
  }

  override def merge(
      a: Array[java.math.BigDecimal],
      b: Array[java.math.BigDecimal]): Array[java.math.BigDecimal] =
    if (a == null) b
    else if (b == null) a
    else {
      require(
        a.length == b.length,
        s"vec_decimal_sum: merge of lengths ${a.length} != ${b.length}")
      var i = 0
      while (i < a.length) { a(i) = a(i).add(b(i)); i += 1 }
      a
    }

  override def eval(buffer: Array[java.math.BigDecimal]): Any =
    if (buffer == null) null
    else
      new GenericArrayData(buffer.map { bd =>
        val d = Decimal(bd)
        // overflow past decimal(37,10) → null, matching non-ANSI sum()
        if (d.changePrecision(37, 10)) d else null
      })

  /** Wire format: element count, then per element a length-prefixed
    * unscaled BigInteger byte array (scale is fixed at 10 by exact
    * addition over scale-10 inputs).
    */
  override def serialize(buffer: Array[java.math.BigDecimal]): Array[Byte] = {
    if (buffer == null) return Array.emptyByteArray
    val parts = buffer.map(bd => bd.setScale(10).unscaledValue.toByteArray)
    val bb = java.nio.ByteBuffer.allocate(4 + parts.map(4 + _.length).sum)
    bb.putInt(buffer.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[java.math.BigDecimal] = {
    if (bytes == null || bytes.isEmpty) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    Array.fill(n) {
      val len = bb.getInt()
      val p = new Array[Byte](len)
      bb.get(p)
      new java.math.BigDecimal(new java.math.BigInteger(p), 10)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecDecimalSum =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VecDecimalSum {
  /** Column-level entry point over an array<decimal(27,10)> column. */
  def apply(c: Column): Column =
    GraftBridge.column(
      VecDecimalSum(GraftBridge.expression(c)).toAggregateExpression())
}
