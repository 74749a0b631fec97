package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the tokenize→hash→signature chain of the dedup family.
  *
  * The composed Catalyst forms — `transform(t, tk => h32(tk))`,
  * `array_min(transform(...))` per MinHash lane, sixteen `aggregate` folds
  * for SimHash — are higher-order functions, and HOFs are CodegenFallback:
  * every element pays an interpreted eval of its lambda
  * (`conv(substring(md5(tk), 1, 8), 16, 10)` per token, with hex-string
  * intermediates), multiplied by 8 lanes / 16 bits re-walking the array.
  * Each kernel below does the same arithmetic in one tight JVM loop per
  * row, bit-identical to the expression chain it replaces (and so to the
  * DuckDB oracle SQL, which is unchanged).
  */
object TokenKernels {

  private val Space = UTF8String.fromString(" ")

  private val md5Tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** h32: first 4 md5 bytes as an unsigned 32-bit value — exactly
    * `conv(substring(md5(t), 1, 8), 16, 10)`.
    */
  private def h32(token: UTF8String): Long = {
    val md = md5Tl.get()
    md.reset()
    val d = md.digest(token.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Split on " " (the same UTF8String regex split `split(text, ' ')`
    * lowers to), optionally distinct the TOKENS, hash each, optionally
    * sort — the `array_sort(transform(array_distinct(split(..)), h32))`
    * and `transform(split(..), h32)` chains.
    */
  def tokenHashes(s: UTF8String, sortedDistinct: Boolean): ArrayData = {
    val parts = s.split(Space, -1)
    val out =
      if (sortedDistinct) {
        val seen = new java.util.HashSet[UTF8String](parts.length * 2)
        val buf = new Array[Long](parts.length)
        var n = 0
        var i = 0
        while (i < parts.length) {
          if (seen.add(parts(i))) { buf(n) = h32(parts(i)); n += 1 }
          i += 1
        }
        val arr = java.util.Arrays.copyOf(buf, n)
        java.util.Arrays.sort(arr)
        arr
      } else {
        val arr = new Array[Long](parts.length)
        var i = 0
        while (i < parts.length) { arr(i) = h32(parts(i)); i += 1 }
        arr
      }
    new GenericArrayData(out)
  }

  /** All MinHash lane minima in one pass: lane j =
    * `array_min(transform(th, h => (mhA(j)*h + mhB(j)) % P))`. Null
    * elements are skipped exactly as array_min skips them; an empty (or
    * all-null) input yields null, as array_min's empty min does.
    */
  def minHashLanes(th: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val lanes = as.length
    val mins = Array.fill(lanes)(Long.MaxValue)
    val n = th.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!th.isNullAt(i)) {
        seen = true
        val h = th.getLong(i)
        var j = 0
        while (j < lanes) {
          val v = (as(j) * h + bs(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  /** The full SimHash value in one pass: bit b of the result is set iff
    * `aggregate(th, 0L, (acc, x) => acc + ((x >> b) % 2) * 2 - 1) > 0` —
    * the ±1 vote per token per bit, all `bits` votes accumulated in one
    * walk of the array.
    */
  def simHash(th: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = th.numElements()
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += ((h >> b) % 2) * 2 - 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

/** `tokenHashes` as an expression: ARRAY<BIGINT> of md5-derived token
  * hashes; null string → null (callers coalesce upstream).
  */
case class TokenHashes(child: Expression, sortedDistinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "token_hashes"

  override def nullSafeEval(s: Any): Any =
    TokenKernels.tokenHashes(s.asInstanceOf[UTF8String], sortedDistinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.expr.TokenKernels.tokenHashes($c, $sortedDistinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashes {
  def apply(c: Column, sortedDistinct: Boolean): Column =
    GraftBridge.column(
      TokenHashes(GraftBridge.expression(c), sortedDistinct))
}

/** `minHashLanes` as an expression over the hashed-token array. Nullable
  * even for a non-null child: an empty input has no minimum (the
  * [[DotProduct]] nullable lesson — declaring otherwise breaks codegen).
  */
case class MinHashLanes(child: Expression) extends UnaryExpression {

  import graft.ops.Hashing

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_lanes"

  @transient private lazy val as =
    (0 until Hashing.NumHashes).map(Hashing.mhA).toArray
  @transient private lazy val bs =
    (0 until Hashing.NumHashes).map(Hashing.mhB).toArray

  override def nullSafeEval(th: Any): Any =
    TokenKernels.minHashLanes(th.asInstanceOf[ArrayData], as, bs, Hashing.P)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      c => {
        val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
        val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
        s"""
        |${ev.value} = graft.expr.TokenKernels.minHashLanes(
        |  $c, $asRef, $bsRef, ${Hashing.P}L);
        |${ev.isNull} = ${ev.value} == null;
        |""".stripMargin
      })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashLanes {
  def apply(c: Column): Column =
    GraftBridge.column(MinHashLanes(GraftBridge.expression(c)))
}

/** `simHash` as an expression: the 16-bit signature in one walk; a null
  * input array folds to 0, exactly as the composed
  * `when(aggregate(null, ..) > 0, ..).otherwise(0)` sum does.
  */
case class SimHashFold(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "simhash_fold"

  override def eval(input: InternalRow): Any = {
    val th = child.eval(input)
    if (th == null) 0L
    else TokenKernels.simHash(th.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val childNull = if (child.nullable) c.isNull.toString else "false"
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = $childNull
        |  ? 0L
        |  : graft.expr.TokenKernels.simHash(${c.value}, $bits);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFold {
  def apply(c: Column, bits: Int): Column =
    GraftBridge.column(SimHashFold(GraftBridge.expression(c), bits))
}
