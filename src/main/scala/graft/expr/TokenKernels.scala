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

  /** All 3-shingle hashes in one pass over the token-hash array —
    * `array_sort(array_distinct(transform(sequence(1, n-2), i =>
    * combine(combine(ht[i], ht[i+1]), ht[i+2]))))` with combine(a, b) =
    * (a·131 + b) mod P, degrading to the single whole-array fold
    * `[aggregate(ht, 0, combine)]` below 3 tokens — exactly the
    * order-sensitive shingle set of the ngram dedup.
    */
  def shingleHashes(ht: ArrayData, p: Long): ArrayData = {
    val n = ht.numElements()
    if (n >= 3) {
      val buf = new Array[Long](n - 2)
      var i = 0
      while (i < n - 2) {
        buf(i) = ((ht.getLong(i) * 131L + ht.getLong(i + 1)) % p * 131L +
          ht.getLong(i + 2)) % p
        i += 1
      }
      java.util.Arrays.sort(buf)
      var m = 0
      var j = 0
      while (j < buf.length) {
        if (m == 0 || buf(m - 1) != buf(j)) { buf(m) = buf(j); m += 1 }
        j += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(buf, m))
    } else {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc * 131L + ht.getLong(i)) % p; i += 1 }
      new GenericArrayData(Array(acc))
    }
  }

  /** Adjacent-pair expansion over a token array —
    * `transform(sequence(1, n-1), i => concat(tk[i-1], ' ', tk[i]))`.
    * Contract: callers filter to n ≥ 2 first (as q_text_ngrams does);
    * below that the composed chain produces out-of-bounds nulls and this
    * kernel returns an empty array instead.
    */
  def bigrams(tk: ArrayData): ArrayData = {
    val n = tk.numElements()
    val out = new Array[AnyRef](math.max(0, n - 1))
    var i = 0
    while (i + 1 < n) {
      out(i) = UTF8String.concat(tk.getUTF8String(i), Space, tk.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document bigram multiplicity summary in one pass:
    * [total bigrams, distinct bigrams, top bigram count] — the inputs of
    * the Gopher/C4-style intra-document repetition signals. Exact string
    * counting (same concatenated bigram keys as [[bigrams]]), so the
    * fractions derived downstream match a count-by-bigram oracle
    * bit-for-bit; tokens cannot contain the separator, so concat equality
    * is pair equality.
    */
  def bigramStats(tk: ArrayData): ArrayData = {
    val n = tk.numElements()
    val total = math.max(0, n - 1)
    val counts = new java.util.HashMap[UTF8String, Int](total * 2)
    var top = 0
    var i = 0
    while (i + 1 < n) {
      val bg = UTF8String.concat(tk.getUTF8String(i), Space, tk.getUTF8String(i + 1))
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array(total.toLong, counts.size.toLong, top.toLong))
  }

  /** All K-gram strings in one pass over the token array —
    * `transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(tk, i, k)))`
    * without the per-position interpreted lambda, slice allocation and
    * sequence materialization the composed HOF chain pays (HOFs are
    * CodegenFallback). Byte-identical join semantics to concat_ws: null
    * tokens are skipped without a separator (split output never contains
    * them, but the contract is preserved). n < k yields an empty array
    * (callers filter size ≥ k first, as the composed form's callers do).
    */
  def grams(tk: ArrayData, k: Int): ArrayData = {
    val n = tk.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i); i += 1 }
    val out = new Array[AnyRef](n - k + 1)
    i = 0
    while (i <= n - k) {
      out(i) = UTF8String.concatWs(
        Space, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The BM25/LM tokenizer fused —
    * `explode(split(lower(text), ' ')) ... rlike("^[a-z0-9]{3,}$")` as one
    * pass: split on ' ', lowercase each token (UTF8String.toLowerCase,
    * the same collation-free lowering SQL lower() applies; lowering the
    * whole text first is equivalent because no Unicode lowercase mapping
    * produces or consumes U+0020), keep tokens of ≥ 3 bytes that are
    * entirely [a-z0-9] (the anchored class admits only ASCII, so a byte
    * test is exact — any multi-byte char fails the class either way).
    * Removes the per-token regex machine and the dropped-token explode
    * rows the composed chain pays.
    */
  def bm25Tokens(s: UTF8String): ArrayData = {
    val parts = s.split(Space, -1)
    val out = new Array[AnyRef](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val lt = parts(i).toLowerCase
      val b = lt.getBytes
      if (b.length >= 3) {
        var j = 0
        var ok = true
        while (ok && j < b.length) {
          val c = b(j)
          ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
          j += 1
        }
        if (ok) { out(n) = lt; n += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** All K-window md5 fingerprints in one pass —
    * `transform(sequence(1, n-k+1), i -> md5(array_join(slice(tk, i, k),
    * ' ')))` fused: per position the digest is fed the window's token
    * bytes joined by ' ' (array_join skips nulls exactly like concat_ws)
    * and rendered as the same lowercase hex string the md5() SQL
    * function emits. n < k yields an empty array.
    */
  def gramMd5Hex(tk: ArrayData, k: Int): ArrayData = {
    val n = tk.numElements()
    if (n < k) return new GenericArrayData(new Array[AnyRef](0))
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tk.isNullAt(i)) null else tk.getUTF8String(i).getBytes
      i += 1
    }
    val sep = " ".getBytes
    val md = md5Tl.get()
    val out = new Array[AnyRef](n - k + 1)
    i = 0
    while (i <= n - k) {
      md.reset()
      var j = i
      var first = true
      while (j < i + k) {
        if (toks(j) != null) {
          if (!first) md.update(sep)
          md.update(toks(j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Byte](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((d(b) >> 4) & 0xf).toByte
        hex(2 * b + 1) = HexDigits(d(b) & 0xf).toByte
        b += 1
      }
      out(i) = UTF8String.fromBytes(hex)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Order-sensitive rolling polynomial hash over the token stream —
    * `aggregate(split(text, ' '), 0L, (acc, t) => (acc·131 +
    * ascii(t)·131 + length(t)) mod P)`. ascii is Spark's: the code point
    * of the first character (0 when empty), identical to DuckDB's.
    */
  def rollingFingerprint(s: UTF8String, p: Long): Long = {
    val parts = s.split(Space, -1)
    var acc = 0L
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      val first = t.substring(0, 1)
      val a = if (first.numChars() > 0) first.toString.codePointAt(0) else 0
      acc = Math.floorMod(acc * 131L + (a * 131 + t.numChars()).toLong, p)
      i += 1
    }
    acc
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

/** `shingleHashes` as an expression over the hashed-token array (see
  * [[TokenKernels.shingleHashes]]); never null from a non-null child.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(ht: Any): Any =
    TokenKernels.shingleHashes(ht.asInstanceOf[ArrayData], graft.ops.Hashing.P)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.expr.TokenKernels.shingleHashes($c, ${graft.ops.Hashing.P}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(c: Column): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(c)))
}

/** `grams` as an expression over a token array (see
  * [[TokenKernels.grams]]) — the fused K-gram emitter of the passage /
  * boilerplate families.
  */
case class Grams(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "grams"

  override def nullSafeEval(tk: Any): Any =
    TokenKernels.grams(tk.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenKernels.grams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Grams {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(Grams(GraftBridge.expression(c), k))
}

/** `bm25Tokens` as an expression over the raw text (see
  * [[TokenKernels.bm25Tokens]]) — the fused BM25/LM tokenizer.
  */
case class Bm25Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "bm25_tokens"

  override def nullSafeEval(s: Any): Any =
    TokenKernels.bm25Tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenKernels.bm25Tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Bm25Tokens {
  def apply(c: Column): Column =
    GraftBridge.column(Bm25Tokens(GraftBridge.expression(c)))
}

/** `gramMd5Hex` as an expression over a token array (see
  * [[TokenKernels.gramMd5Hex]]) — the fused 50-token window fingerprint
  * of the passage-cc family.
  */
case class GramMd5Hex(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "gram_md5_hex"

  override def nullSafeEval(tk: Any): Any =
    TokenKernels.gramMd5Hex(tk.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenKernels.gramMd5Hex($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramMd5Hex {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(GramMd5Hex(GraftBridge.expression(c), k))
}

/** `bigrams` as an expression over a token array (see
  * [[TokenKernels.bigrams]]).
  */
case class BigramConcat(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def prettyName: String = "bigram_concat"

  override def nullSafeEval(tk: Any): Any =
    TokenKernels.bigrams(tk.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenKernels.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramConcat {
  def apply(c: Column): Column =
    GraftBridge.column(BigramConcat(GraftBridge.expression(c)))
}

/** `bigramStats` as an expression over a token array (see
  * [[TokenKernels.bigramStats]]); never null from a non-null child (an
  * empty or 1-token array yields [0, 0, 0]).
  */
case class BigramStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "bigram_stats"

  override def nullSafeEval(tk: Any): Any =
    TokenKernels.bigramStats(tk.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TokenKernels.bigramStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramStats {
  def apply(c: Column): Column =
    GraftBridge.column(BigramStats(GraftBridge.expression(c)))
}

/** `rollingFingerprint` as an expression over the raw text (see
  * [[TokenKernels.rollingFingerprint]]).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(s: Any): Any =
    TokenKernels.rollingFingerprint(s.asInstanceOf[UTF8String], graft.ops.Hashing.P)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.expr.TokenKernels.rollingFingerprint($c, ${graft.ops.Hashing.P}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  def apply(c: Column): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(c)))
}
