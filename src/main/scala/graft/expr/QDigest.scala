package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A DETERMINISTIC q-digest (Shrivastava et al., SenSys'04 — public
  * algorithm): the mergeable quantile sketch Spark lacks as persistable
  * state. `hll_sketch_agg` gives HLL state a binary-column life
  * (build per day → persist → `hll_union_agg` across days), but
  * `percentile_approx`'s KLL-style state is not exposed — so quantile
  * rollups either recompute from raw rows or lose mergeability. This
  * module is the quantile twin: per-day sketches persist as a parquet
  * BINARY column and re-aggregate associatively, with a PROVABLE rank
  * error bound and — unlike KLL — no randomness anywhere, so every
  * estimate is a pure function of the input multiset (the repo's
  * oracle-checkability contract).
  *
  * Structure: counts over the complete binary tree on the integer
  * universe [0, U), U = 2^logU (node id 1 = root; leaf for value v has
  * id U + v). `logU` is a per-column-domain parameter (default 17 —
  * the events table's cents domain): the build buffers EXACT leaf
  * counts, bounded by the universe, so narrow domains get the full
  * determinism contract for free. At a WIDE domain (logU up to 62) the
  * exact buffer no longer fits, so the build aggregator takes an
  * optional in-reduce re-compression cap: when the buffer exceeds it,
  * the partial compresses early. That trades the bit-level determinism
  * contract — early compression points depend on row partitioning, so
  * two runs may keep different node sets (each still within the rank
  * bound) — which is why the registry queries run cap-less at logU=17
  * and the wide form is an explicitly opted-into scale posture
  * (QDigestPropertySpec exercises both).
  *
  * Compression with threshold ceil(n/k) keeps ≤ 3k nodes and introduces
  * ≤ logU·n/k rank error (each leaf's mass can be absorbed upward at
  * most logU times, each absorption bounded by the threshold —
  * QDigestSpec asserts the bound on adversarial spiky data). Merging
  * sums count maps — commutative and associative, so merge order cannot
  * change the final recompressed bytes (QDigestSpec pins bit-equality
  * across orders).
  *
  * Total mass rides IN the sketch under reserved key 0 (node ids start
  * at 1), and the universe's logU rides in the header, so merged bytes
  * are self-describing — no side channel for n or the domain.
  */
object QDigest {

  /** Default universe: value cents in [0, 2^17) — covers the events
    * table's value domain (≤ $1310.71) with headroom; out-of-range
    * values clamp into the extreme buckets (a production column
    * parameterizes logU per domain; the error bound scales as logU/k).
    */
  val LogU = 17
  val U: Long = 1L << LogU

  /** Reserved buffer key carrying total count n. */
  private val NKey = 0L

  // Default-domain overloads (not default params: specs and folds use
  // these methods as function values, and eta-expansion can't fill a
  // default argument).
  def clamp(v: Long): Long = clamp(v, LogU)
  def add(b: Map[Long, Long], v: Long): Map[Long, Long] = add(b, v, LogU)
  def compress(counts: Map[Long, Long], k: Int): Array[(Long, Long)] =
    compress(counts, k, LogU)
  def serialize(counts: Map[Long, Long], k: Int): Array[Byte] =
    serialize(counts, k, LogU)

  def clamp(v: Long, logU: Int): Long =
    math.max(0L, math.min((1L << logU) - 1L, v))

  /** Leaf increment into a build buffer. */
  def add(b: Map[Long, Long], v: Long, logU: Int): Map[Long, Long] = {
    val leaf = (1L << logU) + clamp(v, logU)
    b.updated(leaf, b.getOrElse(leaf, 0L) + 1L)
      .updated(NKey, b.getOrElse(NKey, 0L) + 1L)
  }

  /** Key-wise sum — the merge of two buffers (and of two digests). */
  def sum(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (acc, (k, c)) =>
      acc + (k -> (acc.getOrElse(k, 0L) + c))
    }
  }

  /** Deterministic bottom-up q-digest compression: for each sibling pair
    * (level logU up to 1, ids ascending — a fixed order, so the result
    * is a pure function of the counts), if the pair plus its parent hold
    * less than the threshold ceil(n/k), their mass moves to the parent.
    * Root mass never moves. Returns the kept (id, count) pairs sorted by
    * id, WITHOUT the n entry.
    */
  def compress(counts: Map[Long, Long], k: Int, logU: Int): Array[(Long, Long)] = {
    val n = counts.getOrElse(NKey, 0L)
    val t = if (k <= 0) 1L else (n + k - 1) / k // ceil(n/k), ≥ 1 when n ≥ 1
    val m = mutable.LongMap.empty[Long]
    counts.foreach { case (id, c) => if (id != NKey && c != 0L) m(id) = c }
    var level = logU
    while (level >= 1) {
      val ids = m.keysIterator.filter(levelOf(_) == level).toArray.sorted
      var i = 0
      while (i < ids.length) {
        val id = ids(i)
        // visit each sibling pair once, at its even member (or the odd
        // member when the even one is absent)
        val sib = id ^ 1L
        if ((id & 1L) == 0L || !m.contains(sib)) {
          val parent = id >> 1
          val pairSum = m.getOrElse(id, 0L) + (if ((id & 1L) == 0L)
            m.getOrElse(sib, 0L)
          else 0L)
          if (pairSum + m.getOrElse(parent, 0L) < t && parent >= 1L) {
            if (pairSum > 0L) m(parent) = m.getOrElse(parent, 0L) + pairSum
            m.remove(id)
            if ((id & 1L) == 0L) m.remove(sib)
          }
        }
        i += 1
      }
      level -= 1
    }
    m.toArray.sortBy(_._1)
  }

  private def levelOf(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Wire format: n (8B), logU (4B), node count (4B), then sorted
    * (id, count) long pairs — a canonical rendering, so equal digests
    * are equal BYTES (what lets specs pin merge-order invariance at the
    * binary level), and self-describing (estimation needs no out-of-band
    * universe).
    */
  def serialize(counts: Map[Long, Long], k: Int, logU: Int): Array[Byte] = {
    val nodes = compress(counts, k, logU)
    val bb = java.nio.ByteBuffer.allocate(16 + 16 * nodes.length)
    bb.putLong(counts.getOrElse(NKey, 0L))
    bb.putInt(logU)
    bb.putInt(nodes.length)
    nodes.foreach { case (id, c) => bb.putLong(id); bb.putLong(c) }
    bb.array()
  }

  /** Structural validation is strict (ADVICE r16): persisted sketch
    * state can arrive truncated or corrupt, and a garbage node count
    * must fail as a NAMED corruption, not a BufferUnderflowException
    * deep in an executor (or a silent empty digest).
    */
  def deserialize(bytes: Array[Byte]): (Map[Long, Long], Int) = {
    if (bytes == null || bytes.length == 0) return (Map.empty, LogU)
    require(
      bytes.length >= 16,
      s"corrupt q-digest: ${bytes.length} bytes, header needs 16")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val logU = bb.getInt()
    val cnt = bb.getInt()
    // Format-skew diagnosis, not a version byte (ADVICE r17): the v1
    // wire format (pre-logU) was n(8B), count(8B LONG), pairs — its
    // count's high word lands where v2 keeps logU, so v1 state reads as
    // logU=0. Recognize that exact shape (length arithmetic checks out
    // against the count's LOW word) and fail as a VERSION mismatch with
    // the recovery step, instead of misreporting durable-but-stale
    // state as corruption. A real version byte would break r17-written
    // v2 state the same way v2 broke v1; the diagnosis is back- and
    // forward-compatible with everything actually persisted.
    if (logU == 0 && bytes.length == 16 + 16L * cnt)
      throw new IllegalArgumentException(
        s"q-digest v1 wire format (no logU header, $cnt nodes): version " +
          "mismatch, not corruption — wipe the containing index root " +
          "(delete its dataset dir under spark.graft.index.root) so the " +
          "state rebuilds under the current format")
    require(
      n >= 0 && cnt >= 0 && logU >= 1 && logU <= 62,
      s"corrupt q-digest header: n=$n logU=$logU nodes=$cnt")
    require(
      bytes.length == 16 + 16L * cnt,
      s"corrupt q-digest: ${bytes.length} bytes for $cnt nodes (want ${16 + 16L * cnt})")
    val b = Map.newBuilder[Long, Long]
    b += (NKey -> n)
    var i = 0
    while (i < cnt) { b += (bb.getLong() -> bb.getLong()); i += 1 }
    (b.result(), logU)
  }

  /** Digest payload without the universe — the merge path's view. */
  def counts(bytes: Array[Byte]): Map[Long, Long] = deserialize(bytes)._1

  /** Rank-q estimate: nodes in postorder of value range (hi ascending,
    * descendants before ancestors), cumulative count to the first node
    * reaching ceil(q·n) — its hi endpoint is the estimate, off by at
    * most the compression's rank error. Returns the clamped-universe
    * value (cents at the default domain), -1 on an empty digest.
    */
  def quantile(bytes: Array[Byte], q: Double): Long = {
    val (m, logU) = deserialize(bytes)
    val u = 1L << logU
    val n = m.getOrElse(NKey, 0L)
    if (n <= 0L) return -1L
    val target = math.max(1L, math.ceil(q * n).toLong)
    val nodes = m.iterator
      .filter(_._1 != NKey)
      .map { case (id, c) =>
        val lvl = levelOf(id)
        val span = logU - lvl
        val lo = (id << span) - u
        val hi = lo + (1L << span) - 1L
        (hi, lo, c)
      }
      .toArray
      .sortBy { case (hi, lo, _) => (hi, -lo) }
    var cum = 0L
    var i = 0
    while (i < nodes.length) {
      cum += nodes(i)._3
      if (cum >= target) return nodes(i)._1
      i += 1
    }
    nodes.last._1
  }
}

/** Build aggregator: value cents in, canonical digest bytes out. With
  * `maxBuffer = 0` (the registry setting) the buffer holds EXACT leaf
  * counts (universe-bounded), so the finished digest is independent of
  * row order and partitioning. With `maxBuffer > 0` (the wide-domain
  * posture — logU beyond what an exact buffer can hold) a partial
  * exceeding the cap compresses early: memory stays O(maxBuffer + 3k)
  * per partial, the rank bound still holds (early compressions absorb
  * strictly less mass than the final threshold allows), but the kept
  * node SET now depends on where partition boundaries fell — the
  * documented determinism trade, made code.
  */
class QDigestBuildAgg(k: Int, logU: Int = QDigest.LogU, maxBuffer: Int = 0)
    extends Aggregator[Long, Map[Long, Long], Array[Byte]] {
  // A cap at or below the 3k compression floor can never shrink the
  // buffer under it, so every subsequent reduce would re-run an
  // O(buffer) compression per input row — quadratic build cost instead
  // of the documented O(maxBuffer + 3k) posture (ADVICE r17).
  require(
    maxBuffer == 0 || maxBuffer > 3 * k,
    s"maxBuffer=$maxBuffer must exceed the 3k=${3 * k} compression floor (or be 0)")
  private def capped(b: Map[Long, Long]): Map[Long, Long] =
    if (maxBuffer > 0 && b.size > maxBuffer)
      QDigest.compress(b, k, logU).toMap
        .updated(0L, b.getOrElse(0L, 0L)) // NKey: total mass survives
    else b
  override def zero: Map[Long, Long] = Map.empty
  override def reduce(b: Map[Long, Long], v: Long): Map[Long, Long] =
    capped(QDigest.add(b, v, logU))
  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    capped(QDigest.sum(a, b))
  override def finish(b: Map[Long, Long]): Array[Byte] =
    QDigest.serialize(b, k, logU)
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union aggregator over persisted digests: deserialize-sum (commutative,
  * associative — merge order cannot matter), one deterministic recompress
  * in finish. The input digests' kept nodes sum key-wise, so the merged
  * rank error is at most the sum of the parts' plus one final
  * compression's — ≤ 2·logU·n/k total for day-built parts. The universe
  * rides in each part's header; mixing universes in one group is a
  * caller error surfaced here.
  */
class QDigestMergeAgg(k: Int, logU: Int = QDigest.LogU)
    extends Aggregator[Array[Byte], Map[Long, Long], Array[Byte]] {
  private def checked(sk: Array[Byte]): Map[Long, Long] = {
    val (m, lu) = QDigest.deserialize(sk)
    require(
      m.isEmpty || lu == logU,
      s"q-digest universe mismatch: part has logU=$lu, merge expects $logU")
    m
  }
  override def zero: Map[Long, Long] = Map.empty
  override def reduce(b: Map[Long, Long], sk: Array[Byte]): Map[Long, Long] =
    QDigest.sum(b, checked(sk))
  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    QDigest.sum(a, b)
  override def finish(b: Map[Long, Long]): Array[Byte] =
    QDigest.serialize(b, k, logU)
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
