package graft.expressions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Growable upper-triangle moment accumulator — the buffer of
  * [[CovMomentsAgg]]. Pairs are indexed J-MAJOR (p = j·(j+1)/2 + i for
  * i ≤ j) so growing to a larger dimension count only APPENDS slots:
  * every pair with j < D is a prefix of the layout for any D' > D,
  * which makes ragged-length growth and cross-buffer merge a plain
  * element-wise walk with no re-indexing.
  *
  * Per pair: a count plus three 128-bit two's-complement sums
  * (Σxi, Σxj, Σxi·xj) held as parallel (hi, lo) long arrays, with one
  * bitset per sum so an all-null slot evaluates to null exactly like
  * the builtin `sum` it replaces. Invariant: any row of length L
  * touches EVERY pair with j < L, so once a slot exists its count is
  * ≥ 1 — eval never emits a pair no input row contained.
  */
final class CovMomentsBuf {
  var dims: Int = 0
  var n: Array[Long] = null
  var sxHi: Array[Long] = null; var sxLo: Array[Long] = null
  var syHi: Array[Long] = null; var syLo: Array[Long] = null
  var sxyHi: Array[Long] = null; var sxyLo: Array[Long] = null
  var sxSeen: Array[Long] = null
  var sySeen: Array[Long] = null
  var sxySeen: Array[Long] = null
  // per-row scratch (reused, never escapes): the row's values and
  // null mask, read once so the O(L²) inner loop touches only locals
  var vals: Array[Long] = null
  var isNull: Array[Boolean] = null

  def pairs: Int = dims * (dims + 1) / 2

  def grow(newDims: Int): Unit = {
    if (newDims <= dims) return
    val p = newDims * (newDims + 1) / 2
    val w = (p + 63) >> 6
    n = java.util.Arrays.copyOf(if (n == null) new Array[Long](0) else n, p)
    sxHi = java.util.Arrays.copyOf(if (sxHi == null) new Array[Long](0) else sxHi, p)
    sxLo = java.util.Arrays.copyOf(if (sxLo == null) new Array[Long](0) else sxLo, p)
    syHi = java.util.Arrays.copyOf(if (syHi == null) new Array[Long](0) else syHi, p)
    syLo = java.util.Arrays.copyOf(if (syLo == null) new Array[Long](0) else syLo, p)
    sxyHi = java.util.Arrays.copyOf(if (sxyHi == null) new Array[Long](0) else sxyHi, p)
    sxyLo = java.util.Arrays.copyOf(if (sxyLo == null) new Array[Long](0) else sxyLo, p)
    sxSeen = java.util.Arrays.copyOf(if (sxSeen == null) new Array[Long](0) else sxSeen, w)
    sySeen = java.util.Arrays.copyOf(if (sySeen == null) new Array[Long](0) else sySeen, w)
    sxySeen = java.util.Arrays.copyOf(if (sxySeen == null) new Array[Long](0) else sxySeen, w)
    vals = new Array[Long](newDims)
    isNull = new Array[Boolean](newDims)
    dims = newDims
  }

  @inline def addWide(hi: Array[Long], lo: Array[Long], p: Int,
      vHi: Long, vLo: Long): Unit = {
    val l = lo(p)
    val nl = l + vLo
    val carry = ((l & vLo) | ((l | vLo) & ~nl)) >>> 63
    hi(p) += vHi + carry
    lo(p) = nl
  }

  @inline def mark(seen: Array[Long], p: Int): Unit =
    seen(p >> 6) |= 1L << (p & 63)

  @inline def isSet(seen: Array[Long], p: Int): Boolean =
    (seen(p >> 6) & (1L << (p & 63))) != 0L

  def toBigInteger(hi: Long, lo: Long): BigInteger = {
    val bytes = new Array[Byte](16)
    var b = 0
    while (b < 8) {
      bytes(b) = (hi >>> (56 - 8 * b)).toByte
      bytes(b + 8) = (lo >>> (56 - 8 * b)).toByte
      b += 1
    }
    new BigInteger(bytes)
  }
}

/** All upper-triangle covariance moments of a long-array column in ONE
  * allocation-free pass over UNEXPLODED rows, bit-identical to the
  * builtin idiom it replaces in [[graft.operators.Similarity.embeddingCovariance]]:
  *
  *   posexplode × posexplode (j ≥ i) →
  *   groupBy(i, j).agg(count(1),
  *     sum(xi.cast(DECIMAL(38,0))), sum(xj.cast(DECIMAL(38,0))),
  *     sum(xi.cast(DECIMAL(38,0)) * xj))
  *
  * That shape fans every row out to dims·(dims+1)/2 rows (×2,080 at
  * dims = 64) and pays three BigDecimal-backed decimal sums per
  * exploded row — q159 measured 7.5 GB allocated and 5.8 s per pass at
  * sf0.1 to aggregate 2,000 vectors into 2,080 result rows. Here each
  * input row is read once into a scratch array and the O(dims²) inner
  * loop runs on locals: count bump, two sign-extended 128-bit adds,
  * one exact 128-bit product (Math.multiplyHigh) — no explode, no
  * per-row boxing, no BigDecimal until the single per-group eval.
  *
  * Returns array<struct<i, j, n, sx, sy, sxy>> (j-major order; callers
  * explode and re-sort), with the sums as DECIMAL(38,0) — exactly what
  * the builtin sums produced, so the downstream exact-divide formula
  * sees identical values (CovMomentsSpec pins bitwise parity on ragged
  * null-bearing fuzz and on the sf0.001 embeddings table). Null
  * semantics match the explode formulation: a null array contributes
  * nothing; a pair's count includes rows whose element is null while
  * each sum skips nulls (null product skips sxy); an all-null slot
  * sum is null. Zero rows → empty array (explode yields zero rows,
  * like the empty groupBy it replaces). Overflow: Σxi·xj accrues
  * ≤ 4·10¹⁸/row for nano-quantized values in (−2, 2), so the 128-bit
  * accumulator saturates at ~4·10¹⁹ rows — an order of magnitude LATER
  * than the DECIMAL(38) sum it replaces (10³⁸ / 4·10¹⁸ ≈ 2.5·10¹⁹),
  * and both far past the n ≈ 3.5·10⁹ offset-shift envelope documented
  * at the call site.
  */
case class CovMomentsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovMomentsBuf] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", DecimalType(38, 0)),
    StructField("sy", DecimalType(38, 0)),
    StructField("sxy", DecimalType(38, 0)))), containsNull = false)
  override def prettyName: String = "cov_moments_128"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def createAggregationBuffer(): CovMomentsBuf = new CovMomentsBuf

  // unboxed read through the planner's BoundReference (the
  // TopKByScoreAgg pattern); eval fallback boxes the ArrayData
  @transient private lazy val boundOrdinal: Option[Int] = child match {
    case b: BoundReference => Some(b.ordinal)
    case _ => None
  }

  private def addRow(buf: CovMomentsBuf, a: ArrayData): Unit = {
    val len = a.numElements()
    if (len > buf.dims) buf.grow(len)
    val vals = buf.vals
    val nulls = buf.isNull
    var k = 0
    while (k < len) {
      val nu = a.isNullAt(k)
      nulls(k) = nu
      if (!nu) vals(k) = a.getLong(k)
      k += 1
    }
    var j = 0
    while (j < len) {
      val base = j * (j + 1) / 2
      val xjNull = nulls(j)
      val xj = vals(j)
      var i = 0
      while (i <= j) {
        val p = base + i
        buf.n(p) += 1
        if (!nulls(i)) {
          val xi = vals(i)
          buf.addWide(buf.sxHi, buf.sxLo, p, xi >> 63, xi)
          buf.mark(buf.sxSeen, p)
          if (!xjNull) {
            buf.addWide(buf.sxyHi, buf.sxyLo, p,
              Math.multiplyHigh(xi, xj), xi * xj)
            buf.mark(buf.sxySeen, p)
          }
        }
        if (!xjNull) {
          buf.addWide(buf.syHi, buf.syLo, p, xj >> 63, xj)
          buf.mark(buf.sySeen, p)
        }
        i += 1
      }
      j += 1
    }
  }

  override def update(buf: CovMomentsBuf, input: InternalRow): CovMomentsBuf = {
    boundOrdinal match {
      case Some(o) =>
        if (!input.isNullAt(o)) addRow(buf, input.getArray(o))
      case None =>
        val v = child.eval(input)
        if (v != null) addRow(buf, v.asInstanceOf[ArrayData])
    }
    buf
  }

  override def merge(buf: CovMomentsBuf, other: CovMomentsBuf): CovMomentsBuf = {
    if (other.dims > 0) {
      if (other.dims > buf.dims) buf.grow(other.dims)
      val pairs = other.pairs
      var p = 0
      while (p < pairs) {
        buf.n(p) += other.n(p)
        if (other.isSet(other.sxSeen, p)) {
          buf.addWide(buf.sxHi, buf.sxLo, p, other.sxHi(p), other.sxLo(p))
          buf.mark(buf.sxSeen, p)
        }
        if (other.isSet(other.sySeen, p)) {
          buf.addWide(buf.syHi, buf.syLo, p, other.syHi(p), other.syLo(p))
          buf.mark(buf.sySeen, p)
        }
        if (other.isSet(other.sxySeen, p)) {
          buf.addWide(buf.sxyHi, buf.sxyLo, p, other.sxyHi(p), other.sxyLo(p))
          buf.mark(buf.sxySeen, p)
        }
        p += 1
      }
    }
    buf
  }

  private def dec(buf: CovMomentsBuf, seen: Array[Long],
      hi: Array[Long], lo: Array[Long], p: Int): Any =
    if (!buf.isSet(seen, p)) null
    else Decimal(new java.math.BigDecimal(buf.toBigInteger(hi(p), lo(p)), 0), 38, 0)

  override def eval(buf: CovMomentsBuf): Any = {
    val out = new Array[Any](buf.pairs)
    var j = 0
    while (j < buf.dims) {
      val base = j * (j + 1) / 2
      var i = 0
      while (i <= j) {
        val p = base + i
        out(p) = new GenericInternalRow(Array[Any](
          i.toLong, j.toLong, buf.n(p),
          dec(buf, buf.sxSeen, buf.sxHi, buf.sxLo, p),
          dec(buf, buf.sySeen, buf.syHi, buf.syLo, p),
          dec(buf, buf.sxySeen, buf.sxyHi, buf.sxyLo, p)))
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: CovMomentsBuf): Array[Byte] = {
    val pairs = buf.pairs
    val w = (pairs + 63) >> 6
    val bb = java.nio.ByteBuffer.allocate(4 + pairs * 7 * 8 + w * 3 * 8)
    bb.putInt(buf.dims)
    var p = 0
    while (p < pairs) {
      bb.putLong(buf.n(p))
      bb.putLong(buf.sxHi(p)); bb.putLong(buf.sxLo(p))
      bb.putLong(buf.syHi(p)); bb.putLong(buf.syLo(p))
      bb.putLong(buf.sxyHi(p)); bb.putLong(buf.sxyLo(p))
      p += 1
    }
    var b = 0
    while (b < w) {
      bb.putLong(buf.sxSeen(b)); bb.putLong(buf.sySeen(b)); bb.putLong(buf.sxySeen(b))
      b += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CovMomentsBuf
    val dims = bb.getInt()
    if (dims > 0) {
      buf.grow(dims)
      val pairs = buf.pairs
      val w = (pairs + 63) >> 6
      var p = 0
      while (p < pairs) {
        buf.n(p) = bb.getLong()
        buf.sxHi(p) = bb.getLong(); buf.sxLo(p) = bb.getLong()
        buf.syHi(p) = bb.getLong(); buf.syLo(p) = bb.getLong()
        buf.sxyHi(p) = bb.getLong(); buf.sxyLo(p) = bb.getLong()
        p += 1
      }
      var b = 0
      while (b < w) {
        buf.sxSeen(b) = bb.getLong(); buf.sySeen(b) = bb.getLong()
        buf.sxySeen(b) = bb.getLong()
        b += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovMomentsAgg =
    copy(child = newChildren(0))
}
