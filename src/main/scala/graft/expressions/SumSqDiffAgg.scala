package graft.expressions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** 128-bit accumulator for Σ(x−c)² over long inputs — the buffer of
  * [[SumSqDiffAgg]]. Two's-complement (hi, lo) plus a seen flag so an
  * all-null group evaluates to null like builtin `sum`.
  */
final class Sum128 {
  var hi: Long = 0L
  var lo: Long = 0L
  var seen: Boolean = false

  def addWide(vHi: Long, vLo: Long): Unit = {
    val l = lo
    val nl = l + vLo
    val carry = ((l & vLo) | ((l | vLo) & ~nl)) >>> 63
    hi += vHi + carry
    lo = nl
    seen = true
  }

  def toBigInteger: BigInteger = {
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

/** Σ(x − c)² as one allocation-free aggregate over long columns,
  * bit-identical to the builtin idiom it replaces in the k-means
  * assignment loop:
  *
  *   sum(((x − c)).cast(DECIMAL(38,0)) * (x − c))
  *
  * That idiom pays a per-ROW BigDecimal chain (the 38-digit Decimal is
  * never compact: cast allocates, the multiply allocates, every sum
  * update allocates) on the hottest path in the operator — the
  * corpus × broadcast-centroid join runs it rows × k times per Lloyd
  * iteration (q121 measured 4.7 GB allocated/pass at sf0.1). Here the
  * difference is one long subtract, the square is an exact 128-bit
  * primitive product (Math.multiplyHigh for the high word — d² of any
  * long fits 126 bits), and the accumulator is two longs; the ONLY
  * allocation is one Decimal per GROUP at eval.
  *
  * Output type is DECIMAL(38,0), exactly what the builtin sum
  * produced, so downstream comparisons (argmin windows) and the final
  * SSE math see identical values (SumSqDiffSpec pins bitwise parity
  * on signed fuzz with nulls and partial merges). Null x or c skips
  * the row (a null difference is a null product is a sum-skipped
  * row); a group with no accumulated value is null. Overflow past
  * 2¹²⁷ would need ~10¹⁹ max-magnitude rows in one group — the
  * builtin DECIMAL(38) sum overflows (ANSI-throws) an order of
  * magnitude sooner, at 10³⁸.
  */
case class SumSqDiffAgg(
    xChild: Expression,
    cChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Sum128] {

  override def children: Seq[Expression] = xChild :: cChild :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "sum_sq_diff_128"

  override def checkInputDataTypes(): TypeCheckResult =
    (xChild.dataType, cChild.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${a.sql}, ${b.sql})")
    }

  override def createAggregationBuffer(): Sum128 = new Sum128

  // unboxed read through the planner's BoundReferences (the
  // TopKByScoreAgg pattern); eval fallback boxes two Longs per row
  @transient private lazy val boundOrdinals: Option[(Int, Int)] =
    (xChild, cChild) match {
      case (x: BoundReference, c: BoundReference) =>
        Some((x.ordinal, c.ordinal))
      case _ => None
    }

  private def addSq(buf: Sum128, x: Long, c: Long): Unit = {
    val d = x - c
    buf.addWide(Math.multiplyHigh(d, d), d * d)
  }

  override def update(buf: Sum128, input: InternalRow): Sum128 = {
    boundOrdinals match {
      case Some((xo, co)) =>
        if (!input.isNullAt(xo) && !input.isNullAt(co))
          addSq(buf, input.getLong(xo), input.getLong(co))
      case None =>
        val x = xChild.eval(input)
        val c = cChild.eval(input)
        if (x != null && c != null)
          addSq(buf, x.asInstanceOf[Long], c.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: Sum128, other: Sum128): Sum128 = {
    if (other.seen) buf.addWide(other.hi, other.lo)
    buf
  }

  override def eval(buf: Sum128): Any =
    if (!buf.seen) null
    else org.apache.spark.sql.types.Decimal(
      new java.math.BigDecimal(buf.toBigInteger, 0), 38, 0)

  override def serialize(buf: Sum128): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(17)
    out.putLong(buf.hi).putLong(buf.lo).put(if (buf.seen) 1.toByte else 0.toByte)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Sum128 = {
    val in = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Sum128
    buf.hi = in.getLong(); buf.lo = in.getLong()
    buf.seen = in.get() == 1.toByte
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): SumSqDiffAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SumSqDiffAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SumSqDiffAgg =
    copy(xChild = newChildren(0), cChild = newChildren(1))
}
