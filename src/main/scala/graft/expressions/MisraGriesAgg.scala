package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a native typed-imperative
  * aggregate: at most `capacity` counters, each update/merge keeps the
  * deterministic undercount guarantee `true_freq - n/(capacity+1) <=
  * estimate <= true_freq` (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012: add counters
  * pointwise, then subtract the (capacity+1)-th largest count and drop
  * non-positive entries). Consequently any item with true frequency
  * `> n/k` for `k <= capacity` is GUARANTEED present in the summary —
  * the candidate-superset property the two-pass exact heavy-hitter
  * operator ([[graft.operators.Sketch.heavyHittersExact]]) relies on.
  *
  * Scale: the aggregation buffer is a fixed-size map (`capacity`
  * entries) regardless of input cardinality — a 100 TB column with
  * billions of distinct values aggregates through per-partition
  * summaries of `capacity` counters that merge associatively, where a
  * plain `groupBy(value).count()` would shuffle the full domain.
  * Update cost is amortized O(1): each decrement round removes
  * `capacity+1` units of accumulated count, so rounds are bounded by
  * n/(capacity+1).
  *
  * Output: `array<struct<item string, lb bigint>>` sorted by
  * (lb DESC, item ASC) — `lb` is the summary's lower-bound count, NOT
  * an exact frequency; exactness comes from the recount pass.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, Long]] {

  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string item column, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, Long] =
    new java.util.HashMap[UTF8String, Long]()

  override def update(buffer: java.util.HashMap[UTF8String, Long],
      input: InternalRow): java.util.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val item = v.asInstanceOf[UTF8String]
    val cur = buffer.get(item)
    if (buffer.containsKey(item)) {
      buffer.put(item, cur + 1L)
    } else if (buffer.size < capacity) {
      // clone: the incoming UTF8String may point into a reused row buffer
      buffer.put(item.clone(), 1L)
    } else {
      // decrement-all round: pays off capacity+1 units of count
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
    buffer
  }

  override def merge(buffer: java.util.HashMap[UTF8String, Long],
      other: java.util.HashMap[UTF8String, Long]): java.util.HashMap[UTF8String, Long] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val cur = buffer.get(e.getKey)
      if (buffer.containsKey(e.getKey)) buffer.put(e.getKey, cur + e.getValue)
      else buffer.put(e.getKey, e.getValue)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive
      val counts = new Array[Long](buffer.size)
      var i = 0
      val vit = buffer.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(buffer.size - capacity - 1) // (capacity+1)-th largest
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[UTF8String, Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, lb) =>
      new GenericInternalRow(Array[Any](item, lb))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: java.util.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
