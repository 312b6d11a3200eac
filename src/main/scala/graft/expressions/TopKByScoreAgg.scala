package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-capacity worst-first binary heap of (id, score) pairs — the
  * aggregation buffer of [[TopKByScoreAgg]]. The root is the entry the
  * next better candidate evicts, so `offer` is O(log k) and the state
  * is exactly 2k words regardless of how many candidate rows flow
  * through. "Worse" replicates Spark's SQL double total order for the
  * `ORDER BY score DESC, id ASC` window this replaces: NaN sorts
  * above every value (desc-first), -0.0 ties 0.0, exact-equal scores
  * break by id ascending.
  */
final class TopKHeap(val k: Int) {
  private val ids = new Array[Long](k)
  private val scores = new Array[Double](k)
  private var n = 0

  /** (s1,i1) ranks strictly WORSE than (s2,i2) under
    * (score DESC, id ASC).
    */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val bothNaN = s1 != s1 && s2 != s2
    if (s1 == s2 || bothNaN) i1 > i2
    else java.lang.Double.compare(s1, s2) < 0
  }

  private def swap(a: Int, b: Int): Unit = {
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  def offer(id: Long, score: Double): Unit =
    if (n < k) {
      ids(n) = id; scores(n) = score; n += 1; siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      ids(0) = id; scores(0) = score; siftDown(0)
    }

  def size: Int = n
  def idAt(i: Int): Long = ids(i)
  def scoreAt(i: Int): Double = scores(i)

  /** The kept entries in final rank order (score DESC, id ASC). */
  def sortedBestFirst(): Array[(Long, Double)] = {
    val out = Array.tabulate(n)(i => (ids(i), scores(i)))
    out.sortWith { case ((ia, sa), (ib, sb)) => worse(sb, ib, sa, ia) }
  }
}

/** Bounded top-k by (score DESC, id ASC) as a native typed-imperative
  * aggregate — the allocation-bounded replacement for the window
  * top-k idiom `row_number() OVER (PARTITION BY key ORDER BY score
  * DESC, id ASC) <= k` every similarity ranking in this repo used:
  * the window materializes and SORTS every candidate row per key
  * (the exact kNN audit buffered its whole n² broadcast product —
  * measured 1.8 GB allocated per pass at sf0.1 for k = 5), while this
  * aggregate folds candidates into a k-entry heap as they stream out
  * of the join, map-side-combining before the shuffle. At 100 TB the
  * same shape holds: aggregate state is k·16 bytes per key, candidate
  * volume never lands in a sorter.
  *
  * Output: `array<struct<id bigint, score double>>` already in final
  * rank order — callers `posexplode` and use pos+1 as the rank.
  * Bit-identical to the window formulation for non-null inputs (same
  * IEEE comparisons, same NaN-largest/-0.0==0.0 total order, same id
  * tiebreak; SimilaritySpec pins parity on a fuzz corpus). Null id or
  * score rows NEVER rank — the window's NULLS-LAST desc order instead
  * padded trailing ranks with them; callers must not rely on that
  * (spec-pinned).
  */
case class TopKByScoreAgg(
    idChild: Expression,
    scoreChild: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k >= 1, s"k must be >= 1: $k")

  override def children: Seq[Expression] = idChild :: scoreChild :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (idChild.dataType, scoreChild.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (i, s) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint id, double score), got " +
          s"(${i.sql}, ${s.sql})")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  // Unboxed fast path: by update() time the planner has bound direct
  // column children to BoundReference, so the hot loop can read the
  // primitives straight off the row — `eval` would box a Long and a
  // Double PER CANDIDATE ROW (2 allocations × the n² product on the
  // exact kNN path; the boxing was the aggregate's own residual gc
  // signature after the sort went away). Falls back to eval for
  // computed children (same values, just boxed).
  @transient private lazy val boundOrdinals: Option[(Int, Int)] =
    (idChild, scoreChild) match {
      case (i: org.apache.spark.sql.catalyst.expressions.BoundReference,
            s: org.apache.spark.sql.catalyst.expressions.BoundReference) =>
        Some((i.ordinal, s.ordinal))
      case _ => None
    }

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    boundOrdinals match {
      case Some((io, so)) =>
        // null id/score rows cannot rank (the similarity tables never
        // produce them — both legs are non-null by construction)
        if (!input.isNullAt(io) && !input.isNullAt(so))
          buffer.offer(input.getLong(io), input.getDouble(so))
      case None =>
        val id = idChild.eval(input)
        val score = scoreChild.eval(input)
        if (id != null && score != null)
          buffer.offer(id.asInstanceOf[Long], score.asInstanceOf[Double])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buffer.offer(other.idAt(i), other.scoreAt(i))
      i += 1
    }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedBestFirst().map { case (id, score) =>
      new GenericInternalRow(Array[Any](id, score))
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      out.writeLong(buffer.idAt(i))
      out.writeDouble(buffer.scoreAt(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { heap.offer(in.readLong(), in.readDouble()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(idChild = newChildren(0), scoreChild = newChildren(1))
}
