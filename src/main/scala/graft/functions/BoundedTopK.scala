package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: the k LARGEST values of `child` per
  * group, returned as a descending-sorted ARRAY — `top_k(expr, k)`.
  *
  * This is the aggregation form of top-k-per-group. The window form
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`, q08)
  * must shuffle EVERY input row to its group's reducer before any row
  * can be discarded; this aggregate keeps a k-bounded min-heap per
  * group per map partition, so the exchange carries at most
  * k × partitions rows per group however large the input is — the
  * shape that survives a group with a billion rows. Ordering is the
  * struct's natural (lexicographic) ordering, so callers encode
  * "top-k by revenue, ties to the latest order" as
  * `top_k(struct(revenue, orderkey), k)` and read fields back out of
  * the result structs.
  *
  * TypedImperativeAggregate (the datasketches-HLL/percentile route, not
  * a UDAF): buffers live as raw JVM objects inside
  * ObjectHashAggregateExec, partials merge heap-into-heap, and spill
  * serialization is one UnsafeProjection per element. NULL child values
  * are skipped (SQL aggregate convention), so `eval` can return fewer
  * than k elements — or an empty array for an all-null group.
  */
case class BoundedTopK(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Heap] {

  lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long if l == l.toInt => l.toInt
    case l: Long => throw new IllegalArgumentException(
      s"k overflows Int: $l (a BIGINT literal this size is a caller " +
        "error, not a k to silently truncate)")
    case other => throw new IllegalArgumentException(
      s"top_k: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "top_k: k must be a literal")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k: k must be integral, got ${kExpr.dataType.simpleString}")
    // a NULL literal passes the foldable + integral-type gates above but
    // would surface from the lazy `k` as a raw IllegalArgumentException —
    // report it as the analysis-time type error it is
    else if (kExpr.eval(InternalRow.empty) == null)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "top_k: k must not be NULL")
    else if (k <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k: k must be positive, got $k")
    else if (!RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k: ${child.dataType.simpleString} is not orderable")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(child.dataType,
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedTopK.Heap =
    new BoundedTopK.Heap(k, ordering)

  override def update(buf: BoundedTopK.Heap, input: InternalRow)
      : BoundedTopK.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: BoundedTopK.Heap, other: BoundedTopK.Heap)
      : BoundedTopK.Heap = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: BoundedTopK.Heap): Any =
    new GenericArrayData(buf.sortedDesc)

  // ---- spill/shuffle serialization: length-prefixed UnsafeRows of a
  // single-field row per element
  @transient private lazy val ser =
    UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val deserRow = new UnsafeRow(1)

  override def serialize(buf: BoundedTopK.Heap): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { v =>
      val row = ser(InternalRow(v))
      dos.writeInt(row.getSizeInBytes)
      dos.write(row.getBytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Heap = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      deserRow.pointTo(arr, len)
      buf.offer(InternalRow.copyValue(deserRow.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "top_k"
}

object BoundedTopK {

  /** k-bounded min-heap of the largest elements seen: admission is
    * O(log k) only while the candidate beats the current floor, O(1)
    * rejection otherwise — per-partition cost ~n for the common case
    * where most rows never enter the heap.
    */
  final class Heap(k: Int, ord: Ordering[Any]) {
    // initial capacity capped: one buffer is allocated per group per
    // partition BEFORE any data arrives, so a pathological literal like
    // top_k(x, 2e9) must not pre-allocate a 2-billion-element array —
    // the queue grows on demand toward k as elements are admitted
    private val q = new java.util.PriorityQueue[Any](
      math.min(math.max(k, 1), 1024), ord)

    def offer(v: Any): Unit = {
      if (q.size < k) q.offer(v)
      else if (ord.compare(v, q.peek()) > 0) { q.poll(); q.offer(v) }
    }

    def size: Int = q.size

    def foreach(f: Any => Unit): Unit = {
      val it = q.iterator()
      while (it.hasNext) f(it.next())
    }

    /** Contents sorted descending — the aggregate's output order. */
    def sortedDesc: Array[Any] = {
      val arr = new Array[Any](q.size)
      var i = 0
      val it = q.iterator()
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      scala.util.Sorting.stableSort(arr, (a: Any, b: Any) =>
        ord.compare(a, b) > 0)
      arr
    }
  }
}
