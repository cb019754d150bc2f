package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: the KMV (k-minimum-values) distinct
  * sketch — the k SMALLEST DISTINCT 64-bit hash values per group,
  * returned as an ascending ARRAY<BIGINT> — `kmv_sketch(h, k)`.
  *
  * This is the mergeable theta-sketch family (Beyer et al. 2007 "On
  * synopses for distinct-value estimation under multiset operations";
  * the production shape of Druid/DataSketches theta): unlike HLL it
  * supports SET-INTERSECTION estimates, because the sketch retains
  * actual hash values — two groups' sketches intersect directly,
  * no raw-data rescan. The estimator tail lives in
  * [[graft.rel.ApproxQueries]]: with u(h) = (h + 2⁶³)/2⁶⁴ mapping the
  * signed hash order onto [0,1), a full sketch estimates
  * (k−1)/u(h_(k)) distinct values and an UNDER-FULL sketch IS the
  * exact distinct set.
  *
  * Scale shape (the 100 TB story): per-group state is ≤ k longs
  * however many rows the group has; partials are k-bounded under
  * ObjectHashAggregateExec's map-side combine, so the exchange carries
  * ≤ k × partitions values per group; merge = set-union-then-truncate,
  * associative and idempotent — the same summary can roll up
  * shard→day→month without ever touching raw data again. Everything is
  * DETERMINISTIC given the hash column (no RNG), which is what lets
  * the DuckDB oracle replicate the whole pipeline integer-exactly.
  *
  * NULL hashes are skipped (SQL aggregate convention); an all-null
  * group yields an empty array (estimate 0).
  */
case class KmvSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.MinSet] {

  lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long if l == l.toInt => l.toInt
    case l: Long => throw new IllegalArgumentException(
      s"k overflows Int: $l (a BIGINT literal this size is a caller " +
        "error, not a k to silently truncate)")
    case other => throw new IllegalArgumentException(
      s"kmv_sketch: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!kExpr.foldable)
      TypeCheckFailure("kmv_sketch: k must be a literal")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckFailure(
        s"kmv_sketch: k must be integral, got ${kExpr.dataType.simpleString}")
    else if (kExpr.eval(InternalRow.empty) == null)
      TypeCheckFailure("kmv_sketch: k must not be NULL")
    else if (k <= 0)
      TypeCheckFailure(s"kmv_sketch: k must be positive, got $k")
    else if (child.dataType != LongType)
      TypeCheckFailure("kmv_sketch: input must be BIGINT hash values, got " +
        child.dataType.simpleString)
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def createAggregationBuffer(): KmvSketch.MinSet =
    new KmvSketch.MinSet(k)

  override def update(buf: KmvSketch.MinSet, input: InternalRow)
      : KmvSketch.MinSet = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvSketch.MinSet, other: KmvSketch.MinSet)
      : KmvSketch.MinSet = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: KmvSketch.MinSet): Any =
    new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: KmvSketch.MinSet): Array[Byte] = {
    val arr = buf.sortedAsc
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.MinSet = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def prettyName: String = "kmv_sketch"
}

object KmvSketch {

  /** k-bounded sorted set of the smallest DISTINCT longs seen:
    * duplicate and above-ceiling candidates reject in O(log k), and
    * after the set first fills, expected admissions over n random
    * values total O(k·ln(n/k)) — the common row is a cheap reject.
    */
  final class MinSet(k: Int) {
    private val s = new java.util.TreeSet[java.lang.Long]()
    // cached s.last() while the set is full: the common row is a
    // reject, which must be ONE primitive compare, not an O(log k)
    // rightmost-node walk (the profiler runs one MinSet per column
    // per input row — measured r11, this is the update hot path)
    private var ceil = Long.MaxValue

    def offer(v: Long): Unit = {
      if (s.size < k) {
        if (s.add(v) && s.size == k) ceil = s.last()
      } else if (v < ceil) {
        // TreeSet.add returns false for duplicates — only shrink the
        // ceiling when a genuinely new value was admitted
        if (s.add(v)) { s.pollLast(); ceil = s.last() }
      }
    }

    def foreach(f: Long => Unit): Unit = {
      val it = s.iterator()
      while (it.hasNext) f(it.next())
    }

    /** Contents ascending — the aggregate's output order. */
    def sortedAsc: Array[Long] = {
      val arr = new Array[Long](s.size)
      var i = 0
      val it = s.iterator()
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      arr
    }
  }
}
