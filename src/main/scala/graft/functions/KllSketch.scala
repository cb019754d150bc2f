package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native Catalyst aggregate: a KLL-style mergeable quantile sketch —
  * `kll_sketch(v, w, k)` over DOUBLE values with BIGINT weights,
  * returning the retained weighted items as ARRAY<STRUCT<v,w>> sorted
  * by (v, w).
  *
  * KLL (Karnin, Lang, Liberty 2016 "Optimal quantile approximation in
  * streams"; the DataSketches production shape) keeps a hierarchy of
  * level buffers where a level-l item carries weight 2^l; a full level
  * sorts itself and promotes alternating items to the next level —
  * halving the count, doubling the weight. Retained size is O(k log n)
  * with rank error ~1/k, and TOTAL WEIGHT IS CONSERVED EXACTLY at every
  * compaction (2m items of weight 2^l become m of weight 2^(l+1); an
  * odd leftover stays put), so `sum(w) = N` is an exact invariant the
  * oracle checks against the raw table, not an estimate.
  *
  * This implementation is the DETERMINISTIC variant: the alternation
  * offset flips per level per compaction instead of tossing a coin
  * (the classic Munro–Paterson determinization KLL itself randomized
  * for worst-case adversaries; against non-adversarial data the error
  * behavior is the same and every run is reproducible). Weighted
  * insert decomposes w into its binary digits — digit b inserts at
  * level b — which is what lets a MERGE re-feed another sketch's
  * retained (v, 2^l) items at their native levels, and lets the
  * quantile store re-feed persisted sketches without a second code
  * path.
  *
  * Scale shape: per-group state is O(k log n) doubles however many
  * rows the group has; partials are sketch-bounded under
  * ObjectHashAggregateExec's map-side combine, the exchange carries
  * sketches, not rows; merge is associative up to sketch equivalence
  * with weight conservation exact. The estimator tail (cumulative
  * weighted rank over the retained items) is plain SQL over the
  * sketch output — shared verbatim with the DuckDB oracle over a
  * dumped sketch (`rel.QuantileStore`).
  *
  * NULL values are skipped; NULL or non-positive weights are rejected
  * analysis-side or skipped at update (a weight of 0 carries nothing).
  */
case class KllSketch(
    child: Expression,
    weightExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.Sketch] {

  lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long if l == l.toInt => l.toInt
    case l: Long => throw new IllegalArgumentException(
      s"k overflows Int: $l (a BIGINT literal this size is a caller " +
        "error, not a k to silently truncate)")
    case other => throw new IllegalArgumentException(
      s"kll_sketch: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!kExpr.foldable)
      TypeCheckFailure("kll_sketch: k must be a literal")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(kExpr.dataType))
      TypeCheckFailure(
        s"kll_sketch: k must be integral, got ${kExpr.dataType.simpleString}")
    else if (kExpr.eval(InternalRow.empty) == null)
      TypeCheckFailure("kll_sketch: k must not be NULL")
    else if (k < 8 || k > 65536)
      TypeCheckFailure(s"kll_sketch: k must be in [8, 65536], got $k")
    else if (child.dataType != DoubleType)
      TypeCheckFailure("kll_sketch: value must be DOUBLE, got " +
        child.dataType.simpleString)
    else if (!Seq[DataType](IntegerType, LongType)
        .contains(weightExpr.dataType))
      TypeCheckFailure("kll_sketch: weight must be INT or BIGINT, got " +
        weightExpr.dataType.simpleString)
    else TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", DoubleType, nullable = false),
      StructField("w", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, weightExpr, kExpr)

  override def createAggregationBuffer(): KllSketch.Sketch =
    new KllSketch.Sketch(k)

  override def update(buf: KllSketch.Sketch, input: InternalRow)
      : KllSketch.Sketch = {
    val v = child.eval(input)
    if (v != null) {
      val w = weightExpr.eval(input)
      if (w != null) {
        val wl = w match {
          case i: Int => i.toLong
          case l: Long => l
        }
        if (wl < 0) throw new IllegalArgumentException(
          s"kll_sketch: negative weight $wl")
        if (wl > 0) buf.insertWeighted(v.asInstanceOf[Double], wl)
      }
    }
    buf
  }

  override def merge(buf: KllSketch.Sketch, other: KllSketch.Sketch)
      : KllSketch.Sketch = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: KllSketch.Sketch): Any = {
    val items = buf.retained // (v, w) sorted by (v, w)
    new GenericArrayData(items.map { case (v, w) =>
      new GenericInternalRow(Array[Any](v, w))
    })
  }

  override def serialize(buf: KllSketch.Sketch): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): KllSketch.Sketch =
    KllSketch.Sketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KllSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketch =
    copy(child = newChildren(0), weightExpr = newChildren(1),
      kExpr = newChildren(2))
  override def prettyName: String = "kll_sketch"
}

object KllSketch {

  private val MinCap = 8

  /** Level hierarchy: levels(l) holds items of weight 2^l. Capacities
    * decay geometrically (ratio 2/3) from k at the TOP level down to
    * MinCap, per the KLL paper; a level at capacity sorts and promotes
    * alternating items (deterministic per-level flip), conserving
    * total weight exactly.
    */
  final class Sketch(val k: Int) {
    import scala.collection.mutable.ArrayBuffer
    private[KllSketch] val levels = ArrayBuffer(ArrayBuffer.empty[Double])
    // per-level alternation bit for the deterministic compaction offset
    private[KllSketch] var flips: Long = 0L

    private def capacity(l: Int): Int = {
      val depthFromTop = levels.length - 1 - l
      var c = k.toDouble
      var i = 0
      while (i < depthFromTop) { c = c * 2.0 / 3.0; i += 1 }
      math.max(MinCap, math.ceil(c).toInt)
    }

    def insertAtLevel(v: Double, l: Int): Unit = {
      while (levels.length <= l) levels += ArrayBuffer.empty[Double]
      levels(l) += v
      // compact the lowest over-capacity level (cascades: a promotion
      // can fill the next level)
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= capacity(i) && levels(i).length >= 2)
          compact(i)
        i += 1
      }
    }

    /** w decomposed into binary digits: digit b inserts at level b —
      * exact, and native-level for re-fed sketch items (w = 2^l). */
    def insertWeighted(v: Double, w: Long): Unit = {
      var rest = w
      var b = 0
      while (rest != 0) {
        if ((rest & 1L) == 1L) insertAtLevel(v, b)
        rest >>>= 1
        b += 1
      }
    }

    def absorb(other: Sketch): Unit = {
      var l = 0
      while (l < other.levels.length) {
        val buf = other.levels(l)
        var i = 0
        while (i < buf.length) { insertAtLevel(buf(i), l); i += 1 }
        l += 1
      }
    }

    private def compact(l: Int): Unit = {
      val buf = levels(l)
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val off = if (((flips >>> l) & 1L) == 1L) 1 else 0
      flips ^= (1L << l)
      if (levels.length <= l + 1) levels += ArrayBuffer.empty[Double]
      val odd = sorted.length % 2
      // an odd count leaves one item at this level (weight conserved:
      // which one alternates with the offset bit)
      buf.clear()
      if (odd == 1) buf += (if (off == 0) sorted(sorted.length - 1)
                            else sorted(0))
      val start = if (odd == 1 && off == 1) 1 else 0
      var i = start + off
      val end = start + (sorted.length - odd)
      while (i < end) { levels(l + 1) += sorted(i); i += 2 }
    }

    def totalWeight: Long = {
      var s = 0L
      var l = 0
      while (l < levels.length) {
        s += levels(l).length.toLong * (1L << l)
        l += 1
      }
      s
    }

    def numRetained: Int = levels.map(_.length).sum

    /** Retained (v, weight) pairs sorted by (v, w) — the canonical
      * output order. */
    def retained: Array[(Double, Long)] = {
      val out = new Array[(Double, Long)](numRetained)
      var n = 0
      var l = 0
      while (l < levels.length) {
        val w = 1L << l
        val buf = levels(l)
        var i = 0
        while (i < buf.length) { out(n) = (buf(i), w); n += 1; i += 1 }
        l += 1
      }
      java.util.Arrays.sort(out,
        new java.util.Comparator[(Double, Long)] {
          def compare(a: (Double, Long), b: (Double, Long)): Int = {
            val c = java.lang.Double.compare(a._1, b._1)
            if (c != 0) c else java.lang.Long.compare(a._2, b._2)
          }
        })
      out
    }

    def toBytes: Array[Byte] = {
      val counts = levels.map(_.length)
      val bb = java.nio.ByteBuffer.allocate(
        4 + 8 + 4 + 4 * counts.length + 8 * counts.sum)
      bb.putInt(k); bb.putLong(flips); bb.putInt(levels.length)
      levels.foreach { buf =>
        bb.putInt(buf.length)
        buf.foreach(bb.putDouble)
      }
      bb.array()
    }
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte]): Sketch = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val s = new Sketch(bb.getInt)
      s.flips = bb.getLong
      val nLevels = bb.getInt
      var l = 0
      while (l < nLevels) {
        while (s.levels.length <= l)
          s.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
        val n = bb.getInt
        var i = 0
        while (i < n) { s.levels(l) += bb.getDouble; i += 1 }
        l += 1
      }
      s
    }
  }
}
