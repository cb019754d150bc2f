package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED ARRAY<BIGINT>
  * columns, via a two-pointer merge.
  *
  * Why not `size(array_intersect(a, b))`: array_intersect hash-builds a
  * set from one side and materializes the intersection ARRAY per row —
  * O(n+m) allocations to produce a value that is immediately reduced to
  * its length. The near-dup verify join calls this once per candidate
  * pair over per-doc shingle-hash sets that are already sorted
  * (`NearDup.sigKernel` sorts them precisely for this); the merge walk
  * does zero allocation, participates in whole-stage codegen, and reads
  * primitives straight out of the columnar ArrayData.
  *
  * Inputs MUST be sorted ascending with no duplicates (the shingle-hash
  * sets are deduped by construction) — garbage in, garbage out, same
  * contract as any merge join. NULL ELEMENTS are rejected with an error
  * rather than silently read as 0 (the function is registered
  * session-wide, so arbitrary SQL can reach it; "where does null sort"
  * has no answer a merge walk can honor, and a phantom 0-match would be
  * a silent wrong count).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count needs two array<bigint> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) {
        throw new IllegalArgumentException(
          "sorted_intersect_count: null array element")
      }
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    // the UNVISITED tails carry the same null contract (r18 review:
    // a null past the walk's exit previously escaped the loud
    // rejection the doc promises) — tail scans are isNullAt-only
    while (i < n) {
      if (x.isNullAt(i)) throw new IllegalArgumentException(
        "sorted_intersect_count: null array element")
      i += 1
    }
    while (j < m) {
      if (y.isNullAt(j)) throw new IllegalArgumentException(
        "sorted_intersect_count: null array element")
      j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: null array element");
         |  }
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |while ($i < $n) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: null array element");
         |  }
         |  $i++;
         |}
         |while ($j < $m) {
         |  if ($b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "sorted_intersect_count: null array element");
         |  }
         |  $j++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
