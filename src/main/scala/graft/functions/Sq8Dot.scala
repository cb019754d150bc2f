package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: Σ qᵢ · codeᵢ for an ARRAY<FLOAT> query
  * against a BINARY column of unsigned-byte SQ8 codes —
  * `sq8_dot(q, codes)`.
  *
  * The asymmetric-distance kernel of scalar quantization
  * (`sim.Sq8Knn`): with per-vector affine dequantization
  * v ≈ vmin + scale·code, the float-vs-quantized dot product factors
  * into vmin·Σq + scale·sq8_dot(q, codes) — the codes are never
  * materialized as floats, 4 bytes of float become 1 byte of code, and
  * this expression is the only per-pair work. Same codegen discipline
  * as `vec_dot`: whole-stage codegen, primitives straight from the
  * row, no allocation (`FloatVecDot`'s measured 40× argument).
  */
case class Sq8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && right.dataType == BinaryType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sq8_dot needs (array<float>, binary) args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  // lazy val, not def — constant per instance; see VecFunctions (r18)
  @transient private lazy val mayHaveNullElements: Boolean =
    left.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[Array[Byte]]
    val n = q.numElements()
    if (c.length != n) {
      throw new IllegalArgumentException(
        s"sq8_dot: dimension mismatch ($n floats vs ${c.length} codes)")
    }
    val checkNulls = mayHaveNullElements
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && q.isNullAt(i)) {
        throw new IllegalArgumentException("sq8_dot: null array element")
      }
      acc += q.getFloat(i).toDouble * (c(i) & 0xff).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck = if (mayHaveNullElements)
        s"""
           |  if ($a.isNullAt($i)) {
           |    throw new IllegalArgumentException("sq8_dot: null array element");
           |  }""".stripMargin
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.length != $n) {
         |  throw new IllegalArgumentException(
         |    "sq8_dot: dimension mismatch (" + $n + " floats vs " + $b.length + " codes)");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {$nullCheck
         |  $acc += (double) $a.getFloat($i) * (double) ($b[$i] & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dot =
    copy(left = newLeft, right = newRight)
}
