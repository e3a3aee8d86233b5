package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native squared-L2 distance over two `array<bigint>` columns — the inner
  * loop of the product-quantization family ([[graft.ops.Similarity.pqCodes]]
  * / `pqTopK`), which evaluates it |corpus| · m · ksub times per encode.
  *
  * Same rationale as [[CosineSimilarity]]: the composable `zip_with` +
  * `aggregate` form evaluates its lambda per element outside whole-stage
  * codegen; this expression is one generated long-arithmetic loop over the
  * underlying ArrayData. All-integer, so the result is exact and matches
  * the HOF path and the DuckDB oracle bit-for-bit (no FP contract needed).
  *
  * Degenerate inputs: null input → null; a null element → null (matching
  * the absorbing fold of the HOF path); length mismatch truncates to the
  * shorter vector (SQL list-zip semantics).
  */
case class SquaredDistanceLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"l2sq_long requires array<bigint> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val checkNulls = elementsNullable
    var acc = 0L
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val nullCheck =
          if (elementsNullable)
            s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullCheck
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  $acc += $d * $d;
           |}
           |if (!${ev.isNull}) { ${ev.value} = $acc; }
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): SquaredDistanceLong = copy(left = newLeft, right = newRight)
}
