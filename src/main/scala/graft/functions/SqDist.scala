package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.sql.types._

/** Native codegen'd squared L2 distance over two `ARRAY<FLOAT>` columns —
  * the PQ encode/ADC hot-path primitive (q136: corpus × 64 codeword
  * evaluations per vector). The composable `aggregate(zip_with(...))`
  * formulation allocates a boxed lambda call per element and falls out of
  * whole-stage codegen; this is the same single primitive loop as
  * [[CosineSimilarity]].
  *
  * Semantics are EXACTLY the HOF/oracle formulation: per element,
  * `d = (double) x - (double) y; acc += d * d`, left-to-right from an
  * exact 0.0 seed (DuckDB's seedless list_reduce agrees because
  * 0.0 + d² == d² for the non-negative squares). Null if either array is
  * null or contains a null element; mismatched lengths fold over the
  * shorter (fixture dims are uniform); empty arrays yield 0.0.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // Nullable beyond child-null propagation: a null ELEMENT also nulls out.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dv = ctx.freshName("dv")
      val bad = ctx.freshName("bad")
      def canBeNull(e: Expression) =
        e.dataType.asInstanceOf[ArrayType].containsNull
      val nullCheck =
        if (canBeNull(left) || canBeNull(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $dv = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $dv * $dv;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  /** Column API for [[SqDist]]. */
  def sq_dist(a: Column, b: Column): Column =
    GraftShims.column(SqDist(
      GraftShims.expression(a), GraftShims.expression(b)))
}
