package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.sql.types._

/** Native codegen'd squared L2 distance over two `ARRAY<FLOAT>` (or
  * `ARRAY<DOUBLE>` — the q139 residual domain, where float-sub rounding
  * would diverge cross-engine) columns — the PQ encode/ADC hot-path
  * primitive (q136: corpus × 64 codeword
  * evaluations per vector). The composable `aggregate(zip_with(...))`
  * formulation allocates a boxed lambda call per element and falls out of
  * whole-stage codegen; this is the same single primitive loop as
  * [[CosineSimilarity]].
  *
  * Semantics are EXACTLY the HOF/oracle formulation: per element,
  * `d = (double) x - (double) y; acc += d * d`, left-to-right from an
  * exact 0.0 seed (DuckDB's seedless list_reduce agrees because
  * 0.0 + d² == d² for the non-negative squares). Null if either array is
  * null, contains a null element, or the lengths differ (zip_with
  * null-pads the shorter side, so the HOF formulation also nulls out);
  * empty arrays yield 0.0.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  // Nullable beyond child-null propagation: a null ELEMENT also nulls out.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (ld, rd) = (isDouble(left), isDouble(right))
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      val d = xv - yv
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
      val lGet =
        if (isDouble(left)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val rGet =
        if (isDouble(right)) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |boolean $bad = $n != $b.numElements();
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  $nullCheck
         |  double $dv = $lGet - $rGet;
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
