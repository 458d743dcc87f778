package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `ARRAY<FLOAT>` columns.
  *
  * The composable alternative (`aggregate(zip_with(...))`) allocates a
  * boxed lambda call per element and falls out of whole-stage codegen; on
  * a pairwise join (the ANN/dedup hot path: |pairs| × dim evaluations)
  * that interpretation overhead dominates the query. This expression
  * generates a single primitive loop — no boxing, no virtual calls — and
  * stays inside the codegen'd join stage.
  *
  * Semantics are EXACTLY the oracle's formulation (sequential left-fold
  * dot and norms in double, then dot / (sqrt(na) * sqrt(nb))): IEEE ops in
  * the same order ⇒ bit-identical results to DuckDB's list_reduce mirror.
  *
  * Total over arbitrary input (the function is SQL-registered, so user
  * input can be anything): null if either array is null, if either array
  * contains a null element, or if either norm is zero (empty or all-zero
  * vector — the 0/0 case is defined as null, not NaN). Mismatched lengths
  * fold over the shorter of the two lengths (fixture dims are uniform).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Nullable beyond child-null propagation: null-element and zero-norm
  // inputs also yield null (see class doc).
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
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val bad = ctx.freshName("bad")
      // Per-element null checks are emitted only when the array type can
      // actually hold nulls — the fixture hot path (containsNull = false
      // after parquet read) keeps the tight branch-free loop.
      def canBeNull(e: Expression) =
        e.dataType.asInstanceOf[ArrayType].containsNull
      val nullCheck =
        if (canBeNull(left) || canBeNull(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($bad || $na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object functions {
  /** Column API for [[CosineSimilarity]]. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftShims.column(CosineSimilarity(
      GraftShims.expression(a), GraftShims.expression(b)))
}
