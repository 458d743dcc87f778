package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.sql.types._

/** Native codegen'd dot product of an `ARRAY<FLOAT>` column with a
  * LITERAL integer weight vector — the hyperplane-LSH signature hot path
  * (q44/q46: 8-24 plane dots per row over the full corpus).
  *
  * The composable formulation (`aggregate(sequence(...), ...)` over an
  * inlined `array(...)` literal) is a higher-order function — interpreted,
  * one boxed lambda frame per element, outside whole-stage codegen. This
  * expression generates one primitive loop per plane and keeps the
  * signature projection inside the codegen'd stage.
  *
  * Semantics are EXACTLY the HOF/oracle formulation, term by term:
  * `acc += (CAST(e_i AS DOUBLE) * m_i) / 1000.0` folded left with init
  * 0.0 — integer weights in [-1000, 1000] divided per term (NOT
  * pre-divided: m/1000.0 is inexact in binary, and hoisting the division
  * out of the loop changes IEEE results). Bit-identical to both the SQL
  * HOF version and DuckDB's list_reduce mirror.
  *
  * Null contract: null array → null; a null element (possible only when
  * the array type allows it) → null. Arrays shorter than the weight
  * vector fold over the shorter length.
  */
case class PlaneDot(child: Expression, weights: Seq[Long])
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "plane_dot"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), weights.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      acc += (x.getFloat(i).toDouble * weights(i)) / 1000.0
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val w = ctx.addReferenceObj("planeWeights", weights.toArray, "long[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      // per-element null checks only when the array type can hold nulls —
      // the parquet fixture path (containsNull = false) stays branch-free
      val nullCheck =
        if (child.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($a.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), ${weights.length});
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += (((double) $a.getFloat($i)) * $w[$i]) / 1000.0;
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneDot =
    copy(child = newChild)
}

object PlaneDot {
  /** Column API: dot of `a` with literal integer `weights` (÷1000 each). */
  def plane_dot(a: Column, weights: Seq[Long]): Column =
    GraftShims.column(PlaneDot(GraftShims.expression(a), weights))

  /** SQL-registration constructor: second argument must be a foldable
    * ARRAY<BIGINT>/<INT> literal, evaluated once at plan time. */
  def fromSql(children: Seq[Expression]): PlaneDot = {
    require(children.size == 2, "plane_dot takes exactly 2 arguments")
    val w = children(1)
    require(w.foldable, "plane_dot weights must be a literal array")
    val arr = w.eval().asInstanceOf[ArrayData]
    val ws = w.dataType match {
      case ArrayType(LongType, _) => arr.toLongArray().toSeq
      case ArrayType(IntegerType, _) => arr.toIntArray().map(_.toLong).toSeq
      case other => throw new IllegalArgumentException(
        s"plane_dot weights must be ARRAY<BIGINT> or ARRAY<INT>, got ${other.sql}")
    }
    PlaneDot(children.head, ws)
  }
}
