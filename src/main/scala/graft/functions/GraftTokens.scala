package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshims.GraftShims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass tokenizer:
  * `graft_tokens(text)` == `filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')`
  * for ASCII input — the tokenization every text-analysis query runs per
  * row.
  *
  * Why native: the composed form pays a full-string Unicode lowercase
  * allocation, a regex-NFA split, and a `filter` HIGHER-ORDER function —
  * and HOFs are CodegenFallback, so each evaluation drops out of
  * whole-stage codegen into interpreted lambda calls. This expression is
  * one branch-predictable byte walk over the UTF8String: ASCII letters
  * case-fold by +32 in place, every other byte (including each byte of a
  * multi-byte codepoint, all >= 0x80) is a separator, tokens are the
  * kept runs. No regex, no lambda, no intermediate empty strings.
  *
  * CONTRACT (documented divergence from the composed form): non-ASCII
  * input. Unicode lowercasing can map non-ASCII codepoints INTO the
  * [a-z] class (U+212A KELVIN SIGN lowercases to ASCII 'k'; U+0130 to
  * 'i' + combining dot), so on such text the regex formulation keeps
  * characters this walk treats as separators. For the engine's corpora
  * (and the fixtures) tokenization is defined as ASCII-alnum runs —
  * exotic case-folds into the token alphabet are separators here, which
  * is the behavior a deterministic data pipeline wants anyway
  * (FunctionsSpec pins both the ASCII equivalence and the non-ASCII
  * contract).
  */
case class GraftTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(s: Any): Any =
    GraftTokens.tokenize(s.asInstanceOf[UTF8String])

  // A static call keeps the expression inside the whole-stage-codegen
  // span (no CodegenFallback row boxing); the walk itself lives in one
  // JIT-friendly helper shared with the interpreted path.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftTokens.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}

object GraftTokens {
  /** ASCII-alnum run tokenizer (see class doc for the contract). */
  def tokenize(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val out = new ArrayBuffer[Any]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      // skip separators
      while (i < n && !isTokenByte(bytes(i))) i += 1
      val start = i
      while (i < n && isTokenByte(bytes(i))) i += 1
      if (i > start) {
        val tok = new Array[Byte](i - start)
        var j = start
        while (j < i) {
          val b = bytes(j)
          tok(j - start) =
            if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        out += UTF8String.fromBytes(tok)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Token alphabet after case-fold: [a-z0-9] plus the uppercase ASCII
    * letters that fold into it. Bytes >= 0x80 are negative -> false. */
  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z')
}
