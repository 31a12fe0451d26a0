package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Σ over an array of tokens of the number of `[aeiouy]+` runs in each
  * token — the syllable-count heuristic of [[graft.ops.TextOps
  * .readability]]'s Flesch score, compiled.
  *
  * The composable form (`transform(ws, w ->
  * size(regexp_extract_all(w, '[aeiouy]+', 0)))` → `aggregate`) runs an
  * interpreted regex per WORD with per-element boxing. A maximal run of
  * vowels is one regex match by construction, so a single char scan
  * counting vowel-run starts produces the IDENTICAL integer — one
  * codegen'd pass over the token array (the [[QuantizeInt8]] /
  * [[MattrWindowSum]] precompiled-loop pattern). ASCII-only class, so
  * bytewise UTF-8 scanning is exact (a vowel byte can never be part of
  * a multi-byte code point). NULL tokens contribute 0, exactly as the
  * HOF twin's `size(regexp_extract_all(NULL, ...)) = NULL` summed via
  * `acc + coalesce`-free aggregate would... the twin sums with `acc +
  * x`, where a NULL x nulls the sum — tokens from the shared tokenizer
  * are never NULL, and the property spec pins the non-null contract.
  */
case class VowelRunSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vowel_run_sum expects array<string>, got ${t.catalogString}")
    }

  private def isVowel(b: Byte): Boolean = b match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /** The run-count loop; also the codegen target. */
  def compute(v: ArrayData): Long = {
    val n = v.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val s = v.getUTF8String(i)
        val bytes = s.getBytes
        var inRun = false
        var j = 0
        while (j < bytes.length) {
          val vz = isVowel(bytes(j))
          if (vz && !inRun) sum += 1
          inRun = vz
          j += 1
        }
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vowelRunSum", this,
      classOf[VowelRunSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VowelRunSum {
  /** Column-level entry point. */
  def vowelRunSumCompiled(ws: Column): Column =
    ColumnBridge.column(VowelRunSum(ColumnBridge.expression(ws)))
}
