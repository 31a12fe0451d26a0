package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 64-bit hashes of the `n`-gram shingles of a token array, in one
  * compiled pass.
  *
  * Why a custom expression: the composable formulation
  * (`transform(sequence(...), i -> xxhash64(slice(tokens, i, n)))`) runs
  * every lambda through Spark's *interpreted* higher-order-function
  * evaluator — HOFs never enter whole-stage codegen — and allocates a
  * slice array per position. Measured on the 5000-doc corpus that was 9 s;
  * this expression does the same work in a single JVM loop: hash each
  * token once (XXH64 over the UTF8String bytes — the same primitive
  * Spark's `xxhash64` uses), chain n consecutive token hashes with
  * XXH64.hashLong, then sort+dedup a primitive long[].
  *
  * Output order is ascending (deduped); consumers treat shingle sets as
  * unordered, and downstream results depend only on set equality.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  // SQL-reachable (graft_shingle_hashes) with an arbitrary literal n:
  // n < 1 would silently hash every position to the bare seed and make
  // every document a near-duplicate of every other
  require(n >= 1, s"shingle width n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes expects array<string>, got ${t.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** The whole shingle-hash pass in one precompiled JVM loop; also the
    * codegen target ([[doGenCode]] emits a call to this, which keeps the
    * surrounding projection inside whole-stage codegen — a CodegenFallback
    * trait would eject the entire stage to the interpreted path).
    */
  def compute(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val th = ShingleKernel.tokenHashes(tokens)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      out(i) = ShingleKernel.chain(th, i, n)
      i += 1
    }
    Arrays.sort(out)
    var w = 1
    i = 1
    while (i < out.length) {
      if (out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == out.length) out else Arrays.copyOf(out, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this,
      classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column entry point: distinct n-gram shingle hashes of a token array. */
  def shingleHashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), n))
}

/** The ONE shingle-hash kernel, shared by [[ShingleHashes]] and
  * [[MinHashSignature]]: per-token XXH64 over the UTF8 bytes (null token
  * → bare seed) and seed-chained n-gram hashing. The dedup pipeline's
  * invariant that MinHash signatures and exact shingle sets describe the
  * SAME shingles holds only while both expressions hash identically —
  * one kernel makes drift impossible.
  */
private[functions] object ShingleKernel {
  val Seed = 42L

  def tokenHashes(tokens: ArrayData): Array[Long] = {
    val m = tokens.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val t = tokens.getUTF8String(i)
      th(i) = if (t == null) Seed
        else XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
          t.numBytes, Seed)
      i += 1
    }
    th
  }

  /** Chained hash of the n-gram starting at position `i`. */
  def chain(th: Array[Long], i: Int, n: Int): Long = {
    var h = Seed
    var j = 0
    while (j < n) { h = XXH64.hashLong(th(i + j), h); j += 1 }
    h
  }
}
