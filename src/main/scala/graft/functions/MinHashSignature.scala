package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Full MinHash signature of a token array's n-gram shingles in ONE
  * compiled pass: hash each token once (XXH64 — the primitive behind
  * Spark's `xxhash64`), chain n consecutive token hashes per shingle
  * position, and fold every shingle into all `seeds.length` permutation
  * minima in a tight loop.
  *
  * Why: the previous formulation exploded the (doc_id, shingle_hash) index
  * (millions of rows) into a hash aggregate evaluating `numHashes` xorshift
  * min-expressions per row — one corpus-sized shuffle plus per-row codegen
  * dispatch, 45 % → 13 % of total bench time across two rounds of repair.
  * Here the signature never leaves the row: zero shuffle, zero intermediate
  * materialization, and duplicate shingles are harmlessly re-folded (min is
  * idempotent) so no dedup pass is needed.
  *
  * The per-seed mixing is a plain xorshift64 of `h ^ seed` (shifts + xor
  * only) — value-identical to the interpreted Column formulation this
  * expression replaced, so signatures — and therefore LSH candidates —
  * are unchanged across that migration.
  *
  * Returns NULL when the doc has no shingles (fewer than n tokens) — such
  * docs can't form pairs and are filtered out, matching the explode
  * formulation where they simply produced no rows.
  */
case class MinHashSignature(child: Expression, n: Int, seeds: Array[Long])
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")
  require(seeds.nonEmpty, "need at least one permutation seed")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // NULL for shingle-less docs regardless of input nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<string>, got ${t.catalogString}")
    }

  /** Signature loop; also the codegen target. Returns null if no
    * shingles. Shingle hashing goes through [[ShingleKernel]] — the SAME
    * kernel [[ShingleHashes]] uses, so signatures and exact shingle sets
    * describe identical shingles by construction.
    */
  def compute(tokens: ArrayData): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return null
    val th = ShingleKernel.tokenHashes(tokens)
    val k = seeds.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i <= m - n) {
      val h = ShingleKernel.chain(th, i, n)
      var s = 0
      while (s < k) {
        var x = h ^ seeds(s)
        x ^= x << 13
        x ^= x >> 7
        x ^= x << 17
        if (x < mins(s)) mins(s) = x
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSignature", this,
      classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // seeds are part of the expression's identity for plan equality
  override def equals(o: Any): Boolean = o match {
    case e: MinHashSignature =>
      e.child == child && e.n == n &&
        java.util.Arrays.equals(seeds, e.seeds)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + n) + java.util.Arrays.hashCode(seeds)
}

object MinHashSignature {
  /** Column entry point: the MinHash signature (array of per-seed minima)
    * of the n-gram shingles of a token array.
    */
  def minhashSignature(tokens: Column, n: Int, seeds: Array[Long]): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(tokens), n, seeds))
}
