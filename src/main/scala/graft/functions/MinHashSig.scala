package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(ghs)` — 64-permutation MinHash signature over a doc's
  * distinct shingle-hash array, as a native expression: one primitive
  * double loop per row (perms × shingles), no per-element lambda
  * dispatch. Replaces an interpreted higher-order `transform(transform)`
  * chain that evaluated two boxed lambdas per (perm, shingle) — the
  * measured hot spot of the LSH signature stage.
  *
  * Universal hashing h_i(x) = (x·a_i + b_i) mod p over x = gh mod p,
  * with deterministic coefficients (no RNG — reproducible across
  * runs/executors). p small enough that x·a+b never overflows a long
  * even under ANSI arithmetic (x,a,b < p ≈ 1e6 ⇒ x·a+b < 1e12+1e6).
  *
  * Interpreted-eval only (CodegenFallback): the loop body is compiled
  * Scala already; per-row boxing is noise at one row per document.
  */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<bigint>, got $t")
  }

  private val p = MinHashSig.P
  private val as: Array[Long] =
    (0 until numPerm).map(i => ((2654435761L * (i + 1)) % (p - 1)) + 1).toArray
  private val bs: Array[Long] =
    (0 until numPerm).map(i => (2246822519L * (i + 7)) % p).toArray

  override def nullSafeEval(input: Any): Any = {
    val ghs = input.asInstanceOf[ArrayData]
    val n = ghs.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = ((ghs.getLong(j) % p) + p) % p
      var i = 0
      while (i < numPerm) {
        val h = (x * as(i) + bs(i)) % p
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  val P = 1000003L

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, 64), "built-in")
  }

  /** Requires registerAll on the session first. */
  def minhash_sig(a: Column): Column = call_function("minhash_sig", a)
}
