package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Vector kernels for the similarity/dedup operators.
  *
  * `dot_i64(a, b)` — integer dot product over two `array<bigint>`
  * columns as a native codegen expression: a tight primitive loop over
  * `ArrayData`, no intermediate array allocation. Replaces the
  * interpreted `aggregate(zip_with(a, b, ...))` higher-order-function
  * chain, which allocates a zipped array and evaluates two lambdas per
  * element per row — the hot kernel of the O(N²) pairwise cosine ops
  * (SURVEY.md §4 optimization candidate (b): custom `Expression` with
  * codegen where profiling shows a hot scalar).
  *
  * Integer accumulation is associative, so results are independent of
  * evaluation order — exactly why the quantized (floor(x*1000)) cosine
  * pipeline is oracle-stable (see DedupOps.quantized).
  */
case class DotProductI64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"dot_i64 needs array<bigint> args, got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductI64 =
    copy(left = l, right = r)
  override def prettyName: String = "dot_i64"
}

object VectorFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("dot_i64", es => DotProductI64(es(0), es(1)), "built-in")
  }

  /** Requires registerAll on the session first (resolved by name at
    * analysis time). */
  def dot_i64(a: Column, b: Column): Column = call_function("dot_i64", a, b)
}
