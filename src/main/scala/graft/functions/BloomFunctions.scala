package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_contains_long(h)` — membership probe of a long hash against a
  * pre-built [[BloomFilter]] sketch carried INSIDE the expression (the
  * sketch serializes with the plan to executors, exactly like a
  * broadcast variable but without a UDF's boxing/registry overhead).
  *
  * Scale shape: the filter side is built distributed
  * (`df.stat.bloomFilter` merges per-partition sketches) and the probe
  * side stays a pure map stage — the standard way to decontaminate a
  * 100 TB training corpus against a benchmark set without shuffling
  * the corpus: ship the few-MB sketch, not the data.
  */
case class BloomContainsLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_contains_long needs BIGINT, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def withNewChildInternal(c: Expression): BloomContainsLong =
    copy(child = c)
  override def prettyName: String = "bloom_contains_long"
}

object BloomFunctions {
  /** Bind THIS sketch instance into the session's function registry and
    * return a probe column. The sketch rides the expression (closure-
    * captured at registration), so re-binding per query invocation is
    * required — queries construct their own sketch each run. */
  def probe(spark: SparkSession, bloom: BloomFilter, c: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains_long", es => BloomContainsLong(es.head, bloom), "built-in")
    call_function("bloom_contains_long", c)
  }
}
