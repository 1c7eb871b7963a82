package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash as a custom sketch aggregate (`TypedImperativeAggregate`,
  * the Spark extension point for mergeable sketch state — builder
  * brief / spark_guide.md "for aggregates: TypedImperativeAggregate
  * (mutable buffer, e.g. HLL/sketches)").
  *
  * Buffer = 64 signed counters; update adds ±1 per bit of the token's
  * xxhash64 (same seed-42 hash as the `xxhash64` SQL function, so the
  * result is bit-identical to the 64-separate-`sum(when(...))`
  * formulation it replaces — asserted in DedupSpec). Merge is
  * elementwise add → partial aggregation works, the shuffle carries one
  * 64-counter buffer per group instead of 64 separate sum buffers, and
  * each input row is hashed once instead of evaluated by 64 shift
  * expressions.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  // SQL convention: an aggregate over zero (non-null) inputs is NULL —
  // 0L would masquerade as a legitimate balanced-bit simhash
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  // fail at analysis time, not with an executor-side ClassCastException
  // (the function is session-catalog-reachable from arbitrary SQL)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_agg needs STRING input, got ${child.dataType}")

  // slots 0..63 = per-bit counters, slot 64 = non-null input count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, StringType, 42L)
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(64) == 0L) null
    else {
      var out = 0L
      var i = 0
      while (i < 64) {
        if (buf(i) > 0) out |= (1L << i)
        i += 1
      }
      out
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "simhash_agg"
}

/** SimHash as a row-local SCALAR kernel over a doc's token array —
  * the map-stage twin of [[SimHashAgg]]: identical bit semantics
  * (xxhash64 seed 42, ±1 per bit, sign → bit; empty/null → NULL), but
  * no token explode and no aggregation shuffle. The query path uses
  * this; the aggregate stays as the mergeable formulation for inputs
  * that arrive pre-exploded (and as the TypedImperativeAggregate
  * extension-point exemplar). Equivalence is spec-asserted. */
case class SimHashSig(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig needs array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val counts = new Array[Long](64)
    var seen = 0L
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
        var i = 0
        while (i < 64) {
          counts(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
        seen += 1
      }
      j += 1
    }
    if (seen == 0L) null
    else {
      var out = 0L
      var i = 0
      while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
      out
    }
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
  override def prettyName: String = "simhash_sig"
}

object SimHashFunctions {
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_agg", es => SimHashAgg(es.head).toAggregateExpression(), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig", es => SimHashSig(es.head), "built-in")
  }

  def simhash_agg(c: Column): Column = call_function("simhash_agg", c)
  def simhash_sig(c: Column): Column = call_function("simhash_sig", c)
}
