package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IPv4 dotted-quad ↔ signed int32 codec.
  *
  * Same packing the reference uses to store source IPs in an INTEGER
  * column (`/root/reference/db/procedures/events/Utils.java:25-42`:
  * `iptoi` folds four octets big-endian into a (signed) 32-bit int,
  * `itoip` unfolds). Implemented as native Catalyst expressions with
  * `doGenCode` so they stay inside whole-stage codegen (SURVEY.md §2.8
  * E6, §4 candidate (b)) — no boxed UDF in the hot path.
  */
object IpCodec {
  /** "1.2.3.4" → signed int32; null-unsafe core (callers handle null). */
  def ipToInt(s: UTF8String): Int = {
    val str = s.toString
    var acc = 0L
    var octet = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if (c == '.') { acc = (acc << 8) | (octet & 0xffL); octet = 0 }
      else octet = octet * 10 + (c - '0')
      i += 1
    }
    acc = (acc << 8) | (octet & 0xffL)
    acc.toInt
  }

  /** signed int32 → "a.b.c.d" (big-endian octets). */
  def intToIp(v: Int): UTF8String = {
    val u = v.toLong & 0xffffffffL
    UTF8String.fromString(
      s"${(u >> 24) & 255}.${(u >> 16) & 255}.${(u >> 8) & 255}.${u & 255}")
  }
}

case class IpToInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"ip_to_int needs STRING, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    IpCodec.ipToInt(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpCodec.ipToInt($c)")
  override protected def withNewChildInternal(newChild: Expression): IpToInt =
    copy(child = newChild)
  override def prettyName: String = "ip_to_int"
}

case class IntToIp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"int_to_ip needs INT, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    IpCodec.intToIp(input.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpCodec.intToIp($c)")
  override protected def withNewChildInternal(newChild: Expression): IntToIp =
    copy(child = newChild)
  override def prettyName: String = "int_to_ip"
}

/** Registration + Column API. The expressions are registered in the
  * session's function registry (the Spark analogue of the reference's
  * `IMPORT CLASS events.Utils`, `db/ddl.sql:156`) and exposed as
  * Columns via `call_function`, resolved at analysis time. */
object IpFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ip_to_int", es => IpToInt(es.head), "built-in")
    reg.createOrReplaceTempFunction("int_to_ip", es => IntToIp(es.head), "built-in")
  }

  def ip_to_int(c: Column): Column = call_function("ip_to_int", c)
  def int_to_ip(c: Column): Column = call_function("int_to_ip", c)
}
