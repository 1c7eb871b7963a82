package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Prop, Test => SCTest}

/** E6 codec: property-based roundtrip + SQL registration + codegen. */
class IpCodecSpec extends SparkSpec {

  test("roundtrip: ipToInt(intToIp(v)) == v for all int32 (scalacheck property)") {
    val prop = Prop.forAll { (v: Int) =>
      IpCodec.ipToInt(IpCodec.intToIp(v)) == v
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(1000), prop)
    assert(res.passed, res.status.toString)
  }

  test("known vectors match the reference packing (Utils.iptoi semantics)") {
    assert(IpCodec.ipToInt(UTF8String.fromString("1.2.3.4")) == 16909060)
    assert(IpCodec.ipToInt(UTF8String.fromString("0.0.0.0")) == 0)
    assert(IpCodec.ipToInt(UTF8String.fromString("255.255.255.255")) == -1)
    assert(IpCodec.ipToInt(UTF8String.fromString("128.0.0.0")) == Int.MinValue)
    assert(IpCodec.intToIp(16909060).toString == "1.2.3.4")
    assert(IpCodec.intToIp(-1).toString == "255.255.255.255")
  }

  test("SQL registration + whole-stage codegen path") {
    IpFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT ip_to_int('10.1.2.3') AS a, int_to_ip(-1062731517) AS b").first()
    assert(r.getInt(0) == 167838211)
    assert(r.getString(1) == "192.168.1.3") // 0xC0A80103 signed = -1062731517
    // expression survives inside a codegen'd projection over a range
    val n = spark.range(1000).selectExpr("int_to_ip(CAST(id AS INT)) AS ip")
      .selectExpr("ip_to_int(ip) AS back")
      .filter("back = CAST(id AS INT)")
    assert(n.count() == 1000)
  }
}
