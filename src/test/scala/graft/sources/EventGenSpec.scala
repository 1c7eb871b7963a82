package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S1 generator fidelity: schema and distributions must match the
  * reference feeder (LogGenerator) — uniform over 49 URLs, half-empty
  * referrals, 75 agents, CIDR-range sources — and generation must be
  * deterministic and partition-independent. */
class EventGenSpec extends SparkSpec {

  private val n = 20000L

  test("schema matches the reference NewEvent call") {
    val df = EventGen.events(spark, 100)
    val cols = df.columns.toSet
    assert(Set("event_id", "src", "dest", "method", "ts", "value", "referral", "agent")
      .subsetOf(cols), s"missing columns: $cols")
    assert(df.schema("src").dataType.simpleString == "int")
    assert(df.schema("ts").dataType.simpleString == "timestamp")
  }

  test("deterministic and partition-independent (seeded mixing, no RNG state)") {
    val a = EventGen.events(spark, 1000).drop("ts").collect().map(_.toSeq).toSeq
    val b = EventGen.events(spark, 1000).repartition(13).drop("ts")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(a == b, "generation must not depend on run or partitioning")
  }

  test("dest URLs: all 49, uniform within chi-square-ish tolerance") {
    val freq = EventGen.events(spark, n).groupBy("dest").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq.size == EventGen.NumUrls, s"expected 49 distinct URLs, got ${freq.size}")
    val exp = n.toDouble / EventGen.NumUrls
    freq.foreach { case (u, c) =>
      assert(math.abs(c - exp) < exp * 0.35, s"url $u count $c vs expected $exp")
    }
  }

  test("referral: empty half the time, else one of the 49 URLs") {
    val df = EventGen.events(spark, n)
    val emptyFrac = df.filter(col("referral") === "").count().toDouble / n
    assert(math.abs(emptyFrac - 0.5) < 0.02, s"empty-referral fraction $emptyFrac")
    val nonEmpty = df.filter(col("referral") =!= "").select("referral").distinct().count()
    assert(nonEmpty == EventGen.NumUrls)
  }

  test("agents: all 75 present, uniform-ish") {
    val freq = EventGen.events(spark, n).groupBy("agent").count()
      .collect().map(_.getLong(1))
    assert(freq.length == EventGen.NumAgents)
    val exp = n.toDouble / EventGen.NumAgents
    freq.foreach(c => assert(math.abs(c - exp) < exp * 0.45, s"agent count $c vs $exp"))
  }

  test("src IPs: drawn from the 46,053 seeded ranges; value non-negative; ts monotonic") {
    assert(EventGen.ipRanges.length == EventGen.NumIpRanges)
    // every range is well-formed (start <= end, span a power of two)
    EventGen.ipRanges.take(1000).foreach { case (lo, hi) =>
      val span = hi.toLong - lo.toLong + 1
      assert(span > 0 && (span & (span - 1)) == 0, s"bad range ($lo,$hi)")
    }
    val rows = EventGen.events(spark, 5000).select("event_id", "src", "value").collect()
    assert(rows.forall(_.getLong(2) >= 0), "value must be non-negative (abs(nextInt) semantics)")
    // high source-address diversity — the property that sizes the
    // session-state key space like the reference feeder does
    val distinctSrc = rows.map(_.getInt(1)).distinct.length
    assert(distinctSrc > 4900, s"src diversity too low: $distinctSrc/5000")
  }

  test("dests dimension carries the empty-string sentinel as row 49") {
    val d = EventGen.dests(spark).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d.size == 50 && d(49L) == "")
    assert(EventGen.agents(spark).count() == 75)
  }

  test("gen_events registry entry scales to the sf dir's event count") {
    val out = EventGen.queries("gen_events")(spark, sf)
    val expected = graft.Tables.events(spark, sf).count()
    assert(out.count() == expected)
  }
}
