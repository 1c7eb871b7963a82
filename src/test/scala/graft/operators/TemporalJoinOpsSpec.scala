package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics invariants for the composed as-of joins (value parity is
  * the oracle's job). */
class TemporalJoinOpsSpec extends SparkSpec {

  test("forward as-of: mark is at-or-after, and absent only when nothing follows") {
    val r = TemporalJoinOps.queries("asof_next_event")(spark, sf)
    val withOrd = r.join(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_orderdate"),
      "o_orderkey")
    assert(withOrd.filter(col("next_event_ts") < col("o_orderdate")).count() == 0,
      "a matched event precedes its order")
    // a NULL mark means the customer truly has no event at/after the date
    val ev = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(max("ts").as("max_ts"))
    val badNull = withOrd.filter(col("next_event_id").isNull)
      .join(ev, col("o_custkey") === col("user_id"), "inner")
      .filter(col("max_ts") >= col("o_orderdate")).count()
    assert(badNull == 0, s"$badNull orders with a following event got no mark")
  }

  test("forward and backward as-of agree on a self-probe") {
    // probing events against events: the earliest event at-or-after its
    // own time is itself (ties resolve to lowest event_id, and
    // event_ids are unique per (user, ts) in the fixture)
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val self = TemporalJoinOps.asOfJoinForward(
        ev, "user_id", "ts", ev, "user_id", "ts", "event_id")
      .select(col("event_id"), col("next_mark.p").as("m"))
      // ties at identical (user, ts) legitimately resolve to the lowest
      // event_id of the tie group; restrict to untied rows
      .join(ev.groupBy("user_id", "ts").agg(count(lit(1)).as("k"))
        .filter(col("k") === 1).join(ev, Seq("user_id", "ts"))
        .select(col("event_id")), "event_id")
    assert(self.filter(col("event_id") =!= col("m")).count() == 0,
      "self-probe must return the probe row itself")
  }
}
