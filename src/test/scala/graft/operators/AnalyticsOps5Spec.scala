package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Metrics tranche invariants + plan shape (exact values are the
  * DuckDB oracle's job). */
class AnalyticsOps5Spec extends SparkSpec {

  private def q(name: String) = AnalyticsOps5.queries(name)(spark, sf)

  test("twap_user: one user brute-forced; bounds hold for all") {
    val rows = q("twap_user").collect()
    rows.foreach { r =>
      assert(r.getLong(3) > 0, "den must be positive")
      val tv = r.getDouble(4)
      assert(!tv.isNaN && tv >= 0.0, s"twap out of range: $tv")
    }
    // brute-force the first user from its raw event sequence (µs grain)
    val uid = rows.head.getLong(0)
    val evs = Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(unix_micros(col("ts")), col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val segs = evs.zip(evs.tail).map { case ((t0, _, v), (t1, _, _)) =>
      (BigDecimal(java.math.BigDecimal.valueOf(v)).setScale(2), t1 - t0)
    }
    val num = segs.map { case (v, d) => v * BigDecimal(d) }.sum
    val den = segs.map(_._2).sum
    assert(rows.head.getLong(1) == segs.length)
    assert(rows.head.getLong(2) == (num * 100).toLongExact,
      s"twap_num_cents: ${rows.head.getLong(2)} != ${(num * 100).toLongExact}")
    assert(rows.head.getLong(3) == den)
    assert(rows.head.getDouble(4) ==
      (num * 100).toLongExact.toDouble / (den * 100L).toDouble)
  }

  test("twap_user: the window's user shuffle is reused by the aggregate") {
    val df = q("twap_user")
    df.queryExecution.toRdd.count()
    // AQE's tree string repeats the plan under "== Initial Plan ==" —
    // count only the final plan's exchanges
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected one user_id exchange shared by window+agg, got $exchanges:\n$plan")
  }

  test("props_json_audit: per-type counts anchored; clean corpus rows zero") {
    val rows = q("props_json_audit").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0 && r.getLong(4) == 0,
        s"synthetic props are all valid JSON with k: ${r.mkString(",")}")
      assert(r.getLong(5) <= r.getLong(1))
    }
    // out-of-range recomputed independently over the whole relation
    // (integer-shape gate mirrors the operator's cast guard)
    val kk = get_json_object(col("props"), "$.k")
    val oob = Tables.events(spark, sf)
      .filter(kk.isNotNull && !coalesce(
        when(kk.rlike("^-?\\d{1,18}$"), kk.cast("long"))
          .between(AnalyticsOps5.KLo, AnalyticsOps5.KHi), lit(false))).count()
    assert(rows.map(_.getLong(5)).sum == oob)
  }

  test("props_json_audit: edge payloads match contract semantics") {
    import spark.implicits._
    // the literal 'null' is VALID JSON with k missing; non-integer k is
    // out-of-range; invalid JSON is neither missing-k nor out-of-range
    val df = Seq(
      ("a", "null"),              // valid, missing k
      ("a", """{"k": 1.5}"""),    // valid, k non-integer -> out of range
      ("a", """{"k": 200}"""),    // valid, k integer out of bounds
      ("a", """{"k": 5}"""),      // clean
      ("a", """{k: 5"""),         // invalid JSON
      ("a", null)                 // null props
    ).toDF("event_type", "props")
    val r = AnalyticsOps5.propsJsonAudit(df).collect().head
    assert(r.getLong(1) == 6)
    assert(r.getLong(2) == 1, "n_null")
    assert(r.getLong(3) == 1, "n_invalid_json")
    assert(r.getLong(4) == 1, "n_missing_k: the 'null' literal")
    assert(r.getLong(5) == 2, "n_out_of_range: 1.5 and 200")
  }

  test("ohlc_minute: bars bound their minute; single-event bars degenerate") {
    val rows = q("ohlc_minute").collect()
    rows.foreach { r =>
      val (n, open, hi, lo, close) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo <= open && open <= hi, s"open outside [lo,hi]: ${r.mkString(",")}")
      assert(lo <= close && close <= hi)
      if (n == 1) assert(open == close && open == hi && hi == lo)
    }
    // one multi-event minute brute-forced
    val m = rows.filter(_.getLong(1) > 1).head
    val evs = Tables.events(spark, sf)
      .filter(date_trunc("minute", col("ts")) === m.getTimestamp(0))
      .select("ts", "event_id", "value").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(m.getDouble(2) == evs.head._3, "open = value of first (ts,event_id)")
    assert(m.getDouble(5) == evs.last._3, "close = value of last (ts,event_id)")
    assert(m.getDouble(3) == evs.map(_._3).max && m.getDouble(4) == evs.map(_._3).min)
  }
}
