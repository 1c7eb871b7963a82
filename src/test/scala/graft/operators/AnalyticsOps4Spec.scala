package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the ACF/lift tranche on constructed series (values at
  * real SFs are the DuckDB oracle's job). */
class AnalyticsOps4Spec extends SparkSpec {
  import spark.implicits._

  private def eventsFrom(rows: Seq[(Long, Long, String)]) =
    rows.toDF("minute_no", "user_id", "event_type")
      .select(
        expr("timestamp_micros(minute_no * 60000000)").as("ts"),
        col("user_id"), col("event_type"))

  test("autocorr: a period-2 alternating series has acf(1) ~ -1, acf(2) ~ +1") {
    // counts alternate 1,3,1,3,... over 40 minutes: one event on even
    // minutes, three on odd
    val rows = (0L until 40L).flatMap { m =>
      val k = if (m % 2 == 0) 1 else 3
      (0 until k).map(i => (m, i.toLong, "e"))
    }
    val acf = AnalyticsOps4.autocorrLags(eventsFrom(rows), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(acf(1L) < -900000L, s"lag-1 anticorrelation, got ${acf(1L)}")
    assert(acf(2L) > 900000L, s"lag-2 correlation, got ${acf(2L)}")
  }

  test("autocorr: acf_ppm stays within [-1e6, 1e6] on real data") {
    val out = AnalyticsOps4.autocorrLags(graft.Tables.events(spark, sf), 5)
      .collect()
    assert(out.length == 5)
    assert(out.forall(r => math.abs(r.getLong(3)) <= 1000000L))
  }

  test("lift: independent and perfectly-coupled pairs get the book values") {
    // 100 users: all have type a and b (coupled); type c on even users,
    // type d on users 0..49 — c,d overlap on 25 users (independent-ish:
    // lift = 25*100/(50*50) = 1.0)
    val rows = (0L until 100L).flatMap { u =>
      Seq((0L, u, "a"), (0L, u, "b")) ++
        (if (u % 2 == 0) Seq((0L, u, "c")) else Nil) ++
        (if (u < 50) Seq((0L, u, "d")) else Nil)
    }
    val out = AnalyticsOps4.cooccurrenceLift(eventsFrom(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(5)).toMap
    assert(out(("a", "b")) == 1000000L, "coupled pair: lift 1.0 when both are universal")
    assert(out(("c", "d")) == 1000000L, s"independent pair: lift 1.0, got ${out(("c", "d"))}")
  }

  test("lift: pair counts never exceed either marginal") {
    val out = AnalyticsOps4.cooccurrenceLift(graft.Tables.events(spark, sf))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) <= math.min(r.getLong(3), r.getLong(4))))
  }
}
