package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** FIXTURES.md §A property generators: any in-order event sequence →
  * the export stream contains exactly the first event of each
  * 30-s-gap session (ST4). Pure-logic checks (no Spark) against a
  * brute-force session simulation. */
class SessionGapPropertySpec extends AnyFunSuite {
  private val gap = SessionDedup.GapMicros

  /** brute force: walk sessions explicitly */
  private def bruteForce(prev: Option[Long], ts: Seq[Long]): Seq[Boolean] = {
    var sessionLast: Option[Long] = prev
    ts.map { t =>
      val starts = sessionLast match {
        case Some(l) => t - l > gap
        case None    => true
      }
      sessionLast = Some(t)
      starts
    }
  }

  private val delta: Gen[Long] = Gen.oneOf(
    Gen.choose(0L, gap),          // inside-session gaps (incl. 0 and == gap)
    Gen.choose(gap + 1, 5 * gap)  // session-breaking gaps
  )
  private val inOrderTimes: Gen[List[Long]] = for {
    n <- Gen.choose(0, 60)
    deltas <- Gen.listOfN(n, delta)
  } yield deltas.scanLeft(1700000000000000L)(_ + _)

  test("sessionStarts == brute-force simulation for arbitrary in-order sequences") {
    val prop = Prop.forAll(inOrderTimes, Gen.option(Gen.choose(1699999990000000L, 1700000000000000L))) {
      (ts, prev) =>
        val (flags, lastOpt) = SessionDedup.sessionStarts(prev, ts)
        flags == bruteForce(prev, ts) &&
          lastOpt == (if (ts.nonEmpty) Some(ts.last) else prev)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("splitting a sequence across batches never changes the emitted set") {
    val prop = Prop.forAll(inOrderTimes, Gen.choose(0, 100)) { (ts, cutRaw) =>
      val cut = if (ts.isEmpty) 0 else cutRaw % (ts.size + 1)
      val (whole, _) = SessionDedup.sessionStarts(None, ts)
      val (f1, s1) = SessionDedup.sessionStarts(None, ts.take(cut))
      val (f2, _) = SessionDedup.sessionStarts(s1, ts.drop(cut))
      (f1 ++ f2) == whole
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("out-of-order event must not rewind last-ts (reference last_ts is MAX(ts))") {
    val s100 = 100L * 1000000
    // state says last=100s; a 5s-late event (95s) arrives, then 126s.
    // 126s is within 30s of the TRUE horizon (100s) → suppressed; the
    // late event must not have rewound the horizon to 95s.
    val (flags, last) = SessionDedup.sessionStarts(
      Some(s100), Seq(95L * 1000000, 126L * 1000000))
    assert(flags == Seq(false, false), s"got $flags")
    assert(last.contains(126L * 1000000))
  }

  test("boundary: gap exactly 30s suppresses; 30s+1µs opens (NewEvent.java:41 <=)") {
    val t0 = 1700000000000000L
    val (f1, _) = SessionDedup.sessionStarts(None, Seq(t0, t0 + gap))
    assert(f1 == Seq(true, false))
    val (f2, _) = SessionDedup.sessionStarts(None, Seq(t0, t0 + gap + 1))
    assert(f2 == Seq(true, true))
  }
}
