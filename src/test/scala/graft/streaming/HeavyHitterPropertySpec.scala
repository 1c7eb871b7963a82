package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries kernel properties on random streams and random batch
  * splits (the SAME `mergeStep` the streaming operator runs): for any
  * key stream and any split into micro-batches,
  *   (1) summary size ≤ k,
  *   (2) 0 ≤ true(key) − est(key) ≤ dec for present keys,
  *   (3) true(key) ≤ dec for absent keys,
  *   (4) dec ≤ n/(k+1),
  *   (5) n == stream length.
  * Pure-logic spec, no Spark session. */
class HeavyHitterPropertySpec extends AnyFunSuite {
  import HeavyHitterStream.Summary

  // zipf-ish: small ids dominate, long tail of rarer keys
  private val keyGen: Gen[Long] = Gen.frequency(
    (8, Gen.choose(0L, 2L)),
    (3, Gen.choose(3L, 15L)),
    (1, Gen.choose(16L, 400L)))

  private val streamGen: Gen[(List[Long], List[Int], Int)] = for {
    keys <- Gen.listOfN(600, keyGen)
    nCuts <- Gen.choose(0, 9)
    cuts <- Gen.listOfN(nCuts, Gen.choose(0, keys.length))
    k <- Gen.choose(1, 12)
  } yield (keys, cuts, k)

  test("MG invariants hold for any stream, any split, any k") {
    val prop = Prop.forAll(streamGen) { case (keys, cuts, k) =>
      val bounds = (0 +: cuts.sorted :+ keys.length).distinct.sorted
      val batches = bounds.sliding(2).map {
        case Seq(a, b) => keys.slice(a, b); case _ => Nil
      }.toSeq
      val fin = batches.foldLeft(Summary(Map.empty, 0L, 0L)) { (s, b) =>
        HeavyHitterStream.mergeStep(s, b.iterator, k)
      }
      val trueCounts = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val sizeOk = fin.counts.size <= k
      val nOk = fin.n == keys.length.toLong
      val decOk = fin.dec <= fin.n / (k + 1)
      val presentOk = fin.counts.forall { case (key, est) =>
        val t = trueCounts(key); est >= 1 && est <= t && t - est <= fin.dec
      }
      val absentOk = trueCounts.forall { case (key, t) =>
        fin.counts.contains(key) || t <= fin.dec
      }
      sizeOk && nOk && decOk && presentOk && absentOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("split invariance of the guarantee set: one batch vs per-element batches") {
    // MG is order-sensitive in its exact estimates but its GUARANTEES
    // are split-independent; additionally, for a fixed arrival order
    // the single-batch and element-wise folds must both certify every
    // key above the error bound
    val keys = (1 to 500).map(i => (i % 7).toLong) ++ Seq.fill(300)(99L)
    val k = 4
    val one = HeavyHitterStream.mergeStep(Summary(Map.empty, 0L, 0L), keys.iterator, k)
    val many = keys.foldLeft(Summary(Map.empty, 0L, 0L)) { (s, key) =>
      HeavyHitterStream.mergeStep(s, Iterator.single(key), k)
    }
    for (fin <- Seq(one, many)) {
      assert(fin.counts.contains(99L), "the heavy key must be certified under any split")
      assert(fin.n == keys.length.toLong && fin.dec <= fin.n / (k + 1))
    }
  }
}
