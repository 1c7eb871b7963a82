package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}

/** Iterative BPE merge training: golden corpus, monotone max counts,
  * and agreement with the single-step pair census. */
class BpeTrainSpec extends SparkSpec {

  test("learns the hand-computed merges on a golden corpus") {
    import spark.implicits._
    // "low"×5, "lower"×2, "newest"×6, "widest"×3  (Sennrich-style toy)
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val got = TrainingOps4.bpeTrainMerges(docs, merges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    // round 1: pair counts — es 9 (newest6+widest3), st 9, ne 6, ew 6,
    // we 6+2=8, lo 7, ow 7, de 3, wi 3, id 3, er 2 ... ties es/st 9 →
    // lexicographic: "es" wins; after es-merge: (es,t) 9 → "est" wins
    // round 2 ("e","s") < ... compare: round2 pairs: s+t gone? after
    // merging e+s→es: newest = n,e,w,es,t ; widest = w,i,d,es,t →
    // (es,t)=9 max → merge 2 = (es,t). round 3: we 8 (n,e,w + w from
    // lower/low? low = l,o,w: lo 7, ow 7; lower adds er; newest has
    // ne 6, ew 6; we: lower(2, w,e gone? lower = l,o,w,e,r: ow, we,
    // er; after es merges nothing changes for these) → we = 2+6=8 →
    // merge 3 = (w,e)? careful: newest = n,e,w,es,t → pairs ne, ew,
    // w-es, es-t(merged already). ew=6, we only in lower=2 → max after
    // round 2: lo=7, ow=7 → tie lo/ow → "lo" lexicographic. merge 3 =
    // (l,o) 7.
    assert(got(0) == ((1, "e", "s", 9L)), s"merge1=${got(0)}")
    assert(got(1) == ((2, "es", "t", 9L)), s"merge2=${got(1)}")
    assert(got(2) == ((3, "l", "o", 7L)), s"merge3=${got(2)}")
    // merge 4: after lo: low = lo,w ; lower = lo,w,e,r → (lo,w) = 7
    assert(got(3) == ((4, "lo", "w", 7L)), s"merge4=${got(3)}")
  }

  test("max pair count is non-increasing across merge rounds") {
    val counts = SparkEntry.queries("bpe_train_merges")(spark, sf)
      .collect().map(_.getLong(4))
    assert(counts.length == 10, s"expected 10 merges, got ${counts.length}")
    counts.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"pair count increased across rounds: $a -> $b")
    }
  }

  test("first learned merge equals the bpe_pair_freq census top pair") {
    val firstMerge = SparkEntry.queries("bpe_train_merges")(spark, sf)
      .collect()(0)
    val topCensus = SparkEntry.queries("bpe_pair_freq")(spark, sf)
      .collect()(0)
    assert(firstMerge.getString(1) + firstMerge.getString(2) == topCensus.getString(0),
      s"trainer merge1 ${firstMerge.getString(3)} != census top ${topCensus.getString(0)}")
    assert(firstMerge.getLong(4) == topCensus.getLong(1),
      "merge count must equal census count")
  }
}
