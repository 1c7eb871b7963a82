package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Scale-path dedup operators validated against the exact path. */
class DedupSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf).cache()

  test("pair-count jaccard == array-intersect jaccard (formulation equivalence)") {
    val a = DedupOps.jaccardPairs(docs).select("da", "db", "c", "na", "nb", "j")
    val b = DedupOps.jaccardPairsArrays(docs).select("da", "db", "c", "na", "nb", "j")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "the two jaccardPairs formulations diverged")
  }

  test("minhash-LSH candidates achieve full recall on true near-dups (j >= 0.8)") {
    val truth = DedupOps.jaccardPairs(docs).filter(col("j") >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test data should contain j>=0.8 near-dup pairs")
    val cands = DedupOps.minhashCandidates(DedupOps.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = truth -- cands
    assert(missed.isEmpty, s"LSH missed ${missed.size}/${truth.size} true pairs: $missed")
  }

  test("minhash signature estimates jaccard: near-dup pairs agree on most permutations") {
    val sigs = DedupOps.minhashSignatures(docs)
    val pair = DedupOps.jaccardPairs(docs).orderBy(col("j").desc, col("da"), col("db"))
      .select("da", "db", "j").first()
    val (da, db, j) = (pair.getLong(0), pair.getLong(1), pair.getDouble(2))
    val sa = sigs.filter(col("doc_id") === da).select("sig").first().getSeq[Long](0)
    val sb = sigs.filter(col("doc_id") === db).select("sig").first().getSeq[Long](0)
    val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / sa.size
    assert(math.abs(agree - j) < 0.25, s"minhash estimate $agree vs true $j")
  }

  test("simhash: identical texts collide, near-dups are close, and the op is deterministic") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "completely different words entirely unrelated content here now")
    ).toDF("doc_id", "text")
    val sh = DedupOps.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L), "identical text must produce identical simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)),
      "near-dup must be closer in hamming space than unrelated text")
    val again = DedupOps.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh == again, "simhash must be deterministic")
  }

  test("connectedComponents matches a driver-side union-find on the real pair graph") {
    import spark.implicits._
    val pairs = DedupOps.jaccardPairs(docs).filter(col("j") >= 0.5)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "need a non-trivial pair graph")
    // union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val ids = Tables.documents(spark, sf).select("doc_id").as[Long].collect()
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = ids.map(i => i -> find(i)).toMap
    val got = DedupOps.queries("dedup_cluster")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // sanity: at least one multi-doc component exists
    assert(want.groupBy(_._2).exists(_._2.size > 1))
  }

  test("connectedComponents handles a chain spanning multiple hops") {
    import spark.implicits._
    val verts = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("da", "db")
    val got = DedupOps.connectedComponents(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("both CC variants handle an empty pair graph (every doc its own component)") {
    import spark.implicits._
    val verts = (1L to 5L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("da", "db")
    for (cc <- Seq(DedupOps.connectedComponents _, DedupOps.connectedComponentsStar _)) {
      val got = cc(verts, noPairs, 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (1L to 5L).map(i => i -> i).toMap)
    }
  }

  test("large-star/small-star CC == min-label CC on the real pair graph and a long chain") {
    import spark.implicits._
    // the real near-dup graph (small components)
    val verts = Tables.documents(spark, sf).select("doc_id")
    val pairs = DedupOps.jaccardPairs(docs).filter(col("j") >= 0.5).select("da", "db")
    val viaLabel = DedupOps.connectedComponents(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = DedupOps.connectedComponentsStar(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar == viaLabel)
    // a 12-hop chain: diameter >> rounds — the case star-contraction
    // exists for (converges in O(log n) rounds, not 12)
    val chainV = (1L to 13L).toDF("doc_id")
    val chainE = (1L to 12L).map(i => (i, i + 1)).toDF("da", "db")
    val got = DedupOps.connectedComponentsStar(chainV, chainE)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 13L).map(_ -> 1L).toMap)
  }

  test("auto CC: small-graph union-find fast path == distributed star path") {
    val verts = Tables.documents(spark, sf).select("doc_id")
    val pairs = DedupOps.jaccardPairs(docs).filter(col("j") >= 0.5).select("da", "db")
    val viaLocal = DedupOps.connectedComponentsAuto(verts, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // threshold 0 forces the distributed branch on the same graph
    val viaDist = DedupOps.connectedComponentsAuto(verts, pairs, smallThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLocal == viaDist)
  }

  test("simhash: scalar kernel == sketch aggregate == 64-sum exprs, any partitioning") {
    val viaKernel = DedupOps.simhash(docs.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = DedupOps.simhashViaAgg(docs.repartition(5))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExprs = DedupOps.simhashViaExprs(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel == viaAgg)
    assert(viaAgg == viaExprs)
  }

  test("DF cap: hot grams are cut before the pair join, cold pairs survive") {
    import spark.implicits._
    // 20 docs all sharing ONE boilerplate shingle ("common boiler plate")
    // plus unique trailing words; 2 docs sharing a rare full text.
    val hot = (1L to 20L).map(i => (i, s"common boiler plate u${i}a u${i}b"))
    val rare = Seq((100L, "rare unique phrase one two"), (101L, "rare unique phrase one two"))
    val df = (hot ++ rare).toDF("doc_id", "text")
    // uncapped: the hot gram links all 20 boilerplate docs pairwise
    val uncapped = DedupOps.jaccardPairs(df, dfCap = Long.MaxValue)
    assert(uncapped.filter(col("da") <= 20 && col("db") <= 20).count() == 190L,
      "uncapped hot gram must emit K(K-1)/2 = 190 pairs")
    // cap below the hot df (20): boilerplate pairs vanish, rare pair stays
    val capped = DedupOps.jaccardPairs(df, dfCap = 10L)
    assert(capped.filter(col("da") <= 20 && col("db") <= 20).count() == 0L,
      "capped hot gram must emit zero pairs")
    val rarePair = capped.filter(col("da") === 100L && col("db") === 101L).collect()
    assert(rarePair.length == 1 && rarePair(0).getAs[Double]("j") == 1.0,
      "rare (df=2) pair must survive the cap with jaccard 1.0")
    // sizes are recomputed over the capped shingle space: consistent j
    assert(rarePair(0).getAs[Long]("na") == rarePair(0).getAs[Long]("nb"))
  }

  test("DF cap: default cap is above every real-corpus df (results byte-identical)") {
    val capped = DedupOps.jaccardPairs(docs).select("da", "db", "c", "na", "nb", "j")
    val full = DedupOps.jaccardPairs(docs, dfCap = Long.MaxValue)
      .select("da", "db", "c", "na", "nb", "j")
    assert(capped.exceptAll(full).isEmpty && full.exceptAll(capped).isEmpty,
      "HotGramDfCap must not change results at test scale")
  }

  test("DF cap: both exact formulations apply the same cut (A/B consistent above cap)") {
    import spark.implicits._
    // hot-gram corpus (advice r6): above the cap the pair-count and
    // array-intersect formulations must still agree — both drop the
    // same hot grams and recompute sizes over the capped space
    val hot = (1L to 20L).map(i => (i, s"common boiler plate u${i}a u${i}b"))
    val rare = Seq((100L, "rare unique phrase one two"), (101L, "rare unique phrase one two"))
    val df = (hot ++ rare).toDF("doc_id", "text")
    val a = DedupOps.jaccardPairs(df, dfCap = 10L).select("da", "db", "c", "na", "nb", "j")
    val b = DedupOps.jaccardPairsArrays(df, dfCap = 10L).select("da", "db", "c", "na", "nb", "j")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "capped jaccardPairs and jaccardPairsArrays diverged on a hot-gram corpus")
  }

  test("exact dedup groups identical texts under the min doc_id") {
    import spark.implicits._
    val df = Seq((10L, "aaa"), (11L, "bbb"), (12L, "aaa"), (13L, "aaa"))
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
    val got = df.withColumn("canonical_id", min(col("doc_id")).over(w))
      .select("doc_id", "canonical_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 11L, 12L -> 10L, 13L -> 10L))
  }
}
