package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Selection tranche: brute-force parity for priority sampling, gram
  * novelty, positional phrase search, and the prefix-filtered
  * similarity join (the completeness property the prefix theorem
  * guarantees). */
class SelectionOpsSpec extends SparkSpec {

  private def docsDF(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
  }

  private def md5hex(t: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sample_weighted == JVM brute-force priority sampling; partition-invariant") {
    val texts = (0 until 200).map(i => s"doc $i " + Seq.fill(i % 37 + 1)("x").mkString(" "))
    val df = docsDF(texts)
    val k = 32
    def prio(t: String): Long = {
      val u = java.lang.Long.parseLong(md5hex(t).substring(0, 4), 16)
      u * 1000000L / math.max(t.length.toLong, 1L)
    }
    val expect = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, prio(t)) }
      .sortBy { case (id, p) => (p, id) }.take(k).map(_._1).sorted.toSeq
    val got = SelectionOps.weightedSample(df, k)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect, "selection must equal the brute-force priority order")
    val got8 = SelectionOps.weightedSample(df.repartition(8), k)
      .collect().map(_.getLong(0)).toSeq
    assert(got8 == expect, "sample must be identical under any partitioning")
  }

  test("sample_weighted favors heavy docs: selection rate grows with weight") {
    // two weight classes, same u distribution: the 10×-heavier class
    // must be sampled at a visibly higher rate
    val texts = (0 until 400).map { i =>
      if (i % 2 == 0) s"light $i" else s"heavy $i " + Seq.fill(40)("pad").mkString(" ")
    }
    val ids = SelectionOps.weightedSample(docsDF(texts), 100)
      .collect().map(_.getLong(0))
    val heavy = ids.count(_ % 2 == 1)
    assert(heavy > 70, s"heavy docs should dominate the sample, got $heavy/100")
  }

  private def bruteGrams(t: String): Seq[String] =
    t.split(" ", -1).toSeq.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq

  test("gram_novelty == brute recompute; lowest doc fully novel, clone fully stale") {
    val texts = Seq(
      "a b c d e",   // doc 0: all novel (first doc)
      "c d e f g",   // doc 1: shares 'c d e' with doc 0
      "a b c d e",   // doc 2: exact clone of doc 0 → novelty 0
      "x y z w v")   // doc 3: all novel
    val got = SelectionOps.gramNovelty(docsDF(texts))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val firstDoc = scala.collection.mutable.Map[String, Long]()
    texts.zipWithIndex.foreach { case (t, i) =>
      bruteGrams(t).toSet[String].foreach { g =>
        if (!firstDoc.contains(g) || firstDoc(g) > i) firstDoc(g) = i.toLong
      }
    }
    val expect = texts.zipWithIndex.map { case (t, i) =>
      val gs = bruteGrams(t).toSet
      val novel = gs.count(g => firstDoc(g) == i.toLong).toLong
      (i.toLong, gs.size.toLong, novel, novel * 1000000L / gs.size)
    }
    assert(got == expect)
    assert(got.head._4 == 1000000L, "first doc is fully novel")
    assert(got(2)._4 == 0L, "exact clone of an earlier doc has zero novelty")
  }

  test("phrase_match counts positional (incl. overlapping and repeated-word) hits") {
    val texts = Seq(
      "a b c a b c",   // 2 hits of 'a b c'
      "a b c",         // 1 hit
      "b c a",         // 0
      "c b a a b c x") // 1
    def brute(phrase: Seq[String]) = texts.zipWithIndex.flatMap { case (t, i) =>
      val tk = t.split(" ", -1).toSeq
      val n = tk.sliding(phrase.size).count(_ == phrase)
      if (n > 0) Some(i.toLong -> n.toLong) else None
    }.toMap
    val abc = SelectionOps.phraseMatch(docsDF(texts), Seq("a", "b", "c"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(abc == brute(Seq("a", "b", "c")))
    // repeated-word phrase: 'a a' in 'a a a a' has 3 OVERLAPPING hits —
    // the positional definition counts every start position
    val rep = SelectionOps.phraseMatch(docsDF(Seq("a a a a", "a b a a")), Seq("a", "a"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep == Map(0L -> 3L, 1L -> 1L))
  }

  private def bruteSimJoin(texts: Seq[(Long, String)], tauPpm: Long) =
    (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      sa = bruteGrams(ta).toSet; sb = bruteGrams(tb).toSet
      i = (sa & sb).size.toLong; u = (sa.size + sb.size).toLong - i
      if u > 0 && i * 1000000L / u >= tauPpm
    } yield (a, b, i * 1000000L / u)).toSet

  test("simjoin_prefix_filter == brute-force exact Jaccard join (sf0.001 corpus)") {
    val docs = Tables.documents(spark, sf)
    val got = SelectionOps.prefixFilterJoin(docs, 800000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expect = bruteSimJoin(texts, 800000L)
    assert(got == expect, "prefix filtering must lose no pair ≥ τ (and verify must kill all < τ)")
    assert(got.nonEmpty, "fixture corpus plants near-dup pairs — join must find them")
  }

  test("knn_label_vote == JVM brute 3-NN majority vote (sf0.001 embeddings)") {
    val emb = Tables.embeddings(spark, sf)
    val rows = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray, r.getInt(2).toLong))
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong)
    }.toMap
    val n = q.map { case (id, a) => id -> a.map(x => x * x).sum }
    val lab = rows.map { case (id, _, l) => id -> l }.toMap
    def sim(a: Long, b: Long): Double = {
      val d = q(a).zip(q(b)).map { case (x, y) => x * y }.sum
      d / math.sqrt(n(a).toDouble * n(b).toDouble)
    }
    val ids = rows.map(_._1)
    val expect = ids.map { a =>
      val nn = ids.filter(_ != a).map(b => (b, sim(a, b)))
        .sortBy { case (b, s) => (-s, b) }.take(3)
      val byLabel = nn.groupBy { case (b, _) => lab(b) }
        .map { case (l, xs) => (l, xs.size.toLong) }
      val (voted, votes) = byLabel.toSeq.sortBy { case (l, c) => (-c, l) }.head
      (a, lab(a), voted, votes, voted == lab(a))
    }.sortBy(_._1).toSeq
    val got = SelectionOps.queries("knn_label_vote")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == expect)
  }

  test("novelty_by_source == JVM brute first-occurrence ownership (sf0.001 corpus)") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val firstDoc = scala.collection.mutable.LinkedHashMap[String, Long]()
    docs.foreach { case (id, t, _) =>
      bruteGrams(t).toSet[String].foreach { g =>
        if (!firstDoc.contains(g)) firstDoc(g) = id
      }
    }
    val srcOf = docs.map { case (id, _, s) => id -> s }.toMap
    val owned = firstDoc.toSeq.groupBy { case (_, id) => srcOf(id) }
      .map { case (s, xs) => s -> xs.size.toLong }
    val distinctPerSrc = docs.flatMap { case (id, t, s) =>
      bruteGrams(t).toSet[String].map(g => (s, g))
    }.distinct.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val expect = distinctPerSrc.toSeq.sortBy(_._1).map { case (s, nd) =>
      val no = owned.getOrElse(s, 0L)
      (s, nd, no, no * 1000000L / nd)
    }
    val got = SelectionOps.queries("novelty_by_source")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.map(_._3).sum == firstDoc.size.toLong,
      "every distinct gram is owned by exactly one source")
  }

  test("simjoin_prefix_filter complete at a low τ too (synthetic, heavier overlap)") {
    // lower τ stresses the prefix bound (longer prefixes, more cands)
    val base = "q w e r t y u i o p a s d f g h j k l"
    val texts = Seq(
      base, base + " z", base.replace("q w e", "z x c"),
      "m n b v c x z l k j h g f d s a p o i u",
      base + " extra tail tokens here")
    val df = docsDF(texts)
    val got = SelectionOps.prefixFilterJoin(df, 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = bruteSimJoin(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, 500000L)
    assert(got == expect)
    assert(expect.nonEmpty)
  }
}
