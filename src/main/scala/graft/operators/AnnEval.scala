package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-index ANN quality grading — the eval family turned on the
  * approximate indexes themselves.
  *
  * `eval_recall_at_k`/`eval_ndcg_at_k` grade EXACT search against
  * label ground truth; the three approximate indexes (`ann_lsh` SRP
  * multi-probe, `ann_ivf_probe` inverted lists, `ann_pq` IVFADC codes)
  * were until now rows-only. This object runs the SAME fixed 16-query
  * sample (vec_id ≡ 3 mod 7, 16 lowest — `RetrievalOps2`'s sample)
  * through each index's probe path and grades the result against the
  * exact quantized-cosine top-10:
  *
  *  - recall@10 — |index top-10 ∩ exact top-10| / 10, the standard
  *    ANN quality number;
  *  - NDCG@10 — same intersection, but discounted by the INDEX's rank
  *    via the `RetrievalOps2.DcgW` integer constants, so an index that
  *    finds the right vectors in the wrong order scores below one that
  *    preserves the exact order. IDCG is the full prefix (exact leg
  *    always has 10 rows against a ≥16-vector corpus).
  *
  * Output per index: one row per query (qid, n_returned, hits,
  * recall, dcg_s, ndcg) — queries whose probe returns nothing (an LSH
  * bucket miss) surface as zeros, not missing rows.
  *
  * No DuckDB oracle: the probe paths ride at-rest partitioned indexes
  * and driver-enumerated probe sets that SQL cannot express; AnnSpec
  * pins hits/recall against an independent driver-side intersection of
  * the two legs and floors the per-index mean recall.
  *
  * Scale notes (100 TB):
  *  - all three probes stay corpus-size-independent: LSH reads the
  *    union of the 16 queries' hamming-≤2 bucket directories
  *    (≤16·137 of 65 536 partitions, pruned at planning time); IVF
  *    reads the union of 16×nprobe=2 inverted lists; PQ scans 4-byte
  *    (m=4) or at-rest 8-byte (PQ8, [[AnnIndex.pq8]]) codes with a
  *    broadcast ADC table and reranks only 16×100 candidates;
  *  - grading joins two ≤160-row relations per index — free;
  *  - the exact leg is the one corpus-linear pass (16·N dot products),
  *    exactly the ground-truth pass the scaladoc of RetrievalOps2
  *    prescribes running on a sampled slice at real scale.
  */
object AnnEval {
  type Q = (SparkSession, String) => DataFrame

  import RetrievalOps2.{K, NQueries}

  /** The fixed query sample's ids — a 16-row driver probe (bounded,
    * same order as RetrievalOps2's sample). Cached per (session, dir):
    * every index builder AND grade() needs the sample, so one registry
    * pass over the eval family would otherwise rerun the identical
    * pruned scan ~2× per graded query. The outer map holds the session
    * by WEAK reference — a live session object IS its own cache key
    * (no identity-hash collisions: a dead session's hash being reused
    * cannot resurrect its entries, because the entry died with the
    * session), and entries for closed sessions evaporate with GC
    * instead of accumulating for the JVM lifetime. Within one live
    * session the sample is a pure function of the dir's contents,
    * which no supported run mutates mid-session. */
  private val qidCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, Seq[Long]]]()
  private def queryIds(s: SparkSession, d: String): Seq[Long] = {
    val perSession = qidCache.synchronized {
      qidCache.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty[String, Seq[Long]])
    }
    perSession.getOrElseUpdate(d,
      Tables.embeddings(s, d).filter(col("vec_id") % 7 === 3)
        .select("vec_id").orderBy("vec_id").limit(NQueries)
        .collect().map(_.getLong(0)).toSeq)
  }

  /** Query vectors as doubles: (qid, qv) — coarse-routing side only
    * (IVF centroid ranking, PQ ADC tables). The graded fine rerank
    * never sees these: it ranks with the quantized kernel below. */
  private def queryVecsD(s: SparkSession, d: String, qids: Seq[Long]): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))

  /** Query vectors under the exact leg's quantization: (qid, qq, nq)
    * with qq = floor(x·1000) int64 — [[DedupOps.quantized]]'s math. */
  private def queryVecsQ(s: SparkSession, d: String, qids: Seq[Long]): DataFrame =
    DedupOps.quantized(Tables.embeddings(s, d).filter(col("vec_id").isin(qids: _*)))
      .select(col("vec_id").as("qid"), col("q").as("qq"), col("n").as("nq"))

  /** Fine rerank with the SAME quantized int64 kernel and tiebreak as
    * the exact leg (RetrievalOps2.rankedTopK): dot_i64 over
    * floor(x·1000) vectors, order (sim desc, vec_id). One shared
    * ordering across both legs is what makes AnnSpec's per-query
    * monotonicity asserts a theorem (a superset candidate set can
    * never evict an exact-top-10 member) instead of a
    * corpus-dependent observation — a double-cosine rerank here could
    * reorder quantized ties at the top-10 boundary. `cands` carries
    * (qid, vec_id, v: array<double> = CAST(float AS DOUBLE)), so
    * floor(v·1000) reproduces DedupOps.quantized bit-for-bit. */
  private def quantRerank(s: SparkSession, cands: DataFrame, qvecs: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.registerAll(s)
    cands
      .join(broadcast(qvecs), Seq("qid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cq", expr("transform(v, x -> CAST(floor(x * 1000) AS BIGINT))"))
      .withColumn("cn", expr("aggregate(cq, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
      // NaN-safe by construction (mirrors rankedTopKDims' sliced-dims
      // guard): a zero-quantized candidate would score 0/0 = NaN, and
      // Spark orders NaN ABOVE every real double, so one degenerate
      // vector would otherwise occupy a top-k slot in every query
      .filter(col("cn") > 0)
      .withColumn("dot", graft.functions.VectorFunctions.dot_i64(col("cq"), col("qq")))
      .withColumn("sim", col("dot") / sqrt((col("cn") * col("nq")).cast("double")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rn") <= K)
      .select("qid", "vec_id", "rn")
  }

  /** SRP multi-probe top-10 per query: each query's 137 hamming-≤2
    * buckets enumerated driver-side; ONE pruned scan over the union of
    * all probe buckets, then a (qid, bucket) broadcast join routes
    * candidates to their queries. */
  def lshTopK(s: SparkSession, d: String, radius: Int = 2, tables: Int = 1): DataFrame = {
    import s.implicits._
    val qids = queryIds(s, d)
    val qemb = Tables.embeddings(s, d).filter(col("vec_id").isin(qids: _*))
    // ONE collect for every table's 16 signatures (a union of the
    // per-table projections) instead of one driver round trip per
    // table — each collect is a full Spark job whose latency dwarfs
    // the 16-row result at any scale
    val sigsByTable: Map[Int, Seq[(Long, Int)]] =
      (0 until tables).map { t =>
        SimilarityOps.srpSignature(qemb, AnnIndex.SrpBits,
            planeOffset = t * AnnIndex.SrpBits)
          .select(lit(t).as("t"), col("vec_id"), col("srp_bucket").cast("int"))
      }.reduce(_ unionAll _)
        .collect().toSeq
        .map(r => (r.getInt(0), (r.getLong(1), r.getInt(2))))
        .groupBy(_._1).map { case (t, v) => t -> v.map(_._2) }
    val perTable = (0 until tables).map { t =>
      val idx = AnnIndex.srpTable(s, d, t)
      // a table with zero collected signatures (empty query set) must
      // yield an empty probe, not a Map.apply NoSuchElementException
      val sigs = sigsByTable.getOrElse(t, Seq.empty)
      val pairs = sigs.flatMap { case (qid, b) =>
        AnnIndex.hammingBuckets(b, radius).map(pb => (qid, pb)) }
      val union = pairs.map(_._2).distinct
      val probe = pairs.toDF("qid", "srp_bucket")
      idx.filter(col("srp_bucket").isin(union: _*))
        .join(broadcast(probe), Seq("srp_bucket"))
        .select(col("qid"), col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    }
    // within one table a vector lives in exactly one bucket (no dups);
    // across tables the same (qid, vec_id) can surface twice — dedupe
    // only when it can happen so the single-table plan stays unchanged
    val cands =
      if (tables == 1) perTable.head
      else perTable.reduce(_ union _).dropDuplicates("qid", "vec_id")
    quantRerank(s, cands, queryVecsQ(s, d, qids))
  }

  /** IVF top-10 per query: centroid ranking per query is a
    * 16×|cells| broadcast cross (tiny), the fine stage reads only the
    * union of probed inverted lists. `nprobe` is IVF's recall dial —
    * more inverted lists scanned per query, candidate volume (and
    * recall) rising with it while the plan shape stays fixed. */
  def ivfTopK(s: SparkSession, d: String, nprobe: Int = 2): DataFrame = {
    import s.implicits._
    val (lists, cents) = AnnIndex.ivf(s, d)
    val qids = queryIds(s, d)
    val qvecs = queryVecsD(s, d, qids)
    // null-label cells drop BEFORE the rank window: a null cell ranked
    // within nprobe would silently consume a probe slot, shrinking the
    // effective probe count below the dial's nominal value
    val probed = cents.filter(col("label").isNotNull)
      .crossJoin(broadcast(qvecs))
      .withColumn("cd", expr(
        "aggregate(zip_with(centroid, qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .withColumn("cn", expr("aggregate(centroid, 0D, (acc, x) -> acc + x * x)"))
      .withColumn("csim", col("cd") / sqrt(col("cn")))
      .withColumn("cr", row_number().over(
        Window.partitionBy("qid").orderBy(col("csim").desc, col("label"))))
      .filter(col("cr") <= nprobe)
      .select(col("qid"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    val cells = probed.map(_._2).distinct.toSeq
    // numeric routing join — a stringified label (the previous form)
    // silently drops any cell whose JVM rendering differs from Spark's
    // cast; the isin stays on the raw partition column so pruning is
    // untouched, and only the broadcast join condition up-casts
    val probeDf = probed.toSeq.toDF("qid", "plabel")
    val cands = lists.filter(col("label").isin(cells: _*))
      .join(broadcast(probeDf), col("label").cast("long") === col("plabel"))
      .select(col("qid"), col("vec_id"), col("v"))
    quantRerank(s, cands, queryVecsQ(s, d, qids))
  }

  /** PQ/ADC top-10 per query: same codebook + encoding as `ann_pq`
    * (m=4 × 32 anchors, computed inline exactly as the deployed query
    * does), ADC table widened to (qid, m, code) — 2048 broadcast
    * rows — then per-query approx-top-100 and exact rerank. */
  def pqTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // the SAME codebook + encode as ann_pq — one shared definition
    // (SimilarityOps2.pqAnchorsCodes), so this grades exactly the
    // deployed index, not a copy that can drift
    val (anchors, codes) = SimilarityOps2.pqAnchorsCodes(emb)
    pqAdcTopK(s, d, anchors, codes, SimilarityOps2.PqM, SimilarityOps2.PqSub)
  }

  /** PQ8 top-10 per query over the AT-REST [[AnnIndex.pq8]] index
    * (m=8 × 8-dim subspaces × 256 anchors): the recall/footprint
    * frontier's shipping point — mean recall@10 ≥ 0.8 spec-floored
    * (measured 0.96/0.89 at sf0.01/sf0.1) from an ADC scan that reads
    * 8 B/vec codes, 1/32 of the raw embedding bytes. */
  def pqTopK8(s: SparkSession, d: String): DataFrame = {
    val (anchors, codes) = AnnIndex.pq8(s, d)
    pqAdcTopK(s, d, anchors, codes, SimilarityOps2.PqM8, SimilarityOps2.PqSub8)
  }

  /** Shared ADC probe: per-query dot tables against `anchors`
    * (m·k rows per query, broadcast), approx-top-100 over `codes`,
    * exact quantized rerank of the funnel. */
  private def pqAdcTopK(s: SparkSession, d: String, anchors: DataFrame,
                        codes: DataFrame, m: Int, sub: Int): DataFrame = {
    val qids = queryIds(s, d)
    val qd = adcQueryTable(s, d, anchors, m, sub, qids)
    val scored = codes.join(broadcast(qd), Seq("m", "code"))
      .filter(col("vec_id") =!= col("qid"))
    adcFunnelRerank(s, d, scored, qids)
  }

  /** The per-(qid, m, code) ADC distance table — ONE definition for
    * every PQ-family probe, so funnel/table changes cannot drift
    * between the flat and composed paths (the drifted-copy failure
    * mode a prior review flagged on the codebook itself). */
  private def adcQueryTable(s: SparkSession, d: String, anchors: DataFrame,
                            m: Int, sub: Int, qids: Seq[Long]): DataFrame = {
    val qsub = Tables.embeddings(s, d).filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .select(col("qid"), explode(expr(SimilarityOps2.pqSubExprOf(m, sub))).as("s"))
      .select(col("qid"), col("s.m").as("m"), col("s.sv").as("qsv"))
    anchors.join(qsub, "m")
      .withColumn("qdot", expr(
        "aggregate(zip_with(av, qsv, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
      .select("qid", "m", "code", "qdot")
  }

  /** Shared funnel tail: sum per-(qid, vec_id) ADC partials, keep the
    * approx-top-100, exact-rerank with the quantized kernel. `scored`
    * carries (qid, vec_id, qdot) rows however the caller routed them. */
  private def adcFunnelRerank(s: SparkSession, d: String,
                              scored: DataFrame, qids: Seq[Long]): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val approx = scored
      .groupBy("qid", "vec_id").agg(sum("qdot").as("approx_dot"))
      .withColumn("ar", row_number().over(
        Window.partitionBy("qid").orderBy(col("approx_dot").desc, col("vec_id"))))
      .filter(col("ar") <= 100)
      .select("qid", "vec_id")
    // approx is ≤ 16·100 rows but sits above a window, so the planner
    // has no size estimate and would stage a sort-merge join (two
    // exchanges + sorts, each an AQE job) — broadcast it explicitly;
    // the corpus side is then scanned once with no shuffle (§3.1)
    val cands = broadcast(approx).join(emb, "vec_id")
      .select(col("qid"), col("vec_id"), col("v"))
    quantRerank(s, cands, queryVecsQ(s, d, qids))
  }

  /** Composed IVF+PQ top-10 per query over [[AnnIndex.ivfpq8]]: rank
    * the ≤32 cells per query (driver-side, like ivfTopK), partition-
    * prune the CODE scan to the probed cells, ADC-score only those
    * codes, top-100 funnel, exact quantized rerank. The only probe
    * here whose scanned bytes are pruned AND compressed — nprobe=16
    * touches ~50 % of the 8 B/vec codes (4 B/vec effective, half the
    * flat pq8 scan) and still clears the 0.8 recall floor.
    *
    * Note the dial is NOT per-query monotone under a fixed funnel:
    * nprobe=16's cell set is a superset of nprobe=8's, but the extra
    * cells' codes compete for the same 100 funnel slots by APPROX
    * score, so a true neighbor can be evicted by an ADC-flattering
    * impostor — AnnSpec floors the means and asserts the mean (not
    * per-query) ordering, unlike the exact-candidate LSH/IVF dials. */
  def ivfpqTopK(s: SparkSession, d: String, nprobe: Int = 8): DataFrame = {
    import s.implicits._
    val (anchors, codes, cents) = AnnIndex.ivfpq8(s, d)
    val qids = queryIds(s, d)
    val qvecs = queryVecsD(s, d, qids)
    val probed = cents.crossJoin(broadcast(qvecs))
      .withColumn("cd", expr(
        "aggregate(zip_with(centroid, qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
      .withColumn("cn", expr("aggregate(centroid, 0D, (acc, x) -> acc + x * x)"))
      .withColumn("csim", col("cd") / sqrt(col("cn")))
      .withColumn("cr", row_number().over(
        Window.partitionBy("qid").orderBy(col("csim").desc, col("cell"))))
      .filter(col("cr") <= nprobe)
      .select(col("qid"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val cells = probed.map(_._2).distinct.toSeq
    val probeDf = probed.toSeq.toDF("qid", "pcell")
    val qd = adcQueryTable(s, d, anchors,
      SimilarityOps2.PqM8, SimilarityOps2.PqSub8, qids)
    // the isin stays on the raw partition column (pruning); the qid
    // routing join then restricts each candidate to the queries that
    // actually probed its cell
    val scored = codes.filter(col("cell").isin(cells: _*))
      .join(broadcast(probeDf), col("cell").cast("int") === col("pcell"))
      .join(broadcast(qd), Seq("qid", "m", "code"))
      .filter(col("vec_id") =!= col("qid"))
    adcFunnelRerank(s, d, scored, qids)
  }

  /** Grade an index's per-query top-10 against the exact leg: recall
    * and exact-relevance NDCG discounted at the index's ranks. */
  def grade(s: SparkSession, d: String, ann: DataFrame): DataFrame = {
    import s.implicits._
    val idcg = RetrievalOps2.IdcgPrefix.last
    val exact = RetrievalOps2.rankedTopK(s, d)
      .select(col("qid"), col("vec_id"), lit(1).as("rel"))
    val qids = queryIds(s, d).toDF("qid")
    // both legs are ≤ 16·K rows but derive from windows (no stats):
    // without the hints each grading join stages a sort-merge —
    // broadcast the exact leg into the ann leg and the per-query
    // aggregate into the 16-row qid spine (§3.1)
    val per = ann.join(broadcast(exact), Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_returned"),
        sum(when(col("rel").isNotNull, 1L).otherwise(0L)).as("hits"),
        sum(when(col("rel").isNotNull, RetrievalOps2.dcgWeight(col("rn")))
          .otherwise(0L)).as("dcg_s"))
    qids.join(broadcast(per), Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg_s"), lit(0L)).as("dcg_s"))
      .withColumn("recall", col("hits").cast("double") / lit(K.toDouble))
      .withColumn("ndcg", col("dcg_s").cast("double") / lit(idcg.toDouble))
      .orderBy("qid")
  }

  val queries: Map[String, Q] = Map(
    "ann_eval_lsh" -> ((s, d) => grade(s, d, lshTopK(s, d))),
    // the two recall dials of the SRP index, each a measured point:
    // wider probe cone (radius 3 = 1.06 % of partitions, 5× the r2
    // footprint) vs a second independent hash table (2 × 0.21 %).
    // Candidate sets are supersets of ann_eval_lsh's, so per-query
    // recall is monotone ≥ the base index (AnnSpec asserts it).
    "ann_eval_lsh_r3" -> ((s, d) => grade(s, d, lshTopK(s, d, radius = 3))),
    "ann_eval_lsh_2t" -> ((s, d) => grade(s, d, lshTopK(s, d, tables = 2))),
    // both dials together — the grid corner; recall ≥ either single
    // dial per query (superset argument, AnnSpec-pinned)
    "ann_eval_lsh_r3_2t" -> ((s, d) =>
      grade(s, d, lshTopK(s, d, radius = 3, tables = 2))),
    "ann_eval_ivf" -> ((s, d) => grade(s, d, ivfTopK(s, d))),
    // IVF's own recall dial: double the probed inverted lists
    "ann_eval_ivf_np4" -> ((s, d) => grade(s, d, ivfTopK(s, d, nprobe = 4))),
    "ann_eval_pq" -> ((s, d) => grade(s, d, pqTopK(s, d))),
    // the shipping operating point: PQ8 at rest, mean recall@10 ≥ 0.8
    // (spec-floored), 8 B/vec code scan + top-100 exact rerank
    "ann_eval_pq_m8" -> ((s, d) => grade(s, d, pqTopK8(s, d))),
    // the composed IVFADC layout: pruned AND compressed. np8 reads
    // ~25 % of code bytes; np16 ~50 % (4 B/vec effective) and clears
    // the 0.8 floor — the second shipping-grade point on the frontier
    "ann_eval_ivfpq" -> ((s, d) => grade(s, d, ivfpqTopK(s, d))),
    "ann_eval_ivfpq_np16" -> ((s, d) => grade(s, d, ivfpqTopK(s, d, nprobe = 16)))
  )

  /** Not SQL-expressible (at-rest partitioned indexes + driver-side
    * probe enumeration); AnnSpec pins the grading against an
    * independent intersection of the two legs. */
  val oracles: Map[String, String] = Map.empty
}
