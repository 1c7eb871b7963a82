package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over `documents` / `embeddings` — the
  * training-data-pipeline extension operators (builder brief):
  *
  *  - exact dedup (hash-groupBy): oracle-checked;
  *  - n-gram Jaccard near-dup (shingle inverted index → pair
  *    intersection): oracle-checked;
  *  - MinHash + LSH (band-bucket join): the 100 TB scale path — the
  *    exact pairwise join's cost is Σ_g freq(g)², unbounded under skew,
  *    while LSH buckets bound candidate generation; spec-tested against
  *    the exact path (recall invariant), no SQL oracle (hash mixing is
  *    engine-specific);
  *  - SimHash (64-bit, 4-block hamming LSH): spec-tested;
  *  - embedding-cosine near-dup: oracle-checked via quantized integer
  *    dot products (exact, associative → partition-order-independent).
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** The ONE definition of a doc's 3-word shingle array (over the
    * tokenized `w` column) — shared by the exact-jaccard path and the
    * hashed LSH path so their shingle semantics can never diverge. */
  private[operators] val gramArrayExpr =
    "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))"

  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .filter(size(col("w")) >= 3)

  /** Per-doc DISTINCT shingle-hash SET as a row-local array column:
    * (doc_id, ghs: array<long>, n = |ghs|). xxhash64 per gram +
    * array_distinct happen inside one map stage — no explode, no
    * distinct shuffle. A 64-bit collision merging two shingles is
    * ~2^-64-rare; every consumer (candidate generation, intersection
    * counts) tolerates it. The corpus parquet is one small file = one
    * input split, but this map stage carries all the hashing work —
    * round-robin it across the cluster first. */
  def docShingleArrays(docs: DataFrame): DataFrame =
    docShingleArraysCarry(docs, Nil)

  /** As [[docShingleArrays]] but carrying extra row-local columns
    * through the shingling map — callers that need a doc attribute
    * (e.g. `source`) next to the shingle array previously re-joined
    * the corpus on doc_id just to re-attach a column the source row
    * already had (one corpus scan + one join saved). */
  def docShingleArraysCarry(docs: DataFrame, carryCols: Seq[String]): DataFrame = {
    val keep = (Seq("doc_id") ++ carryCols).map(col)
    docs.select(keep :+ split(col("text"), " ", -1).as("w"): _*)
      .filter(size(col("w")) >= 3)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(keep :+
        expr(s"array_distinct(transform($gramArrayExpr, g -> xxhash64(g)))").as("ghs"): _*)
      .withColumn("n", size(col("ghs")).cast("long"))
  }

  /** Same map stage without the spread-the-scan repartition — for
    * streaming inputs (already micro-batch partitioned) and callers
    * that manage their own partitioning. */
  def docShingleArraysNoRepartition(docs: DataFrame, preTokenized: Boolean = false): DataFrame =
    (if (preTokenized) docs else tokenized(docs))
      .select(col("doc_id"),
        expr(s"array_distinct(transform($gramArrayExpr, g -> xxhash64(g)))").as("ghs"))
      .withColumn("n", size(col("ghs")).cast("long"))

  /** Distinct 3-word shingles per doc: (doc_id, g). Short docs (<3
    * tokens) produce no shingles, matching the SQL oracle. */
  def shingles(docs: DataFrame): DataFrame =
    tokenized(docs)
      .select(col("doc_id"), explode(expr(gramArrayExpr)).as("g"))
      .distinct()

  /** All near-dup pairs (da < db) with exact Jaccard over shingle sets.
    *
    * Inverted-index join on the HASHED shingle finds pairs sharing ≥1
    * shingle (cost Σ_g freq(g)² — the reason MinHash-LSH exists for the
    * skewed case); the intersection size c falls out of a count
    * aggregation on (da, db) — shingles are DISTINCT per doc, so each
    * shared shingle contributes exactly one joined row. The rows are
    * narrow (two longs) and map-side partial aggregation collapses them
    * before the shuffle; sizes join in via broadcast of the tiny
    * (doc_id, n) tier. This replaced an array_intersect formulation
    * that attached both docs' full shingle arrays to every candidate
    * pair — |pairs| × |shingles| element compares dominated the
    * runtime (~2× slower measured at sf0.1). */
  /** Document-frequency cap for the exact inverted-index pair joins.
    * A gram shared by K docs emits K·(K-1)/2 pair rows, so one
    * stop-phrase shingle in 10⁶ docs would emit ~5·10¹¹ rows — the one
    * quadratic blowup in the exact path. Grams with df above the cap
    * are dropped BEFORE the pair join, which bounds total pair rows at
    * dfCap × |inverted index| (linear in corpus size) and costs ~zero
    * signal: a gram shared by >1000 docs is boilerplate, not evidence
    * of near-duplication. The cap is far above the max df at every
    * test scale (7 at sf0.01, 25 at sf0.1 — measured), so oracle
    * results are byte-identical below it; DedupSpec pins the cap
    * semantics on a synthetic hot-gram corpus. */
  val HotGramDfCap = 1000L

  def jaccardPairs(docs: DataFrame, dfCap: Long = HotGramDfCap): DataFrame = {
    // one row per doc (~|ghs| longs each): materialize once — it feeds
    // both sides of the inverted-index join AND the sizes tier
    val arrs = docShingleArrays(docs).localCheckpoint(true)
    val inv0 = arrs.select(col("doc_id"), explode(col("ghs")).as("gh"))
    // DF cut (see HotGramDfCap): the df tier and the semi-join both key
    // on the gram hash — the same key as the pair join, so the shuffle
    // layout is shared across all three.
    val cold = inv0.groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("gh")
    // checkpoint: the capped index feeds both pair-join legs AND both
    // broadcast sizes tiers — without it the df-cut lineage (explode +
    // groupBy + semi-join) can be recomputed up to 4× when AQE exchange
    // reuse doesn't cover the broadcast subqueries
    val inv = inv0.join(cold, Seq("gh"), "left_semi").localCheckpoint(true)
    val counted = inv.as("a").join(inv.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
    // sizes recomputed over the CAPPED shingle space so the Jaccard
    // denominator stays consistent with the intersection count
    val sizes = inv.groupBy("doc_id").agg(count(lit(1)).as("n"))
    counted
      .join(broadcast(sizes.select(col("doc_id").as("da"), col("n").as("na"))), "da")
      .join(broadcast(sizes.select(col("doc_id").as("db"), col("n").as("nb"))), "db")
      .select(col("da"), col("db"), col("c"), col("na"), col("nb"),
        (col("c") * lit(1.0) / (col("na") + col("nb") - col("c"))).as("j"))
  }

  /** The array_intersect formulation jaccardPairs replaced — kept for
    * the equivalence spec (and as the shape to prefer if shingle
    * arrays ever get short enough that per-pair intersects beat the
    * pair-count shuffle). */
  def jaccardPairsArrays(docs: DataFrame, dfCap: Long = HotGramDfCap): DataFrame = {
    val arrs0 = docShingleArrays(docs).localCheckpoint(true)
    // same DF cut as jaccardPairs, applied to the ARRAY representation:
    // drop hot grams from every doc's shingle array, so the two exact
    // formulations stay mutually A/B-consistent above the cap (advice
    // r6: previously this path used the full shingle space and diverged
    // from the capped jaccardPairs on a hot-gram corpus)
    val inv0 = arrs0.select(col("doc_id"), explode(col("ghs")).as("gh"))
    val hot = inv0.groupBy("gh").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("gh")
    val hotArr = hot.agg(collect_set(col("gh")).as("hot"))
    val arrs = arrs0.crossJoin(broadcast(hotArr))
      .select(col("doc_id"),
        expr("array_except(ghs, hot)").as("ghs"))
      .withColumn("n", size(col("ghs")).cast("long"))
      .localCheckpoint(true)
    val inv = arrs.select(col("doc_id"), explode(col("ghs")).as("gh"))
    val cand = inv.as("a").join(inv.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cand
      .join(broadcast(arrs.select(col("doc_id").as("da"), col("ghs").as("ga"), col("n").as("na"))), "da")
      .join(broadcast(arrs.select(col("doc_id").as("db"), col("ghs").as("gb"), col("n").as("nb"))), "db")
      .withColumn("c", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .select(col("da"), col("db"), col("c"), col("na"), col("nb"),
        (col("c") * lit(1.0) / (col("na") + col("nb") - col("c"))).as("j"))
  }

  /** Exact jaccard for a GIVEN candidate pair set only: broadcast-join
    * each side's shingle array in, intersect row-locally. Cost is
    * bounded by candidate count × shingles-per-doc — the rerank stage
    * of the LSH path, never N². (At corpus scale the broadcast becomes
    * a shuffle join keyed by doc_id; the row-local intersect is
    * unchanged.)
    *
    * NOTE: computes Jaccard over the FULL shingle space — no DF cap.
    * That is intentional: the candidate set is already bounded (LSH
    * buckets), so there is no pair blowup to guard against, and the
    * rerank should score the true similarity. Its values can therefore
    * differ from the capped [[jaccardPairs]] on a corpus with grams
    * above [[HotGramDfCap]]. */
  def verifyJaccard(docs: DataFrame, cands: DataFrame): DataFrame = {
    // feeds BOTH broadcast sides — materialize the corpus hashing once
    val arrs = docShingleArrays(docs).localCheckpoint(true)
    cands
      .join(broadcast(arrs.select(col("doc_id").as("da"), col("ghs").as("ga"), col("n").as("na"))), "da")
      .join(broadcast(arrs.select(col("doc_id").as("db"), col("ghs").as("gb"), col("n").as("nb"))), "db")
      .withColumn("c", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .select(col("da"), col("db"),
        (col("c") * lit(1.0) / (col("na") + col("nb") - col("c"))).as("jaccard"))
  }

  /** 64-permutation MinHash signature per doc (long array), via
    * universal hashing over the xxhash64 shingle hash. Deterministic
    * constants — no RNG (reproducible across runs/executors).
    * Row-local: one native-kernel expression per doc over its own
    * shingle-hash array — a pure map stage (the groupBy formulation
    * shuffled every (doc, shingle) row through a 64-buffer aggregate;
    * the higher-order-function formulation paid two boxed lambda
    * dispatches per (perm, shingle)). See [[graft.functions.MinHashSig]]. */
  def minhashSignatures(docs: DataFrame, numPerm: Int = 64): DataFrame = {
    graft.functions.MinHashSig.registerAll(docs.sparkSession)
    docShingleArrays(docs)
      .select(col("doc_id"), graft.functions.MinHashSig.minhash_sig(col("ghs")).as("sig"))
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numPerm), bucket-join on (band, hash(band slice)). This is the
    * scale path: candidates per doc ≈ bucket collisions, not N². */
  def minhashCandidates(sigs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // materialize once — feeds both sides of the bucket self-join
    val banded = sigs.select(col("doc_id"), posexplode(expr(
      s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
      .as(Seq("band", "bucket")))
      .localCheckpoint(true)
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"))
      .distinct()
  }

  /** SimHash: 64-bit signature = sign of per-bit weighted sums of token
    * hashes. Near-dups have small hamming distance. Row-local scalar
    * kernel over the token array (see [[graft.functions.SimHashSig]]) —
    * a pure map stage, no token explode / aggregation shuffle. */
  def simhash(docs: DataFrame): DataFrame = {
    graft.functions.SimHashFunctions.registerAll(docs.sparkSession)
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash_sig(split(col("text"), " ", -1)).as("simhash"))
  }

  /** Same signature via the mergeable sketch aggregate (for inputs that
    * arrive pre-exploded; kept for the three-way equivalence spec). */
  def simhashViaAgg(docs: DataFrame): DataFrame = {
    graft.functions.SimHashFunctions.registerAll(docs.sparkSession)
    docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("t"))
      .groupBy("doc_id")
      .agg(graft.functions.SimHashFunctions.simhash_agg(col("t")).as("simhash"))
  }

  /** Reference formulation of the same signature via 64 independent
    * sum(when(...)) aggregates — kept for the equivalence spec. */
  def simhashViaExprs(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Quantized embedding vectors: exact integer math (floor(x*1000)) so
    * dot products are associative → identical under any partitioning,
    * and oracle-expressible. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
      .withColumn("n", expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))

  /** Connected components over an undirected pair graph by iterative
    * min-label propagation: every doc starts labeled with its own id;
    * each round takes the min label across itself and its neighbors.
    * Converges in O(diameter) rounds; labels only decrease, so an
    * unchanged label-sum is a fixpoint. Per-round localCheckpoint
    * truncates lineage — the standard iterative-Spark discipline
    * (without it the plan doubles per round).
    *
    * This is the piece that turns pairwise near-dup detection into
    * dedup groups ("keep one per component") at corpus scale. */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
                          maxIters: Int = 50): DataFrame = {
    // the iterated relations are pair-graph-sized (≪ corpus); wide
    // partitioning just multiplies per-iteration task overhead — at
    // larger graph sizes raise this toward the cluster's parallelism
    val p = 8
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
      .unionAll(pairs.select(col("db").as("src"), col("da").as("dst")))
      .repartition(p, col("src"))
      .localCheckpoint(true)
    // iterate ONLY over vertices that appear in the edge set — near-dup
    // graphs are tiny next to the corpus, and singletons can't change
    // label; they rejoin (label = own id) after the fixpoint
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
      .repartition(p, col("doc_id"))
      .localCheckpoint(true)
    var prevSum = Long.MaxValue
    var iter = 0
    // an empty pair graph is already converged (every doc is its own
    // component); entering the loop would read sum(label) of an empty
    // relation as NULL and NPE
    var converged = labels.isEmpty
    while (iter < maxIters && !converged) {
      val nb = edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
        .select(col("dst").as("doc_id"), col("label"))
      labels = labels.unionAll(nb)
        .groupBy("doc_id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val sum = labels.agg(org.apache.spark.sql.functions.sum("label"))
        .collect()(0).getLong(0)
      converged = sum == prevSum
      prevSum = sum
      iter += 1
    }
    System.err.println(s"[cc] converged=$converged iters=$iter")
    // returning partially-propagated labels would silently split real
    // components — refuse instead (diameter > maxIters means the caller
    // should raise the bound or switch to large-star/small-star)
    require(converged,
      s"connectedComponents did not converge in $maxIters iterations")
    vertices.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("label"))
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): converges in O(log n) rounds instead of the min-label
    * propagation's O(diameter) — the scale path for long-chain graphs
    * (min-label stays the default for near-dup graphs, whose diameter
    * is tiny; spec asserts both produce identical components).
    *
    * large-star: every node points its LARGER neighbors at the minimum
    * of its neighborhood (keeps edges to smaller nodes intact);
    * small-star: every node points its smaller-or-equal neighbors at
    * the neighborhood minimum. Fixpoint = a star forest: every node
    * linked directly to its component's minimum. */
  def connectedComponentsStar(vertices: DataFrame, pairs: DataFrame,
                              maxIters: Int = 30): DataFrame = {
    val p = 8
    def neighborhoodMin(e: DataFrame): DataFrame =
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        .groupBy("src")
        .agg(least(min(col("dst")), col("src").cast("long")).as("m"))
    // canonical undirected edge orientation (src > dst), self-loops out
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
    var edges = canon(pairs.select(col("da").as("src"), col("db").as("dst")))
      .repartition(p, col("src"))
      .localCheckpoint(true)
    var iter = 0
    var done = edges.isEmpty
    var prevDigest: org.apache.spark.sql.Row = null
    while (iter < maxIters && !done) {
      // large-star: (v, m(u)) for v ∈ N(u), v > u — with edges oriented
      // src > dst this is src pointed at min over u = dst's neighborhood
      val lsMin = neighborhoodMin(edges)
      val large = canon(edges
        .join(lsMin.withColumnRenamed("src", "dst"), "dst")
        .select(col("src"), col("m").as("dst")))
      // small-star: (v, m(u)) for v ≤ u, v ∈ N(u) ∪ {u} — one join,
      // both output rows emitted via explode so the join isn't
      // evaluated twice
      val ssMin = neighborhoodMin(large)
      val small = canon(large.join(ssMin, "src")
        .select(explode(array(
          struct(col("dst").as("s"), col("m").as("d")),
          struct(col("src").as("s"), col("m").as("d")))).as("e"))
        .select(col("e.s").as("src"), col("e.d").as("dst")))
        .repartition(p, col("src"))
        .localCheckpoint(true)
      // fixpoint when the canonical edge set is unchanged: compare a
      // cheap order-independent digest (count + sum of key pairs),
      // carried across rounds so each edge set is digested once
      val dNew = small.agg(count(lit(1)), sum(col("src") * 31 + col("dst"))).collect()(0)
      done = prevDigest != null && prevDigest == dNew &&
        edges.exceptAll(small).isEmpty // digest collision guard: exact check
      prevDigest = dNew
      edges = small
      iter += 1
    }
    System.err.println(s"[cc-star] converged=$done iters=$iter")
    require(done, s"connectedComponentsStar did not converge in $maxIters iterations")
    // star forest: every non-root points at its component min
    vertices.select(col("doc_id"))
      .join(edges.select(col("src").as("doc_id"), col("dst").as("label")), Seq("doc_id"), "left")
      .groupBy("doc_id").agg(coalesce(min(col("label")), first(col("doc_id"))).as("label"))
  }

  /** Connected components via driver-side union-find — the small-graph
    * fast path. Near-dup pair graphs are tiny relative to the corpus
    * (pairs ≪ docs ≪ corpus bytes), so once the pair set fits on the
    * driver the O(E α(E)) union-find beats any iterative distributed
    * scheme by the per-round job overhead × rounds. Union-by-min keeps
    * the invariant that every root is its component's minimum id. */
  def connectedComponentsLocal(vertices: DataFrame, edgeRows: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edgeRows.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val nodes = edgeRows.iterator.flatMap { case (a, b) => Iterator(a, b) }.toSet
    val spark = vertices.sparkSession
    import spark.implicits._
    val labelDf = nodes.iterator.map(v => (v, find(v))).toSeq.toDF("doc_id", "label")
    vertices.select(col("doc_id"))
      .join(broadcast(labelDf), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("label"))
  }

  /** Adaptive connected components: collect the pair graph if it is
    * small (the overwhelmingly common near-dup case) and union-find on
    * the driver; otherwise run the O(log n)-round large-star/small-star
    * algorithm. Mirrors Spark's own broadcast-join adaptivity — pick
    * the local algorithm exactly when the data provably fits. */
  def connectedComponentsAuto(vertices: DataFrame, pairs: DataFrame,
                              smallThreshold: Int = 500000): DataFrame = {
    // materialize the (tiny) pair graph ONCE, then size-probe and
    // collect from the checkpoint — a limit().collect() probe would
    // re-execute the whole upstream pair pipeline per scale-up round
    // of CollectLimit's incremental scan
    val edges = pairs
      .select(col("da").cast("long").as("da"), col("db").cast("long").as("db"))
      .localCheckpoint(true)
    if (edges.count() <= smallThreshold)
      connectedComponentsLocal(vertices, edges.collect().map(r => (r.getLong(0), r.getLong(1))))
    else connectedComponentsStar(vertices, edges)
  }

  val queries: Map[String, Q] = Map(
    // exact dedup: canonical = min doc_id per identical text
    "dedup_exact" -> ((s, d) => {
      val w = Window.partitionBy("text")
      Tables.documents(s, d)
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("canonical_id"),
          (col("doc_id") =!= col("canonical_id")).as("is_dup"))
        .orderBy("doc_id")
    }),

    // n-gram Jaccard: best near-dup neighbor per doc (exact path).
    // argmax-per-doc is a max(struct) agg (ties → lowest other_id via
    // the negated id), not a window sort; the docs join broadcasts the
    // small best-neighbor side into the corpus scan.
    "dedup_ngram_jaccard" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // pair relation feeds BOTH mirror branches of the union — without
      // the checkpoint each branch re-ran the full inverted-index pair
      // pipeline (the multi-branch rule; 2× the dominant cost)
      val jac = jaccardPairs(docs).select("da", "db", "j").localCheckpoint(true)
      val und = jac.select(col("da").as("doc_id"), col("db").as("other_id"), col("j"))
        .unionAll(jac.select(col("db").as("doc_id"), col("da").as("other_id"), col("j")))
      val best = und
        .groupBy("doc_id")
        .agg(max(struct(col("j"), (-col("other_id")).as("no"))).as("m"))
        .select(col("doc_id"), (-col("m.no")).as("other_id"), col("m.j").as("j"))
      docs.select("doc_id")
        .join(broadcast(best), Seq("doc_id"), "left")
        .select(col("doc_id"), col("other_id").as("best_match"),
          coalesce(col("j"), lit(0.0)).as("jaccard"))
        .orderBy("doc_id")
    }),

    // MinHash-LSH near-dup candidates, verified with exact jaccard
    // computed ONLY for candidate pairs (the whole point of LSH: the
    // N² exact path never runs) — rows-only check (engine-specific
    // hashing); recall invariant is spec-tested against the exact path
    "dedup_minhash_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // candidate set materialized once: it is tiny (bucket collisions)
      // and feeds the rerank join's stream side
      val cands = minhashCandidates(minhashSignatures(docs)).localCheckpoint(true)
      verifyJaccard(docs, cands)
        .filter(col("jaccard") >= 0.5)
        .orderBy("da", "db")
    }),

    // SimHash near-dup: 4-block hamming LSH (dist ≤ 3 ⇒ one 16-bit
    // block equal) — rows-only
    "dedup_simhash" -> ((s, d) => {
      val sh = simhash(Tables.documents(s, d))
      val blocks = sh.select(col("doc_id"), col("simhash"), posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b * 16)) & 65535)"))
        .as(Seq("blk", "key")))
        .localCheckpoint(true) // 64-expr simhash agg runs once, not twice
      // do NOT add a repartition(blk, key) here (the sparse_cosine_topk
      // shared-exchange pattern): measured 2.6× SLOWER (r19 A/B
      // min-of-5, 3.26 vs 1.25 s) — the checkpointed relation is small
      // enough that the planner picks a cheaper join than two wide
      // shuffles, and the forced exchange defeats it
      val l = blocks.as("l")
      val r = blocks.as("r")
      val hamming = (0 until 64)
        .map(i => shiftright(col("l.simhash").bitwiseXOR(col("r.simhash")), i)
          .bitwiseAND(lit(1L)))
        .reduce(_ + _)
      l.join(r, col("l.blk") === col("r.blk") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"), hamming.as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy("da", "db")
    }),

    // near-dup GROUPS: connected components of the jaccard>=0.5 pair
    // graph — each doc mapped to its component's min doc_id (the
    // canonical survivor). Oracle-checked via a DuckDB recursive-CTE
    // transitive closure; also validated against a driver-side
    // union-find in DedupSpec.
    "dedup_cluster" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = jaccardPairs(docs).filter(col("j") >= 0.5).select("da", "db")
      connectedComponentsAuto(docs.select("doc_id"), pairs)
        .select(col("doc_id"), col("label").as("cluster_id"))
        .orderBy("doc_id")
    }),

    // containment near-dup: c / min(na, nb) ≥ 0.9 — catches docs that
    // are near-SUBSETS of another (prepended boilerplate, truncations),
    // which symmetric Jaccard dilutes below any usable threshold when
    // the sizes differ. Same counted pair pipeline, different ratio.
    "dedup_containment" -> ((s, d) => {
      jaccardPairs(Tables.documents(s, d))
        .withColumn("containment",
          col("c").cast("double") / least(col("na"), col("nb")).cast("double"))
        .filter(col("containment") >= 0.9)
        .select("da", "db", "containment")
        .orderBy("da", "db")
    }),

    // embedding-cosine near-dup: best neighbor per vector, exact
    // quantized integer math — oracle-checked.
    // Perf shape: each unordered pair's dot product is computed ONCE
    // (upper triangle, va < vb), through the codegen dot_i64 kernel,
    // then mirrored; argmax-per-vector is a map-side max(struct) agg —
    // no 4M-row window sort. At cluster scale this is the exact-path
    // baseline the LSH variant bounds.
    // blocked exact kernel (EmbeddingNeighbors): the expression-join
    // form shuffled N²/2 pair rows into the argmax and blew up 51× at
    // the 10× scale sweep; the blocked form shuffles N·blocks partial
    // bests and runs the dots in tight primitive loops — same exact
    // semantics, same oracle hashes
    "dedup_embedding_near" -> ((s, d) =>
      EmbeddingNeighbors.bestNeighbor(
        Tables.embeddings(s, d), crossLabelOnly = false)
        .select(col("vec_id"), col("cand").as("best_match"), col("sim"))
        .orderBy("vec_id"))
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical_id,
        |       doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |jac AS (SELECT da, db, c * 1.0 / (sa.n + sb.n - c) AS j
        |        FROM inter
        |        JOIN sizes sa ON sa.doc_id = da
        |        JOIN sizes sb ON sb.doc_id = db),
        |und AS (SELECT da AS doc_id, db AS other_id, j FROM jac
        |        UNION ALL SELECT db, da, j FROM jac),
        |best AS (SELECT doc_id, other_id, j,
        |                row_number() OVER (PARTITION BY doc_id
        |                                   ORDER BY j DESC, other_id) AS rn
        |         FROM und)
        |SELECT d.doc_id, b.other_id AS best_match,
        |       COALESCE(b.j, 0.0) AS jaccard
        |FROM documents d
        |LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    // same jaccard pipeline as dedup_ngram_jaccard, then connected
    // components as a recursive transitive closure (UNION dedups across
    // iterations → terminates); cluster id = min reachable doc_id.
    // Feasible for the oracle because near-dup components are tiny.
    "dedup_cluster" ->
      """WITH RECURSIVE
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |jac AS (SELECT da, db
        |        FROM inter
        |        JOIN sizes sa ON sa.doc_id = da
        |        JOIN sizes sb ON sb.doc_id = db
        |        WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5),
        |edges AS (SELECT da AS src, db AS dst FROM jac
        |          UNION ALL SELECT db, da FROM jac),
        |reach(a, b) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b)
        |SELECT a AS doc_id, min(b) AS cluster_id
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    "dedup_containment" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT da, db,
        |       CAST(c AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) AS containment
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = da
        |JOIN sizes sb ON sb.doc_id = db
        |WHERE CAST(c AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE) >= 0.9
        |ORDER BY da, db""".stripMargin,

    "dedup_embedding_near" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sum(x * x) AS n FROM e GROUP BY vec_id),
        |dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.x * b.x) AS dot
        |         FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        |         GROUP BY 1, 2),
        |sims AS (SELECT va, vb,
        |                CAST(dot AS DOUBLE)
        |                  / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS sim
        |         FROM dots
        |         JOIN norms na ON na.vec_id = va
        |         JOIN norms nb ON nb.vec_id = vb),
        |best AS (SELECT va, vb, sim,
        |                row_number() OVER (PARTITION BY va
        |                                   ORDER BY sim DESC, vb) AS rn
        |         FROM sims)
        |SELECT va AS vec_id, vb AS best_match, sim
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin
  )
}
