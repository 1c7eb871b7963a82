package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exact best-neighbor search over an embedding column, blocked.
  *
  * The naive exact form (`a JOIN b ON va < vb` + per-pair dot
  * expression + argmax agg) is correct but its PLAN is quadratic in
  * rows shuffled: N²/2 `(va, vb, sim)` rows feed the argmax exchange,
  * and each dot pays expression-eval overhead per pair. Measured at
  * the 10× scale sweep it blew up 51-62× for 10× data
  * (BENCH_SCALE_FULL.json, pre-fix).
  *
  * This kernel keeps the EXACT semantics (every cross pair's cosine is
  * still computed — inherent to exactness; the approximate escape
  * hatches are the ANN/LSH operators) but fixes the plan:
  *  - vectors are hash-grouped into ~[[DefaultBlocks]] blocks; block
  *    PAIRS (B(B+1)/2 of them) become the unit of work;
  *  - each task runs a dense block×block loop over primitive arrays
  *    (quantized longs, no per-pair codegen dispatch, no row copies)
  *    and keeps one running best per vector per block pair;
  *  - only those partial bests — N·B rows total instead of N²/2 —
  *    shuffle into the final argmax.
  * Tie-breaking matches the expression form exactly: highest sim,
  * then lowest candidate id (`max(struct(sim, -cand))`), and the sim
  * arithmetic yields the identical IEEE value (integer dot; norms are
  * exact as doubles so the double norm product is the same correctly-
  * rounded value the long multiply gave, minus its silent-wrap
  * failure mode; sqrt, divide), so oracle hashes are unchanged.
  *
  * At 1000 executors each block pair is an independent task over two
  * ~N/B-vector tiles: compute scales out, shuffle stays linear in N.
  */
object EmbeddingNeighbors {
  val DefaultBlocks = 16

  /** (block, vec_id, label, q, n) tiles, sorted by vec_id within.
    * Public: the Dataset encoder's generated code can't touch a
    * private class. */
  case class Tile(b: Int, ids: Array[Long], labels: Array[Int],
                  qs: Array[Array[Long]], ns: Array[Long])

  /** Target vectors per tile: bounds the per-row payload a tile packs
    * (mapGroups holds one tile per task), so block count SCALES with N
    * instead of tile size scaling with N — at 4096 × 128-dim longs a
    * tile is ~4 MB regardless of corpus size. */
  val TargetPerTile = 4096L

  /** Per-vector exact best cross neighbor. `crossLabelOnly=true` is
    * hard-negative mining (best neighbor with a DIFFERENT label);
    * false is near-dup search (best neighbor, any label). Output:
    * (vec_id, cand, sim) — one row per vector that has ≥1 candidate.
    *
    * NaN parity: a zero-norm vector (all components quantize to 0)
    * yields sim = 0/0 = NaN for its pairs. The replaced expression form
    * ranked those through Spark's NaN-sorts-greatest ordering, so the
    * loop comparator does the same (NaN beats every finite sim; NaN
    * ties break to the lower candidate id). */
  def bestNeighbor(emb: DataFrame, crossLabelOnly: Boolean,
                   numBlocks: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // Null-label semantics match the SQL oracle's `a.label <> b.label`:
    // a NULL comparison is never true, so null-label vectors take part
    // in NO cross-label pair (neither as source nor as candidate) —
    // drop them up front. For plain near-dup search labels are unused.
    val src =
      if (crossLabelOnly) emb.filter(col("label").isNotNull)
      else emb
    // label rides the tile only in cross mode; the default path takes a
    // constant column instead of joining the input against its own
    // projection
    val q0 = DedupOps.quantized(src.select(col("vec_id"), col("embedding")))
    val q =
      if (crossLabelOnly)
        q0.join(src.select(col("vec_id"), col("label").cast("int").as("label")), "vec_id")
      else q0.withColumn("label", lit(0))
    val blocks =
      if (numBlocks > 0) numBlocks
      // count the bare input, not q: the vec_id join is 1:1, so this is
      // a pruned parquet count instead of a second quantize+join pass
      else math.max(DefaultBlocks, (src.select(col("vec_id")).count() / TargetPerTile).toInt + 1)
    val tiles: Dataset[Tile] = q
      .select(pmod(hash(col("vec_id")), lit(blocks)).cast("int").as("b"),
        col("vec_id"), col("label"), col("q"), col("n"))
      .as[(Int, Long, Int, Seq[Long], Long)]
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        val rows = it.toArray.sortBy(_._2)
        Tile(b, rows.map(_._2), rows.map(_._3), rows.map(_._4.toArray), rows.map(_._5))
      }
    // All B(B+1)/2 block pairs via an explicit pair-id hash shuffle:
    // each tile fans out once per pair it belongs to, keyed by
    // (lo*blocks + hi), and lands ONLY on the tasks that score it —
    // versus the previous `x.b <= y.b` joinWith, which planned as a
    // BroadcastNestedLoopJoin shipping the ENTIRE tiled corpus to
    // every task (and recomputed the quantize+groupByKey stage for
    // both join sides). Bytes moved: O(N·B), one equi-shuffle, no
    // broadcast of the corpus, tiles computed exactly once.
    val nb = blocks
    val partials = tiles
      .flatMap(t => Iterator.range(0, nb).map { o =>
        val lo = math.min(t.b, o); val hi = math.max(t.b, o)
        (lo * nb + hi, t)
      })
      .groupByKey(_._1)
      .flatMapGroups { (pid, it) =>
        val ts = it.map(_._2).toArray
        // diagonal pair (b,b) arrives as one tile; off-diagonal as
        // two. A single tile under an OFF-diagonal key means the
        // partner block hashed empty — nothing to score (the true
        // diagonal group covers the tile's own pairs).
        val x = ts(0)
        val y = if (ts.length > 1) ts(1) else ts(0)
        if (ts.length == 1 && pid != x.b * nb + x.b)
          Iterator.empty[(Long, Long, Double)]
        else {
      // Double.compare ranks NaN above every finite/inf value — the
      // same total order Spark's max(struct(sim, ...)) used
      @inline def beats(s: Double, c: Long, bs: Double, bc: Long): Boolean = {
        val cmp = java.lang.Double.compare(s, bs)
        cmp > 0 || (cmp == 0 && c < bc)
      }
      val sameTile = x.b == y.b
      val nx = x.ids.length; val ny = y.ids.length
      // running best per vector of each tile for THIS block pair
      val bxSim = Array.fill(nx)(Double.NegativeInfinity); val bxId = new Array[Long](nx)
      val bySim = Array.fill(ny)(Double.NegativeInfinity); val byId = new Array[Long](ny)
      var i = 0
      while (i < nx) {
        val qi = x.qs(i); val ni = x.ns(i); val li = x.labels(i)
        var j = if (sameTile) i + 1 else 0 // same tile: upper triangle once
        while (j < ny) {
          if (!crossLabelOnly || li != y.labels(j)) {
            val qj = y.qs(j)
            var d = 0L; var k = 0
            val len = math.min(qi.length, qj.length)
            while (k < len) { d += qi(k) * qj(k); k += 1 }
            // EXACT same IEEE value as the expression form's
            // dot / sqrt(double(na * nb)): each norm is < 2^53 so
            // toDouble is exact and the product is the one correctly-
            // rounded double either way — but the double multiply
            // cannot wrap, where the raw long multiply silently
            // overflowed for large-magnitude unnormalized embeddings
            val sim = d / math.sqrt(ni.toDouble * y.ns(j).toDouble)
            if (beats(sim, y.ids(j), bxSim(i), bxId(i))) {
              bxSim(i) = sim; bxId(i) = y.ids(j)
            }
            if (beats(sim, x.ids(i), bySim(j), byId(j))) {
              bySim(j) = sim; byId(j) = x.ids(i)
            }
          }
          j += 1
        }
        i += 1
      }
      // emit both sides' partials; for sameTile the i<j loop updated
      // bx (as i) AND by (as j) from the two triangle roles, and the
      // final argmax merges them — no pair is ever scored twice
      // "has a candidate" must survive NaN bests: primitive `>` is
      // false for NaN, Double.compare ranks it above the sentinel
      @inline def seen(s: Double) =
        java.lang.Double.compare(s, Double.NegativeInfinity) != 0
      val xs = (0 until nx).iterator.filter(i => seen(bxSim(i)))
        .map(i => (x.ids(i), bxId(i), bxSim(i)))
      val ys = (0 until ny).iterator.filter(j => seen(bySim(j)))
        .map(j => (y.ids(j), byId(j), bySim(j)))
      xs ++ ys
        }
    }.toDF("vec_id", "cand", "sim")
    partials
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (-col("cand")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cand"), col("m.sim").as("sim"))
  }

  /** Per-vector exact k-nearest-neighbor graph over the corpus — the
    * top-k generalization of [[bestNeighbor]] on the same tiled plan.
    *
    * Top-k is mergeable: each block-pair task keeps a k-slot running
    * best list per vector of both tiles (insertion into a sorted
    * primitive buffer — k is small), so the shuffle into the final
    * merge carries ≤ N·B·k partial rows instead of the N²/2 pair rows
    * of the expression-join form. The merge is one ROW_NUMBER window
    * per vec_id over those partials — the same (sim DESC, cand ASC)
    * total order the per-tile comparator uses, NaN ranking greatest on
    * both sides (and in the DuckDB oracle), so ordering is engine-exact.
    *
    * Output: (vec_id, rn, cand, sim) with rn ∈ [1, k] — one row per
    * (vector, neighbor rank) that exists; vectors in corpora smaller
    * than k+1 emit fewer rows, never padding.
    *
    * `crossLabelOnly=true` restricts candidates to vectors with a
    * DIFFERENT label (same null semantics as [[bestNeighbor]]: null-
    * label vectors join no cross pair) — the cross-corpus kNN a bitext
    * miner needs when `label` encodes the side. */
  def topKNeighbors(emb: DataFrame, k: Int, numBlocks: Int = 0,
                    crossLabelOnly: Boolean = false): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val src =
      if (crossLabelOnly) emb.filter(col("label").isNotNull)
      else emb
    // label rides the tile only in cross mode; the default path takes a
    // constant column instead of joining the input against its own
    // projection
    val q0 = DedupOps.quantized(src.select(col("vec_id"), col("embedding")))
    val q =
      if (crossLabelOnly)
        q0.join(src.select(col("vec_id"), col("label").cast("int").as("label")), "vec_id")
      else q0.withColumn("label", lit(0))
    val blocks =
      if (numBlocks > 0) numBlocks
      else math.max(DefaultBlocks, (src.select(col("vec_id")).count() / TargetPerTile).toInt + 1)
    val tiles: Dataset[Tile] = q
      .select(pmod(hash(col("vec_id")), lit(blocks)).cast("int").as("b"),
        col("vec_id"), col("label"), col("q"), col("n"))
      .as[(Int, Long, Int, Seq[Long], Long)]
      .groupByKey(_._1)
      .mapGroups { (b, it) =>
        val rows = it.toArray.sortBy(_._2)
        Tile(b, rows.map(_._2), rows.map(_._3), rows.map(_._4.toArray), rows.map(_._5))
      }
    val nb = blocks
    val kk = k
    val xOnly = crossLabelOnly
    val partials = tiles
      .flatMap(t => Iterator.range(0, nb).map { o =>
        val lo = math.min(t.b, o); val hi = math.max(t.b, o)
        (lo * nb + hi, t)
      })
      .groupByKey(_._1)
      .flatMapGroups { (pid, it) =>
        val ts = it.map(_._2).toArray
        val x = ts(0)
        val y = if (ts.length > 1) ts(1) else ts(0)
        if (ts.length == 1 && pid != x.b * nb + x.b)
          Iterator.empty[(Long, Long, Double)]
        else {
          // same total order as bestNeighbor: sim desc (NaN greatest),
          // then candidate id asc
          @inline def beats(s: Double, c: Long, bs: Double, bc: Long): Boolean = {
            val cmp = java.lang.Double.compare(s, bs)
            cmp > 0 || (cmp == 0 && c < bc)
          }
          val sameTile = x.b == y.b
          val nx = x.ids.length; val ny = y.ids.length
          // k-slot sorted buffers (slot 0 = best); insertion shifts the
          // tail down — k is a small constant, so this is O(k) per pair
          val bxSim = Array.fill(nx, kk)(Double.NegativeInfinity)
          val bxId = Array.fill(nx, kk)(Long.MaxValue)
          val bySim = Array.fill(ny, kk)(Double.NegativeInfinity)
          val byId = Array.fill(ny, kk)(Long.MaxValue)
          @inline def insert(ss: Array[Double], cs: Array[Long], s: Double, c: Long): Unit = {
            if (beats(s, c, ss(kk - 1), cs(kk - 1))) {
              var p = kk - 1
              while (p > 0 && beats(s, c, ss(p - 1), cs(p - 1))) {
                ss(p) = ss(p - 1); cs(p) = cs(p - 1); p -= 1
              }
              ss(p) = s; cs(p) = c
            }
          }
          var i = 0
          while (i < nx) {
            val qi = x.qs(i); val ni = x.ns(i); val li = x.labels(i)
            var j = if (sameTile) i + 1 else 0
            while (j < ny) {
              if (!xOnly || li != y.labels(j)) {
                val qj = y.qs(j)
                var d = 0L; var kd = 0
                val len = math.min(qi.length, qj.length)
                while (kd < len) { d += qi(kd) * qj(kd); kd += 1 }
                val sim = d / math.sqrt(ni.toDouble * y.ns(j).toDouble)
                insert(bxSim(i), bxId(i), sim, y.ids(j))
                insert(bySim(j), byId(j), sim, x.ids(i))
              }
              j += 1
            }
            i += 1
          }
          @inline def seen(s: Double) =
            java.lang.Double.compare(s, Double.NegativeInfinity) != 0
          val xs = for {
            i <- (0 until nx).iterator; p <- (0 until kk).iterator
            if seen(bxSim(i)(p))
          } yield (x.ids(i), bxId(i)(p), bxSim(i)(p))
          val ys = for {
            j <- (0 until ny).iterator; p <- (0 until kk).iterator
            if seen(bySim(j)(p))
          } yield (y.ids(j), byId(j)(p), bySim(j)(p))
          xs ++ ys
        }
      }.toDF("vec_id", "cand", "sim")
    import org.apache.spark.sql.expressions.Window
    partials
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cand"))))
      .filter(col("rn") <= kk)
      .select(col("vec_id"), col("rn"), col("cand"), col("sim"))
  }
}
