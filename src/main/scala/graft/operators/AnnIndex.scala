package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** ANN indexes AT REST.
  *
  * The r7 probe queries recomputed their index structures per query
  * and then SCANNED them: `ann_lsh` evaluated `bit_count(sig ^ qb)`
  * against every signature (a full pass over the corpus per probe) and
  * `ann_ivf_probe` ran its fine stage as a broadcast-join filter that
  * still read every embedding row. Both are fine at sf0.1 and wrong at
  * 100 TB, where an index exists precisely so a probe touches a
  * corpus-size-independent slice.
  *
  * This object materializes the two index layouts the way a cluster
  * deployment would — parquet partitioned by the probe key, built once
  * per corpus (the reference's always-maintained-view discipline: its
  * dashboards never scan the fact table either):
  *
  *  - SRP index: `(vec_id, embedding)` partitioned by the 16-bit
  *    sign-random-projection bucket. A ±hamming-2 probe enumerates its
  *    137 candidate buckets driver-side and reads ONLY those partition
  *    directories (137/65 536 of the corpus at scale) via partition
  *    pruning — the scan never sees the other buckets' files.
  *  - IVF index: embeddings partitioned by coarse cell (the label
  *    column, matching the r7 coarse quantizer) — the classic inverted
  *    lists — plus a tiny centroids table. A probe ranks centroids,
  *    picks nprobe=2 cells, and partition-prunes to those lists.
  *
  * Freshness: the index directory is keyed by a fingerprint of the
  * source `embeddings.parquet` (path + per-file length/mtime), so a
  * regenerated corpus can never be served from a stale index; rebuilds
  * land under a staging dir and publish with an atomic rename.
  */
object AnnIndex {
  val SrpBits = 16

  /** Corpus-content fingerprint (per-file name/length/mtime). Walks
    * through the Hadoop `FileSystem` of the path's scheme ([[Dfs]]),
    * NOT `java.io.File`: a schemed dir (`file://…`, `hdfs://…`) walked
    * with `File` silently sees nothing, yielding a degenerate constant
    * fingerprint that would serve a STALE cached index for a changed
    * corpus. An empty walk is refused loudly for the same reason — a
    * corpus with no files is a caller error, never a cache key. */
  private[operators] def fingerprint(src: String): String = {
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      graft.sources.Dfs.list(p).flatMap { s =>
        if (s.isDirectory) walk(s.getPath)
        else Seq(s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      }
    val files = walk(graft.sources.Dfs.path(src))
    require(files.nonEmpty, s"fingerprint($src): no files — refusing a " +
      "degenerate cache key that could serve a stale index")
    val sig = (src +: files).mkString("|")
    java.lang.Long.toHexString(
      sig.foldLeft(1125899906842597L)((h, c) => h * 31 + c))
  }

  private def root(dir: String): Path = {
    val key = new File(dir).getName + "-" + fingerprint(Tables.path(dir, "embeddings"))
    Paths.get(sys.props("java.io.tmpdir"), "graft_ann_index", key)
  }

  /** Build-once-or-reuse: `build` writes everything under a staging
    * dir, which is atomically renamed into place; a ready-marker makes
    * partially-built leftovers invisible. Per-JVM lock (the driver's
    * mains are single-process; cross-process races just rebuild). */
  private def ensure(dir: String, name: String)(build: String => Unit): String =
    synchronized {
      val base = root(dir)
      val done = base.resolve(name)
      val marker = done.resolve("_GRAFT_READY")
      if (!Files.exists(marker)) {
        val staging = base.resolve(s"_staging_$name")
        delete(staging.toFile); delete(done.toFile)
        Files.createDirectories(staging)
        build(staging.toString)
        Files.move(staging, done, StandardCopyOption.ATOMIC_MOVE)
        Files.createFile(marker)
      }
      done.toString
    }

  private def delete(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    if (f.exists()) f.delete()
  }

  /** Partition-listing cache, the sandbox stand-in for a metastore:
    * a real deployment resolves "which partition directories exist"
    * from catalog metadata (Hive metastore / table-format log), not by
    * re-walking the filesystem per query. Spark's InMemoryFileIndex is
    * built when the relation is first resolved, so caching the
    * resolved DataFrame (keyed by session + path; metadata only, no
    * row data is pinned) gives probes a catalog-warm plan. `ensureAll`
    * forces the listing during warm-up. Re-listing ~5k bucket
    * directories per probe was 4-6 s of pure metadata walking at
    * sf0.1 — the exact failure a metastore exists to prevent. */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, DataFrame)]()

  /** Per-invalidation-path write generations, bumped by every writer
    * BEFORE it evicts cache entries. A probe thread mid-file-listing
    * when a writer appends and invalidates could otherwise insert its
    * stale pre-append listing AFTER the invalidation pass (the
    * eviction iterator is weakly consistent and never sees the
    * in-flight key), permanently serving the pre-write file set — so
    * readers snapshot the generations COVERING THEIR PATH before
    * resolving and retry if a covering write landed while they listed.
    * Per-path (not one global counter) so a 1 Hz freshness loop on one
    * index never forces readers of UNRELATED indexes into
    * drop-and-relist retries. Keys are the handful of index roots ever
    * written in a process — the map stays tiny. */
  private val writeGens =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val key = s"${System.identityHashCode(spark)}:$path"
    val norm = path.replaceAll("/+$", "")
    // sum of the generations of every invalidation root covering this
    // path (invalidation roots are equal-or-shallower than cached paths)
    def genFor(): Long = {
      var sum = 0L
      val it = writeGens.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (norm == e.getKey || norm.startsWith(e.getKey + "/"))
          sum += e.getValue.get()
      }
      sum
    }
    var attempts = 0
    while (true) {
      // entries carry the generation snapshotted BEFORE their listing
      // started, so a stale insert (a reader that listed concurrently
      // with a write) is detectable by EVERY subsequent reader — not
      // only by the thread that inserted it. A write storm can still
      // hand ONE bounded-retry bail-out a stale frame, but it can no
      // longer leave a stale entry that later readers trust.
      //
      // The listing runs OUTSIDE the map's compute: readConsistent can
      // legitimately spin (bounded) waiting out a compaction swap, and
      // holding a ConcurrentHashMap bin lock for that long would block
      // every writer's invalidation pass — a 1 Hz freshness tick
      // stalling behind a probe's cache miss. Two concurrent misses
      // may both list; putIfAbsent keeps one (metadata-only waste).
      val entry = {
        val cur = relCache.get(key)
        if (cur != null) cur
        else {
          val gStart = genFor()
          // swap-consistent listing: a compaction mid-swap on one
          // partition must not freeze a listing that misses it
          val d = graft.sources.SourcesOps.readConsistent(spark, path)
          val fresh = (gStart, d)
          val prev = relCache.putIfAbsent(key, fresh)
          if (prev != null) prev else fresh
        }
      }
      attempts += 1
      if (genFor() == entry._1) return entry._2 // listing still current
      // a writer raced the entry's listing: drop it ALWAYS — even on
      // the bounded-retry bail-out below — so the next call re-lists
      // fresh instead of trusting a possibly-pre-write file set.
      relCache.remove(key, entry)
      if (attempts >= 3) return entry._2
    }
    throw new IllegalStateException("unreachable")
  }

  /** Drop cached relations under `path` (every session). A cached
    * DataFrame's InMemoryFileIndex froze the file listing at first
    * read; any writer that adds or rewrites files under a path a probe
    * may have already resolved must call this, or that probe's session
    * keeps serving the pre-write file set. Keys are
    * `<sessionHash>:<path…>`, so we match on the path suffix. */
  private def invalidateCached(path: String): Unit = {
    // normalize trailing slashes on BOTH sides: a caller-supplied
    // "/data/idx/" must still invalidate the cached "/data/idx/codes"
    val p = path.replaceAll("/+$", "")
    // bump this path's generation BEFORE evicting: a reader that
    // resolved its listing concurrently with this write sees the
    // mismatch and retries instead of caching the pre-write file set
    writeGens.computeIfAbsent(p,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    val it = relCache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      val cached = k.substring(k.indexOf(':') + 1).replaceAll("/+$", "")
      // path-separator boundary: invalidating /data/idx must not evict
      // a sibling /data/idx2's listings (over-invalidation re-walks
      // thousands of bucket dirs on the untouched index's next probe)
      if (cached == p || cached.startsWith(p + "/")) it.remove()
    }
  }

  /** The SRP signature table, partitioned by bucket. `repartition` on
    * the partition column first: each bucket's rows land in exactly one
    * task, so the dynamic-partition write emits one file per bucket
    * directory instead of #tasks × #buckets fragments. */
  def srp(spark: SparkSession, dir: String): DataFrame = {
    val path = ensure(dir, "srp") { stg =>
      SimilarityOps.srpSignature(Tables.embeddings(spark, dir), SrpBits)
        .withColumn("srp_bucket", col("srp_bucket").cast("int"))
        .repartition(col("srp_bucket"))
        .write.mode("overwrite").partitionBy("srp_bucket")
        .parquet(s"$stg/sigs")
    }
    readCached(spark, s"$path/sigs")
  }

  /** IVF inverted lists (partitioned by cell) + centroids table. */
  def ivf(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val path = ensure(dir, "ivf") { stg =>
      graft.functions.VecFunctions.registerAll(spark)
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      emb.repartition(col("label"))
        .write.mode("overwrite").partitionBy("label").parquet(s"$stg/lists")
      // same one-pass element-wise vec_sum centroid the r7 inline form
      // used — the probe's ranking math is unchanged
      emb.groupBy("label")
        .agg(graft.functions.VecFunctions.vec_sum(col("v")).as("vsum"),
          count(lit(1)).as("cnt"))
        .select(col("label"),
          expr("transform(vsum, x -> x / CAST(cnt AS DOUBLE))").as("centroid"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$stg/centroids")
    }
    (readCached(spark, s"$path/lists"), readCached(spark, s"$path/centroids"))
  }

  /** PQ8 index at rest: the m=8 × 256-anchor product-quantization
    * codes (8 B/vec, 32× compression of the raw floats) plus the tiny
    * anchor table, both materialized once per corpus — the ADC probe
    * then scans CODES only, never the embedding column. Codes persist
    * in the (vec_id, m, code) long layout the ADC join rides
    * (parquet dictionary/RLE keeps the at-rest bytes near the packed
    * size); anchors are m·256 = 2048 rows, one file. This is the
    * compressed-domain full-scan point of the recall/footprint
    * frontier: on this corpus's near-random geometry (exact top-10
    * cosines 0.28-0.40 vs a ~0 median), cell-pruning indexes (SRP/IVF)
    * need ~50 % of the corpus per probe to reach recall 0.8, while the
    * PQ8 scan reads 1/32 of the corpus bytes and reranks a fixed
    * top-100 funnel exactly — measured mean recall@10 0.96/0.89 at
    * sf0.01/sf0.1 (ann_eval_pq_m8, floor spec-pinned at 0.8). */
  def pq8(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val path = ensure(dir, "pq8") { stg =>
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      buildPq8At(stg, emb)
    }
    (readCached(spark, s"$path/anchors"), readCached(spark, s"$path/codes"))
  }

  /** Coarse-cell count of the composed IVF+PQ index. 32 cells at the
    * test SFs keeps ≥~15 vectors per cell; at real scale this is the
    * √N-ish knob every IVFADC deployment sizes to its corpus. */
  val IvfPqCells = 32

  /** The COMPOSED index — IVFADC proper (Jégou et al. 2011): coarse
    * k-means cells prune at the PARTITION level and 8 B/vec PQ codes
    * compress what a probe scans within the probed cells. This is the
    * layout that actually survives 100 TB: flat PQ8 still scans
    * 8 B × N per query (800 GB at 10¹¹ vectors), while this probe
    * reads nprobe/|cells| of the code bytes through partition pruning
    * — both pruned AND compressed, the only index here with that
    * property. Cells come from SEEDED spark.ml k-means over the
    * L2-normalized vectors (spherical cells match the cosine probe;
    * same seeded-trainer discipline as `ml/MLOps`); the PQ codebook is
    * the SAME content-hash-sampled m=8 × 256 family as [[pq8]], so
    * the composed index's quality delta vs flat PQ8 isolates exactly
    * the cell-pruning loss. Measured (ann_eval_ivfpq rows, sf0.01/0.1):
    * nprobe=8 → recall@10 ~0.67 at ~25 % of code bytes; nprobe=16 →
    * ~0.81–0.88 at ~50 % — the second ≥0.8 operating point on the
    * frontier, at half the bytes of the flat scan. */
  def ivfpq8(spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val path = ensure(dir, "ivfpq8") { stg =>
      buildIvfPq8At(stg, Tables.embeddings(spark, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")))
    }
    (readCached(spark, s"$path/anchors"),
      readCached(spark, s"$path/codes"),
      readCached(spark, s"$path/cents"))
  }

  /** Deployment-shape IVFADC builder against an EXPLICIT path.
    * `vectors` carries (vec_id, v: array<double>). Writes the three
    * relations the probe rides: `cents` (the seeded-k-means coarse
    * centroids over L2-normalized vectors), `anchors` (the
    * content-hash-sampled PQ codebook), `codes` (PQ codes partitioned
    * by coarse cell). */
  def buildIvfPq8At(path: String, vectors: DataFrame): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = vectors.sparkSession
    val emb = vectors
    val normed = emb
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
      .filter(col("nrm") > 0)
      .withColumn("feat", array_to_vector(expr("transform(v, x -> x / nrm)")))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(IvfPqCells).setSeed(20260815L).setMaxIter(20)
      .setFeaturesCol("feat").setPredictionCol("cell")
    val model = km.fit(normed)
    // zero-norm vectors cannot be cell-assigned by cosine (their
    // normalization is undefined and they are excluded from the fit)
    // but the index must still COVER them — same contract as flat
    // pq8, whose codes relation holds every input row. Park them in
    // cell 0: a probe that ranks cell 0 scans them like any other
    // member; their exact-rerank cosine is NaN-guarded upstream by
    // the quantized kernel's n > 0 data (none exist in the driver
    // corpora — this is a coverage invariant, not a tuning choice).
    val assigned = emb.select(col("vec_id"))
      .join(model.transform(normed).select(col("vec_id"), col("cell")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("cell"), lit(0)).as("cell"))
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/cents")
    val (anchors, codes) = SimilarityOps2.pqAnchorsCodesOf(
      emb, SimilarityOps2.PqM8, SimilarityOps2.PqSub8, SimilarityOps2.PqK8)
    anchors.coalesce(1).write.mode("overwrite").parquet(s"$path/anchors")
    codes.join(assigned, "vec_id")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    invalidateCached(path)
  }

  /** Append new vectors into an at-rest IVFADC index under BOTH frozen
    * artifacts: cell assignment uses the STORED coarse centroids
    * (never re-trains — moving a centroid would silently re-route
    * probes away from every code already at rest in that cell), and
    * encoding uses the STORED anchor codebook (same discipline and
    * rationale as [[appendPq8At]]). Assignment reproduces the
    * build-time rule exactly: argmin squared-Euclidean between the
    * L2-NORMALIZED vector and the raw-space centroid (what seeded
    * spark.ml k-means assigned), ties to the lowest cell id, zero-norm
    * rows parked in cell 0. Appended code files accrete inside the
    * existing `cell=` partition directories, so probe-side partition
    * pruning is untouched. */
  def appendIvfPq8At(spark: SparkSession, path: String, vectors: DataFrame): Unit = {
    requirePqLayout(path, partitioned = true)
    ivfPq8EncodeAssign(spark, path, vectors).foreach { df =>
      df.write.mode("append").partitionBy("cell").parquet(s"$path/codes")
      // inside the foreach: an empty batch wrote nothing, so it must
      // not evict cached listings and force probe re-walks
      invalidateCached(path)
    }
  }

  /** Shared body of both IVFADC appends: frozen-centroid assignment +
    * frozen-codebook encoding, repartitioned on `cell` (one output
    * file per touched cell). None = empty batch (clean no-op). */
  private def ivfPq8EncodeAssign(spark: SparkSession, path: String,
                                 vectors: DataFrame): Option[DataFrame] = {
    val anchors = spark.read.parquet(s"$path/anchors")
    val meta = anchors.agg(max(col("m")), first(size(col("av")))).head()
    val (m, sub) = (meta.getInt(0) + 1, meta.getInt(1))
    // same batch-wide geometry guard as appendPq8At: empty input is a
    // clean no-op; any batch containing a width != m·sub is rejected
    // before anything lands
    val widths = vectors.select(size(col("v")).as("w")).distinct()
      .limit(3).collect().map(_.getInt(0)).sorted
    if (widths.isEmpty) return None
    require(widths.sameElements(Array(m * sub)),
      s"appendIvfPq8At: vector widths ${widths.mkString(",")} but the index codebook is m=$m x sub=$sub = ${m * sub}-dim")
    val cents = broadcast(spark.read.parquet(s"$path/cents"))
    val assigned = vectors
      .withColumn("nrm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
      .crossJoin(cents)
      .withColumn("d2", expr(
        "aggregate(zip_with(centroid, transform(v, x -> x / nrm), (c, u) -> (c - u) * (c - u)), 0D, (acc, e) -> acc + e)"))
      .groupBy("vec_id")
      .agg(min(when(col("nrm") > 0, struct(col("d2"), col("cell")))
        .otherwise(struct(lit(0D).as("d2"), lit(0).as("cell"))))
        .getField("cell").as("cell"))
    Some(SimilarityOps2.pqEncode(vectors, anchors, m, sub)
      .join(assigned, "vec_id")
      .repartition(col("cell")))
  }

  /** Replay-idempotent streaming append into an IVFADC index — the
    * quantized-index analogue of [[appendSrpBatchAt]]: codes are
    * staged per batch, then moved into the live `cell=` dirs under
    * deterministic `b<batchId>.parquet` names, so a crash-recovery
    * re-execution replaces its own files. Assignment/encoding are the
    * frozen-artifact rules of [[appendIvfPq8At]]. */
  def appendIvfPq8BatchAt(spark: SparkSession, path: String, batchId: Long,
                          vectors: DataFrame): Unit = {
    requirePqLayout(path, partitioned = true)
    val stg = s"$path/.staging_b$batchId"
    ivfPq8EncodeAssign(spark, path, vectors) match {
      case None => return
      case Some(df) =>
        df.write.mode("overwrite").partitionBy("cell").parquet(stg)
    }
    if (moveStagedBatch(stg, s"$path/codes", "cell=", batchId) > 0)
      invalidateCached(path)
  }

  /** Sweep `b<batchId>.parquet` leftovers of a crashed attempt of this
    * batch from the codes cells (same rationale and no-op cache
    * discipline as [[dropSrpBatchFiles]]). */
  def dropIvfPq8BatchFiles(path: String, batchId: Long): Unit =
    if (sweepBatchFiles(s"$path/codes", "cell=", batchId))
      invalidateCached(path)

  /** Maintenance pass for the IVFADC codes relation: cells at the
    * file-count trigger collapse to one file (crash-safe two-rename
    * swap via [[graft.sources.SourcesOps.compactPartitions]]); probe
    * plans unchanged — ADC pruning selects `cell=` directories, which
    * compaction never renames. */
  def compactIvfPq8At(spark: SparkSession, path: String,
                      trigger: Int = CompactTriggerFiles): Seq[(String, Int, Int)] = {
    requirePqLayout(path, partitioned = true)
    val report = graft.sources.SourcesOps.compactPartitionsReport(
      spark, s"$path/codes", numFiles = 1, minFilesToCompact = trigger)
    // a heal-only pass (restored/merged/dropped trash dirs) also changes
    // the live file set — invalidate then too, or a listing cached while
    // the live dir was absent keeps serving the pre-heal file set; a
    // true no-op pass evicts nothing
    if (report.changedLiveFiles) invalidateCached(path)
    report.rewritten
  }

  /** Deployment-shape PQ8 builders against an EXPLICIT index path
    * (the SRP analogues: [[buildSrpAt]]/[[appendSrpAt]]). The PQ
    * freshness contract differs from SRP's in one load-bearing way:
    * SRP's hyperplanes are data-independent, but the PQ codebook is
    * trained from the build-time corpus and then FROZEN — an append
    * encodes new vectors against the STORED anchors
    * ([[SimilarityOps2.pqEncode]]), never retrains, because every ADC
    * distance table is built from the anchors and retraining would
    * silently mis-score all codes already at rest. (The standard PQ
    * deployment discipline: train on a sample once, `add()` forever;
    * re-training is a full index REBUILD, i.e. `buildPq8At` again.)
    * `vectors` must carry (vec_id, v: array<double>). */
  def buildPq8At(path: String, vectors: DataFrame): Unit = {
    val (anchors, codes) = SimilarityOps2.pqAnchorsCodesOf(
      vectors, SimilarityOps2.PqM8, SimilarityOps2.PqSub8, SimilarityOps2.PqK8)
    anchors.coalesce(1).write.mode("overwrite").parquet(s"$path/anchors")
    codes.write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Append codes for new vectors under the index's frozen codebook.
    * Self-describing: m and the subspace width are read back from the
    * stored anchor table (2048 rows — a driver-side metadata probe),
    * so a caller cannot encode with mismatched geometry. Appended
    * code files accrete next to the originals; the ADC probe plan is
    * unchanged (it scans the codes relation and joins the broadcast
    * distance table — no partition structure to preserve). */
  def appendPq8At(spark: SparkSession, path: String, vectors: DataFrame): Unit = {
    requirePqLayout(path, partitioned = false)
    val anchors = spark.read.parquet(s"$path/anchors")
    val meta = anchors.agg(max(col("m")), first(size(col("av")))).head()
    val (m, sub) = (meta.getInt(0) + 1, meta.getInt(1))
    // geometry guard: slicing a shorter vector would zip_with against
    // nulls and append garbage codes to the LIVE index with no error —
    // check EVERY distinct incoming dimension against the codebook's
    // m·sub before anything is written. An empty batch is a clean
    // no-op (ingest ticks with nothing new are normal), and a batch
    // mixing widths is rejected whole: the distinct-width probe sees
    // all of them, not just one sampled row.
    val widths = vectors.select(size(col("v")).as("w")).distinct()
      .limit(3).collect().map(_.getInt(0)).sorted
    if (widths.isEmpty) return
    require(widths.sameElements(Array(m * sub)),
      s"appendPq8At: vector widths ${widths.mkString(",")} but the index codebook is m=$m x sub=$sub = ${m * sub}-dim")
    SimilarityOps2.pqEncode(vectors, anchors, m, sub)
      .write.mode("append").parquet(s"$path/codes")
    // a session that probed this path before the append holds a frozen
    // file listing — drop it so the next read sees the new code files
    invalidateCached(s"$path/codes")
  }

  /** All 137 16-bit buckets within hamming distance ≤ 2 of `qb` —
    * the multi-probe set, enumerated driver-side so the index scan is
    * a partition-pruning IN list, not a per-row bit_count filter. */
  def hamming2Buckets(qb: Int): Seq[Int] = hammingBuckets(qb, 2)

  /** The hamming-≤`radius` probe set of `qb` — the RECALL dial of the
    * SRP index: r=2 → 137 of 65 536 buckets (0.21 % of partitions),
    * r=3 → 697 (1.06 %). Enumerated driver-side (≤697 ints), so wider
    * probes only widen the partition-pruning IN list — the plan shape
    * is radius-independent. */
  def hammingBuckets(qb: Int, radius: Int): Seq[Int] = {
    require(radius >= 0 && radius <= 3, s"probe radius 0-3 supported: $radius")
    val bits = 0 until SrpBits
    val r1 = if (radius >= 1) bits.map(i => qb ^ (1 << i)) else Nil
    val r2 = if (radius >= 2)
      for { i <- bits; j <- bits if j > i } yield qb ^ (1 << i) ^ (1 << j)
    else Nil
    val r3 = if (radius >= 3)
      for { i <- bits; j <- bits if j > i; k <- bits if k > j }
        yield qb ^ (1 << i) ^ (1 << j) ^ (1 << k)
    else Nil
    qb +: (r1 ++ r2 ++ r3)
  }

  /** Table `t` of a multi-table SRP index — the OTHER recall dial:
    * each table hashes with a disjoint hyperplane family
    * (planes t·16 … t·16+15), so a near neighbor that a single
    * table's quantization separates gets an independent chance per
    * table; probes union the per-table candidate sets. Table 0 IS the
    * single-table index (same directory, bytes unchanged). */
  def srpTable(spark: SparkSession, dir: String, table: Int): DataFrame =
    if (table == 0) srp(spark, dir)
    else {
      require(table > 0 && table < 4, s"tables 0-3 supported: $table")
      val path = ensure(dir, s"srp_t$table") { stg =>
        SimilarityOps.srpSignature(Tables.embeddings(spark, dir), SrpBits,
            planeOffset = table * SrpBits)
          .withColumn("srp_bucket", col("srp_bucket").cast("int"))
          .repartition(col("srp_bucket"))
          .write.mode("overwrite").partitionBy("srp_bucket")
          .parquet(s"$stg/sigs")
      }
      readCached(spark, s"$path/sigs")
    }

  /** Builds every index a REGISTERED query probes (bench warm-up hook:
    * production builds indexes at ingest, so probes measure the
    * probe). SRP tables 2-3 stay lazy — no registered query reads
    * them; an ad-hoc `lshTopK(tables = 3)` measurement must warm
    * `srpTable(_, _, 2/3)` itself or its first run times the build. */
  def ensureAll(spark: SparkSession, dir: String): Unit = {
    srp(spark, dir); srpTable(spark, dir, 1); ivf(spark, dir); pq8(spark, dir)
    ivfpq8(spark, dir)
  }

  /** Deployment-shape SRP builders against an EXPLICIT index path (a
    * metastore owns freshness there, not the sandbox fingerprint):
    * `buildSrpAt` lays the index down, `appendSrpAt` is the freshness
    * path — new vectors' signatures land as extra files inside the
    * same `srp_bucket=` partition directories, so ingest appends
    * instead of rebuilding and probe-side partition pruning is
    * untouched (pruning selects directories; directories accrete
    * files). [[compactSrpAt]] is the matching maintenance loop: run it
    * periodically (or after every append) and buckets that hit
    * [[CompactTriggerFiles]] files collapse back to one — the same
    * read-side maintenance trade every streaming sink has. */
  def buildSrpAt(path: String, vectors: DataFrame): Unit =
    writeSrpAt(path, vectors, "overwrite")

  def appendSrpAt(path: String, vectors: DataFrame): Unit = {
    requireLayout(path, flat = true)
    writeSrpAt(path, vectors, "append")
  }

  /** Replay-idempotent append into a FLAT SRP index — the streaming
    * freshness path ([[graft.streaming.IndexFreshness]]): signatures
    * are staged under a hidden `.staging_b<id>` dir, then moved into
    * the live `srp_bucket=` dirs under DETERMINISTIC names
    * (`b<batchId>.parquet`; [[writeSrpAt]]'s repartition on the bucket
    * column yields exactly one file per touched bucket), so a
    * crash-recovery re-execution of the same micro-batch REPLACES its
    * own files instead of doubling them. Unlike [[writeSrpBatchAt]]'s
    * `batch=` dirs this keeps the flat layout, so [[compactSrpAt]]
    * still maintains it and probe plans are byte-identical to the
    * batch-built index's. */
  def appendSrpBatchAt(path: String, batchId: Long, vectors: DataFrame): Unit = {
    requireLayout(path, flat = true)
    val stg = s"$path/.staging_b$batchId"
    writeSrpAt(stg, vectors, "overwrite")
    if (moveStagedBatch(stg, path, "srp_bucket=", batchId) > 0)
      invalidateCached(path)
  }

  /** ONE copy of the crash-critical stage-and-move protocol, shared by
    * the SRP and IVFADC freshness appends: move a staged batch's
    * one-file-per-partition outputs into the live partition dirs under
    * deterministic `b<batchId>.parquet` names (REPLACE on replay),
    * then drop the staging dir. Returns how many partition files
    * landed (0 = empty batch — callers skip cache invalidation). */
  private def moveStagedBatch(stg: String, dstRoot: String, prefix: String,
                              batchId: Long): Int = {
    import graft.sources.Dfs
    var moved = 0
    Dfs.list(Dfs.path(stg))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .foreach { pd =>
        val files = Dfs.list(pd.getPath)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        require(files.length == 1,
          s"${pd.getPath.getName}: ${files.length} staged files; repartition on the partition column guarantees 1")
        val dstDir = new org.apache.hadoop.fs.Path(dstRoot, pd.getPath.getName)
        Dfs.mkdirs(dstDir)
        Dfs.renameOverwrite(files.head.getPath,
          new org.apache.hadoop.fs.Path(dstDir, s"b$batchId.parquet"))
        moved += 1
      }
    Dfs.delete(Dfs.path(stg))
    moved
  }

  /** Shared sweep of `b<batchId>.parquet` leftovers under a root's
    * partition dirs; true when anything was actually deleted. */
  private def sweepBatchFiles(dstRoot: String, prefix: String,
                              batchId: Long): Boolean = {
    import graft.sources.Dfs
    var any = false
    Dfs.list(Dfs.path(dstRoot))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .foreach { pd =>
        if (Dfs.delete(new org.apache.hadoop.fs.Path(pd.getPath, s"b$batchId.parquet")))
          any = true
      }
    any
  }

  /** Remove any `b<batchId>.parquet` leftovers of a CRASHED attempt of
    * this batch (committed batches have strictly smaller ids, so they
    * are never touched). Run before compaction in a replayed
    * foreachBatch: without it, compaction could fold a half-moved
    * uncommitted file into a bucket's single compacted file, after
    * which the re-append would double those rows. Invalidates the
    * relation cache only when something was actually deleted — the
    * every-tick no-op sweep must not force probe re-listings. */
  def dropSrpBatchFiles(path: String, batchId: Long): Unit =
    if (sweepBatchFiles(path, "srp_bucket=", batchId))
      invalidateCached(path)

  /** Replay-idempotent streaming append: each micro-batch OVERWRITES
    * its own `batch=<id>` subdirectory (a foreachBatch re-execution
    * after crash recovery rewrites the same files instead of
    * doubling them); `batch` becomes an extra partition column above
    * `srp_bucket`, and bucket pruning selects directories at its own
    * nesting level regardless.
    *
    * The flat (`srp_bucket=` at top level) and batch-keyed layouts are
    * MUTUALLY EXCLUSIVE under one root — mixing them leaves parquet
    * leaves at two partition depths and the next read fails with
    * conflicting directory structures. Both writers enforce it. */
  def writeSrpBatchAt(root: String, batchId: Long, vectors: DataFrame): Unit = {
    requireLayout(root, flat = false)
    writeSrpAt(s"$root/batch=$batchId", vectors, "overwrite")
    invalidateCached(root)
  }

  /** Files-per-bucket compaction trigger: `appendSrpAt` adds one file
    * per append per touched bucket, so a bucket's file count is its
    * append count since the last compaction. 8 ≈ one compaction per
    * 8 ingest cycles — scan-back then opens 8× fewer files, while the
    * rewrite runs at most once per 8 appends (amortized rewrite I/O
    * ≤ 1/8 of a full-bucket rewrite per append). */
  val CompactTriggerFiles = 8

  /** Maintenance pass for a FLAT SRP index: compact every bucket whose
    * data-file count reached the trigger down to one file, leave the
    * rest untouched. Safe against concurrent probes: each bucket swaps
    * via temp-dir + atomic rename (`SourcesOps.compactPartitions`), so
    * a reader lists either the old fragment set or the new single file
    * — and probe PLANS are unchanged because pruning selects partition
    * DIRECTORIES, which compaction never renames (spec-asserted on a
    * half-compacted index). Returns (bucket, before, after) for the
    * buckets actually rewritten. */
  def compactSrpAt(spark: SparkSession, path: String,
                   trigger: Int = CompactTriggerFiles): Seq[(String, Int, Int)] = {
    requireLayout(path, flat = true)
    val report = graft.sources.SourcesOps.compactPartitionsReport(
      spark, path, numFiles = 1, minFilesToCompact = trigger)
    // invalidate on a heal too (it changes the live file set even when
    // nothing was rewritten); a true no-op pass evicts nothing
    if (report.changedLiveFiles) invalidateCached(path)
    report.rewritten
  }

  /** The PQ analogue of [[requireLayout]]: a flat PQ8 index and an
    * IVFADC one have IDENTICAL anchor geometry (m×sub), so calling the
    * wrong append passes the width guard — and then writes
    * unpartitioned code files into a `cell=`-partitioned codes dir (or
    * vice versa), leaving parquet leaves at two partition depths. The
    * next read fails on conflicting directory structures: the live
    * index is corrupted with no error at write time. Probe the codes
    * dir for `cell=` subdirectories BEFORE anything lands. A missing
    * or empty codes dir passes either way (nothing at rest to corrupt;
    * the anchors read already guards a truly absent index). */
  private def requirePqLayout(path: String, partitioned: Boolean): Unit = {
    val kids = graft.sources.Dfs.list(graft.sources.Dfs.path(s"$path/codes"))
    val hasCells = kids.exists(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    val hasFlatFiles = kids.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(!(partitioned && hasFlatFiles),
      s"$path/codes holds a FLAT pq8 code set; use appendPq8At, not appendIvfPq8At")
    require(!(!partitioned && hasCells),
      s"$path/codes is cell=-partitioned (IVFADC); use appendIvfPq8At, not appendPq8At")
  }

  private def requireLayout(root: String, flat: Boolean): Unit = {
    val kids = graft.sources.Dfs.list(graft.sources.Dfs.path(root))
      .filter(_.isDirectory).map(_.getPath.getName)
    val hasFlat = kids.exists(_.startsWith("srp_bucket="))
    val hasBatch = kids.exists(_.startsWith("batch="))
    require(!(flat && hasBatch),
      s"$root holds a batch-keyed SRP index; use writeSrpBatchAt, not append")
    require(!(!flat && hasFlat),
      s"$root holds a flat SRP index; use buildSrpAt/appendSrpAt, not batch writes")
  }

  private def writeSrpAt(path: String, vectors: DataFrame, mode: String): Unit = {
    SimilarityOps.srpSignature(vectors, SrpBits)
      .withColumn("srp_bucket", col("srp_bucket").cast("int"))
      .repartition(col("srp_bucket"))
      .write.mode(mode).partitionBy("srp_bucket").parquet(path)
    invalidateCached(path)
  }
}
