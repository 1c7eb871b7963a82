package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth training-data-curation tranche: sliding-window token
  * chunking, duplicated-block (substring-dedup) audit, BPE first-merge
  * pair census, and the higher-order array-function surface. All
  * oracle-checked.
  *
  * Scale notes (100 TB):
  *  - doc_chunks / dedup_blocks explode each doc into
  *    O(tokens/stride) rows — output proportional to input, map-side
  *    (no shuffle before the block-hash aggregation); chunk text is
  *    hashed to md5 BEFORE any shuffle so exchanged rows are narrow;
  *  - dedup_blocks is the block-grain form of Lee et al.'s substring
  *    dedup: the only shuffle is on the 16-token block hash, and the
  *    per-doc re-aggregation happens on doc_id, the explode's source
  *    key;
  *  - bpe_pair_freq is the first iteration of a BPE trainer: pair
  *    census → partial-agg → TakeOrderedAndProject top-k; successive
  *    merge rounds repeat the same plan on the re-encoded corpus;
  *  - array_funcs_surface is a pure map stage — it exists to pin the
  *    higher-order-function semantics (transform/filter/aggregate/
  *    sort_array/slice/reverse) against an independent engine, since
  *    every embedding kernel in this library builds on them.
  */
object TrainingOps4 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // sliding-window chunking: 32-token windows at a 24-token stride
    // (the tokenize-for-training shape; last window may be short).
    // One row per (doc, chunk) with the chunk's md5 for downstream
    // chunk-grain dedup.
    "doc_chunks" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .withColumn("n", size(col("w")).cast("long"))
        .select(col("doc_id"), col("w"), col("n"),
          explode(expr("sequence(CAST(0 AS BIGINT), n - 1, CAST(24 AS BIGINT))"))
            .as("start"))
        .select(col("doc_id"),
          (col("start") / 24).cast("long").as("chunk_no"),
          least(lit(32L), col("n") - col("start")).as("chunk_tokens"),
          md5(expr("concat_ws(' ', slice(w, CAST(start + 1 AS INT), 32))"))
            .as("chunk_hash"))
        .orderBy("doc_id", "chunk_no")),

    // duplicated-block audit: non-overlapping 16-token blocks hashed
    // corpus-wide; per doc, how many of its blocks occur more than
    // once anywhere (block-grain substring dedup — catches shared
    // boilerplate that whole-doc hashing misses)
    "dedup_blocks" -> ((s, d) => {
      val blocks = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .withColumn("n", size(col("w")).cast("long"))
        .select(col("doc_id"), col("w"), col("n"),
          explode(expr("sequence(CAST(0 AS BIGINT), n - 1, CAST(16 AS BIGINT))"))
            .as("start"))
        .select(col("doc_id"),
          md5(expr("concat_ws(' ', slice(w, CAST(start + 1 AS INT), 16))"))
            .as("bh"))
      val occ = blocks.groupBy("bh").agg(count(lit(1)).as("occ"))
      blocks.join(occ, "bh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          count(when(col("occ") > 1, 1)).as("n_dup_blocks"))
        .withColumn("dup_ppm",
          expr("n_dup_blocks * 1000000 div n_blocks"))
        .orderBy("doc_id")
    }),

    // BPE first-merge census: most frequent adjacent character pair
    // inside tokens — the pair a byte-pair-encoding trainer would
    // merge first (doc_bpe_tokens applies a fixed merge table; this
    // is where such a table comes from)
    "bpe_pair_freq" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ", -1)).as("t"))
        .filter(length(col("t")) >= 2)
        .select(col("t"),
          explode(expr("sequence(1, length(t) - 1)")).as("i"))
        .select(expr("substring(t, i, 2)").as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(25)),

    // Iterative BPE merge TRAINING (Sennrich et al.): the corpus is
    // scanned ONCE into a word histogram (the classic trainer shape —
    // all later rounds run over the vocab, which is distinct-words
    // sized, not corpus sized), then each round censuses adjacent
    // symbol pairs weighted by word frequency, picks the max (ties →
    // lexicographic pair, fully deterministic), and fuses it
    // left-to-right through every vocab entry. Output: one row per
    // learned merge. Iterative ⇒ no SQL oracle (rows-only); BpeTrainSpec
    // pins a hand-computed golden corpus, the non-increasing max-count
    // invariant, and first-merge agreement with bpe_pair_freq.
    "bpe_train_merges" -> ((s, d) =>
      bpeTrainMerges(Tables.documents(s, d), merges = 10)),

    // higher-order array-function surface over the embedding column:
    // transform / filter / aggregate / sort_array / slice / reverse,
    // all on the exact quantized integer form — semantics pinned
    // against DuckDB's list functions
    "array_funcs_surface" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
            .as("q"))
        .select(col("vec_id"),
          size(col("q")).cast("long").as("n_dims"),
          expr("CAST(size(filter(q, x -> x > 0)) AS BIGINT)").as("n_pos"),
          expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"),
          expr("aggregate(q, CAST(0 AS BIGINT), (a, x) -> a + x)").as("q_sum"),
          expr("array_join(transform(slice(sort_array(q, false), 1, 3), x -> CAST(x AS STRING)), ',')")
            .as("top3"),
          expr("element_at(reverse(q), 1)").as("rev_head"))
        .orderBy("vec_id"))
  )

  /** Learn `merges` BPE merges from whitespace words. Each word is a
    * character-symbol array weighted by its corpus frequency; a round
    * is census → argmax → fuse. The vocab relation is
    * localCheckpoint'ed per round (iterative-Spark lineage discipline)
    * and every shuffle is vocab-sized. Returns
    * (rank, left, right, merged, pair_count) rows in merge order. */
  def bpeTrainMerges(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .filter(length(col("t")) >= 1)
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .select(expr("split(t, '')").as("syms"), col("freq"))
      .as[(Seq[String], Long)]
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var r = 0
    var done = false
    while (r < merges && !done) {
      val top = vocab
        .flatMap { case (syms, freq) =>
          syms.iterator.sliding(2).withPartial(false)
            .map(p => (p.head, p(1), freq))
        }
        .toDF("l", "r", "freq")
        .groupBy("l", "r").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (ml, mr, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((r + 1, ml, mr, ml + mr, n))
        val old = vocab
        vocab = vocab.map { case (syms, freq) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == ml && syms(i + 1) == mr) {
              out += ml + mr; i += 2 // greedy left-to-right fuse
            } else { out += syms(i); i += 1 }
          }
          (out.toSeq, freq)
        }.localCheckpoint(true) // truncate lineage each round
        old.unpersist()
        r += 1
      }
    }
    learned.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  val oracles: Map[String, String] = Map(
    "doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, w, len(w) AS n, unnest(range(0, len(w), 24)) AS start
        |      FROM t)
        |SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_no,
        |       CAST(least(32, n - start) AS BIGINT) AS chunk_tokens,
        |       md5(array_to_string(w[start+1:start+32], ' ')) AS chunk_hash
        |FROM s ORDER BY doc_id, chunk_no""".stripMargin,

    "dedup_blocks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT doc_id, md5(array_to_string(w[start+1:start+16], ' ')) AS bh
        |      FROM (SELECT doc_id, w, unnest(range(0, len(w), 16)) AS start FROM t)),
        |occ AS (SELECT bh, count(*) AS occ FROM b GROUP BY bh)
        |SELECT b.doc_id, count(*) AS n_blocks,
        |       CAST(count(*) FILTER (WHERE occ.occ > 1) AS BIGINT) AS n_dup_blocks,
        |       CAST(count(*) FILTER (WHERE occ.occ > 1) * 1000000 // count(*)
        |            AS BIGINT) AS dup_ppm
        |FROM b JOIN occ ON occ.bh = b.bh
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "bpe_pair_freq" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |p AS (SELECT substr(t, i, 2) AS pair
        |      FROM (SELECT t, unnest(range(1, len(t))) AS i
        |            FROM toks WHERE len(t) >= 2))
        |SELECT pair, count(*) AS n FROM p
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 25""".stripMargin,

    "array_funcs_surface" ->
      """SELECT vec_id,
        |  CAST(len(l) AS BIGINT) AS n_dims,
        |  CAST(len(list_filter(l, x -> x > 0)) AS BIGINT) AS n_pos,
        |  list_min(l) AS q_min, list_max(l) AS q_max,
        |  CAST(list_sum(l) AS BIGINT) AS q_sum,
        |  array_to_string(list_sort(l, 'DESC')[1:3], ',') AS top3,
        |  list_reverse(l)[1] AS rev_head
        |FROM (SELECT vec_id,
        |        list_transform(embedding,
        |          x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS l
        |      FROM embeddings)
        |ORDER BY vec_id""".stripMargin
  )
}
