package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact substring-duplication analysis — the cross-document repeated-
  * span detector from "Deduplicating Training Data Makes Language
  * Models Better" (Lee et al., ACL 2022): find every L-token window
  * that occurs more than once in the corpus (across documents OR
  * repeated within one) and measure, per document, how much of its
  * text sits under such duplicated spans. The suffix-array machinery
  * of the paper collapses, in a dataflow engine, to a rolling-window
  * census: same duplicated-span semantics, embarrassingly parallel.
  *
  *  - `substring_dup_rate` — per doc: window count, duplicated-window
  *    count, and the number of token positions covered by at least one
  *    duplicated window (overlapping windows MERGED — the
  *    interval-union fold runs row-locally over the sorted start
  *    positions, so the coverage shuffle is one row per doc, not L
  *    rows per window);
  *  - `dup_span_topk` — the top-25 most frequent duplicated windows
  *    with occurrence and document counts: the audit table a pipeline
  *    operator reads to see WHAT the boilerplate is before deleting it;
  *  - `lang_confusion` — the (label, guess) confusion matrix of the
  *    row-local language-ID heuristic ([[TextOps]] `doc_lang_guess`)
  *    against the corpus's `lang` column: the precision/recall audit
  *    that decides whether the cheap n-gram marker classifier is good
  *    enough to gate on at 100 TB.
  *
  * All three are DuckDB-oracle-checked. `substring_dup_rate` hashes
  * windows to xxhash64 longs for the census (8-byte shuffle keys; a
  * 2^-64 collision marks one extra window duplicated — same tolerance
  * as the whole jaccard/minhash family), while the oracle censuses the
  * window strings themselves.
  *
  * Scale notes (100 TB):
  *  - the window relation is ~|tokens| rows of (doc_id, pos, hash) —
  *    linear; the census is a word-count-shaped groupBy on the hash
  *    with map-side partial aggregation; the join back is hash-equi on
  *    the same key (one Exchange reused under AQE);
  *  - the coverage computation never explodes windows into positions:
  *    a sorted-starts interval-union fold (`aggregate`) runs inside the
  *    per-doc row — O(windows) per doc, no L× row blowup;
  *  - dup_span_topk keeps strings only on the census leg and
  *    short-circuits through TakeOrderedAndProject;
  *  - lang_confusion is a row-local map stage + a ≤|langs|² aggregate.
  */
object SpanDedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** Window length in tokens. 8 is small enough that the driver's
    * synthetic 30–100-token docs produce hits at every SF, and large
    * enough that a window is "a span", not a shingle. */
  val WinLen = 8

  /** (doc_id, p, h): every L-token window, 1-based start position,
    * xxhash64 of the space-joined window. The corpus parquet is one
    * input split — round-robin before the heavy hashing map. */
  private def windows(docs: DataFrame): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .filter(size(col("w")) >= WinLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - $WinLen + 1), " +
          s"i -> struct(i AS p, xxhash64(concat_ws(' ', slice(w, i, $WinLen))) AS h))"))
        .as("win"))
      .select(col("doc_id"), col("win.p").as("p"), col("win.h").as("h"))

  /** Per-doc duplicated-span coverage. Docs shorter than L tokens keep
    * a row with zero windows (left join from the full doc list). */
  def substringDupRate(docs: DataFrame): DataFrame = {
    val wins = windows(docs).localCheckpoint(true)
    val dupKeys = wins.groupBy("h").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("h")
    val perDoc = wins
      .join(dupKeys, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_windows"),
        sort_array(collect_list(col("p"))).as("starts"))
      // interval-union fold over sorted starts: covered += end − max(prevEnd, s−1)
      .withColumn("dup_tokens", expr(
        s"""aggregate(starts,
           |  named_struct('c', CAST(0 AS BIGINT), 'e', CAST(0 AS BIGINT)),
           |  (acc, s) -> named_struct(
           |    'c', acc.c + CAST(s + $WinLen - 1 AS BIGINT)
           |         - greatest(acc.e, CAST(s - 1 AS BIGINT)),
           |    'e', greatest(acc.e, CAST(s + $WinLen - 1 AS BIGINT))),
           |  acc -> acc.c)""".stripMargin))
      .select("doc_id", "n_dup_windows", "dup_tokens")
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - (WinLen - 1), lit(0L)))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ppm", expr("dup_tokens * 1000000 div n_tokens"))
      .orderBy("doc_id")
  }

  /** Top-k duplicated window strings by (occurrences, distinct docs). */
  def dupSpanTopK(docs: DataFrame, k: Int): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .filter(size(col("w")) >= WinLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w) - $WinLen + 1), " +
          s"i -> concat_ws(' ', slice(w, i, $WinLen)))")).as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("occ"), countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("occ") >= 2)
      .orderBy(col("occ").desc, col("g"))
      .limit(k)

  /** (lang, lang_guess) → docs: the classifier-vs-label confusion
    * matrix of the TextOps language-ID heuristic. */
  def langConfusion(docs: DataFrame): DataFrame = {
    def hits(m: String) =
      expr(s"(length(text) - length(replace(text, '$m', ''))) div ${m.length}")
    docs
      .select(col("lang"),
        hits(" the ").as("en_hits"), hits(" el ").as("es_hits"),
        hits(" der ").as("de_hits"))
      .withColumn("lang_guess",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits"), "en")
          .when(col("es_hits") >= col("de_hits"), "es")
          .otherwise("de"))
      .groupBy("lang", "lang_guess")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "lang_guess")
  }

  val queries: Map[String, Q] = Map(
    "substring_dup_rate" -> ((s, d) =>
      substringDupRate(Tables.documents(s, d))),
    "dup_span_topk" -> ((s, d) =>
      dupSpanTopK(Tables.documents(s, d), 25)),
    "lang_confusion" -> ((s, d) =>
      langConfusion(Tables.documents(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "substring_dup_rate" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |wins AS (
         |  SELECT doc_id, i AS p, array_to_string(w[i:i+${WinLen - 1}], ' ') AS g
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${WinLen} + 2)) AS i
         |        FROM tk WHERE len(w) >= $WinLen)),
         |dupk AS (SELECT g FROM wins GROUP BY g HAVING count(*) >= 2),
         |dup AS (SELECT doc_id, p FROM wins JOIN dupk USING (g)),
         |cov AS (
         |  SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS dup_tokens
         |  FROM (SELECT doc_id, unnest(range(p, p + $WinLen)) AS pos FROM dup) t
         |  GROUP BY doc_id),
         |nw AS (SELECT doc_id, count(*) AS n_dup_windows FROM dup GROUP BY doc_id)
         |SELECT tk.doc_id, CAST(len(tk.w) AS BIGINT) AS n_tokens,
         |       CAST(greatest(len(tk.w) - ${WinLen - 1}, 0) AS BIGINT) AS n_windows,
         |       COALESCE(nw.n_dup_windows, 0) AS n_dup_windows,
         |       COALESCE(cov.dup_tokens, 0) AS dup_tokens,
         |       COALESCE(cov.dup_tokens, 0) * 1000000
         |         // CAST(len(tk.w) AS BIGINT) AS dup_ppm
         |FROM tk
         |LEFT JOIN cov ON cov.doc_id = tk.doc_id
         |LEFT JOIN nw ON nw.doc_id = tk.doc_id
         |ORDER BY tk.doc_id""".stripMargin,

    "dup_span_topk" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |wins AS (
         |  SELECT doc_id, array_to_string(w[i:i+${WinLen - 1}], ' ') AS g
         |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - ${WinLen} + 2)) AS i
         |        FROM tk WHERE len(w) >= $WinLen))
         |SELECT g, count(*) AS occ, count(DISTINCT doc_id) AS n_docs
         |FROM wins GROUP BY g HAVING count(*) >= 2
         |ORDER BY occ DESC, g LIMIT 25""".stripMargin,

    "lang_confusion" ->
      """SELECT lang, lang_guess, count(*) AS n_docs FROM (
        |  SELECT lang,
        |    CASE WHEN en_hits >= es_hits AND en_hits >= de_hits THEN 'en'
        |         WHEN es_hits >= de_hits THEN 'es'
        |         ELSE 'de' END AS lang_guess
        |  FROM (
        |    SELECT lang,
        |      (length(text) - length(replace(text, ' the ', ''))) // 5 AS en_hits,
        |      (length(text) - length(replace(text, ' el ', ''))) // 4 AS es_hits,
        |      (length(text) - length(replace(text, ' der ', ''))) // 5 AS de_hits
        |    FROM documents) h) t
        |GROUP BY lang, lang_guess ORDER BY lang, lang_guess""".stripMargin
  )
}
