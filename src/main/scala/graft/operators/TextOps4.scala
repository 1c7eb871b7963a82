package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth text tranche: winnowing document fingerprints and the corpus
  * Zipf curve. Both oracle-checked.
  *
  * Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) is the standard
  * local fingerprinting scheme behind plagiarism/near-dup detection at
  * corpus scale: hash every k-char gram, slide a w-gram window, keep
  * each window's minimum hash — guarantees any match of length
  * ≥ w+k-1 shares a fingerprint, with a fingerprint density of
  * ~2/(w+1) instead of every position.
  *
  * Engine-parity trick: fingerprints stay fixed-width lowercase-hex
  * STRINGS (md5 prefix), where lexicographic order equals numeric
  * order — so `min` agrees across engines with no hex→int conversion.
  *
  * Scale: fully row-local — gram hashes, window minima, and the
  * distinct-count are array ops inside a single map stage (no explode,
  * no per-doc sort exchange); the output is one row per doc. At 100 TB
  * the fingerprint set (≈ 2·L/(w+1) per doc) replaces the raw text in
  * every downstream near-dup join.
  */
object TextOps4 {
  type Q = (SparkSession, String) => DataFrame

  private val K = 5 // gram length (chars)
  private val W = 8 // winnow window (grams)

  val queries: Map[String, Q] = Map(
    "doc_winnow_fingerprint" -> ((s, d) => {
      // The whole scheme is row-local, so it runs as ONE kernel call
      // per document ([[graft.functions.WinnowKernel]]) instead of an
      // expression tree per character: the per-position form paid an
      // md5 expression + an 8-element slice allocation per gram
      // (~20 µs/gram); the kernel reuses one digest, slides an O(n)
      // monotonic deque for the window minima, and compares raw
      // unsigned ints (hex only for the two output strings) —
      // bit-identical fingerprints at ~0.2 µs/gram. Zero shuffle until
      // the one-row-per-doc result hits the final orderBy.
      // the corpus parquet is one small file = ONE input split, but the
      // per-row work is the whole query — round-robin it across the
      // cluster first; the 1-row-per-doc output makes the exchange free
      val fp = udf { text: String =>
        graft.functions.WinnowKernel.fingerprint(text, K, W)
      }
      Tables.documents(s, d)
        .filter(length(col("text")) >= K + W - 1) // at least one full window
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("r", fp(col("text")))
        .select(col("doc_id"),
          col("r._1").as("n_fp"),
          col("r._2").as("min_fp"),
          col("r._3").as("max_fp"))
        .orderBy("doc_id")
    }),

    // corpus Zipf curve: frequency by rank for the top 100 word types —
    // the standard sanity check on corpus token distributions.
    // Top-k FIRST (TakeOrderedAndProject — parallel partial top-100 per
    // partition, merged on the driver), THEN rank the surviving ≤100
    // rows: the global-order window never sees the full vocabulary, so
    // the shape holds at 100 TB vocab sizes.
    "zipf_curve" -> ((s, d) => {
      val top = Tables.documents(s, d)
        .select(explode(split(col("text"), " ", -1)).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term"))
        .limit(100)
      val w = Window.orderBy(col("freq").desc, col("term"))
      top.withColumn("rank", row_number().over(w).cast("long"))
        .select("rank", "term", "freq")
        .orderBy("rank")
    })
  )

  val oracles: Map[String, String] = Map(
    "doc_winnow_fingerprint" ->
      s"""WITH g AS (
         |  SELECT doc_id, i, n,
         |         substr(md5(substr(text, CAST(i AS INTEGER), $K)), 1, 8) AS h
         |  FROM (SELECT doc_id, text, length(text) - $K + 1 AS n,
         |               unnest(range(1, length(text) - $K + 2)) AS i
         |        FROM documents WHERE length(text) >= ${K + W - 1})),
         |wmin AS (
         |  SELECT doc_id, i, n,
         |         min(h) OVER (PARTITION BY doc_id ORDER BY i
         |                      ROWS BETWEEN CURRENT ROW AND ${W - 1} FOLLOWING) AS fp
         |  FROM g)
         |SELECT doc_id, count(DISTINCT fp) AS n_fp,
         |       min(fp) AS min_fp, max(fp) AS max_fp
         |FROM wmin WHERE i <= n - ${W - 1}
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "zipf_curve" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |freq AS (
        |  SELECT term, count(*) AS freq FROM tok GROUP BY 1),
        |ranked AS (
        |  SELECT term, freq,
        |         row_number() OVER (ORDER BY freq DESC, term) AS rank
        |  FROM freq)
        |SELECT rank, term, freq FROM ranked
        |WHERE rank <= 100 ORDER BY rank""".stripMargin
  )
}
