package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third text-pipeline tranche: TF-IDF term relevance, bigram
  * conditional-probability language model, deterministic hash-based
  * stratified sampling, and corpus length histograms — the remaining
  * text operations a training-data pipeline runs at corpus scale.
  *
  * All oracle-checked. Relevance/probability scores use scaled INTEGER
  * arithmetic (parts-per-million via integer division) instead of
  * log/double math so results are bit-identical across engines and
  * independent of aggregation order.
  *
  * Scale notes (100 TB): every query is token-explode → hash-partition
  * group-by — partial aggregation absorbs the per-doc token fan-out
  * before the shuffle; the TF-IDF join broadcasts the document-frequency
  * side only when small (Catalyst/AQE decides from stats); the
  * deterministic sample is a pure map-side filter (no shuffle at all),
  * which is exactly why hash-sampling beats random sampling for
  * reproducible corpus splits.
  */
object TextOps3 {
  type Q = (SparkSession, String) => DataFrame

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))

  val queries: Map[String, Q] = Map(
    // TF-IDF-style relevance, integer-exact: score = tf * 1e6 div df
    // (rarer terms score higher). Top-3 terms per doc for the first 50
    // docs; rank ties broken by term.
    "tfidf_topk" -> ((s, d) => {
      val tok = tokens(Tables.documents(s, d))
      // tf feeds the df census AND the scoring join — materialize the
      // shared tier once (multi-branch rule) instead of re-running the
      // token explode + count per branch
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term")
        .withColumn("score_ppm", expr("tf * 1000000 div df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_ppm").desc, col("term"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("doc_id") < 50)
        .select("doc_id", "term", "score_ppm", "rn")
        .orderBy("doc_id", "rn")
    }),

    // bigram conditional probability P(w2|w1) in ppm, integer-exact:
    // c(w1,w2) * 1e6 div c(w1, *) — the unigram denominator counts
    // bigram STARTS (not raw tokens) so probabilities per w1 sum to ~1e6
    "bigram_condprob" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val big = docs.select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
      // pair feeds the unigram re-aggregate AND the final join — one
      // materialization instead of two bigram explode+count passes
      val pair = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint(true)
      val uni = pair.groupBy("w1").agg(sum("c12").as("c1"))
      pair.join(uni, "w1")
        .filter(col("c12") >= 5)
        .withColumn("p_ppm", expr("c12 * 1000000 div c1"))
        .select("w1", "w2", "c12", "c1", "p_ppm")
        .orderBy(col("p_ppm").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // deterministic stratified sample: keep a doc iff the first two hex
    // chars of md5(text) sort below '20' (≈ 1/8). Pure map-side filter,
    // reproducible on any engine/partitioning — the right way to carve
    // train/validation splits from a 100 TB corpus.
    "doc_sample_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(substring(md5(col("text").cast("binary")), 1, 2) < "20")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // per-language doc-length histogram (100-char buckets) + the hash
    // sample's per-language hit counts — verifies the sample is
    // unbiased across strata
    "doc_length_hist" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      docs.groupBy(col("lang"), expr("n_chars div 100").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(when(substring(md5(col("text").cast("binary")), 1, 2) < "20", 1L)
            .otherwise(0L)).as("n_sampled"))
        .orderBy("lang", "bucket")
    })
  )

  val oracles: Map[String, String] = Map(
    "tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, tf.term, tf * 1000000 // df AS score_ppm,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY tf * 1000000 // df DESC, tf.term) AS rn
        |  FROM tf JOIN df ON tf.term = df.term)
        |SELECT doc_id, term, score_ppm, rn
        |FROM scored WHERE rn <= 3 AND doc_id < 50
        |ORDER BY doc_id, rn""".stripMargin,

    "bigram_condprob" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |big AS (
        |  SELECT w[i] AS w1, w[i + 1] AS w2
        |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks)),
        |pair AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
        |uni AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM pair GROUP BY 1)
        |SELECT pair.w1, w2, c12, c1, c12 * 1000000 // c1 AS p_ppm
        |FROM pair JOIN uni ON pair.w1 = uni.w1
        |WHERE c12 >= 5
        |ORDER BY p_ppm DESC, pair.w1, w2 LIMIT 50""".stripMargin,

    "doc_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5(text), 1, 2) < '20'
        |ORDER BY doc_id""".stripMargin,

    "doc_length_hist" ->
      """SELECT lang, n_chars // 100 AS bucket, count(*) AS n,
        |       CAST(sum(CASE WHEN substr(md5(text), 1, 2) < '20'
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents
        |GROUP BY lang, bucket
        |ORDER BY lang, bucket""".stripMargin
  )
}
