package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventh text tranche: corpus vocabulary-growth analytics.
  *
  * `heaps_law_points` materializes the Heaps'-law curve V(n) — how
  * vocabulary grows with corpus size — at ten fixed prefixes of the
  * corpus (by doc_id): for each decile threshold, the token count and
  * the distinct-word count of every document BEFORE the threshold.
  * The standard corpus-health artifact: a flattening curve signals
  * duplication/templating, super-Heaps growth signals noise/OCR junk.
  * (The log-log slope fit itself is left OUT of the query: it would
  * put a transcendental into the hash; the ten exact points are the
  * engine's deliverable.)
  *
  * Exactness: everything is integer arithmetic — thresholds are
  * integer-divided id offsets, counts/sums are longs.
  *
  * Scale notes (100 TB):
  *  - vocabulary growth needs each word's FIRST document, not a
  *    per-prefix distinct: one vocab-cardinality shuffle
  *    (groupBy(word).min(doc_id)), then each word joins the ten
  *    broadcast thresholds — the per-prefix "distinct words so far"
  *    falls out as a 10-row aggregate, never a re-scan per prefix;
  *  - the token tier is a per-doc map + the same broadcast-threshold
  *    join: shuffle carries 10-row partials (partial aggregation),
  *    not documents.
  */
object TextOps7 {
  type Q = (SparkSession, String) => DataFrame

  /** Number of curve points (corpus-prefix deciles). */
  val Points = 10

  val queries: Map[String, Q] = Map(
    "heaps_law_points" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bounds = docs.agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      val points = broadcast(bounds
        .select(explode(sequence(lit(1L), lit(Points.toLong))).as("i"),
          col("mn"), col("mx"))
        .select(col("i"),
          expr(s"mn + ((mx - mn + 1) * i) div $Points").as("thr")))
      val docStats = docs.select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("toks"))
      val dTier = points.join(docStats, col("doc_id") < col("thr"), "left")
        .groupBy("i", "thr")
        .agg(count(col("doc_id")).as("n_docs"),
          coalesce(sum(col("toks")), lit(0L)).as("n_tokens"))
      val firstDoc = docs
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(min(col("doc_id")).as("fdoc"))
      val vTier = points.join(firstDoc, col("fdoc") < col("thr"), "left")
        .groupBy("i").agg(count(col("word")).as("vocab"))
      dTier.join(vTier, Seq("i"))
        .select("i", "thr", "n_docs", "n_tokens", "vocab")
        .orderBy("i")
    })
  )

  val oracles: Map[String, String] = Map(
    "heaps_law_points" ->
      s"""WITH b AS (SELECT min(doc_id) AS mn, max(doc_id) AS mx FROM documents),
         |pts AS (
         |  SELECT i, mn + ((mx - mn + 1) * i) // $Points AS thr
         |  FROM b, (SELECT unnest(range(1, ${Points + 1})) AS i)),
         |ds AS (SELECT doc_id, len(string_split(text, ' ')) AS toks FROM documents),
         |dtier AS (
         |  SELECT p.i, p.thr, count(d.doc_id) AS n_docs,
         |         CAST(COALESCE(sum(d.toks), 0) AS BIGINT) AS n_tokens
         |  FROM pts p LEFT JOIN ds d ON d.doc_id < p.thr
         |  GROUP BY p.i, p.thr),
         |fd AS (
         |  SELECT word, min(doc_id) AS fdoc
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |  WHERE word <> '' GROUP BY word),
         |vtier AS (
         |  SELECT p.i, count(fd.word) AS vocab
         |  FROM pts p LEFT JOIN fd ON fd.fdoc < p.thr
         |  GROUP BY p.i)
         |SELECT d.i, d.thr, d.n_docs, d.n_tokens, v.vocab
         |FROM dtier d JOIN vtier v ON d.i = v.i
         |ORDER BY d.i""".stripMargin
  )
}
