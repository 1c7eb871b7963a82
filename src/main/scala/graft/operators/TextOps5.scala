package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 ranking and corpus text normalization — the retrieval-scoring
  * and canonicalization stages missing from the tf-idf/dedup tranche.
  *
  * Scale notes (100 TB):
  *  - `bm25_topk` never explodes tokens into a shuffle: term
  *    frequencies and document length are row-local array ops
  *    (`size(filter(split(...)))`), the corpus statistics (N, Σdl, df
  *    per query term) are ONE map-side-partial aggregate collapsed to a
  *    single broadcast row, and the ranking is TakeOrderedAndProject.
  *    Total cost: two corpus scans, zero wide shuffles — the shape
  *    survives any corpus size. The idf is the log-free rational form
  *    ((N − df + ½)/(df + ½)) so every arithmetic op is a correctly
  *    rounded IEEE op on operands both engines compute identically —
  *    the score is bit-stable and DuckDB-oracle-able (the same
  *    discipline as sparse_cosine_topk's integer idf).
  *  - per-term contributions are summed in FIXED textual order (one
  *    expression, not an aggregate over exploded terms), so the IEEE
  *    sequence is partitioning-independent.
  *  - `text_normalize` is a pure map stage (lower → punct strip →
  *    whitespace collapse → trim, then md5); no shuffle at all.
  */
object TextOps5 {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed retrieval query; BM25 k1 = 1.2, b = 0.75. */
  val QueryTerms: Seq[String] = Seq("vector", "merge", "customer", "window")

  /** (doc_id, score) for every document vs [[QueryTerms]] — the shared
    * BM25 relation behind `bm25_topk` and the hybrid RRF fusion. Plan
    * shape as documented above: two corpus scans, one broadcast stats
    * row, zero wide shuffles. */
  def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val f = Tables.documents(s, d)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr(Seq("doc_id", "size(toks) AS dl") ++
        QueryTerms.zipWithIndex.map { case (t, i) =>
          s"size(filter(toks, x -> x = '$t')) AS tf${i + 1}"
        }: _*)
    val stats = f.selectExpr(
      Seq("count(1) AS n", "sum(dl) AS total") ++
        QueryTerms.indices.map(i =>
          s"CAST(sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df${i + 1}"): _*)
    f.crossJoin(broadcast(stats))
      .selectExpr("doc_id", s"(${bm25Score}) AS score")
  }

  val queries: Map[String, Q] = Map(
    "bm25_topk" -> ((s, d) =>
      bm25Scored(s, d)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)),

    "text_normalize" -> ((s, d) => {
      // one kernel call per document (TextKernels.normalize) instead of
      // two regex passes + a second full pipeline evaluation for the
      // md5 column — bit-identical output, ~10× less per-char work;
      // round-robin first (one input split, per-char work is the query)
      val norm = udf { text: String => graft.functions.TextKernels.normalize(text) }
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("r", norm(col("text")))
        .select(col("doc_id"), col("r._1").as("norm_len"), col("r._2").as("norm_md5"))
    })
  )

  /** BM25 with rational idf; per-term contributions in fixed order.
    * Constants are CAST(… AS DOUBLE) so BOTH engines run the identical
    * IEEE op sequence — a bare 0.5 literal is DECIMAL in Spark SQL but
    * DOUBLE arithmetic in DuckDB, which silently diverges the scores.
    * Public so RetrievalOps can compose the SAME expression into the
    * hybrid-RRF oracle — one definition, zero drift. */
  def bm25Score: String = {
    def c(x: String) = s"CAST($x AS DOUBLE)"
    QueryTerms.indices.map { i =>
      val tf = s"tf${i + 1}"; val df = s"df${i + 1}"
      s"(((n - $df + ${c("0.5")}) / ($df + ${c("0.5")})) * " +
        s"(($tf * ${c("2.2")}) / ($tf + ${c("1.2")} * (${c("0.25")} + (${c("0.75")} * (dl * n)) / total))))"
    }.mkString(" + ")
  }

  /** DuckDB CTE chain `t, f, st` reproducing [[bm25Scored]]'s inputs —
    * shared verbatim between the bm25_topk oracle and RetrievalOps'
    * hybrid-RRF oracle. */
  def bm25OracleCtes: String = {
    val tfs = QueryTerms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(toks, x -> x = '$t')) AS tf${i + 1}"
    }.mkString(", ")
    val dfs = QueryTerms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf${i + 1} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df${i + 1}").mkString(", ")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |f AS (SELECT doc_id, len(toks) AS dl, $tfs FROM t),
      |st AS (SELECT count(1) AS n, CAST(sum(dl) AS BIGINT) AS total, $dfs FROM f)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "bm25_topk" ->
      s"""WITH $bm25OracleCtes
        |SELECT doc_id, ($bm25Score) AS score
        |FROM f, st
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,

    "text_normalize" ->
      """SELECT doc_id,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '  *', ' ', 'g'))) AS norm_len,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '  *', ' ', 'g'))) AS norm_md5
        |FROM documents""".stripMargin
  )
}
