package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis tranche 2: BPE-ish regex tokenization and corpus word
  * frequencies — the token-accounting ops of a training-data pipeline
  * (builder brief: "token counting (whitespace + a BPE-ish regex)").
  */
object TextOps2 {
  type Q = (SparkSession, String) => DataFrame

  /** GPT-2-style pretokenizer pattern, ASCII-simplified; identical
    * string on the Spark (Java regex) and DuckDB (RE2) sides —
    * leftmost-first alternation behaves the same for this pattern. */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"

  val queries: Map[String, Q] = Map(
    // BPE-ish token count per doc vs whitespace count
    "doc_bpe_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$BpePattern', 0)")).cast("long")
            .as("bpe_tokens"),
          size(split(col("text"), " ", -1)).cast("long").as("ws_tokens"))
        .orderBy("doc_id")),

    // corpus word frequency top-k (the explode→count→topk shape that
    // dominates corpus statistics jobs; partial agg keeps the shuffle
    // at vocabulary cardinality)
    "word_freq_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("word"))
        .limit(30)),

    // per-source corpus stats: docs, total whitespace tokens, vocab size
    "corpus_stats" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word") =!= "")
      toks.groupBy("source")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_tokens"),
          countDistinct(col("word")).as("vocab"))
        .orderBy("source")
    })
  )

  val oracles: Map[String, String] = Map(
    "doc_bpe_tokens" ->
      s"""SELECT doc_id,
         |       len(regexp_extract_all(text, '$BpePattern')) AS bpe_tokens,
         |       len(string_split(text, ' ')) AS ws_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "word_freq_topk" ->
      """SELECT word, count(*) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY freq DESC, word LIMIT 30""".stripMargin,

    "corpus_stats" ->
      """SELECT source, count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_tokens, count(DISTINCT word) AS vocab
        |FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY source ORDER BY source""".stripMargin
  )
}
