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

    // the end-to-end corpus-cleaning pipeline the individual operators
    // exist for: exact-dedup survivors ∩ quality floor ∩ language
    // filter → the "clean training corpus" id set, with the reasons
    // columns a pipeline audit needs
    "corpus_clean_pipeline" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("text")
      Tables.documents(s, d)
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("tokens", size(split(col("text"), " ", -1)).cast("long"))
        .withColumn("stop_hits",
          expr("(length(text) - length(replace(text, ' the ', ''))) div 5"))
        .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
        .withColumn("quality_ok", col("tokens") >= 20 && col("stop_hits") >= 1)
        .withColumn("lang_ok", col("lang").isin("en", "de", "es"))
        .withColumn("keep", col("is_canonical") && col("quality_ok") && col("lang_ok"))
        .select("doc_id", "is_canonical", "quality_ok", "lang_ok", "keep")
        .orderBy("doc_id")
    }),

    // E8 formatting parity (presentation tier): fixed 2-dp rendering
    "format_prices" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          format_string("%.2f", col("o_totalprice")).as("price_str"))
        .orderBy("o_orderkey")
        .limit(100)),

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

    "corpus_clean_pipeline" ->
      """SELECT doc_id,
        |       doc_id = min(doc_id) OVER (PARTITION BY text) AS is_canonical,
        |       (len(string_split(text, ' ')) >= 20 AND
        |        (length(text) - length(replace(text, ' the ', ''))) // 5 >= 1)
        |         AS quality_ok,
        |       lang IN ('en', 'de', 'es') AS lang_ok,
        |       (doc_id = min(doc_id) OVER (PARTITION BY text)
        |        AND (len(string_split(text, ' ')) >= 20 AND
        |             (length(text) - length(replace(text, ' the ', ''))) // 5 >= 1)
        |        AND lang IN ('en', 'de', 'es')) AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,

    "format_prices" ->
      """SELECT o_orderkey, printf('%.2f', o_totalprice) AS price_str
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,

    "corpus_stats" ->
      """SELECT source, count(DISTINCT doc_id) AS n_docs,
        |       count(*) AS n_tokens, count(DISTINCT word) AS vocab
        |FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS word
        |      FROM documents)
        |WHERE word <> ''
        |GROUP BY source ORDER BY source""".stripMargin
  )
}
