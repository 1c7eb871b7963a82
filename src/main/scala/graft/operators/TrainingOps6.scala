package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data tranche 6 — the split-management ops that sit between
  * "curate" and "train":
  *
  *  - `dataset_split` — deterministic 80/10/10 train/val/test
  *    assignment from the content hash (u = first 4 md5 hex digits,
  *    u mod 100 → bucket): a pure content function, so the split is
  *    reproducible across engines, re-shards and re-runs, and a doc
  *    duplicated byte-for-byte always lands in the SAME split (the
  *    property that makes the leakage audit below meaningful).
  *    Output is the per-(source, split) census;
  *  - `tokenizer_fertility` — per-language BPE-tokens-per-word (the
  *    [[TextOps2.BpePattern]] regex tokenizer over the whitespace
  *    baseline, ppm): the cross-lingual tokenizer-efficiency audit
  *    run before fixing a vocabulary;
  *  - `split_leakage` — the train/test contamination audit: NEAR-dup
  *    document groups (3-gram Jaccard ≥ τ pairs from the exact
  *    inverted-index join, connected into groups via their minimum
  *    pair endpoint) that span more than one split. Exact dups can't
  *    leak by construction (same content hash ⇒ same split) — near
  *    dups are precisely the leakage channel a content-hash split
  *    does NOT close, and this table is the proof either way.
  *
  * All three oracle-checked. Scale notes (100 TB): dataset_split and
  * tokenizer_fertility are row-local map stages into dim-sized
  * aggregates (source×3 / langs); split_leakage rides the df-capped
  * pair join ([[DedupOps]]) plus a group-id aggregation — linear in
  * pair volume, and the group key is the min doc id of the pair
  * neighborhood (one hash shuffle).
  */
object TrainingOps6 {
  type Q = (SparkSession, String) => DataFrame

  /** u mod 100 < 80 → train, < 90 → val, else test. */
  def splitCol: Column = {
    val u = conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100
    when(u < 80, "train").when(u < 90, "val").otherwise("test")
  }

  def datasetSplit(docs: DataFrame): DataFrame =
    docs.withColumn("split", splitCol)
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "split")

  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        size(expr(s"regexp_extract_all(text, '${TextOps2.BpePattern}', 0)"))
          .cast("long").as("bpe"),
        size(split(col("text"), " ", -1)).cast("long").as("ws"))
      .groupBy("lang")
      .agg(sum(col("bpe")).as("bpe_tokens"), sum(col("ws")).as("ws_tokens"))
      .withColumn("fertility_ppm", expr("bpe_tokens * 1000000 div ws_tokens"))
      .orderBy("lang")

  /** Near-dup groups (jaccard ≥ τ, from [[DedupOps.jaccardPairs]] —
    * the df-capped exact inverted-index join) spanning >1 split:
    * (group_id = min doc in the pair neighborhood, n_docs, n_splits). */
  def splitLeakage(docs: DataFrame, tauPpm: Long): DataFrame = {
    val withSplit = docs.withColumn("split", splitCol)
      .select(col("doc_id"), col("split"))
    // materialize the (tiny, τ-filtered) pair set ONCE: it feeds FOUR
    // union branches below, and without the checkpoint each branch
    // re-ran the whole inverted-index pair pipeline (4× the dominant
    // cost at every scale — the repo's standard multi-branch rule)
    val pairs = DedupOps.jaccardPairs(docs)
      .filter(expr(s"c * 1000000 div (na + nb - c) >= $tauPpm"))
      .select(col("da"), col("db"))
      .localCheckpoint(true)
    // group id = min neighbor over the pair star (single-hop grouping:
    // each doc maps to the smallest doc it pairs with, incl. itself)
    val member = pairs.select(col("da").as("doc_id"), col("db").as("peer"))
      .union(pairs.select(col("db").as("doc_id"), col("da").as("peer")))
      .union(pairs.select(col("da").as("doc_id"), col("da").as("peer")))
      .union(pairs.select(col("db").as("doc_id"), col("db").as("peer")))
      .groupBy("doc_id").agg(min(col("peer")).as("group_id"))
    member.join(withSplit, "doc_id")
      .groupBy("group_id")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") >= 2)
      .orderBy("group_id")
  }

  val JaccardTauPpm = 800000L

  val queries: Map[String, Q] = Map(
    "dataset_split" -> ((s, d) => datasetSplit(Tables.documents(s, d))),
    "tokenizer_fertility" -> ((s, d) => tokenizerFertility(Tables.documents(s, d))),
    "split_leakage" -> ((s, d) =>
      splitLeakage(Tables.documents(s, d), JaccardTauPpm))
  )

  /** Hex digit → value (md5 is lowercase), DuckDB side. */
  private def hexDigit(i: Int): String =
    s"(CASE WHEN ascii(substr(md5(text), $i, 1)) >= 97 " +
      s"THEN ascii(substr(md5(text), $i, 1)) - 87 " +
      s"ELSE ascii(substr(md5(text), $i, 1)) - 48 END)"

  private val splitSql =
    s"""CASE WHEN (${hexDigit(1)} * 4096 + ${hexDigit(2)} * 256
       | + ${hexDigit(3)} * 16 + ${hexDigit(4)}) % 100 < 80 THEN 'train'
       |WHEN (${hexDigit(1)} * 4096 + ${hexDigit(2)} * 256
       | + ${hexDigit(3)} * 16 + ${hexDigit(4)}) % 100 < 90 THEN 'val'
       |ELSE 'test' END""".stripMargin.replace("\n", " ")

  val oracles: Map[String, String] = Map(
    "dataset_split" ->
      s"""SELECT source, $splitSql AS split, count(*) AS n_docs
         |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin,

    "tokenizer_fertility" ->
      s"""SELECT lang,
         |  CAST(sum(len(regexp_extract_all(text, '${TextOps2.BpePattern}')))
         |    AS BIGINT) AS bpe_tokens,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
         |  CAST(sum(len(regexp_extract_all(text, '${TextOps2.BpePattern}')))
         |    AS BIGINT) * 1000000
         |    // CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |    AS fertility_ppm
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "split_leakage" ->
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(l) - 1),
         |           i -> l[i] || ' ' || l[i + 1] || ' ' || l[i + 2])) AS w
         |       FROM tk WHERE len(l) >= 3),
         |p AS (SELECT a.doc_id AS da, b.doc_id AS db
         |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |      WHERE CAST(len(list_intersect(a.w, b.w)) AS BIGINT) * 1000000
         |        // CAST(len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))
         |             AS BIGINT) >= $JaccardTauPpm),
         |m AS (SELECT doc_id, min(peer) AS group_id FROM (
         |        SELECT da AS doc_id, db AS peer FROM p
         |        UNION ALL SELECT db, da FROM p
         |        UNION ALL SELECT da, da FROM p
         |        UNION ALL SELECT db, db FROM p) GROUP BY doc_id),
         |sp AS (SELECT doc_id, $splitSql AS split FROM documents)
         |SELECT group_id, count(*) AS n_docs,
         |       CAST(count(DISTINCT sp.split) AS BIGINT) AS n_splits
         |FROM m JOIN sp USING (doc_id)
         |GROUP BY group_id HAVING count(DISTINCT sp.split) >= 2
         |ORDER BY group_id""".stripMargin
  )
}
