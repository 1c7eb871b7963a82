package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the privacy-scrub stage every public
  * LLM curation pipeline runs before training (BigCode/StarCoder PII
  * pass, Dolma's pii filtering): find emails / phone numbers / SSNs /
  * IPv4 addresses / long card-like digit runs in document text, count
  * them per class, and rewrite the text with class tokens
  * (`<EMAIL>`, `<PHONE>`, ...).
  *
  * Regex discipline: every pattern stays inside the RE2 ∩ java.util.regex
  * common subset — no lookaround, no backreferences, ASCII `\b` word
  * boundaries only — so the identical pattern string runs in Spark's
  * codegen'd RegExpExtractAll/RegExpReplace AND in the DuckDB oracle's
  * RE2 engine, and the per-class counts and redacted text hash-compare
  * exactly. Detection counts each class independently on the RAW text
  * (a match inside another class's span counts for both); redaction
  * applies the classes in one FIXED order (email first — emails embed
  * dotted digit runs — then SSN, phone, IPv4, card), so the output is
  * a deterministic function of the input on both engines.
  *
  * Scale notes (100 TB):
  *  - `pii_redact` is a pure map stage: five chained codegen'd
  *    regexp_replace calls per row, no shuffle anywhere in the plan
  *    (PlanAudit-asserted). At cluster scale it composes with column
  *    pruning — the scan reads only (doc_id, text).
  *  - `pii_stats` is the same row-local signal extraction collapsed by
  *    a partial HashAggregate on `source` — the shuffle carries
  *    #partitions × #sources pre-aggregated rows, never documents.
  *  - The testdata corpus is synthetic word-soup, so the oracle rows
  *    verify the full plumbing at zero incidence (counts all 0, the
  *    redacted-text md5 equals the input md5); the real match/redact
  *    semantics are pinned on crafted inputs in PiiOpsSpec.
  */
object PiiOps {
  type Q = (SparkSession, String) => DataFrame

  /** (class, pattern, replacement) in fixed redaction order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ssn", """\b\d{3}-\d{2}-\d{4}\b""", "<SSN>"),
    ("phone", """\b\d{3}[-.]\d{3}[-.]\d{4}\b""", "<PHONE>"),
    ("ipv4", """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""", "<IP>"),
    ("card", """\b\d{13,16}\b""", "<CARD>"))

  /** Per-class match counts over a text column (group 0 = whole match:
    * Spark's regexp_extract_all defaults to group 1 and ANSI-throws on
    * group-free patterns). */
  def countCols(text: Column): Seq[Column] =
    Patterns.map { case (name, pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long").as(s"n_$name")
    }

  /** The redaction chain: classes applied in [[Patterns]] order. */
  def redactCol(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, lit(pat), lit(repl))
    }

  /** Row-local PII signals over any (doc_id, source, text) relation —
    * shared by both queries and the spec so the paths cannot drift. */
  def piiSignals(docs: DataFrame): DataFrame =
    docs.select(Seq(col("doc_id"), col("source")) ++ countCols(col("text")): _*)

  /** Sum of the per-class counts (null when text is null — the
    * oracle-facing queries keep that NULL for DuckDB parity). The ONE
    * definition shared by pii_stats, pii_redact, and the streaming
    * scrub, so a sixth pattern class needs no sync anywhere. */
  def totalExpr: Column =
    Patterns.map { case (name, _, _) => col(s"n_$name") }.reduce(_ + _)

  val queries: Map[String, Q] = Map(
    // per-source PII census: doc counts, docs with any hit, and the
    // per-class totals — the corpus-level privacy report card.
    "pii_stats" -> ((s, d) => {
      val aggs =
        Seq(count(lit(1)).cast("long").as("n_docs"),
          sum(when(totalExpr > 0, 1L).otherwise(0L)).as("n_docs_pii")) ++
          Patterns.map { case (name, _, _) => sum(col(s"n_$name")).as(s"n_$name") }
      piiSignals(Tables.documents(s, d))
        .groupBy("source")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("source")
    }),

    // per-doc redaction: total hits + the redacted text's md5/length
    // (full-text hash ⇒ the oracle bit-compares the whole rewrite).
    // The 5-regex chain is materialized ONCE per row in its own
    // projection — not left to codegen subexpression elimination.
    "pii_redact" -> ((s, d) =>
      Tables.documents(s, d)
        .select(Seq(col("doc_id"), col("text"),
          redactCol(col("text")).as("red")) ++ countCols(col("text")): _*)
        .select(col("doc_id"), totalExpr.as("n_pii"), col("red"))
        .select(col("doc_id"), col("n_pii"),
          md5(col("red")).as("redacted_md5"),
          length(col("red")).cast("long").as("redacted_len"))
        .orderBy("doc_id"))
  )

  // ---- DuckDB oracles, generated from the SAME Patterns seq ----

  private def duckCount(name: String, pat: String): String =
    s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"

  private def duckRedact: String =
    Patterns.foldLeft("text") { case (acc, (_, pat, repl)) =>
      s"regexp_replace($acc, '$pat', '$repl', 'g')"
    }

  val oracles: Map[String, String] = Map(
    "pii_stats" -> {
      val sig = Patterns.map { case (n, p, _) => duckCount(n, p) }.mkString(",\n        |    ")
      val sums = Patterns.map { case (n, _, _) =>
        s"CAST(sum(n_$n) AS BIGINT) AS n_$n"
      }.mkString(", ")
      val tot = Patterns.map { case (n, _, _) => s"n_$n" }.mkString(" + ")
      s"""WITH sig AS (
        |  SELECT source,
        |    $sig
        |  FROM documents)
        |SELECT source, CAST(count(1) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN $tot > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_pii,
        |  $sums
        |FROM sig GROUP BY source ORDER BY source""".stripMargin
    },

    "pii_redact" -> {
      val tot = Patterns.map { case (n, p, _) =>
        s"len(regexp_extract_all(text, '$p'))"
      }.mkString(" + ")
      s"""SELECT doc_id, CAST($tot AS BIGINT) AS n_pii,
        |  md5($duckRedact) AS redacted_md5,
        |  CAST(length($duckRedact) AS BIGINT) AS redacted_len
        |FROM documents ORDER BY doc_id""".stripMargin
    }
  )
}
