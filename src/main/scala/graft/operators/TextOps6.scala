package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal: deflate each document and report
  * compressed/raw size — the classic redundancy heuristic web-corpus
  * curation uses next to the repetition filters (highly-compressible
  * text is boilerplate/template/spam; incompressible text is often
  * binary soup or high-entropy junk — both tails get reviewed).
  *
  * `doc_repetition` counts SPECIFIC token-level repeats; deflate sees
  * ALL string-level redundancy at once (LZ77 window + Huffman), so the
  * two disagree exactly where it's interesting (e.g. character-level
  * templates that token counting misses).
  *
  * Engine note: the codec is a JVM library call (java.util.zip,
  * level-6 single-shot), so this rides a Scala UDF like the PNG codec
  * — the documented exception to the functions-not-UDFs rule for
  * library codecs. Pure map stage, no shuffle but the presentation
  * sort; no DuckDB oracle (zlib isn't SQL) — CompressSignalSpec pins
  * determinism, bounds, and the redundancy direction.
  */
object TextOps6 {
  type Q = (SparkSession, String) => DataFrame

  /** Deflated byte count at a FIXED level with a fresh Deflater per
    * call (no shared dictionary/state → value depends only on the
    * input bytes and zlib's level-6 encoding). */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, /*nowrap=*/ true)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def compressRatio(docs: DataFrame): DataFrame = {
    // NULL text stays NULL (n_bytes/deflate_bytes/ratio_ppm all null) —
    // the repo-wide NULL-text discipline (PiiOps, CurationPipeline)
    val dlen = udf { text: String =>
      if (text == null) Option.empty[Int]
      else Some(deflatedLen(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    docs
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        dlen(col("text")).cast("long").as("deflate_bytes"))
      .withColumn("ratio_ppm",
        expr("deflate_bytes * 1000000 div n_bytes"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "doc_compress_ratio" -> ((s, d) =>
      compressRatio(Tables.documents(s, d)))
  )

  // no oracle: zlib is not expressible in SQL — see CompressSignalSpec
  val oracles: Map[String, String] = Map.empty
}
