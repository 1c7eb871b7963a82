package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics invariants for the fourth curation tranche (value parity
  * with DuckDB is the oracle's job). */
class TrainingOps4Spec extends SparkSpec {

  test("doc_chunks: stride-24 coverage — count, numbering, and tail size") {
    val chunks = TrainingOps4.queries("doc_chunks")(spark, sf)
    val per = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_no").as("last_no"),
        min("chunk_tokens").as("min_t"), max("chunk_tokens").as("max_t"))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long").as("n"))
    val bad = per.join(docs, "doc_id").filter(
      col("n_chunks") =!= expr("(n + 23) div 24") ||
        col("last_no") =!= expr("(n - 1) div 24") ||
        col("min_t") < 1 || col("max_t") > 32).count()
    assert(bad == 0, s"$bad docs violate the chunk-grid contract")
  }

  test("dedup_blocks matches a local block-grain recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def blocks(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      (0 until w.length by 16).map(s => w.slice(s, s + 16).mkString(" "))
    }
    val occ = scala.collection.mutable.Map.empty[String, Long]
    for ((_, t) <- docs; b <- blocks(t)) occ(b) = occ.getOrElse(b, 0L) + 1
    val expected = docs.map { case (id, t) =>
      val bs = blocks(t)
      (id, (bs.size.toLong, bs.count(b => occ(b) > 1).toLong))
    }.toMap
    val got = TrainingOps4.queries("dedup_blocks")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected, "block-dup audit diverges from local recompute")
    assert(expected.values.exists(_._2 > 0),
      "fixture should contain at least one repeated 16-token block")
  }

  test("bpe_pair_freq matches a local pair count") {
    val texts = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val local = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; tok <- t.split(" ", -1) if tok.length >= 2;
         i <- 0 until tok.length - 1) {
      val p = tok.substring(i, i + 2)
      local(p) = local.getOrElse(p, 0L) + 1
    }
    val expected = local.toSeq.sortBy { case (p, n) => (-n, p) }.take(25)
    val got = TrainingOps4.queries("bpe_pair_freq")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"top pairs diverge:\n got $got\n want $expected")
  }

  test("array_funcs_surface: internal consistency of the HOF results") {
    val a = TrainingOps4.queries("array_funcs_surface")(spark, sf)
    val bad = a.filter(
      col("n_pos") > col("n_dims") ||
        col("q_min") > col("q_max") ||
        // top3's head is by construction the array max
        expr("CAST(split(top3, ',')[0] AS BIGINT)") =!= col("q_max") ||
        col("q_sum") < col("q_min") * col("n_dims") ||
        col("q_sum") > col("q_max") * col("n_dims")).count()
    assert(bad == 0, s"$bad rows break HOF invariants")
  }
}
