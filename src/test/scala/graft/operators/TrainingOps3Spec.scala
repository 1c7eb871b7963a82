package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics invariants for the third curation tranche (value parity
  * with DuckDB is the oracle's job). */
class TrainingOps3Spec extends SparkSpec {

  test("zorder key deinterleaves back to its coordinates") {
    val z = TrainingOps3.queries("zorder_key")(spark, sf)
    val back = z.withColumn("x2", expr(
        (0 until 8).map(i => s"(((zkey >> ${2 * i}) & 1) << $i)").mkString(" + ")))
      .withColumn("y2", expr(
        (0 until 8).map(i => s"(((zkey >> ${2 * i + 1}) & 1) << $i)").mkString(" + ")))
    val orig = Tables.events(spark, sf).select(col("event_id"),
      (col("user_id") % 256).cast("long").as("x"),
      (expr("unix_micros(ts) div 1000000") % 256).cast("long").as("y"))
    val bad = back.join(orig, "event_id")
      .filter(col("x") =!= col("x2") || col("y") =!= col("y2")).count()
    assert(bad == 0, s"$bad events fail the z-order roundtrip")
  }

  test("hard negatives always carry a different label") {
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label")
    val hn = TrainingOps3.queries("hard_negatives")(spark, sf)
    val bad = hn
      .join(labels.withColumnRenamed("label", "la"), "vec_id")
      .join(labels.withColumnRenamed("vec_id", "hard_negative")
        .withColumnRenamed("label", "lb"), "hard_negative")
      .filter(col("la") === col("lb")).count()
    assert(bad == 0, s"$bad hard negatives share the anchor's label")
  }

  test("contamination excludes the benchmark docs and stays in [0,1]") {
    val c = TrainingOps3.queries("contamination_ngram_rate")(spark, sf)
    assert(c.filter(expr("doc_id % 50 = 0")).count() == 0)
    assert(c.filter(col("contam_rate") < 0 || col("contam_rate") > 1).count() == 0)
    assert(c.filter(col("n_contam") > col("n_grams")).count() == 0)
  }

  test("training order is a permutation: every doc exactly once, positions dense") {
    val o = TrainingOps3.queries("training_order")(spark, sf)
    val n = Tables.documents(spark, sf).count()
    val agg = o.agg(count(lit(1)), countDistinct("shuffle_pos"),
      min("shuffle_pos"), max("shuffle_pos")).collect()(0)
    assert(agg.getLong(0) == n && agg.getLong(1) == n)
    assert(agg.getLong(2) == 0L && agg.getLong(3) == n - 1)
  }

  test("shard plan covers every doc and spreads the load") {
    val sp = TrainingOps3.queries("shard_plan")(spark, sf).collect()
    val total = sp.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sf).count())
    assert(sp.length == 16, s"expected 16 hash shards, got ${sp.length}")
    val counts = sp.map(_.getLong(1))
    assert(counts.max < counts.min * 4L,
      s"hash shards badly skewed: min ${counts.min} max ${counts.max}")
  }

  test("quality terciles partition each source into three non-overlapping bands") {
    val t = TrainingOps3.queries("quality_terciles")(spark, sf).collect()
      .groupBy(_.getString(0))
    for ((src, rows) <- t) {
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3), s"$src missing a tercile")
      val sorted = rows.sortBy(_.getInt(1))
      for (w <- sorted.sliding(2); if w.length == 2)
        assert(w(0).getLong(4) <= w(1).getLong(3), // hi(k) <= lo(k+1)
          s"$src tercile bands overlap: ${w(0).getLong(4)} > ${w(1).getLong(3)}")
    }
  }

  test("oov counts bounded by token counts; benchmark-free vocab is top-20") {
    val v = TrainingOps3.queries("vocab_oov_rate")(spark, sf)
    assert(v.filter(col("n_oov") > col("n_tokens")).count() == 0)
    // rates average well below 1: the top-20 vocab of a zipfy corpus
    // must cover a meaningful token share
    val mean = v.agg(avg("oov_rate")).collect()(0).getDouble(0)
    assert(mean < 0.9, s"top-20 vocab covers almost nothing (mean oov $mean)")
  }
}
