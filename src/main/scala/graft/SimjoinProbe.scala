package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe: stage-level cost breakdown for simjoin_prefix_filter —
  * `runMain graft.SimjoinProbe <sfDir>`. */
object SimjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val tauPpm = operators.SelectionOps.JaccardTauPpm
    val docs = Tables.documents(spark, sfDir)
    val arrs = t("shingle arrays (checkpoint)") {
      operators.DedupOps.docShingleArrays(docs)
        .filter(size(col("ghs")) > 0).localCheckpoint(true)
    }
    println(s"[probe] docs with shingles: ${arrs.count()}")
    val ex = arrs.select(col("doc_id"), col("n"), explode(col("ghs")).as("gh"))
    println(s"[probe] total grams: ${t("explode count")(ex.count())}")
    val dfr = ex.groupBy("gh").agg(count(lit(1)).as("df"))
    val pref = t("prefix tier (checkpoint)") {
      ex.join(dfr, "gh")
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("gh"))))
        .filter(col("rk") <= expr(s"n - (($tauPpm * n + 999999) div 1000000) + 1"))
        .select(col("doc_id"), col("gh"), col("n"), col("rk"))
        .localCheckpoint(true)
    }
    println(s"[probe] prefix entries: ${pref.count()}")
    val cands = t("distinct candidates (ppjoin bound)") {
      pref.as("x").join(pref.as("y"), "gh")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .filter(least(col("x.n") - col("x.rk"), col("y.n") - col("y.rk")) + 1 >=
          expr(s"($tauPpm * (x.n + y.n) + ${1000000 + tauPpm} - 1) div ${1000000 + tauPpm}"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().localCheckpoint(true)
    }
    println(s"[probe] distinct candidates: ${cands.count()}")
    val out = t("verify join") {
      cands
        .join(arrs.select(col("doc_id").as("doc_a"), col("ghs").as("wa"),
          col("n").as("na")), "doc_a")
        .join(arrs.select(col("doc_id").as("doc_b"), col("ghs").as("wb"),
          col("n").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("wa"), col("wb"))).cast("long").as("i"),
          (col("na") + col("nb")).as("s"))
        .withColumn("jac_ppm", expr("i * 1000000 div (s - i)"))
        .filter(col("jac_ppm") >= tauPpm).count()
    }
    println(s"[probe] result pairs: $out")
    spark.stop()
  }
}
