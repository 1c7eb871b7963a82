package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema evolution at the table boundary: a long-lived at-rest table
  * accretes columns over its lifetime (new enrichment fields, new
  * telemetry), and old files must stay readable next to new ones.
  * Parquet + `mergeSchema` resolves the union schema at read time and
  * null-fills the columns absent from older files — the evolution
  * story a 100 TB append-forever sink needs (no rewrite of history;
  * schema resolution is a footer-only operation per file).
  */
object SourcesOps2 {
  type Q = (SparkSession, String) => DataFrame

  /** Two-generation layout, materialized ONCE per data dir and reused:
    * the query lambda is invoked repeatedly by verify/bench (bench runs
    * it 10×), and a fresh temp dir + two write jobs per invocation both
    * leaks directories and folds write I/O into a read-path timing.
    * The layout is the fixture; only the mergeSchema READ is the op. */
  private val evolveLayouts =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def evolveLayout(s: SparkSession, d: String): String =
    evolveLayouts.computeIfAbsent(d, _ => {
      val out = java.nio.file.Files.createTempDirectory("graft_evolve")
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(out).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      val nation = Tables.nation(s, d)
      nation.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(s"$out/gen=1")
      nation.filter(col("n_nationkey") >= 10)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").parquet(s"$out/gen=2")
      out.toString
    })

  val queries: Map[String, Q] = Map(
    // generation 1 writes (n_nationkey, n_name); generation 2 adds
    // n_regionkey; the merged read sees the union schema with nulls
    // for generation-1 rows
    "schema_evolution_read" -> ((s, d) => {
      val out = evolveLayout(s, d)
      s.read.option("mergeSchema", "true").parquet(out)
        .select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"), col("gen").cast("long").as("gen"))
        .orderBy("n_nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "schema_evolution_read" ->
      """SELECT n_nationkey, n_name,
        |       CASE WHEN n_nationkey >= 10 THEN n_regionkey END AS n_regionkey,
        |       CAST(CASE WHEN n_nationkey >= 10 THEN 2 ELSE 1 END AS BIGINT) AS gen
        |FROM nation ORDER BY n_nationkey""".stripMargin
  )
}
