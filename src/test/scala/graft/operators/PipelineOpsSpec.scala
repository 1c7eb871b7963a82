package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {

  test("curation funnel only shrinks each source's budget") {
    val kept = PipelineOps.queries("curation_pipeline_e2e")(spark, sf)
    val full = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("total_docs"),
        sum(size(split(col("text"), " ", -1)).cast("long")).as("total_tokens"))
    val bad = kept.join(full, "source")
      .filter(col("n_docs") > col("total_docs") ||
        col("n_tokens") > col("total_tokens")).count()
    assert(bad == 0, "curation emitted more than the source contains")
    assert(kept.count() > 0, "curation dropped everything")
  }

  test("table profile stats are internally consistent") {
    val p = PipelineOps.queries("table_profile")(spark, sf).collect()
    assert(p.length == 4)
    for (r <- p) {
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)}: nonnull > n")
      assert(r.getLong(3) <= r.getLong(2), s"${r.getString(0)}: distinct > nonnull")
      if (!r.isNullAt(4)) assert(r.getLong(4) <= r.getLong(5),
        s"${r.getString(0)}: min > max")
    }
    // o_orderkey is the PK: fully distinct
    val pk = p.find(_.getString(0) == "o_orderkey").get
    assert(pk.getLong(3) == pk.getLong(1), "o_orderkey not unique in profile")
  }
}
