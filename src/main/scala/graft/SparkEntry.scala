package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.ml.MLOps
import graft.sources.SourcesOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the operator registry: every SURVEY.md §2 operator (and
  * the training-data-pipeline extensions) contributes a named query;
  * SQL-expressible ones also carry a DuckDB oracle for the driver's
  * correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full NewEvent hot path (SURVEY.md §3.1) as one query:
    * dim enrichment → k-means scoring → 30-s session export gate. */
  def entry(spark: SparkSession): DataFrame =
    IngestOps.queries("ingest_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ClickstreamOps.queries ++
      RelationalOps.queries ++
      FunctionOps.queries ++
      TextOps.queries ++
      DedupOps.queries ++
      SimilarityOps.queries ++
      MLOps.queries ++
      MediaOps.queries ++
      SourcesOps.queries ++
      IngestOps.queries ++
      ApproxOps.queries ++
      RelationalOps2.queries ++
      RelationalOps3.queries ++
      RelationalOps4.queries ++
      TextOps2.queries ++
      TextOps3.queries ++
      TextOps4.queries ++
      TextOps5.queries ++
      PiiOps.queries ++
      EmbeddingAnalysis.queries ++
      TrainingOps.queries ++
      TrainingOps2.queries ++
      TrainingOps3.queries ++
      TrainingOps4.queries ++
      TrainingOps5.queries ++
      GraphOps.queries ++
      AnalyticsOps3.queries ++
      SimilarityOps2.queries ++
      SimilarityOps3.queries ++
      RelationalOps5.queries ++
      RelationalOps6.queries ++
      CdcOps.queries ++
      TemporalJoinOps.queries ++
      AnalyticsOps.queries ++
      AnalyticsOps2.queries ++
      SetOps.queries ++
      PipelineOps.queries ++
      RetrievalOps.queries ++
      SelectionOps.queries ++
      RelationalOps7.queries ++
      RelationalOps8.queries ++
      FunctionOps2.queries ++
      FunctionOps3.queries ++
      SelectionOps2.queries ++
      TextOps6.queries ++
      PiiOps2.queries ++
      graft.sources.SourcesOps2.queries ++
      SpanDedupOps.queries ++
      AudioOps.queries ++
      AnalyticsOps4.queries ++
      TrainingOps6.queries ++
      TrainingOps7.queries ++
      graft.sources.EventGen.queries ++
      graft.procs.SystemProcs.queries ++
      TrainingOps8.queries ++
      RelationalOps9.queries ++
      GovernanceOps.queries ++
      AnalyticsOps5.queries ++
      RetrievalOps2.queries ++
      TextOps7.queries ++
      PlanningOps.queries ++
      AnnEval.queries ++
      BitextOps.queries

  /** DuckDB equivalents for the driver's oracle compare. Queries absent
    * here (minhash/simhash/LSH/IVF/trained-kmeans/decode-stub) are not
    * SQL-expressible; the driver records a rows-only check and their
    * semantics are spec-tested in src/test instead. */
  def oracleSql: Map[String, String] =
    ClickstreamOps.oracles ++
      RelationalOps.oracles ++
      FunctionOps.oracles ++
      TextOps.oracles ++
      DedupOps.oracles ++
      SimilarityOps.oracles ++
      MLOps.oracles ++
      MediaOps.oracles ++
      SourcesOps.oracles ++
      IngestOps.oracles ++
      ApproxOps.oracles ++
      RelationalOps2.oracles ++
      RelationalOps3.oracles ++
      RelationalOps4.oracles ++
      TextOps2.oracles ++
      TextOps3.oracles ++
      TextOps4.oracles ++
      TextOps5.oracles ++
      PiiOps.oracles ++
      EmbeddingAnalysis.oracles ++
      TrainingOps.oracles ++
      TrainingOps2.oracles ++
      TrainingOps3.oracles ++
      TrainingOps4.oracles ++
      TrainingOps5.oracles ++
      GraphOps.oracles ++
      AnalyticsOps3.oracles ++
      SimilarityOps2.oracles ++
      SimilarityOps3.oracles ++
      RelationalOps5.oracles ++
      RelationalOps6.oracles ++
      CdcOps.oracles ++
      TemporalJoinOps.oracles ++
      AnalyticsOps.oracles ++
      AnalyticsOps2.oracles ++
      SetOps.oracles ++
      PipelineOps.oracles ++
      RetrievalOps.oracles ++
      SelectionOps.oracles ++
      RelationalOps7.oracles ++
      RelationalOps8.oracles ++
      FunctionOps2.oracles ++
      FunctionOps3.oracles ++
      SelectionOps2.oracles ++
      PiiOps2.oracles ++
      graft.sources.SourcesOps2.oracles ++
      SpanDedupOps.oracles ++
      AudioOps.oracles ++
      AnalyticsOps4.oracles ++
      TrainingOps6.oracles ++
      TrainingOps7.oracles ++
      TrainingOps8.oracles ++
      RelationalOps9.oracles ++
      GovernanceOps.oracles ++
      AnalyticsOps5.oracles ++
      RetrievalOps2.oracles ++
      TextOps7.oracles ++
      PlanningOps.oracles ++
      AnnEval.oracles ++
      BitextOps.oracles
      // EventGen has no oracle (JVM mixing is not SQL-expressible);
      // gen_events is distribution-checked in EventGenSpec
}
