package graft.sources

import org.apache.spark.sql.DataFrame

/** At-rest bucketed layout for the export stream — the durable
  * analogue of the reference's `PARTITION TABLE events ON COLUMN src`
  * (`/root/reference/db/ddl.sql:73`): every micro-batch appends into a
  * table bucketed + sorted on the routing key, so downstream fact-fact
  * joins and per-key aggregations read co-located buckets with NO
  * shuffle (see BucketingSpec / BucketedExportSpec).
  *
  * At 100 TB the one-time bucket write replaces a per-query exchange of
  * the full fact table — the dominant network cost — with a local merge
  * per bucket. Bucket count is a table-lifetime choice: size it to
  * target-cluster parallelism (e.g. 2-4× executor cores), not to the
  * writing job's.
  */
object BucketedSink {

  /** Append `df` into bucketed table `table` (created on first use;
    * Spark validates the bucket spec matches on every append). Call
    * from `foreachBatch` for streaming, or directly for batch loads. */
  def appendBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("append")
      .format("parquet")
      .saveAsTable(table)
}
