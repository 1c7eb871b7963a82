package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY.md §2.1):
  *
  *  - S2 dimension bulk load — line file → (id = line number, key), the
  *    reference's `LogGenerator.java:98-124` CSV→CRUD-proc load;
  *  - S4/S6 columnar at-rest store — partitioned sink + scan-back with
  *    partition pruning (the Avro→Pig→Parquet hop collapses into one
  *    `write.partitionBy`, SURVEY S6);
  *  - ORC/CSV/JSON round trips — alternate formats through the same
  *    DataFrame contract.
  *
  * Round-trip queries write to a temp dir and read back through the
  * real datasource — the sink IS the thing under test; aggregates over
  * the scan-back are oracle-checked against the original table.
  */
object SourcesOps {
  type Q = (SparkSession, String) => DataFrame

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** S2: deterministic dimension ids — id = position in key order (the
    * reference's "line number" with a sorted input file). */
  def dimFromKeys(keys: DataFrame): DataFrame = {
    val w = Window.orderBy("key")
    keys.distinct()
      .withColumn("id", (row_number().over(w) - 1).cast("long"))
      .select("id", "key")
  }

  /** Small-file compaction for a hive-partitioned parquet sink: each
    * `col=value` partition directory is rewritten to `numFiles` files
    * via a temp-dir + atomic-rename swap (crash leaves the old or the
    * new partition fully live, mirroring VersionedStore's contract).
    * Returns (partition, filesBefore, filesAfter).
    *
    * Scale note: streaming micro-batch sinks accrete one file per
    * (trigger × partition); at 100 TB the read-side cost is file-open
    * overhead and non-contiguous scans, so compaction runs as a
    * periodic maintenance pass per partition — O(partition data), and
    * partitions compact independently (embarrassingly parallel across
    * a cluster).
    *
    * `minFilesToCompact` is the maintenance trigger: partitions below
    * the threshold are left untouched (and unreported), so a periodic
    * pass only pays rewrite I/O where fragmentation actually built up. */
  def compactPartitions(spark: SparkSession, sinkDir: String,
                        numFiles: Int = 1,
                        minFilesToCompact: Int = 0): Seq[(String, Int, Int)] = {
    val root = new java.io.File(sinkDir)
    // SELF-HEAL FIRST, driven by the TRASH dirs — not by the live
    // partition listing: after a crash between the swap's two renames
    // the live dir is ABSENT, so a heal keyed off existing live dirs
    // would never see that partition and its only copy would rot in
    // the hidden trash forever (or worse: a later append could
    // recreate the live dir with only new files, after which a
    // live-keyed heal would "clean up" the trash and permanently lose
    // every pre-crash row). Three states, all repaired:
    //  - live absent            -> restore trash to live (atomic);
    //  - live has a non-batch   -> the swap completed (the compacted
    //    data file                 part-* file holds every trash row)
    //                              and the trash is a duplicate: drop;
    //  - live has ONLY b*.parquet batch appends -> an append recreated
    //    the dir post-crash; the trash holds the only copy of the
    //    pre-crash rows: merge its files in (part-* names never
    //    collide with b<id>.parquet), then drop the empty trash.
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".compact_trash_"))
      .foreach { trash =>
        val live = new java.io.File(root, trash.getName.stripPrefix(".compact_trash_"))
        val liveData = Option(live.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        if (!live.exists())
          java.nio.file.Files.move(trash.toPath, live.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        else if (liveData.exists(!_.getName.matches("b\\d+\\.parquet")))
          VersionedStore.deleteRecursive(trash)
        else {
          Option(trash.listFiles()).getOrElse(Array.empty)
            .filter(_.isFile).foreach { f =>
              java.nio.file.Files.move(f.toPath,
                live.toPath.resolve(f.getName),
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          VersionedStore.deleteRecursive(trash)
        }
      }
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      // hidden dirs (.compact_tmp_*/.compact_trash_* from a crashed
      // pass, .staging_* from index appends) are maintenance state,
      // not partitions — without this exclusion a leftover trash dir
      // would itself be "compacted"
      .filter(f => f.isDirectory && f.getName.contains("=") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    parts.toSeq.flatMap { p =>
      def dataFiles(dir: java.io.File): Int =
        Option(dir.listFiles()).getOrElse(Array.empty)
          .count(f => f.isFile && f.getName.endsWith(".parquet"))
      val before = dataFiles(p)
      if (before < minFilesToCompact) None
      else {
        val trashDir = new java.io.File(root, s".compact_trash_${p.getName}")
        val tmpDir = new java.io.File(root, s".compact_tmp_${p.getName}")
        spark.read.parquet(p.getAbsolutePath)
          .repartition(numFiles)
          .write.mode("overwrite").parquet(tmpDir.getAbsolutePath)
        // drop the _SUCCESS marker; the partition dir holds data files only
        new java.io.File(tmpDir, "_SUCCESS").delete()
        // swap by TWO ATOMIC RENAMES, never a delete of live data: at
        // every instant the partition's rows exist in exactly one
        // complete directory (live, trash, or tmp), so a crash anywhere
        // in this sequence is repaired by the self-heal above on the
        // next invocation. (The previous delete-then-rename left a
        // crash window where the only copy was the hidden tmp dir —
        // invisible to readers and never restored.) A reader listing in
        // the two-rename gap can transiently miss the partition — a
        // window of two rename syscalls, vs the old O(files) delete.
        java.nio.file.Files.move(p.toPath, trashDir.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        java.nio.file.Files.move(tmpDir.toPath, p.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        VersionedStore.deleteRecursive(trashDir)
        Some((p.getName, before, dataFiles(p)))
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // sink maintenance — fragment the partitioned sink into many small
    // files (a streaming sink's natural state), compact each partition
    // to one file in place, and prove the scan-back is unchanged
    // (oracle = the same aggregate straight off the source table)
    "compact_roundtrip" -> ((s, d) => {
      val dir = tmp("graft_compact")
      Tables.events(s, d).repartition(40)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      compactPartitions(s, dir, numFiles = 1)
      s.read.parquet(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("value_sum"))
        .orderBy("event_type")
    }),
    // S2 — dim load via a real CSV round trip: distinct keys → csv file
    // → read back → line-number ids
    "dim_load_csv" -> ((s, d) => {
      val dir = tmp("graft_dim")
      Tables.events(s, d).select(col("event_type").as("key")).distinct()
        .coalesce(1).sort("key")
        .write.mode("overwrite").option("header", "true").csv(dir)
      val back = s.read.option("header", "true").csv(dir)
      dimFromKeys(back).orderBy("id")
    }),

    // S4/S6 — partitioned parquet sink: write events partitioned by
    // event_type, scan back, per-partition counts. The scan-back prunes
    // partitions for type-filtered queries (spec-checked).
    "partitioned_sink_roundtrip" -> ((s, d) => {
      val dir = tmp("graft_sink")
      Tables.events(s, d)
        .write.mode("overwrite").partitionBy("event_type").parquet(dir)
      s.read.parquet(dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("value_sum"))
        .orderBy("event_type")
    }),

    // ORC round trip
    "orc_roundtrip" -> ((s, d) => {
      val dir = tmp("graft_orc")
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag")
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // S6 — REAL Avro round trip (the reference's export format,
    // deployment-hadoop.xml.template:5-10 / harvest.pig:25): standard
    // Avro object-container files written and re-read with the Avro
    // Java API ([[AvroIO]] — no spark-avro datasource in the sandbox,
    // but avro itself ships on Spark's classpath). The oracle reads the
    // SOURCE table, so a hash match proves the full encode→container→
    // decode trip preserves longs, strings, doubles, and µs timestamps.
    "avro_roundtrip" -> ((s, d) => {
      val dir = tmp("graft_avro")
      val src = Tables.orders(s, d)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .filter(col("o_orderkey") % 100 === 0)
      AvroIO.write(src, dir)
      AvroIO.read(s, dir, src.schema)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_date_str"))
        .orderBy("o_orderkey")
    }),

    // CSV round trip (the reference's dimension-load wire format, S2) —
    // full documents table incl. free text through the quoting/escape
    // path; the oracle reads the SOURCE table, so a hash match proves
    // header+quote+parse round-trips every row byte-identically
    "csv_roundtrip" -> ((s, d) => {
      val dir = tmp("graft_csv")
      Tables.documents(s, d)
        .write.mode("overwrite").option("header", "true").csv(dir)
      s.read.option("header", "true")
        .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .csv(dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // JSON round trip (the HTTP API's wire format, S10)
    "json_roundtrip" -> ((s, d) => {
      val dir = tmp("graft_json")
      Tables.nation(s, d).write.mode("overwrite").json(dir)
      s.read.json(dir)
        .select(col("n_nationkey").cast("int").as("n_nationkey"),
          col("n_name"), col("n_regionkey").cast("int").as("n_regionkey"))
        .orderBy("n_nationkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "dim_load_csv" ->
      """SELECT row_number() OVER (ORDER BY key) - 1 AS id, key
        |FROM (SELECT DISTINCT event_type AS key FROM events)
        |ORDER BY id""".stripMargin,

    "partitioned_sink_roundtrip" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // compaction must be invisible to readers: same aggregate as the
    // uncompacted sink, straight off the source table
    "compact_roundtrip" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin,

    "json_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,

    "avro_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date_str
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin
  )
}
