package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The probe-vs-swap transient-miss window: a plain `spark.read` that
  * lists a sink root while one partition is between compaction's two
  * renames silently misses that partition — an under-retrieval with no
  * error. [[SourcesOps.readConsistent]] closes it by verifying the
  * listing against the live∪trash partition set (invariant through a
  * swap). This spec hammers reads CONCURRENTLY with a continuous
  * compaction loop and asserts zero short-counted results.
  *
  * The whole exercise runs through an explicit `file://`-schemed path,
  * so the protocol path under test is the Hadoop-FS one ([[Dfs]]) end
  * to end — the same code that runs against HDFS at the 100 TB design
  * point — not a java.io fast path.
  */
class CompactProbeRaceSpec extends SparkSpec {

  test("probes concurrent with a compaction loop never short-count") {
    import spark.implicits._
    val dir = "file://" +
      java.nio.file.Files.createTempDirectory("graft_race").toString + "/sink"
    val expected = 4000L
    (0L until expected).map(i => (i, s"k${i % 8}")).toDF("id", "k")
      .repartition(5) // several files per partition: passes always rewrite
      .write.mode("overwrite").partitionBy("k").parquet(dir)

    @volatile var stop = false
    @volatile var compactorErr: Throwable = null
    val passCount = new java.util.concurrent.atomic.AtomicInteger()
    def passes = passCount.get()
    val compactor = new Thread(() => {
      try while (!stop) {
        // minFilesToCompact=0: every pass swaps every partition, so the
        // two-rename windows recur continuously under the reader
        SourcesOps.compactPartitions(spark, dir, numFiles = 1,
          minFilesToCompact = 0)
        passCount.incrementAndGet()
      } catch { case t: Throwable => compactorErr = t }
    }, "graft-race-compactor")
    compactor.start()

    var checks = 0
    var loudRetries = 0
    // adaptive window: enough interleaving to claim coverage, bounded
    // hard so a loaded suite box can't hang the test
    val deadline = System.nanoTime() + 60L * 1000000000L
    try while ((checks < 15 || passes < 4) &&
               System.nanoTime() < deadline && compactorErr == null) {
      // the contract under test is NO SILENT SHORT COUNT. A LOUD
      // failure (a task opening a file the swap just replaced —
      // standard file-table semantics when maintenance rewrites data
      // mid-query) is visible to the caller and retried here, exactly
      // as a production probe would.
      try {
        val n = SourcesOps.readConsistent(spark, dir).count()
        assert(n == expected,
          s"SILENT short count: $n of $expected after $checks clean checks")
        checks += 1
      } catch {
        case t: Throwable if SourcesOps.isFnf(t) => loudRetries += 1
      }
    } finally {
      stop = true
      compactor.join(30000)
    }
    if (compactorErr != null) throw compactorErr
    // the final-state asserts below read the sink at rest; if the
    // compactor is STILL mid-pass after the join budget (a box that
    // slow), grading a moving target would be a flake, not a finding
    if (compactor.isAlive)
      cancel("compactor still mid-pass after 30 s join — box too slow " +
        "to grade the final state (every read that ran was graded)")
    info(s"$checks consistent reads against $passes compaction passes " +
      s"($loudRetries loud mid-rewrite retries)")
    // coverage floors only bind when the loop ended by reaching its
    // targets; if the 60-s deadline ended it first on a pathologically
    // slow box, the consistency asserts above still graded every read
    // that DID run — cancel (don't fail) on insufficient interleaving
    if (checks < 10 || passes < 3)
      cancel(s"box too slow to exercise the race in 60 s: " +
        s"$checks checks / $passes passes (no inconsistency observed)")
    // the loop must end in a clean state: no trash or tmp leftovers
    val leftovers = Dfs.list(Dfs.path(dir))
      .map(_.getPath.getName).filter(_.startsWith(".compact_"))
    assert(leftovers.isEmpty, s"maintenance state leaked: $leftovers")
    assert(spark.read.parquet(dir).count() == expected)
  }
}
