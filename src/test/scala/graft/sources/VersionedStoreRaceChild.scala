package graft.sources

import org.apache.spark.sql.SparkSession

/** Child JVM for [[VersionedStoreRaceSpec]] — a REAL separate process
  * (the in-JVM racing-publisher test serializes on the root's intern'd
  * lock by construction, so only a second JVM exercises the
  * cross-process half of [[VersionedStore.publish]]'s contract).
  *
  * Protocol: write `ready_<id>` into the barrier dir once Spark is up,
  * spin until the parent drops `go` (so the two children's publishes
  * actually overlap), then publish `n` versions whose row counts
  * encode (writer, seq) and print one `PUBLISHED id seq version rows`
  * line per commit for the parent to audit.
  *
  * `stall` mode (5th arg): one publish that STALLS between version
  * allocation and the version write (the [[VersionedStore.onClaimed]]
  * seam) — drops `claimed_<id>` for the parent, then waits for
  * `resume`. The parent overtakes the stalled number with racing
  * commits and runs vacuum in the gap: the vacuum/in-flight-publish
  * fence is only observable across real processes. */
object VersionedStoreRaceChild {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val writerId = args(1).toInt
    val n = args(2).toInt
    val barrier = args(3)
    val stall = args.length > 4 && args(4) == "stall"
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"vstore-race-$writerId")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$barrier/ready_$writerId"), Array.emptyByteArray)
    val go = java.nio.file.Paths.get(s"$barrier/go")
    val deadline = System.currentTimeMillis() + 120000
    while (!java.nio.file.Files.exists(go)) {
      if (System.currentTimeMillis() > deadline) sys.exit(3)
      Thread.sleep(20)
    }
    if (stall) {
      VersionedStore.onClaimed = v => {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$barrier/claimed_$writerId"),
          v.toString.getBytes("UTF-8"))
        val resume = java.nio.file.Paths.get(s"$barrier/resume")
        val d2 = System.currentTimeMillis() + 120000
        while (!java.nio.file.Files.exists(resume)) {
          if (System.currentTimeMillis() > d2) sys.exit(4)
          Thread.sleep(20)
        }
      }
    }
    (1 to n).foreach { i =>
      val rows = writerId * 100 + i
      val v = VersionedStore.publish((1 to rows).toDF("x"), root)
      // println goes to the parent-captured log; flush per line so a
      // child crash still leaves the completed commits auditable
      println(s"PUBLISHED $writerId $i $v $rows")
      System.out.flush()
    }
    spark.stop()
  }
}
