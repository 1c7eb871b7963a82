package graft.sources

import graft.SparkSpec

import scala.jdk.CollectionConverters._

/** Cross-PROCESS VersionedStore race — two actual JVMs publishing
  * concurrently to one store root (the reference's LoadDsa
  * transactional-swap guarantee, `db/ddl.sql:31-43`, is cross-process
  * by nature: separate loader invocations hit one database).
  *
  * The in-JVM racing test in [[DfsProtocolSpec]] exercises only the
  * temp-file atomicity of the pointer write; the intern'd-lock
  * serialization in `publish` makes same-JVM allocation races
  * unreachable. This spec launches two child JVMs (real
  * `ProcessBuilder` processes with their own SparkSessions), releases
  * them through a file barrier so their publishes overlap, and
  * asserts the full cross-process contract:
  *
  *  - version ALLOCATION never collides (the `.claim_vNNNNN`
  *    O_EXCL markers) — every published version number is unique
  *    across both processes;
  *  - every publish lands COMPLETE — each reported version dir reads
  *    back with exactly the row count its writer encoded;
  *  - a concurrent reader NEVER observes a torn pointer (every
  *    CURRENT read matches `v\d{5}`) and never torn data (every
  *    resolved read returns a whole payload, i.e. a row count some
  *    writer actually committed);
  *  - the final pointer names one of the published versions
  *    (last-committer-wins over complete versions, per the contract).
  */
class VersionedStoreRaceSpec extends SparkSpec {

  private val PublishesPerChild = 4

  test("two JVMs racing publish: unique versions, complete payloads, no torn reads") {
    val work = java.nio.file.Files.createTempDirectory("graft_vsrace")
    val root = "file://" + work.resolve("store")
    val barrier = work.resolve("barrier")
    java.nio.file.Files.createDirectories(barrier)

    // child JVM = same java, same classpath, same --add-opens set the
    // forked test JVM runs with (Spark on JDK 17 needs them)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // the flags come in BOTH forms: single-token "--add-opens=m=A" and
    // two-token "--add-opens", "m=A" (build.sbt uses the latter) — a
    // flag-only filter would drop the module values and the child java
    // would die at launch
    val parentArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    val addOpens = parentArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports")
        Seq(a, parentArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports=")) Seq(a)
      else Nil
    }
    def launch(writerId: Int): (Process, java.io.File) = {
      val log = work.resolve(s"child_$writerId.log").toFile
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx2g", "-cp", System.getProperty("java.class.path"),
        "graft.sources.VersionedStoreRaceChild",
        root, writerId.toString, PublishesPerChild.toString, barrier.toString))
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(log)
      (pb.start(), log)
    }
    val children = Seq(launch(1), launch(2))
    try {
      // release both only once both Sparks are up, so publishes overlap
      val readyDeadline = System.currentTimeMillis() + 120000
      while (!Seq(1, 2).forall(i => java.nio.file.Files.exists(barrier.resolve(s"ready_$i")))) {
        // NOT assert(cond, clue): ScalaTest evaluates the clue argument
        // EAGERLY on every call, and this failure path has side effects
        // (it kills the children — which is exactly what happened when
        // this was a clue block: the first loop iteration SIGKILLed
        // both children before they could reach the barrier)
        if (System.currentTimeMillis() >= readyDeadline) {
          val states = children.map { case (p, _) =>
            if (p.isAlive) "alive" else s"exit=${p.exitValue()}" }
          children.foreach { case (p, _) => p.destroyForcibly() }
          fail(s"children never reached the barrier (states: $states): " +
            children.map(_._2).map(f => f + ":\n" +
              new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString("\n"))
        }
        Thread.sleep(50)
      }
      java.nio.file.Files.write(barrier.resolve("go"), Array.emptyByteArray)

      // concurrent reader: every pointer read complete, every resolved
      // read a whole payload — polls while the children race
      val legalCounts = (1 to PublishesPerChild).flatMap(i => Seq(100 + i, 200 + i)).map(_.toLong).toSet
      val readerErrs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!done.get()) {
          try {
            VersionedStore.currentVersion(root).foreach { _ =>
              val raw = Dfs.readString(Dfs.path(s"$root/CURRENT")).trim
              if (!raw.matches("v\\d{5}")) readerErrs.add(s"torn pointer: '$raw'")
              val n = VersionedStore.read(spark, root).count()
              if (!legalCounts.contains(n))
                readerErrs.add(s"torn data: read $n rows, legal: $legalCounts")
            }
          } catch {
            // a vacuumless store never unpublishes: any read error is a break
            case t: Throwable => readerErrs.add(s"reader threw: $t")
          }
          Thread.sleep(50)
        }
      })
      reader.start()
      val exits = children.map(_._1.waitFor())
      done.set(true)
      reader.join()

      val logs = children.map { case (_, f) =>
        new String(java.nio.file.Files.readAllBytes(f.toPath)) }
      assert(exits == Seq(0, 0), s"child exit codes $exits; logs:\n${logs.mkString("\n")}")
      assert(readerErrs.isEmpty, s"concurrent reader saw: ${readerErrs.asScala.toList}")

      // PUBLISHED id seq version rows
      val published = logs.flatMap(_.linesIterator)
        .filter(_.startsWith("PUBLISHED "))
        .map { l => val p = l.split(" "); (p(1).toInt, p(2).toInt, p(3).toInt, p(4).toInt) }
      assert(published.length == 2 * PublishesPerChild,
        s"expected ${2 * PublishesPerChild} publishes, saw: $published\nlogs:\n${logs.mkString("\n")}")
      val versions = published.map(_._3)
      assert(versions.distinct.length == versions.length,
        s"version allocation collided across processes: $published")
      // every publish landed complete — whole payload readable at rest
      published.foreach { case (id, seq, v, rows) =>
        val dir = f"$root/v$v%05d"
        assert(spark.read.parquet(dir).count() == rows,
          s"writer $id publish $seq (v$v) is not the complete $rows-row payload")
      }
      // final pointer: one of the published versions, complete
      val live = VersionedStore.currentVersion(root)
      assert(live.exists(versions.contains),
        s"final CURRENT $live is not a published version of $versions")
      assert(legalCounts.contains(VersionedStore.read(spark, root).count()))
    } finally {
      children.foreach { case (p, _) => if (p.isAlive) p.destroyForcibly() }
    }
  }
}
