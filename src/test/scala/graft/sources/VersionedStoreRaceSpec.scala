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

  // child JVM = same java, same classpath, same --add-opens set the
  // forked test JVM runs with (Spark on JDK 17 needs them)
  private val javaBin = s"${System.getProperty("java.home")}/bin/java"
  // the flags come in BOTH forms: single-token "--add-opens=m=A" and
  // two-token "--add-opens", "m=A" (build.sbt uses the latter) — a
  // flag-only filter would drop the module values and the child java
  // would die at launch
  private def addOpens: Vector[String] = {
    val parentArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toVector
    parentArgs.zipWithIndex.flatMap { case (a, i) =>
      if (a == "--add-opens" || a == "--add-exports")
        Seq(a, parentArgs(i + 1))
      else if (a.startsWith("--add-opens=") || a.startsWith("--add-exports=")) Seq(a)
      else Nil
    }
  }

  private def launchChild(work: java.nio.file.Path, root: String,
                          barrier: java.nio.file.Path, writerId: Int,
                          publishes: Int, mode: Seq[String] = Nil): (Process, java.io.File) = {
    val log = work.resolve(s"child_$writerId.log").toFile
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.sources.VersionedStoreRaceChild",
      root, writerId.toString, publishes.toString, barrier.toString) ++ mode)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.redirectOutput(log)
    (pb.start(), log)
  }

  private def awaitFile(p: java.nio.file.Path, timeoutMs: Long = 120000)(onFail: => Nothing): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!java.nio.file.Files.exists(p)) {
      if (System.currentTimeMillis() >= deadline) onFail
      Thread.sleep(50)
    }
  }

  test("two JVMs racing publish: unique versions, complete payloads, no torn reads") {
    val work = java.nio.file.Files.createTempDirectory("graft_vsrace")
    val root = "file://" + work.resolve("store")
    val barrier = work.resolve("barrier")
    java.nio.file.Files.createDirectories(barrier)

    val children = Seq(
      launchChild(work, root, barrier, 1, PublishesPerChild),
      launchChild(work, root, barrier, 2, PublishesPerChild))
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

  test("vacuum never destroys a stalled cross-process publisher overtaken by racing commits") {
    val work = java.nio.file.Files.createTempDirectory("graft_vsstall")
    val root = "file://" + work.resolve("store")
    val barrier = work.resolve("barrier")
    java.nio.file.Files.createDirectories(barrier)
    import spark.implicits._

    VersionedStore.publish((1 to 10).toDF("x"), root) // v1, live
    // the stalled publisher: claims the next number, then parks between
    // allocation and write (the onClaimed seam) until `resume`
    val (child, log) = launchChild(work, root, barrier, 3, 1, Seq("stall"))
    try {
      def childDied(): Nothing = {
        child.destroyForcibly()
        fail("stalled child never progressed: " +
          new String(java.nio.file.Files.readAllBytes(log.toPath)))
      }
      awaitFile(barrier.resolve("ready_3"))(childDied())
      java.nio.file.Files.write(barrier.resolve("go"), Array.emptyByteArray)
      awaitFile(barrier.resolve("claimed_3"))(childDied())
      val claimed = new String(
        java.nio.file.Files.readAllBytes(barrier.resolve("claimed_3"))).trim.toInt
      assert(claimed == 2, s"stalled child should have claimed v2, got v$claimed")

      // two racing commits overtake the stalled number: live=4, so with
      // keep=0 the stalled v2 falls under the vacuum cutoff (3)
      VersionedStore.publish((1 to 20).toDF("x"), root) // v3
      VersionedStore.publish((1 to 30).toDF("x"), root) // v4
      val dropped = VersionedStore.vacuum(root, keep = 0)
      assert(dropped == Seq("v00001", "v00003"),
        s"vacuum must sweep exactly the committed history: $dropped")
      val names = Dfs.list(Dfs.path(root)).map(_.getPath.getName)
      assert(names.contains(".claim_v00002"),
        s"vacuum deleted the stalled publisher's claim mid-publish: $names")

      // release the stalled publisher: it writes v2 and commits CURRENT
      java.nio.file.Files.write(barrier.resolve("resume"), Array.emptyByteArray)
      assert(child.waitFor() == 0,
        s"stalled child failed: ${new String(java.nio.file.Files.readAllBytes(log.toPath))}")
      // the store must expose the COMPLETE late-committed version —
      // never a torn one (rows encode writer 3, seq 1 => 301)
      assert(VersionedStore.currentVersion(root).contains(2))
      assert(VersionedStore.read(spark, root).count() == 301,
        "late commit after an overtaking vacuum must resolve to the complete version")
    } finally {
      if (child.isAlive) child.destroyForcibly()
    }
  }
}
