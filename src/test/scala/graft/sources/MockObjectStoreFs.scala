package graft.sources

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** Crash-point controls for [[MockObjectStoreFs]] (one JVM = one test
  * process, so statics reach the filesystem instance wherever Hadoop's
  * cache constructed it). All hooks are ONE-SHOT: firing disarms them,
  * so the heal pass that runs after an injected crash sees a quiet
  * filesystem, exactly like a process restart.
  *
  * `plan(srcFile, dstFile)` is consulted before each per-file copy
  * inside a rename: return -1 to let the copy run, 0 to crash before
  * the first byte, n>0 to crash after exactly n bytes (leaving a
  * truncated destination — the partial-copy state a real object
  * store's interrupted multipart copy exposes). `crashBeforeDelete`
  * is consulted once per rename after ALL copies complete: true
  * crashes before the source delete, leaving identical trees on both
  * sides — the duplicate-shape crash. */
object MockFsCrash {
  final class InjectedCrash(msg: String) extends RuntimeException(msg)

  @volatile var plan: (String, String) => Long = null
  @volatile var crashBeforeDelete: (String, String) => Boolean = null
  @volatile var fired: Int = 0

  def disarm(): Unit = { plan = null; crashBeforeDelete = null; fired = 0 }

  private[sources] def fire(what: String): Nothing = {
    plan = null; crashBeforeDelete = null; fired += 1
    throw new InjectedCrash(s"injected crash: $what")
  }
}

object MockObjectStoreFs {
  /** Constant (never an instance field): RawLocalFileSystem's own
    * constructor qualifies its working directory through getUri before
    * any subclass field initializer has run. */
  val Uri: URI = URI.create("mock:///")
}

/** Test-only Hadoop filesystem modelling an OBJECT STORE's rename:
  * copy-then-delete, file by file in name order, never atomic — with
  * injectable crash points ([[MockFsCrash]]). Registered under the
  * `mock:` scheme (`fs.mock.impl` / `fs.AbstractFileSystem.mock.impl`);
  * bytes land on the local disk at the path's own location (the
  * RawLocal mapping ignores the scheme), so mock and file views of the
  * same directory agree and specs can hand-inspect state.
  *
  * This converts [[Dfs]]'s documented `s3a:`-class semantics ("rename
  * is copy+delete, NOT atomic; readers can observe a partially-renamed
  * directory") from prose into an executable filesystem the
  * maintenance protocols run through — see `MockObjectStoreSpec`. */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = MockObjectStoreFs.Uri

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    if (exists(dst)) {
      // FileSystem contract: renaming onto an existing DIRECTORY moves
      // the source under it; onto an existing file, the rename fails
      // (the OVERWRITE paths delete the destination before calling us)
      if (getFileStatus(dst).isDirectory)
        return rename(src, new Path(dst, src.getName))
      return false
    }
    copyRecursive(src, dst)
    val cbd = MockFsCrash.crashBeforeDelete
    if (cbd != null && cbd(src.toString, dst.toString))
      MockFsCrash.fire(s"between copy and delete of $src -> $dst")
    super.delete(src, true)
    true
  }

  /** Name-ordered recursive copy — deterministic interleavings, so a
    * spec's crash predicate selects an exact partial state. */
  private def copyRecursive(src: Path, dst: Path): Unit = {
    if (getFileStatus(src).isDirectory) {
      mkdirs(dst)
      listStatus(src).sortBy(_.getPath.getName).foreach { c =>
        copyRecursive(c.getPath, new Path(dst, c.getPath.getName))
      }
    } else {
      val p = MockFsCrash.plan
      val limit = if (p == null) -1L else p(src.toString, dst.toString)
      if (limit == 0L) MockFsCrash.fire(s"before copying $src -> $dst")
      val in = open(src)
      try {
        val out = create(dst, true)
        var copied = 0L
        var crashed = false
        try {
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0 && !crashed) {
            val allowed =
              if (limit > 0 && copied + n > limit) (limit - copied).toInt else n
            out.write(buf, 0, allowed)
            copied += allowed
            if (limit > 0 && copied >= limit) crashed = true
            else n = in.read(buf)
          }
        } finally out.close()
        if (crashed)
          MockFsCrash.fire(s"mid-copy of $src -> $dst after $copied bytes")
      } finally in.close()
    }
  }
}

/** FileContext binding for the `mock:` scheme, so [[Dfs.renameOverwrite]]'s
  * non-local path (AbstractFileSystem OVERWRITE rename = delete target,
  * then the non-atomic copy+delete) runs against the mock store too. */
class MockAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockObjectStoreFs, conf, "mock", false)
