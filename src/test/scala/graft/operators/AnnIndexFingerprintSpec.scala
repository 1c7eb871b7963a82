package graft.operators

import graft.SparkSpec

/** The default index cache's freshness key must work for SCHEMED
  * corpus dirs too: the old `java.io.File` walk silently saw nothing
  * behind `file://…` (or `hdfs://…`), collapsing every corpus state to
  * one degenerate fingerprint — so a regenerated corpus could be
  * served from a STALE cached index with no error. The fix walks
  * through the Hadoop FileSystem of the path's scheme and refuses an
  * empty walk loudly. */
class AnnIndexFingerprintSpec extends SparkSpec {

  private def corpus(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.write(d.resolve("part-00000.parquet"),
      "0123456789".getBytes("UTF-8"))
    d
  }

  test("schemed corpus dir fingerprints by content, not degenerately") {
    val d = corpus("graft_fp")
    val fpPlain1 = AnnIndex.fingerprint(d.toString)
    val fpSchemed1 = AnnIndex.fingerprint("file://" + d.toString)
    // regenerate the corpus: more bytes (length participates in the key)
    java.nio.file.Files.write(d.resolve("part-00000.parquet"),
      "01234567890123456789".getBytes("UTF-8"))
    val fpPlain2 = AnnIndex.fingerprint(d.toString)
    val fpSchemed2 = AnnIndex.fingerprint("file://" + d.toString)
    assert(fpPlain1 != fpPlain2, "plain-path fingerprint must track corpus content")
    assert(fpSchemed1 != fpSchemed2,
      "SCHEMED-path fingerprint must track corpus content — a constant here " +
        "serves a stale index for a regenerated corpus")
  }

  test("an empty or missing corpus dir is refused loudly, never a cache key") {
    val empty = java.nio.file.Files.createTempDirectory("graft_fp_empty")
    intercept[IllegalArgumentException] { AnnIndex.fingerprint(empty.toString) }
    intercept[IllegalArgumentException] {
      AnnIndex.fingerprint("file://" + empty.toString + "/never_written")
    }
  }
}
