package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming exact dedup-on-arrival for a document corpus: the
  * training-data-pipeline twin of the batch `dedup_exact` operator.
  * Every incoming doc is verdict-stamped against all previously-seen
  * content — the shape a continuously-fed corpus needs (dedup at ingest
  * beats re-running a batch dedup over the whole corpus per delivery).
  *
  * Keyed by the md5 of the text (32-byte shuffle keys instead of full
  * documents), state = the first-arriving doc_id per distinct content.
  * Unlike built-in streaming `dropDuplicates` — which silently keeps
  * firsts — this EMITS every doc with its canonical id and `is_dup`
  * flag, so downstream can count/route/audit duplicates.
  *
  * State never expires (NoTimeout): corpus dedup must remember every
  * content hash ever seen. At 100 TB that is exactly what the RocksDB
  * state-store provider exists for (off-heap, incremental checkpoints;
  * parity proven in RocksDbStateSpec) — one (16-byte key, long) entry
  * per distinct document, sharded by the hash across executors.
  */
object CorpusDedupStream {
  case class Doc(doc_id: Long, text: String)
  case class DocVerdict(doc_id: Long, canonical_id: Long, is_dup: Boolean)
  case class SeenState(firstDocId: Long)

  /** NULL-safe (null ≡ empty text): a single null doc must not kill a
    * long-running streaming query with an NPE in the key extractor —
    * the verdict row keeps its null text; only the dedup key coalesces. */
  def contentKey(text: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest((if (text == null) "" else text).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  def dedup(docs: Dataset[Doc])(implicit spark: SparkSession): Dataset[DocVerdict] = {
    import spark.implicits._
    docs
      .groupByKey(d => contentKey(d.text))
      .flatMapGroupsWithState[SeenState, DocVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          // batch-internal arrival order is undefined: take min doc_id
          // as the in-batch first so the verdict is deterministic and
          // matches the batch operator's min-id canonicalization
          val batch = it.toSeq.sortBy(_.doc_id)
          val canonical = state.getOption.map(_.firstDocId)
            .getOrElse(batch.head.doc_id)
          if (state.getOption.isEmpty) state.update(SeenState(canonical))
          batch.iterator.map(d =>
            DocVerdict(d.doc_id, canonical, d.doc_id != canonical))
      }
  }
}
