package graft.streaming

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup candidate detection on arrival — the LSH twin of
  * [[CorpusDedupStream]] (which only catches byte-identical content).
  * Every incoming doc is banded MinHash-style and checked against all
  * previously-seen docs sharing any band bucket; cross-batch candidate
  * pairs stream out for exact rerank (`DedupOps.verifyJaccard`, or a
  * threshold gate in the sink).
  *
  * Shape: the signature is computed row-local (same
  * [[graft.functions.MinHashSig]] kernel as the batch path, so batch
  * and stream agree band-for-band), then each doc explodes to its 16
  * (band, bucket) keys and a per-bucket `flatMapGroupsWithState` cell
  * holds the doc ids seen in that bucket. A new arrival emits one
  * candidate row per stored bucket-mate, then joins the set.
  *
  * Scale: state per bucket is the doc-id list of that bucket's
  * members, CAPPED at [[MaxBucketMembers]] — total state ≤ 16 ×
  * corpus size ids, sharded by bucket hash across executors exactly
  * like the batch join's shuffle, and no single bucket cell can
  * accumulate O(corpus) members or rescan them per arrival. Bucket
  * membership never expires (near-dup memory must cover the whole
  * corpus — the RocksDB-provider regime, same as CorpusDedupStream).
  * A same-batch pair is emitted once with the lower id as `prior_doc`
  * (deterministic min-id ordering within the batch sort).
  *
  * Saturation semantics (the streaming twin of the batch path's
  * `HotGramDfCap`): a bucket that reaches the cap is DEGENERATE by
  * LSH banding theory — hundreds of docs agreeing on one band means
  * the band hash carries boilerplate, not near-dup signal, and its
  * all-pairs candidates are noise (true mass duplication is caught
  * upstream by CorpusDedupStream's exact gate). Arrivals to a
  * saturated bucket emit ONE overflow marker row
  * (`prior_doc = `[[OverflowPrior]]) instead of member pairs and are
  * not stored, so per-bucket output is bounded by cap²/2 forever;
  * genuine near-dups still pair through their other 15 bands.
  * Markers are at-least-once (a re-delivered overflow doc re-marks);
  * consumers filter `prior_doc >= 0` before rerank.
  */
object NearDupStream {
  /** Per-bucket member cap; beyond a few hundred members a band
    * bucket is degenerate (see saturation semantics above). */
  val MaxBucketMembers = 512
  /** `prior_doc` sentinel marking a saturated-bucket overflow. */
  val OverflowPrior = -1L

  case class BandedDoc(doc_id: Long, band: Int, bucket: Int)
  case class BucketState(members: List[Long], saturated: Boolean)
  /** Candidate near-dup pair: `doc_id` arrived, `prior_doc` was
    * already in one of its buckets (or earlier in the same batch) —
    * or [[OverflowPrior]] if the bucket was saturated. */
  case class Candidate(doc_id: Long, prior_doc: Long)

  /** Row-local banding: doc → 16 (band, bucket) rows. Mirrors
    * [[DedupOps.minhashCandidates]]'s banding exactly. */
  def banded(docs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.MinHashSig.registerAll(spark)
    DedupOps.docShingleArraysNoRepartition(docs)
      .select(col("doc_id"), graft.functions.MinHashSig.minhash_sig(col("ghs")).as("sig"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))"))
        .as(Seq("band", "bucket")))
      .as[BandedDoc]
  }

  /** Full streaming near-dup pipeline: candidates → exact Jaccard
    * rerank per micro-batch. Each batch of candidate pairs broadcast-
    * joins the corpus snapshot's shingle arrays and keeps pairs at or
    * above `minJaccard` — the same
    * [[DedupOps.verifyJaccard]] rerank the batch LSH path uses, so the
    * confirmed-pair stream is the arrival-time version of
    * `minhashCandidates → verifyJaccard`. `corpusSnapshot` must cover
    * every doc that has entered the stream (at-rest store or the
    * original table): the rerank needs both sides' shingles, and the
    * bucket state only holds ids. */
  def confirmedPairs(docs: DataFrame, corpusSnapshot: DataFrame, minJaccard: Double,
                     dir: String, checkpoint: String)(implicit spark: SparkSession)
  : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    candidates(docs).toDF()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val cands = batch.filter(col("prior_doc") >= 0) // drop overflow markers
          .select(col("doc_id").as("da"), col("prior_doc").as("db")).distinct()
        DedupOps.verifyJaccard(corpusSnapshot, cands)
          .filter(col("jaccard") >= minJaccard)
          .write.mode("overwrite").parquet(s"$dir/batch-$id")
      }
      .start()
  }

  /** Streaming candidates: one output row per (new doc, bucket-mate),
    * distinct across the doc's 16 bands (a pair sharing 3 buckets
    * emits once per micro-batch — dedupe downstream if exact-once
    * matters across bands; within one bucket cell it is exact). */
  def candidates(docs: DataFrame,
                 maxBucketMembers: Int = MaxBucketMembers)
                (implicit spark: SparkSession): Dataset[Candidate] = {
    import spark.implicits._
    banded(docs)
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          // deterministic arrival order inside the batch: min id first
          val st = state.getOption.getOrElse(BucketState(Nil, saturated = false))
          val priorSet = scala.collection.mutable.HashSet.from(st.members)
          // at-least-once delivery: a re-sent doc is already a member —
          // re-appending would grow state by 16 entries per re-delivery
          // and duplicate every future candidate against it
          val arrivals = it.map(_.doc_id).toArray.sorted.distinct
            .filterNot(priorSet.contains)
          val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
          var seen = st.members
          var size = priorSet.size
          var sat = st.saturated
          arrivals.foreach { id =>
            if (sat || size >= maxBucketMembers) {
              // degenerate bucket: stop pairing AND stop growing —
              // overflow marker only (see saturation semantics above)
              sat = true
              out += Candidate(id, OverflowPrior)
            } else {
              seen.foreach { p => if (p != id) out += Candidate(id, p) }
              seen = id :: seen; size += 1
            }
          }
          if (arrivals.nonEmpty) state.update(BucketState(seen, sat))
          out.iterator
      }
  }
}
