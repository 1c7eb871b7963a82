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
  * members — total state = 16 × corpus size ids, sharded by bucket
  * hash across executors exactly like the batch join's shuffle; the
  * candidate stream is bounded by true bucket collisions (never N²).
  * Bucket membership never expires (near-dup memory must cover the
  * whole corpus — the RocksDB-provider regime, same as
  * CorpusDedupStream). A same-batch pair is emitted once with the
  * lower id as `prior_doc` (deterministic min-id ordering within the
  * batch sort).
  */
object NearDupStream {
  case class BandedDoc(doc_id: Long, band: Int, bucket: Int)
  case class BucketState(members: List[Long])
  /** Candidate near-dup pair: `doc_id` arrived, `prior_doc` was
    * already in one of its buckets (or earlier in the same batch). */
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
        val cands = batch.select(col("doc_id").as("da"), col("prior_doc").as("db")).distinct()
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
  def candidates(docs: DataFrame)(implicit spark: SparkSession): Dataset[Candidate] = {
    import spark.implicits._
    banded(docs)
      .groupByKey(d => (d.band, d.bucket))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          // deterministic arrival order inside the batch: min id first
          val prior = state.getOption.map(_.members).getOrElse(Nil)
          val priorSet = scala.collection.mutable.HashSet.from(prior)
          // at-least-once delivery: a re-sent doc is already a member —
          // re-appending would grow state by 16 entries per re-delivery
          // and duplicate every future candidate against it
          val arrivals = it.map(_.doc_id).toArray.sorted.distinct
            .filterNot(priorSet.contains)
          val out = scala.collection.mutable.ArrayBuffer.empty[Candidate]
          var seen = prior
          arrivals.foreach { id =>
            seen.foreach { p => if (p != id) out += Candidate(id, p) }
            seen = id :: seen
          }
          if (arrivals.nonEmpty) state.update(BucketState(seen))
          out.iterator
      }
  }
}
