package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{KernelExprs, TextFunctions => TF}
import graft.operators.Dedup

/** Incremental deduplication over an unbounded document stream — the
  * continuous-ingest counterpart of the batch [[graft.operators.Dedup]]
  * operators. A 100 TB training corpus is not assembled in one batch; new
  * crawls arrive continuously and each document must be judged against
  * EVERYTHING already accepted, without re-scanning history. Both operators
  * keep that history as keyed state-store state, so a restart resumes from
  * the checkpoint with no rebuild.
  *
  *  - [[exactVerdicts]]: state per content hash = the keeper's id. O(1)
  *    state per DISTINCT content; every arrival gets an (id, keepId,
  *    isDuplicate) verdict in the same micro-batch.
  *  - [[nearDupCandidates]]: MinHash/LSH state per band bucket = the
  *    signatures seen in that bucket. A new document is compared only
  *    against its own buckets' residents — the streaming analogue of the
  *    batch band self-join, with the same near-linear candidate space.
  *
  * Verdicts are micro-batch-boundary independent: within a batch, documents
  * are processed in ascending id order and compared against state AND
  * earlier same-batch arrivals, so chunking the same input differently
  * yields the same verdicts (asserted against the batch operators in
  * StreamingDedupSpec).
  *
  * State lifetime: dedup history has no natural expiry — state lives until
  * the caller bounds it. At production scale bound it per bucket
  * ([[nearDupCandidates]]'s `maxPerBucket` keeps the first-seen residents,
  * trading recall against unbounded growth on hot buckets — pathological
  * buckets are usually boilerplate shingles) and/or restart epochs with a
  * fresh checkpoint per corpus snapshot.
  */
object StreamingDedup {

  final case class Doc(docId: Long, text: String)
  final case class ExactVerdict(docId: Long, keepId: Long, isDuplicate: Boolean)

  /** Candidate near-dup pair: `idA` (earlier) vs `idB` (later), estimated
    * Jaccard = agreeing signature fraction, from one shared band bucket. */
  final case class Candidate(idA: Long, idB: Long, estJaccard: Double)

  // public: encoder-generated deserializers cannot construct private classes
  final case class BandRow(band: String, docId: Long, sig: Seq[Long])
  final case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  /** Exact streaming dedup: first arrival of a content hash is the keeper,
    * every later arrival is a duplicate pointing at it. Ties inside one
    * micro-batch resolve by ascending id, so a replayed/re-chunked stream
    * gives identical verdicts. */
  def exactVerdicts(docs: Dataset[Doc]): Dataset[ExactVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[ExactVerdict]
    docs
      .select(col("docId"),
        KernelExprs.hash60(col("text")).as("contentHash"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, ExactVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[Long]) =>
          val arrivals = rows.map(_._1).toArray.sorted
          var keep = state.getOption.getOrElse(-1L)
          val out = arrivals.map { id =>
            if (keep < 0) { keep = id; ExactVerdict(id, id, isDuplicate = false) }
            else ExactVerdict(id, keep, isDuplicate = true)
          }
          state.update(keep)
          out.iterator
      }
  }

  /** Streaming MinHash/LSH candidate pairs: every new document is compared
    * against the prior residents of each of its `bands` buckets; pairs at or
    * above `minEstJaccard` are emitted. One logical pair can surface from
    * several buckets (exactly like the batch band join) — downstream
    * `.distinct()` or the per-batch sink dedups.
    *
    * @param maxPerBucket cap on stored signatures per bucket (first-seen
    *                     kept); arrivals beyond the cap are still COMPARED —
    *                     only their enrollment is dropped, so recall decays
    *                     for pairs formed among the overflow only.
    */
  def nearDupCandidates(docs: Dataset[Doc], shingleN: Int, numHashes: Int,
                        bands: Int, minEstJaccard: Double,
                        maxPerBucket: Int = 10000): Dataset[Candidate] = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val outEnc = Encoders.product[Candidate]
    implicit val stEnc = Encoders.product[BucketState]
    val rowsPerBand = numHashes / bands
    docs
      .select(col("docId"),
        Dedup.minhashSignature(
          TF.word_shingles(col("text"), shingleN), numHashes).as("sig"))
      .withColumn("band",
        explode(Dedup.lshBandKeys(col("sig"), bands, rowsPerBand)))
      .select(col("band"), col("docId"), col("sig"))
      .as[BandRow]
      .groupByKey(_.band)
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Nil, Nil))
          val ids = st.ids.toBuffer
          val sigs = st.sigs.map(_.toArray).toBuffer
          val out = collection.mutable.ArrayBuffer[Candidate]()
          rows.toArray.sortBy(_.docId).foreach { r =>
            val sig = r.sig.toArray
            var i = 0
            while (i < ids.length) {
              if (ids(i) != r.docId) {
                val other = sigs(i)
                var agree = 0; var j = 0
                while (j < sig.length) {
                  if (sig(j) == other(j)) agree += 1; j += 1
                }
                val est = agree.toDouble / numHashes
                if (est >= minEstJaccard)
                  out += Candidate(math.min(ids(i), r.docId),
                    math.max(ids(i), r.docId), est)
              }
              i += 1
            }
            if (ids.length < maxPerBucket) { ids += r.docId; sigs += sig }
          }
          state.update(BucketState(ids.toSeq, sigs.map(_.toSeq).toSeq))
          out.iterator
      }
  }
}
