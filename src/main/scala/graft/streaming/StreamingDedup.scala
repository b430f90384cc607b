package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time NEAR-duplicate detection over a document firehose —
  * the streaming twin of [[graft.ops.Dedup.minhashLshPairs]], for the
  * curation stage where waiting for the nightly batch dedup means a
  * day of duplicate storage and training-shard churn.
  *
  * Pipeline: per-doc MinHash signature (one native pass,
  * [[graft.functions.minhash_signature]]) → banded LSH keys (the SAME
  * band arithmetic as the batch path, so a document lands in the same
  * buckets at ingest and in batch re-dedup) → a stateful bucket store
  * (`flatMapGroupsWithState` keyed by (band_idx, band_hash)) that
  * compares each arriving doc's signature against the docs currently
  * resident in its buckets and emits a [[NearDupHit]] per match.
  *
  * Similarity here is the SIGNATURE-estimated Jaccard (fraction of
  * agreeing components — the textbook MinHash estimator, unbiased,
  * stderr ≈ 1/√numHashes); exact verification needs the shingle sets
  * and belongs to the batch path. Use the stream to QUARANTINE likely
  * dups at ingest, the batch [[graft.ops.Dedup]] pipeline to
  * adjudicate.
  *
  * Scale posture: state per bucket is one (doc_id, ev_ms, signature)
  * triple per resident doc — never the text — expired by the
  * watermark, so total state is bounded by
  * `bands × (docs per horizon) × numHashes` longs regardless of
  * corpus size; buckets are hash-partitioned across executors by the
  * (band_idx, band_hash) grouping key. Within a bucket, comparison is
  * O(residents) per arrival — the LSH premise (near-dups collide,
  * unrelated docs don't) keeps residents per bucket tiny; a
  * degenerate corpus (one bucket swallowing everything) degrades to
  * the same quadratic any LSH does, bounded here by the horizon.
  *
  * A colliding pair is emitted once PER SHARED BAND (buckets are
  * independent state keys and cannot coordinate): consumers dedupe on
  * (id_a, id_b) — trivial at pair volume. Late documents (event time
  * behind the watermark) are dropped, mirroring
  * `dropDuplicatesWithinWatermark`; a doc is compared only against
  * docs whose event time is still within the horizon.
  */
object StreamingDedup {

  /** One (document × band) arrival: the fanned-out unit of work.
    * `sig` rides along so the bucket can estimate Jaccard without
    * ever seeing the text. */
  final case class BandEvent(
      doc_id: Long, eventTime: java.sql.Timestamp, ev_ms: Long,
      sig: Seq[Long], band_idx: Int, band_hash: Long)

  /** A doc resident in a bucket: id, arrival time (for watermark
    * expiry), signature (for the estimator). */
  final case class SeenDoc(doc_id: Long, ev_ms: Long, sig: Seq[Long])

  final case class BucketState(docs: List[SeenDoc])

  /** An emitted near-dup candidate: `id_a` < `id_b`, `est_jaccard`
    * the signature-estimated similarity, `eventTime` the later doc's
    * arrival (so downstream watermarked ops keep working). */
  final case class NearDupHit(
      id_a: Long, id_b: Long, est_jaccard: Double,
      eventTime: java.sql.Timestamp)

  /** Fan a document stream (`doc_id`, `text`, `eventTime`) out to one
    * row per LSH band, watermarked. All signature/band arithmetic is
    * shared with the batch path ([[graft.ops.Dedup.minhashBandCols]]),
    * so stream and batch agree bucket-for-bucket. */
  def banded(docs: DataFrame, n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .select(col("doc_id"), col("eventTime"),
        unix_millis(col("eventTime")).as("ev_ms"),
        graft.functions.minhash_signature(
          array_distinct(graft.functions.word_shingles(col("text"), n)),
          numHashes).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("eventTime"), col("ev_ms"), col("sig"),
        posexplode(array(
          graft.ops.Dedup.minhashBandCols(col("sig"), numHashes, bands): _*)))
      .toDF("doc_id", "eventTime", "ev_ms", "sig", "band_idx", "band_hash")
      .withWatermark("eventTime", watermarkDelay)

  /** Fraction of agreeing signature components — the unbiased MinHash
    * Jaccard estimator. */
  private[graft] def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var m = 0
    var i = 0
    val len = math.min(a.length, b.length)
    while (i < len) { if (a(i) == b(i)) m += 1; i += 1 }
    if (len == 0) 0.0 else m.toDouble / len
  }

  private def processBucket(minEst: Double)(
      key: (Int, Long), events: Iterator[BandEvent],
      state: GroupState[BucketState]): Iterator[NearDupHit] = {
    // 0 = "no watermark yet"; real event times dwarf it.
    val wm = state.getCurrentWatermarkMs()
    // Expire residents the watermark has passed — also what a pure
    // timeout invocation (no events) does.
    var docs = state.getOption.map(_.docs).getOrElse(Nil).filter(_.ev_ms >= wm)
    val out = List.newBuilder[NearDupHit]
    // Deterministic within-batch order: a batch is an unordered set in
    // event-time terms, so compare in (time, id) order — same answer
    // on every run and every partitioning.
    events.toSeq.sortBy(e => (e.ev_ms, e.doc_id)).foreach { e =>
      if (e.ev_ms >= wm) { // late doc: dropped, like dropDuplicatesWithinWatermark
        docs.foreach { s =>
          if (s.doc_id != e.doc_id) {
            val est = estJaccard(s.sig, e.sig)
            if (est >= minEst) {
              val (a, b) =
                if (s.doc_id < e.doc_id) (s.doc_id, e.doc_id)
                else (e.doc_id, s.doc_id)
              out += NearDupHit(a, b, est, e.eventTime)
            }
          }
        }
        docs = SeenDoc(e.doc_id, e.ev_ms, e.sig) :: docs
      }
    }
    if (docs.isEmpty) state.remove()
    else {
      state.update(BucketState(docs))
      // Wake when the watermark passes the oldest resident, to evict
      // it (+1: the timeout timestamp must exceed the watermark).
      state.setTimeoutTimestamp(docs.map(_.ev_ms).min + 1)
    }
    out.result().iterator
  }

  /** Wire the stateful bucket store over a [[banded]] stream. Output
    * mode: Append (hits are final the moment they are emitted). */
  def run(bandedDocs: DataFrame, minEstJaccard: Double = 0.5): Dataset[NearDupHit] = {
    implicit val eEnc = Encoders.product[BandEvent]
    implicit val sEnc = Encoders.product[BucketState]
    implicit val hEnc = Encoders.product[NearDupHit]
    implicit val kEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    bandedDocs
      .as[BandEvent]
      .groupByKey(e => (e.band_idx, e.band_hash))
      .flatMapGroupsWithState[BucketState, NearDupHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        processBucket(minEstJaccard))
  }
}
