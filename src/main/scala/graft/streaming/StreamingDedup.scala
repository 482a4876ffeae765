package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions

/** Streaming NEAR-dedup (the incremental-corpus scenario a training-
  * data pipeline actually runs): documents arrive over time and each
  * new one must be dropped if it is a near-duplicate of ANY earlier
  * document — without ever holding the corpus in one place.
  *
  * Same LSH decomposition as the batch path (Dedup.lshCandidates),
  * re-keyed for `flatMapGroupsWithState`:
  *
  *  - per-document features (distinct shingle hashes + k MinHash
  *    minima) are ROW-LOCAL column expressions here — a streaming
  *    row can't explode-and-reaggregate across batches, and doesn't
  *    need to: the fold is per document;
  *  - each doc explodes to `bands` (band, band_hash) keyed rows; the
  *    keyed state holds the shingle-hash sets of the bucket's
  *    SURVIVORS (capped, like the batch mega-bucket guard), and a
  *    new doc verifies exact Jaccard against only its own bucket's
  *    survivors — the candidate set, never the corpus;
  *  - a doc is dropped iff some band matched, so the per-band
  *    verdicts are OR-combined per doc downstream (one small keyed
  *    aggregation per micro-batch).
  *
  * State is bounded: ≤ `maxBucket` hash sets per (band, band_hash)
  * bucket, checkpointed with the query — at any corpus size a bucket
  * holds a constant-size neighborhood, the streaming analog of d2's
  * mega-bucket exclusion.
  */
object StreamingDedup {

  final case class DocBand(doc_id: Long, band: Int, band_hash: Long,
      hashes: Array[Long])
  final case class BandVerdict(doc_id: Long, band: Int, is_dup: Boolean)

  /** Row-local banding: tokens → distinct sorted shingle hashes →
    * k MinHash minima → `bands` (band, band_hash) rows. Same hash
    * family and band formula as the batch Dedup (shingleFeatures /
    * lshCandidates), so a batch-built corpus and a streamed corpus
    * bucket identically. */
  def docBands(docs: DataFrame, bands: Int = 4): Dataset[DocBand] = {
    import TextFunctions._
    val hs = sort_array(array_distinct(
      transform(shingles3(tokens(col("text"))), s => polyHash(s))))
    // everything derived from the hash set is built inside ONE bind
    // lambda, so the shingle set is computed once per row no matter
    // how many bands reference it (CollapseProject would otherwise
    // inline a plain alias into every reference)
    val packed = bind(hs, h => {
      def mh(j: Int) = array_min(transform(h,
        v => (v * (2 * j + 1) + lit(7919L * j)) % MinhashP))
      val bandArr = array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (((mh(3 * b) * 31 + mh(3 * b + 1)) % MinhashP * 31
            + mh(3 * b + 2)) % MinhashP).as("band_hash"))
      }: _*)
      struct(h.as("hashes"), bandArr.as("bands"))
    })
    implicit val enc = Encoders.product[DocBand]
    docs.select(col("doc_id"), packed.as("s"))
      .select(col("doc_id"), col("s.hashes").as("hashes"),
        explode(col("s.bands")).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"),
        col("bs.band_hash").as("band_hash"), col("hashes"))
      // a doc under 3 tokens has no shingles → NULL minhash/band:
      // it cannot be a near-duplicate of anything and emits no band
      // rows (exactly like the batch path, where empty feature sets
      // never reach the candidate join) — callers treat "no verdict"
      // as not-a-dup
      .where(col("band_hash").isNotNull)
      .as[DocBand]
  }

  /** Exact Jaccard over two sorted distinct hash arrays — the same
    * linear merge as the batch verify kernel (IntersectCount), here
    * as plain JVM code because it runs inside the state function. */
  def jaccardSorted(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** The stateful core: per (band, band_hash) bucket, verify each
    * incoming doc against the bucket's stored survivors; docs that
    * match nothing are added to the state (up to `maxBucket`).
    * Within a micro-batch, docs are processed in doc_id order so the
    * OLDER doc survives — the batch survivor convention (min doc_id,
    * Dedup.exactGroups). Emits one verdict per (doc, band). */
  def bandVerdicts(bandRows: Dataset[DocBand], threshold: Double,
      maxBucket: Int = 64): Dataset[BandVerdict] = {
    implicit val keyEnc = Encoders.product[(Int, Long)]
    implicit val stateEnc = Encoders.kryo[List[(Long, Array[Long])]]
    implicit val outEnc = Encoders.product[BandVerdict]
    bandRows.groupByKey(d => (d.band, d.band_hash))
      .flatMapGroupsWithState[List[(Long, Array[Long])], BandVerdict](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state: GroupState[List[(Long, Array[Long])]]) =>
          var survivors = state.getOption.getOrElse(Nil)
          val verdicts = it.toSeq.sortBy(_.doc_id).map { d =>
            val dup = survivors.exists { case (_, hs) =>
              jaccardSorted(hs, d.hashes) >= threshold
            }
            if (!dup && survivors.size < maxBucket)
              survivors = (d.doc_id, d.hashes) :: survivors
            BandVerdict(d.doc_id, d.band, dup)
          }
          state.update(survivors)
          verdicts.iterator
      }
  }

  /** End-to-end streaming near-dedup: text stream in, per-doc
    * verdict stream out (is_dup = matched in ANY band). The OR-
    * combine is a per-micro-batch aggregation (done in foreachBatch
    * by the caller — verdicts for one doc always land in the same
    * micro-batch because banding is row-local). */
  def verdicts(docs: DataFrame, threshold: Double = 0.8,
      bands: Int = 4, maxBucket: Int = 64): Dataset[BandVerdict] =
    bandVerdicts(docBands(docs, bands), threshold, maxBucket)

  /** The per-batch OR-combine: (doc_id, is_dup). */
  def combine(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(max(col("is_dup")).as("is_dup"))
}
