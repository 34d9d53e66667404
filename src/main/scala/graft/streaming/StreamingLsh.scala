package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate candidate generation — the
  * incremental twin of [[graft.scale.Dedup.minhashLsh]] for
  * dedup-at-ingest: each arriving document emits candidate pairs against
  * the documents already seen in its LSH band buckets.
  *
  * The batch pipeline computes signatures with an explode + groupBy;
  * chaining that aggregation into a stateful pair stage would stack two
  * stateful operators in one streaming query. Here the whole signature —
  * shingles → per-seed minhashes → per-band keys — is ONE stateless
  * columnar projection (`transform`/`array_min` over the shingle array,
  * same md5 hash family as the batch op), so the only stateful operator
  * is the bucket store. State per (band, bucket) is the member id list,
  * capped at `maxBucketSize` with the batch op's star decomposition: a
  * viral bucket keeps emitting (hub, new) edges — identical connected
  * components, O(cap) memory. A pair can surface in several bands
  * (bands are independent buckets); downstream component/dedup stages
  * are insensitive to duplicate edges, as in the batch pipeline.
  */
object StreamingLsh {

  case class BandRow(bucket: String, doc_id: Long)
  case class BucketState(ids: List[Long])
  case class CandPair(a: Long, b: Long, bucket: String)

  /** Candidate near-dup pairs (a < b by arrival-independent id order)
    * from a streaming document source with (`idCol`: long, `textCol`:
    * string). numHashes = bands × rowsPerBand as in the batch op.
    *
    * `idleTimeout` (a duration string, e.g. "6 hours") bounds state over
    * an unbounded bucket domain: a bucket idle that long is dropped, so
    * a future member pairs only against documents seen after the drop —
    * the standard dedup-horizon tradeoff (full-history dedup stays a
    * batch job). Default None preserves keep-everything semantics. */
  def lshCandidates(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
                    shingleK: Int = 3, maxBucketSize: Int = 32,
                    textCol: String = "text",
                    idCol: String = "doc_id",
                    idleTimeout: Option[String] = None): DataFrame = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    val toks = split(trim(col(textCol)), " +")
    val nSh = greatest(size(toks) - (shingleK - 1), lit(1))
    val shingles = transform(sequence(lit(1), nSh),
      i => concat_ws(" ", slice(toks, i, lit(shingleK))))
    // same hash family as Dedup.minhashSignatures: h1 + seed·h2 per shingle
    def minhash(seed: Int) = array_min(transform(shingles, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") +
        lit(seed.toLong) * conv(substring(md5(s), 17, 14), 16, 10).cast("long")))
    val bandKeys = (0 until bands).map { b =>
      val key = concat_ws(":",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(s => minhash(s).cast("string")): _*)
      concat(lit(s"$b|"), key)
    }
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array(bandKeys: _*)).as("bucket"))
      .as[(Long, String)].map { case (id, bk) => BandRow(bk, id) }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append(),
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
        else GroupStateTimeout.NoTimeout())(
        bucketGroup(maxBucketSize, idleTimeout))(
        Encoders.product[BucketState], Encoders.product[CandPair])
      .toDF()
  }

  /** Stream-side band keys in the BATCH [[graft.scale.Dedup.bandTable]]
    * format — (doc_id, band, band_key = md5 of the ':'-joined decimal
    * minhashes) — as one stateless projection. Anything the batch index
    * writer produced joins against this directly. */
  def bandKeys(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
               shingleK: Int = 3, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val toks = split(trim(col(textCol)), " +")
    val nSh = greatest(size(toks) - (shingleK - 1), lit(1))
    val shingles = transform(sequence(lit(1), nSh),
      i => concat_ws(" ", slice(toks, i, lit(shingleK))))
    def minhash(seed: Int) = array_min(transform(shingles, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") +
        lit(seed.toLong) * conv(substring(md5(s), 17, 14), 16, 10).cast("long")))
    val rows = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(":", (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(s => minhash(s).cast("string")): _*)).as("band_key"))
    }
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array(rows: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.band_key").as("band_key"))
  }

  /** Dedup-at-ingest against the HISTORICAL corpus: candidate pairs of
    * each streaming document against the persisted batch band index — a
    * STATELESS stream-static inner join (watermark-free, no state
    * store); the streaming twin of
    * [[graft.scale.Dedup.minhashLshPairsIncremental]]'s new-vs-index
    * half. Pairs WITHIN the stream are [[lshCandidates]]' job — run
    * both for full coverage. A pair may surface once per matching band
    * (downstream component/dedup stages are insensitive to duplicate
    * edges); `dropDuplicates` on an unbounded stream would reintroduce
    * state, so dedup pairs downstream if it matters. */
  def candidatesAgainstIndex(docs: DataFrame, indexBands: DataFrame,
                             numHashes: Int = 16, bands: Int = 4,
                             shingleK: Int = 3, textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame =
    bandKeys(docs, numHashes, bands, shingleK, textCol, idCol)
      .join(indexBands.select(col(idCol).as("index_id"), col("band"),
        col("band_key")), Seq("band", "band_key"))
      .filter(col("doc_id") =!= col("index_id"))
      .select(col("doc_id"), col("index_id"), col("band"))

  private[streaming] def bucketGroup(maxBucketSize: Int,
      idleTimeout: Option[String] = None)(
      bucket: String, rows: Iterator[BandRow],
      state: GroupState[BucketState]): Iterator[CandPair] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val ids = mutable.ArrayBuffer[Long]()
    state.getOption.foreach(s => ids ++= s.ids)
    val out = mutable.ArrayBuffer[CandPair]()
    for (r <- rows.toSeq.sortBy(_.doc_id) if !ids.contains(r.doc_id)) {
      if (ids.length < maxBucketSize) {
        // full clique below the cap, as in the batch op
        for (old <- ids)
          out += CandPair(math.min(old, r.doc_id), math.max(old, r.doc_id), bucket)
        ids += r.doc_id
      } else {
        // star decomposition: viral bucket links newcomers to the hub only
        val hub = ids.min
        out += CandPair(math.min(hub, r.doc_id), math.max(hub, r.doc_id), bucket)
      }
    }
    state.update(BucketState(ids.toList))
    idleTimeout.foreach(state.setTimeoutDuration)
    out.iterator
  }
}
