package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-describing persisted day-2 dedup indexes — the
  * docs/QUICKSTART.md contract table as an ENFORCED API instead of
  * documentation. Every family's build parameters (shingle size,
  * threshold, gram size, band count, …) are persisted WITH the
  * artifacts in a `_meta` key-value parquet, and `IndexStore.load`
  * reconstructs the right family with the right parameters — so a
  * day-2 probe cannot silently mismatch the day-1 build (the error
  * class the raw function API leaves open: probing a shingleK=3 index
  * with k=2 batch shingles yields quietly-empty joins, not an error).
  *
  * Layout under `path/`: one subdirectory per artifact DataFrame plus
  * `_meta` (family tag, format version, parameters). All IO goes
  * through Spark readers/writers, so a store works on any Hadoop-API
  * filesystem (HDFS/S3/local) at any scale.
  *
  * Each `probe(batch)` delegates to the family's incremental operator,
  * whose output is pinned by the family property specs to equal the
  * full-corpus rerun restricted to batch-touching results. Batch ids
  * must be disjoint from indexed ids for the self-join families
  * (see [[graft.scale.Dedup.jaccardPrefixIncremental]] et al.). */
object IndexStore {
  /** Format version written with every new store. Bumped 1 → 2 when
    * winnow meta gained the probe-time `maxFpDf` key: a version-1-era
    * reader must fail LOUDLY on a version-2 store rather than silently
    * probe uncapped (the silent-parameter-mismatch class the store
    * exists to prevent). Version-1 stores remain readable — the only
    * delta is an additive key with a safe default (`getOrElse` below). */
  private val Version = "2"
  private val ReadableVersions = Set("1", "2")
  private def checkVersion(m: Map[String, String], path: String): Unit =
    require(ReadableVersions.contains(m.getOrElse("version", "")),
      s"index store version ${m.get("version")} not in readable set " +
        s"$ReadableVersions at $path")

  private def writeMeta(spark: SparkSession, path: String,
                        family: String, params: Map[String, String]): Unit = {
    import spark.implicits._
    (params + ("family" -> family) + ("version" -> Version)).toSeq
      .toDF("key", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  private def readMeta(spark: SparkSession, path: String): Map[String, String] =
    spark.read.parquet(s"$path/_meta").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  /** A persisted index handle: `save` it, `probe` new batches with the
    * parameters it was built with, `append` an absorbed batch to get the
    * handle a day-3 probe runs against. */
  sealed trait DedupIndex {
    def save(path: String): Unit
    def probe(batch: DataFrame): DataFrame
    /** Absorb `batch` into the index — the day-N maintenance step: after
      * a batch has been probed (its new pairs emitted), it becomes part
      * of history, and the NEXT batch must probe against day-1 ∪ day-2
      * without a from-scratch rebuild. The returned handle's `probe` is
      * pair-set-identical to a full rebuild over the combined corpus
      * (the `*_day3` oracle rows + the append property specs pin this):
      * the per-item families (bands, fingerprints, chunk/shingle sets,
      * cluster assignments) append by construction, and the frozen-order
      * families (jaccard_prefix, edit_distance) extend their df order
      * consistently — see each override. Batch ids must be disjoint
      * from indexed ids (same contract as `probe`). The result is
      * in-memory: `save` it (to a NEW path — see [[IndexStore.append]])
      * to persist day-2 state. */
    def append(batch: DataFrame): DedupIndex
  }

  /** Load the store at `srcPath`, absorb `batch`, persist the grown
    * index at `dstPath` and hand back the reloaded handle — the
    * operational day-N maintenance contract (build → save → load →
    * probe → APPEND → save → probe …). `dstPath` must differ from
    * `srcPath`: the artifacts at `srcPath` are inputs of the appended
    * plan, and Spark cannot overwrite a parquet directory it is reading
    * (and a concurrent day-2 reader of `srcPath` must keep a consistent
    * snapshot — supersede, then retire the old version once its readers
    * drain; see docs/QUICKSTART.md for the retention contract). */
  def append(spark: SparkSession, srcPath: String, batch: DataFrame,
             dstPath: String): DedupIndex = {
    require(srcPath != dstPath,
      "append must write a NEW store version: srcPath == dstPath would " +
        "overwrite parquet inputs mid-read (and yank the snapshot from " +
        "under concurrent readers)")
    val grown = load(spark, srcPath).append(batch)
    grown.save(dstPath)
    load(spark, dstPath)
  }

  // --- compaction + version GC (the retention contract, implemented) ---

  /** Rewrite the newest version of an append chain as ONE canonical
    * store at `dstPath`. Every [[append]] writes a complete superset
    * store at a new versioned path, so the newest version already holds
    * all the data — what a long chain accumulates is FILES: each
    * union-then-save hop appends task-count parquet files per artifact,
    * and each [[IvfIndex.append]] drops one file per batch into every
    * touched list directory. `compact` reads each artifact of the store
    * at `srcPath` and rewrites it with right-sized files
    * (~`targetFileBytes` per file), preserving the IVF family's
    * Hive-partitioned list layout (one file per inverted list), then
    * carries the meta over unchanged — the canonical store loads with
    * the same family and parameters and is content-identical (the
    * compaction spec pins probe equality).
    *
    * Older versions are untouched — snapshot isolation here IS
    * immutability: a reader holding `_v1` keeps its exact view while
    * the chain grows and compacts. Pass superseded paths to [[retire]]
    * once their readers drain (docs/QUICKSTART.md retention contract).
    * Load the result with [[load]] (dedup families) or [[loadIvf]]. */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
              targetFileBytes: Long = 64L << 20): Unit = {
    require(srcPath != dstPath,
      "compact writes a NEW canonical path: srcPath == dstPath would " +
        "overwrite parquet inputs mid-read")
    require(targetFileBytes > 0, s"targetFileBytes: $targetFileBytes")
    val m = readMeta(spark, srcPath)
    checkVersion(m, srcPath)
    val hconf = spark.sessionState.newHadoopConf()
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(hconf)
    val isIvf = m.getOrElse("family", "") == "ivf"
    for (st <- fs.listStatus(src) if st.isDirectory
         if st.getPath.getName != "_meta") {
      val name = st.getPath.getName
      val bytes = fs.getContentSummary(st.getPath).getLength
      val nFiles =
        math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      val df = spark.read.parquet(st.getPath.toString)
      if (isIvf && name == "lists")
        // each list's rows land in one task → one right-sized file per
        // list directory; the partition-pruned probe layout is preserved
        df.repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$dstPath/$name")
      else
        df.repartition(nFiles)
          .write.mode("overwrite").parquet(s"$dstPath/$name")
    }
    writeMeta(spark, dstPath, m("family"), m - "family" - "version")
  }

  /** Delete a SUPERSEDED store version — the final step of the
    * retention contract (docs/QUICKSTART.md): call only after a newer
    * version (an [[append]] target or a [[compact]] canonical store) is
    * published AND every reader holding this version has drained.
    * Refuses to delete anything that is not a readable index store: a
    * typo'd path must not turn into a recursive delete of arbitrary
    * data. */
  def retire(spark: SparkSession, path: String): Unit = {
    val m = readMeta(spark, path) // throws if there is no store here
    checkVersion(m, path)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    ()
  }

  /** Load whichever family was saved at `path` — the family tag and all
    * parameters come from the store itself. */
  def load(spark: SparkSession, path: String): DedupIndex = {
    val m = readMeta(spark, path)
    checkVersion(m, path)
    def rd(sub: String) = spark.read.parquet(s"$path/$sub")
    m("family") match {
      case "minhash_lsh" => MinhashLshIndex(rd("bands"),
        m("numHashes").toInt, m("shingleK").toInt, m("rowsPerBand").toInt,
        m("textCol"), m("idCol"))
      case "jaccard_prefix" => JaccardPrefixIndex(rd("df"), rd("docs"),
        m("shingleK").toInt, m("tauNum").toInt, m("tauDen").toInt,
        m("textCol"), m("idCol"))
      case "edit_distance" => EditDistanceIndex(rd("df"), rd("str"),
        rd("ids"), m("maxDist").toInt, m("q").toInt,
        m("textCol"), m("idCol"))
      case "shingle" => ShingleIndex(rd("shingles"), m("shingleK").toInt,
        m("textCol"), m("idCol"))
      case "winnow" => WinnowIndex(rd("fingerprints"),
        m("minShared").toInt, m("k").toInt, m("w").toInt,
        m.getOrElse("maxFpDf", Int.MaxValue.toString).toInt,
        m("textCol"), m("idCol"))
      case "cdc" => CdcIndex(rd("chunks"), m("w").toInt,
        m("maskBits").toInt, m("textCol"), m("idCol"))
      case "hamming" => HammingIndex(rd("bands"), m("radius").toInt,
        m("bands").toInt, m("idCol"), m("hiCol"), m("loCol"))
      case "bitext" => BitextIndex(rd("index"), m("k").toInt,
        m("thresholdMicro").toLong, m("idCol"), m("vecCol"))
      case "cluster_cosine" =>
        val centroids = rd("_centroids").orderBy(col("cluster")).collect()
          .map(_.getAs[Seq[Double]]("centroid").toArray)
        ClusterCosineIndex(rd("assigned"), centroids,
          m("threshold").toDouble, m("idCol"), m("vecCol"))
      case "ivf" => throw new IllegalArgumentException(
        s"'ivf' stores hold a vector index, not a dedup index — load " +
          s"with IndexStore.loadIvf(spark, \"$path\")")
      case other => throw new IllegalArgumentException(
        s"unknown index family '$other' at $path")
    }
  }

  // --- MinHash / LSH candidates ---
  final case class MinhashLshIndex(bands: DataFrame, numHashes: Int,
      shingleK: Int, rowsPerBand: Int, textCol: String, idCol: String)
      extends DedupIndex {
    def save(path: String): Unit = {
      bands.write.mode("overwrite").parquet(s"$path/bands")
      writeMeta(bands.sparkSession, path, "minhash_lsh", Map(
        "numHashes" -> numHashes.toString, "shingleK" -> shingleK.toString,
        "rowsPerBand" -> rowsPerBand.toString,
        "textCol" -> textCol, "idCol" -> idCol))
    }
    /** Candidate pairs (a, b) touching the batch — batch docs are
      * signed with the SAME hash family the index was built with. */
    def probe(batch: DataFrame): DataFrame =
      Dedup.minhashLshPairsIncremental(
        Dedup.minhashSignatures(batch, numHashes, shingleK, textCol, idCol),
        bands, rowsPerBand, idCol)
    /** Band rows are per-document (signed with the frozen hash family),
      * so absorbing a batch is a union — identical to a rebuild. */
    def append(batch: DataFrame): MinhashLshIndex =
      copy(bands = bands.unionByName(Dedup.bandTable(
        Dedup.minhashSignatures(batch, numHashes, shingleK, textCol, idCol),
        rowsPerBand, idCol)))
  }
  def buildMinhashLsh(docs: DataFrame, numHashes: Int = 16,
                      shingleK: Int = 3, rowsPerBand: Int = 4,
                      textCol: String = "text",
                      idCol: String = "doc_id"): MinhashLshIndex =
    MinhashLshIndex(
      Dedup.bandTable(
        Dedup.minhashSignatures(docs, numHashes, shingleK, textCol, idCol),
        rowsPerBand, idCol),
      numHashes, shingleK, rowsPerBand, textCol, idCol)

  // --- exact threshold-Jaccard ---
  final case class JaccardPrefixIndex(dfTab: DataFrame, docIndex: DataFrame,
      shingleK: Int, tauNum: Int, tauDen: Int, textCol: String,
      idCol: String) extends DedupIndex {
    def save(path: String): Unit = {
      dfTab.write.mode("overwrite").parquet(s"$path/df")
      docIndex.write.mode("overwrite").parquet(s"$path/docs")
      writeMeta(dfTab.sparkSession, path, "jaccard_prefix", Map(
        "shingleK" -> shingleK.toString, "tauNum" -> tauNum.toString,
        "tauDen" -> tauDen.toString, "textCol" -> textCol, "idCol" -> idCol))
    }
    def probe(batch: DataFrame): DataFrame =
      Dedup.jaccardPrefixIncremental(batch, dfTab, docIndex, shingleK,
        tauNum, tauDen, textCol, idCol)
    /** Frozen-order absorption — see [[Dedup.jaccardPrefixIndexAppend]]:
      * batch prefixes rank under the order the probe used; dfTab extends
      * with exactly those keys, keeping every future pair side on one
      * shared total order (the losslessness precondition). */
    def append(batch: DataFrame): JaccardPrefixIndex = {
      val (df2, docs2) = Dedup.jaccardPrefixIndexAppend(batch, dfTab,
        docIndex, shingleK, tauNum, tauDen, textCol, idCol)
      copy(dfTab = df2, docIndex = docs2)
    }
  }
  def buildJaccardPrefix(docs: DataFrame, shingleK: Int = 3,
                         tauNum: Int = 1, tauDen: Int = 5,
                         textCol: String = "text",
                         idCol: String = "doc_id"): JaccardPrefixIndex = {
    val (dfTab, docIndex) =
      Dedup.jaccardPrefixIndex(docs, shingleK, tauNum, tauDen, textCol, idCol)
    JaccardPrefixIndex(dfTab, docIndex, shingleK, tauNum, tauDen,
      textCol, idCol)
  }

  // --- threshold edit distance ---
  final case class EditDistanceIndex(dfTab: DataFrame, strIndex: DataFrame,
      idMap: DataFrame, maxDist: Int, q: Int, textCol: String,
      idCol: String) extends DedupIndex {
    def save(path: String): Unit = {
      dfTab.write.mode("overwrite").parquet(s"$path/df")
      strIndex.write.mode("overwrite").parquet(s"$path/str")
      idMap.write.mode("overwrite").parquet(s"$path/ids")
      writeMeta(dfTab.sparkSession, path, "edit_distance", Map(
        "maxDist" -> maxDist.toString, "q" -> q.toString,
        "textCol" -> textCol, "idCol" -> idCol))
    }
    /** Self-join day-2 semantics (batch ids disjoint from index ids). */
    def probe(batch: DataFrame): DataFrame =
      Dedup.editDistanceIncremental(batch, dfTab, strIndex, idMap,
        maxDist, q, textCol, idCol)
    /** Linkage semantics: batch as the noisy left, index as canonical. */
    def probeLink(batch: DataFrame): DataFrame =
      Dedup.editDistanceLinkIncremental(batch, dfTab, strIndex, idMap,
        maxDist, q, textCol, idCol)
    /** Frozen-order absorption over occurrence-tagged q-grams — see
      * [[Dedup.editDistanceIndexAppend]]. */
    def append(batch: DataFrame): EditDistanceIndex = {
      val (df2, str2, ids2) = Dedup.editDistanceIndexAppend(batch, dfTab,
        strIndex, idMap, maxDist, q, textCol, idCol)
      copy(dfTab = df2, strIndex = str2, idMap = ids2)
    }
  }
  def buildEditDistance(docs: DataFrame, maxDist: Int = 2, q: Int = 2,
                        textCol: String = "text",
                        idCol: String = "doc_id"): EditDistanceIndex = {
    val (dfTab, strIdx, idMap) =
      Dedup.editDistanceIndex(docs, maxDist, q, textCol, idCol)
    EditDistanceIndex(dfTab, strIdx, idMap, maxDist, q, textCol, idCol)
  }

  // --- exact-substring removal ---
  final case class ShingleIndex(shingles: DataFrame, shingleK: Int,
      textCol: String, idCol: String) extends DedupIndex {
    def save(path: String): Unit = {
      shingles.write.mode("overwrite").parquet(s"$path/shingles")
      writeMeta(shingles.sparkSession, path, "shingle", Map(
        "shingleK" -> shingleK.toString, "textCol" -> textCol,
        "idCol" -> idCol))
    }
    def probe(batch: DataFrame): DataFrame =
      Dedup.dupSpansRemovedIncremental(batch, shingles,
        shingleK = shingleK, textCol = textCol, idCol = idCol)
    /** The index is a shingle SET: absorption is union + distinct —
      * identical to a rebuild over the combined corpus. */
    def append(batch: DataFrame): ShingleIndex =
      copy(shingles = shingles.unionByName(
        Dedup.shingleIndex(batch, shingleK, textCol, idCol)).distinct())
  }
  def buildShingle(docs: DataFrame, shingleK: Int = 3,
                   textCol: String = "text",
                   idCol: String = "doc_id"): ShingleIndex =
    ShingleIndex(Dedup.shingleIndex(docs, shingleK, textCol, idCol),
      shingleK, textCol, idCol)

  // --- winnowing / MOSS ---
  final case class WinnowIndex(fingerprints: DataFrame, minShared: Int,
      k: Int, w: Int, maxFpDf: Int, textCol: String, idCol: String)
      extends DedupIndex {
    def save(path: String): Unit = {
      fingerprints.write.mode("overwrite").parquet(s"$path/fingerprints")
      writeMeta(fingerprints.sparkSession, path, "winnow", Map(
        "minShared" -> minShared.toString, "k" -> k.toString,
        "w" -> w.toString, "maxFpDf" -> maxFpDf.toString,
        "textCol" -> textCol, "idCol" -> idCol))
    }
    def probe(batch: DataFrame): DataFrame =
      TextOps.winnowPairsIncremental(batch, fingerprints, minShared, k, w,
        maxFpDf, textCol = textCol, idCol = idCol)
    /** Winnowing is per-document-local, fingerprints are stored
      * UNcapped, and batch ids are disjoint from indexed ids, so
      * absorption is a plain union — identical to a rebuild (the
      * `maxFpDf` cap stays probe-time, evaluated over the grown
      * combined counts exactly as before). */
    def append(batch: DataFrame): WinnowIndex =
      copy(fingerprints = fingerprints.unionByName(
        TextOps.winnowIndex(batch, k, w, textCol, idCol)))
  }
  /** Persist UNcapped fingerprints (`maxFpDf` is a probe-TIME policy:
    * the cap must evaluate on combined history+batch counts — see
    * winnowPairsIncremental — so it rides the meta and applies at each
    * probe, never to the persisted table). */
  def buildWinnow(docs: DataFrame, minShared: Int = 2, k: Int = 3,
                  w: Int = 4, maxFpDf: Int = Int.MaxValue,
                  textCol: String = "text",
                  idCol: String = "doc_id"): WinnowIndex =
    WinnowIndex(TextOps.winnowIndex(docs, k, w, textCol, idCol),
      minShared, k, w, maxFpDf, textCol, idCol)

  // --- CDC chunking ---
  final case class CdcIndex(chunks: DataFrame, w: Int, maskBits: Int,
      textCol: String, idCol: String) extends DedupIndex {
    def save(path: String): Unit = {
      chunks.write.mode("overwrite").parquet(s"$path/chunks")
      writeMeta(chunks.sparkSession, path, "cdc", Map(
        "w" -> w.toString, "maskBits" -> maskBits.toString,
        "textCol" -> textCol, "idCol" -> idCol))
    }
    def probe(batch: DataFrame): DataFrame =
      TextOps.cdcDedupIncremental(batch, chunks, w, maskBits, textCol, idCol)
    /** The chunk store is a hash SET: absorption is union + distinct —
      * identical to re-chunking the combined corpus. */
    def append(batch: DataFrame): CdcIndex =
      copy(chunks = chunks.unionByName(
        TextOps.cdcIndex(batch, w, maskBits, textCol, idCol)).distinct())
  }
  def buildCdc(docs: DataFrame, w: Int = 8, maskBits: Int = 6,
               textCol: String = "text",
               idCol: String = "doc_id"): CdcIndex =
    CdcIndex(TextOps.cdcIndex(docs, w, maskBits, textCol, idCol),
      w, maskBits, textCol, idCol)

  // --- Hamming fingerprints (image/audio/simhash halves) ---
  final case class HammingIndex(bandTable: DataFrame, radius: Int,
      bands: Int, idCol: String, hiCol: String, loCol: String)
      extends DedupIndex {
    def save(path: String): Unit = {
      bandTable.write.mode("overwrite").parquet(s"$path/bands")
      writeMeta(bandTable.sparkSession, path, "hamming", Map(
        "radius" -> radius.toString, "bands" -> bands.toString,
        "idCol" -> idCol, "hiCol" -> hiCol, "loCol" -> loCol))
    }
    /** `batch` carries (idCol, hiCol, loCol) fingerprints. */
    def probe(batch: DataFrame): DataFrame =
      Dedup.hammingBandPairsIncremental(batch, bandTable, radius, bands,
        idCol, hiCol, loCol)
    /** Band rows are per-item: absorption is a union — identical to a
      * rebuild. When the store holds one representative per DISTINCT
      * fingerprint (the near-dup queries' shape), feed `append` only the
      * batch's index-novel fingerprints, or the grown store carries two
      * reps per shared hash and future probes pair against both. */
    def append(batch: DataFrame): HammingIndex =
      copy(bandTable = bandTable.unionByName(
        Dedup.hammingBandTable(batch, bands, idCol, hiCol, loCol)))
  }
  def buildHamming(hashes: DataFrame, radius: Int = 6, bands: Int = 8,
                   idCol: String = "doc_id", hiCol: String = "ahash_hi",
                   loCol: String = "ahash_lo"): HammingIndex = {
    require(radius >= 0 && radius < bands,
      s"lossless guarantee needs radius < bands, got $radius/$bands")
    HammingIndex(Dedup.hammingBandTable(hashes, bands, idCol, hiCol, loCol),
      radius, bands, idCol, hiCol, loCol)
  }

  // --- semantic dedup (cluster-restricted cosine pairs) ---
  /** Day-2 semantic dedup: history embeddings persisted WITH their
    * cluster assignment AND the frozen quantizer that produced it —
    * probing with different centroids than history was assigned under
    * silently loses every cross-side pair whose two ends land in
    * different clusterings, so the centroids ride the store exactly
    * like the IVF family's. */
  final case class ClusterCosineIndex(assigned: DataFrame,
      centroids: Array[Array[Double]], threshold: Double,
      idCol: String, vecCol: String) extends DedupIndex {
    def save(path: String): Unit = {
      val spark = assigned.sparkSession
      import spark.implicits._
      assigned.write.mode("overwrite").parquet(s"$path/assigned")
      centroids.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("cluster", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
      writeMeta(spark, path, "cluster_cosine", Map(
        "threshold" -> threshold.toString,
        "idCol" -> idCol, "vecCol" -> vecCol))
    }
    /** Batch embeddings are assigned with the FROZEN centroids, then
      * cluster-restricted cosine pairs touching the batch. */
    def probe(batch: DataFrame): DataFrame =
      Similarity.cosinePairsIncremental(
        Similarity.withCluster(batch, centroids, vecCol),
        assigned, threshold, idCol, vecCol)
    /** The batch joins history under the SAME frozen quantizer (the
      * invariant this store exists to hold), so absorption is assigning
      * the batch with the stored centroids and unioning — identical to
      * a rebuild with those centroids. Re-fitting the quantizer as the
      * corpus drifts is a REBUILD (buildClusterCosine with new
      * centroids), never an append. */
    def append(batch: DataFrame): ClusterCosineIndex =
      copy(assigned = assigned.unionByName(
        Similarity.withCluster(batch, centroids, vecCol)))
  }
  def buildClusterCosine(emb: DataFrame, centroids: Array[Array[Double]],
                         threshold: Double = 0.9,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): ClusterCosineIndex =
    ClusterCosineIndex(Similarity.withCluster(emb, centroids, vecCol),
      centroids, threshold, idCol, vecCol)

  // --- bitext mining (frozen dst-side pivot stats) ---
  final case class BitextIndex(index: DataFrame, k: Int,
      thresholdMicro: Long, idCol: String, vecCol: String)
      extends DedupIndex {
    def save(path: String): Unit = {
      index.write.mode("overwrite").parquet(s"$path/index")
      writeMeta(index.sparkSession, path, "bitext", Map(
        "k" -> k.toString, "thresholdMicro" -> thresholdMicro.toString,
        "idCol" -> idCol, "vecCol" -> vecCol))
    }
    /** Mine a new src-language embedding batch against the frozen
      * dst-side statistics. */
    def probe(srcEmb: DataFrame): DataFrame =
      Bitext.mineAgainstIndex(srcEmb, index, k, thresholdMicro,
        idCol, vecCol)
    /** Unsupported by design: the index is corpus-GLOBAL dst-side k-NN
      * margin statistics — one new dst document shifts the k-NN
      * averages of its whole neighborhood, so there is no sound union.
      * New src batches need no index change (probe is src-side); absorb
      * new dst docs by rebuilding ([[buildBitext]]) on the index-refresh
      * cadence. */
    def append(batch: DataFrame): DedupIndex =
      throw new UnsupportedOperationException(
        "bitext index stats are corpus-global dst-side k-NN margins — " +
          "rebuild with buildBitext to absorb new dst docs; src batches " +
          "probe without any index change")
  }
  def buildBitext(emb: DataFrame, docs: DataFrame, srcLang: String,
                  dstLang: String, k: Int = 4,
                  thresholdMicro: Long = 1050000L,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  docIdCol: String = "doc_id",
                  langCol: String = "lang"): BitextIndex =
    BitextIndex(Bitext.indexTable(emb, docs, srcLang, dstLang, k,
      idCol, vecCol, docIdCol, langCol), k, thresholdMicro, idCol, vecCol)

  // --- IVF ANN (on-disk partition-pruned layout; centroids ride along) ---

  /** A written IVF layout plus the frozen quantizer that defined it —
    * `searchIvfIndex`'s correctness silently depends on probing with
    * the SAME centroids the lists were written under, so the store
    * persists them with the layout (`_centroids`) and `loadIvf` hands
    * them back. Grows via [[IvfIndex.append]] (same frozen quantizer). */
  final case class IvfIndex(path: String, centroids: Array[Array[Double]],
      k: Int, nprobe: Int, idCol: String, vecCol: String) {
    def search(queries: DataFrame): DataFrame =
      Similarity.searchIvfIndex(queries.sparkSession, s"$path/lists",
        queries, centroids, k, nprobe, idCol, vecCol)
    def append(batch: DataFrame): Unit =
      Similarity.appendIvfIndex(batch, s"$path/lists", centroids, vecCol)
  }
  /** Write corpus lists + centroids + meta at `path` and return the
    * live handle. */
  def writeIvf(corpus: DataFrame, path: String,
               centroids: Array[Array[Double]], k: Int = 5, nprobe: Int = 1,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): IvfIndex = {
    Similarity.writeIvfIndex(corpus, s"$path/lists", centroids, vecCol)
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
    writeMeta(spark, path, "ivf", Map(
      "k" -> k.toString, "nprobe" -> nprobe.toString,
      "idCol" -> idCol, "vecCol" -> vecCol))
    IvfIndex(path, centroids, k, nprobe, idCol, vecCol)
  }
  def loadIvf(spark: SparkSession, path: String): IvfIndex = {
    val m = readMeta(spark, path)
    checkVersion(m, path)
    require(m.getOrElse("family", "") == "ivf",
      s"not an IVF store at $path: family=${m.get("family")}")
    val centroids = spark.read.parquet(s"$path/_centroids")
      .orderBy(col("cluster")).collect()
      .map(_.getAs[Seq[Double]]("centroid").toArray)
    IvfIndex(path, centroids, m("k").toInt, m("nprobe").toInt,
      m("idCol"), m("vecCol"))
  }
}
