package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Cross-lingual parallel-candidate mining over an embedding column —
  * the LASER/CCMatrix bitext-mining workload: for every document in a
  * source language, find its best translation candidate in a target
  * language, scored by the ratio MARGIN criterion (Artetxe & Schwenk,
  * "Margin-based Parallel Corpus Mining") rather than raw cosine.
  * Raw cosine over-selects "hub" sentences that are close to everything;
  * the margin normalizes each pair's similarity by the average similarity
  * of both endpoints' k-nearest neighborhoods, so only pairs that are
  * MUTUALLY unusually close survive.
  *
  * Engine-exact arithmetic, two layers:
  *
  *  1. The cosine itself is computed from INTEGER sufficient statistics:
  *     each embedding component is quantized to micro-units
  *     (`floor(x·10⁶)` as a long — [[graft.functions.VecDotMicro]] /
  *     [[graft.functions.VecNorm2Micro]]), so the dot product and both
  *     squared norms are order-free exact integers in any engine. The
  *     final `s = floor(dot · 10⁶ / sqrt(na2 · nb2))` is ONE fixed IEEE
  *     expression tree (cast, multiply, sqrt, divide, floor — each
  *     correctly rounded by IEEE 754) over identical integer inputs, so
  *     it is bit-identical across engines. A float cosine accumulated in
  *     loop order (the usual kernel) differs in the last ulp between
  *     engines and flips `floor` at micro-unit boundaries.
  *  2. The margin is the TRUE unshifted Artetxe-Schwenk ratio
  *     `cos(x,y) / mean(top-k neighborhood cosines)`, carried as
  *     `margin_micro = s·(cnt_src+cnt_dst)·10⁶ / (sum_src+sum_dst)` with
  *     sign-explicit integer division: `sign(num)·sign(den)·
  *     (|num| div |den|)` — truncating and flooring division agree on
  *     non-negative operands, so the CASE is engine-exact even when a
  *     cosine or a neighborhood sum is negative. A zero denominator
  *     (degenerate all-zero neighborhood) maps to a signed sentinel
  *     (±9·10¹⁵, above any finite margin). The default thresholds are
  *     therefore honest paper values: 1.05·10⁶ IS the ratio 1.05.
  *
  * Scale shape — SAFE BY DEFAULT: while the dst side fits a broadcast
  * budget (`maxBroadcastRows`, probed with a LIMIT-bounded count), the
  * pair table is the exact |src|×|dst| cross product with the dst side
  * broadcast — the right baseline for mining a new crawl against a
  * pivot-language batch. A dst side over budget AUTO-ROUTES through
  * [[Bitext.clusterCandidates]] — a shared-quantizer cluster-probe
  * join, shuffle-keyed, never quadratic — so calling the API with two
  * corpus-scale sides can no longer detonate a broadcast cross join.
  * Pass `candidates` explicitly to control the generator (e.g. tuned
  * nClusters/nProbe), or `maxBroadcastRows = Long.MaxValue` to pin
  * exact brute force. Under candidates, the margin windows run over the
  * candidate pairs only, and each pair's neighborhood is its top-k
  * within the candidate set — the standard approximation deployed
  * miners make (FAISS-retrieved neighborhoods).
  * Every window below keys on src_id or dst_id, so nothing in the
  * scoring stage is quadratic — only candidate generation is, and only
  * if you choose brute force. The three same-key window pairs (rank +
  * sum per side, then best-per-src) plan as one exchange per key.
  */
object Bitext {

  /** Best dst-language candidate per src-language doc with ratio margin
    * above `thresholdMicro` (10⁶ = margin 1.0; 1.05·10⁶ is the paper's
    * working point — the margin here is the UNSHIFTED ratio, so the
    * threshold is used at face value). `k` is the neighborhood size for
    * the margin normalizer. Output: (src_id, dst_id, sim_micro,
    * margin_micro), sim_micro the quantized-cosine `s` in micro-units. */
  def marginPairs(emb: DataFrame, docs: DataFrame,
                  srcLang: String, dstLang: String,
                  k: Int = 4, thresholdMicro: Long = 1050000L,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  docIdCol: String = "doc_id",
                  langCol: String = "lang",
                  candidates: Option[DataFrame] = None,
                  maxBroadcastRows: Long = 200000L): DataFrame =
    marginFromScored(scoredPairs(emb, docs, srcLang, dstLang, k, idCol,
      vecCol, docIdCol, langCol, candidates, maxBroadcastRows),
      thresholdMicro)

  /** The margin-best selection alone, over a PREBUILT scored pair table
    * ([[scoredPairs]]) — share one scoring run between [[marginPairs]]
    * and [[mutualPairs]] consumers (the table is the expensive part;
    * each selection is one window). */
  def marginFromScored(scored: DataFrame,
                       thresholdMicro: Long = 1050000L): DataFrame =
    scored
      .withColumn("best", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("margin_micro").desc, col("dst_id"))))
      .filter(col("best") === 1 && col("margin_micro") > thresholdMicro)
      .select(col("src_id"), col("dst_id"),
        col("s").as("sim_micro"), col("margin_micro"))

  /** MUTUAL best matches — the working criterion of deployed bitext
    * miners: (a, b) survives only if b is a's best candidate by margin
    * AND a is b's best. The margin value itself is direction-symmetric
    * (it normalizes by both endpoints' neighborhoods), so mutuality is
    * two argmax windows over the SAME scored pair table — one more
    * exchange, not a second mining pass. Stricter than [[marginPairs]]:
    * output ⊆ the forward run, and hubs that win several forward rows
    * keep at most one. */
  def mutualPairs(emb: DataFrame, docs: DataFrame,
                  srcLang: String, dstLang: String,
                  k: Int = 4, thresholdMicro: Long = 1000000L,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  docIdCol: String = "doc_id",
                  langCol: String = "lang",
                  candidates: Option[DataFrame] = None,
                  maxBroadcastRows: Long = 200000L): DataFrame =
    mutualFromScored(scoredPairs(emb, docs, srcLang, dstLang, k, idCol,
      vecCol, docIdCol, langCol, candidates, maxBroadcastRows),
      thresholdMicro)

  /** [[mutualPairs]]' selection over a prebuilt scored table — see
    * [[marginFromScored]]. */
  def mutualFromScored(scored: DataFrame,
                       thresholdMicro: Long = 1000000L): DataFrame =
    scored
      .withColumn("best_fwd", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("margin_micro").desc, col("dst_id"))))
      .withColumn("best_bwd", row_number().over(
        Window.partitionBy(col("dst_id"))
          .orderBy(col("margin_micro").desc, col("src_id"))))
      .filter(col("best_fwd") === 1 && col("best_bwd") === 1 &&
        col("margin_micro") > thresholdMicro)
      .select(col("src_id"), col("dst_id"),
        col("s").as("sim_micro"), col("margin_micro"))

  /** Scale-safe candidate generation: both language sides are assigned
    * to the SAME learned coarse quantizer (the IVF playbook —
    * [[Similarity.kmeansFit]] on the union), the src side probes its
    * `nprobe` nearest centroids, and candidates are the src-probe ×
    * dst-assignment pairs joined ON THE CLUSTER KEY — a keyed shuffle
    * join whose output is Σ_c |src probing c|·|dst in c|, never the
    * |src|×|dst| cross product. Raising `nprobe` (or `nClusters`↓)
    * trades candidate recall against pair count, exactly like IVF
    * search. Output: (src_id, dst_id) distinct pairs for
    * [[marginPairs]]/[[mutualPairs]]' `candidates` input. */
  def clusterCandidates(emb: DataFrame, docs: DataFrame,
                        srcLang: String, dstLang: String,
                        nClusters: Int = 8, nProbe: Int = 2,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        docIdCol: String = "doc_id",
                        langCol: String = "lang",
                        centroids: Option[Array[Array[Double]]] = None)
      : DataFrame = {
    val tagged = emb.join(
      docs.select(col(docIdCol).as(idCol), col(langCol)), idCol)
    // frozen centroids (a session-shared quantizer fit) skip the union
    // fit — the index-maintenance shape, and what an eval run shares
    // with the ANN family's memoized model
    val cents = centroids.getOrElse {
      val both = tagged.filter(col(langCol).isin(srcLang, dstLang))
      Similarity.kmeansFit(both, nClusters, idCol = idCol, vecCol = vecCol)
    }
    val srcProbes = Similarity.kmeansProbe(
        tagged.filter(col(langCol) === srcLang), cents, nProbe,
        idCol = idCol, vecCol = vecCol)
      .select(col(idCol).as("src_id"), col("cluster"))
    val dstAssign = Similarity.withCluster(
        tagged.filter(col(langCol) === dstLang), cents, vecCol = vecCol)
      .select(col(idCol).as("dst_id"), col("cluster"))
    srcProbes.join(dstAssign, "cluster")
      .select(col("src_id"), col("dst_id")).distinct()
  }

  /** The margin rule as ONE Scala definition: sign-explicit integer
    * division with the zero-denominator sentinel — the exact semantics
    * of the SQL CASE in [[scoredPairs]] (a spec pins the two together
    * over the full sign/zero grid, so the streaming kernel can never
    * drift from the batch expression). */
  def signedMarginMicro(num: Long, den: Long): Long =
    if (den == 0L) {
      if (num > 0L) 9000000000000000L
      else if (num < 0L) -9000000000000000L else 0L
    }
    else if ((num >= 0L) == (den > 0L)) math.abs(num) / math.abs(den)
    else -(math.abs(num) / math.abs(den))

  /** One frozen dst-side index row: the quantized vector + norm² (the
    * scoring sufficient statistics) and the dst neighborhood sum/count
    * from the reference mining run (the margin normalizer). */
  case class IndexEntry(dstId: Long, qvec: Array[Long], nb2: Long,
                        sumDst: Long, cntDst: Long)

  /** Build the frozen dst-side index for STREAMING mining
    * ([[graft.streaming.StreamingOps.bitextMine]]): run the reference
    * corpus through the batch scorer once, freeze each dst doc's
    * neighborhood statistics, and pack them with its micro-quantized
    * vector. The collect is bounded by the PIVOT BATCH size — the same
    * one-side-fits contract as the broadcast cross join; a corpus-scale
    * dst side belongs in the batch candidate path, not here. Replaying
    * the index's own src side through the stream reproduces the batch
    * [[marginPairs]] output exactly (spec-proved). */
  def buildIndex(emb: DataFrame, docs: DataFrame,
                 srcLang: String, dstLang: String, k: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 docIdCol: String = "doc_id",
                 langCol: String = "lang"): Array[IndexEntry] = {
    import graft.functions.VecMath.norm2Micro
    val stats = scoredPairs(emb, docs, srcLang, dstLang, k, idCol, vecCol,
        docIdCol, langCol, None, maxBroadcastRows = Long.MaxValue)
      .select(col("dst_id"), col("sum_dst"), col("cnt_dst")).distinct()
    val tagged = emb.join(
      docs.select(col(docIdCol).as(idCol), col(langCol)), idCol)
    val dstVecs = tagged.filter(col(langCol) === dstLang)
      .select(col(idCol).as("dst_id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1000000d))).as("qvec"),
        norm2Micro(col(vecCol)).as("nb2"))
    dstVecs.join(stats, Seq("dst_id"))
      .select(col("dst_id"), col("qvec"), col("nb2"),
        col("sum_dst"), col("cnt_dst"))
      .collect()
      .map(r => IndexEntry(r.getLong(0), r.getSeq[Long](1).toArray,
        r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_.dstId)
  }

  /** The frozen dst-side index as a DATAFRAME — [[buildIndex]] without
    * the driver collect: one row per pivot (dst) document carrying its
    * raw vector, micro norm², and the reference mining run's frozen
    * neighborhood statistics. Write it to parquet once per corpus
    * snapshot and mine every later batch against it with
    * [[mineAgainstIndex]] — the batch day-2 shape the dedup families'
    * band/prefix indexes established, for bitext. Unlike the collected
    * [[IndexEntry]] array (the STREAMING path's executor-broadcast form,
    * bounded by the pivot-batch contract), this table never touches the
    * driver, so index builds stay distributed end to end. */
  def indexTable(emb: DataFrame, docs: DataFrame,
                 srcLang: String, dstLang: String, k: Int = 4,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 docIdCol: String = "doc_id",
                 langCol: String = "lang"): DataFrame = {
    import graft.functions.VecMath.norm2Micro
    val stats = scoredPairs(emb, docs, srcLang, dstLang, k, idCol, vecCol,
        docIdCol, langCol, None, maxBroadcastRows = Long.MaxValue)
      .select(col("dst_id"), col("sum_dst"), col("cnt_dst")).distinct()
    val tagged = emb.join(
      docs.select(col(docIdCol).as(idCol), col(langCol)), idCol)
    tagged.filter(col(langCol) === dstLang)
      .select(col(idCol).as("dst_id"), col(vecCol).as("dst_vec"),
        norm2Micro(col(vecCol)).as("nb2"))
      .join(stats, Seq("dst_id"))
  }

  /** Day-2 batch bitext mining: score a NEW batch of src-language
    * documents against the persisted [[indexTable]] — each new doc's own
    * top-k neighborhood is computed over the index, the dst side keeps
    * its FROZEN reference-run statistics, and the margin rule, ordering,
    * and threshold are the batch kernel's exactly (the same semantics as
    * the streaming miner, relationally — a parity spec pins the three
    * paths together). The index is a bounded pivot batch, so it rides a
    * broadcast join: per-src work is O(|index|·dim) with NO shuffle of
    * the index side and no driver-side loop; the src side streams
    * through at any cardinality. */
  def mineAgainstIndex(srcEmb: DataFrame, index: DataFrame, k: Int = 4,
                       thresholdMicro: Long = 1050000L,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"neighborhood size k must be positive, got $k")
    import graft.functions.VecMath.{dotMicro, norm2Micro}
    val src = srcEmb.select(col(idCol).as("src_id"), col(vecCol).as("src_vec"),
      norm2Micro(col(vecCol)).as("na2"))
    val bySrc = Window.partitionBy(col("src_id"))
    src.join(broadcast(index))
      .withColumn("dot", dotMicro(col("src_vec"), col("dst_vec")))
      .withColumn("s",
        when(col("na2") === 0L || col("nb2") === 0L, lit(0L))
          .otherwise(floor(col("dot").cast(DoubleType) * lit(1000000d) /
            sqrt(col("na2").cast(DoubleType) * col("nb2").cast(DoubleType)))))
      .select(col("src_id"), col("dst_id"), col("s"),
        col("sum_dst"), col("cnt_dst"))
      .withColumn("rn_src", row_number().over(
        bySrc.orderBy(col("s").desc, col("dst_id"))))
      .withColumn("sum_src",
        sum(when(col("rn_src") <= k, col("s"))).over(bySrc))
      .withColumn("cnt_src",
        sum(when(col("rn_src") <= k, 1L)).over(bySrc))
      .withColumn("num",
        col("s") * (col("cnt_src") + col("cnt_dst")) * lit(1000000L))
      .withColumn("den", col("sum_src") + col("sum_dst"))
      .withColumn("margin_micro", expr(
        """CASE WHEN den = 0 THEN
          |       CASE WHEN num > 0 THEN 9000000000000000
          |            WHEN num < 0 THEN -9000000000000000 ELSE 0 END
          |     WHEN (num >= 0) = (den > 0) THEN abs(num) div abs(den)
          |     ELSE -(abs(num) div abs(den)) END""".stripMargin))
      .withColumn("best", row_number().over(
        bySrc.orderBy(col("margin_micro").desc, col("dst_id"))))
      .filter(col("best") === 1 && col("margin_micro") > thresholdMicro)
      .select(col("src_id"), col("dst_id"),
        col("s").as("sim_micro"), col("margin_micro"))
  }

  /** Shared margin-scored pair table: (src_id, dst_id, s, margin_micro)
    * for every cross-language pair (brute force) or candidate pair.
    * Public so callers can build it ONCE and run both selections
    * ([[marginFromScored]], [[mutualFromScored]]) over it. */
  def scoredPairs(emb: DataFrame, docs: DataFrame,
                  srcLang: String, dstLang: String, k: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  docIdCol: String = "doc_id", langCol: String = "lang",
                  candidates: Option[DataFrame] = None,
                  maxBroadcastRows: Long = 200000L): DataFrame = {
    require(k > 0, s"neighborhood size k must be positive, got $k")
    import graft.functions.VecMath.{dotMicro, norm2Micro}
    val tagged = emb.join(
      docs.select(col(docIdCol).as(idCol), col(langCol)), idCol)
    // squared norms computed ONCE per vector, not per pair
    val srcSide = tagged.filter(col(langCol) === srcLang)
      .select(col(idCol).as("src_id"), col(vecCol).as("src_vec"),
        norm2Micro(col(vecCol)).as("na2"))
    val dstSide = tagged.filter(col(langCol) === dstLang)
      .select(col(idCol).as("dst_id"), col(vecCol).as("dst_vec"),
        norm2Micro(col(vecCol)).as("nb2"))

    // Adaptive default (safe-by-default at corpus scale): with no
    // explicit candidate table, the dst side's cardinality is probed
    // with a LIMIT-bounded count (the job short-circuits at
    // maxBroadcastRows+1 rows — never a full scan of a huge side).
    // Within budget → exact broadcast cross scoring; over budget →
    // auto-route through [[clusterCandidates]]' keyed cluster-probe
    // join, the same approximation a deployed miner makes explicitly.
    // Pass `maxBroadcastRows = Long.MaxValue` to pin brute force (the
    // frozen-index builder does — its size contract is the caller's).
    val autoCandidates: Option[DataFrame] =
      if (candidates.isDefined || maxBroadcastRows == Long.MaxValue) candidates
      else {
        val probeN = dstSide
          .limit(math.min(maxBroadcastRows + 1, Int.MaxValue.toLong).toInt)
          .count()
        if (probeN <= maxBroadcastRows) None
        else Some(clusterCandidates(emb, docs, srcLang, dstLang,
          idCol = idCol, vecCol = vecCol, docIdCol = docIdCol,
          langCol = langCol))
      }

    val joined = autoCandidates match {
      case Some(cand) =>
        // keyed shuffle joins — the corpus-scale path. The candidate
        // table is DEDUPED first: a duplicated (src,dst) row would
        // count the same pair twice in the top-k rank/sum windows and
        // silently corrupt every margin in that neighborhood (multi-
        // probe generators naturally emit repeats).
        cand.select(col("src_id"), col("dst_id")).distinct()
          .join(srcSide, "src_id").join(dstSide, "dst_id")
      case None => srcSide.join(broadcast(dstSide))
    }

    // quantized micro-cosine: integer dot and norms (order-free exact),
    // then one fixed IEEE expression — deterministic in every engine
    val pairs = joined
      .withColumn("dot", dotMicro(col("src_vec"), col("dst_vec")))
      .withColumn("s",
        when(col("na2") === 0L || col("nb2") === 0L, lit(0L))
          .otherwise(floor(col("dot").cast(DoubleType) * lit(1000000d) /
            sqrt(col("na2").cast(DoubleType) * col("nb2").cast(DoubleType)))))
      .select(col("src_id"), col("dst_id"), col("s"))

    // same-key windows kept ADJACENT so each partitioning's exchange is
    // computed once and shared (alternating src/dst windows would plan
    // five exchanges over the pair table; this shape plans three)
    val bySrc = Window.partitionBy(col("src_id"))
    val byDst = Window.partitionBy(col("dst_id"))
    pairs
      .withColumn("rn_src", row_number().over(
        bySrc.orderBy(col("s").desc, col("dst_id"))))
      .withColumn("sum_src",
        sum(when(col("rn_src") <= k, col("s"))).over(bySrc))
      // the numerator scales by the ACTUAL neighborhood sizes (≤ k when
      // a side has fewer than k candidates): a fixed 2k numerator over
      // short sums would inflate margins on small language sides. cnt
      // windows sit adjacent to their same-key sum so each exchange is
      // still shared.
      .withColumn("cnt_src",
        sum(when(col("rn_src") <= k, 1L)).over(bySrc))
      .withColumn("rn_dst", row_number().over(
        byDst.orderBy(col("s").desc, col("src_id"))))
      .withColumn("sum_dst",
        sum(when(col("rn_dst") <= k, col("s"))).over(byDst))
      .withColumn("cnt_dst",
        sum(when(col("rn_dst") <= k, 1L)).over(byDst))
      // true ratio margin, sign-explicit integer division (see header)
      .withColumn("num",
        col("s") * (col("cnt_src") + col("cnt_dst")) * lit(1000000L))
      .withColumn("den", col("sum_src") + col("sum_dst"))
      .withColumn("margin_micro", expr(
        """CASE WHEN den = 0 THEN
          |       CASE WHEN num > 0 THEN 9000000000000000
          |            WHEN num < 0 THEN -9000000000000000 ELSE 0 END
          |     WHEN (num >= 0) = (den > 0) THEN abs(num) div abs(den)
          |     ELSE -(abs(num) div abs(den)) END""".stripMargin))
  }
}
