package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  * Engine-exact arithmetic: cosines are floored to shifted micro-units
  * (floor(cos·10⁶)+10⁶ ∈ [0, 2·10⁶], so every later value is a
  * non-negative integer and truncating and flooring division agree
  * across engines). Ranking, neighborhood sums, and the margin ratio
  *   margin_micro = s · (n_src + n_dst) · 10⁶ div (Σtop_src + Σtop_dst)
  * are then pure integer ops — order-free and bit-identical in any
  * engine (a float mean would drift with summation order).
  *
  * Scale shape: the pair table here is the |src|×|dst| cross product with
  * the DST SIDE BROADCAST — exact, and the right baseline while one side
  * fits an executor (mining a new crawl against a pivot-language batch).
  * When both sides are corpus-scale, generate the candidate pairs with
  * the cluster-restricted shuffle join ([[Similarity]]'s kNN-graph shape)
  * or the IVF index and feed them through the same margin windows: every
  * window below keys on src_id or dst_id, so nothing in the scoring
  * stage is quadratic — only candidate generation is, and only if you
  * choose brute force. The three same-key window pairs (rank + sum per
  * side, then best-per-src) plan as one exchange per key.
  */
object Bitext {

  /** Best dst-language candidate per src-language doc with ratio margin
    * above `thresholdMicro` (10⁶ = margin 1.0; 1.05·10⁶ is the paper's
    * working point). `k` is the neighborhood size for the margin
    * normalizer. Output: (src_id, dst_id, sim_micro, margin_micro),
    * sim_micro the UNshifted floor(cos·10⁶). */
  def marginPairs(emb: DataFrame, docs: DataFrame,
                  srcLang: String, dstLang: String,
                  k: Int = 4, thresholdMicro: Long = 1050000L,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  docIdCol: String = "doc_id",
                  langCol: String = "lang"): DataFrame =
    scoredPairs(emb, docs, srcLang, dstLang, k, idCol, vecCol, docIdCol,
        langCol)
      .withColumn("best", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("margin_micro").desc, col("dst_id"))))
      .filter(col("best") === 1 && col("margin_micro") > thresholdMicro)
      .select(col("src_id"), col("dst_id"),
        (col("s") - 1000000L).as("sim_micro"), col("margin_micro"))

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
                  langCol: String = "lang"): DataFrame =
    scoredPairs(emb, docs, srcLang, dstLang, k, idCol, vecCol, docIdCol,
        langCol)
      .withColumn("best_fwd", row_number().over(
        Window.partitionBy(col("src_id"))
          .orderBy(col("margin_micro").desc, col("dst_id"))))
      .withColumn("best_bwd", row_number().over(
        Window.partitionBy(col("dst_id"))
          .orderBy(col("margin_micro").desc, col("src_id"))))
      .filter(col("best_fwd") === 1 && col("best_bwd") === 1 &&
        col("margin_micro") > thresholdMicro)
      .select(col("src_id"), col("dst_id"),
        (col("s") - 1000000L).as("sim_micro"), col("margin_micro"))

  /** Shared margin-scored pair table: (src_id, dst_id, s, margin_micro)
    * for every cross-language pair. */
  private def scoredPairs(emb: DataFrame, docs: DataFrame,
                          srcLang: String, dstLang: String, k: Int,
                          idCol: String, vecCol: String,
                          docIdCol: String, langCol: String): DataFrame = {
    require(k > 0, s"neighborhood size k must be positive, got $k")
    val tagged = emb.join(
      docs.select(col(docIdCol).as(idCol), col(langCol)), idCol)
    val srcSide = tagged.filter(col(langCol) === srcLang)
      .select(col(idCol).as("src_id"), col(vecCol).as("src_vec"))
    val dstSide = tagged.filter(col(langCol) === dstLang)
      .select(col(idCol).as("dst_id"), col(vecCol).as("dst_vec"))

    // shifted micro-cosine: non-negative, so div == floor-div everywhere
    val pairs = srcSide.join(broadcast(dstSide))
      .withColumn("s",
        (floor(Similarity.cosine(col("src_vec"), col("dst_vec")) * 1000000d)
          .cast(LongType) + 1000000L))
      .select(col("src_id"), col("dst_id"), col("s"))

    // same-key windows kept ADJACENT so each partitioning's exchange is
    // computed once and shared (alternating src/dst windows would plan
    // five exchanges over the pair table; this shape plans three)
    val bySrc = Window.partitionBy(col("src_id"))
    val byDst = Window.partitionBy(col("dst_id"))
    val scored = pairs
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
      .withColumn("margin_micro",
        expr("s * (cnt_src + cnt_dst) * 1000000 div (sum_src + sum_dst)"))
    scored
  }
}
