package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass bounded-memory sketches over token streams — the aggregation
  * shapes that survive 100 TB: a sketch's state is a fixed cell/register
  * table regardless of corpus size, partial-aggregates combine
  * associatively (map-side combine does most of the work), and nothing
  * vocabulary-sized ever reaches one task.
  *
  * Both sketches draw their hashes from md5, so every cell/register — and
  * therefore every estimate — is deterministic and replicable in plain
  * SQL (the oracle recomputes the identical sketch; there is no seed
  * state to ship).
  */
object Sketches {

  private[graft] def tokenHash(seed: org.apache.spark.sql.Column,
                               token: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), token)), 1, 15),
      16, 10).cast("long")

  /** Count–min sketch audit for heavy hitters (Cormode & Muthukrishnan):
    * build the depth × width cell table in ONE pass over the token
    * stream, then report the exact top-`k` tokens with both their true
    * counts and their CMS estimates (min over rows of the hashed cell) —
    * the estimate is ≥ the truth by construction, and the audit makes
    * the sketch's collision error visible. At scale the exact pass is
    * what you CAN'T afford on the full vocabulary; the sketch costs
    * O(depth·width) memory and one shuffle of (seed, bucket) partials. */
  def cmsHeavyHitters(docs: DataFrame, k: Int = 20, depth: Int = 4,
                      width: Int = 1024,
                      textCol: String = "text"): DataFrame = {
    // ONE tokenize + term-frequency aggregation feeds both the sketch
    // cells and the exact top-k (identical subtree → exchange reused),
    // and the per-seed hash explode runs over DISTINCT tokens weighted
    // by their counts instead of the raw token stream — depth× fewer
    // md5s by the stream/vocabulary ratio, identical cell values
    // (count of occurrences = Σ over distinct tokens of tf) (r11)
    val tf = graft.util.ScanParallelism.fanOut(docs.select(col(textCol)))
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("__tf"))
    val seeds = array((0 until depth).map(lit(_)): _*)
    val cells = tf
      .select(col("token"), col("__tf"), explode(seeds).as("seed"))
      .select(col("seed"), col("__tf"),
        (tokenHash(col("seed"), col("token")) % width).as("bucket"))
      .groupBy(col("seed"), col("bucket")).agg(sum(col("__tf")).as("cell"))
    val top = tf.withColumnRenamed("__tf", "exact_count")
      .orderBy(col("exact_count").desc, col("token")).limit(k)
    val probes = top.select(col("token"), col("exact_count"),
        explode(seeds).as("seed"))
      .select(col("token"), col("exact_count"), col("seed"),
        (tokenHash(col("seed"), col("token")) % width).as("bucket"))
    probes.join(cells, Seq("seed", "bucket"))
      .groupBy(col("token"), col("exact_count"))
      .agg(min(col("cell")).as("cms_count"))
  }

  /** Per-group distinct-token estimate with a 64-register
    * probabilistic counter (HyperLogLog's register table with a
    * trailing-zeros observable — Flajolet–Martin's ρ, geometric with
    * p=1/2 like HLL's leading-zeros, and far simpler to replicate in
    * SQL). Register j keeps the max ρ of the tokens hashing to bucket j;
    * the estimate is α·m²/Σ2^(−M_j), with the register sum carried in
    * scaled integer arithmetic so it is exact and order-free. Reports
    * the exact distinct count alongside, as the sketch-error audit.
    *
    * State per group is 64 longs; the exact side is the expensive
    * distinct the sketch replaces at scale. */
  def hllDistinct(docs: DataFrame, groupCol: String = "lang",
                  textCol: String = "text"): DataFrame = {
    val m = 64
    // Σ2^(−M_j) is kept in INTEGER arithmetic scaled by 2^55
    // (term = 1 << (55 − ρ), ρ ∈ [1, 55]): integer sums are exact and
    // order-free, so the estimate is bit-identical in any engine — the
    // same fixed-point trick the PageRank oracle uses. The α·m²·2^55
    // numerator and final division are single double ops on identical
    // operands, deterministic under IEEE.
    // distinct (group, token) ONCE, shared by the register build and the
    // exact side: max(ρ) over a bucket is unchanged by duplicates, so
    // hashing the deduped stream is identical and the exact-distinct
    // branch reuses the same exchange (r11)
    val toks = graft.util.ScanParallelism
      .fanOut(docs.select(col(groupCol), col(textCol)))
      .select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .distinct()
    val regs = toks
      .select(col(groupCol), tokenHash(lit("h"), col("token")).as("h"))
      .select(col(groupCol), expr(s"h % $m").as("bucket"),
        expr(s"h div $m").as("rest"))
      // ρ = trailing zeros of the 54-bit remainder + 1 (55 when zero);
      // (x & -x) − 1 has exactly t low bits set for t trailing zeros
      .select(col(groupCol), col("bucket"),
        when(col("rest") === 0, lit(55))
          .otherwise(bit_count(expr("(rest & -rest) - 1")) + 1).as("rho"))
      .groupBy(col(groupCol), col("bucket")).agg(max(col("rho")).as("reg"))
    val est = regs.groupBy(col(groupCol))
      // missing buckets (no token hashed there) have register 0 → 2^55
      .agg(sum(expr("shiftleft(1L, 55 - reg)")).as("s"),
        count(lit(1)).as("nb"))
      .select(col(groupCol),
        round(lit((0.709 * (m * m)) * (1L << 55).toDouble) /
          (col("s") + (lit(m.toLong) - col("nb")) * lit(1L << 55)).cast("double"), 4)
          .as("hll_estimate"))
    val exact = toks
      .groupBy(col(groupCol)).agg(count(lit(1)).as("exact_distinct"))
    exact.join(est, Seq(groupCol))
  }

  /** Distributed exact quantiles by histogram refinement — the
    * scalable answer to "p99 over 10¹¹ rows" where a global sort (or a
    * global row_number window) would funnel the corpus through one
    * task, and interpolated approx-percentiles aren't reproducible
    * across engines.
    *
    * Phase 1 (sketch): equi-width bin counts over the integer value
    * domain — one scan, map-side combinable, mergeable across
    * partitions/days by construction; the running-total window runs
    * over ≤ `bins` aggregated rows (the one deliberate tiny
    * single-partition window, same pattern as vocab_growth). Phase 2
    * (refine): each target rank lands in exactly one bin (the unique
    * bin with cum_before < r ≤ cum); only THAT bin's rows — n/bins of
    * the data — are re-extracted via a broadcast semi-join and ranked
    * per-target with a keyed window. Result carries both the sketch
    * estimate (bin lower edge, error ≤ bin width) and the EXACT
    * rank-⌈q·n⌉ order statistic, all in integer arithmetic.
    *
    * The plan references `values` from several branches (bounds, bin
    * counts, refine) — each a 1-column pruned scan. A caller issuing
    * repeated quantile queries over the same corpus should persist the
    * input (or the binned counts) once; the operator itself stays lazy.
    *
    * @param values   rows with an integral `valCol` (pre-scale floats
    *                 to fixed-point — exactness needs integers)
    * @param perMille target quantiles ×1000 (990 = p99)
    * @return (per_mille, n, est, exact, abs_err) */
  def histQuantiles(values: DataFrame, valCol: String, bins: Int = 1024,
                    perMille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = values.select(col(valCol).cast("long").as("__v"))
    val bounds = v.agg(min("__v").as("__lo"), max("__v").as("__hi"),
      count(lit(1)).as("__n"))
    val binned = v.join(broadcast(bounds))
      .withColumn("__w", col("__hi") - col("__lo") + 1)
      .withColumn("__bin", expr(s"((__v - __lo) * $bins) div __w"))
    val cum = binned.groupBy("__bin").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(Window.orderBy(col("__bin"))))
      .withColumn("__bef", col("__cum") - col("__c"))
    val targets = bounds
      .withColumn("__q", explode(array(perMille.map(lit(_)): _*)))
      .withColumn("__r", expr("(__q * __n + 999) div 1000"))
      .withColumn("__wd", col("__hi") - col("__lo") + 1)
    val sel = targets.join(broadcast(cum),
        col("__cum") >= col("__r") && col("__bef") < col("__r"))
      .select(col("__q"), col("__r"), col("__n"), col("__bin"),
        (col("__r") - col("__bef")).as("__rl"),
        (col("__lo") + expr(s"(__bin * __wd) div $bins")).as("__est"))
    val wq = Window.partitionBy(col("__q"))
      .orderBy(col("__v"))
    binned.select(col("__v"), col("__bin"))
      .join(broadcast(sel), "__bin")
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") === col("__rl"))
      .select(col("__q").as("per_mille"), col("__n").as("n"),
        col("__est").as("est"), col("__v").as("exact"),
        abs(col("__v") - col("__est")).as("abs_err"))
  }

  /** WEIGHTED [[histQuantiles]]: the value at the rank where the
    * running WEIGHT crosses ⌈q·W/1000⌉ — "the price below which 90% of
    * the QUANTITY trades", "the doc length below which 99% of TOKENS
    * sit". Same two-phase refinement with weight sums in place of
    * counts; the refine pass finds the crossing row by a running-sum
    * window over the one extracted bin. Integral weights keep every
    * stat exact. */
  def histQuantilesWeighted(values: DataFrame, valCol: String,
                            weightCol: String, bins: Int = 1024,
                            perMille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = values.select(col(valCol).cast("long").as("__v"),
      col(weightCol).cast("long").as("__wt"))
    val bounds = v.agg(min("__v").as("__lo"), max("__v").as("__hi"),
      sum("__wt").as("__n"))
    val binned = v.join(broadcast(bounds))
      .withColumn("__w", col("__hi") - col("__lo") + 1)
      .withColumn("__bin", expr(s"((__v - __lo) * $bins) div __w"))
    val cum = binned.groupBy("__bin").agg(sum("__wt").as("__c"))
      .withColumn("__cum", sum("__c").over(Window.orderBy(col("__bin"))))
      .withColumn("__bef", col("__cum") - col("__c"))
    val targets = bounds
      .withColumn("__q", explode(array(perMille.map(lit(_)): _*)))
      .withColumn("__r", expr("(__q * __n + 999) div 1000"))
      .withColumn("__wd", col("__hi") - col("__lo") + 1)
    val sel = targets.join(broadcast(cum),
        col("__cum") >= col("__r") && col("__bef") < col("__r"))
      .select(col("__q"), col("__n"), col("__bin"),
        (col("__r") - col("__bef")).as("__rl"),
        (col("__lo") + expr(s"(__bin * __wd) div $bins")).as("__est"))
    // running weight inside the extracted bin, ordered by value (ties
    // pre-summed per value so intra-value order cannot matter)
    val byVal = binned.select(col("__v"), col("__bin"), col("__wt"))
      .join(broadcast(sel), "__bin")
      .groupBy(col("__q"), col("__n"), col("__est"), col("__rl"), col("__v"))
      .agg(sum(col("__wt")).as("__vw"))
    val wq = Window.partitionBy(col("__q")).orderBy(col("__v"))
    byVal.withColumn("__cw", sum(col("__vw")).over(wq))
      .filter(col("__cw") >= col("__rl") &&
        col("__cw") - col("__vw") < col("__rl"))
      .select(col("__q").as("per_mille"), col("__n").as("total_weight"),
        col("__est").as("est"), col("__v").as("exact"),
        abs(col("__v") - col("__est")).as("abs_err"))
  }

  /** Per-key [[histQuantiles]] — the form a feature pipeline actually
    * runs ("p99 of every feature/partner/day at once"). Identical
    * two-phase refinement with every stage keyed: bounds and bin
    * counts per key, the rank→bin resolution an equi-join on the key
    * (both sides |keys|·bins-sized), the refine window partitioned by
    * (key, target). No stage sees more than one key's bin subset in
    * one task; no global window anywhere. */
  def histQuantilesByKey(values: DataFrame, keyCol: String, valCol: String,
                         bins: Int = 1024,
                         perMille: Seq[Int] = Seq(500, 900, 990)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = values.select(col(keyCol).as("__k"), col(valCol).cast("long").as("__v"))
    val bounds = v.groupBy("__k").agg(min("__v").as("__lo"),
      max("__v").as("__hi"), count(lit(1)).as("__n"))
    val binned = v.join(bounds, "__k")
      .withColumn("__w", col("__hi") - col("__lo") + 1)
      .withColumn("__bin", expr(s"((__v - __lo) * $bins) div __w"))
    val wc = Window.partitionBy(col("__k")).orderBy(col("__bin"))
    val cum = binned.groupBy("__k", "__bin").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum("__c").over(wc))
      .withColumn("__bef", col("__cum") - col("__c"))
    val targets = bounds
      .withColumn("__q", explode(array(perMille.map(lit(_)): _*)))
      .withColumn("__r", expr("(__q * __n + 999) div 1000"))
      .withColumn("__wd", col("__hi") - col("__lo") + 1)
    val sel = targets.join(cum, Seq("__k"))
      .filter(col("__cum") >= col("__r") && col("__bef") < col("__r"))
      .select(col("__k"), col("__q"), col("__n"), col("__bin"),
        (col("__r") - col("__bef")).as("__rl"),
        (col("__lo") + expr(s"(__bin * __wd) div $bins")).as("__est"))
    val wq = Window.partitionBy(col("__k"), col("__q")).orderBy(col("__v"))
    binned.select(col("__k"), col("__v"), col("__bin"))
      .join(sel, Seq("__k", "__bin"))
      .withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") === col("__rl"))
      .select(col("__k").as(keyCol), col("__q").as("per_mille"),
        col("__n").as("n"), col("__est").as("est"), col("__v").as("exact"),
        abs(col("__v") - col("__est")).as("abs_err"))
  }
}
