package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — frequent pair mining over
  * (basket, item) rows: which items co-occur beyond chance, the
  * recommender/assortment primitive. For every co-occurring item pair
  * (a < b): joint support, each side's support, both directed
  * confidences, and lift — all derived from exact integer counts with
  * micro-unit integral division, so the report is bit-identical across
  * engines (confidence/lift as floats would drift).
  *
  * Scale shape: one distinct over (basket, item), an inverted-index
  * self-join on the BASKET key (work Σ|basket|² — bounded by basket
  * sizes, never corpus-quadratic; cap pathological baskets upstream
  * with `maxBasketSize`), and item/pair aggregations with map-side
  * combine. `minSupport` prunes the pair tail before it shuffles into
  * the rollup. */
object Basket {

  /** The distinct (basket, item) table both basket operators start from
    * — exposed so a caller can compute it once and pass it to
    * [[pairRules]] and [[frequentTriples]] via `biIn` (the shared-
    * artifact convention of minhash signatures / bm25 scores). */
  def basketItems(rows: DataFrame, basketCol: String,
                  itemCol: String): DataFrame =
    rows.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()

  /** Frequent-pair supports over the (deduped, size-capped) basket table:
    * (a, b, sup_ab) for every co-occurring pair with
    * sup_ab ≥ minSupport. This is the ONE expensive aggregation of the
    * basket family (the in-basket pair self-join) — [[pairRules]] and
    * [[frequentTriples]] both consume it, so compute it once and share. */
  def pairSupports(bi: DataFrame, minSupport: Long = 2L,
                   maxBasketSize: Int = Int.MaxValue): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1: $minSupport")
    val sized =
      if (maxBasketSize == Int.MaxValue) bi
      else bi.join(
        bi.groupBy(col("b")).agg(count(lit(1)).as("__sz"))
          .filter(col("__sz") <= maxBasketSize).select(col("b")),
        Seq("b"), "leftsemi")
    sized.as("x").join(sized.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSupport)
  }

  /** INVARIANT for the shared-artifact inputs: `biIn` must be
    * `basketItems(rows, basketCol, itemCol)` for THESE arguments, and
    * `pairSupIn` must be `pairSupports(biIn, minSupport, maxBasketSize)`
    * for THESE `minSupport`/`maxBasketSize` — a precomputed table built
    * with different parameters is silently wrong (the parameters cannot
    * be recovered from a DataFrame to `require` on). SparkEntry's
    * artifact layer passes matching builds; external callers own the
    * same obligation. */
  def pairRules(rows: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long = 2L,
                maxBasketSize: Int = Int.MaxValue,
                biIn: Option[DataFrame] = None,
                pairSupIn: Option[DataFrame] = None): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1: $minSupport")
    val bi = biIn.getOrElse(basketItems(rows, basketCol, itemCol))
    val sized =
      if (maxBasketSize == Int.MaxValue) bi
      else bi.join(
        bi.groupBy(col("b")).agg(count(lit(1)).as("__sz"))
          .filter(col("__sz") <= maxBasketSize).select(col("b")),
        Seq("b"), "leftsemi")
    // basket count as a 1-row aggregate joined into the plan (broadcast),
    // NOT an eager .count() at plan-construction time — pairRules stays
    // lazy like every other operator, and the count is computed inside
    // the same job as the rules
    val nb = sized.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemSup = sized.groupBy(col("i")).agg(count(lit(1)).as("sup"))
    val pairSup = pairSupIn
      .getOrElse(pairSupports(bi, minSupport, maxBasketSize))
    pairSup
      .join(itemSup.select(col("i").as("a"), col("sup").as("sup_a")), Seq("a"))
      .join(itemSup.select(col("i").as("b"), col("sup").as("sup_b")), Seq("b"))
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("sup_ab"), col("sup_a"), col("sup_b"),
        expr("sup_ab * 1000000 div sup_a").as("conf_ab_micro"),
        expr("sup_ab * 1000000 div sup_b").as("conf_ba_micro"),
        // DECIMAL(38,0) intermediates: sup_ab·n·10⁶ approaches n²·10⁶,
        // past Long at ~3·10⁶ baskets; decimal128 holds to 10¹⁶ baskets
        // and `div` still emits the exact integral quotient as BIGINT
        expr("""CAST(sup_ab AS DECIMAL(38,0)) * n_baskets * 1000000
               |div (CAST(sup_a AS DECIMAL(38,0)) * sup_b)""".stripMargin)
          .as("lift_micro"))
  }

  /** Frequent item TRIPLES via Apriori level-wise pruning (Agrawal &
    * Srikant 1994): a triple can only be frequent if all three of its
    * pairs are, so the basket-level triple enumeration is restricted to
    * frequent items first and frequent PAIRS second — the classic
    * guard that keeps Σ|basket|³ from materializing. The oracle runs
    * the unpruned brute-force 3-way self-join, so the green row proves
    * the pruning lossless, not just plausible.
    *
    * Scale shape: L1/L2 are support-pruned aggregate tables (vocabulary-
    * sized); the enumeration joins are all keyed on the basket id with
    * leftsemi prunes against L2 BEFORE the third item fans out; the
    * final count has map-side combine. conf((a,b)→c) in exact micro
    * units via integral division. */
  def frequentTriples(rows: DataFrame, basketCol: String, itemCol: String,
                      minSupport: Long = 2L,
                      maxBasketSize: Int = Int.MaxValue,
                      biIn: Option[DataFrame] = None,
                      pairSupIn: Option[DataFrame] = None): DataFrame = {
    require(minSupport >= 1L, s"minSupport must be >= 1: $minSupport")
    val bi0 = biIn.getOrElse(basketItems(rows, basketCol, itemCol))
    val sized =
      if (maxBasketSize == Int.MaxValue) bi0
      else bi0.join(
        bi0.groupBy(col("b")).agg(count(lit(1)).as("__sz"))
          .filter(col("__sz") <= maxBasketSize).select(col("b")),
        Seq("b"), "leftsemi")
    // L2: frequent pairs — the family's one expensive aggregation,
    // shareable via pairSupIn. (A pair with sup ≥ minSupport necessarily
    // has both items at sup ≥ minSupport, so the former explicit L1 item
    // prune before the pair count changed nothing about L2 — the pair
    // table is computed over the full basket table and L1 falls out of
    // it. The L1 prune the triples need is the STRONGER l2-items prune
    // below.)
    val l2 = pairSupIn
      .getOrElse(pairSupports(bi0, minSupport, maxBasketSize))
      .select(col("a").as("i1"), col("b").as("i2"), col("sup_ab"))
    // r11 Apriori strengthening: every item of a qualifying triple
    // appears in some L2 pair — (i1,i2), (i1,i3), (i2,i3) must ALL be
    // L2-frequent — so the basket table is pruned to L2 ITEMS before
    // any triple enumeration. The candidate join then runs over the
    // (usually tiny) L2-supported slice of the corpus instead of the
    // full basket table; the leftsemi checks below are unchanged, so
    // the result is identical (the prune can only drop rows those
    // checks reject).
    val l2Items = l2.select(col("i1").as("i"))
      .unionByName(l2.select(col("i2").as("i"))).distinct()
    val bi = sized.join(l2Items, Seq("i"), "leftsemi")
    val pairsInBasket = bi.as("x").join(bi.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .select(col("x.b").as("b"), col("x.i").as("i1"), col("y.i").as("i2"))
    // enumerate third items only off L2-frequent in-basket pairs, and
    // require the two new pairs (i1,i3), (i2,i3) frequent too before
    // counting — full Apriori candidate pruning, all keyed joins
    val pb = pairsInBasket
      .join(l2.select(col("i1"), col("i2")), Seq("i1", "i2"), "leftsemi")
    val triplesInBasket = pb.join(bi.as("z"),
        pb("b") === col("z.b") && col("z.i") > pb("i2"))
      .select(col("i1"), col("i2"), col("z.i").as("i3"))
      .join(l2.select(col("i1"), col("i2").as("i3")),
        Seq("i1", "i3"), "leftsemi")
      .join(l2.select(col("i1").as("i2"), col("i2").as("i3")),
        Seq("i2", "i3"), "leftsemi")
    triplesInBasket.groupBy(col("i1"), col("i2"), col("i3"))
      .agg(count(lit(1)).as("sup_abc"))
      .filter(col("sup_abc") >= minSupport)
      .join(l2.select(col("i1"), col("i2"), col("sup_ab")), Seq("i1", "i2"))
      .select(col("i1").as("a"), col("i2").as("b"), col("i3").as("c"),
        col("sup_abc"), col("sup_ab"),
        expr("sup_abc * 1000000 div sup_ab").as("conf_ab_c_micro"))
  }
}
