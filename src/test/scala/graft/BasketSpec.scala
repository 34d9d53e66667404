package graft

import graft.analysis.Basket

/** Market-basket pair rules: hand-computed supports/confidences/lift on
  * planted baskets, the viral-basket cap, and lazy construction. */
class BasketSpec extends SparkSpec {
  import spark.implicits._

  test("pair rules match hand-computed integer confidences and lift") {
    // baskets: {m,b}, {m,b,e}, {m,e}, {b} → n=4; sup m=3, b=3, e=2;
    // (b,m): sup_ab=2, conf b→m = 2/3, conf m→b = 2/3, lift = 2·4/(3·3)
    val rows = Seq(
      (1L, "m"), (1L, "b"),
      (2L, "m"), (2L, "b"), (2L, "e"),
      (3L, "m"), (3L, "e"),
      (4L, "b")
    ).toDF("basket", "item")
    val got = Basket.pairRules(rows, "basket", "item", minSupport = 2L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r)
      .toMap
    val bm = got(("b", "m"))
    assert(bm.getAs[Long]("sup_ab") == 2L)
    assert(bm.getAs[Long]("sup_a") == 3L && bm.getAs[Long]("sup_b") == 3L)
    assert(bm.getAs[Long]("conf_ab_micro") == 666666L)
    assert(bm.getAs[Long]("conf_ba_micro") == 666666L)
    assert(bm.getAs[Long]("lift_micro") == 888888L) // 8e6/9
    val em = got(("e", "m"))
    assert(em.getAs[Long]("sup_ab") == 2L)
    assert(em.getAs[Long]("conf_ab_micro") == 1000000L) // e ⇒ m always
    assert(em.getAs[Long]("lift_micro") == 1333333L) // 2·4·1e6/(2·3)
    // (b,e) co-occurs once < minSupport → absent
    assert(!got.contains(("b", "e")))
  }

  test("maxBasketSize drops a planted viral basket from every statistic") {
    // basket 99 holds 50 items: uncapped it contributes C(50,2)=1225 pairs
    // and inflates every item support; capped at 10 it must vanish from
    // pair supports, item supports, AND the basket count the lift uses
    val normal = Seq(
      (1L, "x"), (1L, "y"),
      (2L, "x"), (2L, "y"),
      (3L, "x"))
    val viral = (0 until 50).map(i => (99L, s"it$i")) ++
      Seq((99L, "x"), (99L, "y"))
    val df = (normal ++ viral).toDF("basket", "item")
    val capped = Basket.pairRules(df, "basket", "item", minSupport = 2L,
      maxBasketSize = 10).collect()
    val uncapped = Basket.pairRules(df, "basket", "item", minSupport = 2L)
      .collect()
    // capped: only (x,y) with sup 2 of 3 baskets; viral items are gone
    assert(capped.length == 1)
    val xy = capped.head
    assert(xy.getAs[String]("a") == "x" && xy.getAs[String]("b") == "y")
    assert(xy.getAs[Long]("sup_ab") == 2L && xy.getAs[Long]("sup_a") == 3L)
    // lift uses n=3 (viral basket excluded): 2·3·1e6/(3·2) = 1e6
    assert(xy.getAs[Long]("lift_micro") == 1000000L)
    // uncapped at minSupport=1: the viral basket floods the pair table
    // with its C(52,2) singleton pairs; capped at the same support it
    // stays the small-basket rule set
    val flood = Basket.pairRules(df, "basket", "item", minSupport = 1L)
      .count()
    assert(flood > 1000L)
    assert(Basket.pairRules(df, "basket", "item", minSupport = 1L,
      maxBasketSize = 10).count() == 1L)
    // and at minSupport=2 the uncapped run still carries viral-inflated
    // item supports (x appears in the viral basket too): sup_a = 4 not 3
    assert(uncapped.head.getAs[Long]("sup_a") == 4L)
  }

  test("pairRules is lazy: no Spark job until an action") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val plan = Basket.pairRules(
      Seq((1L, "a"), (1L, "b")).toDF("basket", "item"), "basket", "item")
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "plan construction must not run jobs")
    assert(plan.count() >= 0L) // and it still executes
  }

  test("frequentTriples: Apriori pruning equals brute force, ordered a<b<c") {
    // {p,q,r} ×2, {p,q,r,s}, {p,s} → triple (p,q,r) sup 3; (p,q,s),
    // (p,r,s), (q,r,s) sup 1 < minSupport → absent
    val rows = Seq(
      (1L, "p"), (1L, "q"), (1L, "r"),
      (2L, "p"), (2L, "q"), (2L, "r"),
      (3L, "p"), (3L, "q"), (3L, "r"), (3L, "s"),
      (4L, "p"), (4L, "s")
    ).toDF("basket", "item")
    val got = Basket.frequentTriples(rows, "basket", "item", minSupport = 2L)
      .collect()
    assert(got.length == 1)
    val t = got.head
    assert(t.getAs[String]("a") == "p" && t.getAs[String]("b") == "q" &&
      t.getAs[String]("c") == "r")
    assert(t.getAs[Long]("sup_abc") == 3L)
    assert(t.getAs[Long]("sup_ab") == 3L) // (p,q) in baskets 1,2,3
    assert(t.getAs[Long]("conf_ab_c_micro") == 1000000L)
  }
}
