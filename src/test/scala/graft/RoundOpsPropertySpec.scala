package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.analysis.{Autocorr, Drift, MergeApply}
import graft.functions.TopKLongs
import graft.scale.Sketches

/** Randomized ground-truth validation of this round's operators: each
  * distributed result must equal an independent single-threaded Scala
  * computation over the same generated data (fixed seeds — failures
  * reproduce). */
class RoundOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("histQuantiles exact values equal sorted-rank selection (20 random sets)") {
    val rng = new Random(42)
    for (trial <- 1 to 20) {
      val n = 1 + rng.nextInt(400)
      val vals = Seq.fill(n)((rng.nextInt(2000) - 700).toLong)
      val pm = Seq(250, 500, 750, 990)
      val out = Sketches.histQuantiles(vals.toDF("x"), "x",
          bins = 1 + rng.nextInt(32), perMille = pm)
        .select("per_mille", "exact").as[(Int, Long)].collect().toMap
      val sorted = vals.sorted
      pm.foreach { q =>
        val r = (q * n + 999) / 1000
        assert(out(q) === sorted(r - 1),
          s"trial $trial q=$q n=$n: got ${out(q)}, want ${sorted(r - 1)}")
      }
    }
  }

  test("TopKLongs equals sort-take on random keyed data") {
    val rng = new Random(7)
    val rows = Seq.fill(3000)((rng.nextInt(11), rng.nextInt(50).toLong,
      rng.nextLong(1000000).abs))
    val k = 5
    val agg = rows.toDF("key", "ord", "id")
      .groupBy($"key").agg(TopKLongs.topK(k, $"ord", $"id").as("t"))
      .select($"key", posexplode($"t"))
      .select($"key", $"pos", $"col.ord", $"col.payload")
      .as[(Int, Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    rows.groupBy(_._1).foreach { case (key, g) =>
      val want = g.map(r => (r._2, r._3)).sorted(
        Ordering[(Long, Long)].reverse).take(k)
      assert(agg(key) === want, s"key $key")
    }
  }

  test("MergeApply equals a per-key fold on random change logs") {
    val rng = new Random(11)
    val ops = Array("I", "U", "D")
    val rows = Seq.tabulate(2000)(i => (rng.nextInt(40).toLong,
      rng.nextInt(100).toLong, i.toLong, ops(rng.nextInt(3)),
      rng.nextInt(1000).toLong))
    val out = MergeApply.applyCdc(rows.toDF("k", "seq", "id", "op", "v"),
        Seq("k"), "seq", Seq("id"), "op")
      .select("k", "v").as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val winner = g.maxBy(r => (r._2, r._3))
      if (winner._4 == "D") assert(!out.contains(k), s"key $k should be deleted")
      else assert(out(k) === winner._5, s"key $k")
    }
  }

  test("keepBestByComponents keeps the top-scoring member per cluster") {
    import graft.scale.Dedup
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (4L, 7L), (9L, 1L))
      .toDF("doc_id", "score")
    // cluster {1,2,3} (canonical 1), singleton 4 implicit, 9 labeled self
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("node", "component")
    val kept = Dedup.keepBestByComponents(docs, comps, "score")
      .select("doc_id").as[Long].collect().sorted
    // best of {1,2,3} is 2 (score 50, tie vs 3 broken by lower id);
    // min-id retention would have kept 1 — the whole point
    assert(kept.toSeq === Seq(2L, 4L, 9L))
    val minId = Dedup.dropByComponents(docs, comps)
      .select("doc_id").as[Long].collect().sorted
    assert(minId.toSeq === Seq(1L, 4L, 9L))
  }

  test("tvDrift equals the direct two-histogram computation") {
    val rng = new Random(23)
    for (_ <- 1 to 5) {
      val rows = Seq.fill(800)(("k", (rng.nextInt(500) - 100).toLong,
        rng.nextInt(2)))
      val bins = 1 + rng.nextInt(24)
      val (n1, n2, tv) = Drift.tvDrift(rows.toDF("k", "v", "s"),
          "k", "v", "s", bins)
        .select("n1", "n2", "tv_num").as[(Long, Long, Long)].head()
      val lo = rows.map(_._2).min
      val w = rows.map(_._2).max - lo + 1
      def hist(side: Int) = rows.filter(_._3 == side)
        .groupBy(r => (r._2 - lo) * bins / w).view.mapValues(_.size.toLong).toMap
      val (h1, h2) = (hist(0), hist(1))
      val m1 = h1.values.sum; val m2 = h2.values.sum
      val want = (h1.keySet ++ h2.keySet).toSeq.map { b =>
        math.abs(h1.getOrElse(b, 0L) * m2 - h2.getOrElse(b, 0L) * m1)
      }.sum
      assert((n1, n2, tv) === ((m1, m2, want)))
    }
  }

  test("lagStats equals direct computation over the dense series") {
    val rng = new Random(5)
    val ticks = 0L +: (1L to 60L).filter(_ => rng.nextBoolean())
    val obs = ticks.map(t => ("s", t, rng.nextInt(20).toLong))
    val lags = Seq(1, 3, 7)
    val out = Autocorr.lagStats(obs.toDF("k", "t", "n"), "k", "t", "n", lags)
      .select("lag", "n", "sum_xy").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val lo = ticks.min; val hi = ticks.max
    val dense = (lo to hi).map(t => obs.find(_._2 == t).map(_._3).getOrElse(0L))
    lags.foreach { lag =>
      val pairs = dense.indices.dropRight(lag).map(i => (dense(i), dense(i + lag)))
      if (pairs.nonEmpty) {
        assert(out(lag.toLong)._1 === pairs.size.toLong, s"lag $lag n")
        assert(out(lag.toLong)._2 === pairs.map(p => p._1 * p._2).sum, s"lag $lag sum_xy")
      } else assert(!out.contains(lag.toLong))
    }
  }
}
