package graft

import org.apache.spark.sql.functions._

import graft.analysis.{Changepoint, Sessionize}
import graft.scale.{Curation, Dedup}

/** Planted-ground-truth specs for the round's curation/analytics batch:
  * tile-level duplicate removal, the leakage-safe split, CUSUM change
  * points, and rolling distinct actives. */
class SplitTileSpec extends SparkSpec {
  import spark.implicits._

  test("removeDuplicateTiles keeps exactly one canonical copy of a shared tile") {
    // docs 1 and 2 share one exact 5-word tile (positions differ); doc 3
    // is untouched. k=5 tiles: doc1 = [shared][u1], doc2 = [v][shared]
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$shared one two three four five"),
      (2L, s"x1 x2 x3 x4 x5 $shared"),
      (3L, "solo words only here now")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateTiles(docs)
      .orderBy("doc_id")
      .select("doc_id", "n_tiles", "n_removed", "kept_words")
      .as[(Long, Long, Long, Long)].collect()
    // canonical = min (doc_id, idx) → doc 1 keeps its copy, doc 2 loses it
    assert(out === Array((1L, 2L, 0L, 10L), (2L, 2L, 1L, 5L), (3L, 1L, 0L, 5L)))
    // the rewrite witness of the untouched doc equals the md5 of its text
    val md5solo = Dedup.removeDuplicateTiles(docs)
      .filter(col("doc_id") === 3).select("kept_md5").as[String].head()
    val expect = spark.sql("SELECT md5('solo words only here now')").as[String].head()
    assert(md5solo === expect)
  }

  test("removeDuplicateTiles leaves a duplicate-free corpus unchanged") {
    val docs = Seq((1L, "a b c d e f"), (2L, "g h i j k l m")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateTiles(docs).agg(sum("n_removed")).as[Long].head()
    assert(out === 0L)
  }

  test("removeDuplicateTiles invariants on random corpora") {
    val rng = new scala.util.Random(31)
    val vocab = Vector("aa", "bb", "cc", "dd")
    for (trial <- 1 to 3) {
      val texts = (0L until 50L).map(i =>
        (i, Seq.fill(5 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val out = Dedup.removeDuplicateTiles(texts.toDF("doc_id", "text"))
        .select("doc_id", "n_tiles", "n_removed")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // single-threaded recompute: per tile string, kept instances must
      // be exactly 1 when it spans ≥2 docs, else all instances
      val tiles = texts.flatMap { case (id, t) =>
        t.split(" +").grouped(5).zipWithIndex
          .map { case (w, ix) => (id, ix, w.mkString(" ")) }.toSeq
      }
      val byTile = tiles.groupBy(_._3)
      val expectRemovedPerDoc = tiles.groupBy(_._1).map { case (id, ts) =>
        id -> ts.count { case (d, ix, tile) =>
          val inst = byTile(tile)
          val nd = inst.map(_._1).distinct.size
          nd >= 2 && (d, ix) != inst.map(t => (t._1, t._2)).min
        }.toLong
      }
      texts.foreach { case (id, t) =>
        val nTiles = (t.split(" +").length + 4) / 5
        val (gotTiles, gotRemoved) = (out(id)._1, out(id)._2)
        assert(gotTiles === nTiles.toLong, s"trial $trial doc $id tiles")
        assert(gotRemoved === expectRemovedPerDoc(id),
          s"trial $trial doc $id removed")
      }
    }
  }

  test("leakageSafeSplit puts every member of a component in one split") {
    val docs = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // components: {1,2,3} labeled 1 and {10,11} labeled 10
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "component")
    val out = Curation.leakageSafeSplit(docs, comps)
    val s123 = out.filter(col("doc_id").isin(1, 2, 3))
      .select("split").distinct().count()
    val s1011 = out.filter(col("doc_id").isin(10, 11))
      .select("split").distinct().count()
    assert(s123 === 1 && s1011 === 1)
    // clustered flag only on component members; everyone got a split 0..9
    assert(out.filter(col("in_cluster")).count() === 5)
    assert(out.filter(col("split") < 0 || col("split") > 9).count() === 0)
  }

  test("cusumMax finds the step day of a planted level shift") {
    // key A: 10/day for days 0-9, then 50/day for days 10-19 → the CUSUM
    // argmax is day 9 (last pre-shift bucket). key B: flat (score ties
    // resolve to the earliest day).
    val rows =
      (0L to 19L).map(d => ("A", d, if (d < 10) 10L else 50L)) ++
        (0L to 9L).map(d => ("B", d, 7L))
    val out = Changepoint.cusumMax(rows.toDF("k", "day", "n"), "k", "day", "n")
      .orderBy("k").select("k", "change_bucket").as[(String, Long)].collect()
    assert(out === Array(("A", 9L), ("B", 0L)))
  }

  test("rollingActive counts trailing-window distinct users exactly") {
    val us = 86400000000L // one day in µs
    // u1 active days 0,1; u2 active day 0 only; u3 active day 8
    val ev = Seq((1L, 0L), (1L, us + 5L), (1L, 17L), (2L, 42L), (3L, 8 * us))
      .toDF("user_id", "t_us")
    val out = Sessionize.rollingActive(ev)
      .orderBy("day").select("day", "dau", "rolling_active")
      .as[(Long, Long, Long)].collect()
    // day 0: dau {u1,u2}=2, window(-6..0)=2; day 1: dau {u1}=1,
    // window {u1,u2}=2; day 8: dau {u3}=1, window(2..8) = {u3} only
    // (u1's last day 1 is outside) — and days 2-7 are unobserved, so
    // they produce no rows
    assert(out === Array((0L, 2L, 2L), (1L, 1L, 2L), (8L, 1L, 1L)))
  }
}
