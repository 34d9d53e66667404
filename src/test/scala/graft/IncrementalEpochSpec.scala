package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.scale.{Curation, Dedup}

/** Equivalence/property specs for incremental LSH dedup and the
  * mixture-weighted epoch schedule. */
class IncrementalEpochSpec extends SparkSpec {
  import spark.implicits._

  test("incremental pairs == full-run pairs touching a new doc (random corpora)") {
    val rng = new Random(19)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      // near-dup structure arises naturally from the tiny vocabulary
      val docs = (0L until 60L).map(i =>
        (i, Seq.fill(8 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
        .toDF("doc_id", "text")
      val sigs = Dedup.minhashSignatures(docs).localCheckpoint()
      val cut = 40L
      val full = Dedup.minhashLshPairs(sigs)
        .filter(col("a") >= cut || col("b") >= cut)
      val inc = Dedup.minhashLshPairsIncremental(
        sigs.filter(col("doc_id") >= cut),
        Dedup.bandTable(sigs.filter(col("doc_id") < cut)))
      val f = full.as[(Long, Long)].collect().toSet
      val i = inc.as[(Long, Long)].collect().toSet
      assert(i === f, s"trial $trial: incremental ${i.size} vs full ${f.size}")
    }
  }

  test("incremental LSH viral-bucket cap links newcomers to the hub only") {
    val docs = (0L until 31L)
      .map(i => (i, "same viral boilerplate text repeated in every document"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(docs).localCheckpoint()
    val idx = Dedup.bandTable(sigs.filter(col("doc_id") < 30))
    val newSigs = sigs.filter(col("doc_id") === 30)
    val full = Dedup.minhashLshPairsIncremental(newSigs, idx)
      .as[(Long, Long)].collect().toSet
    assert(full.size == 30) // newcomer pairs with every bucket member
    val capped = Dedup.minhashLshPairsIncremental(newSigs, idx,
        maxBucketSize = 5)
      .as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 30L))) // hub only; component unchanged
  }

  test("epochOrder: weighted sources lead every prefix of the schedule") {
    val docs = (0L until 90L).map(i =>
      (i, if (i < 30) "hv" else if (i < 60) "mid" else "lo"))
      .toDF("doc_id", "source")
    val out = Curation.epochOrder(docs, Seq("hv" -> 3, "mid" -> 1, "lo" -> 1))
      .orderBy("pos").select("source").as[String].collect()
    assert(out.length === 90 && out.toSet === Set("hv", "mid", "lo"))
    // smooth weighted round-robin: in every prefix the weight-3 source
    // has at least as many slots as each weight-1 source (never lags)
    var (hv, mid, lo) = (0, 0, 0)
    out.foreach { s =>
      if (s == "hv") hv += 1 else if (s == "mid") mid += 1 else lo += 1
      assert(hv >= mid - 1 && hv >= lo - 1, s"prefix hv=$hv mid=$mid lo=$lo")
    }
    // and the first 5 slots already interleave: hv cannot be starved
    assert(out.take(5).count(_ == "hv") >= 2)
  }

  test("epochOrder positions are dense and deterministic") {
    val docs = (0L until 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val a = Curation.epochOrder(docs, Seq("s0" -> 2)).orderBy("pos")
      .as[(Long, Long, String)].collect()
    val b = Curation.epochOrder(docs, Seq("s0" -> 2)).orderBy("pos")
      .as[(Long, Long, String)].collect()
    assert(a.map(_._1).toSeq === (0L until 40L))
    assert(a.toSeq === b.toSeq)
  }

  test("epochShards: packs id-ordered shards and interleaves at shard level") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 60) "hv" else "lo")).toDF("doc_id", "source")
    val out = Curation.epochShards(docs, Seq("hv" -> 3, "lo" -> 1),
        docsPerShard = 8)
      .orderBy("pos").as[(Long, String, Long, Long)].collect()
    // conservation + packing: full shards of 8, remainder in the last
    assert(out.map(_._4).sum === 100L)
    val hv = out.filter(_._2 == "hv").sortBy(_._3).map(_._4)
    assert(hv.toSeq === Seq(8L, 8L, 8L, 8L, 8L, 8L, 8L, 4L))
    val lo = out.filter(_._2 == "lo").sortBy(_._3).map(_._4)
    assert(lo.toSeq === Seq(8L, 8L, 8L, 8L, 8L))
    // dense deterministic positions; weight-3 source never starved in a prefix
    assert(out.map(_._1).toSeq === (0L until out.length.toLong))
    var (h, l) = (0, 0)
    out.foreach { r =>
      if (r._2 == "hv") h += 1 else l += 1
      assert(h >= l - 1, s"prefix hv=$h lo=$l")
    }
  }
}
