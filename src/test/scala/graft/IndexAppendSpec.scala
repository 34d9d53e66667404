package graft

import org.apache.spark.sql.DataFrame

import graft.scale.{Dedup, IndexStore, TextOps}

/** Day-N index maintenance: for every appendable family,
  * probe-after-append equals probe against a from-scratch rebuild of
  * day-1 ∪ day-2 — through the full operational path
  * ([[IndexStore.append]]: load v1 → absorb → save v2 → reload), not
  * just the in-memory handle. The frozen-order families
  * (jaccard_prefix, edit_distance) are exercised with day-2 batches
  * that introduce NEW tokens whose df would reorder a naively merged
  * frequency table — the case the consistent-extension argument exists
  * for. Also pins the append guard rails (src != dst, bitext
  * unsupported) and version-1 store readability. */
class IndexAppendSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("idxappend").toString

  // day-1 history, day-2 absorbed batch, day-3 probe batch — overlaps
  // planted across every generation pair (1↔2, 1↔3, 2↔3, within-3)
  private lazy val day1 = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
    (3L, "totally different words live inside this one right here now"),
    (4L, "short doc")
  ).toDF("doc_id", "text")
  private lazy val day2 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (11L, "novel viral chunk repeated novel viral chunk repeated again"),
    (12L, "totally different words live inside this one right here today")
  ).toDF("doc_id", "text")
  private lazy val day3 = Seq(
    (20L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (21L, "novel viral chunk repeated novel viral chunk repeated again"),
    (22L, "nothing here matches anything else in any earlier generation"),
    (23L, "nothing here matches anything else in any earlier generation")
  ).toDF("doc_id", "text")
  private lazy val day12 = day1.unionByName(day2)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  /** save day-1 → append day-2 through the store → probe day-3; compare
    * against the rebuilt index's probe of the same batch. */
  private def appendEqualsRebuild(build: DataFrame => IndexStore.DedupIndex)
      : Unit = {
    val dir = tmp()
    build(day1).save(s"$dir/v1")
    val grown = IndexStore.append(spark, s"$dir/v1", day2, s"$dir/v2")
    val rebuilt = build(day12)
    val g = rows(grown.probe(day3))
    assert(g == rows(rebuilt.probe(day3)))
    assert(g.nonEmpty)
  }

  test("minhash append == rebuild (non-default band family)") {
    appendEqualsRebuild(d =>
      IndexStore.buildMinhashLsh(d, numHashes = 8, rowsPerBand = 2))
  }

  test("jaccard prefix append == rebuild despite df-reordering day-2 tokens") {
    appendEqualsRebuild(d =>
      IndexStore.buildJaccardPrefix(d, shingleK = 2, tauNum = 1, tauDen = 3))
  }

  test("edit distance append == rebuild (self-join day-3 semantics)") {
    val d1 = Seq((1L, "cold widget"), (2L, "warm gear"), (3L, "ab"))
      .toDF("doc_id", "text")
    val d2 = Seq((10L, "bold widget"), (11L, "ba"), (12L, "warm gears"))
      .toDF("doc_id", "text")
    val d3 = Seq((20L, "cold widgets"), (21L, "bold widget"), (22L, "bb"))
      .toDF("doc_id", "text")
    val dir = tmp()
    IndexStore.buildEditDistance(d1, maxDist = 2).save(s"$dir/v1")
    val grown = IndexStore.append(spark, s"$dir/v1", d2, s"$dir/v2")
    val rebuilt = IndexStore.buildEditDistance(d1.unionByName(d2), maxDist = 2)
    val g = rows(grown.probe(d3))
    assert(g == rows(rebuilt.probe(d3)))
    // cross-generation evidence: day-3 "bold widget" matches both the
    // day-1 "cold widget" and its day-2 twin id
    assert(grown.probe(d3).filter("a = 10 and b = 21").count() == 1)
    assert(grown.probe(d3).filter("a = 1 and b = 21").count() == 1)
    // duplicate-string absorption: day-2's linkage side also grows
    val grownEd = grown.asInstanceOf[IndexStore.EditDistanceIndex]
    assert(rows(grownEd.probeLink(d3)) == rows(
      IndexStore.buildEditDistance(d1.unionByName(d2), maxDist = 2)
        .probeLink(d3)))
  }

  test("shingle append == rebuild") {
    appendEqualsRebuild(d => IndexStore.buildShingle(d))
  }

  test("winnow append == rebuild; probe-time maxFpDf sees grown counts") {
    appendEqualsRebuild(d =>
      IndexStore.buildWinnow(d, minShared = 1, k = 2, w = 3))
    // with a cap: the combined-count df evaluation must include the
    // absorbed day-2 fingerprints, exactly like the rebuild's
    val dir = tmp()
    IndexStore.buildWinnow(day1, minShared = 1, k = 2, w = 3, maxFpDf = 2)
      .save(s"$dir/v1")
    val grown = IndexStore.append(spark, s"$dir/v1", day2, s"$dir/v2")
    val rebuilt =
      IndexStore.buildWinnow(day12, minShared = 1, k = 2, w = 3, maxFpDf = 2)
    assert(rows(grown.probe(day3)) == rows(rebuilt.probe(day3)))
  }

  test("cdc append == rebuild") {
    appendEqualsRebuild(d => IndexStore.buildCdc(d, w = 4, maskBits = 3))
  }

  test("hamming append == rebuild") {
    val f1 = Seq((1L, 0L, 255L), (2L, 7L, 0L))
      .toDF("doc_id", "ahash_hi", "ahash_lo")
    val f2 = Seq((10L, 0L, 252L), (11L, 1L << 20, 9L))
      .toDF("doc_id", "ahash_hi", "ahash_lo")
    val f3 = Seq((20L, 0L, 253L), (21L, 1L << 20, 8L))
      .toDF("doc_id", "ahash_hi", "ahash_lo")
    val dir = tmp()
    IndexStore.buildHamming(f1, radius = 2, bands = 4).save(s"$dir/v1")
    val grown = IndexStore.append(spark, s"$dir/v1", f2, s"$dir/v2")
    val rebuilt = IndexStore.buildHamming(f1.unionByName(f2),
      radius = 2, bands = 4)
    val g = rows(grown.probe(f3))
    assert(g == rows(rebuilt.probe(f3)))
    // day-3 ↔ day-2 pair (21, 11) at distance 1 proves absorbed rows probe
    assert(grown.probe(f3).filter("a = 11 and b = 21").count() == 1)
  }

  test("cluster-cosine append assigns with the FROZEN quantizer") {
    val e1 = Seq((1L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e2 = Seq((10L, Array(0.98f, 0.02f))).toDF("vec_id", "embedding")
    val e3 = Seq((20L, Array(0.99f, 0.01f))).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val dir = tmp()
    IndexStore.buildClusterCosine(e1, centroids, threshold = 0.9)
      .save(s"$dir/v1")
    val grown = IndexStore.append(spark, s"$dir/v1", e2, s"$dir/v2")
    val rebuilt = IndexStore.buildClusterCosine(e1.unionByName(e2),
      centroids, threshold = 0.9)
    assert(rows(grown.probe(e3)) == rows(rebuilt.probe(e3)))
    assert(grown.probe(e3).filter("a = 10 and b = 20").count() == 1)
  }

  test("store versions are immutable: v1 probes identically after v2 lands") {
    // the QUICKSTART retention contract's load-bearing property: a
    // concurrent reader that resolved v1 keeps a consistent snapshot
    // while the appending writer publishes v2
    val dir = tmp()
    IndexStore.buildCdc(day1, w = 4, maskBits = 3).save(s"$dir/v1")
    val reader = IndexStore.load(spark, s"$dir/v1")
    val before = rows(reader.probe(day3))
    IndexStore.append(spark, s"$dir/v1", day2, s"$dir/v2")
    assert(rows(reader.probe(day3)) == before)
    assert(rows(IndexStore.load(spark, s"$dir/v1").probe(day3)) == before)
  }

  test("append refuses src == dst (no parquet self-overwrite)") {
    val dir = tmp()
    IndexStore.buildCdc(day1).save(s"$dir/v1")
    val e = intercept[IllegalArgumentException] {
      IndexStore.append(spark, s"$dir/v1", day2, s"$dir/v1")
    }
    assert(e.getMessage.contains("NEW store version"))
  }

  test("bitext append is unsupported with a rebuild pointer") {
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val docs = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val idx = IndexStore.buildBitext(emb, docs, "en", "de", k = 1)
    val e = intercept[UnsupportedOperationException] { idx.append(day2) }
    assert(e.getMessage.contains("buildBitext"))
  }

  test("version-1 stores (pre-maxFpDf) still load; new stores write v2") {
    val dir = tmp()
    IndexStore.buildWinnow(day1, minShared = 1, k = 2, w = 3, maxFpDf = 7)
      .save(dir)
    val meta = spark.read.parquet(s"$dir/_meta")
    assert(meta.filter("key = 'version' and value = '2'").count() == 1)
    // rewrite the meta as a version-1-era store: no maxFpDf key
    val legacy = meta.filter("key not in ('version', 'maxFpDf')")
      .unionByName(Seq(("version", "1")).toDF("key", "value"))
      .collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(legacy.toIndexedSeq, 1), meta.schema)
      .write.mode("overwrite").parquet(s"$dir/_meta")
    val loaded = IndexStore.load(spark, dir)
      .asInstanceOf[IndexStore.WinnowIndex]
    // additive key falls back to its safe default (uncapped)
    assert(loaded.maxFpDf == Int.MaxValue)
    // unknown future versions still fail loudly
    spark.createDataFrame(Seq(("family", "winnow"), ("version", "99")))
      .toDF("key", "value")
      .write.mode("overwrite").parquet(s"$dir/_meta")
    intercept[IllegalArgumentException] { IndexStore.load(spark, dir) }
  }
}
