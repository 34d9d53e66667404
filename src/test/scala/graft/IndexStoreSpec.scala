package graft

import org.apache.spark.sql.DataFrame

import graft.scale.{Dedup, IndexStore, TextOps}

/** The self-describing index store: every family round-trips through
  * disk (artifacts + `_meta`), `IndexStore.load` reconstructs the right
  * subtype with the persisted parameters, and `probe` equals the direct
  * incremental operator call — including under NON-default parameters,
  * which is the error class the store exists to close (probing with
  * mismatched build params yields quietly-wrong joins, not errors). */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("idxstore").toString

  private lazy val hist = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
    (3L, "totally different words live inside this one right here now"),
    (4L, "short doc")
  ).toDF("doc_id", "text")
  private lazy val batch = Seq(
    (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (11L, "fresh new content sharing nothing with the history corpus")
  ).toDF("doc_id", "text")

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("minhash LSH store: load-probe == direct incremental, params survive") {
    val dir = tmp()
    IndexStore.buildMinhashLsh(hist, numHashes = 8, rowsPerBand = 2).save(dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[IndexStore.MinhashLshIndex])
    val direct = Dedup.minhashLshPairsIncremental(
      Dedup.minhashSignatures(batch, 8), // same non-default family
      Dedup.bandTable(Dedup.minhashSignatures(hist, 8), rowsPerBand = 2),
      rowsPerBand = 2)
    assert(rows(loaded.probe(batch)) == rows(direct))
    assert(loaded.probe(batch).filter("a = 1 and b = 10").count() == 1)
  }

  test("jaccard prefix store: non-default (k, tau) persists and probes") {
    val dir = tmp()
    IndexStore.buildJaccardPrefix(hist, shingleK = 2, tauNum = 1, tauDen = 3)
      .save(dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[IndexStore.JaccardPrefixIndex])
    val (dfTab, docIdx) = Dedup.jaccardPrefixIndex(hist, 2, 1, 3)
    val direct = Dedup.jaccardPrefixIncremental(batch, dfTab, docIdx, 2, 1, 3)
    assert(rows(loaded.probe(batch)) == rows(direct))
    assert(loaded.probe(batch).filter("a = 1 and b = 10").count() == 1)
  }

  test("edit distance store: probe (self) and probeLink both match direct") {
    val names = Seq((1L, "cold widget"), (2L, "warm gear"), (3L, "ab"))
      .toDF("doc_id", "text")
    val nb = Seq((10L, "bold widget"), (11L, "ba")).toDF("doc_id", "text")
    val dir = tmp()
    IndexStore.buildEditDistance(names, maxDist = 2).save(dir)
    val loaded = IndexStore.load(spark, dir)
      .asInstanceOf[IndexStore.EditDistanceIndex]
    val (gdf, strIdx, idMap) = Dedup.editDistanceIndex(names, maxDist = 2)
    assert(rows(loaded.probe(nb)) ==
      rows(Dedup.editDistanceIncremental(nb, gdf, strIdx, idMap, maxDist = 2)))
    assert(rows(loaded.probeLink(nb)) ==
      rows(Dedup.editDistanceLinkIncremental(nb, gdf, strIdx, idMap,
        maxDist = 2)))
    assert(loaded.probe(nb).filter("a = 1 and b = 10").count() == 1)
  }

  test("shingle store: cleaned batch equals direct incremental clean") {
    val dir = tmp()
    IndexStore.buildShingle(hist).save(dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[IndexStore.ShingleIndex])
    assert(rows(loaded.probe(batch)) ==
      rows(Dedup.dupSpansRemovedIncremental(batch, Dedup.shingleIndex(hist))))
  }

  test("winnow store: matches direct incremental under non-default (k, w)") {
    val dir = tmp()
    IndexStore.buildWinnow(hist, minShared = 1, k = 2, w = 3).save(dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[IndexStore.WinnowIndex])
    val direct = TextOps.winnowPairsIncremental(batch,
      TextOps.winnowIndex(hist, k = 2, w = 3), minShared = 1, k = 2, w = 3)
    assert(rows(loaded.probe(batch)) == rows(direct))
    assert(loaded.probe(batch).count() > 0)
  }

  test("cdc store: matches direct incremental") {
    val dir = tmp()
    IndexStore.buildCdc(hist, w = 4, maskBits = 3).save(dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[IndexStore.CdcIndex])
    assert(rows(loaded.probe(batch)) ==
      rows(TextOps.cdcDedupIncremental(batch, TextOps.cdcIndex(hist, 4, 3),
        4, 3)))
  }

  test("hamming store: matches direct incremental; radius/bands persist") {
    val histFp = Seq((1L, 0L, 255L), (2L, 7L, 0L))
      .toDF("doc_id", "ahash_hi", "ahash_lo")
    val newFp = Seq((10L, 0L, 252L)).toDF("doc_id", "ahash_hi", "ahash_lo")
    val dir = tmp()
    IndexStore.buildHamming(histFp, radius = 2, bands = 4).save(dir)
    val loaded = IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[IndexStore.HammingIndex])
    val direct = Dedup.hammingBandPairsIncremental(newFp,
      Dedup.hammingBandTable(histFp, bands = 4), radius = 2, bands = 4)
    assert(rows(loaded.probe(newFp)) == rows(direct))
    assert(loaded.probe(newFp).filter("a = 1 and b = 10").count() == 1)
  }

  test("bitext store: mine-against-index through disk matches direct") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val docs = Seq((1L, "en"), (3L, "en"), (2L, "de"), (4L, "de"))
      .toDF("doc_id", "lang")
    val dir = tmp()
    graft.scale.IndexStore.buildBitext(emb, docs, "en", "de", k = 2)
      .save(dir)
    val loaded = graft.scale.IndexStore.load(spark, dir)
    assert(loaded.isInstanceOf[graft.scale.IndexStore.BitextIndex])
    val newSrc = Seq((10L, Array(0.98f, 0.02f))).toDF("vec_id", "embedding")
    val direct = graft.scale.Bitext.mineAgainstIndex(newSrc,
      graft.scale.Bitext.indexTable(emb, docs, "en", "de", 2), k = 2)
    assert(rows(loaded.probe(newSrc)) == rows(direct))
  }

  test("IVF store: centroids ride with the layout; search and append work") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val dir = tmp() + "/ivf"
    val store = graft.scale.IndexStore.writeIvf(emb, dir, centroids, k = 2)
    val loaded = graft.scale.IndexStore.loadIvf(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq == centroids.map(_.toSeq).toSeq)
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val direct = graft.scale.Similarity.searchIvfIndex(spark, s"$dir/lists",
      q, centroids, k = 2)
    assert(rows(loaded.search(q)) == rows(direct))
    assert(rows(store.search(q)) == rows(direct))
    // append grows the same layout under the frozen quantizer
    loaded.append(Seq((10L, Array(0.95f, 0.05f))).toDF("vec_id", "embedding"))
    assert(loaded.search(q).filter("neighbor_id = 10").count() > 0)
  }

  test("winnow store: maxFpDf persists and caps at probe time") {
    val dir = tmp()
    // cap 1: every fingerprint shared by >= 2 docs (combined counts) is
    // dropped, so the near-identical batch/history pair disappears
    IndexStore.buildWinnow(hist, minShared = 1, k = 2, w = 3, maxFpDf = 1)
      .save(dir)
    val loaded = IndexStore.load(spark, dir)
      .asInstanceOf[IndexStore.WinnowIndex]
    assert(loaded.maxFpDf == 1)
    val direct = TextOps.winnowPairsIncremental(batch,
      TextOps.winnowIndex(hist, k = 2, w = 3), minShared = 1, k = 2, w = 3,
      maxFpDf = 1)
    assert(rows(loaded.probe(batch)) == rows(direct))
    // and the cap genuinely bites vs the uncapped probe
    val uncapped = IndexStore.buildWinnow(hist, minShared = 1, k = 2, w = 3)
    assert(loaded.probe(batch).count() < uncapped.probe(batch).count())
  }

  test("cluster-cosine store: frozen centroids ride; probe == direct") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.98f, 0.02f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.02f, 0.98f))
    ).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val dir = tmp()
    IndexStore.buildClusterCosine(emb, centroids, threshold = 0.9).save(dir)
    val loaded = IndexStore.load(spark, dir)
      .asInstanceOf[IndexStore.ClusterCosineIndex]
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      centroids.map(_.toSeq).toSeq)
    assert(loaded.threshold == 0.9)
    val freshEmb = Seq((10L, Array(0.99f, 0.01f))).toDF("vec_id", "embedding")
    val direct = graft.scale.Similarity.cosinePairsIncremental(
      graft.scale.Similarity.withCluster(freshEmb, centroids),
      graft.scale.Similarity.withCluster(emb, centroids), 0.9)
    assert(rows(loaded.probe(freshEmb)) == rows(direct))
    // cross-side pair in cluster 0 (1,10) surfaces; cluster-1 docs don't
    assert(loaded.probe(freshEmb).filter("a = 1 and b = 10").count() == 1)
    assert(loaded.probe(freshEmb).filter("a = 3 or b = 3").count() == 0)
  }

  test("ivf stores direct a dedup-load to loadIvf instead of failing opaquely") {
    val emb = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val dir = tmp() + "/ivf"
    graft.scale.IndexStore.writeIvf(emb, dir, Array(Array(1.0, 0.0)), k = 1)
    val e = intercept[IllegalArgumentException] { IndexStore.load(spark, dir) }
    assert(e.getMessage.contains("loadIvf"))
  }

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(dir))
  }

  test("compact: canonical store is content-identical, fewer files; " +
      "a reader holding the old version keeps a consistent snapshot") {
    val root = tmp()
    val (v1, v2, canon) = (s"$root/v1", s"$root/v2", s"$root/canonical")
    IndexStore.buildJaccardPrefix(hist, shingleK = 2, tauNum = 1, tauDen = 3)
      .save(v1)
    val reader1 = IndexStore.load(spark, v1) // concurrent day-2 reader
    val probe1Before = rows(reader1.probe(batch))
    // the chain grows: v1 + batch -> v2, then compaction -> canonical
    val day3 = Seq((20L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    IndexStore.append(spark, v1, batch, v2)
    IndexStore.compact(spark, v2, canon)
    // canonical loads with the same family/params and probes identically
    val fromV2 = rows(IndexStore.load(spark, v2).probe(day3))
    val fromCanon = rows(IndexStore.load(spark, canon).probe(day3))
    assert(fromCanon == fromV2 && fromCanon.nonEmpty)
    // re-layout, never re-derive: artifact content identical row-for-row
    for (sub <- Seq("df", "docs"))
      assert(rows(spark.read.parquet(s"$v2/$sub")) ==
        rows(spark.read.parquet(s"$canon/$sub")))
    // right-sized files: tiny store -> one file per artifact (v2 carries
    // the union-then-save hop's task-count files)
    assert(parquetFiles(s"$canon/df").size <= parquetFiles(s"$v2/df").size)
    assert(parquetFiles(s"$canon/df").size == 1)
    // snapshot isolation: the v1 reader's view never moved while the
    // chain grew and compacted
    assert(rows(reader1.probe(batch)) == probe1Before)
    // drain-then-retire: superseded versions GC'd, canonical unaffected
    IndexStore.retire(spark, v1)
    IndexStore.retire(spark, v2)
    assert(!new java.io.File(v1).exists && !new java.io.File(v2).exists)
    assert(rows(IndexStore.load(spark, canon).probe(day3)) == fromCanon)
  }

  test("compact preserves the IVF partition-pruned layout: one file per " +
      "list after N appends; search identical") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val root = tmp()
    val (dir, canon) = (s"$root/ivf", s"$root/ivf_canonical")
    val store = IndexStore.writeIvf(emb, dir, centroids, k = 3)
    // day-2/3/4 appends: each drops one more file into touched lists
    for (i <- 10L to 12L)
      store.append(Seq((i, Array(0.95f, 0.05f))).toDF("vec_id", "embedding"))
    val q = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val before = rows(store.search(q))
    IndexStore.compact(spark, dir, canon)
    val loaded = IndexStore.loadIvf(spark, canon)
    assert(loaded.centroids.map(_.toSeq).toSeq == centroids.map(_.toSeq).toSeq)
    assert(rows(loaded.search(q)) == before)
    // the list directories survive (partition pruning intact) and each
    // holds exactly one compacted file (was 1 + appends for list 0)
    val lists = new java.io.File(s"$canon/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
    assert(lists.length == 2)
    assert(parquetFiles(s"$dir/lists/cluster=0").size > 1)
    for (l <- lists) assert(parquetFiles(l.toString).size == 1)
  }

  test("retire refuses to delete a path that is not an index store") {
    val dir = tmp()
    new java.io.File(s"$dir/precious.txt") // not a store
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/precious.txt"), "data".getBytes)
    intercept[Exception] { IndexStore.retire(spark, dir) }
    assert(new java.io.File(s"$dir/precious.txt").exists)
    // and compact refuses src == dst
    intercept[IllegalArgumentException] {
      IndexStore.compact(spark, dir, dir)
    }
  }

  test("load rejects unknown/missing stores loudly") {
    val dir = tmp()
    intercept[Exception] { IndexStore.load(spark, dir) }
    // wrong family tag round-trip: a store saved as one family never
    // silently probes as another — the tag rides in _meta
    IndexStore.buildCdc(hist).save(dir)
    assert(IndexStore.load(spark, dir).isInstanceOf[IndexStore.CdcIndex])
  }
}
