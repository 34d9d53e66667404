package graft

import org.apache.spark.sql.functions._

import graft.model.{Corpus, Trace}
import graft.scale.{Bitext, Dedup, Similarity, TextOps}

/** Executes docs/QUICKSTART.md's snippets verbatim (same calls, same
  * argument shapes) so the doc cannot drift from the API without
  * breaking the build — including one probe per row of the day-2 index
  * persistence contract table. Assertions are smoke-level (the
  * per-family equality proofs live in the family property specs). */
class QuickstartSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("Trace facade snippet: ingest → enrich → profiles → exports") {
    val t = Trace.fromCsv(spark, resourcePath("foo-bar.csv")).enriched
    assert(t.flatProfile().count() > 0)
    // commMatrix needs message events; the CSV fixture has none — drive
    // the call on a minimal message trace (same facade, same column)
    val msgs = Seq((10L, 100L, 0, 1), (20L, 50L, 1, 0))
      .toDF("ts", "len", "proc", "recv")
      .select(col("ts").as(graft.model.Schemas.TimestampNs),
        lit("MpiSend").as(graft.model.Schemas.Name),
        col("proc").as(graft.model.Schemas.Process),
        col("recv").as(graft.model.Schemas.AttrReceiver),
        col("len").as(graft.model.Schemas.AttrMsgLength),
        lit("Instant").as(graft.model.Schemas.EventType))
    assert(Trace(msgs).commMatrix("size").count() == 2)
    assert(t.createCct().events.columns.contains("node_id"))
    assert(t.loadImbalance().count() > 0)
    val out = tmp("quickstart")
    t.toChrome(s"$out/trace.json")
    assert(new java.io.File(s"$out/trace.json").length() > 0)
    t.toOtf2(s"$out/otf2")
    assert(new java.io.File(s"$out/otf2").listFiles().nonEmpty)
  }

  test("Corpus facade snippet: quality → curate → LSH dedup → split") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today", "a"),
      (2L, "the quick brown fox jumps over the lazy dog again tonight", "a"),
      (3L, "completely different text with many unique words in here", "b"),
      (4L, "short", "b")
    ).toDF("doc_id", "text", "source")
    val c = Corpus(docs)
    assert(c.qualityScore.count() == 4)
    assert(c.curate(minQuality = 0.0, minUniqueRatio = 0.1).count() > 0)
    val sigs = c.minhashSignatures()
    val pairs = Dedup.minhashLshPairs(sigs)
    val comps = Dedup.connectedComponents(pairs)
    val kept = Corpus(c.docs).dropNearDuplicates(pairs)
    assert(kept.count() < 4) // 1/2 are near-dups: one survives
    val splits = c.leakageSafeSplit(comps)
    // same component ⇒ same split
    val s12 = splits.filter(col("doc_id").isin(1L, 2L))
      .select("split").distinct().count()
    assert(s12 == 1)
  }

  test("context-packing snippet: id-order and mixture-order packing") {
    val docs = Seq(
      (0L, "a b c d e", "src0"), (1L, "f g h", "src0"),
      (2L, "i j k l", "src1"), (3L, "m n", "src1")
    ).toDF("doc_id", "text", "source")
    val packed = graft.scale.Curation.packContexts(docs, seqLen = 512)
    // 14 tokens, one 512-wide example: fill 14, pad 498
    val r = packed.collect()
    assert(r.length == 1 && r(0).getAs[Long]("n_tokens") == 14L &&
      r(0).getAs[Long]("n_pad") == 498L)
    val ordered = graft.scale.Curation
      .epochOrder(docs, Seq("src0" -> 4, "src1" -> 2))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    val byMix = graft.scale.Curation
      .packContexts(ordered, seqLen = 512, orderCol = "pos")
    assert(byMix.collect().map(_.getAs[Long]("n_tokens")).sum == 14L)
    // boundary sidecar: all four docs start inside the single example
    val bounds = graft.scale.Curation.packBoundaries(docs, seqLen = 512)
    assert(bounds.count() == 4L &&
      bounds.filter(col("spans_next")).count() == 0L)
    // best-fit twin, as in the doc snippet (whole docs fit at 512)
    val bins = graft.scale.Curation.packBestFit(
      docs.select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " +")).cast("long").as("n_tokens")),
      seqLen = 512, groupCol = "source")
    assert(bins.select("source", "bin_id").distinct().count() == 2L)
  }

  test("day-2 contract table: every build/probe pair runs as documented") {
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "totally unrelated words live in this one here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "fresh new content nothing shared with history")
    ).toDF("doc_id", "text")

    // MinHash/LSH + components
    val histSigs = Dedup.minhashSignatures(hist)
    val bandIdx = Dedup.bandTable(histSigs)
    val newEdges = Dedup.minhashLshPairsIncremental(
      Dedup.minhashSignatures(batch), bandIdx)
    assert(newEdges.columns.toSet == Set("a", "b"))
    val histLabels = Dedup.connectedComponents(
      Dedup.minhashLshPairs(histSigs))
    assert(Dedup.componentsIncremental(histLabels, newEdges)
      .columns.toSet == Set("node", "component"))

    // exact threshold-Jaccard (through parquet, as the doc shows)
    val idxDir = tmp("qsjp")
    val (dfTab, docIndex) = Dedup.jaccardPrefixIndex(hist, 3, 1, 5)
    dfTab.write.parquet(s"$idxDir/df"); docIndex.write.parquet(s"$idxDir/docs")
    val jp = Dedup.jaccardPrefixIncremental(batch,
      spark.read.parquet(s"$idxDir/df"),
      spark.read.parquet(s"$idxDir/docs"), 3, 1, 5)
    assert(jp.filter(col("a") === 1L && col("b") === 10L).count() == 1)

    // edit distance (self + linkage)
    val (gdf, strIdx, idMap) = Dedup.editDistanceIndex(hist, maxDist = 2)
    assert(Dedup.editDistanceIncremental(batch, gdf, strIdx, idMap,
      maxDist = 2).filter(col("dist") === 0).count() == 1) // 1 ↔ 10
    assert(Dedup.editDistanceLinkIncremental(batch, gdf, strIdx, idMap,
      maxDist = 2).count() >= 1)

    // exact-substring removal
    assert(Dedup.dupSpansRemovedIncremental(batch, Dedup.shingleIndex(hist))
      .filter(col("doc_id") === 10L).head().getAs[Long]("n_kept") == 0L)

    // winnowing / MOSS
    assert(TextOps.winnowPairsIncremental(batch, TextOps.winnowIndex(hist))
      .filter(col("a") === 1L && col("b") === 10L).count() == 1)

    // CDC chunking
    assert(TextOps.cdcDedupIncremental(batch, TextOps.cdcIndex(hist))
      .columns.contains("n_shared"))

    // Hamming fingerprints
    val histFp = Seq((1L, 0L, 255L), (2L, 0L, 240L)).toDF(
      "doc_id", "ahash_hi", "ahash_lo")
    val newFp = Seq((10L, 0L, 254L)).toDF("doc_id", "ahash_hi", "ahash_lo")
    val hp = Dedup.hammingBandPairsIncremental(newFp,
      Dedup.hammingBandTable(histFp), radius = 6)
    assert(hp.filter(col("a") === 1L && col("b") === 10L).count() == 1)
  }

  test("IndexStore snippet: build → save → load → probe, parameters from the store") {
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "unrelated words fill this second document entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val path = tmp("qsstore") + "/jp"
    graft.scale.IndexStore.buildJaccardPrefix(history, shingleK = 3,
      tauNum = 1, tauDen = 5).save(path)
    val pairs = graft.scale.IndexStore.load(spark, path).probe(batch)
    assert(pairs.filter(col("a") === 1L && col("b") === 10L).count() == 1)
  }

  test("compaction + retention snippet: compact → load canonical → retire") {
    val history = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "unrelated words fill this second document entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val root = tmp("qsgc")
    graft.scale.IndexStore.buildJaccardPrefix(history).save(s"$root/v1")
    graft.scale.IndexStore.append(spark, s"$root/v1", batch, s"$root/v2")
    // snippet: compact the newest version, load canonical, retire old
    graft.scale.IndexStore.compact(spark, s"$root/v2", s"$root/canonical")
    val idx = graft.scale.IndexStore.load(spark, s"$root/canonical")
    graft.scale.IndexStore.retire(spark, s"$root/v1")
    graft.scale.IndexStore.retire(spark, s"$root/v2")
    val day3 = Seq((20L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    assert(idx.probe(day3)
      .filter(col("b") === 20L).count() >= 1)
    assert(!new java.io.File(s"$root/v1").exists)
  }

  test("day-2 contract table: bitext and IVF rows") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f)),
      (5L, Array(0.7f, 0.3f)), (6L, Array(0.3f, 0.7f))
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, "en"), (3L, "en"), (5L, "en"),
      (2L, "de"), (4L, "de"), (6L, "de")
    ).toDF("doc_id", "lang")
    val idx = Bitext.indexTable(emb, docs, "en", "de")
    assert(Bitext.mineAgainstIndex(
        emb.filter(col("vec_id") === 1L), idx, k = 2)
      .count() >= 0) // shape check; mining quality pinned in BitextSpec
    val ivfDir = tmp("qsivf") + "/ivf"
    val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    Similarity.writeIvfIndex(emb, ivfDir, centroids)
    assert(Similarity.searchIvfIndex(spark, ivfDir,
      emb.filter(col("vec_id") === 1L), centroids).count() > 0)
  }
}
