package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, size}

import graft.scale.{CorpusIO, Curation, Dedup, TextOps}

/** Corpus-side facade — the document-pipeline counterpart of [[Trace]]:
  * one object wrapping a `(doc_id, text, …)` DataFrame with the curation
  * verbs a training-data pipeline chains (stats → quality → dedup →
  * split → sample → order), so a user drives the whole flow without
  * knowing which helper object holds which operator. Every method is a
  * thin delegation; plans compose lazily exactly as if the underlying
  * operators were called directly.
  *
  * Column contract: `doc_id` (unique BIGINT) and `text`; `lang` /
  * `source` where a method's docs say so. Non-default column names go
  * through the underlying operators.
  */
case class Corpus(docs: DataFrame) {

  // --- per-document analysis ---
  def textStats: DataFrame = TextOps.textStats(docs)
  def qualityScore: DataFrame = TextOps.qualityScore(docs)
  def repetitionStats: DataFrame = TextOps.repetitionStats(docs)
  def tokenCounts: DataFrame = docs.select(col("doc_id"),
    size(TextOps.tokens(col("text"))).as("ws_tokens"),
    size(TextOps.bpeishTokens(col("text"))).as("bpeish_tokens"))
  def gopherRules(minWords: Long = 50L): DataFrame =
    TextOps.gopherRules(docs, minWords)
  def readability: DataFrame = TextOps.readability(docs)
  def bigramLogProb(train: DataFrame): DataFrame =
    TextOps.bigramLogProb(docs, train)
  def distinctNgrams(ns: Seq[Int] = Seq(1, 2, 3)): DataFrame =
    TextOps.distinctNgrams(docs, ns)

  // --- dedup family ---
  def exactDedup: DataFrame = Dedup.exact(docs)
  def minhashSignatures(numHashes: Int = 16): DataFrame =
    Dedup.minhashSignatures(docs, numHashes)
  def nearDupComponents(numHashes: Int = 16, bands: Int = 4): DataFrame =
    Dedup.connectedComponents(
      Dedup.minhashLshPairs(Dedup.minhashSignatures(docs, numHashes),
        bands, numHashes / bands))
  def dropNearDuplicates(pairs: DataFrame): DataFrame =
    Dedup.dropNearDuplicates(docs, pairs)
  def removeDuplicateTiles(k: Int = 5): DataFrame =
    Dedup.removeDuplicateTiles(docs, k)
  def softDedupWeights(shingleK: Int = 3): DataFrame =
    Dedup.softDedupWeights(docs, shingleK)
  def diffAgainst(other: DataFrame): DataFrame =
    Curation.corpusDiff(docs, other)

  // --- curation / selection ---
  def curate(minQuality: Double, minUniqueRatio: Double): DataFrame =
    Curation.curate(docs, minQuality, minUniqueRatio)
  def hashSample(rate: Double): DataFrame = Curation.hashSample(docs, rate)
  def stratifiedSample(strataCol: String, n: Int): DataFrame =
    Curation.stratifiedSample(docs, strataCol, n)
  def leakageSafeSplit(components: DataFrame, nSplits: Int = 10): DataFrame =
    Curation.leakageSafeSplit(docs, components, nSplits)
  def epochOrder(weights: Seq[(String, Int)]): DataFrame =
    Curation.epochOrder(docs, weights)
  def epochShards(weights: Seq[(String, Int)], docsPerShard: Int): DataFrame =
    Curation.epochShards(docs, weights, docsPerShard)
  def budgetTruncate(budgets: Seq[(String, Long)],
                     defaultBudget: Long): DataFrame =
    Curation.budgetTruncate(docs, budgets, defaultBudget)
  def budgetedShards(budgets: Seq[(String, Long)], defaultBudget: Long,
                     weights: Seq[(String, Int)],
                     docsPerShard: Int): DataFrame =
    Curation.budgetedShards(docs, budgets, defaultBudget, weights,
      docsPerShard)
  def mixPlan(targetWeights: Seq[(String, Int)],
              budgetTokens: Long): DataFrame =
    Curation.mixPlan(docs, targetWeights, budgetTokens)
  def splitNgramOverlap(splits: DataFrame, shingleK: Int = 3): DataFrame =
    Curation.splitNgramOverlap(docs, splits, shingleK)
  def lshPrecision(pairs: DataFrame, tauNum: Int = 1,
                   tauDen: Int = 2): DataFrame =
    Dedup.lshPrecision(docs, pairs, tauNum, tauDen)
  def packBatches(budgetTokens: Long = 4096L): DataFrame =
    Curation.packBatches(docs, budgetTokens)

  // --- persistence ---
  def write(path: String, routeCol: String = "lang"): Unit =
    CorpusIO.write(docs, path, routeCol)
  def writeJsonl(path: String): Unit = CorpusIO.writeJsonl(docs, path)
}

object Corpus {
  def fromParquet(spark: SparkSession, path: String): Corpus =
    Corpus(spark.read.parquet(path))
  def fromDir(spark: SparkSession, path: String): Corpus =
    Corpus(CorpusIO.read(spark, path))
  def fromJsonl(spark: SparkSession, path: String): Corpus =
    Corpus(CorpusIO.readJsonl(spark, path))
}
