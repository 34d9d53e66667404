package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): candidate pairs whose
  * strings fall within a Levenshtein edit-distance threshold, generated
  * through a blocking key so the join is an equi-join on the block —
  * never the all-pairs cross product. The standard record-linkage
  * blocking design: recall is bounded by the blocking function (pairs
  * in different blocks are never compared; callers pick a key the
  * expected corruptions preserve), and cost is Σ|block|², kept bounded
  * by the optional `maxBlockSize` cap exactly like the shingle df cap
  * in [[graft.scale.Dedup.ngramJaccardPairs]].
  *
  * `levenshtein` is codegen'd in Spark and exact — the filter runs
  * inside the join stage, so only matching pairs survive the exchange.
  */
object FuzzyJoin {

  /** Self-match a string column: distinct values, blocked by `blockOf`,
    * emitting (name_a, name_b, dist) with name_a < name_b and
    * dist <= maxDist.
    *
    * @param maxBlockSize drop blocks larger than this before the
    *        self-join (a viral block — e.g. an empty-string key — would
    *        otherwise cost |block|²); None compares every block. */
  /** Sorted-neighborhood matching (Hernández & Stolfo 1995 "merge/purge"):
    * sort every distinct string once, then compare each record only to
    * its `window−1` successors in sort order. The complement of
    * [[selfPairs]]' blocking — blocking misses pairs whose block KEY was
    * corrupted, sorted-neighborhood misses pairs that sort far apart —
    * so production linkage runs both passes and unions the candidates.
    *
    * Scale shape: one distributed sort assigning a dense rank
    * ([[graft.ingest.Ingest.assignDenseIds]] — a range-partitioned sort +
    * zipWithIndex, never an unpartitioned window), then the neighbor
    * pairs come from an EQUI-join of rank against rank+j (j < window),
    * with the codegen'd `levenshtein` filter inside the join stage.
    * O(n·window) comparisons total, independent of block skew. */
  def sortedNeighborPairs(df: DataFrame, strCol: String, window: Int,
                          maxDist: Int): DataFrame = {
    require(window >= 2, s"window must cover at least one neighbor: $window")
    val names = df.select(col(strCol).as("name")).distinct()
    val ranked = graft.ingest.Ingest
      .assignDenseIds(names, "rk", col("name").asc)
    val bumped = ranked
      .withColumn("j", explode(sequence(lit(1), lit(window - 1))))
      .select((col("rk") + col("j")).as("rk"), col("name").as("name_a"))
    bumped.join(ranked.select(col("rk"), col("name").as("name_b")), Seq("rk"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  def selfPairs(df: DataFrame, strCol: String, blockOf: Column => Column,
                maxDist: Int, maxBlockSize: Option[Int] = None): DataFrame = {
    val names = df.select(col(strCol).as("name")).distinct()
      .withColumn("block", blockOf(col("name")))
      .filter(col("block").isNotNull)
    val kept = maxBlockSize match {
      case Some(cap) =>
        val ok = names.groupBy(col("block"))
          .agg(count(lit(1)).as("__bn")).filter(col("__bn") <= cap)
          .select(col("block"))
        names.join(broadcast(ok), Seq("block"))
      case None => names
    }
    kept.select(col("block"), col("name").as("name_a"))
      .join(kept.select(col("block"), col("name").as("name_b")), Seq("block"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }
}
