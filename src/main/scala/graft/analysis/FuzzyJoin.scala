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
