package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the document corpus at 100 TB — the write-side
  * decisions that make every downstream curation query cheap:
  *
  *  - **Hive-partition by a low-cardinality routing column** (language /
  *    source): per-language pipelines (vocab_top, per-lang sampling,
  *    mixture construction) become partition-PRUNED scans — the planner
  *    never opens the other languages' files (`PartitionFilters` in the
  *    plan, zero I/O, not just a pushed filter).
  *  - **Sort within partitions by the hot filter column** (quality):
  *    parquet writes min/max stats per row group, so a
  *    `quality >= threshold` curation filter skips whole row groups of
  *    rejected documents — the layout does the filtering.
  *  - Repartition by the routing column before the write so each
  *    partition directory is written by the executors that own its rows
  *    (no tiny-files explosion from every task writing every language).
  *
  * The same pattern applies to the embeddings table keyed by the IVF
  * cluster id: storage-partitioning by cluster is what turns probed-list
  * ANN search into a partition-pruned scan ([[Similarity.ivfTopK]]).
  */
object CorpusIO {

  /** Write docs partitioned by `routeCol`, row-group-sorted by `sortCol`
    * (descending — curation reads the high-quality head). */
  def write(docs: DataFrame, path: String, routeCol: String = "lang",
            sortCol: String = "quality"): Unit =
    docs
      .repartition(col(routeCol))
      .sortWithinPartitions(col(routeCol), col(sortCol).desc)
      .write.mode("overwrite").partitionBy(routeCol).parquet(path)

  /** Read back; `route` prunes to one partition directory at plan time. */
  def read(spark: SparkSession, path: String,
           route: Option[String] = None, routeCol: String = "lang"): DataFrame = {
    val df = spark.read.parquet(path)
    route.fold(df)(r => df.filter(col(routeCol) === r))
  }

  /** The canonical documents schema for JSONL interchange. */
  val docSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")

  /** JSONL — the lingua franca of published web corpora (one JSON object
    * per line, splittable when uncompressed / per-file parallel when
    * gzipped). ALWAYS pass the schema: schema inference costs a full
    * extra pass over 100 TB before the real read starts. */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType = docSchema): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write as JSONL shards (one line per document). Compression left to
    * `spark.sql.json.compression.codec`/option on the caller; at corpus
    * scale prefer zstd with files sized to the downstream reader's
    * parallelism. */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
