package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-adaptive scan parallelism for CPU-heavy per-row operators
  * (r11, guide §2.6/§6).
  *
  * Spark parallelizes a parquet scan by file splits, and a split cannot
  * cut inside a row group — so a table laid out as one file with one row
  * group scans as ONE task no matter how many cores the machine has, and
  * every per-row expression fused above that scan (tokenize, shingle,
  * md5, binary decode) runs serially. That is exactly the bench corpus
  * layout (each sf table is a single ~0.6–11 MB file). It is a *layout*
  * accident, not a property of the workload: at production scale the
  * same table arrives as thousands of splits and scan parallelism is
  * free.
  *
  * [[fanOut]] restores the parallelism the layout denies, adaptively:
  * if the DataFrame's physical partitioning has fewer partitions than
  * the session's default parallelism, insert a round-robin repartition
  * to the core count; otherwise return the input untouched — any real
  * multi-file table already satisfies the condition, so this is a no-op
  * at scale. The repartition costs one exchange of the (by the gate's
  * own condition, under-parallelized and therefore small relative to a
  * core-count's worth of splits) input; above it, the expensive per-row
  * work fans out across every core.
  *
  * Use it ONLY under operators whose per-row CPU clearly exceeds the
  * cost of one pass of row serialization — tokenizers, shingle+hash
  * pipelines, media decoders. A scan feeding a plain aggregation or a
  * keyed join should NOT fan out: those fuse partial aggregation into
  * the scan task or hit a keyed exchange immediately, and the extra
  * exchange is pure tax (measured on the bench: q1_pricing +0.4 s from
  * a reader-level variant of this hook — hence operator-level, not
  * reader-level).
  *
  * Results are unaffected: round-robin repartition permutes rows, and
  * every consumer is row-order independent (DeterminismSpec pins
  * equality across core counts, the oracle gate across engines).
  */
object ScanParallelism {
  /** `minBytes` additionally gates the fan-out on the input's estimated
    * size (catalyst plan statistics — file bytes for a scan projection,
    * no job): below it the exchange costs more than the per-row work it
    * spreads. Use it for operators whose per-row CPU is LOW relative to
    * row width (the brute-force ANN dot products: r11 measured the
    * unconditional fan-out at 0.60×/0.73× on ann_topk/ann_ivf over a
    * 0.8 MB corpus); leave it 0 for tokenize/shingle/decode pipelines
    * whose per-row CPU dwarfs the exchange at any size. At production
    * layouts a corpus past `minBytes` is multi-split anyway, so both
    * gates keep this a no-op at scale.
    *
    * fanOut must wrap scan-level projections only (its sole use): the
    * gates read `queryExecution.toRdd` partitioning — which, unlike
    * `df.rdd`, builds no external-Row deserializer — and plan stats;
    * on an input containing an exchange, AQE's toRdd materialization
    * could eagerly execute upstream stages. */
  def fanOut(df: DataFrame, minBytes: Long = 0L): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (minBytes > 0L &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes < minBytes) df
    else if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p)
    else df
  }
}
