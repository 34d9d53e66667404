package graft

/** Results must be invariant to the physical partition count — the
  * distributed-correctness property that catches partition-order
  * dependence (zipWithIndex offsets, first()-style nondeterminism,
  * float reduction order) that a single-layout oracle run can't see.
  * Rank/order-sensitive queries are the ones at risk. */
class DeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private val names = Seq(
    "epoch_order",      // global dense ids from a range sort + zipWithIndex
    "q_pareto",         // dense ranks feed decile assignment
    "doc_fingerprint",  // windowed minima
    "sample_per_key",   // bounded heap aggregate, merge order varies
    "q_skew_report",    // histogram refinement rank selection
    "tile_dedup",       // canonical-instance min over shuffled groups
    "xlingual_margin",  // micro-quantized cosine + margin argmax windows
    "emb_outliers",     // per-cluster distance ranking (4dp + id tie-break)
    "budgeted_shards",  // budget fill order + dense-id shard schedule
    "jaccard_prefix")   // hashed prefix candidates + sorted-merge verify

  test("rank-sensitive queries are invariant to shuffle partition count") {
    val conf = spark.conf
    val orig = conf.get("spark.sql.shuffle.partitions")
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(_.toString).sorted.toSeq
    try {
      val at4 = names.map(n => n -> run(n)).toMap
      conf.set("spark.sql.shuffle.partitions", "7")
      SparkEntry.clearCaches(spark) // memoized stages must rebuild at 7
      names.foreach { n =>
        assert(run(n) === at4(n), s"$n differs between 4 and 7 partitions")
      }
    } finally {
      conf.set("spark.sql.shuffle.partitions", orig)
      SparkEntry.clearCaches(spark)
    }
  }
}
