package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and emits ONE compact JSON line on stdout.
  *
  * The harness that consumes this output keeps only the tail of stdout
  * (observed: last 2000 chars), so the printed line MUST stay well under
  * that even as the query count grows. Strategy: the full per-query
  * timing map is written to bench_full.json next to the working dir,
  * while the printed line carries the total plus a fixed headline subset
  * of per-query timings rounded to 3 decimals.
  */
object Bench {
  // Representative subset across families: TPC-H-ish, trace enrichment /
  // analysis, dedup/LSH, ANN, text/curation, graph. Keep ~30 names so the
  // printed line stays ~1 KB.
  private val headline: Seq[String] = Seq(
    "q1_pricing", "q3_topk", "q5_region_revenue",
    "trace_match", "trace_inc", "trace_cct", "trace_time_profile",
    "trace_flat_profile", "comm_matrix", "trace_critical_path",
    "trace_pattern", "nsight_unpivot", "trace_chrome",
    "minhash_pairs", "ngram_jaccard", "simhash", "dedup_exact",
    "winnow_pairs", "lsh_tuning",
    "bm25_topk", "docs_curated", "dsir_weights", "text_quality",
    "token_count",
    "ann_topk", "ann_ivf", "ann_ivfpq", "semdedup",
    "q_sessionize", "graph_triangles",
    "quantile_sketch", "dq_report", "q_autocorr", "video_features",
    "tile_dedup", "split_leakage", "minhash_incremental", "epoch_order",
    "trace_callers", "q_skew_report")

  private def fmt(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)

    // a failing query must be VISIBLE in the output AND still charge its
    // time-until-failure — returning 0 for a failure would silently
    // deflate the totals
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             name: String, pass: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); ((System.nanoTime() - t0) / 1e9, true) }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED ($pass): ${e.getMessage}")
        ((System.nanoTime() - t0) / 1e9, false)
      }
    }

    // Pass 0 (setup): one sweep in sorted order that pays every shared
    // memoized artifact build (enrichment caches, signatures, k-means /
    // PQ fits, the on-disk IVF index) plus first-time shuffles. Charged
    // to a single `setup` entry rather than to whichever query is
    // alphabetically first among an artifact's consumers — previously
    // that first consumer looked 5-10× slower than its steady state and
    // round-over-round per-query deltas were attribution noise.
    val setupTimes = ordered.map { case (name, fn) =>
      name -> time(fn, name, "setup")
    }.toMap
    val setupTotal = setupTimes.valuesIterator.map(_._1).sum

    // Passes 1-3 (timed, warm): per-query MEDIAN of three runs — the
    // bench host shows 2-5× cold/warm swing, and a median over warm runs
    // is the smallest sample that sheds one outlier. Queries that failed
    // in setup are skipped (listed in `failed`, not retried 3×) — their
    // reported value is the setup pass's time-until-failure.
    val broken = failed.toSet
    val runs: Seq[Map[String, Double]] = (1 to 3).map { p =>
      ordered.flatMap { case (name, fn) =>
        if (broken.contains(name)) None
        else {
          val (sec, ok) = time(fn, name, s"run$p")
          if (ok) Some(name -> sec) else None
        }
      }.toMap
    }
    def median3(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val results = ordered.map { case (name, _) =>
      val samples = runs.flatMap(_.get(name))
      name -> (if (samples.nonEmpty) median3(samples)
               else setupTimes(name)._1)
    }
    val resultMap = results.toMap
    // headline total = the setup sweep (artifact builds + one COLD run
    // of every query) + Σ warm medians — i.e. ~one cold sweep plus one
    // steady-state sweep. NOT comparable 1:1 with the ≤r4 single-sweep
    // totals; the JSON carries `setup` and `sum_medians` separately so
    // either comparison basis is available.
    val sumMedians = results.map(_._2).sum
    val total = setupTotal + sumMedians
    val fl = failed.distinct.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Full dump for humans / the judge: every query, full precision.
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"setup":$setupTotal,"sum_medians":$sumMedians,"runs_per_query":3,"aggregation":"median","queries":$fullQs,"failed":$fl,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_full.json"),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] full dump write failed: ${e.getMessage}")
    }

    // Compact line for the harness tail window.
    val compactQs = headline.flatMap(n => resultMap.get(n).map(v => "\"" + n + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"setup":${fmt(setupTotal)},"sum_medians":${fmt(sumMedians)},"runs_per_query":3,"aggregation":"median","queries":$compactQs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
