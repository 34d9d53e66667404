package graft.demo

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup_components_incr path (not part of the
  * API): each stage of the day-2 merge timed separately against the
  * memoized-artifact equivalents. */
object ProfIncrCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scale.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = Dedup.minhashSignatures(docs).persist()
    t("sigs persist")(sigs.count())
    val histSigs = sigs.filter(col("doc_id") % 10 =!= 0)
    val newSigs = sigs.filter(col("doc_id") % 10 === 0)
    val histLabels = Dedup.connectedComponents(
      Dedup.minhashLshPairs(histSigs)).persist()
    t("hist labels (artifact build)")(histLabels.count())
    val band = Dedup.bandTable(histSigs)
    t("hist band table")(band.count())
    val bandC = band.persist(); bandC.count()
    val newEdges = Dedup.minhashLshPairsIncremental(newSigs, bandC)
    val n = t("incremental pairs")(newEdges.count())
    println(s"[prof] new edges: $n")
    val newEdgesC = newEdges.persist(); newEdgesC.count()
    t("componentsIncremental (super-graph CC + expand)")(
      Dedup.componentsIncremental(histLabels, newEdgesC).count())
    t("componentsIncremental again (warm)")(
      Dedup.componentsIncremental(histLabels, newEdgesC).count())
    t("FULL recompute for comparison")(
      Dedup.connectedComponents(Dedup.minhashLshPairs(sigs)).count())
    spark.stop()
  }
}
