package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dynamic partition pruning guard: a fact table laid out by a
  * partition key joined through a filtered dimension must prune fact
  * partitions at RUNTIME (the filter value set is only known after the
  * dim side runs). At 100 TB this is the difference between scanning 3
  * month-partitions and scanning all of them — a plan property worth a
  * regression test, not an assumption. */
class DppSpec extends SparkSpec {

  test("filtered dim join prunes fact partitions dynamically") {
    val dir = Files.createTempDirectory("dpp").toFile.getAbsolutePath
    import spark.implicits._
    val fact = (0 until 1000).map(i => (i.toLong, i % 10, i * 2L))
      .toDF("id", "part_key", "v")
    fact.write.mode("overwrite").partitionBy("part_key").parquet(s"$dir/fact")
    val dim = (0 until 10).map(i => (i, if (i < 3) "keep" else "drop"))
      .toDF("part_key", "tag")
    dim.write.mode("overwrite").parquet(s"$dir/dim")

    val f = spark.read.parquet(s"$dir/fact")
    val d = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
    val joined = f.join(d, "part_key")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") ||
      plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in plan:\n${plan.take(3000)}")
    // and the result is still correct
    assert(joined.count() === 300L)
  }
}
