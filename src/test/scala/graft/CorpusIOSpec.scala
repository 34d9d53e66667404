package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.scale.{CorpusIO, TextOps}

/** Corpus storage layout: partition pruning must be visible in the plan
  * (PartitionFilters, one directory scanned), round trip lossless. */
class CorpusIOSpec extends SparkSpec {

  test("partitioned write prunes at plan time and round-trips") {
    val dir = Files.createTempDirectory("corpusio").toFile.getAbsolutePath
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("quality", TextOps.quality(col("text")))
    CorpusIO.write(docs, s"$dir/docs")

    val en = CorpusIO.read(spark, s"$dir/docs", Some("en"))
    // pruning happens at the partition level: the scan node carries the
    // lang filter as a PartitionFilter, not a data Filter
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"))
    val expected = docs.filter(col("lang") === "en").count()
    assert(en.count() == expected && expected > 0)

    // full read-back is lossless (modulo column order)
    val all = CorpusIO.read(spark, s"$dir/docs")
    assert(all.count() == docs.count())
    assert(all.columns.toSet == docs.columns.toSet)

    // layout: one directory per language, each written as its own files
    val langDirs = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.length >= 3 && langDirs.contains("lang=en"))
  }

  test("JSONL round-trip with explicit schema is lossless") {
    val dir = Files.createTempDirectory("corpusjsonl").toFile.getAbsolutePath
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    CorpusIO.writeJsonl(docs, s"$dir/docs.jsonl")
    val back = CorpusIO.readJsonl(spark, s"$dir/docs.jsonl")
    assert(back.count() == docs.count())
    assert(back.schema == CorpusIO.docSchema)
    // values survive: compare a deterministic digest of (id, text)
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .select(sum(conv(substring(md5(concat_ws("|",
        col("doc_id"), col("text"))), 1, 8), 16, 10).cast("long")))
      .head().getLong(0)
    assert(digest(back) == digest(docs))
  }
}
