package graft.scale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding merge learning (Sennrich et al. 2016,
  * the subword-vocabulary trainer behind GPT/LLaMA-style tokenizers),
  * restructured for corpus scale:
  *
  *  - The corpus is scanned ONCE to build the word-frequency table;
  *    every merge iteration then runs against that vocabulary table,
  *    whose size is the distinct-word count — orders of magnitude
  *    smaller than the corpus (the classic BPE trainer optimization,
  *    here it also means 100 TB of text never reshuffles).
  *  - Each word is kept as its space-separated symbol sequence with
  *    sentinel spaces (" h e l l o "). One iteration = explode adjacent
  *    symbol pairs weighted by word frequency (map-side combined
  *    aggregation on the vocab table), take the arg-max pair with a
  *    deterministic (count desc, pair asc) tie-break — a tiny collect —
  *    and apply the merge with a literal string replace (left-to-right,
  *    non-overlapping: exactly greedy BPE, and `replace` has identical
  *    semantics in Spark and DuckDB, which is what makes the trainer
  *    oracle-checkable).
  *  - The vocab DataFrame is re-persisted per iteration and the
  *    previous lineage dropped, so N merges cost N small shuffles, not
  *    one N-deep plan.
  *
  * Tokenization is deliberately simple (lowercased [a-z]+ runs, no
  * end-of-word marker) — the training loop, not the pre-tokenizer, is
  * the operator under test.
  */
object Bpe {

  /** Learn the first `nMerges` BPE merges over `textCol`.
    *
    * The corpus scan (explode → word-frequency agg) is always
    * distributed; the merge LOOP is size-gated like the connected-
    * components solver: when the distinct-word table fits under
    * `localVocabMax` rows it is collected once and the N iterations run
    * driver-local (the vocabulary is model-sized — the same class of
    * bounded collect as a k-means centroid fit — and N small Spark
    * shuffles of a tiny table are pure scheduler overhead), otherwise
    * the distributed per-iteration loop below runs unchanged. Both
    * paths use identical pair counting (adjacent symbol zip, overlap
    * counted) and identical non-overlapping left-to-right replace
    * semantics, so the result is bit-equal (BpeSpec pins this).
    *
    * @return (merge_rank, left_sym, right_sym, weight): rank is the
    *         1-based merge order, weight the frequency-weighted pair
    *         count that won the iteration. */
  def learnMerges(docs: DataFrame, textCol: String = "text",
                  nMerges: Int = 8,
                  localVocabMax: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    val words = graft.util.ScanParallelism.fanOut(docs.select(col(textCol)))
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Gate with a cheap cardinality probe (limit(n+1).count() over the
    // persisted agg), and only collect when the vocabulary is under the
    // cap — an over-cap corpus must never pull localVocabMax rows of
    // driver heap just to discard them. The persist keeps the word agg
    // single-computed across probe + whichever path runs (both paths
    // are eager, so the unpersist below is safe).
    val overCap = words.limit(localVocabMax + 1).count() > localVocabMax
    val out =
      if (!overCap) {
        val head = words.select(col("word"), col("freq")).collect()
        learnMergesLocal(spark,
          head.map(r => (r.getString(0), r.getLong(1))), nMerges)
      } else learnMergesDistributed(words, nMerges)
    words.unpersist()
    out
  }

  /** Driver-local greedy merge loop over a collected vocabulary —
    * semantics identical to [[learnMergesDistributed]]. */
  private def learnMergesLocal(spark: org.apache.spark.sql.SparkSession,
                               vocabIn: Array[(String, Long)],
                               nMerges: Int): DataFrame = {
    var vocab = vocabIn.map { case (w, f) =>
      (f, " " + w.map(c => s"$c ").mkString)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var done = false
    for (rank <- 1 to nMerges if !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (f, seq) =>
        val syms = seq.trim.split(" ")
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // arg-max with the distributed loop's (w desc, a asc, b asc)
        // deterministic tie-break
        val ((a, b), w) = counts.minBy { case ((pa, pb), pw) =>
          (-pw, pa, pb)
        }
        merges += ((rank, a, b, w))
        // Java String.replace = left-to-right non-overlapping, the same
        // semantics as Spark/DuckDB SQL replace (shared sentinel spaces
        // between back-to-back occurrences are consumed identically)
        vocab = vocab.map { case (f, seq) =>
          (f, seq.replace(s" $a $b ", s" $a$b "))
        }
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "left_sym", "right_sym", "weight")
  }

  /** The per-iteration distributed loop (vocab-table shuffles): the
    * scale path above `localVocabMax` distinct words. */
  private[scale] def learnMergesDistributed(words: DataFrame,
                                            nMerges: Int): DataFrame = {
    val spark = words.sparkSession
    var vocab = words
      .select(col("freq"),
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")).as("seq"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    // persists are lazy: each iteration's pair-count collect materializes
    // the CURRENT vocab, so the PREVIOUS generation (its sole parent) can
    // be released one step behind — no per-iteration count() jobs
    var prevGen: Option[DataFrame] = None
    var done = false
    for (rank <- 1 to nMerges if !done) {
      val syms = split(trim(col("seq")), " ")
      val top = vocab
        .withColumn("__l", slice(syms, lit(1), size(syms) - 1))
        .withColumn("__r", slice(syms, lit(2), size(syms) - 1))
        .select(col("freq"), explode(arrays_zip(col("__l"), col("__r"))).as("p"))
        .groupBy(col("p.__l").as("a"), col("p.__r").as("b"))
        .agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("a"), col("b"))
        .limit(1).collect()
      prevGen.foreach(_.unpersist())
      prevGen = None
      if (top.isEmpty) done = true
      else {
        val Row(a: String, b: String, w: Long) = top(0)
        merges += ((rank, a, b, w))
        // symbols are [a-z]+ concatenations — safe inside a SQL literal
        val next = vocab
          .select(col("freq"),
            expr(s"replace(seq, ' $a $b ', ' $a$b ')").as("seq"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prevGen = Some(vocab)
        vocab = next
      }
    }
    prevGen.foreach(_.unpersist())
    vocab.unpersist()
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "left_sym", "right_sym", "weight")
  }

  /** Apply an ordered merge list (the encode side of the tokenizer) and
    * report per-source compression: word occurrences, BPE token count,
    * and character token count. The merge chain runs over the DISTINCT
    * word table only — the corpus explodes once to (source, word)
    * counts, then a vocab-sized join attaches each word's token count;
    * 100 TB of text is never re-scanned per merge. */
  def encodeStats(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text",
                  srcCol: String = "source"): DataFrame = {
    val words = docs
      .select(col(srcCol),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col(srcCol), col("word")).agg(count(lit(1)).as("n"))
    val vocab = words.select(col("word")).distinct()
      .withColumn("seq",
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
    val encoded = merges.foldLeft(vocab) { case (df, (a, b)) =>
      df.withColumn("seq", expr(s"replace(seq, ' $a $b ', ' $a$b ')"))
    }.select(col("word"), size(split(trim(col("seq")), " ")).as("toks"))
    words.join(encoded, Seq("word"))
      .groupBy(col(srcCol))
      .agg(sum(col("n")).as("n_words"),
        sum(col("n") * col("toks")).as("n_bpe_tokens"),
        sum(col("n") * length(col("word"))).as("n_char_tokens"))
  }
}
