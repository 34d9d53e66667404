package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, and document
  * fingerprinting. All pure columnar expressions (whole-stage codegen) —
  * no UDFs — so they scan-and-fold at full Tungsten speed over 100 TB.
  */
object TextOps {

  /** Deterministic 60-bit hash from md5 — stable across engines (the same
    * value is computable in any SQL dialect as the first 15 hex digits of
    * md5). Used by all fingerprint/minhash ops so oracles can replicate. */
  def md5Hash60(c: Column, seed: Column): Column =
    conv(substring(md5(concat(seed, lit(":"), c)), 1, 15), 16, 10).cast("long")
  def md5Hash60(c: Column, seed: Int): Column = md5Hash60(c, lit(seed.toString))

  /** Whitespace tokens (single-space split for the canonical corpus;
    * `\s+` regex for general text). */
  def tokens(text: Column): Column = split(trim(text), " +")

  /** BPE-ish subword proxy: word pieces + punctuation as separate tokens. */
  def bpeishTokens(text: Column): Column =
    filter(split(text, """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])"""), t => trim(t) =!= "")

  /** Per-document stats: token count, char count, average token length,
    * alpha ratio, space ratio. */
  def textStats(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      length(t).cast("long").as("n_chars"),
      round(length(t).cast("double") / size(toks), 4).as("avg_token_len"),
      round(length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double") /
        greatest(length(t), lit(1)), 4).as("alpha_ratio"),
      round((size(toks) - 1).cast("double") / greatest(length(t), lit(1)), 4)
        .as("space_ratio"))
  }

  /** Heuristic quality score in [0,1]: blend of length sanity, alpha ratio
    * and mean token length sanity — the standard cheap pre-filter shape for
    * corpus curation. */
  def qualityScore(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val toks = size(tokens(t))
    val alphaRatio = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(t), lit(1))
    val lenScore = least(toks.cast("double") / 20.0, lit(1.0))
    val avgTok = length(t).cast("double") / greatest(toks, lit(1))
    val tokScore = when(avgTok.between(3.0, 12.0), 1.0).otherwise(0.5)
    docs.select(col(idCol),
      round((lenScore * 0.4 + alphaRatio * 0.4 + tokScore * 0.2), 4).as("quality"))
  }

  /** Character-n-gram language ID: score each candidate language by overlap
    * between the document's character trigrams and a per-language profile
    * learned from a labeled sample (`profiles`: lang → top trigrams).
    * The profile table is tiny → broadcast join; scoring is one
    * explode + aggregation. */
  def languageId(docs: DataFrame, profiles: DataFrame,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(charTrigrams(col(textCol))).as("gram"))
    val scored = grams.join(broadcast(profiles), Seq("gram"))
      .groupBy(col(idCol), col("lang")).agg(sum("weight").as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("lang"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("lang").as("predicted_lang"), col("score"))
  }

  /** Learn a trigram profile (top-n weighted trigrams per language) from a
    * labeled corpus — the training half of [[languageId]]. */
  def learnLanguageProfiles(labeled: DataFrame, topN: Int = 200,
                            textCol: String = "text",
                            langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = labeled
      .select(col(langCol).as("lang"), explode(charTrigrams(col(textCol))).as("gram"))
      .groupBy("lang", "gram").count()
    val w = Window.partitionBy("lang").orderBy(col("count").desc, col("gram"))
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= topN)
      .select(col("gram"), col("lang"),
        (col("count").cast("double") / topN).as("weight"))
  }

  /** All character trigrams of a string (positions 1..len-2). */
  def charTrigrams(text: Column): Column =
    transform(sequence(lit(1), greatest(length(text) - 2, lit(1))),
      i => text.substr(i, lit(3)))

  /** Rolling-hash document fingerprinting (winnowing-style): hash every
    * k-token shingle, keep each document's minima per window position —
    * here simplified to the s smallest shingle hashes (bottom-s sketch),
    * which is the common large-scale variant and fully oracle-checkable. */
  def fingerprint(docs: DataFrame, k: Int = 3, s: Int = 8,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = Shingles.wordShingles(docs, k, textCol, idCol)
    val hashed = sh.select(col(idCol), md5Hash60(col("shingle"), 0).as("h"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("h"))
    hashed.distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= s)
      .select(col(idCol), col("rn").as("pos"), col("h").as("fingerprint"))
  }
}
