package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-shingle extraction shared by the dedup family.
  * Long-form output: (idCol, shingle) — one row per k-token shingle. */
object Shingles {
  def wordShingles(docs: DataFrame, k: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    // fanOut: tokenize+shingle CPU dominates one pass of text
    // serialization — restore core-count parallelism when the input
    // layout under-splits (r11; no-op on any real multi-file table)
    graft.util.ScanParallelism.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        explode(transform(sequence(lit(1), greatest(size(col("toks")) - (k - 1), lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(k))))).as("shingle"))
  }

  /** Positional variant of [[wordShingles]]: (idCol, pos, shingle) with
    * `pos` the 1-based index of the shingle's first token — the form
    * span-level operators need to map a duplicated shingle back onto
    * the token range it covers. Same short-doc clamping as
    * [[wordShingles]] (a doc shorter than k yields one clamped shingle
    * at pos 1). */
  def wordShinglesPos(docs: DataFrame, k: Int = 3, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    graft.util.ScanParallelism.fanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), greatest(size(col("toks")) - (k - 1), lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
          .as(Seq("__p0", "shingle")))
      .select(col(idCol), (col("__p0") + 1).cast("int").as("pos"),
        col("shingle"))
  }
}
