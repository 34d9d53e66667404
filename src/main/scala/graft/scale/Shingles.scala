package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Word-shingle extraction shared by the dedup family.
  * Long-form output: (idCol, shingle) — one row per k-token shingle. */
object Shingles {
  def wordShingles(docs: DataFrame, k: Int = 3, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    docs.select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        explode(transform(sequence(lit(1), greatest(size(col("toks")) - (k - 1), lit(1))),
          i => concat_ws(" ", slice(col("toks"), i, lit(k))))).as("shingle"))
  }
}
