package graft.analysis

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join hashes every row of a key to ONE reducer: a hot key
  * (the one customer with 10⁸ events, the null-ish default id) turns a
  * 1000-executor join into one straggling task. AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin`) handles this for sort-merge joins by
  * splitting oversized partitions — when it applies, prefer it and do
  * nothing here. Salting is the explicit fallback for the cases AQE
  * does not cover: a single key too large for even AQE's splits to
  * help, shuffled-hash joins, or a deliberately pinned non-adaptive
  * plan.
  *
  * Shape: left rows get a deterministic salt in [0, salts) hashed from
  * a high-cardinality tie-break column; the (small-ish) right side is
  * replicated `salts` times via one scan-local explode. The join key
  * becomes (key, salt), spreading each hot key over `salts` reducers.
  * Replication costs salts × |right|, so salt the side whose partner is
  * the smaller table and keep `salts` modest (8–32). The result is
  * row-identical to the unsalted join — verified by the oracle gate.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `keys`, salted `salts`
    * ways. `saltBy` must be a high-cardinality column of `left` (a row
    * id); the salt is md5-derived from it, so the row placement is
    * deterministic run-to-run. Output columns = plain join's (no salt
    * column leaks). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int, saltBy: Column): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salt = "__graft_salt"
    // NULL saltBy must still land in a bucket (a NULL salt would silently
    // drop the row from the inner join, breaking plain-join row-identity)
    val l = left.withColumn(salt,
      pmod(graft.scale.TextOps.md5Hash60(coalesce(saltBy.cast("string"), lit("")), 7),
        lit(salts.toLong)).cast("int"))
    val r = right.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ salt).drop(salt)
  }
}
