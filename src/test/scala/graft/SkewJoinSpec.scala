package graft

import org.apache.spark.sql.functions._

import graft.analysis.SkewJoin

/** Salted joins must be row-identical to the plain join — the salt only
  * reshapes the shuffle. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (1) with many rows on both sides, plus singleton keys
  private def left = (Seq.tabulate(40)(i => (i.toLong, 1L)) ++
    Seq((100L, 2L), (101L, 3L), (102L, 9L))).toDF("row_id", "k")
  private def right = (Seq.tabulate(5)(j => (1L, s"v$j")) ++
    Seq((2L, "x"), (3L, "y"), (4L, "unmatched"))).toDF("k", "v")

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("row_id", "k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList.sorted

  test("salted join equals plain join, including hot-key multiplicity") {
    val plain = left.join(right, Seq("k"))
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedJoin(left, right, Seq("k"), salts, col("row_id"))
      assert(asSet(salted) == asSet(plain), s"salts=$salts diverged")
      // 40 hot-key rows × 5 right rows + 2 singles; no salt column leaks
      assert(salted.count() == 202)
      assert(!salted.columns.exists(_.contains("salt")))
    }
  }

  test("NULL saltBy rows still land in a bucket (no silent row loss)") {
    val l = Seq((Option(1L), 2L), (Option.empty[Long], 2L)).toDF("row_id", "k")
    val r = Seq((2L, "x")).toDF("k", "v")
    val salted = SkewJoin.saltedJoin(l, r, Seq("k"), 8, col("row_id"))
    assert(salted.count() == 2) // plain inner join keeps both rows
  }

  test("salt values are deterministic and span the salt range") {
    val salt = pmod(graft.scale.TextOps.md5Hash60(col("row_id").cast("string"), 7),
      lit(16L)).cast("int")
    val vals = left.select(salt.as("s")).distinct().collect().map(_.getInt(0))
    assert(vals.forall(s => s >= 0 && s < 16))
    assert(vals.length > 4) // the hot key's 40 rows spread over many salts
  }
}
