package graft

import org.apache.spark.sql.functions._
import graft.scale.TextOps

/** Multinomial Naive Bayes classifier filter: separable corpora classify
  * correctly, the sparse score decomposition matches the textbook dense
  * formula, unseen-token docs fall back to priors, ties break by class. */
class NbClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("en", "the cat sat on the mat"),
    ("en", "the dog ate the bone"),
    ("en", "a cat and a dog"),
    ("fr", "le chat dort sur le tapis"),
    ("fr", "le chien mange un os"),
    ("fr", "un chat et un chien")).toDF("lang", "text")

  test("separable corpus classifies correctly with confident margins") {
    val docs = Seq(
      (1L, "the cat ate the bone"),
      (2L, "le chat mange un os"),
      (3L, "a dog sat on a mat"),
      (4L, "le chien dort sur le tapis")).toDF("doc_id", "text")
    val got = TextOps.naiveBayes(docs, train).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(got(1L)._1 == "en" && got(2L)._1 == "fr")
    assert(got(3L)._1 == "en" && got(4L)._1 == "fr")
    assert(got.values.forall(_._2 > 0), s"margins must be positive: $got")
  }

  test("sparse decomposition equals the textbook dense NB score") {
    // hand model: P(c)=1/2 each; score(d,c) = ln P(c) + sum_w n_w ln((c_wc+1)/(tot_c+V))
    val docs = Seq((1L, "the cat mange")).toDF("doc_id", "text")
    val trainLocal = train.collect().map(r => (r.getString(0), r.getString(1)))
    val byCls = trainLocal.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split(" "))).toMap
    val vocab = trainLocal.flatMap(_._2.split(" ")).distinct.length
    def micro(x: Double): Long = math.round(x * 1e6)
    def dense(doc: Seq[String], cls: String): Long = {
      val toks = byCls(cls)
      val tot = toks.length
      // term-level micro quantization, exactly as the engine defines it:
      // prior + T*lp0 + sum_w n_w * ln(c_wc + 1)
      micro(math.log(3.0 / 6.0)) +
        doc.length * micro(math.log(1.0 / (tot + vocab))) +
        doc.groupBy(identity).map { case (w, ws) =>
          ws.length * micro(math.log(toks.count(_ == w) + 1.0))
        }.sum
    }
    val row = TextOps.naiveBayes(docs, train).collect().head
    val doc = Seq("the", "cat", "mange")
    val en = dense(doc, "en"); val fr = dense(doc, "fr")
    assert(row.getString(1) == (if (en >= fr) "en" else "fr"))
    assert(row.getLong(2) == math.max(en, fr))
    assert(row.getLong(3) == math.abs(en - fr))
  }

  test("all-unseen-token doc: score is prior + T*lp0, tie broken by class order") {
    // both classes have 3 train docs (equal priors); class totals differ
    // (en 17 tokens, fr 18), so lp0 differs and the smaller-denominator
    // class wins; with symmetric training it would tie and 'en' < 'fr'
    val docs = Seq((1L, "zzz qqq")).toDF("doc_id", "text")
    val row = TextOps.naiveBayes(docs, train).collect().head
    val (tokDelta, classStats) = TextOps.naiveBayesModel(train)
    val cs = classStats.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = cs.map { case (c, (p, lp0)) => c -> (p + 2 * lp0) }
    val best = expected.toSeq.sortBy { case (c, s) => (-s, c) }.head
    assert(row.getString(1) == best._1 && row.getLong(2) == best._2)
    assert(tokDelta.filter(col("tok") === "zzz").count() == 0)
  }

  test("single-class model predicts that class with margin 0") {
    val one = train.filter(col("lang") === "en")
    val row = TextOps.naiveBayes(
      Seq((1L, "the cat")).toDF("doc_id", "text"), one).collect().head
    assert(row.getString(1) == "en" && row.getLong(3) == 0L)
  }
}
