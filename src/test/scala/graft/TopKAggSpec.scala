package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKLongs

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("heap keeps the k largest pairs with payload tiebreak") {
    val h = new TopKLongs.Heap(3)
    Seq((5L, 1L), (1L, 9L), (5L, 2L), (7L, 0L), (1L, 8L), (5L, 2L))
      .foreach { case (o, p) => h.offer(o, p) }
    assert(h.sortedDesc().toSeq === Seq((7L, 0L), (5L, 2L), (5L, 2L)))
  }

  test("merge of partial heaps equals a single heap over the union") {
    val all = (1L to 100L).map(i => (i % 17, i))
    val single = new TopKLongs.Heap(5)
    all.foreach { case (o, p) => single.offer(o, p) }
    val (h1, h2) = (new TopKLongs.Heap(5), new TopKLongs.Heap(5))
    all.zipWithIndex.foreach { case ((o, p), i) =>
      (if (i % 2 == 0) h1 else h2).offer(o, p)
    }
    h2.foreach((o, p) => h1.offer(o, p))
    assert(h1.sortedDesc().toSeq === single.sortedDesc().toSeq)
  }

  test("aggregate matches the window formulation") {
    val df = (1L to 500L).map(i => (s"k${i % 7}", (i * 37) % 100, i))
      .toDF("k", "ord", "id")
    val agg = df.groupBy($"k")
      .agg(TopKLongs.topK(4, $"ord", $"id").as("top"))
      .select($"k", posexplode($"top"))
      .select($"k", $"col.ord".as("ord"), $"col.payload".as("id"))
    val w = Window.partitionBy($"k").orderBy($"ord".desc, $"id".desc)
    val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
      .select($"k", $"ord", $"id")
    assert(agg.orderBy("k", "ord", "id").as[(String, Long, Long)].collect()
      === win.orderBy("k", "ord", "id").as[(String, Long, Long)].collect())
  }

  test("int columns widen instead of class-casting") {
    val out = Seq((1, 3, 7), (1, 9, 8)).toDF("k", "ord", "id")
      .groupBy($"k").agg(TopKLongs.topK(1, $"ord", $"id").as("t"))
      .select(explode($"t")).select($"col.ord", $"col.payload")
      .as[(Long, Long)].head()
    assert(out === ((9L, 8L)))
  }

  test("fewer rows than k returns all of them") {
    val out = Seq(("a", 1L, 10L)).toDF("k", "ord", "id")
      .groupBy($"k").agg(TopKLongs.topK(5, $"ord", $"id").as("t"))
      .select(size($"t")).as[Int].head()
    assert(out === 1)
  }

  test("nulls are skipped, not ranked") {
    val df = Seq(("a", Some(5L), 1L), ("a", None, 2L), ("a", Some(3L), 3L))
      .toDF("k", "ord", "id")
    val out = df.groupBy($"k").agg(TopKLongs.topK(2, $"ord", $"id").as("t"))
      .select(explode($"t")).select($"col.ord").as[Long].collect().sorted
    assert(out.toSeq === Seq(3L, 5L))
  }

  test("plans as a partial+final aggregate, not a per-key sort window") {
    val df = (1L to 100L).map(i => (i % 5, i, i)).toDF("k", "ord", "id")
    val plan = df.groupBy($"k")
      .agg(TopKLongs.topK(3, $"ord", $"id").as("t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    assert(!plan.contains("Window"), "top-k aggregate must not plan a window")
  }
}
