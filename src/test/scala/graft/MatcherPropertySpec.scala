package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.enrich.EventMatcher
import graft.model.Schemas._

/** Property-based validation of the stack matcher (SURVEY §5.2): random
  * call trees are serialized to event streams whose ground truth (matching
  * pairs, depth, parent, inc/exc) is known by construction; the matcher
  * must recover it exactly. A mutation case drops random Leave events and
  * checks the reference's tolerance semantics (unmatched events stay
  * unmatched, the rest still pair up).
  */
class MatcherPropertySpec extends SparkSpec {
  import spark.implicits._

  /** A generated call: id, span, children nested strictly inside. */
  case class Call(name: String, t0: Long, t1: Long, children: Seq[Call])

  private def genCalls(rng: Random, t0: Long, t1: Long, depth: Int): Seq[Call] = {
    if (t1 - t0 < 10 || depth > 4) return Nil
    val n = rng.nextInt(3) + (if (depth == 0) 1 else 0)
    val width = (t1 - t0) / math.max(n, 1)
    (0 until n).flatMap { i =>
      val s = t0 + i * width + 1 + rng.nextInt(math.max(width.toInt / 4, 1))
      val e = math.min(t0 + (i + 1) * width - 1, s + 2 + rng.nextInt(math.max(width.toInt / 2, 2)))
      if (e - s < 2) Nil
      else Seq(Call(s"fn${rng.nextInt(5)}", s, e, genCalls(rng, s + 1, e - 1, depth + 1)))
    }
  }

  private def flatten(c: Call, parentT0: Option[Long], depth: Int,
                      acc: mutable.ArrayBuffer[(Long, Long, String, String, Option[Long], Int)]): Unit = {
    // (enterTs, leaveTs, name, _, parentEnterTs, depth)
    acc += ((c.t0, c.t1, c.name, "", parentT0, depth))
    c.children.foreach(ch => flatten(ch, Some(c.t0), depth + 1, acc))
  }

  test("matcher recovers ground truth on random well-nested traces") {
    for (seed <- Seq(7L, 42L, 99L, 1234L, 5678L, 24601L, 31337L, 271828L)) {
      val rng = new Random(seed)
      val nProc = 1 + rng.nextInt(3)
      val truth = mutable.ArrayBuffer[(Int, Long, Long, String, Option[Long], Int)]()
      val events = mutable.ArrayBuffer[(Long, Long, String, String, Int)]()
      for (p <- 0 until nProc) {
        val roots = genCalls(new Random(seed * 31 + p), 0, 5000, 0)
        val flat = mutable.ArrayBuffer[(Long, Long, String, String, Option[Long], Int)]()
        roots.foreach(flatten(_, None, 0, flat))
        for ((t0, t1, name, _, parent, depth) <- flat) {
          truth += ((p, t0, t1, name, parent, depth))
          // event ids: unique per (proc, ts) since spans are distinct
          events += ((p * 1000000L + t0, t0, Enter, name, p))
          events += ((p * 1000000L + t1, t1, Leave, name, p))
        }
      }
      if (truth.nonEmpty) {
        val df = events.toSeq.toDF(EventId, TimestampNs, EventType, Name, Process)
        val enriched = EventMatcher.enrich(df).collect()
          .map(r => (r.getAs[Int](Process), r.getAs[Long](TimestampNs),
            r.getAs[String](EventType)) -> r).toMap

        for ((p, t0, t1, name, parent, depth) <- truth) {
          val e = enriched((p, t0, Enter))
          assert(e.getAs[Long](MatchingTs) == t1, s"match of $name@$p:$t0")
          assert(e.getAs[Int](Depth) == depth)
          assert(Option(e.getAs[java.lang.Long](ParentEventId))
            .map(_.toLong) == parent.map(p * 1000000L + _))
          assert(e.getAs[Long](TimeInc) == t1 - t0)
          // exc = inc − Σ direct children's inc (computed from truth)
          val childIncs = truth.collect {
            case (`p`, ct0, ct1, _, Some(`t0`), _) => ct1 - ct0
          }.sum
          assert(e.getAs[Long](TimeExc) == (t1 - t0) - childIncs)
          // involution
          val l = enriched((p, t1, Leave))
          assert(l.getAs[Long](MatchingEventId) == e.getAs[Long](EventId))
        }
      }
    }
  }

  test("dropping leaves keeps the remainder matched (tolerance)") {
    for (seed <- Seq(3L, 17L, 404L, 9000L, 123456L)) {
      val rng = new Random(seed)
      val roots = genCalls(rng, 0, 4000, 0)
      val flat = mutable.ArrayBuffer[(Long, Long, String, String, Option[Long], Int)]()
      roots.foreach(flatten(_, None, 0, flat))
      if (flat.nonEmpty) {
        val dropT1 = flat.map(_._2).filter(_ => rng.nextDouble() < 0.3).toSet
        val events = flat.flatMap { case (t0, t1, name, _, _, _) =>
          Seq((t0, t0, Enter, name, 0)) ++
            (if (dropT1.contains(t1)) Nil else Seq((t1, t1, Leave, name, 0)))
        }
        val df = events.toSeq.toDF(EventId, TimestampNs, EventType, Name, Process)
        val out = EventMatcher.enrich(df).collect()
        val byId = out.map(r => r.getAs[Long](EventId) -> r).toMap
        for ((t0, t1, name, _, _, _) <- flat) {
          val e = byId(t0)
          if (!dropT1.contains(t1)) {
            // its own leave survived: pairing may shift to an inner dropped
            // frame's name-match, but a Leave with this name at some ts must
            // match — reference semantics only guarantee name equality
            if (!e.isNullAt(e.fieldIndex(MatchingEventId)))
              assert(byId(e.getAs[Long](MatchingEventId)).getAs[String](Name) == name)
          }
        }
        // every matched pair is mutually linked and name-equal
        out.filter(r => !r.isNullAt(r.fieldIndex(MatchingEventId))).foreach { r =>
          val m = byId(r.getAs[Long](MatchingEventId))
          assert(m.getAs[Long](MatchingEventId) == r.getAs[Long](EventId))
          assert(m.getAs[String](Name) == r.getAs[String](Name))
        }
      }
    }
  }
}
