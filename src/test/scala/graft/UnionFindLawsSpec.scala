package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property law for the connected-components driver fast path: on ANY
  * edge list, [[graft.ops.Dedup.unionFindLabels]] must produce exactly
  * the labeling a reference BFS produces — (id, min id reachable) for
  * every id in an edge, each id exactly once. Random multigraphs with
  * self-loops, duplicate edges, and both orientations exercise the
  * union-by-min + path-compression corners the fixed fixtures cannot.
  * (The DataFrame dispatch itself — driver vs distributed — is pinned
  * by the OpsSpec equivalence test; this law covers the algorithm.) */
object UnionFindLawsSpec extends Properties("UnionFindLaws") {

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.sized { size =>
      val n = math.max(2, math.min(size, 60))
      Gen.listOf(for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    }

  private def bfsLabels(edges: List[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj(a)
      adj(b) = a :: adj(b)
    }
    val ids = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val label = scala.collection.mutable.Map.empty[Long, Long]
    ids.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        // Unseen id with the smallest value in its component (ids are
        // visited in ascending order) — it labels the whole component.
        val queue = scala.collection.mutable.Queue(start)
        label(start) = start
        while (queue.nonEmpty) {
          val cur = queue.dequeue()
          adj(cur).foreach { nbr =>
            if (!label.contains(nbr)) { label(nbr) = start; queue.enqueue(nbr) }
          }
        }
      }
    }
    label.toMap
  }

  property("union-find labeling equals reference BFS min-labeling") =
    forAll(edgesGen) { edges =>
      val got = graft.ops.Dedup.unionFindLabels(edges.toArray)
      val want = bfsLabels(edges)
      Prop(got.length == want.size) :| "one row per id" &&
        Prop(got.forall { case (id, c) => want(id) == c }) :| "min-reachable labels" &&
        Prop(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted) :| "sorted by id"
    }
}
