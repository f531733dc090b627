package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.wave.TreeDedupe

/** J1 — per-seed tree dedupe with the keep-Completed preference, pinned
  * against an independent in-test simulation of the reference's URL-map
  * walk (item_dedupe.go:4-33): DFS pre-order traversal, first occurrence
  * claims the map slot, a later Completed node evicts a non-Completed
  * holder, an already-Completed holder is never evicted.
  */
class TreeDedupeSpec extends AnyFunSuite {
  import EngineSpec.spark

  private case class Node(seed: String, ord: Int, url: String, status: String,
      isRoot: Boolean = false)

  /** The reference map walk, restated imperatively (not the windowed form
    * under test): winners per (seed, url) among non-root nodes.
    */
  private def simulate(nodes: Seq[Node]): Set[(String, Int)] =
    nodes.filterNot(_.isRoot).groupBy(_.seed).toSeq.flatMap { case (_, tree) =>
      val slots = scala.collection.mutable.LinkedHashMap.empty[String, Node]
      tree.sortBy(_.ord).foreach { n =>
        slots.get(n.url) match {
          case Some(holder)
              if holder.status != TreeDedupe.Completed &&
                n.status == TreeDedupe.Completed =>
            slots(n.url) = n
          case Some(_) => () // later duplicate dropped
          case None => slots(n.url) = n
        }
      }
      slots.values.map(n => (n.seed, n.ord))
    }.toSet

  private def run(nodes: Seq[Node]): Set[(String, Int)] = {
    import spark.implicits._
    val df = nodes.map(n => (n.seed, n.ord, n.url, n.status, n.isRoot))
      .toDF("seed_id", "ord", "url_canon", "status", "is_root")
    TreeDedupe.perSeed(df).filter(!org.apache.spark.sql.functions.col("is_root"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
  }

  test("keep-Completed tie-breaks: every first/later status combination") {
    val s = "http://s.com/"
    val nodes = Seq(
      Node(s, 0, s, "GotChildren", isRoot = true),
      // first Completed sticks against a later Completed AND a later Fresh
      Node(s, 1, "http://s.com/a", "Completed"),
      Node(s, 2, "http://s.com/a", "Completed"),
      Node(s, 3, "http://s.com/a", "Fresh"),
      // first Fresh evicted by the FIRST later Completed (ord 5, not 6)
      Node(s, 4, "http://s.com/b", "Fresh"),
      Node(s, 5, "http://s.com/b", "Completed"),
      Node(s, 6, "http://s.com/b", "Completed"),
      // no Completed occurrence: first wins
      Node(s, 7, "http://s.com/c", "Failed"),
      Node(s, 8, "http://s.com/c", "Fresh"),
      // singleton passes through
      Node(s, 9, "http://s.com/d", "GotChildren"))
    val got = run(nodes)
    assert(got == Set((s, 1), (s, 5), (s, 7), (s, 9)))
    assert(got == simulate(nodes))
  }

  test("dedupe is scoped per seed; roots never participate") {
    val (s1, s2) = ("http://s1.com/", "http://s2.com/")
    val shared = "http://shared.org/hub"
    val nodes = Seq(
      Node(s1, 0, s1, "GotChildren", isRoot = true),
      Node(s2, 0, s2, "GotChildren", isRoot = true),
      // same URL under two seeds: kept once under EACH
      Node(s1, 1, shared, "Fresh"),
      Node(s2, 1, shared, "Fresh"),
      // a child whose URL equals another seed's ROOT url: the root is not
      // in the map, so the child survives independently
      Node(s1, 2, s2, "Fresh"))
    val got = run(nodes)
    assert(got == Set((s1, 1), (s2, 1), (s1, 2)))
    assert(got == simulate(nodes))
  }

  test("oracle fixture: windowed form == reference map walk on all 40 trees") {
    graft.gen.OracleData.ensure(spark)
    val rows = graft.gen.OracleData.table(spark, "items").collect().map(r =>
      Node(r.getAs[String]("seed_id"), r.getAs[Int]("ord"),
        r.getAs[String]("url_canon"), r.getAs[String]("status"),
        r.getAs[Boolean]("is_root"))).toSeq
    // the fixture must actually exercise the eviction path: at least one
    // group where a later Completed beats an earlier non-Completed
    val evictions = rows.filterNot(_.isRoot).groupBy(n => (n.seed, n.url))
      .values.count { g =>
        val sorted = g.sortBy(_.ord)
        sorted.head.status != TreeDedupe.Completed &&
          sorted.tail.exists(_.status == TreeDedupe.Completed)
      }
    assert(evictions >= 5, s"fixture plants keep-Completed evictions: $evictions")
    assert(run(rows) == simulate(rows))
  }
}
