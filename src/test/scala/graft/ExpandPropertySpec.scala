package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.query.BipartiteExpand

/** Property-based BFS invariants on random bipartite graphs
  * (SURVEY.md §5 tier 4), checked against a collections oracle.
  * Drives ScalaCheck generators from fixed seeds (no scalatestplus
  * bridge in the offline cache) — deterministic but varied cases.
  */
class ExpandPropertySpec extends SparkSpec {
  import spark.implicits._

  private val caseGen: Gen[(List[(Long, Long)], Long, Int)] = for {
    n <- Gen.choose(1, 40)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 12L)
      m <- Gen.choose(100L, 112L)
    } yield (a, m))
    root <- Gen.choose(0L, 12L)
    level <- Gen.choose(1, 4)
  } yield (edges, root, level)

  private def cases(n: Int): Seq[(List[(Long, Long)], Long, Int)] =
    (1 to n).flatMap(i => caseGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def oracle(edges: Set[(Long, Long)], root: Long, level: Int): Set[Long] = {
    val fwd = edges.groupMap(_._1)(_._2)
    val rev = edges.groupMap(_._2)(_._1)
    if (!fwd.contains(root)) return Set.empty
    var visited = Set(root); var frontier = Set(root)
    for (_ <- 1 until level if frontier.nonEmpty) {
      val next = frontier.flatMap(fwd.getOrElse(_, Set.empty))
        .flatMap(rev.getOrElse(_, Set.empty))
      frontier = next -- visited
      visited ++= frontier
    }
    visited
  }

  test("expand matches the collections oracle on random graphs") {
    cases(12).foreach { case (edges, root, level) =>
      val df = edges.toDF("src", "dst")
      val got = BipartiteExpand
        .expand(spark, df, "src", "dst", lit(root), level)
        .collect().map(_.getLong(0)).toSet
      val want = oracle(edges.toSet, root, level)
      assert(got == want, s"edges=$edges root=$root level=$level")
    }
  }

  test("expanded vertices are always root-typed and include the root") {
    cases(8).foreach { case (edges, root, _) =>
      val df = edges.toDF("src", "dst")
      val got = BipartiteExpand
        .expand(spark, df, "src", "dst", lit(root), 3)
        .collect().map(_.getLong(0)).toSet
      val srcSide = edges.map(_._1).toSet
      assert(got.subsetOf(srcSide))
      if (srcSide.contains(root)) assert(got.contains(root)) else assert(got.isEmpty)
    }
  }
}
