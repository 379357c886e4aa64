package graft

import graft.ingest.EdgeBuilder
import graft.query.CoStar

/** Golden end-to-end expansion tests against the in-memory oracle
  * (SURVEY.md §5 tier 2): every level 1..4, both query types. */
class CoStarSpec extends SparkSpec {
  private lazy val dir = new java.io.File(resource("imdb")).getPath
  private lazy val oracleEdges = ImdbOracle.edges(dir)
  private lazy val sparkEdges = EdgeBuilder.materialize(EdgeBuilder.edges(spark,
    s"$dir/basic1000.tsv", s"$dir/principals1000.tsv", s"$dir/names1000.tsv"))

  // the best-connected actor and movie in the sample, picked from the oracle
  private lazy val topActor =
    oracleEdges.groupBy(_._2).view.mapValues(_.size).maxBy(v => (v._2, v._1))._1
  private lazy val topMovie =
    oracleEdges.groupBy(_._1).view.mapValues(_.size).maxBy(v => (v._2, v._1))._1

  private def run(root: String, tpe: CoStar.QueryType, level: Int): Set[String] =
    CoStar.run(spark, sparkEdges, root, tpe, level)
      .vertices.collect().map(_.getString(0)).toSet

  for (level <- 1 to 4) {
    test(s"actor expansion level $level matches oracle") {
      val got = run(topActor, CoStar.ActorQuery, level)
      val want = ImdbOracle.expand(oracleEdges, topActor, byName = true, level)
      assert(got == want, s"level $level: got ${got.size}, want ${want.size}")
    }
    test(s"movie expansion level $level matches oracle") {
      val got = run(topMovie, CoStar.MovieQuery, level)
      val want = ImdbOracle.expand(oracleEdges, topMovie, byName = false, level)
      assert(got == want, s"level $level: got ${got.size}, want ${want.size}")
    }
  }

  test("level 1 is root only") {
    assert(run(topActor, CoStar.ActorQuery, 1) == Set(topActor))
  }

  test("levels are monotone: result(L) ⊆ result(L+1)") {
    val sets = (1 to 4).map(run(topActor, CoStar.ActorQuery, _))
    sets.sliding(2).foreach { case Seq(a, b) => assert(a.subsetOf(b)) }
  }

  test("unknown root yields empty result") {
    assert(run("No Such Person Exists", CoStar.ActorQuery, 3).isEmpty)
  }

  test("P7: blank root and bad level are rejected") {
    intercept[IllegalArgumentException] {
      CoStar.run(spark, sparkEdges, "  ", CoStar.ActorQuery, 2)
    }
    intercept[IllegalArgumentException] {
      CoStar.run(spark, sparkEdges, topActor, CoStar.ActorQuery, 5)
    }
  }

  test("vertex edges exclude self-loops and stay within the vertex set") {
    val res = CoStar.run(spark, sparkEdges, topActor, CoStar.ActorQuery, 2)
    val vs = res.vertices.collect().map(_.getString(0)).toSet
    val es = res.vertexEdges(CoStar.ActorQuery).collect()
      .map(r => (r.getString(0), r.getString(1)))
    es.foreach { case (a, b) =>
      assert(a != b)
      assert(vs.contains(a) && vs.contains(b))
    }
  }
}
