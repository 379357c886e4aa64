package graft

import org.apache.spark.sql.functions._
import graft.query.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, triangle, and singleton-pair components") {
    val got = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain -> all label 1
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle -> label 10
      (20L, 21L)))                    // pair -> label 20
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges within maxIter") {
    val chain = (0L until 15L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(0L))
    assert(got.size == 16)
  }

  test("empty pair list yields empty labels") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("pathological chain far longer than maxIter converges via pointer jumping") {
    // 301-vertex path: one-hop propagation alone needs 300 rounds —
    // before the jump step this silently returned unconverged labels
    val got = cc((0L until 300L).map(i => (i, i + 1)))
    assert(got.size == 301)
    assert(got.values.toSet == Set(0L),
      s"chain must collapse to component 0, got ${got.values.toSet.take(5)}")
  }

  test("strict mode fails loudly when maxIter is exhausted before the fixpoint") {
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(chain, "a", "b", maxIter = 2).collect()
    }
    assert(e.getMessage.contains("maxIter=2"))
    // non-strict: best-effort labels come back (membership right,
    // minimality unfinished) — the caller opted into the caveat
    val lax = ConnectedComponents.run(chain, "a", "b", maxIter = 2,
      strict = false)
    assert(lax.count() == 41)
  }

  test("strict mode does NOT throw when the final iteration's jump converges") {
    // 5-vertex chain, maxIter=2: the i=1 neighbor step still reports
    // changes (converged=false) but the i=1 pointer jump completes
    // propagation — the boundary re-check must recognize the fixpoint
    // instead of condemning correct labels
    val chain = (0L until 4L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.run(chain, "a", "b", maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 5)
  }

  test("dedupClusters keeps exactly one survivor per duplicate cluster") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val pairs = graft.dedup.Dedup.nearDupPairs(docs, "doc_id", "text", 0.8)
    val comps = ConnectedComponents.run(pairs, "id_a", "id_b")
    val nClusters = comps.select("component").distinct().count()
    val nMembers = comps.count()
    val cleaned = graft.dedup.Dedup.dedupClusters(docs, "doc_id", "text", 0.8)
    assert(cleaned.count() == docs.count() - (nMembers - nClusters))
    // survivors contain every component's min id
    val keepers = comps.filter(col("vertex") === col("component"))
    assert(cleaned.join(keepers,
      cleaned("doc_id") === keepers("vertex"), "left_semi").count() == nClusters)
  }
}
