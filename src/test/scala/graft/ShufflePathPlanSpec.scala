package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.query.BipartiteExpand

/** Plan pin for the BFS shuffle-fallback path (`FrontierMode.Shuffle`,
  * `dedupEdges = true`) — the path a frontier too large to
  * broadcast takes at 100 TB. The property that makes it scale: the
  * big edge table is shuffled exactly once per orientation when the
  * caches are built, and every per-level hop join consumes those
  * caches CO-PARTITIONED — no ShuffleExchange ever sits above an edge
  * cache scan inside the loop, so per-level shuffle traffic is
  * frontier-sized, not edge-table-sized.
  */
class ShufflePathPlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("hop joins read both edge orientations co-partitioned (no exchange above the caches)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // AQE wraps the tree in an adaptive leaf node and broadcast
      // would hide the shuffle question entirely — pin the static
      // co-partitioning property the cluster plan relies on.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val edges = graft.operators.GraphQueries.copurchaseEdges(spark, dir)
      val (eSrc, eDst) =
        BipartiteExpand.shuffleOrientations(edges, "cust", "part")
      eSrc.count(); eDst.count() // materialize both caches

      // one full BFS level exactly as the loop builds it
      val frontier = eSrc.select(col("cust"))
        .filter(col("cust") === 0).distinct()
      val mids = frontier.join(eSrc, "cust").select(col("part")).distinct()
      val next = mids.join(eDst, "part").select(col("cust")).distinct()

      // The scale property, per hop join: ONE side is the (big) edge
      // cache consumed in place — an InMemoryTableScan reachable
      // without crossing any ShuffleExchange. The other (frontier)
      // side may shuffle freely: it is frontier-sized. Note the
      // frontier also READS the cache before aggregating, so a blanket
      // "no exchange above any cache scan" is the wrong pin.
      def hasDirectCacheScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
        p match {
          case _: InMemoryTableScanExec => true
          case _: ShuffleExchangeExec => false
          case other => other.children.exists(hasDirectCacheScan)
        }
      def pinJoins(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
        val plan = df.queryExecution.executedPlan
        val joins = plan.collect {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        }
        assert(joins.nonEmpty, s"$label: expected sort-merge hop joins")
        joins.foreach { j =>
          assert(j.children.exists(hasDirectCacheScan),
            s"$label: hop join re-shuffles the edge cache:\n$j")
        }
      }
      pinJoins(next, "level N")
      // 3 cache scans: the frontier's root probe of eSrc, hop 1's
      // full eSrc, hop 2's eDst — both orientations are in the plan
      assert(next.queryExecution.executedPlan
        .collect { case s: InMemoryTableScanExec => s }.size == 3,
        "expected the frontier probe + both edge orientations in the level plan")

      // and the level output is co-partitioned with the NEXT level's
      // hop-1 cache: joining it back to eSrc still consumes the cache
      // in place
      pinJoins(next.join(eSrc, "cust").select(col("part")).distinct(), "level N+1")

      eSrc.unpersist(); eDst.unpersist()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("fallback BFS matches the broadcast path and releases its caches") {
    val edges = graft.operators.GraphQueries.copurchaseEdges(spark, dir)
    val bcast = BipartiteExpand
      .expand(spark, edges, "cust", "part", lit(0L), 3)
      .collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache()
    val shuffled = BipartiteExpand
      .expand(spark, edges, "cust", "part", lit(0L), 3,
        dedupEdges = true, mode = BipartiteExpand.FrontierMode.Shuffle)
      .collect().map(_.getLong(0)).toSet
    assert(shuffled == bcast, "fallback path diverged from broadcast path")
    assert(spark.sharedState.cacheManager.isEmpty,
      "fallback path left edge caches behind")
  }
}
