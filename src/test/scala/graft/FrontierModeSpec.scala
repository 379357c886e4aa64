package graft

import org.apache.spark.sql.functions._
import graft.query.BipartiteExpand
import graft.query.BipartiteExpand.FrontierMode

/** Pins the auto broadcast/shuffle frontier-path selection
  * ([[BipartiteExpand.FrontierMode.Auto]]): the decision is PER LEVEL
  * from the measured frontier count, the switch builds the shuffle
  * orientations exactly once, and every mode returns the identical
  * vertex set with no cache residue.
  */
class FrontierModeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def edges = graft.operators.GraphQueries.copurchaseEdges(spark, dir)

  private def run(mode: FrontierMode,
      probe: (Int, Boolean) => Unit = (_, _) => ()): Set[Long] =
    BipartiteExpand.expand(spark, edges, "cust", "part", lit(0L), 4,
      mode = mode, onLevelMode = probe)
      .collect().map(_.getLong(0)).toSet

  test("auto switches broadcast → shuffle when the frontier outgrows the ceiling") {
    // start from a clean cache so the no-residue assertion below sees
    // only THIS test's caches (sibling suites may legitimately leave
    // cached tables behind)
    spark.catalog.clearCache()
    // level-1 frontier is the single root (broadcast); the level-2+
    // frontiers exceed a 1-row ceiling, forcing the shuffle path
    val modes = scala.collection.mutable.ArrayBuffer[(Int, Boolean)]()
    val tiny = run(FrontierMode.Auto(maxBroadcastRows = 1L),
      (l, b) => modes += ((l, b)))
    assert(modes.toList.map(_._1) == List(1, 2, 3), s"levels ran: $modes")
    assert(modes.toList.map(_._2) == List(true, false, false),
      s"expected broadcast at level 1 then shuffle beyond the 1-row ceiling: $modes")
    assert(spark.sharedState.cacheManager.isEmpty,
      "auto switch leaked edge/frontier caches")
    assert(tiny == run(FrontierMode.Broadcast),
      "auto(tiny ceiling) diverged from the forced broadcast result")
  }

  test("auto keeps broadcasting under a generous ceiling") {
    spark.catalog.clearCache() // see above
    val modes = scala.collection.mutable.ArrayBuffer[(Int, Boolean)]()
    val auto = run(FrontierMode.Auto(), (l, b) => modes += ((l, b)))
    assert(modes.forall(_._2),
      s"default ceiling should keep this small graph on broadcast: $modes")
    assert(auto == run(FrontierMode.Shuffle))
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("auto's byte ceiling catches wide keys the row ceiling misses") {
    spark.catalog.clearCache() // see above
    import spark.implicits._
    // few hundred ROWS (far under any row ceiling) but megabytes of
    // key BYTES: ~3 KB composite string ids — the shape that blows a
    // driver broadcast budget while looking tiny by count
    val pad = "url/" + ("x" * 3000) + "/p"
    val wide = (0 until 300).flatMap { i =>
      Seq(("R", s"m$i"), (s"$pad$i", s"m$i"),          // R ↔ peers, hop ring 1
        (s"$pad$i", s"n$i"), (s"$pad-far-$i", s"n$i")) // peers ↔ far, ring 2
    }.toDF("cust", "part")
    def runWide(mode: FrontierMode,
        probe: (Int, Boolean) => Unit = (_, _) => ()): Set[String] =
      BipartiteExpand.expand(spark, wide, "cust", "part", lit("R"), 4,
        mode = mode, onLevelMode = probe)
        .collect().map(_.getString(0)).toSet
    val modes = scala.collection.mutable.ArrayBuffer[(Int, Boolean)]()
    val got = runWide(
      FrontierMode.Auto(maxBroadcastRows = 1L << 20, maxBroadcastBytes = 64L << 10),
      (l, b) => modes += ((l, b)))
    // level 1's frontier is the 1-row root (broadcast); level 2+ carry
    // the ~1 MB-cached wide-key frontiers — rows ≪ ceiling, bytes over
    assert(modes.toList.map(_._1) == List(1, 2, 3), s"levels ran: $modes")
    assert(modes.toList.map(_._2) == List(true, false, false),
      s"wide keys must trip the byte ceiling despite the tiny row count: $modes")
    assert(got == runWide(FrontierMode.Broadcast),
      "byte-ceiling switch changed the result set")
    // the same graph under the DEFAULT ceilings stays on broadcast:
    // narrow row counts only trip the byte test when genuinely wide
    val defModes = scala.collection.mutable.ArrayBuffer[(Int, Boolean)]()
    runWide(FrontierMode.Auto(), (l, b) => defModes += ((l, b)))
    assert(defModes.forall(_._2),
      s"default 64 MiB ceiling should keep this small graph on broadcast: $defModes")
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("per-level probes cost one job barrier each (fused materialize-and-count)") {
    // The absolute job count is AQE-fan-out noise; the stable signal is
    // the MARGINAL cost of one more iterative level. Each level adds
    // exactly one probe barrier (persist + count) plus its two hop
    // joins' stage jobs; the round-5 shape spent TWO barriers per level
    // (localCheckpoint, then isEmpty). Pin the marginal job cost of
    // level 4 over level 3 so a regression re-splitting the probe
    // (or adding driver-side actions per level) trips it.
    val sc = spark.sparkContext
    def jobsAt(level: Int): Int = {
      val group = s"frontier-jobcount-$level-${System.nanoTime()}"
      sc.setJobGroup(group, "job-count pin", interruptOnCancel = false)
      try {
        BipartiteExpand.expand(spark, edges, "cust", "part", lit(0L), level,
          mode = FrontierMode.Broadcast)
        sc.statusTracker.getJobIdsForGroup(group).length
      } finally sc.clearJobGroup()
    }
    jobsAt(3) // warm-up: JIT + parquet footer caches off the measurement
    val l3 = jobsAt(3)
    val l4 = jobsAt(4)
    info(s"jobs: level3=$l3 level4=$l4 marginal=${l4 - l3}")
    assert(l4 - l3 <= 10,
      s"one extra BFS level cost ${l4 - l3} jobs (level3=$l3, level4=$l4) — " +
      "expected one fused probe barrier + hop-join stage fan-out")
  }
}
