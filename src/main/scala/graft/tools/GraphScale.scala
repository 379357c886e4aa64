package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.query.GraphAlgos

/** Scale-evidence run for the graph analytics (the round-11 additions'
  * twin of [[PipelineScale]]): triangle counting, k-core, PageRank,
  * SSSP and link prediction measured on graphs `factor`× the sf-dir's
  * strong-tie co-order graph.
  *
  * Graph construction: `factor` replicas of the lineitem fact table
  * with BOTH keys (orderkey, partkey) shifted into disjoint per-replica
  * ranges, so the derived strong-tie graph is exactly `factor`
  * independent copies of the 1× graph. That choice makes the run
  * self-checking: every structural count (edges, triangles, k-core
  * survivors per round, reached SSSP vertices, predicted pairs) must
  * equal exactly `factor ×` its 1× value — recorded per factor as
  * `counts_exact` — while wall time should scale ~linearly (the
  * all-equi-join design claim; a hidden quadratic or a hub-sensitive
  * stage would bend the slope). PageRank's top fixed-point rank is
  * recorded per factor (it scales ~1/factor — the 10^12 mass base
  * normalizes over factor× as many nodes).
  *
  * One JSON line per factor on stdout; append to GRAPH_SCALE_r{N}.jsonl.
  */
object GraphScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-graph-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def j(v: Double): String = f"$v%.2f"

    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey")

    // strong-tie edges (a < b co-ordered in >= 2 distinct orders) —
    // the same definition as GraphQueries.strongTieEdges, over an
    // arbitrary (ok, pk) fact slice
    def strongTie(fact: DataFrame): DataFrame =
      fact.as("x").join(fact.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(countDistinct(col("x.ok")).as("no"))
        .filter(col("no") >= 2)
        .select("a", "b")

    var base: Map[String, Long] = Map.empty

    for (factor <- factors) {
      // divisible by 9 so the SSSP edge weight 1 + (a+b) mod 9 is
      // invariant across replicas (a general 1e9 shift is ≡ 1 mod 9
      // and would perturb per-replica weights — caught by the
      // counts_exact check on the first run)
      val shift = 999999999L
      val fact = (0 until factor).map { r =>
        li.select(
          (col("l_orderkey") + lit(r * shift)).as("ok"),
          (col("l_partkey") + lit(r * shift)).as("pk"))
      }.reduce(_ unionAll _)

      val (e, buildSec) = timed {
        val ed = strongTie(fact).localCheckpoint()
        ed.count()
        ed
      }
      // triangles run on the DENSE co-order projection (every distinct
      // co-ordered pair) — the strong-tie filter leaves ~1 triangle
      // per replica at sf0.1, which measures nothing
      val (co, coBuildSec) = timed {
        val ed = fact.as("x").join(fact.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
          .select(col("x.pk").as("a"), col("y.pk").as("b"))
          .distinct().localCheckpoint()
        ed.count()
        ed
      }

      val (tri, triSec) = timed {
        GraphAlgos.triangleCount(co).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      // DOULION (p = 1/2) on the same dense projection: the sampled
      // tier's wall-time win over the exact wedge join, plus its
      // relative error against the exact count just measured
      val (dl, doulionSec) = timed {
        GraphAlgos.triangleCountDoulion(co, pInv = 2).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val (core, coreSec) = timed {
        // k = 2 here: the sf0.1 strong-tie graph's 3-core is EMPTY
        // after one peel (gate-scale k=3 liveness is sf0.01-specific),
        // and measuring three empty rounds is not scale evidence
        GraphAlgos.kCore(e, k = 2, rounds = 4).collect()
          .map(r => s"kcore_r${r.getInt(0)}" -> r.getLong(1)).toMap
      }
      val (prTop, prSec) = timed {
        // pr_top scales ~1/factor (the mass base 10^12 is normalized
        // over factor x as many nodes) — recorded for the slope, not
        // for a cross-factor equality check
        GraphAlgos.pageRank(e, iters = 2)
          .agg(max("pr_fx")).head.getLong(0)
      }
      // seeds: the 1x rule (id % 97 == 0) applied to the replica-local
      // id, so every replica gets the same seed set
      val (ssspAgg, ssspSec) = timed {
        val d = GraphAlgos.sssp(e, u => (u % shift) % 97 === 0, rounds = 3)
        d.agg(count(lit(1)).as("n"), sum("dist").as("s")).head
      }
      val (lp, lpSec) = timed {
        // minCn = 1 here: the sf0.1 strong-tie graph has NO
        // non-adjacent pair with >= 2 common neighbors (the gate row's
        // threshold is sf0.01-live), and a 0-row measurement is not
        // scale evidence
        GraphAlgos.commonNeighbors(e, degCap = 16, minCn = 1L).count()
      }

      val counts = Map(
        "st_edges" -> e.count(),
        "co_edges" -> tri("edges"), "triangles" -> tri("triangles"),
        "sssp_reached" -> ssspAgg.getLong(0),
        "sssp_distsum" -> ssspAgg.getLong(1),
        "predicted_pairs" -> lp) ++ core
      if (factor == factors.head && factors.head == 1) base = counts
      val exact = base.nonEmpty &&
        counts.forall { case (k, v) => v == base(k) * factor }

      println(
        s"""{"tool":"graph_scale","sf_dir":"$sfDir","factor":$factor,""" +
        s""""build_sec":${j(buildSec)},"co_build_sec":${j(coBuildSec)},""" +
        s""""triangle_sec":${j(triSec)},"doulion_sec":${j(doulionSec)},""" +
        s""""doulion_estimate":${dl("triangles_estimate")},""" +
        s""""doulion_err_pct":${j(math.abs(dl("triangles_estimate") -
          tri("triangles")).toDouble * 100 / math.max(tri("triangles"), 1L))},""" +
        s""""kcore_sec":${j(coreSec)},"pagerank_sec":${j(prSec)},""" +
        s""""sssp_sec":${j(ssspSec)},"linkpred_sec":${j(lpSec)},""" +
        counts.toSeq.sortBy(_._1)
          .map { case (k, v) => s""""$k":$v""" }.mkString(",") + "," +
        s""""pr_top":$prTop,"counts_exact":$exact}""")
    }
    spark.stop()
  }
}
