package graft

/** Catalog-wide physical-plan guard: no query may plan a cartesian
  * product or nested-loop join unless it is on the explicit allowlist
  * with a reason — the check that keeps a future edit from silently
  * regressing a scan-shape into the canonical scale-killer. */
class PlanGuardSpec extends SparkSpec {

  /** Intended all-pairs forms (small-scale exact baselines). */
  private val allowCartesian = Set(
    "q_embed_neardup" // exact all-pairs cosine: the oracle baseline the
                      // LSH form (q_embed_neardup_lsh) is checked against
  )

  /** Intended BroadcastNestedLoopJoin with a SINGLE-ROW build side
    * (a broadcast scalar/query-vector, not a data-sized loop). */
  private val allowSingleRowBnlj = Set(
    "q_cosine_topk", // 1-row query vector
    "q_ivf_topk",    // 1-row query vector + 2-row probe set
    "q_tfidf"        // 1-row corpus-count scalar
  )

  test("no catalog query plans an unintended cartesian or nested-loop join") {
    val dir = "/root/testdata/sf0.001"
    val bad = Catalog.all.flatMap { q =>
      val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct") && !allowCartesian(q.name)
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !allowSingleRowBnlj(q.name) && !allowCartesian(q.name)
      if (cart || bnlj)
        Some(s"${q.name}: ${if (cart) "CartesianProduct" else "BroadcastNestedLoopJoin"}")
      else None
    }
    assert(bad.isEmpty, s"unintended quadratic joins:\n${bad.mkString("\n")}")
  }
}
