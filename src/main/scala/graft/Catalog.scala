package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract.
  *
  * @param name     stable query name (key in `SparkEntry.queries`)
  * @param fn       Spark implementation; `dir` is a testdata sf directory
  * @param oracle   equivalent ANSI SQL for the DuckDB oracle (None for
  *                 ops whose semantics aren't SQL-expressible — the
  *                 driver then records a weaker rows-only check)
  * @param headline included in the per-round benchmark set (measured
  *                 at the primary scale AND the second scale point)
  * @param slope    measured ONLY at the second (smaller) scale point:
  *                 the tier for deliberate exact all-pairs baselines —
  *                 their role is anchoring the crossover evidence of
  *                 their bucketed twins, which the sf-slope measurement
  *                 preserves without spending headline budget on an
  *                 O(n²) plan every round (round-9 verdict item 5)
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    slope: Boolean = false)

/** Source of truth for the full operator surface. `SparkEntry` derives
  * both its `queries` and `oracleSql` maps from here so the two can
  * never drift apart (the driver hash-compares them pairwise).
  */
object Catalog {
  lazy val all: Seq[Q] =
    graft.operators.RelationalQueries.all ++
    graft.operators.GraphQueries.all ++
    graft.operators.TextQueries.all ++
    graft.operators.VectorQueries.all ++
    graft.operators.EventQueries.all ++
    graft.operators.MultimodalQueries.all ++
    graft.operators.PipelineQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
