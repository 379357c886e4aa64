package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label propagation connected components over an undirected pair
  * list — the second iterative driver-loop algorithm in the engine
  * (same shape as [[BipartiteExpand]]: small-step joins, per-iteration
  * `localCheckpoint`, fixpoint detection).
  *
  * Used by dedup to turn pairwise near-duplicate verdicts into
  * clusters: a chain a~b~c is ONE cluster even when (a,c) was never
  * compared directly. Duplicate clusters are tiny and shallow, so the
  * hop-per-iteration propagation converges in a handful of rounds;
  * `maxIter` bounds the pathological chain.
  */
object ConnectedComponents {

  /** Label every vertex of `pairs(aCol, bCol)` with its component id
    * (the minimum vertex id in the component). Returns
    * (vertex, component). */
  def run(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    def cut(df: DataFrame): DataFrame = Checkpoints.cut(df, checkpointDir)
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist()

    var labels = cut(sym.select(col("src").as("vertex"))
      .distinct()
      .withColumn("component", col("vertex")))

    var converged = sym.isEmpty
    var i = 0
    while (i < maxIter && !converged) {
      // each vertex adopts the min label among itself and its neighbors;
      // the per-vertex `changed` verdict rides in the SAME cut frame
      // (the BipartiteExpand fused-probe pattern), so convergence is a
      // filter over the already-materialized checkpoint instead of a
      // second label-table join per iteration
      val neighborMin = sym
        .join(labels, sym("src") === labels("vertex"))
        .groupBy(col("dst").as("vertex"))
        .agg(min("component").as("nmin"))
      val next = cut(labels
        .join(neighborMin, Seq("vertex"), "left")
        .select(col("vertex"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"),
          (col("nmin").isNotNull && col("nmin") < col("component"))
            .as("changed")))
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("vertex", "component")
      i += 1
    }
    sym.unpersist()
    labels
  }
}
