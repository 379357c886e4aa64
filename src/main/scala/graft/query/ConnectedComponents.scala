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
  * hop-per-iteration propagation converges in a handful of rounds; for
  * the adversarial case (a crawl-scale near-dup CHAIN longer than any
  * fixed iteration budget) later rounds add a pointer-jumping shortcut
  * — v adopts its label's own label — which doubles propagation reach
  * per round, so convergence is O(log n) on any topology. If `maxIter`
  * is still exhausted with labels changing, the result is WRONG (some
  * vertices carry a non-minimal label and dedup would under-merge);
  * `strict` (the default) throws instead of returning it silently.
  */
object ConnectedComponents {

  /** Label every vertex of `pairs(aCol, bCol)` with its component id
    * (the minimum vertex id in the component). Returns
    * (vertex, component).
    *
    * @param strict throw [[IllegalStateException]] when `maxIter` is
    *               reached with the fixpoint unreached, instead of
    *               returning silently-unconverged labels; `false`
    *               returns the best-effort labels (every label is a
    *               member of the right component — only its minimality
    *               is unfinished)
    */
  def run(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, checkpointDir: Option[String] = None,
      strict: Boolean = true): DataFrame = {
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
      // the neighbor step is the fixpoint test: no neighbor-min change
      // means every edge already agrees on the component minimum
      converged = next.filter(col("changed")).isEmpty
      labels = next.select("vertex", "component")
      if (!converged && i >= 1) {
        // pointer jumping: v adopts its label's own label (label values
        // are always vertex ids of the same component, so the jump is
        // semantics-preserving). Combined with the one-hop neighbor
        // step this doubles the distance a minimum travels per round —
        // a 300-vertex chain converges in ~9 rounds instead of 300.
        // Deferred to round 2+ so the shallow-cluster common case pays
        // zero extra joins; the jump joins label-table-sized frames
        // only, never the edge table.
        val parents = labels
          .select(col("vertex").as("pv"), col("component").as("pc"))
        labels = cut(labels
          .join(parents, col("component") === col("pv"), "left")
          .select(col("vertex"),
            least(col("component"), coalesce(col("pc"), col("component")))
              .as("component")))
      }
      i += 1
    }
    if (!converged) {
      // `converged` was computed BEFORE the final iteration's pointer
      // jump; the jump may have completed propagation, so re-test the
      // true fixpoint (one neighbor-min probe) before condemning the
      // labels — otherwise strict mode throws on correct results that
      // converged via the last jump. Only runs on the maxIter boundary.
      converged = sym
        .join(labels, sym("src") === labels("vertex"))
        .groupBy(col("dst").as("vertex"))
        .agg(min("component").as("nmin"))
        .join(labels, Seq("vertex"))
        .filter(col("nmin") < col("component"))
        .isEmpty
    }
    sym.unpersist()
    if (!converged && strict)
      throw new IllegalStateException(
        s"connected components did not converge within maxIter=$maxIter " +
        "iterations: labels were still changing, so returned clusters " +
        "would be silently under-merged. Raise maxIter (convergence is " +
        "O(log n) rounds) or pass strict=false for best-effort labels.")
    labels
  }
}
