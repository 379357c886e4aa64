package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the LATEST right row with
  * `rightTs <= leftTs` under the same key: the canonical time-series
  * enrichment operator (trade→quote, event→last-state) that Spark has
  * no built-in for and the build brief calls out by name.
  *
  * Shape (preference order (a): composition, no custom strategy): tag
  * and UNION the two inputs, one shuffle-and-sort by (key, ts,
  * side-tag), then `last(_, ignoreNulls)` over the unbounded-preceding
  * window carries each right row's payload forward to every following
  * left row. No join operator at all — cost is one exchange + sort of
  * |L|+|R|, versus the nested-loop or exploding inequality-join
  * alternatives. Right rows sort BEFORE left rows at equal timestamps,
  * so `rightTs == leftTs` matches (the `>=` convention, same as DuckDB
  * ASOF JOIN, which serves as the oracle).
  *
  * Left rows with no prior right row carry nulls — filter on a right
  * column's nullability for inner semantics.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.filterNot(_ == key).toSeq
    val rCols = right.columns.filterNot(_ == key).toSeq
    require(lCols.intersect(rCols).isEmpty,
      "left/right column names (other than the key) must be disjoint")
    val l = left.select(
      Seq(col(key), col(leftTs).as("graft_ts"), lit(1).as("graft_is_left")) ++
      lCols.map(col) ++
      rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(key), col(rightTs).as("graft_ts"), lit(0).as("graft_is_left")) ++
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rCols.map(col): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("graft_ts"), col("graft_is_left"), col(rightTs))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .select(
        Seq(col(key), col("graft_is_left")) ++ lCols.map(col) ++
        rCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("graft_is_left") === 1)
      .drop("graft_is_left")
  }
}
