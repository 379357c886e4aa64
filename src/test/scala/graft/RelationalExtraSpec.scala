package graft

import org.apache.spark.sql.functions._

/** Checks for catalog entries whose semantics aren't oracle-checkable
  * (sketches) plus sanity on the SQL-path grouping sets. */
class RelationalExtraSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct row carries a true ±2% verdict per group") {
    val rows = Catalog.byName("q_approx_distinct").fn(spark, dir).collect()
    val exact = graft.sources.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, e, ok) = (r.getString(0), r.getLong(1), r.getBoolean(3))
      assert(e == exact(k), s"$k: exact_parts=$e expected ${exact(k)}")
      assert(ok, s"$k: Spark HLL estimate outside ±2% of $e")
    }
  }

  test("cube emits all four grouping-set combinations") {
    val rows = Catalog.byName("q_cube").fn(spark, dir).collect()
    def n(segNull: Boolean, natNull: Boolean) =
      rows.count(r => r.isNullAt(0) == segNull && r.isNullAt(1) == natNull)
    assert(n(true, true) == 1)        // grand total
    assert(n(true, false) > 0)        // per-nation
    assert(n(false, true) > 0)        // per-segment
    assert(n(false, false) > 0)       // full detail
  }
}
