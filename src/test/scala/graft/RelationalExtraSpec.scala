package graft

import org.apache.spark.sql.functions._

/** Checks for catalog entries whose semantics aren't oracle-checkable
  * (sketches) plus sanity on the SQL-path grouping sets. */
class RelationalExtraSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 5% of the exact cardinality") {
    val approx = Catalog.byName("q_approx_distinct").fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
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
