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

  test("q_histogram: buckets partition the table, bounds nest, bucket " +
      "math replays exactly") {
    val rows = Catalog.byName("q_histogram").fn(spark, dir)
      .select("bucket", "n_orders", "min_cents", "max_cents")
      .as[(Long, Long, Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Long, Long)])
      .collect()
    val cents = graft.sources.Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long"))
      .collect().map(_.getLong(0))
    assert(rows.map(_._2).sum == cents.length, "histogram dropped rows")
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 19))
    val (lo, hi) = (cents.min, cents.max)
    val expected = cents.groupBy(c => (c - lo) * 20 / (hi - lo + 1))
      .map { case (b, cs) => b -> (cs.length.toLong, cs.min, cs.max) }
    assert(rows.map(r => r._1 -> (r._2, r._3, r._4)).toMap == expected,
      "bucket contents diverged from the integer replay")
    // bucket [min,max] ranges must be disjoint and ordered
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a._4 < b._3, "bucket ranges overlap")
      case _ =>
    }
  }
}
