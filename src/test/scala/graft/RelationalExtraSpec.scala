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

  test("q_corr_exact: integer-moment corr equals a plain-Scala replay") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Catalog.byName("q_corr_exact").fn(spark, dir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val xs = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        round(col("l_extendedprice")).cast("long"))
      .as[(String, Long, Long)].collect()
    val expected = xs.groupBy(_._1).view.mapValues { rows =>
      val n = rows.length.toLong
      val (sx, sy) = (rows.map(_._2).sum, rows.map(_._3).sum)
      val sxy = rows.map(r => r._2 * r._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val c = (n.toDouble * sxy - sx.toDouble * sy) /
        math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
          (n.toDouble * syy - sy.toDouble * sy))
      (n, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0)
    }.toMap
    assert(out == expected, "corr moments replay mismatch")
    // moments stay far from 2^63 at this scale: the documented bound
    val worst = xs.map(r => r._3 * r._3).max
    assert(worst.toDouble * xs.length < 1e17,
      "y² moment magnitude approaching overflow — revisit dollar scaling")
  }

  test("q_regional_volume: all three dimension joins broadcast") {
    val df = Catalog.byName("q_regional_volume")
      .fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 3,
      s"expected region/nation-chain, customer-dim and supplier joins " +
        s"on the broadcast path, saw $nBroadcast BroadcastHashJoins:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q_fk_audit: orphan counts equal plain-Scala key-set differences") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Catalog.byName("q_fk_audit").fn(spark, dir)
      .as[(String, Long)].collect().toMap
    import graft.sources.Tables
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(col(c)).as[Long].collect()
    val custKeys = keys(Tables.customer(spark, dir), "c_custkey").toSet
    val ordCust = keys(Tables.orders(spark, dir), "o_custkey")
    val ordKeys = keys(Tables.orders(spark, dir), "o_orderkey").toSet
    val partKeys = keys(Tables.part(spark, dir), "p_partkey").toSet
    val suppKeys = keys(Tables.supplier(spark, dir), "s_suppkey").toSet
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .as[(Long, Long, Long)].collect()
    val expected = Map(
      "customer_without_order" ->
        custKeys.diff(ordCust.toSet).size.toLong,
      "lineitem_orderkey_orphan" -> li.count(r => !ordKeys(r._1)).toLong,
      "lineitem_partkey_orphan" -> li.count(r => !partKeys(r._2)).toLong,
      "lineitem_suppkey_orphan" -> li.count(r => !suppKeys(r._3)).toLong,
      "orders_custkey_orphan" -> ordCust.count(k => !custKeys(k)).toLong)
    assert(out == expected, "FK audit counts diverged from the replay")
  }

  test("q_latest_by_key: argmax aggregate equals the window formulation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Catalog.byName("q_latest_by_key").fn(spark, dir)
      .as[(Long, Long, String, String)].collect()
    // independent window-based formulation of "latest per key"
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("olk")
    val expected = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |       date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
        |       o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM olk)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin)
      .as[(Long, Long, String, String)].collect()
    assert(out.toSeq == expected.toSeq)
    // and the argmax plan carries NO window/sort-within-key operator
    val plan = Catalog.byName("q_latest_by_key").fn(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"latest-by-key must be a hash-aggregate argmax, not a window:\n$plan")
  }

  test("q_tpch_q17: decorrelated filter equals the correlated-subquery form") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Catalog.byName("q_tpch_q17").fn(spark, dir)
      .as[(Long, Long)].collect().head
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("l17")
    graft.sources.Tables.part(spark, dir).createOrReplaceTempView("p17")
    // the textbook correlated form, integerized the same way
    val expected = spark.sql(
      """WITH li AS (SELECT l_partkey, CAST(l_quantity AS LONG) AS qty,
        |  CAST(round(l_extendedprice * 100) AS LONG) AS cents FROM l17)
        |SELECT count(*) AS n_small,
        |       coalesce(sum(cents), CAST(0 AS LONG)) AS rev_cents
        |FROM li JOIN p17 ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#1'
        |  AND qty * (SELECT count(*) FROM li i WHERE i.l_partkey = li.l_partkey) * 5
        |      < (SELECT sum(qty) FROM li i WHERE i.l_partkey = li.l_partkey)"""
        .stripMargin)
      .as[(Long, Long)].collect().head
    assert(out == expected, s"Q17 decorrelation mismatch: $out vs $expected")
    assert(out._1 > 0, "fixture degenerate: no small-quantity lineitems")
  }

  test("q_tpch_q3: top-10 equals an independent SQL formulation") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = Catalog.byName("q_tpch_q3").fn(spark, dir)
      .as[(Long, String, String, Long)].collect()
    graft.sources.Tables.customer(spark, dir).createOrReplaceTempView("c3")
    graft.sources.Tables.orders(spark, dir).createOrReplaceTempView("o3")
    graft.sources.Tables.lineitem(spark, dir).createOrReplaceTempView("l3")
    val expected = spark.sql(
      """SELECT o_orderkey, date_format(o_orderdate, 'yyyy-MM-dd') AS od,
        |       o_orderpriority,
        |       sum(CAST(round(l_extendedprice * 100) AS LONG) *
        |           (10000 - CAST(round(l_discount * 10000) AS LONG))) AS rev
        |FROM l3 JOIN o3 ON l_orderkey = o_orderkey
        |JOIN c3 ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY 1, 2, 3 ORDER BY rev DESC, o_orderkey LIMIT 10"""
        .stripMargin)
      .as[(Long, String, String, Long)].collect()
    assert(out.toSeq == expected.toSeq)
    assert(out.map(_._4).toSeq == out.map(_._4).sortBy(-_).toSeq,
      "revenue not descending")
  }
}
