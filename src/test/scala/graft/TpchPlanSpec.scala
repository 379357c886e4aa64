package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan,
  TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

/** Plan pins for the TPC-H headline shapes (`q_tpch_q1`, `q_tpch_q18`)
  * — the properties that make them the published baselines:
  * Q1 is ONE scan + ONE hash exchange (partial aggregation collapses
  * every map partition to ≤ 6 rows before the shuffle; the only other
  * exchange is the ≤ 6-row presentation sort), and Q18's HAVING
  * subquery + top-k never materializes a data-sized window or global
  * sort (TakeOrderedAndProject, partial-aggregated quantity sums).
  * AQE is disabled inside the pins so the static exchanges are
  * visible (the ShufflePathPlanSpec convention).
  */
class TpchPlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def withStaticPlan[A](f: => A): A = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      f
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case s: FileSourceScanExec => s }

  test("q_tpch_q1: single pruned scan, partial agg, one hash exchange, no window") {
    withStaticPlan {
      val plan = Catalog.byName("q_tpch_q1").fn(spark, dir)
        .queryExecution.executedPlan
      val sc = scans(plan)
      assert(sc.size == 1, s"Q1 must scan lineitem exactly once, got ${sc.size}")
      // the shipdate filter reaches the parquet reader and the scan
      // reads only the 7 referenced columns
      assert(sc.head.metadata("PushedFilters").contains("l_shipdate"),
        s"shipdate filter not pushed: ${sc.head.metadata("PushedFilters")}")
      val read = sc.head.metadata("ReadSchema")
      assert(!read.contains("l_orderkey") && !read.contains("l_partkey"),
        s"scan reads unreferenced columns: $read")
      // partial + final aggregate pair around exactly ONE hash exchange
      assert(plan.collect { case h: HashAggregateExec => h }.size >= 2,
        "expected partial+final hash aggregates")
      val hashEx = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      assert(hashEx.size == 1,
        s"Q1 must cross exactly one hash exchange, got ${hashEx.size}")
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "Q1 must not plan a window")
    }
  }

  test("q_tpch_q18: top-k is TakeOrderedAndProject, no window, partial qty agg") {
    withStaticPlan {
      val plan = Catalog.byName("q_tpch_q18").fn(spark, dir)
        .queryExecution.executedPlan
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        "top-100 must plan as TakeOrderedAndProject, not a global sort")
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "Q18 must not plan a data-sized window")
      assert(plan.collect { case h: HashAggregateExec => h }.size >= 2,
        "the HAVING subquery must partial-aggregate lineitem quantities")
    }
  }

  test("q_tpch_q6: single pruned scan, pushed filters, no join or window") {
    withStaticPlan {
      val plan = Catalog.byName("q_tpch_q6").fn(spark, dir)
        .queryExecution.executedPlan
      val sc = scans(plan)
      assert(sc.size == 1, s"Q6 must scan lineitem exactly once, got ${sc.size}")
      val pushed = sc.head.metadata("PushedFilters")
      assert(pushed.contains("l_shipdate") && pushed.contains("l_quantity"),
        s"shipdate/quantity filters not pushed: $pushed")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      assert(plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }.isEmpty, "Q6 must not plan any join")
    }
  }

  test("q_tpch_q4_shape: the EXISTS decorrelates to one left-semi join") {
    withStaticPlan {
      val plan = Catalog.byName("q_tpch_q4_shape").fn(spark, dir)
        .queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.size == 1, s"Q4 must plan exactly one join, got ${joins.size}")
      assert(joins.head.joinType.toString == "LeftSemi",
        s"the EXISTS must plan as a left-semi join: ${joins.head.joinType}")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      // liveness: some orders of the quarter must fail the lateness
      // probe, or the semi-join is a pass-through
      val n = Catalog.byName("q_tpch_q4_shape").fn(spark, dir)
        .collect().map(_.getLong(1)).sum
      val quarter = graft.sources.Tables.orders(spark, dir)
        .filter(org.apache.spark.sql.functions.col("o_orderdate")
          .between("1996-01-01", "1996-06-30 23:59:59")).count()
      assert(n > 0 && n < quarter,
        s"lateness probe dead: $n late of $quarter in-quarter orders")
    }
  }

  test("q_tpch_q21_shape: one lineitem pass, agg-decorrelated EXISTS/NOT EXISTS, " +
      "no window, no added exchange for the two group-bys") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q21_shape").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      // ONE pass over lineitem: the EXISTS and NOT EXISTS both fold
      // into the per-order aggregate instead of re-probing the fact
      val liScans = scans(plan).filter(
        _.metadata("Location").contains("lineitem"))
      assert(liScans.size == 1,
        s"Q21 must scan lineitem exactly once, got ${liScans.size}")
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "Q21 must not plan a data-sized window")
      // the orderkey join's hash partitioning serves BOTH group-bys:
      // lineitem-side shuffles = 1 (the join), none added by the aggs.
      // Static plan has: join exchanges (lineitem + orders) + the
      // ≤|suppliers|-row rollup exchange — but no exchange between the
      // (orderkey, suppkey) agg and the (orderkey) agg
      val hashEx = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
      }
      assert(hashEx.size <= 3,
        s"Q21 must add no exchange beyond join sides + final rollup: ${hashEx.size}")
      // liveness at smoke scale: some suppliers waited, not all orders
      val out = df.collect()
      assert(out.nonEmpty, "no waiting suppliers in the fixture")
      assert(out.map(_.getLong(1)).sum > 0)
    }
  }

  test("q_tpch_q7: dimension chains broadcast, no window, bilateral result") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q7").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "Q7 must not plan a window")
      // the nation disjunction decomposes into pre-join dimension
      // filters: the supplier and customer chains reach the facts as
      // broadcasts, never as shuffles
      val bj = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bj.size >= 2, s"dimension chains must broadcast, got ${bj.size}")
      val out = df.collect()
      assert(out.nonEmpty, "no bilateral volume in the fixture")
      // both directions and at least one year present; counts positive
      assert(out.forall(_.getLong(3) > 0))
    }
  }

  test("q_tpch_q14: one pruned lineitem scan, 1-row exact-ppm result") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q14").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val sc = scans(plan).filter(_.metadata("Location").contains("lineitem"))
      assert(sc.size == 1, s"Q14 must scan lineitem once, got ${sc.size}")
      assert(sc.head.metadata("PushedFilters").contains("l_shipdate"),
        s"shipdate not pushed: ${sc.head.metadata("PushedFilters")}")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      val out = df.collect()
      assert(out.length == 1)
      val ppm = out.head.getLong(2)
      assert(ppm > 0 && ppm < 1000000L,
        s"promo share must be a real fraction in ppm: $ppm")
    }
  }

  test("q_tpch_q10: pushed filters on both facts, aggregate-then-widen, " +
      "top-20 as TakeOrderedAndProject") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q10").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val li = scans(plan).filter(_.metadata("Location").contains("lineitem"))
      assert(li.size == 1 &&
        li.head.metadata("PushedFilters").contains("l_returnflag"),
        s"returnflag must push to the lineitem scan: ${li.map(_.metadata("PushedFilters"))}")
      val ord = scans(plan).filter(_.metadata("Location").contains("orders"))
      assert(ord.nonEmpty &&
        ord.head.metadata("PushedFilters").contains("o_orderdate"),
        "date window must push to the orders scan")
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        "top-20 must plan as TakeOrderedAndProject")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      assert(df.collect().nonEmpty)
    }
  }

  test("q_tpch_q13: outer join preserved (zero-order customers counted), " +
      "no window") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q13").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      }
      assert(joins.exists(_.joinType.toString == "LeftOuter"),
        s"the residual ON-condition must stay on a LEFT join: ${joins.map(_.joinType)}")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      // liveness: the zero-orders bucket must exist (customers without
      // qualifying orders), or the outer semantics are untested
      val out = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out.contains(0L),
        s"fixture must have zero-order customers: ${out.keys.toSeq.sorted}")
    }
  }

  test("q_tpch_q15: the scalar max joins back as a broadcast EQUI join — " +
      "no window, no nested loop") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q15").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty,
        "Q15 must not plan a window")
      assert(plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }.isEmpty, "the max filter must be an equi join, not a nested loop")
      val out = df.collect()
      assert(out.nonEmpty, "a top supplier must exist")
      assert(out.map(_.getLong(2)).distinct.length == 1,
        "every returned supplier carries the same (max) revenue")
    }
  }

  test("q_tpch_q8: all dimension chains broadcast around ONE fact-fact " +
      "shuffle join; exact-ppm share") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q8").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(smj.size <= 1,
        s"only lineitem-orders may shuffle; got ${smj.size} shuffled joins")
      val out = df.collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val (nat, tot, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
        assert(tot > 0 && ppm >= 0 && ppm <= 1000000L && nat <= tot,
          s"share sanity: $r")
      }
    }
  }

  test("q_tpch_q19_shape: the OR-of-ANDs keeps a broadcast HASH join on the " +
      "factored equi core — never a nested loop") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q19_shape").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }.isEmpty, "the disjunction must not degrade the join to a nested loop")
      assert(plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }.nonEmpty, "expected a broadcast hash join on p_partkey")
      val out = df.collect()
      assert(out.length == 1 && out.head.getLong(0) > 0,
        s"disjunctive branches must match real rows: ${out.toSeq}")
    }
  }

  test("q_tpch_q9: every dimension chain broadcasts; at most the one " +
      "fact-fact join shuffles; profit in exact micros") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q9").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      val shuffledJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(shuffledJoins.size <= 1,
        s"only lineitem-orders may shuffle; got ${shuffledJoins.size}")
      // the only nested loop is the 1-row supplier-count scalar of the
      // partsupp derivation — its build side must be a broadcast of a
      // global aggregate, never a data-sized relation
      val bnlj = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }
      bnlj.foreach { b =>
        assert(b.buildSide.toString.contains("Right") &&
          b.right.collectFirst { case h: HashAggregateExec => h }.isDefined,
          s"BNLJ build side must be the 1-row scalar aggregate: $b")
      }
      val out = df.collect()
      assert(out.nonEmpty, "q9 must produce nation-year profit rows")
      assert(out.forall(_.getLong(2) > 0), "n_items must be positive")
    }
  }

  test("q_tpch_q11: window-free global-scalar HAVING — every kept part " +
      "exceeds twice the mean value") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q11").fn(spark, dir)
      assert(df.queryExecution.executedPlan
        .collect { case w: WindowExec => w }.isEmpty,
        "the HAVING threshold must not plan a window")
      val out = df.collect()
      assert(out.nonEmpty, "fixture must yield above-threshold parts")
      val values = out.map(_.getLong(1))
      // recompute the contract against the full value set
      val suppN = graft.sources.Tables.supplier(spark, dir)
      val all = graft.operators.RelationalQueries.partsupp(spark, dir)
        .join(suppN, org.apache.spark.sql.functions.col("ps_suppkey") ===
          org.apache.spark.sql.functions.col("s_suppkey"))
        .join(graft.sources.Tables.nation(spark, dir)
            .filter(org.apache.spark.sql.functions.col("n_name") === "NATION_3"),
          org.apache.spark.sql.functions.col("s_nationkey") ===
            org.apache.spark.sql.functions.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("ps_supplycost_cents") *
          org.apache.spark.sql.functions.col("ps_availqty")).as("v"))
        .collect().map(_.getLong(1))
      val (tot, n) = (all.sum, all.length.toLong)
      assert(values.forall(v => v * n > tot * 2),
        "a kept part fails the 2x-mean contract")
      assert(values.length == all.count(v => v * n > tot * 2),
        "a qualifying part was dropped")
    }
  }

  test("q_tpch_q20_shape: the correlated availability subquery decorrelates " +
      "to ONE lineitem pass") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q20_shape").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val liScans = scans(plan).count(_.toString.contains("lineitem"))
      assert(liScans == 1,
        s"the shipped-qty probe must be a single lineitem pass: $liScans scans")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      val out = df.collect()
      assert(out.nonEmpty, "fixture must qualify at least one supplier")
    }
  }

  test("q_tpch_q5: same-nation residual rides the orderkey join; at " +
      "most the two fact joins shuffle; no window") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q5").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      val shuffledJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(shuffledJoins.size <= 2,
        s"only lineitem-orders and orders-customer may shuffle: ${shuffledJoins.size}")
      val out = df.collect()
      assert(out.nonEmpty, "same-nation pairs must exist in the fixture")
      assert(out.forall(_.getLong(1) > 0))
    }
  }

  test("q_tpch_q12_shape: shipdate window pushed to the scan, lateness " +
      "in the join residual, no window") {
    withStaticPlan {
      val df = Catalog.byName("q_tpch_q12_shape").fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val li = scans(plan).filter(_.metadata("Location").contains("lineitem"))
      assert(li.size == 1 &&
        li.head.metadata("PushedFilters").contains("l_shipdate"),
        s"shipdate window must reach the lineitem scan: ${li.map(_.metadata("PushedFilters"))}")
      assert(plan.collect { case w: WindowExec => w }.isEmpty)
      val out = df.collect()
      assert(out.nonEmpty, "no late lines at smoke scale")
      // the split is live: both priority classes appear somewhere
      assert(out.map(_.getLong(1)).sum > 0 && out.map(_.getLong(2)).sum > 0,
        s"both urgency classes must be populated: ${out.toSeq}")
    }
  }

  test("q_tpch_q18: the quantity threshold qualifies a real subset") {
    // liveness: the fixture must put SOME orders above and below the
    // threshold or the HAVING shape is untested
    val out = Catalog.byName("q_tpch_q18").fn(spark, dir).collect()
    assert(out.nonEmpty, "no qualifying large orders in the fixture")
    val total = graft.sources.Tables.orders(spark, dir).count()
    assert(out.length < total, "every order qualified — threshold dead")
    assert(out.forall(_.getLong(5) > 300L), "non-qualifying order emitted")
  }
}
