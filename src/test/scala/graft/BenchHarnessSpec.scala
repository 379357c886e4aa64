package graft

import org.apache.spark.sql.functions._

/** The bench harness must fail loudly: a query that throws is recorded
  * as an error, contributes NO time to the median (a broken query must
  * never bench as ~0 s and "improve" the total), and healthy queries
  * around it still measure normally.
  */
class BenchHarnessSpec extends SparkSpec {

  private val okQ = Q("ok",
    (s, _) => s.range(100).toDF("id").filter(col("id") % 2 === 0), None)
  private val planTimeBroken = Q("plan_broken",
    (s, _) => s.range(10).toDF("id").select(col("nope")), None)
  private val runTimeBroken = Q("run_broken",
    (s, _) => {
      import s.implicits._
      s.range(10).map(i => if (i > 5) throw new IllegalStateException("boom") else i).toDF("id")
    }, None)

  test("broken queries record errors and no timings; healthy ones still time") {
    val rs = Bench.measure(spark, "/unused", Seq(okQ, planTimeBroken, runTimeBroken), runs = 2)
    val byName = rs.map(r => r.name -> r).toMap

    assert(byName("ok").ok && byName("ok").times.size == 2 && byName("ok").err.isEmpty)
    assert(byName("ok").median > 0.0)

    assert(!byName("plan_broken").ok, "analysis-time failure must yield no timings")
    assert(byName("plan_broken").err.exists(_.nonEmpty))

    assert(!byName("run_broken").ok, "execution-time failure must yield no timings")
    assert(byName("run_broken").err.exists(_.nonEmpty))

    // the failure predicate main() exits nonzero on
    assert(rs.exists(_.err.isDefined))
  }

  test("all-healthy run has no errors and full timing sets") {
    val rs = Bench.measure(spark, "/unused", Seq(okQ), runs = 3)
    assert(rs.forall(_.err.isEmpty))
    assert(rs.forall(_.times.size == 3))
  }
}
