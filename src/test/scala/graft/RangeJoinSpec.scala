package graft

import org.apache.spark.sql.functions._
import graft.query.RangeJoin
import graft.sources.Tables

/** Binned range join vs the naive theta join: identical rows, and the
  * binned plan must not contain a nested-loop/cartesian operator. */
class RangeJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private lazy val ev = Tables.events(spark, dir).persist()

  test("binned range join equals the naive theta join") {
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
    val all = ev.select(col("event_id").as("f_id"), col("ts").as("f_ts"))

    val binned = RangeJoin.binned(errors, all, "err_ts", "f_ts", 0, 300, 300)
      .select("err_id", "f_id")
    val naive = errors.join(all,
        col("f_ts") >= col("err_ts") &&
        col("f_ts") <= col("err_ts") + expr("INTERVAL 5 MINUTES"))
      .select("err_id", "f_id")

    val got = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"binned ${got.size} pairs vs naive ${want.size}")
    assert(got.nonEmpty)
    // no duplicate pairs: each pair meets in exactly one bin
    assert(binned.count() == got.size)

    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "binned join planned as BNLJ")
    assert(!plan.contains("CartesianProduct"))
    // and the naive form really is the nested loop we're avoiding
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("randomized windows/bins match the theta join (seeded)") {
    val rnd = new scala.util.Random(7)
    val left = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("l_id"), col("ts").as("l_ts"))
    val right = ev.select(col("event_id").as("r_id"), col("ts").as("r_ts"))
    (1 to 5).foreach { _ =>
      val lower = rnd.between(-600L, 600L)
      val upper = lower + rnd.between(0L, 900L)
      val bin = rnd.between(60L, 1200L)
      val binned = RangeJoin.binned(left, right, "l_ts", "r_ts", lower, upper, bin)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = left.join(right,
          unix_micros(col("r_ts")) >= unix_micros(col("l_ts")) + lower * 1000000L &&
          unix_micros(col("r_ts")) <= unix_micros(col("l_ts")) + upper * 1000000L)
        .select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"lower=$lower upper=$upper bin=$bin")
    }
  }

  test("empty sides yield empty results without error") {
    val left = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("l_id"), col("ts").as("l_ts"))
    val right = ev.select(col("event_id").as("r_id"), col("ts").as("r_ts"))
    assert(RangeJoin.binned(left.filter(lit(false)), right,
      "l_ts", "r_ts", 0, 300, 300).count() == 0)
    assert(RangeJoin.binned(left, right.filter(lit(false)),
      "l_ts", "r_ts", 0, 300, 300).count() == 0)
  }

  test("asymmetric window and coarse bins still match the theta join") {
    val left = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("l_id"), col("ts").as("l_ts"))
    val right = ev.select(col("event_id").as("r_id"), col("ts").as("r_ts"))
    // window [-120s, +600s], bins far coarser than the window
    val binned = RangeJoin.binned(left, right, "l_ts", "r_ts", -120, 600, 3600)
      .select("l_id", "r_id")
    val naive = left.join(right,
        col("r_ts") >= col("l_ts") - expr("INTERVAL 2 MINUTES") &&
        col("r_ts") <= col("l_ts") + expr("INTERVAL 10 MINUTES"))
      .select("l_id", "r_id")
    assert(binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
