package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.query.AsOfJoin
import graft.sources.Tables

/** As-of composition vs an independent naive implementation
  * (inequality join, then pick the latest right row per left row). */
class AsOfJoinSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private lazy val ev = Tables.events(spark, dir).persist()

  private lazy val views = ev.filter(col("event_type") === "view")
    .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("v_ts"))
  private lazy val purchases = ev.filter(col("event_type") === "purchase")
    .select(col("user_id"), col("event_id").as("purchase_id"),
      col("ts").as("p_ts"), col("value"))

  test("as-of composition equals naive join-then-pick-latest, joinless plan") {
    val asof = AsOfJoin.backward(views, purchases, "user_id", "v_ts", "p_ts")
      .filter(col("purchase_id").isNotNull)
      .select("view_id", "purchase_id")
    val naive = views.join(purchases, Seq("user_id"))
      .filter(col("p_ts") <= col("v_ts"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("view_id")
          .orderBy(col("p_ts").desc, col("purchase_id").desc)))
      .filter(col("rn") === 1)
      .select("view_id", "purchase_id")
    val got = asof.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"asof ${got.size} vs naive ${want.size}")
    assert(got.nonEmpty)
    // the whole point: one exchange + window, NO join operator at all
    val plan = asof.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of composition planned a join:\n$plan")
  }

  test("empty right side preserves left rows with all-null payloads") {
    val emptyRight = purchases.filter(lit(false))
    val out = AsOfJoin.backward(views, emptyRight, "user_id", "v_ts", "p_ts")
    assert(out.count() == views.count())
    assert(out.filter(col("purchase_id").isNotNull).count() == 0)
  }

  test("left rows with no prior right row carry nulls") {
    val all = AsOfJoin.backward(views, purchases, "user_id", "v_ts", "p_ts")
    val unmatchedHere = all.filter(col("purchase_id").isNull).count()
    // independent count: views whose user has no purchase at or before v_ts
    val expected = views.join(purchases, Seq("user_id"), "left")
      .groupBy("view_id")
      .agg(max(when(col("p_ts") <= col("v_ts"), 1).otherwise(0)).as("hit"))
      .filter(col("hit") === 0).count()
    assert(unmatchedHere == expected)
    assert(all.count() == views.count(), "as-of must preserve every left row")
  }
}
