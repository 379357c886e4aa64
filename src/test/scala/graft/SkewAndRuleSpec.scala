package graft

import org.apache.spark.sql.functions._
import graft.functions.{SelfDotToNorm, VectorFunctions}
import graft.query.SkewJoin

class SkewAndRuleSpec extends SparkSpec {
  import spark.implicits._

  test("SelfDotToNorm rewrites vec_dot(x,x) to a single-traversal norm") {
    VectorFunctions.register(spark)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val df = emb.select(
      VectorFunctions.vecDot(col("e"), col("e")).as("n2"),
      VectorFunctions.vecDot(col("e"), reverse(reverse(col("e")))).as("dot"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("vecnorm2"), plan.take(400))      // rewritten
    assert(plan.contains("vecdot"), plan.take(400))        // distinct args untouched
    // and the rewrite preserves values
    assert(df.filter(col("n2") =!= col("dot")).count() == 0)
  }

  test("salted join equals the plain join on skewed data") {
    // heavily skewed: 90% of left rows share one key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "v")
    val right = (1 to 200).map(i => (i.toLong, s"r$i")).toDF("k", "w")
    val plain = left.join(right, Seq("k"))
      .select("k", "v", "w").orderBy("k", "v", "w").collect().toSeq
    val salted = SkewJoin.salted(left, right, "k", salt = 8)
      .select("k", "v", "w").orderBy("k", "v", "w").collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salt=1 degenerates to the plain join") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val right = Seq((1L, "x")).toDF("k", "w")
    assert(SkewJoin.salted(left, right, "k", 1).count() == 1)
  }

  test("skew advisor salts the 50%-hub fixture and stays plain " +
      "elsewhere (the measured playbook rule, round-13 verdict item 8)") {
    // budget scaled down so the decision rule is testable on a small
    // fixture: crossover = share >= 0.5 AND hotRows >= budget * cores
    val budget = 100L
    val par = 8
    // 50%-hub: one key carries half of 4000 rows (2000 >= 100*8)
    val hub = (1 to 4000).map(i =>
      (if (i % 2 == 0) 7L else 10000L + i, i)).toDF("k", "v")
    val aHub = SkewJoin.advise(hub, "k", par, perTaskRowBudget = budget)
    assert(aHub.useSalted, s"50% hub above volume floor must salt: $aHub")
    // playbook rule 3: hot rows / per-task budget, capped at parallelism
    assert(aHub.salt == par, s"salt = min(ceil(2000/100)=20, par=8): $aHub")
    assert(aHub.hotShare >= 0.49 && aHub.hotRows == 2000L)

    // uniform keys: plain (AQE default) regardless of volume
    val uniform = (1 to 4000).map(i => (i.toLong % 997L, i)).toDF("k", "v")
    assert(!SkewJoin.advise(uniform, "k", par, perTaskRowBudget = budget).useSalted)

    // dominant share but BELOW the volume floor: plain (AQE splits it)
    val small = (1 to 100).map(i =>
      (if (i % 2 == 0) 7L else 10000L + i, i)).toDF("k", "v")
    assert(!SkewJoin.advise(small, "k", par, perTaskRowBudget = budget).useSalted,
      "a small hub is AQE's job, not salting's")

    // empty probe: plain, no crash
    assert(!SkewJoin.advise(hub.filter(lit(false)), "k", par).useSalted)

    // the advised join is row-identical to the plain join on BOTH verdicts
    // build side covers the hub key (7 <= 20), so both verdicts match rows
    val right = (1 to 20).map(i => (i.toLong, s"r$i")).toDF("k", "w")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "w").orderBy("k", "v", "w").collect().toSeq
    val (salted, av1) = SkewJoin.adviseAndJoin(hub, right, "k", par,
      perTaskRowBudget = budget)
    assert(av1.useSalted)
    assert(rows(salted) == rows(hub.join(right, Seq("k"))))
    val (plain, av2) = SkewJoin.adviseAndJoin(uniform, right, "k", par,
      perTaskRowBudget = budget)
    assert(!av2.useSalted)
    assert(rows(plain) == rows(uniform.join(right, Seq("k"))))
  }
}
