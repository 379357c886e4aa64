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
}
