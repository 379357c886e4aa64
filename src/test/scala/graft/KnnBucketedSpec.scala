package graft

import org.apache.spark.sql.functions._
import graft.query.AnnLsh

/** The bucketed k-NN graph must (a) plan as an equi-join — no
  * cartesian — and (b) recover the exact graph's neighbors on the
  * clustered (planted) corpus, where true neighbors share buckets with
  * overwhelming probability. */
class KnnBucketedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("bucketed kNN: cartesian-free plan, high recall on planted corpus") {
    val planted = graft.operators.VectorQueries
      .plantedEmbeddings(spark, dir, everyNth = 50, nTwins = 10)
      .persist()

    val bucketed = AnnLsh.knnGraphBucketed(planted, "vec_id", "e", k = 10, dim = 64)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "plan contains BNLJ")

    // exact ground truth restricted to the planted cluster members
    // (bases + twins): their true top-10 is the rest of their cluster
    val vecs = planted.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = bucketed.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val clusterIds = vecs.map(_._1).filter(id =>
      id >= 1000000 || id % 50 == 0).toSet
    val recalls = clusterIds.toSeq.map { qid =>
      val q = vecs.find(_._1 == qid).get._2
      val truth = vecs.filter(_._1 != qid)
        .map { case (id, v) => id -> cosine(q, v) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      (got.getOrElse(qid, Set.empty) & truth).size / 10.0
    }
    val recall = recalls.sum / recalls.size
    info(f"planted-member recall@10 = $recall%.3f over ${recalls.size} vectors")
    assert(recall >= 0.9, f"recall $recall%.3f < 0.9")
    planted.unpersist()
  }
}
