package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorQueries
import graft.sources.Tables

/** Trained-PQ contracts ([[VectorQueries.pqTrain]] /
  * [[VectorQueries.adcTopkWith]]):
  *  - Lloyd actually improves the quantizer (monotone distortion);
  *  - ADC recall@10 against the exact L2 ranking, measured on both the
  *    i.i.d. corpus (worst case) and the planted clustered corpus (the
  *    realistic shape) — the numbers recorded in docs/ann_recall.md;
  *  - the code-assignment plan is equi-join + hash-aggregate, never a
  *    window sort or cartesian on the corpus side.
  */
class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = Tables.embeddings(spark, dir)

  private lazy val allVecs: Array[(Long, Array[Double])] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  private def recallAt10(vecs: Array[(Long, Array[Double])],
      queries: Array[(Long, Array[Double])],
      codes: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame): Double = {
    def trueTop(qid: Long, q: Array[Double]): Set[Long] =
      vecs.filter(_._1 != qid).map { case (id, v) => id -> l2(q, v) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    val recalls = queries.map { case (qid, q) =>
      val got = VectorQueries.adcTopkWith(codes, cent, q, topK = 11)
        .collect().map(_.getLong(0)).filter(_ != qid).take(10).toSet
      (got & trueTop(qid, q)).size / 10.0
    }
    recalls.sum / recalls.length
  }

  test("Lloyd rounds monotonically shrink total quantization distortion") {
    val d2Of = (iters: Int) => {
      val (_, codes) = VectorQueries.pqTrain(emb, k = 8, iters = iters)
      codes.agg(sum("d2")).head.getDouble(0)
    }
    val (e1, e2, e3) = (d2Of(1), d2Of(2), d2Of(3))
    info(f"total distortion: iters=1 $e1%.1f, iters=2 $e2%.1f, iters=3 $e3%.1f")
    assert(e2 <= e1 + 1e-6 && e3 <= e2 + 1e-6,
      s"Lloyd must not increase distortion: $e1 -> $e2 -> $e3")
  }

  test("ADC recall@10 on the iid corpus (worst case), k=16") {
    val (cent, codes) = VectorQueries.pqTrain(emb, k = 16, iters = 2)
    val c = codes.localCheckpoint()
    val ct = cent.localCheckpoint()
    val r = recallAt10(allVecs, allVecs.filter(_._1 < 5), c, ct)
    // measured 0.26 (docs/ann_recall.md): the iid-Gaussian corpus is
    // PQ's worst case — every neighbor sits at nearly the same
    // distance, so 8×4-bit codes barely separate the top-10 from the
    // rest. The floor pins "not collapsed", not a target; the planted
    // (clustered) corpus below is the realistic shape and hits 1.00.
    info(f"iid corpus: k=16 iters=2 recall@10 = $r%.2f")
    assert(r >= 0.2, f"ADC recall@10 $r%.2f collapsed on the iid corpus")
  }

  test("ADC recall@10 on the planted (clustered) corpus >= 0.9") {
    val planted = VectorQueries
      .plantedEmbeddings(spark, dir, everyNth = 50, nTwins = 10)
      .persist()
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val (cent, codes) = VectorQueries.pqTrain(planted, k = 16, iters = 2,
      vecCol = "e")
    val c = codes.localCheckpoint()
    val ct = cent.localCheckpoint()
    val queries = vecs.filter { case (id, _) => id % 50 == 0 && id < 250 }
    val r = recallAt10(vecs, queries, c, ct)
    planted.unpersist()
    info(f"planted corpus: k=16 iters=2 recall@10 = $r%.2f")
    assert(r >= 0.9, f"ADC must retrieve twin clusters: recall@10 $r%.2f")
  }

  test("assignment plan: equi-join + hash aggregate, no window, no cartesian") {
    val (_, codes) = VectorQueries.pqTrain(emb, k = 4, iters = 2)
    val plan = codes.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian in PQ training")
    assert(!plan.contains("Window"), "argmin must be an aggregate, not a window")
  }
}
