package graft

/** Recall/nprobe trade for the TRAINED IVF index (`q_ivf_trained` /
  * the IVFADC coarse stage) — round-11 item 3's evidence row: the
  * coarse quantizer is now 2 Lloyd rounds, and these measurements
  * (recorded in docs/ann_recall.md) show probing behaves like an IVF
  * index must: recall grows monotonically with nProbe (candidate
  * cells are nested), the query's own cell is always probed first
  * (the probe ranking IS the assignment ranking), and probing every
  * cell reproduces the exact search identically.
  */
class IvfTrainedSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("recall@5 is monotone in nProbe and exact at full probe") {
    val exact = Catalog.byName("q_cosine_topk").fn(spark, dir)
      .collect().take(5).map(_.getLong(0)).toSet
    val recalls = Seq(1, 2, 4, 10).map { np =>
      val got = graft.operators.VectorQueries
        .ivfTrainedSearch(spark, dir, nProbe = np)
        .collect().map(_.getLong(0)).toSet
      np -> (got & exact).size / 5.0
    }
    info(recalls.map { case (np, r) => s"nprobe=$np recall@5=$r" }
      .mkString(", "))
    recalls.map(_._2).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b,
        s"recall must be monotone in nProbe: $recalls")
      case _ => ()
    }
    // the query's assigned cell ranks first in the probe (same metric),
    // so even nProbe=1 must find the query itself
    assert(recalls.head._2 >= 0.2, s"nProbe=1 missed the query's own cell")
    // probing all 10 cells IS the exact search
    assert(recalls.last._2 == 1.0,
      s"full probe must reproduce the exact top-5: $recalls")
  }

  test("residual vs raw-vector ADC recall@5 (both deterministic)") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = vecs(0L)
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        id -> math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
      .sortBy(t => (t._2, t._1)).take(5).map(_._1).toSet
    def top5(name: String): Set[Long] =
      Catalog.byName(name).fn(spark, dir).collect().map(_.getLong(0)).toSet
    val raw = (top5("q_ivfpq_search") & exact).size
    val res = (top5("q_ivfpq_residual") & exact).size
    info(s"recall@5 vs exact L2: raw-ADC $raw/5, residual-ADC $res/5")
    assert(top5("q_ivfpq_search").size == 5 &&
      top5("q_ivfpq_residual").size == 5)
  }
}
