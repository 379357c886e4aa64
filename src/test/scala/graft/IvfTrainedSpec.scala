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
}
