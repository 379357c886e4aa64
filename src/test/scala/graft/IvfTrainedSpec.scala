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

  /** Shared raw-vs-residual measurement: (recall@5, mean distance
    * distortion |adc − true| over every probed candidate). */
  private def rawVsRes(corpus: org.apache.spark.sql.DataFrame)
      : ((Int, Double), (Int, Double), Set[Long]) = {
    val vecs = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q = vecs(0L)
    val exact = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        id -> math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
      .sortBy(t => (t._2, t._1)).take(5).map(_._1).toSet
    def run(name: String, df: org.apache.spark.sql.DataFrame): (Int, Double) = {
      val all = df.collect().map(r => r.getLong(0) -> r.getDouble(1))
      val top5 = all.sortBy(t => (t._2, t._1)).take(5).map(_._1).toSet
      val err = all.map { case (id, adc) =>
        val v = vecs(id)
        val t = math.sqrt(v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
        math.abs(adc - t)
      }
      val r = ((top5 & exact).size, err.sum / err.length)
      info(f"$name: recall@5=${r._1}/5 mean|adc-true|=${r._2}%.4f " +
        s"over ${all.length} candidates, top5=${top5.toSeq.sorted}")
      r
    }
    (run("raw-ADC", graft.operators.VectorQueries
        .ivfPqSearchOn(spark, corpus, topK = Int.MaxValue)),
      run("residual-ADC", graft.operators.VectorQueries
        .ivfPqResidualOn(spark, corpus, topK = Int.MaxValue)),
      exact)
  }

  test("residual vs raw ADC on the planted-TWIN corpus: both retrieve " +
      "the twin cluster; residual no worse (the honest tie, measured)") {
    import org.apache.spark.sql.functions._
    // sparse planted variant: 10 twin clusters on an otherwise-iid
    // base (18% clustered mass). 10 coarse cells over 64-dim iid mass
    // absorb little variance, so the textbook residual win is NOT
    // expected here — this row documents exactly that (ann_recall.md)
    val planted = graft.operators.VectorQueries
      .plantedEmbeddings(spark, dir, everyNth = 50, nTwins = 10)
      .select(col("vec_id"), col("e").as("embedding"),
        pmod(col("vec_id"), lit(10)).as("label"))
      .localCheckpoint()
    val ((rawR, _), (resR, _), _) = rawVsRes(planted)
    assert(resR >= rawR,
      s"residual must not lose to raw on the planted corpus: $resR < $rawR")
    assert(resR >= 3, s"residual must retrieve most of the twin cluster: $resR/5")
  }

  test("residual ADC wins decisively on a STRONGLY clustered corpus — " +
      "the regime the textbook encoding exists for") {
    import org.apache.spark.sql.functions._
    // 10 well-separated centers (5x-scaled base vectors), every point
    // = its center + 5% noise: coarse cells align with real clusters,
    // between-cluster variance is absorbed, and residual PQ's 4
    // codewords/subspace cover only the 5% noise where raw PQ's must
    // span the full center spread (Jegou et al. 2011 sec. III — the
    // reason FAISS defaults to residual encoding)
    val b = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val centers = b.filter(col("vec_id") < 10)
      .select(pmod(col("vec_id"), lit(10)).as("cid"),
        transform(col("e"), x => x * 5.0).as("ce"))
    val corpus = b.withColumn("cid", pmod(col("vec_id"), lit(10)))
      .join(broadcast(centers), "cid")
      .select(col("vec_id"),
        expr("zip_with(ce, e, (c, x) -> c + 0.05 * x)").as("embedding"),
        col("cid").cast("int").as("label"))
      .localCheckpoint()
    val ((rawR, rawErr), (resR, resErr), _) = rawVsRes(corpus)
    // measured r13: raw 0/5 @ distortion 1.98, residual 3/5 @ 0.011 —
    // a ~178x distortion cut; pinned at 10x for headroom
    assert(resR > rawR,
      s"residual must beat raw recall on a clustered corpus: $resR <= $rawR")
    assert(resErr * 10 < rawErr,
      f"residual must cut ADC distortion >=10x on a clustered corpus: " +
      f"$resErr%.4f vs $rawErr%.4f")
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
