package graft

import org.apache.spark.sql.functions._

/** In-engine pins for the round-11 graph additions, independent of the
  * DuckDB gate: the degree-ordered triangle count must equal a naive
  * 3-way-join recount (the orientation has to count each triangle
  * EXACTLY once — over- or under-counting is the classic bug in the
  * oriented form), and the LPA row's frozen/monotone invariants must
  * hold. Smoke scale (sf0.001); the oracle re-proves both at sf0.01.
  */
class GraphOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("degree-ordered triangle count equals the naive 3-way join") {
    val out = Catalog.byName("q_triangle_count").fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(naive > 0, "fixture must actually contain triangles")
    assert(out("edges") == e.count())
    assert(out("triangles") == naive)
    e.unpersist()
    ()
  }

  test("label propagation: labels are frozen (one row per part), seeds " +
      "keep their brand, rounds bounded") {
    val out = Catalog.byName("q_label_prop").fn(spark, dir).collect()
    val perPart = out.groupBy(_.getLong(0))
    assert(perPart.values.forall(_.length == 1), "a part was relabeled")
    val brands = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seeds = out.filter(_.getInt(2) == 0)
    assert(seeds.nonEmpty)
    assert(seeds.forall(r => brands(r.getLong(0)) == r.getString(1)),
      "a seed's label is not its own brand")
    assert(seeds.length == brands.keysIterator.count(_ % 5 == 0),
      "seed set must be exactly the %5 parts")
    assert(out.forall(r => Set(0, 1, 2)(r.getInt(2))))
  }

  test("fixed-point pagerank: mass conserved up to floor loss, teleport " +
      "floor respected, one row per node") {
    val out = Catalog.byName("q_pagerank").fn(spark, dir).collect()
    val n = out.length.toLong
    assert(n > 0)
    assert(out.map(_.getLong(0)).distinct.length == n, "a node repeated")
    val scale = 1000000000000L
    val mass = out.map(_.getLong(1)).sum
    // floor loss: < 1 unit per DIRECTED EDGE per iteration (the
    // pr div od contributions) plus < 2 per node per iteration (the
    // two div-100 terms) plus < n for the initial split — edge count
    // dominates; at smoke scale the observed loss is ~3.3e-9 of the
    // mass, so a 1e-6 relative bound is generous yet still proves
    // mass is conserved (a lost shuffle partition would shear off
    // whole percents)
    assert(mass <= scale, s"mass $mass exceeds the fixed-point base")
    assert(mass >= scale - scale / 1000000L,
      s"floor loss too large: ${scale - mass}")
    // every node keeps at least the teleport share (15% of 1/N)
    val teleport = (15L * (scale / n)) / 100L
    assert(out.forall(_.getLong(1) >= teleport), "a rank fell below teleport")
    // ranks must actually differentiate (a constant vector means the
    // iteration never ran)
    assert(out.map(_.getLong(1)).distinct.length > 1)
  }

  /** The strong-tie graph recomputed naively (collected to the driver —
    * smoke scale) as an adjacency map for the plain-Scala replays. */
  private def strongTieAdj(): Map[Long, Set[Long]] = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
      .agg(countDistinct(col("x.ok")).as("no"))
      .filter(col("no") >= 2).select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    e.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    adj.toMap.withDefaultValue(Set.empty)
  }

  test("q_kcore: engine peel counts equal a plain-Scala peeling replay") {
    val out = Catalog.byName("q_kcore").fn(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1, 2, 3, 4))
    var adj = strongTieAdj()
    var nodes = adj.keySet
    val expected = (1 to 4).map { r =>
      val surv = nodes.filter(u => (adj(u) & nodes).size >= 3)
      nodes = surv
      r -> surv.size.toLong
    }.toMap
    assert(out == expected, s"engine $out vs replay $expected")
    // survivor counts must be monotonically non-increasing
    assert((1 to 3).forall(r => out(r) >= out(r + 1)))
  }

  test("q_link_predict: scores equal a plain-Scala common-neighbor " +
      "replay; no predicted pair is an existing edge") {
    val out = Catalog.byName("q_link_predict").fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.nonEmpty)
    val adj = strongTieAdj()
    val expected = (for {
      u <- adj.keysIterator if adj(u).size <= 16
      Seq(p, q) <- adj(u).toSeq.sorted.combinations(2)
    } yield (p, q)).toSeq.groupBy(identity).view
      .mapValues(_.size.toLong)
      .filter { case ((p, q), cn) => cn >= 2 && !adj(p).contains(q) }
      .toMap
    assert(out == expected, "predicted pair set diverged from the replay")
  }

  test("q_jaccard_neighbors: ppm scores equal the replay and re-rank " +
      "hub pairs below tight pairs") {
    val out = Catalog.byName("q_jaccard_neighbors").fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.nonEmpty)
    val adj = strongTieAdj()
    // candidate generation is hub-capped (wedges at centers deg ≤ 16);
    // surviving pairs are re-scored with the EXACT intersection — the
    // round-11 advice fix (capped numerator over exact denominator
    // biased J low whenever the cap bound)
    val capped = (for {
      u <- adj.keysIterator if adj(u).size <= 16
      Seq(p, q) <- adj(u).toSeq.sorted.combinations(2)
    } yield (p, q)).toSeq.groupBy(identity).view
      .mapValues(_.size.toLong)
      .filter { case ((p, q), cn) => cn >= 2 && !adj(p).contains(q) }
      .toMap
    val expected = capped.map { case ((p, q), _) =>
      val cn = (adj(p) & adj(q)).size.toLong
      (p, q) -> (cn, cn * 1000000L / (adj(p).size + adj(q).size - cn))
    }
    assert(out == expected, "jaccard scores diverged from the replay")
    // the fixture must exercise the re-score: at sf0.001 the cap BINDS
    // (some witness sits at a center with deg > 16), so exact ≠ capped
    // somewhere — otherwise this spec can't tell the fix from the bug
    assert(capped.exists { case (pq, c) => expected(pq)._1 != c },
      "fixture degenerate: capped wedge count equals exact intersection " +
      "for every surviving pair — the re-score is not exercised")
    // normalization must matter: the cn-ranking and the jaccard-ranking
    // must disagree somewhere, or the operator adds nothing over
    // q_link_predict
    val byCn = expected.toSeq.sortBy { case ((p, q), (cn, _)) => (-cn, p, q) }
      .map(_._1)
    val byJ = expected.toSeq.sortBy { case ((p, q), (_, j)) => (-j, p, q) }
      .map(_._1)
    assert(byCn != byJ,
      "fixture degenerate: jaccard ranking identical to raw common-neighbor")
  }

  test("q_triangle_doulion: deterministic estimate within 3σ of exact") {
    import org.apache.spark.sql.functions.col
    val out = Catalog.byName("q_triangle_doulion").fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("triangles_estimate") == out("triangles_sampled") * 8,
      s"p=1/2 scale must be exactly 8: $out")
    assert(out("triangles_sampled") > 0, "sampled graph lost every triangle")
    // exact replay of the co-order graph + the paper's variance terms
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq.map(e => (e._1, e._2)) ++
        edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val perEdge = edges.toSeq.map { case (a, b) => (adj(a) & adj(b)).size.toLong }
    val t = perEdge.sum / 3
    assert(Catalog.byName("q_triangle_count").fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.apply("triangles") == t,
      "replay disagrees with the exact catalog row")
    // Var[T̂] = t(1/p³−1) + 2k(1/p−1); p = 1/2, k = Σ_e C(t_e, 2)
    // (unordered triangle pairs sharing exactly one edge)
    val k = perEdge.map(te => te * (te - 1) / 2).sum
    val sigma = math.sqrt(t.toDouble * 7 + 2.0 * k)
    val err = math.abs(out("triangles_estimate") - t)
    info(s"exact=$t estimate=${out("triangles_estimate")} err=$err 3σ=${3 * sigma}")
    assert(err <= 3 * sigma,
      s"DOULION estimate $err off exact $t exceeds 3σ=${3 * sigma}")
  }

  test("q_sssp: distances equal a plain-Scala 3-round Bellman-Ford") {
    val out = Catalog.byName("q_sssp").fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = strongTieAdj()
    def w(a: Long, b: Long): Long = 1L + (a + b) % 9
    var dist = adj.keySet.filter(_ % 97 == 0).map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = scala.collection.mutable.Map.from(dist)
      dist.foreach { case (u, du) =>
        adj(u).foreach { v =>
          val nd = du + w(math.min(u, v), math.max(u, v))
          if (!next.contains(v) || nd < next(v)) next(v) = nd
        }
      }
      dist = next.toMap
    }
    assert(out == dist, "distance map diverged from the replay")
    assert(out.nonEmpty && out.values.exists(_ == 0L), "seeds missing")
    assert(out.values.exists(_ > 0L), "frontier never expanded")
  }
}
