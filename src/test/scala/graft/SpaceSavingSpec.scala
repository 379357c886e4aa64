package graft

import graft.functions.{SpaceSaving, SpaceSavingBuf}

/** Contracts of the [[graft.functions.SpaceSaving]] Aggregator: the
  * classic eviction math on a hand-traceable stream, the inductive
  * invariants (two-sided per-item interval, absent-bound `d`, counts
  * ≥ d) under ADVERSARIAL partitionings, and the SHARP guarantees the
  * hashed row deliberately does NOT gate (all true heavies tracked,
  * d·k ≤ n) pinned empirically here. */
class SpaceSavingSpec extends SparkSpec {

  private def drive(agg: SpaceSaving, words: Seq[String],
      parts: Int): SpaceSavingBuf = {
    val partials = words.grouped(math.max(1, words.length / parts))
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    partials.foldLeft(agg.zero)(agg.merge)
  }

  test("hand-traceable eviction: k=2 single stream") {
    val agg = new SpaceSaving(2)
    // a a b c: insert a(1,0) a(2,0) b(1,0); c evicts min b(1): c=(2,1)
    val m = Seq("a", "a", "b", "c").foldLeft(agg.zero)(agg.reduce)
    assert(m.entries == Map("a" -> ((2L, 0L)), "c" -> ((2L, 1L))), s"$m")
    assert(m.d == 1L, s"absent bound must be the evicted count: ${m.d}")
    // sum of counts = n (the SS conservation law, single stream)
    assert(m.entries.values.map(_._1).sum == 4L)
  }

  test("invariants + sharp guarantees under adversarial partitionings") {
    val k = 8
    val agg = new SpaceSaving(k)
    val words = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    val n = words.length
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavies = exact.filter { case (_, c) => c * k > n }
    assert(heavies.nonEmpty && heavies.size < exact.size)
    val orderings = Seq(
      words, words.reverse, words.sorted,
      words.zipWithIndex.sortBy(t => t._2 % 7).map(_._1))
    for (ws <- orderings; parts <- Seq(1, 4, 16)) {
      val m = drive(agg, ws, parts)
      assert(m.entries.size <= k, s"buffer overflow: ${m.entries.size}")
      // inductive invariants — what the hashed row gates
      m.entries.foreach { case (w, (c, e)) =>
        val t = exact.getOrElse(w, 0L)
        assert(t <= c, s"SS must overestimate $w: $c < $t (parts=$parts)")
        assert(c - e <= t, s"interval broken for $w: $c-$e > $t")
        assert(c >= m.d, s"count below absent bound: $w $c < ${m.d}")
      }
      exact.keys.filterNot(m.entries.contains).foreach { w =>
        assert(exact(w) <= m.d,
          s"absent $w true ${exact(w)} exceeds bound ${m.d} (parts=$parts)")
      }
      // sharp guarantees — spec-pinned, not hash-gated (merge-order
      // sensitive in principle; must hold on every tested partitioning)
      assert(m.d * k <= n, s"absent bound too loose: ${m.d} * $k > $n")
      heavies.foreach { case (w, c) =>
        assert(m.entries.contains(w),
          s"lost heavy $w (cnt $c) parts=$parts: ${m.entries.keySet}")
      }
    }
  }

  test("merge with zero is identity; one-sided merge inherits the absent bound") {
    val agg = new SpaceSaving(4)
    val a = Seq("a", "a", "b", "c", "d", "e").foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, agg.zero) == a && agg.merge(agg.zero, a) == a)
    val b = Seq("x", "x", "x").foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    // x was absent from a (d_a >= 1 after the evictions): its merged
    // count must carry d_a as extra count AND error
    val (cx, ex) = m.entries("x")
    assert(cx == 3L + a.d && ex == a.d, s"one-sided merge wrong: $m vs a.d=${a.d}")
  }

  test("q_heavy_hitters_ss: the gate row's verdict booleans are all true") {
    val out = Catalog.byName("q_heavy_hitters_ss")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "no heavy hitters at smoke scale")
    assert(out.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      s"contract broken: ${out.filterNot(r => r.getBoolean(2) && r.getBoolean(3)).toSeq}")
  }
}
