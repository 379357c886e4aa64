package graft

import graft.functions.MisraGries

/** Contracts of the [[graft.functions.MisraGries]] heavy-hitters
  * Aggregator: the classic decrement math on a hand-traceable stream,
  * and the PODS'12 mergeable guarantee — every item above n/k present
  * with estimate in [true − n/k, true] — under ADVERSARIAL
  * partitionings (sorted runs, round-robin, single partition), which
  * is exactly where a naive "union the maps" merge breaks. */
class MisraGriesSpec extends SparkSpec {

  private def drive(agg: MisraGries, words: Seq[String],
      parts: Int): Map[String, Long] = {
    // replicate Spark's partial/merge exactly: reduce within each
    // slice, then merge the partials pairwise
    val partials = words.grouped(math.max(1, words.length / parts))
      .map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    partials.foldLeft(agg.zero)(agg.merge)
  }

  test("hand-traceable decrement: k=3 on a 2-heavy stream") {
    val agg = new MisraGries(3)
    // 9×a, 6×b, 1 each of c,d,e: n=17, n/k≈5.67 — a and b guaranteed
    val stream = Seq.fill(9)("a") ++ Seq.fill(6)("b") ++ Seq("c", "d", "e")
    for (parts <- Seq(1, 3, 5)) {
      val m = drive(agg, stream, parts)
      assert(m.contains("a") && m.contains("b"),
        s"parts=$parts lost a guaranteed heavy: $m")
      assert(m("a") <= 9 && m("a") * 3 >= 9 * 3 - 17, s"a bound: $m")
      assert(m("b") <= 6 && m("b") * 3 >= 6 * 3 - 17, s"b bound: $m")
    }
  }

  test("guarantee holds under adversarial partitionings on a zipf stream") {
    val k = 8
    val agg = new MisraGries(k)
    // zipf-ish: word i appears ~600/i times, i = 1..40
    val words = (1 to 40).flatMap(i => Seq.fill(600 / i)(s"w$i"))
    val n = words.length
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val heavies = exact.filter { case (_, c) => c * k > n }
    assert(heavies.nonEmpty && heavies.size < exact.size,
      "fixture must have heavies and non-heavies")
    val orderings = Seq(
      words,                        // heavy runs first
      words.reverse,                // heavy runs last
      words.sorted,                 // lexicographic runs
      words.zipWithIndex.sortBy(t => t._2 % 7).map(_._1)) // interleaved
    for (ws <- orderings; parts <- Seq(1, 4, 16)) {
      val m = drive(agg, ws, parts)
      assert(m.size <= k - 1, s"buffer overflow: ${m.size}")
      heavies.foreach { case (w, c) =>
        assert(m.contains(w), s"lost heavy $w (cnt $c) parts=$parts")
        assert(m(w) <= c, s"overestimate for $w: ${m(w)} > $c")
        assert(m(w) * k >= c * k - n,
          s"underestimate beyond n/k for $w: ${m(w)} vs $c, n=$n")
      }
      // the bound holds for EVERY surviving counter, not just heavies
      m.foreach { case (w, e) =>
        assert(e <= exact(w), s"sketch overcounts $w: $e > ${exact(w)}")
      }
    }
  }

  test("q_heavy_hitters: the gate row's verdict booleans are all true " +
      "and the heavies match a replay") {
    val out = Catalog.byName("q_heavy_hitters")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty, "no heavy hitters at smoke scale")
    assert(out.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      s"contract broken: ${out.filterNot(r => r.getBoolean(2) && r.getBoolean(3)).toSeq}")
  }
}
