package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopK.TopKAgg

/** Pure buffer-logic spec for the bounded-heap top-k Aggregator: the
  * binary-search insert must keep the buffer sorted best-first
  * (score desc, id asc on ties), cap at k, and agree with merge's
  * sort-based path on every interleaving.
  */
class TopKAggSpec extends AnyFunSuite {

  private def reduceAll(agg: TopKAgg, xs: Seq[(Double, Long)]) =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def expected(xs: Seq[(Double, Long)], k: Int) =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  test("keeps the k best, sorted score-desc then id-asc") {
    val agg = new TopKAgg(3)
    val xs = Seq((1.0, 5L), (3.0, 2L), (2.0, 7L), (5.0, 1L), (0.5, 9L))
    assert(reduceAll(agg, xs).toSeq == expected(xs, 3))
  }

  test("ties broken by smaller id, including at the eviction boundary") {
    val agg = new TopKAgg(2)
    val xs = Seq((2.0, 8L), (2.0, 3L), (2.0, 5L), (2.0, 1L))
    assert(reduceAll(agg, xs).toSeq == Seq((2.0, 1L), (2.0, 3L)))
  }

  test("k=1 and duplicate elements") {
    val agg = new TopKAgg(1)
    assert(reduceAll(agg, Seq((1.0, 1L), (1.0, 1L), (0.5, 2L))).toSeq
      == Seq((1.0, 1L)))
  }

  test("rejected rows leave the buffer untouched (same array)") {
    val agg = new TopKAgg(2)
    val buf = reduceAll(agg, Seq((5.0, 1L), (4.0, 2L)))
    assert(agg.reduce(buf, (1.0, 9L)) eq buf)
  }

  test("reduce path agrees with merge's sort path on random streams") {
    val rnd = new scala.util.Random(7)
    for (k <- Seq(1, 2, 5, 20); trial <- 1 to 20) {
      val agg = new TopKAgg(k)
      val xs = Seq.fill(50)((rnd.nextInt(10).toDouble, rnd.nextInt(30).toLong))
      val (a, b) = xs.splitAt(rnd.nextInt(xs.length + 1))
      val merged = agg.merge(reduceAll(agg, a), reduceAll(agg, b))
      assert(agg.finish(merged) == expected(xs, k),
        s"k=$k trial=$trial")
      assert(agg.finish(reduceAll(agg, xs)) == expected(xs, k))
    }
  }
}
