package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving sketch state: the tracked items with their
  * OVERestimated counts and per-item error bounds, plus `d` — the
  * sketch-wide bound on the true count of any item NOT tracked.
  * Invariants (inductive over reduce AND merge, any merge tree):
  *   - for every tracked item: `c - e <= true <= c`;
  *   - for every absent item:  `true <= d`;
  *   - every tracked count satisfies `c >= d`.
  */
final case class SpaceSavingBuf(entries: Map[String, (Long, Long)], d: Long)

/** SpaceSaving heavy hitters (Metwally, Agrawal & El Abbadi, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005) as a typed mergeable [[Aggregator]] — the
  * counter-eviction dual of [[MisraGries]]: where MG UNDERestimates
  * (decrement-all on overflow), SpaceSaving OVERestimates with a
  * per-item error bound, so the estimate itself is reportable:
  * `c - e <= true <= c` for every tracked item (the round-12 stretch
  * goal: MG guarantees membership + a one-sided bound; SS's (count,
  * error) pairs carry a two-sided interval per item).
  *
  *  - reduce: a present item increments; with a free slot a new item
  *    enters at `(d+1, d)` (it may have been evicted before — `d`
  *    bounds those lost occurrences); on overflow the MINIMUM-count
  *    item (count m) is evicted and the newcomer takes `(m+1, m)` —
  *    the classic SS step, since an absent item's true count is at
  *    most m;
  *  - merge (the mergeable-summaries form, cf. Agarwal et al.
  *    PODS 2012 for the MG/SS isomorphism and Anderson et al. 2017
  *    for production SS merging): items in both sum `(c, e)`
  *    pairwise; an item on one side only takes the other side's
  *    absent-bound `d` as both extra count and extra error; overflow
  *    keeps the k largest counts and the absent-bound becomes
  *    `max(d_a + d_b, largest evicted count)`. All three invariants
  *    above survive (each kept count >= d_a + d_b >= new d via the
  *    top-k cut), so partial sketches combine map-side and the word
  *    stream never centralizes — only <= k-entry maps do.
  *
  * What may reach a HASHED gate row: only merge-order-invariant
  * theorems. The per-item interval and the implication "absent ⇒
  * true <= d" hold under ANY partitioning; the SHARP capture claim
  * ("every item with true > n/k is tracked") is exact for a single
  * stream (where sum(c) = n forces d = min count <= n/k) but a deep
  * merge tree can in principle inflate `d` past n/k, so the catalog
  * row (`q_heavy_hitters_ss`) gates the implication form and
  * `SpaceSavingSpec` pins the sharp capture + `d*k <= n` tightness
  * empirically under adversarial partitionings — the same
  * deterministic-guarantee-only discipline as the MG row.
  */
class SpaceSaving(val k: Int)
    extends Aggregator[String, SpaceSavingBuf, SpaceSavingBuf] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: SpaceSavingBuf = SpaceSavingBuf(Map.empty, 0L)

  override def reduce(buf: SpaceSavingBuf, w: String): SpaceSavingBuf = {
    val es = buf.entries
    es.get(w) match {
      case Some((c, e)) => buf.copy(entries = es.updated(w, (c + 1L, e)))
      case None if es.size < k =>
        buf.copy(entries = es.updated(w, (buf.d + 1L, buf.d)))
      case None =>
        // evict the min count (ties: lexicographically first, so a
        // single-threaded replay is reproducible); newcomer inherits
        // the evictee's count as its error bound
        val (mw, (mc, _)) = es.minBy { case (key, (c, _)) => (c, key) }
        SpaceSavingBuf((es - mw).updated(w, (mc + 1L, mc)), mc)
    }
  }

  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf): SpaceSavingBuf = {
    val d0 = a.d + b.d
    val keys = a.entries.keySet ++ b.entries.keySet
    val combined = keys.iterator.map { key =>
      val (ca, ea) = a.entries.getOrElse(key, (a.d, a.d))
      val (cb, eb) = b.entries.getOrElse(key, (b.d, b.d))
      key -> (ca + cb, ea + eb)
    }.toMap
    if (combined.size <= k) SpaceSavingBuf(combined, d0)
    else {
      val sorted = combined.toSeq.sortBy { case (key, (c, _)) => (-c, key) }
      SpaceSavingBuf(sorted.take(k).toMap,
        math.max(d0, sorted(k)._2._1))
    }
  }

  override def finish(buf: SpaceSavingBuf): SpaceSavingBuf = buf

  override def bufferEncoder: Encoder[SpaceSavingBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[SpaceSavingBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
