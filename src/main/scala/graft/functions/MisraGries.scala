package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982) as a typed
  * mergeable [[Aggregator]] — the deterministic counter-based
  * frequent-items summary (the SpaceSaving/MG family Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 proved merges without losing the
  * guarantee). The buffer holds at most k−1 (item, counter) pairs:
  *
  *  - reduce: a present item increments; a new item takes a free slot;
  *    a full buffer decrements EVERY counter instead (dropping zeros)
  *    — each decrement retires k occurrences (the new item's plus
  *    k−1 counted ones), so an item can lose at most n/k total;
  *  - merge: sum counters pairwise, then subtract the k-th largest
  *    counter from all and drop non-positives — the PODS'12 merge,
  *    which preserves the same one-sided bound, so partial sketches
  *    combine map-side like any aggregate (the 100 TB point: the
  *    full stream never centralizes, only ≤ (k−1)-entry maps do);
  *
  * Guarantees (the contract `q_heavy_hitters` hash-checks): every
  * item with true count > n/k IS in the sketch, and every estimate
  * satisfies true − n/k ≤ estimate ≤ true. The candidate SET beyond
  * the guaranteed items depends on merge order (partitioning), so
  * only the guaranteed part may ever reach a hashed row — callers
  * must join back to exact counts and filter, exactly what the
  * catalog row does.
  */
class MisraGries(val k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1L)
      case None if buf.size < k - 1 => buf.updated(w, 1L)
      case None =>
        buf.iterator.flatMap { case (key, c) =>
          if (c > 1L) Some(key -> (c - 1L)) else None
        }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k - 1) sum
    else {
      // subtract the k-th largest counter from all, drop <= 0
      val kth = sum.valuesIterator.toArray.sortBy(-_).apply(k - 1)
      sum.iterator.flatMap { case (key, c) =>
        if (c > kth) Some(key -> (c - kth)) else None
      }.toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
