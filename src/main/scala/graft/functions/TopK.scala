package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Single-pass grouped top-k.
  *
  * The window form (`row_number().over(partitionBy(...).orderBy(...))`
  * + filter) sorts EVERY group's full contents; this Aggregator keeps
  * a bounded k-element buffer per group instead, and its partial
  * buffers merge map-side like any aggregate — at 100 TB that is the
  * difference between shuffling all rows sorted and shuffling n_groups
  * × k tuples. Built-ins can express top-k (so no custom physical
  * operator per the build brief's preference order); this is the
  * (b)-tier performance form.
  *
  * Ordering: score descending, id ascending tie-break — deterministic
  * and identical to the window query's ORDER BY.
  */
object TopK {

  class TopKAgg(val k: Int)
      extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Array[(Double, Long)] = Array.empty

    // The buffer is maintained sorted best-first, so an accepted row is
    // placed by binary search + shift: O(log k) compare, O(k) copy —
    // not a full O(k log k) re-sort per accepted row (matters at large k).
    override def reduce(buf: Array[(Double, Long)], in: (Double, Long)): Array[(Double, Long)] =
      if (buf.length >= k && !better(in, buf(k - 1))) buf
      else {
        var lo = 0
        var hi = buf.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (better(in, buf(mid))) hi = mid else lo = mid + 1
        }
        val n = math.min(buf.length + 1, k)
        val out = new Array[(Double, Long)](n)
        System.arraycopy(buf, 0, out, 0, lo)
        out(lo) = in
        System.arraycopy(buf, lo, out, lo + 1, n - lo - 1)
        out
      }

    override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] =
      (a ++ b).sortWith(better).take(k)

    override def finish(buf: Array[(Double, Long)]): Seq[(Double, Long)] = buf.toSeq

    override def bufferEncoder: Encoder[Array[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Top-k (scoreCol, idCol) rows per key: returns
    * (keyCols..., idCol, scoreCol) — one row per kept element. */
  def perKey(df: DataFrame, keyCol: String, scoreCol: String, idCol: String,
      k: Int): DataFrame = {
    val f = udaf(new TopKAgg(k), Encoders.product[(Double, Long)])
    df.groupBy(keyCol)
      .agg(f(col(scoreCol), col(idCol)).as("graft_top"))
      .select(col(keyCol), explode(col("graft_top")).as("t"))
      .select(col(keyCol), col("t._2").as(idCol), col("t._1").as(scoreCol))
  }
}
