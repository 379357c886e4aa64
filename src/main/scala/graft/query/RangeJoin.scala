package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned time-range join — the scale path for interval joins WITHOUT
  * an equi key (`right.ts ∈ [left.ts + lower, left.ts + upper]`).
  *
  * Spark has no range-join strategy: a pure theta join plans as
  * BroadcastNestedLoopJoin (every left row against every right row) —
  * the quadratic scan that dies at 100 TB. The standard fix is binning:
  * quantize time into `binSec` buckets, explode each left row to the
  * buckets its window overlaps (⌈(upper-lower)/bin⌉+1 ≈ 2 rows for a
  * window ≤ bin), map each right row to its single bucket, equi-join on
  * the bucket, and keep the exact range predicate as a post-filter.
  * Each qualifying pair meets in EXACTLY one bucket (the right row's),
  * so no dedup pass is needed. Cost: a shuffle on the bin key with
  * ~window/bin× left duplication, instead of |L|×|R| comparisons —
  * choose `binSec` ≈ the window width to keep duplication ≤ 2×.
  *
  * Composition-first per the engine's design stance: built entirely
  * from explode/sequence/equi-join, no custom strategy needed; bin
  * indices use exact long arithmetic (pmod before the divide) so bucket
  * assignment can never disagree across the two sides.
  */
object RangeJoin {

  private def binOf(tsUs: Column, binUs: Long): Column =
    ((tsUs - pmod(tsUs, lit(binUs))) / lit(binUs)).cast("long")

  /** Join rows of `right` whose `rightTsCol` falls in
    * `[left.leftTsCol + lowerSec, left.leftTsCol + upperSec]`.
    * Column names of `left` and `right` must be disjoint. */
  def binned(left: DataFrame, right: DataFrame,
      leftTsCol: String, rightTsCol: String,
      lowerSec: Long, upperSec: Long, binSec: Long): DataFrame = {
    require(upperSec >= lowerSec, "empty interval")
    require(binSec > 0, "binSec must be positive")
    val binUs = binSec * 1000000L
    val lo = unix_micros(col(leftTsCol)) + lit(lowerSec * 1000000L)
    val hi = unix_micros(col(leftTsCol)) + lit(upperSec * 1000000L)
    val l = left.withColumn("graft_bin",
      explode(sequence(binOf(lo, binUs), binOf(hi, binUs))))
    val r = right.withColumn("graft_bin", binOf(unix_micros(col(rightTsCol)), binUs))
    l.join(r, Seq("graft_bin"))
      .filter(
        unix_micros(col(rightTsCol)) >= unix_micros(col(leftTsCol)) + lit(lowerSec * 1000000L) &&
        unix_micros(col(rightTsCol)) <= unix_micros(col(leftTsCol)) + lit(upperSec * 1000000L))
      .drop("graft_bin")
  }
}
