package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 / the 100 TB design
  * brief): when a handful of hot keys would overload single reducers,
  * explode the build side `salt` ways and scatter the probe side's hot
  * rows across matching salt buckets.
  *
  * AQE's skew-join splitting handles most cases at runtime; this is the
  * explicit form for when the skew is known ahead of plan time (e.g., a
  * null-heavy or celebrity-key dimension) or AQE is unavailable
  * (broadcast-disabled clusters, non-shuffle joins).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `salt`
    * ways. `right` (the smaller / replicable side) is exploded once
    * per salt bucket; `left` rows route to one pseudo-random bucket.
    * Row-level results are identical to a plain inner join. */
  def salted(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val l = left.withColumn("graft_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)).cast("int"))
    val r = right.withColumn("graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "graft_salt")).drop("graft_salt")
  }
}
