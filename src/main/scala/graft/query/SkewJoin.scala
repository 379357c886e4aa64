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
  *
  * WHEN to use which — the measured decision rule (full table and
  * reasoning in `docs/skew_playbook.md`, numbers from
  * `SKEW_SCALE_r12.jsonl`): default to the plain join with AQE on; it
  * won 5 of 6 measured skew cells. Salting crossed over only at a
  * 50%-of-rows hub key at factor 64 (6.4M rows / 32 cores: salted
  * 1.26 s vs AQE 1.46 s vs plain 1.99 s) — i.e. reach for [[salted]]
  * only for a PREDICTABLE, dominant (~50%+) hot key at a volume where
  * one reducer's partition is many multiples of the per-core share,
  * or where AQE's split cannot apply (skewed aggregation feeding the
  * join, sort-merge path disabled). Size `salt` ≈ hot-key rows /
  * median partition rows, never more than the straggler stage's spare
  * parallelism — the build side replicates `salt`×.
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
