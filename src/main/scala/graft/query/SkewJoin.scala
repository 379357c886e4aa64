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

  /** The advisor's verdict: `salt == 1` means plain-join-with-AQE (the
    * measured default); `salt > 1` means [[salted]] with that size.
    * The histogram evidence rides along so a plan log can show WHY. */
  final case class SkewAdvice(salt: Int, hotRows: Long, totalRows: Long,
      hotShare: Double) {
    def useSalted: Boolean = salt > 1
  }

  /** Automatic skew advisor — `docs/skew_playbook.md` rule 2/3
    * mechanized (round-13 verdict item 8). Samples the PROBE side's
    * key histogram (one groupBy-count over the sample: a deliberate,
    * bounded pre-pass — the same stats collection a warehouse ANALYZE
    * runs) and applies the MEASURED decision rule from
    * `SKEW_SCALE_r12.jsonl`:
    *
    *  - salt only when one key carries a dominant share of the probe
    *    rows (≥ `hotShareFloor`, default 0.5 — the measured crossover
    *    profile) AND that key's absolute volume makes the hot
    *    partition many multiples of the per-core share
    *    (hotRows ≥ `perTaskRowBudget` × `parallelism`; the measured
    *    crossover sat at 3.2M hub rows / 32 cores = 100k per core);
    *  - everywhere below that line, AQE's runtime skew-split won 5 of
    *    6 measured cells — advise plain (`salt = 1`);
    *  - salt size = hot rows / per-task budget, capped at the
    *    parallelism actually available (oversalting replicates the
    *    build side for nothing) — playbook rule 3 verbatim.
    *
    * `sampleFraction < 1` keeps the pre-pass cheap at scale (counts
    * scale back up by 1/fraction); 1.0 is exact for gate/spec use. */
  def advise(probe: DataFrame, key: String, parallelism: Int,
      perTaskRowBudget: Long = 100000L, hotShareFloor: Double = 0.5,
      sampleFraction: Double = 1.0, seed: Long = 42L): SkewAdvice = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0)
    val s = if (sampleFraction >= 1.0) probe
      else probe.sample(withReplacement = false, sampleFraction, seed)
    val top = s.groupBy(col(key)).count()
      .agg(max(col("count")).as("hot"), sum(col("count")).as("total"))
      .collect()(0)
    if (top.isNullAt(0)) SkewAdvice(1, 0L, 0L, 0.0) // empty probe
    else {
      val scale = 1.0 / sampleFraction
      val hotRows = (top.getLong(0) * scale).toLong
      val totalRows = (top.getLong(1) * scale).toLong
      val share = if (totalRows == 0) 0.0 else hotRows.toDouble / totalRows
      val salt =
        if (share >= hotShareFloor &&
            hotRows >= perTaskRowBudget * parallelism)
          math.min(parallelism.toLong,
            math.max(2L, (hotRows + perTaskRowBudget - 1) / perTaskRowBudget))
            .toInt
        else 1
      SkewAdvice(salt, hotRows, totalRows, share)
    }
  }

  /** Advise, then join accordingly: plain AQE join below the measured
    * crossover, [[salted]] above it. Row-identical either way. */
  def adviseAndJoin(left: DataFrame, right: DataFrame, key: String,
      parallelism: Int, perTaskRowBudget: Long = 100000L,
      sampleFraction: Double = 1.0): (DataFrame, SkewAdvice) = {
    val a = advise(left, key, parallelism, perTaskRowBudget,
      sampleFraction = sampleFraction)
    val joined =
      if (a.useSalted) salted(left, right, key, a.salt)
      else left.join(right, Seq(key))
    (joined, a)
  }
}
