package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** [[graft.dedup.Dedup.bloomAdmit]] — Bloom-prefiltered admission.
  * The contract is EXACT anti-join semantics for every Bloom geometry:
  * the filter may only move work between the no-join fast path and the
  * verified-maybe path, never change the answer. */
class BloomDedupSpec extends SparkSpec {

  import spark.implicits._

  private def digests(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("digest"))

  private val ref = digests(Seq(
    (100L, "alpha"), (101L, "beta"), (102L, "gamma")))
    .select("digest")

  private val fresh = digests(Seq(
    (1L, "alpha"),   // exact dup of ref -> rejected
    (2L, "delta"),   // new -> admitted
    (3L, "delta"),   // dup WITHIN fresh only -> still admitted (vs-ref only)
    (4L, "beta"),    // dup of ref -> rejected
    (5L, "epsilon")  // new -> admitted
  ))

  private def admittedIds(mBits: Long, numHashes: Int): Seq[Long] =
    Dedup.bloomAdmit(fresh, ref, "doc_id", "digest", mBits, numHashes)
      .select("doc_id").as[Long].collect().toSeq.sorted

  test("admits exactly the anti-join result") {
    assert(admittedIds(1L << 20, 3) === Seq(2L, 3L, 5L))
  }

  test("exact under a saturated filter (mBits=2: everything collides)") {
    // With 2 bits every position clashes, so every row takes the
    // "maybe" path — the exact verification join must still produce
    // the anti-join answer.
    assert(admittedIds(2L, 1) === Seq(2L, 3L, 5L))
    assert(admittedIds(2L, 4) === Seq(2L, 3L, 5L))
  }

  test("empty reference admits everything") {
    val out = Dedup.bloomAdmit(fresh, ref.limit(0), "doc_id", "digest")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(out === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("probe stays broadcast-shaped: no shuffle join, no cartesian") {
    val plan = Dedup.bloomAdmit(fresh, ref, "doc_id", "digest")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

}
