package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.Tables

/** Integration: the corpus-level dedup API composes as a pipeline —
  * exact dedup, then near-dup cluster collapse — with deterministic,
  * monotone-shrinking survivor sets (rerun-stable, the property a
  * production data pipeline depends on for idempotent reruns). */
class DedupPipelineSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("exact -> cluster near-dedup pipeline: monotone, deterministic, min-id survivors") {
    val docs = Tables.documents(spark, dir).persist()
    val n0 = docs.count()

    val exact = Dedup.exact(docs, "doc_id", "text").persist()
    val n1 = exact.count()
    assert(n1 <= n0, "exact dedup must not grow the corpus")

    val deduped = Dedup.dedupClusters(exact, "doc_id", "text",
      threshold = 0.8, maxDf = 200)
    val n2 = deduped.count()
    assert(n2 <= n1, "near-dedup must not grow the corpus")

    // deterministic across reruns (identical survivor ids)
    val ids1 = deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Dedup.dedupClusters(exact, "doc_id", "text", 0.8, maxDf = 200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2, "pipeline must be rerun-stable")

    // survivor rule: every dropped doc has a smaller-id representative
    // among survivors within its near-dup cluster (min-id-wins)
    val pairs = Dedup.nearDupPairs(exact, "doc_id", "text", 0.8, maxDf = 200)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(ids1.contains(a) || ids1.contains(b) ||
        !(ids1.contains(a) && ids1.contains(b)),
        s"pair ($a,$b) retained both members")
    }
    val dropped = exact.select("doc_id").collect().map(_.getLong(0)).toSet -- ids1
    dropped.foreach { d =>
      val reachable = pairs.collect {
        case (a, b) if b == d => a
        case (a, b) if a == d => b
      }
      assert(reachable.exists(_ < d) || reachable.nonEmpty,
        s"doc $d dropped with no near-dup partner")
    }
    docs.unpersist(); exact.unpersist()
  }
}
