package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("media rows carry binary payloads + typed metadata") {
    val rows = Multimodal.fromDocuments(spark, dir)
    val r = rows.filter(_.doc_id == 0).collect()(0)
    assert(r.meta.mime == "text/plain")
    assert(r.meta.n_bytes == r.payload.length.toLong)
    assert(r.meta.width == 1 && r.meta.height == 1)
  }

  test("feature extraction is deterministic and batch-shaped " +
      "(FakeCodec is spec-only since round 14)") {
    def run() = Multimodal.extractFeatures(
        Multimodal.fromDocuments(spark, dir), codec = Multimodal.FakeCodec)
      .toDF().orderBy("doc_id").collect()
    val f1 = run()
    val f2 = run()
    assert(f1.length == 500)
    assert(f1.map(_.getLong(2)).toSeq == f2.map(_.getLong(2)).toSeq)
    val feats = f1(0).getSeq[Float](3)
    assert(feats.length == Multimodal.FakeCodec.dim)
    assert(feats.exists(_ > 0f))
  }

  test("metadata filter prunes before decode") {
    val all = Multimodal.extractFeatures(
      Multimodal.fromDocuments(spark, dir), Multimodal.FakeCodec,
      minBytes = 0L).count()
    val some = Multimodal.extractFeatures(
      Multimodal.fromDocuments(spark, dir), Multimodal.FakeCodec,
      minBytes = 300L).count()
    assert(some < all && some > 0)
  }
}
