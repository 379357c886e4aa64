package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Structural invariants for the round-4 pipeline operators — the
  * oracle rows pin cross-engine equality; these pin the properties a
  * user actually relies on (coverage, capacity, monotonicity), so a
  * future edit that changes semantics in BOTH engines at once (which
  * the hash-compare cannot see) still fails a test. */
class PipelineOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = Catalog.byName(name).fn(spark, dir)

  test("q_chunking: chunk counts and sizes tile every document exactly") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.words(col("text"))).as("n"))
      .filter(col("n") >= 1)
    val chunks = q("q_chunking")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_id").as("max_id"),
        sum("n_tokens").as("sum_tok"), min("n_tokens").as("min_tok"))
    val joined = chunks.join(docs, "doc_id")
    // expected chunk count: 1 + max(ceil((n-64)/48), 0), ids contiguous
    val bad = joined.filter(
      col("n_chunks") =!= (greatest(ceil((col("n") - 64) / 48.0), lit(0)) + 1)
        || col("max_id") =!= col("n_chunks") - 1
        // stride-48 tiling: total tokens over chunks = n + 16·(n_chunks−1)
        || col("sum_tok") =!= col("n") + (col("n_chunks") - 1) * 16
        || col("min_tok") < 1)
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    assert(joined.count() == docs.count(), "every eligible doc is chunked")
  }

  test("q_packing: bins are contiguous, conserve docs and tokens") {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.TextFunctions.words(col("text"))).as("n"))
    val bins = q("q_packing")
    val perSource = bins.groupBy("source")
      .agg(sum("n_docs").as("docs"), sum("total_tokens").as("toks"),
        min("bin").as("minb"), max("bin").as("maxb"),
        count(lit(1)).as("nbins"))
      .join(docs.groupBy("source")
        .agg(count(lit(1)).as("want_docs"), sum("n").as("want_toks")), "source")
    val bad = perSource.filter(
      col("docs") =!= col("want_docs") || col("toks") =!= col("want_toks")
        || col("minb") =!= 0 || col("nbins") =!= col("maxb") + 1)
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    // capacity: a bin holds at most cap-1 tokens of carry-in plus the
    // docs that START in it, each start strictly below the cap line ⇒
    // total < cap + max single doc
    val maxDoc = docs.agg(max("n")).head.getInt(0)
    val over = bins.filter(col("total_tokens") >= 2048 + maxDoc)
    assert(over.count() == 0, "bin exceeds capacity + one document")
  }

  test("q_pii_redact: planted PII detected on exactly the planted docs") {
    val r = q("q_pii_redact")
    val bad = r.filter(
      (col("doc_id") % 5 === 0 && (col("n_emails") < 1 || col("n_phones") < 1))
        || (col("doc_id") % 5 =!= 0 && (col("n_emails") > 0 || col("n_phones") > 0)))
    assert(bad.count() == 0,
      s"PII counts disagree with planting: ${bad.limit(5).collect().mkString(";")}")
  }

  test("q_cross_dedup: decontamination only ever shrinks the train split") {
    val r = q("q_cross_dedup").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r.keySet == Set("train", "val", "test"))
    val (trainN, trainAfter) = r("train")
    assert(trainAfter <= trainN)
    assert(r("val")._1 == r("val")._2 && r("test")._1 == r("test")._2,
      "val/test must pass through unchanged")
  }

  test("q_bigram_lm: scores are negative log-probs over the right doc set") {
    val r = q("q_bigram_lm")
    assert(r.filter(col("avg_logp") >= 0).count() == 0, "log-probs must be < 0")
    val want = Tables.documents(spark, dir)
      .filter(size(graft.functions.TextFunctions.words(col("text"))) >= 2)
      .count()
    assert(r.count() == want, "one score per doc with >= 2 tokens")
  }

  test("q_dedup_report: losses equal total minus distinct contents") {
    val docs = Tables.documents(spark, dir)
    val losses = q("q_dedup_report")
      .agg(sum("n_dup_losses")).head.getLong(0)
    assert(losses == docs.count() - docs.select("text").distinct().count())
  }

  test("q_stratified_sample: exactly min(k, stratum size) docs per source") {
    val docs = Tables.documents(spark, dir)
    val got = q("q_stratified_sample").groupBy("source")
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("nd"))
    val want = docs.groupBy("source").agg(count(lit(1)).as("total"))
    val bad = got.join(want, "source")
      .filter(col("n") =!= least(lit(20), col("total")) || col("n") =!= col("nd"))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    assert(got.count() == want.count(), "every stratum is sampled")
    // sampled ids are real documents
    assert(q("q_stratified_sample").join(docs, "doc_id", "left_anti").count() == 0)
  }

  test("q_weighted_sample: exact per-stratum counts, biased toward long docs") {
    val docs = Tables.documents(spark, dir)
    val r = q("q_weighted_sample")
    val got = r.groupBy("source")
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("nd"))
    val want = docs.groupBy("source").agg(count(lit(1)).as("total"))
    val bad = got.join(want, "source")
      .filter(col("n") =!= least(lit(20), col("total")) || col("n") =!= col("nd"))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    assert(r.join(docs, "doc_id", "left_anti").count() == 0)
    // the point of the weighting: sampled docs are longer on average
    val toks = docs.select(col("doc_id"),
      size(graft.functions.TextFunctions.words(col("text"))).as("w"))
    val sampledMean =
      r.join(toks, "doc_id").agg(avg("w")).head.getDouble(0)
    val corpusMean = toks.agg(avg("w")).head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean <= corpus mean $corpusMean")
  }

  test("q_mixture_epochs: per-doc epochs contiguous, counts match the weight") {
    val r = q("q_mixture_epochs")
    val perDoc = r.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), min("epoch").as("mn"), max("epoch").as("mx"))
    // epochs are 0..n-1 per doc
    assert(perDoc.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
    // integer part of the weight bounds every doc; fractional part is
    // one optional extra epoch (src0 w=2.25 → 2 or 3; src2 w=1.0 → 1)
    assert(perDoc.filter(col("source") === "src0" &&
      (col("n") < 2 || col("n") > 3)).count() == 0)
    assert(perDoc.filter(col("source") === "src2" && col("n") =!= 1).count() == 0)
    // weight-1.0 sources keep every document exactly once
    val src2Docs = Tables.documents(spark, dir).filter(col("source") === "src2")
    assert(perDoc.filter(col("source") === "src2").count() == src2Docs.count())
  }

  test("Curation.run: boundary materialization does not change results") {
    import graft.pipeline.Curation
    val docs = Tables.documents(spark, dir)
    val order = Seq("source", "bin", "doc_id", "chunk_id")
    val cutOn = Curation.run(docs,
      Curation.Config(materializeBoundaries = true))
      .orderBy(order.map(col): _*).collect().toSeq
    val lazyPlan = Curation.run(docs,
      Curation.Config(materializeBoundaries = false))
      .orderBy(order.map(col): _*).collect().toSeq
    assert(cutOn.nonEmpty, "pipeline must keep rows at this SF")
    assert(cutOn == lazyPlan,
      "lineage cuts must be value-invariant across the full chain")
  }
}
