package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.pipeline.Admission
import graft.sources.Tables

/** Contracts of [[Admission.admitWithEmbeddings]] — the semantic
  * (SRP-bucketed, cosine-verified) leg of the admission loop:
  *  - a distinct-text document whose EMBEDDING duplicates a seen one
  *    is rejected (the case the text legs cannot catch), while an
  *    orthogonal-embedding document passes;
  *  - two-increment ≡ one-shot parity (the compositionality the
  *    MinHash leg already proves, extended to the semantic state);
  *  - the semantic state folds through [[Admission.compact]] like the
  *    text state: a post-compact increment is still rejected through
  *    the bucketed `semidx`/`vecs` segments, and roots WITHOUT
  *    semantic state compact without growing empty semidx segments.
  */
class AdmissionSemanticSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def freshRoot() =
    Files.createTempDirectory("graft_adm_sem").toString + "/state"

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  // toy 4-dim corpus: doc 2 duplicates doc 1's embedding with distinct
  // text; doc 3 is orthogonal to both
  private def toyDocs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text").withColumn("source", lit("s"))
  }
  private def toyEmb(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "embedding")
  }
  private def admitToy(docs: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame, root: String, inc: String) =
    Admission.admitWithEmbeddings(docs, emb, root, inc,
      dim = 4, nBits = 2, nTables = 4)

  test("an embedding near-dup with distinct text is rejected; orthogonal passes") {
    val root = freshRoot()
    admitToy(
      toyDocs(1L -> "aa bb cc dd ee ff gg"),
      toyEmb(1L -> Seq(1.0, 0.5, 0.0, 0.0)), root, "d1")
    val got = ids(admitToy(
      toyDocs(2L -> "hh ii jj kk ll mm nn",      // text-fresh, embedding-dup
              3L -> "oo pp qq rr ss tt uu"),     // text-fresh, orthogonal
      toyEmb(2L -> Seq(2.0, 1.0, 0.0, 0.0),      // cos = 1 vs doc 1
             3L -> Seq(0.0, 0.0, 1.0, -0.5)),    // cos = 0 vs both
      root, "d2"))
    assert(got == Seq(3L), s"semantic leg must reject doc 2, admit doc 3: $got")
    assert(ids(Admission.corpus(spark, root)) == Seq(1L, 3L))
  }

  test("within-increment greedy: smaller id wins the semantic tie") {
    val root = freshRoot()
    val got = ids(admitToy(
      toyDocs(1L -> "aa bb cc dd ee ff gg", 2L -> "hh ii jj kk ll mm nn"),
      toyEmb(1L -> Seq(1.0, 0.0, 0.0, 0.0), 2L -> Seq(3.0, 0.0, 0.0, 0.0)),
      root, "d1"))
    assert(got == Seq(1L), s"greedy must keep the smaller id: $got")
  }

  test("two-increment semantic admission equals one-shot (real tables)") {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val split = docs.agg(max("doc_id")).head.getLong(0) / 2
    val twoStep = freshRoot()
    Admission.admitWithEmbeddings(docs.filter(col("doc_id") <= split),
      emb.filter(col("doc_id") <= split), twoStep, "d1",
      cosThreshold = 0.45, nTables = 48)
    Admission.admitWithEmbeddings(docs.filter(col("doc_id") > split),
      emb.filter(col("doc_id") > split), twoStep, "d2",
      cosThreshold = 0.45, nTables = 48)
    val oneShot = freshRoot()
    Admission.admitWithEmbeddings(docs, emb, oneShot, "all",
      cosThreshold = 0.45, nTables = 48)
    val a = ids(Admission.corpus(spark, twoStep))
    val b = ids(Admission.corpus(spark, oneShot))
    assert(a.nonEmpty && a == b,
      s"two-step admitted ${a.size}, one-shot ${b.size}")
    // and the semantic leg actually rejected something relative to the
    // text-only loop on this corpus (embeddings contain cos >= 0.5 pairs)
    val textOnly = freshRoot()
    Admission.admit(docs, textOnly, "all")
    assert(ids(Admission.corpus(spark, textOnly)).size > a.size,
      "fixture must exercise the semantic leg")
  }

  test("semantic state folds through compact: post-compact dup still rejected") {
    val root = freshRoot()
    admitToy(
      toyDocs(1L -> "aa bb cc dd ee ff gg"),
      toyEmb(1L -> Seq(1.0, 0.5, 0.0, 0.0)), root, "d1")
    assert(Admission.compact(spark, root))
    assert(new java.io.File(s"$root/semidx_base").exists, "semidx must fold")
    assert(new java.io.File(s"$root/vecs_base").exists, "vecs must fold")
    assert(!new java.io.File(s"$root/semidx/inc=d1").exists,
      "folded semidx increment must be collected")
    val got = ids(admitToy(
      toyDocs(2L -> "hh ii jj kk ll mm nn", 3L -> "oo pp qq rr ss tt uu"),
      toyEmb(2L -> Seq(2.0, 1.0, 0.0, 0.0), 3L -> Seq(0.0, 0.0, 1.0, -0.5)),
      root, "d2"))
    assert(got == Seq(3L),
      s"the folded semantic segments must still reject doc 2: $got")
  }

  test("streaming admission with the semantic leg rejects embedding dups " +
      "batch over batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_adm_sem_ck").toString
    // static id -> embedding lookup: doc 2 duplicates doc 1's vector
    // with fresh text, doc 3 is orthogonal
    val emb = toyEmb(1L -> Seq(1.0, 0.5, 0.0, 0.0),
      2L -> Seq(2.0, 1.0, 0.0, 0.0), 3L -> Seq(0.0, 0.0, 1.0, -0.5))
    val in = MemoryStream[(Long, String, String)](spark)
    val q = Admission.admitStream(
      in.toDS().toDF("doc_id", "text", "source"),
      root, ckpt, cfg = None, embeddings = Some(emb),
      dim = 4, nBits = 2, nTables = 4)
    try {
      in.addData((1L, "aa bb cc dd ee ff gg", "s"))
      q.processAllAvailable()
      in.addData((2L, "hh ii jj kk ll mm nn", "s"),
        (3L, "oo pp qq rr ss tt uu", "s"))
      q.processAllAvailable()
    } finally q.stop()
    assert(ids(Admission.corpus(spark, root)) == Seq(1L, 3L),
      "the cross-batch embedding dup must be rejected through the " +
        "persisted semantic state")
  }

  test("a text-only root compacts without growing semantic segments") {
    import spark.implicits._
    val root = freshRoot()
    Admission.admit(Seq((1L, "aa bb cc dd ee ff gg", "s"))
      .toDF("doc_id", "text", "source"), root, "d1")
    assert(Admission.compact(spark, root))
    assert(!new java.io.File(s"$root/semidx_base").exists,
      "no semantic inputs -> no semidx segment")
    assert(!new java.io.File(s"$root/vecs_base").exists)
    assert(ids(Admission.corpus(spark, root)) == Seq(1L))
  }
}
