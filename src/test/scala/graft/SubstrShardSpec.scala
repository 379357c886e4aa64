package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQueries

/** Structural invariants for the substring-dedup accounting and the
  * deterministic shard shuffle — the oracle rows pin cross-engine
  * equality; these pin the semantics themselves (span merging, cover
  * bounds, positional density) on crafted inputs, so an edit that
  * changes BOTH engines at once still fails. */
class SubstrShardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = Catalog.byName(name).fn(spark, dir)

  test("q_substr_dedup: crafted overlaps count merged covers, keep-first exempts the earliest doc") {
    import spark.implicits._
    // doc 1 is first: nothing to blame. doc 2 repeats doc 1's full
    // "c d e f" window once (1 window, 4 tokens). doc 3 shares the two
    // overlapping windows "a b c d" / "b c d e": merged cover = 5
    // tokens, NOT 8. doc 4 shares nothing.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e f"),
      (3L, "a b c d e"),
      (4L, "p q r s t")).toDF("doc_id", "text")
    val got = TextQueries.substrDedupOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == ((6, 0, 0)), s"first doc exempt: ${got(1L)}")
    assert(got(2L) == ((6, 1, 4)), s"single span: ${got(2L)}")
    assert(got(3L) == ((5, 2, 5)), s"merged overlap: ${got(3L)}")
    assert(got(4L) == ((5, 0, 0)), s"no overlap: ${got(4L)}")
  }

  test("q_substr_dedup: cover bounds hold corpus-wide and the earliest doc has none") {
    val df = q("q_substr_dedup").cache()
    try {
      val bad = df.filter(
        (col("dup_windows") > 0 &&
          (col("dup_tokens") < col("dup_windows") + 3 ||
           col("dup_tokens") > col("dup_windows") * 4)) ||
        col("dup_tokens") > col("n_tokens") ||
        col("dup_windows") > col("n_tokens") - 3)
      assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
      val firstId = df.agg(min("doc_id")).head.getLong(0)
      val firstRow = df.filter(col("doc_id") === firstId).head
      assert(firstRow.getInt(2) == 0,
        "the globally earliest doc can have no earlier duplicate")
    } finally df.unpersist()
  }

  test("q_substr_cut: cuts exactly the covered positions; accounting row cross-checks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d e f"),
      (3L, "a b c d e"),
      (4L, "p q r s t")).toDF("doc_id", "text")
    val got = TextQueries.substrCutOf(docs)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    // doc 2: window "c d e f" (start pos 3) duplicated → tokens 3-6 cut,
    // "x y" kept. doc 3: windows at 1 and 2 → tokens 1-5 cut, nothing left.
    assert(got(1L) == ((6, 6)), s"first doc untouched: ${got(1L)}")
    assert(got(2L) == ((6, 2)), s"span cut: ${got(2L)}")
    assert(got(3L) == ((5, 0)), s"fully duplicated doc emptied: ${got(3L)}")
    assert(got(4L) == ((5, 5)), s"unique doc untouched: ${got(4L)}")
    val cutFp2 = TextQueries.substrCutOf(docs)
      .filter(col("doc_id") === 2L).head.getString(3)
    assert(cutFp2 == org.apache.commons.codec.digest.DigestUtils.md5Hex("x y"),
      "cut text of doc 2 is exactly the surviving prefix")
    // corpus-wide: kept = n_tokens − dup_tokens of the accounting row
    val acct = q("q_substr_dedup").select(col("doc_id"),
      (col("n_tokens") - col("dup_tokens")).as("expect"))
    val joined = q("q_substr_cut").join(acct, "doc_id")
    assert(joined.filter(col("kept_tokens") =!= col("expect")).count() == 0,
      "cut and accounting disagree")
  }

  test("q_substr_cut: long fully-duplicated doc and scattered spans stay linear and exact") {
    import spark.implicits._
    // the old per-token membership probe was O(n·|starts|) — a 5000-token
    // fully-duplicated doc made it a 25M-op row; the merged-interval
    // cover must handle it instantly and still cut exactly
    val n = 5000
    val longText = (0 until n).map(i => s"t$i").mkString(" ")
    // patchwork doc: two 4-token runs lifted from doc 1, separated and
    // flanked by unique tokens -> two disjoint covered intervals
    val patch = "u1 u2 t10 t11 t12 t13 u3 u4 u5 t50 t51 t52 t53 u6"
    val docs = Seq(
      (1L, longText), (2L, longText), (3L, patch)).toDF("doc_id", "text")
    val got = TextQueries.substrCutOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L)._1 == n && got(1L)._2 == n, s"first copy untouched: ${got(1L)}")
    assert(got(2L)._1 == n && got(2L)._2 == 0, s"second copy emptied: ${got(2L)}")
    assert(got(3L)._1 == 14 && got(3L)._2 == 6, s"patchwork gaps kept: ${got(3L)}")
    assert(got(3L)._3 ==
      org.apache.commons.codec.digest.DigestUtils.md5Hex("u1 u2 u3 u4 u5 u6"),
      "kept text must be exactly the inter-span gaps, in order")
  }

  test("q_dsir_weight: target-language docs outweigh disjoint-script docs; deterministic") {
    val df = q("q_dsir_weight").cache()
    try {
      val docs = sources.Tables.documents(spark, dir).select("doc_id", "lang")
      val byLang = df.join(docs, "doc_id").groupBy("lang")
        .agg(avg(col("n_boosted").cast("double") / col("n_bigrams")).as("w"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // zh bigrams are script-disjoint from the en target: every bucket
      // they hit is (almost surely) target-unseen, so the share of
      // boosted bigrams must sit below the en docs'
      assert(byLang("en") > byLang("zh"),
        s"en ${byLang("en")} should outweigh zh ${byLang("zh")}")
      assert(q("q_dsir_weight").except(df).count() == 0, "not deterministic")
    } finally df.unpersist()
  }

  test("q_shard_shuffle: a permutation — dense 0-based positions per shard, every doc once") {
    val df = q("q_shard_shuffle").cache()
    try {
      val n = df.count()
      assert(df.select("doc_id").distinct().count() == n)
      assert(df.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
      val perShard = df.groupBy("shard").agg(
        count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
      val bad = perShard.filter(
        col("lo") =!= 0 || col("hi") =!= col("n") - 1 || col("d") =!= col("n"))
      assert(bad.count() == 0, bad.collect().mkString("\n"))
      // reproducibility: a second independent evaluation is identical
      assert(q("q_shard_shuffle").except(df).count() == 0)
    } finally df.unpersist()
  }
}
