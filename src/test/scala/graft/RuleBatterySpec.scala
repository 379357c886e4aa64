package graft

/** Property pins for q_gopher_rules and q_neighbor_sample (both are
  * hash-checked against DuckDB in the gate; these assert the semantic
  * invariants a hash can't explain). */
class RuleBatterySpec extends SparkSpec {

  import spark.implicits._

  test("q_gopher_rules: keep is the conjunction of its rule columns") {
    val rows = Catalog.byName("q_gopher_rules")
      .fn(spark, "/root/testdata/sf0.001")
      .select("r_wordcount", "r_meanlen", "r_stopwords", "r_repetition", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, c, d, keep) =>
      assert(keep === (a && b && c && d))
    }
    // the battery must actually discriminate at smoke scale
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "all documents landed on one side of the battery")
  }

  test("q_neighbor_sample: fan-out capped at 5, sample ⊆ adjacency") {
    val dir = "/root/testdata/sf0.001"
    val sample = Catalog.byName("q_neighbor_sample").fn(spark, dir)
    val fanOut = sample.groupBy("cust").count()
      .filter(org.apache.spark.sql.functions.col("count") > 5).count()
    assert(fanOut === 0, "a vertex exceeded the k=5 fan-out cap")
    val edges = graft.operators.GraphQueries.copurchaseEdges(spark, dir)
      .distinct()
    assert(sample.join(edges, Seq("cust", "part"), "left_anti").count() === 0,
      "sampled a non-existent edge")
    // vertices with degree >= k must be sampled at exactly k
    val deg = edges.groupBy("cust").count().filter(
      org.apache.spark.sql.functions.col("count") >= 5)
    val under = sample.groupBy("cust").count()
      .withColumnRenamed("count", "got")
      .join(deg, "cust")
      .filter(org.apache.spark.sql.functions.col("got") =!= 5)
      .count()
    assert(under === 0, "a high-degree vertex was sampled below k")
  }

  test("q_bpe_merges: ranked pair list is well-formed") {
    val rows = Catalog.byName("q_bpe_merges")
      .fn(spark, "/root/testdata/sf0.001")
      .select("pair", "cnt").as[(String, Long)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._1).distinct.length === 20)
    assert(rows.forall { case (p, c) => p.length == 2 && c > 0 })
    // descending by count with pair tiebreak
    assert(rows.sliding(2).forall { case Array((pa, ca), (pb, cb)) =>
      ca > cb || (ca == cb && pa < pb) })
  }

  test("q_snapshot_diff: statuses follow the id rule") {
    val rows = Catalog.byName("q_snapshot_diff")
      .fn(spark, "/root/testdata/sf0.001")
      .select("doc_id", "status").as[(Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, st) =>
      val inOld = id % 11 != 0
      val inNew = id % 13 != 0
      val expected =
        if (!inOld && inNew) "added"
        else if (inOld && !inNew) "removed"
        else if (id % 17 == 0) "changed"
        else fail(s"doc $id should be unchanged but was emitted as $st")
      assert(st === expected, s"doc $id")
    }
  }

  test("q_retention_cohorts: offset-0 row is each cohort's maximum") {
    val rows = Catalog.byName("q_retention_cohorts")
      .fn(spark, "/root/testdata/sf0.001")
      .select("cohort", "day_offset", "n_users")
      .as[(String, Int, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0), "negative day offset")
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val day0 = rs.find(_._2 == 0)
        .getOrElse(fail(s"cohort $c has no offset-0 row"))._3
      assert(rs.forall(_._3 <= day0),
        s"cohort $c: a later day exceeds the cohort size")
    }
  }

  test("q_zorder_layout: every bucket bounds BOTH dimensions to 16") {
    val rows = Catalog.byName("q_zorder_layout")
      .fn(spark, "/root/testdata/sf0.001")
      .select("bucket", "min_user", "max_user", "min_hour", "max_hour")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.length > 1, "z-layout degenerated to a single bucket")
    rows.foreach { case (bkt, lu, hu, lh, hh) =>
      assert(hu - lu <= 15, s"bucket $bkt: user span ${hu - lu} > 15")
      assert(hh - lh <= 15, s"bucket $bkt: hour span ${hh - lh} > 15")
    }
  }

  test("q_funnel_steps: step counts are monotonically non-increasing") {
    val rows = Catalog.byName("q_funnel_steps")
      .fn(spark, "/root/testdata/sf0.001")
      .select("step", "n_users").as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3))
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2,
      s"funnel widened downstream: ${rows.mkString(", ")}")
    assert(rows(0)._2 > 0, "empty funnel at smoke scale")
  }

  test("q_gap_fill: dense grid, zero-filled gaps, forward fill carries " +
      "the last observed value") {
    val rows = Catalog.byName("q_gap_fill")
      .fn(spark, "/root/testdata/sf0.001")
      .select("hour", "event_type", "n_events", "value_cents", "filled_cents")
      .as[(String, String, Long, Long, Long)].collect()
    val hours = rows.map(_._1).distinct.sorted
    val types = rows.map(_._2).distinct
    assert(rows.length == hours.length * types.length,
      "grid is not the full hour × type cross product")
    val gaps = rows.filter(_._3 == 0)
    assert(gaps.nonEmpty, "fixture produced no gap cells")
    assert(gaps.forall(_._4 == 0L), "a gap cell carries observed value")
    // replay the forward fill per type in plain Scala
    types.foreach { t =>
      var lastSeen = 0L
      rows.filter(_._2 == t).sortBy(_._1).foreach { r =>
        if (r._3 > 0) lastSeen = r._4
        assert(r._5 == lastSeen,
          s"fill drifted at (${r._1}, $t): got ${r._5}, want $lastSeen")
      }
    }
  }

  test("JSONL roundtrip survives adversarial text (quotes/controls/unicode)") {
    import org.apache.spark.sql.functions._
    val nasty = Seq(
      (1L, "plain text"),
      (2L, "quote \" backslash \\ slash /"),
      (3L, "tab\tnewline\ncarriage\rreturn"),
      (4L, "unicode é中😀 mixed"),
      (5L, "control  chars"),
      (6L, ""))
    val df = nasty.toDF("doc_id", "text")
    val dest = java.nio.file.Files
      .createTempDirectory("graft_jsonl_spec").toString
    df.write.mode("overwrite").json(dest)
    val back = spark.read.schema(df.schema).json(dest)
    assert(back.count() === nasty.length)
    val diff = df.select(col("doc_id"), md5(col("text")).as("h"))
      .join(back.select(col("doc_id"), md5(col("text")).as("h2")), "doc_id")
      .filter(col("h") =!= col("h2")).count()
    assert(diff === 0, "text changed through the JSONL roundtrip")
  }

  test("q_vocab_growth: tokens and vocabulary are non-decreasing in cp") {
    val rows = Catalog.byName("q_vocab_growth")
      .fn(spark, "/root/testdata/sf0.001")
      .select("cp", "total_tokens", "vocab")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 7)
    rows.sliding(2).foreach { case Array((_, ta, va), (cp, tb, vb)) =>
      assert(tb >= ta && vb >= va, s"growth curve decreased at cp=$cp")
    }
    assert(rows.last._3 > rows.head._3 || rows.head._3 > 0,
      "vocabulary never grew across checkpoints")
  }

  test("q_dataset_card: per-source invariants") {
    val rows = Catalog.byName("q_dataset_card")
      .fn(spark, "/root/testdata/sf0.001")
      .select("source", "n_docs", "n_dup_docs", "min_chars", "max_chars")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, dup, lo, hi) =>
      assert(n > 0 && dup >= 0 && dup <= n, s"$src dup bounds")
      assert(lo <= hi, s"$src length bounds inverted")
    }
  }

  test("q_merge_apply: deletes absent, upserts win") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val merged = Catalog.byName("q_merge_apply").fn(spark, dir)
    assert(merged.filter(col("doc_id") % 19 === 0).count() === 0,
      "a deleted id survived the merge")
    val docs = graft.sources.Tables.documents(spark, dir)
    val upserted = docs.filter(col("doc_id") % 13 === 0 &&
        col("doc_id") % 19 =!= 0 && col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), md5(concat(col("text"), lit(" v2"))).as("expect"))
    val wrong = merged.join(upserted, "doc_id")
      .filter(col("digest") =!= col("expect")).count()
    assert(wrong === 0, "an upsert did not win over the base row")
  }
}
