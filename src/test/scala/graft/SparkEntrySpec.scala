package graft

/** The driver's own smoke contract: entry() must return rows at
  * sf0.001, and the two maps must stay consistent. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("catalog names are unique and well-formed") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q_[a-z0-9_]+")))
  }

  test("every query runs and is non-empty at smoke scale except known-empty ones") {
    // queries whose correct sf0.001 result can be empty (dup/near-dup
    // detectors on a corpus with no duplicates)
    val mayBeEmpty = Set("q_dedup_groups", "q_ngram_jaccard", "q_lsh_pairs", "q_tpch_q22_shape",
      "q_embed_neardup", "q_embed_neardup_lsh", "q_dedup_clusters",
      "q_anti_join", "q_intersect", "q_except")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("no hashed float column emits IEEE negative zero") {
    // The driver hashes oracle-gated outputs value-by-value; Spark's
    // BigDecimal-based round has no signed zero while DuckDB's IEEE
    // round keeps it, so a -0.0 escaping any float column is a latent
    // hash mismatch (the exact failure q_pmi_bigrams hit in round 10).
    // Detect -0.0 as (x == 0.0 && cast-to-string keeps the sign):
    // ANSI mode forbids the classic 1/x = -Inf probe.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val df = fn(spark, dir)
      val floatCols = df.schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
      }
      if (floatCols.isEmpty) Nil
      else {
        val negZero = floatCols
          .map(c => col(c) === 0.0 && col(c).cast("string").startsWith("-"))
          .reduce(_ || _)
        val hits = df.filter(negZero).count()
        if (hits > 0) Seq(s"$name ($hits rows)") else Nil
      }
    }
    assert(offenders.isEmpty, s"negative zero in hashed float columns: $offenders")
  }
}
