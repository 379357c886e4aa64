package graft

import org.apache.spark.sql.functions._
import graft.query.AnnLsh
import graft.sources.Tables

class AnnLshSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = Tables.embeddings(spark, dir).persist()
  private lazy val ps = AnnLsh.planes(dim = 64, nBits = 8)

  private lazy val queryVec: Array[Double] =
    emb.filter(col("vec_id") === 0).collect()(0)
      .getSeq[Float](1).map(_.toDouble).toArray

  test("buckets are deterministic across partitionings") {
    val b1 = AnnLsh.bucketed(emb.repartition(3), "embedding", ps)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = AnnLsh.bucketed(emb.repartition(11), "embedding", ps)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
    assert(b1.values.toSet.size > 1, "all vectors hashed to one bucket")
  }

  test("an exact duplicate vector is always found at cos 1.0") {
    val dup = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999999L))
    val corpus = emb.union(dup)
    val top = AnnLsh.search(corpus, "vec_id", "embedding", queryVec, k = 2, ps)
      .collect()
    // identical vector shares the bucket by construction (same signs)
    assert(top.map(_.getLong(0)).toSet == Set(0L, 999999L))
    assert(top.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("bucketed near-dup matches the exact all-pairs result, cartesian-free") {
    val exact = Catalog.byName("q_embed_neardup").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Catalog.byName("q_embed_neardup_lsh").fn(spark, dir)
    val got = lsh.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exact, s"bucketed=$got exact=$exact")
    // the whole point: the candidate stage is an equi join, never a
    // cartesian product / nested-loop join
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "plan contains CartesianProduct")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "plan contains BroadcastNestedLoopJoin")
  }

  test("multi-probe search prunes the corpus and keeps good recall") {
    val scanned = AnnLsh.bucketed(emb, "embedding", ps)
    val qb = scanned.filter(col("vec_id") === 0).collect()(0).getInt(2)
    val probedBuckets = (qb +: (0 until 8).map(j => qb ^ (1 << j))).toSet
    val scannedRows = scanned.filter(col("bucket").isin(probedBuckets.toSeq: _*)).count()
    assert(scannedRows < emb.count(), "LSH probing must scan a strict subset")

    val lshTop = AnnLsh.search(emb, "vec_id", "embedding", queryVec, 10, ps)
      .collect().map(_.getLong(0)).toSet
    val bruteTop = Catalog.byName("q_cosine_topk").fn(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val recall = (lshTop & bruteTop).size / 10.0
    info(f"scanned $scannedRows/${emb.count()} rows, recall@10 = $recall%.1f")
    assert(lshTop.contains(0L))  // the query itself always survives
  }
}
