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

  // plain-Scala exact ground truth (independent of the Spark path)
  private lazy val allVecs: Array[(Long, Array[Double])] =
    emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def trueTop10(qid: Long, q: Array[Double]): Set[Long] =
    allVecs.filter(_._1 != qid)
      .map { case (id, v) => id -> cosine(q, v) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet

  test("multi-table searchMulti holds recall@10 >= 0.8 at the default point") {
    val queries = allVecs.filter(_._1 < 5)
    val n = emb.count().toDouble
    // the measured curve behind docs/ann_recall.md
    val points = Seq((8, 1, 1), (8, 3, 1), (8, 5, 2), (8, 8, 2))
    val results = points.map { case (bits, tables, radius) =>
      val recalls = queries.map { case (qid, q) =>
        val got = AnnLsh.searchMulti(emb, "vec_id", "embedding", q, k = 11,
            dim = 64, nBits = bits, nTables = tables, probeRadius = radius)
          .collect().map(_.getLong(0)).filter(_ != qid).take(10).toSet
        (got & trueTop10(qid, q)).size / 10.0
      }
      val scan = queries.map { case (_, q) =>
        emb.filter(AnnLsh.probeCondition(col("embedding"), q, 64, bits,
          tables, radius)).count() / n
      }
      val r = recalls.sum / recalls.size
      val s = scan.sum / scan.size
      info(f"bits=$bits tables=$tables radius=$radius recall@10=$r%.2f scan=$s%.2f")
      (bits, tables, radius, r, s)
    }
    // default operating point (8 bits x 5 tables x radius 2)
    val (_, _, _, defRecall, defScan) = results(2)
    assert(defRecall >= 0.8, f"recall@10 $defRecall%.2f < 0.8 at default point")
    assert(defScan < 1.0, "default point must prune something")
    // the curve is monotone: more tables/probes -> more recall, more scan
    assert(results.map(_._4).sliding(2).forall(p => p(0) <= p(1) + 1e-9))
  }

  test("planted (clustered) corpus: recall@10 >= 0.9 at <= 10% scan") {
    // The i.i.d.-Gaussian corpus is LSH's worst case (neighbors at cos
    // 0.25-0.40); the planted fixture is the clustered shape real
    // embedding corpora have (true top-10 at cos ~0.9995). Same
    // searchMulti machinery, tighter probe: 16 bits x 2 tables x
    // radius 1 — the round-2 verdict's unmeasured claim, now measured.
    // sparse variant: 10 twins for every 50th vector, so a base
    // query's true top-10 is exactly its twin cluster
    val planted = graft.operators.VectorQueries
      .plantedEmbeddings(spark, dir, everyNth = 50, nTwins = 10)
      .persist()
    val vecs = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val n = vecs.length.toDouble
    def top10(qid: Long, q: Array[Double]): Set[Long] =
      vecs.filter(_._1 != qid).map { case (id, v) => id -> cosine(q, v) }
        .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val queries = vecs.filter { case (id, _) => id % 50 == 0 && id < 250 }
    val points = Seq((16, 1, 0), (16, 1, 1), (16, 2, 1))
    val results = points.map { case (bits, tables, radius) =>
      val recalls = queries.map { case (qid, q) =>
        val got = AnnLsh.searchMulti(planted, "vec_id", "e", q, k = 11,
            dim = 64, nBits = bits, nTables = tables, probeRadius = radius)
          .collect().map(_.getLong(0)).filter(_ != qid).take(10).toSet
        (got & top10(qid, q)).size / 10.0
      }
      val scans = queries.map { case (_, q) =>
        planted.filter(AnnLsh.probeCondition(col("e"), q, 64, bits,
          tables, radius)).count() / n
      }
      val r = recalls.sum / recalls.size
      val s = scans.sum / scans.size
      info(f"bits=$bits tables=$tables radius=$radius recall@10=$r%.2f scan=$s%.3f")
      (r, s)
    }
    val (recall, scan) = results.last
    assert(recall >= 0.9, f"recall@10 $recall%.2f < 0.9 on clustered corpus")
    assert(scan <= 0.10, f"scan fraction $scan%.3f > 10%% on clustered corpus")
    planted.unpersist()
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
