package graft

import org.apache.spark.sql.functions._
import graft.query.KMeans
import graft.sources.Tables

/** Lloyd-iteration guarantees for the spherical k-means loop: the
  * objective (mean max-cosine) is non-decreasing per round, and on the
  * planted corpus (real clusters) assignments group twins with their
  * base. */
class KMeansSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def objective(assigned: org.apache.spark.sql.DataFrame): Double =
    assigned.agg(avg("sim")).collect()(0).getDouble(0)

  test("objective is monotone non-decreasing across Lloyd rounds") {
    val v = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        col("label").cast("int").as("cluster"))
      .persist()
    var assigned = KMeans.assign(
      v.select("vec_id", "e"), KMeans.centroids(v), "vec_id")
    var prev = objective(assigned)
    (1 to 3).foreach { i =>
      assigned = KMeans.assign(
        v.select("vec_id", "e"), KMeans.centroids(assigned), "vec_id")
        .localCheckpoint()
      val cur = objective(assigned)
      info(f"round $i objective: $prev%.4f -> $cur%.4f")
      assert(cur >= prev - 1e-9, f"objective decreased: $prev%.4f -> $cur%.4f")
      prev = cur
    }
    v.unpersist()
  }

  test("planted twin clusters land with their base vector") {
    // sparse planted fixture: every 50th vector + 10 twins at cos~0.9995
    val planted = graft.operators.VectorQueries
      .plantedEmbeddings(spark, dir, everyNth = 50, nTwins = 10)
    val result = KMeans.run(spark, planted.withColumn("seed",
        (col("vec_id") % 8).cast("int")),
      "vec_id", "e", "seed", iters = 3)
    val byCluster = result.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // each twin must share its base's final cluster (they are nearly
    // identical vectors; any sane partition keeps them together)
    val bases = byCluster.keys.filter(id => id < 1000000 && id % 50 == 0)
    bases.foreach { b =>
      (1 to 10).foreach { t =>
        val twin = 1000000 + b * 16 + t
        assert(byCluster(twin) == byCluster(b),
          s"twin $twin split from base $b")
      }
    }
  }
}
