package graft

import org.apache.spark.sql.functions._

/** In-engine pins for the round-11 graph additions, independent of the
  * DuckDB gate: the degree-ordered triangle count must equal a naive
  * 3-way-join recount (the orientation has to count each triangle
  * EXACTLY once — over- or under-counting is the classic bug in the
  * oriented form), and the LPA row's frozen/monotone invariants must
  * hold. Smoke scale (sf0.001); the oracle re-proves both at sf0.01.
  */
class GraphOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("degree-ordered triangle count equals the naive 3-way join") {
    val out = Catalog.byName("q_triangle_count").fn(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      .cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(naive > 0, "fixture must actually contain triangles")
    assert(out("edges") == e.count())
    assert(out("triangles") == naive)
    e.unpersist()
    ()
  }

  test("label propagation: labels are frozen (one row per part), seeds " +
      "keep their brand, rounds bounded") {
    val out = Catalog.byName("q_label_prop").fn(spark, dir).collect()
    val perPart = out.groupBy(_.getLong(0))
    assert(perPart.values.forall(_.length == 1), "a part was relabeled")
    val brands = spark.read.parquet(s"$dir/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val seeds = out.filter(_.getInt(2) == 0)
    assert(seeds.nonEmpty)
    assert(seeds.forall(r => brands(r.getLong(0)) == r.getString(1)),
      "a seed's label is not its own brand")
    assert(seeds.length == brands.keysIterator.count(_ % 5 == 0),
      "seed set must be exactly the %5 parts")
    assert(out.forall(r => Set(0, 1, 2)(r.getInt(2))))
  }

  test("fixed-point pagerank: mass conserved up to floor loss, teleport " +
      "floor respected, one row per node") {
    val out = Catalog.byName("q_pagerank").fn(spark, dir).collect()
    val n = out.length.toLong
    assert(n > 0)
    assert(out.map(_.getLong(0)).distinct.length == n, "a node repeated")
    val scale = 1000000000000L
    val mass = out.map(_.getLong(1)).sum
    // floor loss: < 1 unit per DIRECTED EDGE per iteration (the
    // pr div od contributions) plus < 2 per node per iteration (the
    // two div-100 terms) plus < n for the initial split — edge count
    // dominates; at smoke scale the observed loss is ~3.3e-9 of the
    // mass, so a 1e-6 relative bound is generous yet still proves
    // mass is conserved (a lost shuffle partition would shear off
    // whole percents)
    assert(mass <= scale, s"mass $mass exceeds the fixed-point base")
    assert(mass >= scale - scale / 1000000L,
      s"floor loss too large: ${scale - mass}")
    // every node keeps at least the teleport share (15% of 1/N)
    val teleport = (15L * (scale / n)) / 100L
    assert(out.forall(_.getLong(1) >= teleport), "a rank fell below teleport")
    // ranks must actually differentiate (a constant vector means the
    // iteration never ran)
    assert(out.map(_.getLong(1)).distinct.length > 1)
  }
}
