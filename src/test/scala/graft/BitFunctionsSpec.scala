package graft

import org.apache.spark.sql.functions._
import graft.functions.{BitFunctions, MortonInterleave}

/** [[graft.functions.MortonInterleave]] — the codegen'd z-order
  * interleave must agree bit-for-bit with (a) a plain-Scala reference,
  * (b) the aggregate() higher-order-function SQL formulation it
  * replaced in q_zorder_layout, and (c) its own interpreted path. */
class BitFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def refMorton(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits)
      z |= ((x >> i) & 1L) << (2 * i + 1) | ((y >> i) & 1L) << (2 * i)
    z
  }

  private val rng = new scala.util.Random(42)
  private val pairs = Seq.tabulate(1000) { _ =>
    (rng.nextLong().abs % 65536, rng.nextLong().abs % 65536)
  } ++ Seq((0L, 0L), (65535L, 65535L), (0L, 65535L), (65535L, 0L))

  test("expression matches the Scala reference on 1000 random pairs") {
    BitFunctions.register(spark)
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), BitFunctions.morton(col("a"), col("b"), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (a, b, z) =>
      assert(z === refMorton(a, b, 16), s"($a, $b)")
    }
  }

  test("expression matches the HOF formulation it replaced") {
    BitFunctions.register(spark)
    val df = pairs.toDF("a", "b")
      .select(
        BitFunctions.morton(col("a"), col("b"), 16).as("z_expr"),
        expr("aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, i) -> " +
          "acc + shiftleft(shiftright(a, i) & 1, 2*i + 1) + " +
          "shiftleft(shiftright(b, i) & 1, 2*i))").as("z_hof"))
    assert(df.filter(col("z_expr") =!= col("z_hof")).count() === 0)
  }

  test("interpreted eval matches codegen output") {
    val e = MortonInterleave(null, null, 8)
    pairs.take(100).foreach { case (a0, b0) =>
      val (a, b) = (a0 % 256, b0 % 256)
      assert(e.nullSafeEval(a, b) === refMorton(a, b, 8))
    }
  }

  test("interleave is a bijection on the 8-bit grid") {
    val e = MortonInterleave(null, null, 8)
    val all = for (a <- 0L until 256L by 17L; b <- 0L until 256L by 13L)
      yield e.nullSafeEval(a, b).asInstanceOf[Long]
    assert(all.distinct.size === all.size, "z-values collided")
  }

  test("SQL registration validates arity, literal-ness and range (ADVICE r9)") {
    BitFunctions.register(spark)
    val t = Seq((3L, 5L)).toDF("a", "b")
    t.createOrReplaceTempView("graft_morton_args")
    // any integral literal width works — INT and BIGINT agree
    val wide = spark.sql(
      "SELECT graft_morton(a, b, 8) AS zi, " +
      "graft_morton(a, b, CAST(8 AS BIGINT)) AS zl FROM graft_morton_args")
      .head
    assert(wide.getLong(0) == refMorton(3, 5, 8) && wide.getLong(0) == wide.getLong(1))
    // wrong arity / non-literal bits / out-of-range bits -> a USAGE
    // message at analysis time, not ClassCastException/IndexOutOfBounds
    for (bad <- Seq(
        "SELECT graft_morton(a, b) FROM graft_morton_args",
        "SELECT graft_morton(a, b, a) FROM graft_morton_args",
        "SELECT graft_morton(a, b, 8.5) FROM graft_morton_args",
        "SELECT graft_morton(a, b, 99) FROM graft_morton_args",
        // 2^32 + 8: intValue() truncation would silently accept as 8
        "SELECT graft_morton(a, b, 4294967304) FROM graft_morton_args")) {
      val e = intercept[Exception] { spark.sql(bad).collect() }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("INTEGER_LITERAL in [1, 32]"))),
        s"$bad -> want the usage message, got $e")
    }
  }
}
