package graft

import org.apache.spark.sql.types._
import graft.sources.Tables

/** Fixture-schema contract: every `Tables.*` loader must hand
  * downstream operators the SAME logical schema regardless of how the
  * driver re-encodes the parquet fixtures. Round 8 shipped red because
  * `events.ts` silently changed encoding (TIMESTAMP(NANOS)-as-long →
  * native TIMESTAMP(MICROS)) and nothing named the drift — this spec
  * turns any future fixture change into an immediate, named failure.
  */
class TablesContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Types downstream queries rely on. Timestamp-bearing columns accept
    * either session-local or NTZ flavor (both compare identically under
    * the UTC session TZ) — EXCEPT `events.ts`, which the loader
    * guarantees is normalized to session-local for watermark/window use.
    */
  private def tsLike(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private val exact: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  for ((name, want) <- exact.toSeq.sortBy(_._1))
    test(s"$name loader returns the contracted schema") {
      val got = Tables.load(spark, dir, name).schema
        .map(f => f.name -> f.dataType)
      assert(got == want, s"$name drifted: got $got, want $want")
    }

  test("orders loader: keys/price exact, o_orderdate is a timestamp") {
    val s = Tables.orders(spark, dir).schema
    assert(s.map(_.name) == Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(s("o_orderkey").dataType == LongType)
    assert(s("o_custkey").dataType == LongType)
    assert(s("o_totalprice").dataType == DoubleType)
    assert(tsLike(s("o_orderdate").dataType),
      s"o_orderdate drifted to ${s("o_orderdate").dataType}")
  }

  test("lineitem loader: keys/measures exact, l_shipdate is a timestamp") {
    val s = Tables.lineitem(spark, dir).schema
    assert(s.map(_.name) == Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(s("l_orderkey").dataType == LongType)
    assert(s("l_quantity").dataType == DoubleType)
    assert(tsLike(s("l_shipdate").dataType),
      s"l_shipdate drifted to ${s("l_shipdate").dataType}")
  }

  test("events loader normalizes ts to a session-local timestamp " +
      "whatever the fixture encoding") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val s = Tables.events(spark, s"/root/testdata/$sf").schema
      assert(s.map(_.name) == Seq("event_id", "ts", "user_id",
        "event_type", "value", "props"), s"$sf column drift")
      assert(s("ts").dataType == TimestampType,
        s"$sf: events.ts must normalize to TimestampType, got ${s("ts").dataType}")
      assert(s("event_id").dataType == LongType)
      assert(s("user_id").dataType == LongType)
      assert(s("value").dataType == DoubleType)
      assert(s("props").dataType == StringType)
    }
  }

  test("normalizeEventTs adapts all three historical ts encodings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val asLong = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    assert(Tables.normalizeEventTs(asLong).schema("ts").dataType == TimestampType)
    // nanos truncate to micros, same rule DuckDB applies
    assert(Tables.normalizeEventTs(asLong)
      .select(unix_micros(col("ts"))).head.getLong(0) == 1700000000123456L)
    val asLtz = asLong.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    assert(Tables.normalizeEventTs(asLtz).schema("ts").dataType == TimestampType)
    val asNtz = asLtz.withColumn("ts",
      col("ts").cast(TimestampNTZType))
    val ntzFixed = Tables.normalizeEventTs(asNtz)
    assert(ntzFixed.schema("ts").dataType == TimestampType)
    assert(ntzFixed.select(unix_micros(col("ts"))).head.getLong(0)
      == 1700000000123456L)
  }

  test("events stream probe matches the batch loader's normalized schema") {
    val probed = graft.streaming.EventStreams
      .probeSchema(spark, s"$dir/events.parquet")
    assert(probed.map(_.name) == Seq("event_id", "ts", "user_id",
      "event_type", "value", "props"))
  }
}
