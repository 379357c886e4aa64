package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic parquet tables
  * (`TESTDATA.md`): TPC-H-ish star schema + events/documents/embeddings.
  *
  * All queries read through here so that scan-level concerns (schema
  * pruning, partition sizing) live in one place. At cluster scale the
  * same API would point at an object store; locally it is a directory
  * of parquet files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet encodings: TIMESTAMP(NANOS)
    * (readable only as a raw long via the legacy conf) and native
    * TIMESTAMP(MICROS). Adapt to whichever the fixture currently uses:
    * a `LongType` column is nanos → truncate to micros (the same
    * truncation DuckDB applies); a timestamp column passes through,
    * normalized NTZ→session-local (session TZ is UTC, so the wall-clock
    * micros are identical either way).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Harmless for MICROS files; required to read legacy NANOS at all.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Normalize whatever `ts` encoding the fixture shipped to a plain
    * session-local timestamp. Shared by the batch loader and the
    * streaming reader so both surfaces adapt identically.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other — fixture drifted again?")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
