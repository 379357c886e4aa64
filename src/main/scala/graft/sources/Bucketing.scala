package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY.md §4: the reference's phash2
  * co-partitioning of both fact files on the join key,
  * dataInit.erl:155-156, done the Spark way).
  *
  * Writing both fact tables bucketed by the join key lets every later
  * join between them run shuffle-free: the scan reports
  * HashPartitioning(key, n) and EnsureRequirements inserts no
  * Exchange. At 100 TB this converts the recurring join cost into a
  * one-time write cost — exactly the trade the reference hardcodes at
  * ingest.
  */
object Bucketing {

  /** Write `df` as a bucketed external table (parquet at `path`).
    * `keys` may be composite — the bucket AND sort spec is the full
    * key list, so an equi-join on exactly these keys needs no
    * exchange on this side. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String, moreKeys: String*): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
