package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EventQueries

/** Scale-evidence run for the round-11 event analytics (the events
  * twin of [[GraphScale]]/[[PipelineScale]]): last-touch attribution,
  * trailing-7d distinct users, MAD anomaly flags, CUSUM drift, RFM
  * segmentation and bounce rate measured on `factor`× the sf-dir's
  * events table.
  *
  * Replication: `factor` copies of the events table with user_id
  * (and event_id) shifted into disjoint per-replica ranges and
  * timestamps UNCHANGED — every replica is an independent user
  * population living on the same calendar. That makes the run
  * self-checking, with two invariant classes:
  *  - EXTENSIVE outputs scale exactly ×factor (attribution counts and
  *    cents per day, rolling distinct users per day, RFM segment
  *    sizes, sessions/bounces per day, hourly cnt on flagged rows,
  *    max CUSUM statistic — the stat is linear in counts and so is
  *    its 8·S₀ threshold);
  *  - INTENSIVE outputs are bit-identical (the MAD flag set of
  *    (type, hour, side), the CUSUM drift verdicts, the RFM bucket
  *    coordinates, bounce ppm) because every statistic is a ratio or
  *    rank over quantities that all scale together.
  * Any deviation flips `counts_exact` to false — a hub-sensitive
  * stage, a rank rule that isn't tie-stable, or a float statistic
  * that drifts with partitioning would be caught here. Wall times
  * should scale ~linearly (every operator is hash aggregates +
  * per-key windows; nothing is quadratic in users).
  *
  * One JSON line per factor on stdout; append to EVENT_SCALE_r{N}.jsonl.
  */
object EventScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-event-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def j(v: Double): String = f"$v%.2f"

    val ev = graft.sources.Tables.events(spark, sfDir)

    // base-factor (1x) outputs for the cross-factor invariants
    var attr1: Map[String, (Long, Long, Long)] = Map.empty
    var roll1: Map[String, Long] = Map.empty
    var mad1: Set[(String, String, String)] = Set.empty
    var madCnt1: Map[(String, String), Long] = Map.empty
    var cusum1: Map[String, (Long, Long, Boolean)] = Map.empty
    var rfm1: Map[(Long, Long, Long), Long] = Map.empty
    var bounce1: Map[String, (Long, Long, Long)] = Map.empty

    for (factor <- factors) {
      val shift = 1000000000L
      val fact = (0 until factor).map { r =>
        ev.select(
          col("ts"), col("event_type"), col("value"),
          (col("user_id") + lit(r * shift)).as("user_id"),
          (col("event_id") + lit(r * shift)).as("event_id"))
      }.reduce(_ unionAll _).localCheckpoint()
      fact.count()

      val (attr, attrSec) = timed {
        EventQueries.attributionOf(fact).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
      }
      val (roll, rollSec) = timed {
        EventQueries.rollingDistinctOf(fact).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      val hourly = fact
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"))
        .agg(count(lit(1)).as("cnt"))
      val (madRows, madSec) = timed {
        EventQueries.madFlags(hourly).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      }
      val hourlyUs = fact
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .agg(count(lit(1)).as("cnt"))
      val (cusum, cusumSec) = timed {
        EventQueries.cusumStats(hourlyUs).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
          .toMap
      }
      val (rfm, rfmSec) = timed {
        EventQueries.rfmSegmentsOf(fact).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
          .toMap
      }
      val (bounce, bounceSec) = timed {
        EventQueries.bounceRateOf(fact).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
      }

      val madSet = madRows.map(r => (r._1, r._2, r._4)).toSet
      val madCnt = madRows.map(r => (r._1, r._2) -> r._3).toMap
      if (factor == factors.head && factors.head == 1) {
        attr1 = attr; roll1 = roll; mad1 = madSet; madCnt1 = madCnt
        cusum1 = cusum; rfm1 = rfm; bounce1 = bounce
      }
      val f = factor.toLong
      val exact = attr1.nonEmpty &&
        attr == attr1.map { case (k, (a, o, c)) => k -> (a * f, o * f, c * f) } &&
        roll == roll1.map { case (k, v) => k -> v * f } &&
        madSet == mad1 &&
        madCnt == madCnt1.map { case (k, v) => k -> v * f } &&
        cusum == cusum1.map { case (k, (n, mx, dr)) => k -> (n, mx * f, dr) } &&
        rfm == rfm1.map { case (k, v) => k -> v * f } &&
        bounce == bounce1.map { case (k, (ns, nb, ppm)) =>
          k -> (ns * f, nb * f, ppm) }

      println(
        s"""{"tool":"event_scale","sf_dir":"$sfDir","factor":$factor,""" +
        s""""n_events":${fact.count()},""" +
        s""""attribution_sec":${j(attrSec)},"rolling_sec":${j(rollSec)},""" +
        s""""mad_sec":${j(madSec)},"cusum_sec":${j(cusumSec)},""" +
        s""""rfm_sec":${j(rfmSec)},"bounce_sec":${j(bounceSec)},""" +
        s""""n_mad_flags":${madRows.length},""" +
        s""""n_cusum_drifted":${cusum.values.count(_._3)},""" +
        s""""n_rfm_segments":${rfm.size},""" +
        s""""counts_exact":$exact}""")
    }
    spark.stop()
  }
}
