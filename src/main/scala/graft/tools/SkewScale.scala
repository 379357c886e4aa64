package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial-SKEW scale evidence (round-11 verdict item 6): every
  * other scale artifact uses uniform or disjoint replicas; this main
  * builds a ZIPF-ish corpus — one hub user holding ~10% of all events,
  * growing absolutely with the factor — and measures the operators
  * whose 100 TB failure mode IS the skewed key:
  *
  *  - `latest-by-key`: the window-free `max(struct(...))` argmax the
  *    catalog ships (partial aggregation combines the hub's rows
  *    map-side BEFORE the exchange) vs the `row_number()` window
  *    counterfactual (the hub's entire history sorts in one task);
  *  - `sessionize` / last-touch `attribution`: inherently per-key
  *    windows — recorded honestly as the shapes that DO concentrate a
  *    hub's timeline in one task (the mitigation at 100 TB is
  *    time-bucketing the key, not a different operator);
  *  - fact ⋈ dim join on the skewed key: PLAIN shuffle join with AQE
  *    skew-join off (one task owns the hub), plain with AQE skew-join
  *    ON (runtime split), and the EXPLICIT salting rewrite
  *    (`q_salted_join_agg`'s shape: fact salted by event_id mod 16,
  *    dim exploded ×16) — same aggregate totals asserted for all
  *    three, wall times recorded for the crossover.
  *
  * Corpus: `factor` replicas of the sf-dir events table; non-hub users
  * are shifted into disjoint id ranges per replica (per-user event
  * counts stay constant) while every replica's `user_id % 10 == 0`
  * rows collapse onto ONE hub user — so the hub's share stays ~10%
  * and its absolute size grows ×factor, which is exactly the stress
  * (`SPARK_GRAFT_HUB_MOD` tunes the share: 10 → 10%, 2 → 50% — the
  * regime where one shuffle task owns half the fact table and the
  * salted/argmax rewrites must win).
  * Invariants per factor: n_events exact ×factor, hub share ≈
  * 1/hubMod, argmax ≡ window verdict row-for-row, salted ≡ plain ≡
  * AQE totals.
  *
  * SKEW_SCALE_r12.jsonl headline: at hubMod=2, factor 64 (6.4M
  * events, 3.2M on one key) the salted join beats the plain
  * sort-merge 1.26 s vs 1.99 s (AQE skew-join lands between at
  * 1.46 s), and the argmax latest-by-key beats the row_number window
  * ~2× through the mid factors — the two rewrites the catalog ships
  * for exactly this failure mode, now measured under it.
  */
object SkewScale {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    // hub share = 1/hubMod of all events collapse onto user 0 (default
    // 10%); SPARK_GRAFT_HUB_MOD=2 makes a 50% mega-hub — the regime
    // where one shuffle task owns half the fact table
    val hubMod = sys.env.getOrElse("SPARK_GRAFT_HUB_MOD", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-skew-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def j(v: Double): String = f"$v%.2f"

    val base = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val baseN = base.count()

    for (factor <- factors) {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft_skew_f$factor").toString
      // hubify + replicate: hub user 0 absorbs user_id % 10 == 0 in
      // EVERY replica; other users shift into disjoint ranges
      val reps = (0 until factor).map { r =>
        base.select(
          when(col("user_id") % hubMod === 0, lit(0L))
            .otherwise(col("user_id") + lit(r.toLong * 10000000L))
            .as("user_id"),
          (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
          col("event_type"), col("ts"), col("cents"))
      }
      reps.reduce(_ unionByName _).write.mode("overwrite")
        .parquet(s"$work/events")
      val ev = spark.read.parquet(s"$work/events")
      val nEvents = ev.count()
      val hubShare = ev.filter(col("user_id") === 0).count().toDouble / nEvents

      // ---- latest-by-key: window-free argmax vs window counterfactual
      val argmaxQ = ev
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("event_id"))
      val (argmaxRows, argmaxSec) = timed(argmaxQ.count())
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val windowQ = ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"))
      val (windowRows, windowSec) = timed(windowQ.count())
      // verdict parity: the argmax IS the window's pick, row-for-row
      val latestParity = argmaxQ.join(windowQ, Seq("user_id", "event_id"),
        "left_anti").isEmpty

      // ---- per-user-window shapes under a hub timeline (recorded
      // honestly: these DO concentrate the hub in one task)
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val (nSessions, sessionizeSec) = timed(
        ev.withColumn("prev", lag("ts", 1).over(byUser))
          .withColumn("newSession",
            (col("prev").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev")) >
                1800L * 1000000L).cast("long"))
          .agg(sum("newSession")).head.getLong(0))
      val (nAttributed, attributionSec) = timed(
        ev.withColumn("clickTs",
            last(when(col("event_type") === "click", col("ts")), true)
              .over(byUser))
          .filter(col("event_type") === "purchase" &&
            col("clickTs").isNotNull &&
            unix_micros(col("ts")) - unix_micros(col("clickTs")) <=
              86400L * 1000000L)
          .count())

      // ---- skewed-key fact ⋈ dim: plain (AQE skew off), plain (AQE
      // skew on), explicit salting — broadcast disabled so the
      // exchange actually happens
      val dim = ev.select("user_id").distinct()
        .withColumn("grp", pmod(col("user_id"), lit(5)))
      dim.write.mode("overwrite").parquet(s"$work/dim")
      val dimT = spark.read.parquet(s"$work/dim")
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def plainJoin(): Array[(Long, Long)] =
        ev.join(dimT, "user_id").groupBy("grp")
          .agg(sum("cents").as("total")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val SALT = 16
      def saltedJoin(): Array[(Long, Long)] =
        ev.withColumn("salt", pmod(col("event_id"), lit(SALT)).cast("int"))
          .join(dimT.withColumn("salt",
            explode(sequence(lit(0), lit(SALT - 1)))), Seq("user_id", "salt"))
          .groupBy("grp").agg(sum("cents").as("total")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (plainRes, plainNoAqeSec) = timed(plainJoin())
      val (saltedRes, saltedSec) = timed(saltedJoin())
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val (plainAqeRes, plainAqeSec) = timed(plainJoin())
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      val joinParity = plainRes.sameElements(saltedRes) &&
        plainRes.sameElements(plainAqeRes)

      println(
        s"""{"metric":"skew_scale","factor":$factor,"sf":"$sfDir",""" +
        s""""n_events":$nEvents,"n_events_exact":${nEvents == baseN * factor},""" +
        s""""hub_mod":$hubMod,"hub_share":${j(hubShare)},""" +
        s""""latest_argmax_sec":${j(argmaxSec)},"latest_window_sec":${j(windowSec)},""" +
        s""""latest_rows":$argmaxRows,"latest_parity":$latestParity,""" +
        s""""sessionize_sec":${j(sessionizeSec)},"n_sessions":$nSessions,""" +
        s""""attribution_sec":${j(attributionSec)},"n_attributed":$nAttributed,""" +
        s""""join_plain_noaqe_sec":${j(plainNoAqeSec)},""" +
        s""""join_plain_aqe_sec":${j(plainAqeSec)},""" +
        s""""join_salted_sec":${j(saltedSec)},"join_parity":$joinParity}""")

      val fs = new org.apache.hadoop.fs.Path(work)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(work), true)
      val _ = windowRows
    }
    spark.stop()
  }
}
