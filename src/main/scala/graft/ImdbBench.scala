package graft

import org.apache.spark.sql.{SparkSession, SaveMode}
import org.apache.spark.sql.functions._
import graft.ingest.EdgeBuilder
import graft.query.CoStar

/** IMDB-scale throughput evidence: the reference demos on 1,001 titles
  * and cites the 8.16M-title full dump (README.md:74). This main
  * replicates the sample TSVs `factor`× (keys suffixed per replica, so
  * the co-star graph is `factor` disconnected copies — same topology
  * per copy), then times the full ingest star-join and level-2/3
  * co-star queries. `factor=1000` ≈ 1M titles / 3.6M principals.
  *
  * Generation is itself a Spark job (crossJoin with a replica-id
  * sequence), so the scale harness exercises the same engine it
  * measures.
  *
  * Usage: runMain graft.ImdbBench [factor] [sampleDir]
  */
object ImdbBench {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val sample = if (args.length > 1) args(1) else "src/test/resources/imdb"
    val out = s"/tmp/graft_imdb_f$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-imdb-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // engine session default — rationale at Bench.scala (codegen
      // class cache must hold the full operator catalog)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- generate factor× replicas with per-replica key/name suffixes ---
    val reps = spark.range(factor).select(col("id").cast("int").as("rep"))
    def replicate(path: String, header: Boolean, keyCols: Seq[Int],
        nameCols: Seq[Int], outName: String): Unit = {
      val raw = spark.read.option("sep", "\t").option("header", header)
        .option("quote", "").csv(path)
      val cols = raw.columns.zipWithIndex.map { case (c, i) =>
        if (keyCols.contains(i)) concat(col(c), lit("_r"), col("rep")).as(c)
        else if (nameCols.contains(i)) concat(col(c), lit(" (r"), col("rep"), lit(")")).as(c)
        else col(c)
      }
      raw.crossJoin(reps).select(cols: _*)
        .write.mode(SaveMode.Overwrite)
        .option("sep", "\t").option("header", header)
        .option("quote", "").option("escapeQuotes", "false")
        .csv(s"$out/$outName")
    }
    val (_, genS) = timed {
      // basics: key tconst(0); title cols primaryTitle(2), originalTitle(3)
      replicate(s"$sample/basic1000.tsv", header = true, Seq(0), Seq(2, 3), "basics")
      // principals: keys tconst(0), nconst(2)
      replicate(s"$sample/principals1000.tsv", header = true, Seq(0, 2), Seq(), "principals")
      // names: key nconst(0); primaryName(1)
      replicate(s"$sample/names1000.tsv", header = false, Seq(0), Seq(1), "names")
    }

    // --- ingest: the 3-way star join at scale ---
    val (edges, ingestS) = timed {
      EdgeBuilder.materialize(EdgeBuilder.edges(spark,
        s"$out/basics", s"$out/principals", s"$out/names"))
    }
    val nEdges = edges.count()

    // --- co-star queries from a replica-0 root ---
    val root = "Florence Lawrence (r0)"
    val (n2, q2S) = timed {
      CoStar.run(spark, edges, root, CoStar.ActorQuery, 2).vertices.count()
    }
    val (n3, q3S) = timed {
      CoStar.run(spark, edges, root, CoStar.ActorQuery, 3).vertices.count()
    }

    // --- vertex-only level-3 BFS: auto (default), forced broadcast,
    // forced shuffle fallback --- (the fallback is the plan a frontier
    // too large to broadcast takes; at 8M titles the edge table is big
    // enough for the comparison to mean something — all three must
    // return the identical vertex count, and auto must track the
    // winning forced path's time)
    import graft.query.BipartiteExpand.FrontierMode
    val autoModes = scala.collection.mutable.ArrayBuffer[(Int, Boolean)]()
    val (n3a, q3aS) = timed {
      graft.query.BipartiteExpand
        .expand(spark, edges, "name", "title", lit(root), 3,
          onLevelMode = (l, b) => autoModes += ((l, b))).count()
    }
    val (n3b, q3bS) = timed {
      graft.query.BipartiteExpand
        .expand(spark, edges, "name", "title", lit(root), 3,
          mode = FrontierMode.Broadcast).count()
    }
    val (n3s, q3sS) = timed {
      graft.query.BipartiteExpand
        .expand(spark, edges, "name", "title", lit(root), 3,
          dedupEdges = true, mode = FrontierMode.Shuffle).count()
    }
    val autoModeStr = autoModes
      .map { case (l, b) => s"$l:${if (b) "broadcast" else "shuffle"}" }
      .mkString(",")

    println(
      s"""{"metric":"imdb_scale","factor":$factor,"titles":${1001L * factor},""" +
      s""""edges":$nEdges,"gen_sec":${f"$genS%.2f"},"ingest_sec":${f"$ingestS%.2f"},""" +
      s""""l2_vertices":$n2,"q2_sec":${f"$q2S%.2f"},"l3_vertices":$n3,"q3_sec":${f"$q3S%.2f"},""" +
      s""""l3_auto_vertices":$n3a,"q3_vertex_auto_sec":${f"$q3aS%.2f"},"auto_levels":"$autoModeStr",""" +
      s""""l3_bcast_vertices":$n3b,"q3_vertex_bcast_sec":${f"$q3bS%.2f"},""" +
      s""""l3_shuffle_vertices":$n3s,"q3_vertex_shuffle_sec":${f"$q3sS%.2f"}}""")
    spark.stop()
  }
}
