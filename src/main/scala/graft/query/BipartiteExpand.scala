package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative bipartite graph expansion — the reference engine's single
  * query capability (SURVEY.md §2.5, master.erl:251-304).
  *
  * The reference holds the bipartite actor↔movie adjacency as two ETS
  * tables (movie→cast, actor→movies) sharded by hash, and answers
  * "all co-stars of X up to depth L" by a master-driven DFS with a
  * visited set. Here the graph is ONE edge DataFrame viewed from both
  * ends, and a level is two chained equi-joins (src→dst, dst→src) with
  * a `left_anti` visited check — true global-BFS dedup (documented
  * deviation 1 in SURVEY.md §7: strictly more deduplication than the
  * reference's per-DFS-path set, same vertex set).
  *
  * Scale design (100 TB / 1000 executors):
  *  - the edge table is deduplicated once, persisted, and repartitioned
  *    on the join key so every BFS level reuses the same shuffle
  *    partitioning instead of re-shuffling the big side per level;
  *  - the frontier (small by construction) drives the join; Spark's AQE
  *    converts the frontier side to a broadcast when it fits;
  *  - `localCheckpoint` per level cuts the growing lineage so level N's
  *    plan does not re-derive levels 1..N-1 (standard iterative-algo
  *    practice, same shape GraphFrames uses);
  *  - no per-vertex driver round-trips: the reference's scatter/gather
  *    RPC per frontier vertex (master.erl:275-283) becomes one join per
  *    level regardless of frontier size.
  */
object BipartiteExpand {

  /** Result of an expansion: vertices of the root's type and the
    * level-L src→dst edges that discovered them (G7, master.erl:255-263). */
  final case class Expansion(vertices: DataFrame, edges: DataFrame)

  /** Expand from `root` over `edges(src, dst)` for `level` rounds using
    * the reference's level semantics (master.erl:271): level=1 ⇒ root
    * only; each further level is one two-hop expansion (src → dst →
    * src', e.g. actor → movie → co-actor). Returns all visited
    * src-type vertices (column name = `srcCol`).
    */
  def expand(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      root: Column,
      level: Int): DataFrame = {
    val srcField = edges.schema(srcCol)
    // Dedup + co-partition once; both join directions reuse this.
    val e = edges.select(srcCol, dstCol).distinct()
      .repartition(col(srcCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var visited = e.select(col(srcCol)).filter(col(srcCol) === root).distinct()
      .localCheckpoint()
    var frontier = visited

    var l = 1
    var exhausted = frontier.isEmpty
    while (l < level && !exhausted) {
      // hop 1: frontier src-vertices → their dst neighbors
      val mids = frontier.join(e, srcCol).select(col(dstCol)).distinct()
      // hop 2: dst neighbors → all their src endpoints
      val next = mids.join(e, dstCol).select(col(srcCol)).distinct()
      // G5 visited-set dedup, global-BFS form
      val fresh = next.join(visited, Seq(srcCol), "left_anti").localCheckpoint()
      exhausted = fresh.isEmpty
      visited = visited.union(fresh).localCheckpoint()
      frontier = fresh
      l += 1
    }
    e.unpersist()
    visited
  }

  /** Full expansion with discovered edges per level (G7): returns both
    * the vertex set and the (src, via-dst, src') co-occurrence edges. */
  def expandWithEdges(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      root: Column,
      level: Int): Expansion = {
    val e = edges.select(srcCol, dstCol).distinct()
      .repartition(col(srcCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val other = e.withColumnRenamed(srcCol, s"${srcCol}_peer")

    var visited = e.select(col(srcCol)).filter(col(srcCol) === root).distinct()
      .localCheckpoint()
    var frontier = visited
    var acc: Option[DataFrame] = None

    var l = 1
    var exhausted = frontier.isEmpty
    while (l < level && !exhausted) {
      val discovered = frontier.join(e, srcCol)
        .join(other, dstCol)
        .filter(col(srcCol) =!= col(s"${srcCol}_peer"))
        .select(col(srcCol), col(dstCol), col(s"${srcCol}_peer"))
        .distinct()
        .localCheckpoint()
      val next = discovered.select(col(s"${srcCol}_peer").as(srcCol)).distinct()
      val fresh = next.join(visited, Seq(srcCol), "left_anti").localCheckpoint()
      exhausted = fresh.isEmpty
      visited = visited.union(fresh).localCheckpoint()
      acc = Some(acc.map(_.union(discovered)).getOrElse(discovered))
      frontier = fresh
      l += 1
    }
    e.unpersist()
    val emptyEdges = acc.getOrElse {
      e.sparkSession.createDataFrame(
        e.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          e.schema(srcCol), e.schema(dstCol),
          e.schema(srcCol).copy(name = s"${srcCol}_peer"))))
    }
    Expansion(visited, emptyEdges.dropDuplicates(srcCol, dstCol, s"${srcCol}_peer"))
  }
}
