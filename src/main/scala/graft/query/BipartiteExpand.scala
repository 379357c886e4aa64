package graft.query

import scala.collection.mutable.ListBuffer

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
  *  - the edge table is persisted once and streamed from cache on every
  *    hop; it is NEVER shuffled during the BFS while the frontier side
  *    stays broadcastable — each hop is then a broadcast hash join +
  *    partial-agg distinct (measured ~4× faster per level than the
  *    shuffle join locally, and at cluster scale it removes the
  *    per-level shuffle of the 100 TB side entirely);
  *  - for frontiers too large to broadcast, the shuffle fallback caches
  *    BOTH edge orientations pre-partitioned on their hop key (the
  *    reference's two ETS tables, server.erl:117-122): each hop joins
  *    its orientation co-partitioned, so only frontier-sized aggregates
  *    shuffle per level and the big table is shuffled exactly once per
  *    orientation ([[graft.ShufflePathPlanSpec]] pins this);
  *  - [[FrontierMode.Auto]] (the default) picks the path PER LEVEL from
  *    the measured frontier size — the measurement is free, because the
  *    per-level materialize-and-count probe below produces it anyway.
  *    Guessing wrong is quantified: 8.61 s (broadcast) vs 31.81 s
  *    (shuffle) for the same level-3 query at IMDB factor-8100
  *    (`IMDB_SCALE_r04.jsonl`) — and in the other direction a
  *    too-large frontier OOMs the driver. Both forced modes remain for
  *    plan pinning and A/B evidence;
  *  - the reference's per-frontier-vertex scatter/gather RPC
  *    (master.erl:275-283) becomes one join per level regardless of
  *    frontier size — no driver-side loops over vertices;
  *  - each level's output is materialized and counted in ONE job
  *    (persist + count): the count doubles as the empty-frontier
  *    early-exit probe AND the next level's mode decision, replacing
  *    the round-5 localCheckpoint-then-isEmpty pair — one job barrier
  *    per level instead of two, which halves the window in which an
  *    unlucky contention spike can land ([[Checkpoints.cut]] with a
  *    `checkpointDir` remains the durable form: a reliable checkpoint
  *    plus a count over the already-materialized frame, the knob a
  *    long 100 TB run turns on so executor loss replays from storage).
  */
object BipartiteExpand {

  /** Frontier-side join strategy for the per-level hop joins. */
  sealed trait FrontierMode
  object FrontierMode {
    /** Always broadcast the frontier side (the reference's one plan —
      * master.erl hardcodes it; right while frontiers stay bounded). */
    case object Broadcast extends FrontierMode
    /** Always the shuffle fallback: both edge orientations cached
      * pre-partitioned, per-level hop joins co-partitioned. */
    case object Shuffle extends FrontierMode
    /** Pick per level: broadcast while the measured frontier stays
      * within BOTH ceilings — row count ≤ `maxBroadcastRows` AND
      * measured cached bytes ≤ `maxBroadcastBytes` — switch to the
      * shuffle fallback (and build its partitioned caches, once)
      * beyond either. The byte test uses the ACTUAL in-memory size of
      * the materialized frontier (free: the same persist+count probe
      * produces it), so a wide key type — long URLs, composite string
      * ids — trips the switch long before a million rows; where the
      * size is unavailable (durable-checkpoint frames report no real
      * stats) the row ceiling alone decides. The visited set gets the
      * same two-ceiling test against its own running totals — it
      * grows monotonically, so it falls out of broadcast range
      * first. */
    final case class Auto(maxBroadcastRows: Long = DefaultMaxBroadcastRows,
        maxBroadcastBytes: Long = DefaultMaxBroadcastBytes)
      extends FrontierMode
  }

  /** Default auto-mode broadcast ceiling: 1M frontier keys ≈ tens of MB
    * serialized — comfortably inside executor/driver broadcast budgets
    * at any cluster size, while catching the frontier explosions that
    * make the shuffle path win (the IMDB factor-8100 level-3 frontier
    * stays under this; a 100 TB social-graph frontier does not). */
  val DefaultMaxBroadcastRows: Long = 1L << 20

  /** Default byte ceiling for the same decision: 64 MiB of CACHED
    * columnar frontier ≈ low-hundreds-of-MB deserialized on the
    * driver — inside a default 1-4 GB driver budget with margin, far
    * under Spark's 8 GB broadcast hard limit, and roughly what 1M
    * rows of ordinary ids cost, so narrow keys keep hitting the row
    * ceiling first and only genuinely wide keys move the switch
    * earlier. */
  val DefaultMaxBroadcastBytes: Long = 64L << 20

  /** Result of an expansion: vertices of the root's type and the
    * level-L src→dst edges that discovered them (G7, master.erl:255-263). */
  final case class Expansion(vertices: DataFrame, edges: DataFrame)

  /** Returns the prepared edge side plus whether WE own its cache
    * (a caller-persisted, un-transformed edge table is reused as-is —
    * persisting it again would double the memory footprint). */
  private def prepare(edges: DataFrame, srcCol: String, dstCol: String,
      dedupEdges: Boolean): (DataFrame, Boolean) = {
    val callerCached = edges.storageLevel != StorageLevel.NONE
    if (!dedupEdges && callerCached && edges.columns.toSeq == Seq(srcCol, dstCol))
      (edges, false)
    else {
      val base = edges.select(srcCol, dstCol)
      val e =
        if (dedupEdges)
          // One shuffle, reused by every level: HashPartitioning(src)
          // satisfies the dedup aggregate's ClusteredDistribution(src, dst)
          // so dropDuplicates piggybacks on the repartition.
          base.repartition(col(srcCol)).dropDuplicates(srcCol, dstCol)
        else base
      (e.persist(StorageLevel.MEMORY_AND_DISK), true)
    }
  }

  /** Second cached orientation of the edge table for the
    * shuffle-fallback path: hash-partitioned on the hop-2 key. The
    * reference keeps BOTH orientations of the adjacency as separate
    * sharded ETS tables (movie→cast AND actor→movies,
    * server.erl:117-122); the Spark translation is this second
    * repartition — with it, hop 1 reads the src-partitioned cache and
    * hop 2 the dst-partitioned one, each level's distinct output is
    * already co-partitioned with the NEXT hop's cache, and the only
    * per-level shuffles left are the frontier-sized aggregates. The
    * 100 TB edge table itself is shuffled exactly twice, once per
    * orientation, at fallback entry (`ShufflePathPlanSpec` pins this). */
  private[graft] def dstOriented(e: DataFrame, dstCol: String): DataFrame =
    e.repartition(col(dstCol)).persist(StorageLevel.MEMORY_AND_DISK)

  /** Test hook: the prepared (src-oriented, dst-oriented) pair exactly
    * as the shuffle-fallback loop builds it. */
  private[graft] def shuffleOrientations(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val (e, _) = prepare(edges, srcCol, dstCol, dedupEdges = true)
    (e, dstOriented(e, dstCol))
  }

  private def hint(df: DataFrame, bcast: Boolean): DataFrame =
    if (bcast) broadcast(df) else df

  /** Actual cached size of a just-materialized frame (InMemoryRelation
    * stats, exact after the count job ran the cache), or 0 = unknown
    * when no real measurement exists — reliable-checkpoint frames
    * surface only the conservative planner default, which must not
    * masquerade as a measurement. */
  private def measuredBytes(df: DataFrame): Long = {
    val s = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (s.isValidLong && s.toLong > 0 && s.toLong < (Long.MaxValue >> 2))
      s.toLong
    else 0L
  }

  /** Shared mutable machinery of one expansion run: the edge-side
    * caches (plus the lazily-built shuffle orientations), the per-level
    * materialize-and-count probe, and the release bookkeeping. */
  private final class Loop(
      e0: DataFrame, ownCache: Boolean, srcCol: String, dstCol: String,
      dedupEdges: Boolean, mode: FrontierMode,
      checkpointDir: Option[String]) {
    private var eSrc = e0
    private var eDstOpt: Option[DataFrame] = None
    private var srcPartitioned = dedupEdges // prepare() repartitioned on src
    private val owned = ListBuffer.empty[DataFrame]
    if (ownCache) owned += e0

    var visitedRows = 0L
    var frontierRows = 0L
    /** Measured cached bytes of the same frames; 0 = no measurement
      * yet (then the row ceilings alone decide). */
    var visitedBytes = 0L
    var frontierBytes = 0L

    /** Hop-join edge sides for a level: (hop-1 src-keyed, hop-2
      * dst-keyed). Broadcast levels stream the one cache for both hops;
      * the first shuffle level builds the partitioned orientations from
      * it (two cache-fed shuffles — the same up-front cost the forced
      * fallback pays) and later levels reuse them. */
    def hopSides(bcast: Boolean): (DataFrame, DataFrame) =
      if (bcast) (eSrc, eSrc)
      else {
        if (eDstOpt.isEmpty) {
          if (ownCache && !srcPartitioned) {
            val p = e0.repartition(col(srcCol))
              .persist(StorageLevel.MEMORY_AND_DISK)
            owned += p
            eSrc = p
            srcPartitioned = true
          }
          eDstOpt = Some(
            if (ownCache) { val d = dstOriented(e0, dstCol); owned += d; d }
            else eSrc)
        }
        (eSrc, eDstOpt.get)
      }

    /** Materialize `df` and learn its row count AND cached byte size
      * in ONE job (persist + count — the stats read is free), or
      * reliably checkpoint first when a durable dir is set (bytes then
      * 0 = unmeasured). The persisted frame is registered for
      * release. */
    def matCount(df: DataFrame): (DataFrame, Long, Long) = checkpointDir match {
      case Some(_) =>
        val c = Checkpoints.cut(df, checkpointDir)
        (c, c.count(), measuredBytes(c))
      case None =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        owned += p
        val n = p.count()
        (p, n, measuredBytes(p))
    }

    /** Frontier-side broadcast decision for the next level: inside the
      * row ceiling AND the byte ceiling (where measured). */
    def broadcastLevel(iterative: Boolean): Boolean = mode match {
      case FrontierMode.Broadcast => true
      case FrontierMode.Shuffle => false
      // single-iteration expansions carry no measured counts: the
      // frontier is the root set — trivially broadcastable
      case FrontierMode.Auto(tr, tb) => !iterative ||
        (frontierRows <= tr && (frontierBytes == 0L || frontierBytes <= tb))
    }

    /** The visited set gets its own decision from its running totals. */
    def broadcastVisited(iterative: Boolean): Boolean = mode match {
      case FrontierMode.Broadcast => true
      case FrontierMode.Shuffle => false
      case FrontierMode.Auto(tr, tb) => !iterative ||
        (visitedRows <= tr && (visitedBytes == 0L || visitedBytes <= tb))
    }

    def anythingOwned: Boolean = owned.nonEmpty

    /** Release every cache this run registered — called AFTER the
      * final result is materialized (releasing first would force the
      * last level to re-derive the edge table from source; measured
      * ~1 s of q_graph_level3's round-2 median). */
    def release(): Unit = owned.foreach(_.unpersist())
  }

  /** Expand from `root` over `edges(src, dst)` for `level` rounds using
    * the reference's level semantics (master.erl:271): level=1 ⇒ root
    * only; each further level is one two-hop expansion (src → dst →
    * src', e.g. actor → movie → co-actor). Returns all visited
    * src-type vertices (column name = `srcCol`).
    *
    * `onLevelMode` is instrumentation only: called once per executed
    * level with (level, frontierBroadcast) so tests pin the auto
    * switch — production callers leave the default no-op.
    */
  def expand(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      root: Column,
      level: Int,
      dedupEdges: Boolean = false,
      mode: FrontierMode = FrontierMode.Auto(),
      checkpointDir: Option[String] = None,
      onLevelMode: (Int, Boolean) => Unit = (_, _) => ()): DataFrame = {
    // The iterative machinery (persist the edge table, eager
    // materialization of each frontier, count probe) only pays for
    // itself when the loop runs ≥ 2 iterations: each job it spends is
    // amortized over the levels that reuse the cache and cut lineage.
    // A level-2 expansion is ONE iteration — a straight-line plan —
    // and the same machinery is pure overhead there (worse: the edge
    // cache would be unpersisted again before the caller even executes
    // the returned lazy plan, so it materialized for nothing — this
    // cost round 2's q_graph_level2 ~0.8 s of its 2.1 s median).
    val iterative = level > 2
    val (e, ownCache) =
      if (iterative || dedupEdges) prepare(edges, srcCol, dstCol, dedupEdges)
      else (edges.select(srcCol, dstCol), false)
    val loop = new Loop(e, ownCache, srcCol, dstCol, dedupEdges, mode,
      checkpointDir)

    val visited0 = e.select(col(srcCol)).filter(col(srcCol) === root).distinct()
    var visited = visited0
    if (iterative) {
      val (v, n, b) = loop.matCount(visited0)
      visited = v
      loop.visitedRows = n
      loop.frontierRows = n
      loop.visitedBytes = b
      loop.frontierBytes = b
    }
    var frontier = visited

    var l = 1
    var exhausted = iterative && loop.visitedRows == 0
    while (l < level && !exhausted) {
      // Will another iteration consume this one's output? Only then is
      // materializing + counting worth a job — the final level
      // pipelines straight into the consumer.
      val more = l + 1 < level
      val bcast = loop.broadcastLevel(iterative)
      onLevelMode(l, bcast)
      val (hop1E, hop2E) = loop.hopSides(bcast)
      // hop 1: frontier src-vertices → their dst neighbors
      val mids = hint(frontier, bcast)
        .join(hop1E, srcCol).select(col(dstCol)).distinct()
      // hop 2: dst neighbors → all their src endpoints
      val next = hint(mids, bcast)
        .join(hop2E, dstCol).select(col(srcCol)).distinct()
      // G5 visited-set dedup, global-BFS form
      val fresh0 = next.join(
        hint(visited, loop.broadcastVisited(iterative)), Seq(srcCol), "left_anti")
      val fresh =
        if (more) {
          val (f, n, b) = loop.matCount(fresh0)
          exhausted = n == 0
          loop.frontierRows = n
          loop.visitedRows += n
          loop.frontierBytes = b
          loop.visitedBytes += b
          f
        } else fresh0
      // No materialization of the union: both parents are already
      // materialized, so lineage stays one union node deep per level.
      visited = visited.union(fresh)
      frontier = fresh
      l += 1
    }
    // Materialize the final level WHILE the caches are still alive —
    // returning the lazy plan and releasing first would force the last
    // two-hop join to re-derive the edge table from source. The
    // single-iteration cache-less path stays fully lazy.
    if (loop.anythingOwned) {
      val out = Checkpoints.cut(visited, checkpointDir)
      loop.release()
      out
    } else visited
  }

  /** Full expansion with discovered edges per level (G7): returns both
    * the vertex set and the (src, via-dst, src') co-occurrence edges. */
  def expandWithEdges(
      spark: SparkSession,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      root: Column,
      level: Int,
      dedupEdges: Boolean = false,
      mode: FrontierMode = FrontierMode.Auto(),
      checkpointDir: Option[String] = None,
      onLevelMode: (Int, Boolean) => Unit = (_, _) => ()): Expansion = {
    // same single-iteration fast path as `expand` (see comment there)
    val iterative = level > 2
    val (e, ownCache) =
      if (iterative || dedupEdges) prepare(edges, srcCol, dstCol, dedupEdges)
      else (edges.select(srcCol, dstCol), false)
    val loop = new Loop(e, ownCache, srcCol, dstCol, dedupEdges, mode,
      checkpointDir)
    val peerCol = s"${srcCol}_peer"

    val visited0 = e.select(col(srcCol)).filter(col(srcCol) === root).distinct()
    var visited = visited0
    if (iterative) {
      val (v, n, b) = loop.matCount(visited0)
      visited = v
      loop.visitedRows = n
      loop.frontierRows = n
      loop.visitedBytes = b
      loop.frontierBytes = b
    }
    var frontier = visited
    var acc: Option[DataFrame] = None

    var l = 1
    var exhausted = iterative && loop.visitedRows == 0
    while (l < level && !exhausted) {
      val more = l + 1 < level
      val bcast = loop.broadcastLevel(iterative)
      onLevelMode(l, bcast)
      val (hop1E, hop2E) = loop.hopSides(bcast)
      val other = hop2E.withColumnRenamed(srcCol, peerCol)
      // frontier-incident edges are small (they hang off the frontier);
      // broadcast them so the big `other` side streams from cache
      val incident = hint(frontier, bcast).join(hop1E, srcCol)
      // discovered edges feed the result accumulator and, when
      // iterating further, the next frontier — only then is an eager
      // materialization worth its job
      val discovered0 = hint(incident, bcast)
        .join(other, dstCol)
        .filter(col(srcCol) =!= col(peerCol))
        .select(col(srcCol), col(dstCol), col(peerCol))
        .distinct()
      val discovered =
        if (more) loop.matCount(discovered0)._1 else discovered0
      val next = discovered.select(col(peerCol).as(srcCol)).distinct()
      val fresh0 = next.join(
        hint(visited, loop.broadcastVisited(iterative)), Seq(srcCol), "left_anti")
      val fresh =
        if (more) {
          val (f, n, b) = loop.matCount(fresh0)
          exhausted = n == 0
          loop.frontierRows = n
          loop.visitedRows += n
          loop.frontierBytes = b
          loop.visitedBytes += b
          f
        } else fresh0
      // union of materialized parents: shallow lineage, no job needed
      visited = visited.union(fresh)
      acc = Some(acc.map(_.union(discovered)).getOrElse(discovered))
      frontier = fresh
      l += 1
    }
    // same cache-lifetime rule as `expand`: materialize before release
    if (loop.anythingOwned) {
      visited = Checkpoints.cut(visited, checkpointDir)
      acc = acc.map(a => Checkpoints.cut(a, checkpointDir))
      loop.release()
    }
    val emptyEdges = acc.getOrElse {
      e.sparkSession.createDataFrame(
        e.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          e.schema(srcCol), e.schema(dstCol),
          e.schema(srcCol).copy(name = peerCol))))
    }
    Expansion(visited, emptyEdges.dropDuplicates(srcCol, dstCol, peerCol))
  }
}
