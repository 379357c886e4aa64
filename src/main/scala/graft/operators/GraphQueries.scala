package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.query.BipartiteExpand
import graft.sources.Tables

/** Graph/traversal operator surface (SURVEY.md §2.5) mapped onto the
  * synthetic star schema: the bipartite customer↔part co-purchase graph
  * (customer —bought→ part via orders ⋈ lineitem) stands in for the
  * reference's actor↔movie graph, with customer 0 as the query root.
  *
  * These queries run through the REAL engine path
  * ([[graft.query.BipartiteExpand]]) — the driver-loop BFS with
  * visited-set anti-join — not a hand-inlined SQL translation, so the
  * oracle checks the engine itself.
  */
object GraphQueries {

  /** The bipartite edge table: G1's adjacency (both ETS tables of the
    * reference are the two orientations of this one edge list).
    * Multiplicity is NOT removed here — every consumer either dedups
    * per hop (BipartiteExpand's distinct after each join) or dedups
    * itself, which avoids a full shuffle of the fact join output. */
  def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))

  private val edgesCte =
    "WITH edges AS (SELECT DISTINCT o_custkey AS cust, l_partkey AS part " +
    "FROM orders JOIN lineitem ON o_orderkey = l_orderkey)"

  /** G4+G6 level=2: one two-hop expansion — "customers who bought a part
    * that customer 0 bought" (co-stars of X). */
  private def graphLevel2(s: SparkSession, d: String): DataFrame =
    BipartiteExpand.expand(s, copurchaseEdges(s, d), "cust", "part", lit(0L), 2)
      .orderBy("cust")

  /** G4+G6 level=3: two expansions (co-customers of co-customers). */
  private def graphLevel3(s: SparkSession, d: String): DataFrame =
    BipartiteExpand.expand(s, copurchaseEdges(s, d), "cust", "part", lit(0L), 3)
      .orderBy("cust")

  /** G4+G6 level=4: the deepest traversal the reference GUI offers
    * (client.erl:38,91 — level ∈ 1..4; loop at master.erl:271-288). */
  private def graphLevel4(s: SparkSession, d: String): DataFrame =
    BipartiteExpand.expand(s, copurchaseEdges(s, d), "cust", "part", lit(0L), 4)
      .orderBy("cust")

  /** The SAME level-3 BFS forced through the shuffle-fallback path
    * (`FrontierMode.Shuffle`, `dedupEdges = true`) — the plan a
    * frontier too large to broadcast takes at 100 TB: both edge
    * orientations cached pre-partitioned on their hop key, so each
    * level's big joins are co-partitioned and only frontier-sized
    * aggregates shuffle (`ShufflePathPlanSpec` pins it). Same oracle
    * as `q_graph_level3`, headline so the driver bench times both
    * paths side by side every round (the default-auto rows above pick
    * broadcast themselves at this scale — `FrontierModeSpec`). */
  private def graphLevel3Shuffle(s: SparkSession, d: String): DataFrame =
    BipartiteExpand.expand(s, copurchaseEdges(s, d), "cust", "part", lit(0L), 3,
        dedupEdges = true, mode = BipartiteExpand.FrontierMode.Shuffle)
      .orderBy("cust")

  /** The reference's second query direction (movie-rooted, client.erl:91):
    * the SAME bipartite engine expanded from the part side — "parts
    * sharing a customer with part 1", i.e. co-starring movies. */
  private def graphMovieLevel2(s: SparkSession, d: String): DataFrame =
    BipartiteExpand.expand(s, copurchaseEdges(s, d), "part", "cust", lit(1L), 2)
      .orderBy("part")

  /** G7: the discovered co-occurrence edge list at level 2 —
    * (root, shared part, co-customer) triples. */
  private def graphEdgesLevel2(s: SparkSession, d: String): DataFrame =
    BipartiteExpand
      .expandWithEdges(s, copurchaseEdges(s, d), "cust", "part", lit(0L), 2)
      .edges
      .orderBy("cust", "part", "cust_peer")

  /** G1: the sharded point lookup (ets:lookup dispatched to all
    * shards, server.erl:299-317) — as a predicate-pushdown scan: the
    * root filter reaches the parquet scan, so only matching row groups
    * are read; no scatter/gather RPC exists to write. */
  private def pointLookup(s: SparkSession, d: String): DataFrame =
    copurchaseEdges(s, d)
      .filter(col("cust") === 0)
      .select("part").distinct()
      .orderBy("part")

  /** The reference-parity ingest itself, oracle-checked: the 3-way
    * star join over the ACTUAL IMDB sample TSVs
    * ([[graft.ingest.EdgeBuilder]] — P1-P6/J1/J2), compared against
    * DuckDB parsing the same files with read_csv. The sf directory
    * argument is unused: this row pins the TSV-ingest semantics
    * (null token, no-quote parsing, category filter, inner-join
    * dangling-key drops) that the parquet-table queries can't reach. */
  private val imdbDir = "/root/repo/src/test/resources/imdb"
  private def imdbIngestEdges(s: SparkSession, d: String): DataFrame =
    graft.ingest.EdgeBuilder.edges(s,
        s"$imdbDir/basic1000.tsv", s"$imdbDir/principals1000.tsv",
        s"$imdbDir/names1000.tsv")
      .orderBy("title", "name")

  /** GNN-minibatch neighbor sampling (GraphSAGE, Hamilton et al.
    * 2017): cap every vertex's fan-out at k=5 neighbors, selected by a
    * salted-hash rank — deterministic, rerun- and partitioning-stable,
    * the step that turns a power-law adjacency into a bounded training
    * sample. Scale shape: the bounded-heap [[graft.functions.TopK]]
    * Aggregator (map-side partial heaps; n_vertices × k tuples cross
    * the exchange, never a per-vertex window sort — on a 100 TB edge
    * list the hub vertices are exactly where a window form dies). The
    * rank hash is 48-bit, exact in both a double and a BIGINT, so both
    * engines select identical neighbor sets. */
  private def neighborSample(s: SparkSession, d: String): DataFrame = {
    val k = 5
    val h = conv(substring(md5(concat(
      lit("nbr|"), col("cust").cast("string"),
      lit("|"), col("part").cast("string"))), 1, 12), 16, 10).cast("long")
    val scored = copurchaseEdges(s, d).distinct()
      .select(col("cust"), col("part"), (-h).cast("double").as("neg_h"))
    graft.functions.TopK.perKey(scored, "cust", "neg_h", "part", k)
      .select(col("cust"), col("part"))
      .orderBy("cust", "part")
  }

  /** Degree histogram of the bipartite graph (scale diagnostic: the
    * skew profile that decides salting/AQE at 100 TB). */
  private def degreeHistogram(s: SparkSession, d: String): DataFrame =
    copurchaseEdges(s, d)
      .groupBy("cust").agg(countDistinct("part").as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_custs"))
      .orderBy("degree")

  val all: Seq[Q] = Seq(
    Q("q_graph_level2", graphLevel2, Some(
      edgesCte +
      " SELECT DISTINCT e2.cust AS cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part " +
      "WHERE e1.cust = 0 ORDER BY cust"),
      headline = true),
    Q("q_graph_level3", graphLevel3, Some(
      edgesCte + ", " +
      "l2 AS (SELECT DISTINCT e2.cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part WHERE e1.cust = 0) " +
      "SELECT DISTINCT e2.cust AS cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part " +
      "WHERE e1.cust IN (SELECT cust FROM l2) ORDER BY cust"),
      // headline: the driver-loop BFS path (per-level localCheckpoint +
      // isEmpty jobs) needs a round-over-round timing signal, not just
      // the single-expansion q_graph_level2.
      headline = true),
    Q("q_graph_level3_shuffle", graphLevel3Shuffle, Some(
      edgesCte + ", " +
      "l2 AS (SELECT DISTINCT e2.cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part WHERE e1.cust = 0) " +
      "SELECT DISTINCT e2.cust AS cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part " +
      "WHERE e1.cust IN (SELECT cust FROM l2) ORDER BY cust"),
      headline = true),
    Q("q_graph_level4", graphLevel4, Some(
      edgesCte + ", " +
      "l2 AS (SELECT DISTINCT e2.cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part WHERE e1.cust = 0), " +
      "l3 AS (SELECT DISTINCT e2.cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part " +
      "WHERE e1.cust IN (SELECT cust FROM l2)) " +
      "SELECT DISTINCT e2.cust AS cust FROM edges e1 JOIN edges e2 ON e1.part = e2.part " +
      "WHERE e1.cust IN (SELECT cust FROM l3) ORDER BY cust")),
    Q("q_graph_movie_level2", graphMovieLevel2, Some(
      edgesCte +
      " SELECT DISTINCT e2.part AS part FROM edges e1 JOIN edges e2 ON e1.cust = e2.cust " +
      "WHERE e1.part = 1 ORDER BY part")),
    Q("q_graph_edges_level2", graphEdgesLevel2, Some(
      edgesCte +
      " SELECT DISTINCT e1.cust AS cust, e1.part AS part, e2.cust AS cust_peer " +
      "FROM edges e1 JOIN edges e2 ON e1.part = e2.part " +
      "WHERE e1.cust = 0 AND e2.cust <> e1.cust ORDER BY cust, part, cust_peer")),
    Q("q_point_lookup", pointLookup, Some(
      "SELECT DISTINCT l_partkey AS part FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
      "WHERE o_custkey = 0 ORDER BY part")),
    Q("q_imdb_ingest_edges", imdbIngestEdges, Some(
      s"SELECT DISTINCT b.originalTitle AS title, n.column1 AS name " +
      s"FROM read_csv('$imdbDir/principals1000.tsv', delim='\t', header=true, quote='', nullstr='\\N') p " +
      s"JOIN read_csv('$imdbDir/names1000.tsv', delim='\t', header=false, quote='', nullstr='\\N') n " +
      "ON p.nconst = n.column0 " +
      s"JOIN read_csv('$imdbDir/basic1000.tsv', delim='\t', header=true, quote='', nullstr='\\N') b " +
      "ON p.tconst = b.tconst " +
      "WHERE p.category IN ('actor', 'actress') ORDER BY title, name")),
    Q("q_degree_histogram", degreeHistogram, Some(
      edgesCte + ", deg AS (SELECT cust, count(*) AS degree FROM edges GROUP BY cust) " +
      "SELECT degree, count(*) AS n_custs FROM deg GROUP BY degree ORDER BY degree")),
    Q("q_neighbor_sample", neighborSample, Some(
      edgesCte + ", scored AS (SELECT cust, part, " +
      "CAST('0x' || substr(md5('nbr|' || CAST(cust AS VARCHAR) || '|' || CAST(part AS VARCHAR)), 1, 12) AS BIGINT) AS h " +
      "FROM edges) " +
      "SELECT cust, part FROM (SELECT cust, part, " +
      "row_number() OVER (PARTITION BY cust ORDER BY h, part) AS rn FROM scored) t " +
      "WHERE rn <= 5 ORDER BY cust, part")),
  )
}
