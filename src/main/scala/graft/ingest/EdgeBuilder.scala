package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.sources.ImdbTsv

/** Ingest: three TSVs → the bipartite (title, name) edge table
  * (SURVEY.md §2.2-§2.4; entry point 2 of the reference).
  *
  * The reference's whole ingest choreography — hash-routing rows to
  * shards, an RPC name-lookup service on the master (master.erl:89-95),
  * a stop_init barrier, re-keying ETS tables by title
  * (change_key, server.erl:415-423) — collapses into one declarative
  * star join:
  *
  *   principals (fact)  ⋈ names (dim, broadcast)  ⋈ basics (fact)
  *     → filter category ∈ {actor, actress}              (P4)
  *     → select (originalTitle, primaryName)             (P1-P3)
  *
  * Scale design:
  *  - `names` at full IMDB scale is ~13M short rows — small enough to
  *    broadcast at 100 TB fact scale; if it ever outgrows the broadcast
  *    threshold, AQE falls back to shuffle join without a code change
  *    (we hint, not force);
  *  - principals ⋈ basics is a fact-fact equi-join on `tconst`; both
  *    sides shuffle-partition on the same key — the Spark-managed
  *    equivalent of the reference routing both files with phash2 on
  *    column 1 (dataInit.erl:155-156);
  *  - dangling principals (unknown nconst) drop via inner-join
  *    semantics (P5); titles with no surviving cast never appear (P6) —
  *    both automatic, no imperative cleanup pass;
  *  - the result persists once and serves every query (the two ETS
  *    tables of the reference are just the two orientations of this
  *    one edge list).
  */
object EdgeBuilder {

  val actorCategories: Seq[String] = Seq("actor", "actress")

  /** Build the edge table from the three raw TSVs. Movie identity is
    * `originalTitle` at the API surface (server.erl:264) but the join
    * runs on `tconst` (SURVEY.md §7 deviation 6 — title collisions do
    * not silently merge casts mid-join). */
  def edges(s: SparkSession, basicsPath: String, principalsPath: String,
      namesPath: String): DataFrame = {
    val basics = ImdbTsv.basics(s, basicsPath)
      .select(col("tconst"), col("originalTitle"))
    val principals = ImdbTsv.principals(s, principalsPath)
      .filter(col("category").isin(actorCategories: _*))        // P4
      .select(col("tconst"), col("nconst"))
    val names = ImdbTsv.names(s, namesPath)
      .select(col("nconst"), col("primaryName"))

    principals
      .join(broadcast(names), "nconst")                          // J1
      .join(basics, "tconst")                                    // J2
      .select(col("originalTitle").as("title"), col("primaryName").as("name"))
      .distinct()
  }

  /** Edge table from the pre-joined step0 file. */
  def edgesFromPrejoined(s: SparkSession, path: String): DataFrame =
    ImdbTsv.prejoined(s, path).distinct()

  /** A1 / titles_db query form: title → sorted cast list
    * (collect order canonicalized per SURVEY.md §7 deviation 2). */
  def titleToCast(edges: DataFrame): DataFrame =
    edges.groupBy("title")
      .agg(array_sort(collect_list("name")).as("cast"))

  /** A2 / actors_db: name → sorted title list (the inverted index,
    * server.erl:117-122). */
  def nameToTitles(edges: DataFrame): DataFrame =
    edges.groupBy("name")
      .agg(array_sort(collect_list("title")).as("titles"))

  /** Materialize for repeated queries: the cache()+count() barrier is
    * the entire stop_init protocol (master.erl:133, server.erl:154-199). */
  def materialize(edges: DataFrame): DataFrame = {
    val e = edges.persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    e
  }
}
