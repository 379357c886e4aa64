package graft.schemas

import org.apache.spark.sql.types._

/** Typed schemas for the three IMDB TSV dumps the reference ingests
  * (SURVEY.md §1.1; reference README.md:62-89). Explicit StructTypes so
  * the CSV reader never falls back to schema inference (a full-dataset
  * scan at 100 TB), and comma-joined array columns are modeled as real
  * arrays after parse.
  */
object Imdb {

  /** `title.basics` — 9 columns (reference basic1000.tsv, parsed at
    * server.erl:261-268). */
  val basicsSchema: StructType = StructType(Seq(
    StructField("tconst", StringType, nullable = false),
    StructField("titleType", StringType),
    StructField("primaryTitle", StringType),
    StructField("originalTitle", StringType),
    StructField("isAdult", IntegerType),
    StructField("startYear", IntegerType),
    StructField("endYear", IntegerType),
    StructField("runtimeMinutes", IntegerType),
    StructField("genres", StringType)))  // comma-joined; split post-read

  /** `title.principals` — 6 columns (parsed at server.erl:277-282). */
  val principalsSchema: StructType = StructType(Seq(
    StructField("tconst", StringType, nullable = false),
    StructField("ordering", IntegerType),
    StructField("nconst", StringType),
    StructField("category", StringType),
    StructField("job", StringType),
    StructField("characters", StringType)))

  /** `name.basics` — 6 columns, NO header row in the sample file
    * (parsed at dataInit.erl:196-200; the reference's header-skip bug
    * drops the first record — we read it correctly, SURVEY §7 dev. 3). */
  val namesSchema: StructType = StructType(Seq(
    StructField("nconst", StringType, nullable = false),
    StructField("primaryName", StringType),
    StructField("birthYear", IntegerType),
    StructField("deathYear", IntegerType),
    StructField("primaryProfession", StringType),
    StructField("knownForTitles", StringType)))

  /** Pre-joined `step0` format: `originalTitle \t actor1,actor2,...`
    * (sort_data.py:17-19, server.erl:111-124). */
  val prejoinedSchema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("cast", StringType)))

  /** Typed row for the reference's #title record (server.erl:28). */
  final case class Title(
      id: Int,
      title: String,
      titleType: String,
      genres: Seq[String])

  /** One edge of the bipartite actor↔movie graph — the single structure
    * both ETS tables of the reference derive from (SURVEY.md §1.3). */
  final case class Edge(title: String, name: String)
}
