package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable text primitives shared by the query catalog
  * ([[graft.operators.TextQueries]]) and the corpus-level dedup API
  * ([[graft.dedup.Dedup]]). All codegen'd `functions._` compositions —
  * no UDFs — so they inline into whole-stage codegen wherever used.
  */
object TextFunctions {

  /** Tokenize: non-whitespace runs (robust to repeated separators). */
  def words(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  /** Distinct word n-gram shingles of a tokens array. */
  def shingleArray(ws: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(ws, i + o)): _*)))

  /** Exploded distinct shingles: (idCol, shingle) rows; documents with
    * fewer than `n` words produce none. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol), words(col(textCol)).as("w"))
      .filter(size(col("w")) >= n)
      .select(col(idCol), explode(shingleArray(col("w"), n)).as("shingle"))

  /** MinHash rows: (idCol, k, mh) — K permutations simulated as keyed
    * md5, min-reduced per document with map-side partial aggregation.
    * Only 32-char digests ever shuffle, never raw text. */
  def minhashRows(sh: DataFrame, idCol: String, k: Int): DataFrame =
    sh.select(col(idCol), col("shingle"),
        explode(sequence(lit(0), lit(k - 1))).as("k"))
      .groupBy(idCol, "k")
      .agg(min(md5(concat(col("k").cast("string"), lit("|"), col("shingle")))).as("mh"))

  /** LSH band signatures: (idCol, band, sig) from minhash rows. */
  def lshBands(mh: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    mh.withColumn("band", floor(col("k") / rowsPerBand).cast("int"))
      .groupBy(idCol, "band")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("k"), col("mh")))),
          x => x.getField("mh")), "|")).as("sig"))

  /** Candidate pairs sharing any LSH band bucket: (id_a, id_b). */
  def lshCandidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("id_a"), col("band"), col("sig"))
    val b = bands.select(col(idCol).as("id_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** SimHash bit strings: per document, bit j is the sign of the
    * word-count-weighted vote of bit j across word hashes (bit j =
    * parity of hex char j of md5(word) for j < 32, of
    * md5(word || '#') for j ≥ 32). `bits` ≤ 64.
    *
    * 64 bits is the production default: 16-bit signatures (round 2's
    * parameter) saturate — 65,536 distinct values means every
    * signature is shared by millions of documents at corpus scale and
    * "near-dup" stops meaning anything. The per-word hash is 64
    * ENGINE-PORTABLE parity bits (two md5s), so the DuckDB oracle
    * computes the identical signature. Near-duplicate documents differ
    * in few bit positions (compare via Hamming distance on the
    * fixed-width string). */
  def simhashBits(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64): DataFrame =
    df.select(col(idCol), explode(words(col(textCol))).as("word"))
      .select(col(idCol),
        concat(md5(col("word")), md5(concat(col("word"), lit("#")))).as("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("j"))
      .withColumn("weight",
        (ascii(col("h").substr(col("j") + 1, lit(1))) % 2) * 2 - 1)
      .groupBy(idCol, "j")
      .agg(sum("weight").as("sw"))
      .withColumn("b", when(col("sw") > 0, "1").otherwise("0"))
      .groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("b")))),
          x => x.getField("b")), "").as("simhash"))

  /** Winnowing (Schleimer et al., SIGMOD 2003) over a k-gram hash
    * sequence: slide a window of `w` consecutive hashes and keep each
    * window's minimum — any shared substring spanning ≥ w+k-1 tokens
    * is then guaranteed to contribute at least one common fingerprint.
    * Sequences shorter than `w` yield their global minimum (one
    * window). Returns the sorted distinct local-minima array. */
  def winnowMins(hashes: Column, w: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      i => array_min(slice(hashes, i, lit(w))))))

  /** Exact shingle-set Jaccard for all pairs ≥ threshold:
    * (id_a, id_b, jaccard).
    *
    * Inverted-index shape with ONE wide shuffle: group by shingle,
    * collect the (sorted) posting list, explode its i<j combinations,
    * count per pair. This measured ~2× faster than the two-sided
    * self-join (which shuffles both sides plus the pair rows).
    * Singleton shingles drop before pair generation (they cannot form
    * a pair).
    *
    * `maxDf` is the document-frequency ceiling: shingles appearing in
    * more than `maxDf` documents are dropped BEFORE pair explosion.
    * Without it, one stop-shingle present in m documents materializes
    * an m(m-1)/2 pair array inside a single aggregation buffer — a
    * one-task OOM at web scale that no join shape fixes. The trade is
    * recall-only: per-document shingle counts stay uncapped, so
    * dropping a shared shingle can only LOWER a pair's computed
    * Jaccard (n_common undercounts, hence the derived union
    * sz_a+sz_b-n_common overcounts) — the cap can suppress true
    * near-dups whose overlap is concentrated in stop-shingles, but can
    * never manufacture a false positive. */
  def jaccardPairs(sh: DataFrame, idCol: String, threshold: Double,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val cached = sh.persist()
    val sizes = cached.groupBy(idCol).agg(count(lit(1)).as("sz"))
    cached
      .groupBy("shingle").agg(array_sort(collect_list(idCol)).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxDf)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
          struct(x.as("a"), y.as("b")))))).as("p"))
      .groupBy(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
