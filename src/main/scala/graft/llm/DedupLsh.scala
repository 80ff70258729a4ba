package graft.llm

import graft.ops.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication for a training-data pipeline.
  *
  * Exact dedup is a hash-groupBy (one shuffle on the digest).
  * Near-dup detection is MinHash + banded LSH: shingle → per-seed
  * min-hash → band keys → bucket self-join → Jaccard verify. The only
  * joins are equi-joins on band keys, so no stage is O(n²) — candidate
  * generation scales with bucket occupancy, not with |corpus|², which
  * is the property that survives 100 TB.
  *
  * Portability trick: a "hash" here is the md5 hex string and MinHash
  * takes the lexicographic minimum — md5 is identical everywhere, so
  * the DuckDB oracle can replay signatures bit-for-bit (a numeric
  * xxhash/murmur would be Spark-only).
  */
object DedupLsh {

  /** Exact dedup: keep the lowest id per content digest. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__digest", md5(col(textCol)))
      .groupBy(col("__digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__digest")

  /** Word n-gram shingle set (distinct). */
  def shingles(textCol: Column, n: Int = 3): Column =
    array_distinct(Text.ngrams(split(textCol, "\\s+"), n))

  /** MinHash signature: for seed s, min over shingles of
    * md5("s|" + shingle); one array column of `numHashes` hex strings. */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(sh, x => md5(concat(lit(s + "|"), x))))
    }: _*)

  /** Band keys: `numBands` groups of `rowsPerBand` signature entries,
    * each concatenated to one bucket key (prefixed with the band index
    * so buckets from different bands never collide). */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      concat_ws("#", (lit(b.toString) +:
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1))): _*)
    }: _*)

  /** Distinct Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Near-dup pairs via banded LSH + Jaccard verification.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 12,
      numBands: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val withSh = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", shingles(col("text"), shingleN))
      .filter(size(col("sh")) > 0)
    val withBands = withSh
      .withColumn("band", explode(bandKeys(minhashSignature(col("sh"), numHashes), numBands, rowsPerBand)))
    val a = withBands.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withBands.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash fingerprint, `bits` wide: bit j of token t is the high
    * bit of hex digit j of md5(t); the fingerprint bit is the sign of
    * the ±1 vote sum over tokens. Near-dups then cluster by fingerprint
    * (optionally with banded sub-keys for hamming tolerance). */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(col(textCol), "\\s+")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = (0 until bits).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"b$j")
    }
    val agg = toks.groupBy(col("id")).agg(votes.head, votes.tail: _*)
    agg.select(col("id"),
      concat((0 until bits).map(j => when(col(s"b$j") > 0, "1").otherwise("0")): _*)
        .as("simhash"))
  }
}
