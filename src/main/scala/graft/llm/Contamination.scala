package graft.llm

import graft.ops.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection — the pre-training hygiene step
  * the dedup family doesn't cover: find corpus documents that share
  * enough word n-grams with an EVAL/benchmark set that training on
  * them would leak the test set (the n-gram overlap rule used by GPT-3
  * §C / PaLM / Llama contamination analyses; public methodology).
  *
  * Shape: both sides shingle (distinct word n-grams per doc), explode,
  * and equi-join on the gram — candidate cost ∝ posting-list products,
  * never |corpus| × |eval|. Two guards keep that bounded at 100 TB:
  *   - grams whose CORPUS document frequency exceeds `maxDf` are
  *     dropped before the join (boilerplate phrases — "all rights
  *     reserved" — would otherwise join every doc to every eval doc);
  *     df is one extra hash agg over the exploded grams, and the
  *     filter is replayed identically in the SQL oracle;
  *   - the eval side is small by definition (a benchmark), so its
  *     exploded grams broadcast.
  * One shuffle for the gram join (broadcast eval), one for the
  * per-(doc, eval) overlap count.
  */
object Contamination {

  /** (doc_id, eval_id, shared_grams) for every corpus×eval pair sharing
    * at least `minShared` distinct n-grams after the df cap.
    *
    * Join order matters at scale: the BROADCAST eval-gram semi-join
    * runs FIRST, so the full corpus gram table is filtered map-side and
    * never shuffles — only grams that exist in the (small) eval set
    * survive. The document-frequency cap is then computed over that
    * restricted set, which yields the same df values for every eval
    * gram as a full-corpus count would (grams outside the eval set can
    * never reach the output). The corpus is split+shingled exactly
    * once. */
  def overlapPairs(corpus: DataFrame, eval: DataFrame,
                   idCol: String, textCol: String, evalIdCol: String,
                   n: Int = 3, minShared: Int = 2, maxDf: Long = 50L): DataFrame = {
    def grams(df: DataFrame, id: String, out: String): DataFrame =
      df.select(col(id), split(col(textCol), "\\s+").as("tk"))
        .select(col(id), explode(DedupLsh.shinglesFromTokens(col("tk"), n)).as(out))
    val eg = grams(eval, evalIdCol, "g")
    // corpus grams restricted to the eval gram set — map-side via the
    // broadcast semi-join; one row per (corpus doc, eval gram) since
    // per-doc shingles are distinct
    val hits = grams(corpus, idCol, "g")
      .join(broadcast(eg.select(col("g")).distinct()), Seq("g"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // df cap over the restricted set: grams above it are boilerplate
    // ("all rights reserved") that would join every doc to every eval doc
    val rare = hits.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("g"))
    val out = hits.join(broadcast(rare), Seq("g"))
      .join(broadcast(eg), Seq("g"))
      .groupBy(col(idCol), col(evalIdCol))
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
    // the restricted gram table releases on the caller's first
    // materialization (graft.Caching contract)
    graft.Caching.releaseAfterFirstUse(out, hits)
  }

  /** Stage the corpus n-gram INVERTED INDEX for contamination
    * screening: one row per (gram, doc_id) posting with the gram's
    * full-corpus document frequency denormalized on (RLE-compresses to
    * nothing clustered by gram), hive-partitioned by a gram-hash
    * bucket. This is the x14b/x17b materialize-once split applied to
    * x12: the corpus side of a contamination sweep — tokenize, shingle,
    * df-count the whole corpus — re-ran per screened benchmark; with
    * the index staged, screening a new eval set scans posting rows
    * instead of text. MEASURED HONESTLY at 1M (probe_x12b_staged_grams
    * _1m.sc): per-screen wall is PARITY with the direct path, not a
    * win — contamination's corpus-linear term is cheap (tokenize +
    * shingle, no hashing; unlike the minhash/simhash stages the other
    * staged twins remove), and the posting table is text-sized. What
    * staging genuinely buys: (a) screening WITHOUT RETAINING RAW TEXT —
    * a corpus whose text is redacted/deleted after ingest stays
    * screenable; (b) df computed once per snapshot instead of per
    * screen; (c) the bucket layout prunes when a benchmark's gram set
    * touches few of `nBuckets` partitions — and nBuckets must stay
    * LISTING-cheap (the probe measured 7.7 s just to list a 4096-dir
    * layout; the 64 default keeps the per-screen listing trivial, and
    * realistic benchmarks hash-spread across buckets anyway). df
    * stored is the
    * FULL-corpus value — identical to what the direct path computes on
    * its eval-restricted set, since restricting by gram identity keeps
    * every posting of a surviving gram. `n`/`nBuckets` are stamped and
    * require()d at serve time (a mismatched n would silently screen
    * with different-width shingles — the PQ index_params convention). */
  def stageCorpusGrams(corpus: DataFrame, path: String, idCol: String,
                       textCol: String, n: Int = 3, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    val g = corpus.select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("tk"))
      .select(col("doc_id"), explode(DedupLsh.shinglesFromTokens(col("tk"), n)).as("g"))
    // df via an unbounded window over the gram partition: one sort
    // shuffle, streams per-gram (a collect_list agg would buffer a
    // stop-word gram's whole posting list in one task's memory)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    graft.io.Staging.publish(spark, path) { tmp =>
      g.withColumn("df", count(lit(1)).over(w))
        .withColumn("bucket", pmod(xxhash64(col("g")), lit(nBuckets.toLong)))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$tmp/postings")
      Seq((n, nBuckets)).toDF("n", "n_buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/gram_params")
    }
  }

  /** [[overlapPairs]] against a [[stageCorpusGrams]] artifact: same
    * output, same df-cap semantics, but the corpus side is a
    * (bucket-pruned, df-pushed) scan of the staged postings instead of
    * a full re-tokenize + re-shingle + df-count per screened benchmark.
    * The df cap lands directly on the parquet scan (PushedFilters); the
    * eval grams' buckets are collected to the driver — O(|eval grams|)
    * values, benchmark-sized — and inlined as a partition IN filter. */
  def overlapPairsStaged(spark: org.apache.spark.sql.SparkSession, path: String,
                         eval: DataFrame, evalIdCol: String, textCol: String,
                         n: Int = 3, minShared: Int = 2, maxDf: Long = 50L): DataFrame = {
    val live = graft.io.Staging.resolveRead(spark, path)
    val params = spark.read.parquet(s"$live/gram_params").collect()
    require(params.nonEmpty, s"gram index at $path has no gram_params stamp — rebuild")
    val builtN = params(0).getAs[Int]("n")
    require(builtN == n,
      s"gram index at $path was built with n=$builtN but queried with n=$n — " +
        "shingle widths would silently disagree; rebuild or match n")
    val nBuckets = params(0).getAs[Int]("n_buckets")
    val eg = eval.select(col(evalIdCol), split(col(textCol), "\\s+").as("tk"))
      .select(col(evalIdCol), explode(DedupLsh.shinglesFromTokens(col("tk"), n)).as("g"))
      .localCheckpoint() // eager, eval-sized: bucket collect + two joins reuse it
    val buckets = eg
      .select(pmod(xxhash64(col("g")), lit(nBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).sorted
    val posts = spark.read.parquet(s"$live/postings")
      .filter(col("bucket").isin(buckets.toSeq: _*))
      .filter(col("df") <= maxDf)
    // no semi-join prefix here: the direct path needs one to restrict
    // BEFORE its df aggregation, but df is precomputed in the postings,
    // so the inner eval-gram join below is the whole restriction — a
    // semi first would be one redundant broadcast probe per posting row
    // (round-16 review finding)
    posts
      .join(broadcast(eg), Seq("g"))
      .groupBy(col("doc_id"), col(evalIdCol))
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
  }

  /** Gopher/C4-style intra-document repetition signal: the fraction of
    * word n-grams that are duplicates of an earlier n-gram in the same
    * document (0.0 for docs shorter than n tokens). High values mark
    * boilerplate/spam for the curation funnel. `tk` MUST be a staged
    * token-array attribute (HOF subexpression-elimination trap — see
    * Text.ngrams). */
  def repetitionRatio(tk: Column, n: Int = 3): Column = {
    val grams = Text.ngrams(tk, n)
    val total = size(grams).cast("double")
    when(total > 0, lit(1.0) - size(array_distinct(grams)).cast("double") / total)
      .otherwise(lit(0.0))
  }
}
