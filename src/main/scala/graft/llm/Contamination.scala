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
