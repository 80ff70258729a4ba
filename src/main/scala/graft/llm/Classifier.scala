package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes — the quality/domain classifier
  * rung of a curation pipeline (the role fastText linear classifiers
  * play in CCNet/GPT-3-style stacks: train on a small labeled seed,
  * score the whole corpus). NB is the Spark-native choice for that
  * slot because training IS aggregation: class-conditional term counts
  * and priors are one groupBy each — no gradient loop, no driver-side
  * model state — and scoring is one vocabulary join + hash aggregate.
  *
  * Cross-engine exactness follows the repo's micro-nat convention
  * (see [[Corpus.unigramLogProb]]): every log-probability is
  * `floor(ln(p)·1e6)` on a BIGINT, per-doc scores are integer sums,
  * and the argmax tie-breaks on the class code — so the DuckDB oracle
  * replays predictions bit-for-bit.
  *
  * Scale shape (100 TB corpus, seed ≪ corpus):
  *  - one staged (doc, term, tf) aggregate feeds BOTH training and
  *    scoring (persisted fan-out; the explode never runs twice);
  *  - training tables are vocab-sized (|V|·K rows for the smoothed
  *    grid, K = #classes — small); totals/priors broadcast as 1-row
  *    frames;
  *  - the scoring join is term-keyed over (doc, term) PAIRS, never
  *    token instances, and drops out-of-vocabulary terms before the
  *    shuffle (an OOV term contributes equal smoothing mass to every
  *    class, so dropping it is argmax-invariant AND shuffle-minimal);
  *  - the argmax window partitions by doc id — K rows per partition
  *    key, no skew possible.
  */
object Classifier {

  /** Train multinomial NB (add-1 smoothing over the training
    * vocabulary) on rows where `seedLabel` is non-null; score EVERY
    * doc. Returns one row per input doc:
    * (idCol, pred, score_micro, n_scored) where `pred` is the
    * max-posterior class (ties → lexicographically first class),
    * `score_micro` = prior + Σ tf·lnP(term|class) in micro-nats, and
    * `n_scored` counts in-vocabulary token instances. */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 seedLabel: Column): DataFrame = {
    val tf = docs
      .select(col(idCol), seedLabel.as("__lbl"),
        explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("__lbl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // --- training: all vocab-sized aggregates off the staged tf ---
    val trainTf = tf.filter(col("__lbl").isNotNull)
    val classTerm = trainTf.groupBy(col("__lbl").as("cls"), col("term"))
      .agg(sum(col("tf")).as("c"))
    // class priors from seed DOC counts (not token counts)
    val priors = docs.select(col(idCol), seedLabel.as("cls"))
      .filter(col("cls").isNotNull)
      .groupBy("cls").agg(count(lit(1)).as("d"))
      .crossJoin(broadcast(
        docs.select(seedLabel.as("c2")).filter(col("c2").isNotNull)
          .agg(count(lit(1)).as("d_tot"))))
      .select(col("cls"),
        floor(log(col("d").cast("double") / col("d_tot")) * 1e6)
          .cast("long").as("prior_micro"))
    val classTot = classTerm.groupBy("cls").agg(sum(col("c")).as("n_cls"))
    val vocabSize = classTerm.select(countDistinct(col("term")).as("v"))
    // dense |V|·K grid: every (term, class) gets an add-1 smoothed
    // log-likelihood, absent counts drawing only smoothing mass
    val grid = classTerm.select("term").distinct()
      .crossJoin(broadcast(classTot))
      .join(classTerm, Seq("term", "cls"), "left")
      .crossJoin(broadcast(vocabSize))
      .select(col("term"), col("cls"),
        floor(log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n_cls") + col("v"))) * 1e6).cast("long").as("lp_micro"))

    // --- scoring: one term-keyed join, one hash agg, one window ---
    val docScores = tf.join(grid, "term") // inner: OOV terms argmax-invariant
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("tf") * col("lp_micro")).as("ll_micro"),
        sum(col("tf")).as("n_scored"))
    val full = docs.select(col(idCol))
      .crossJoin(broadcast(priors)) // K rows per doc: prior-only floor
      .join(docScores, Seq(idCol, "cls"), "left")
      .select(col(idCol), col("cls"),
        (col("prior_micro") + coalesce(col("ll_micro"), lit(0L))).as("score_micro"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"))
    val best = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("cls").asc)
    val out = full
      .withColumn("__rn", row_number().over(best)).filter(col("__rn") === 1)
      .select(col(idCol), col("cls").as("pred"), col("score_micro"), col("n_scored"))
    graft.Caching.releaseAfterFirstUse(out, tf)
  }
}
