package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes — the quality/domain classifier
  * rung of a curation pipeline (the role fastText linear classifiers
  * play in CCNet/GPT-3-style stacks: train on a small labeled seed,
  * score the whole corpus). NB is the Spark-native choice for that
  * slot because training IS aggregation: class-conditional term counts
  * and priors are one groupBy each — no gradient loop, no driver-side
  * model state beyond K class rows — and scoring is one vocabulary
  * join + hash aggregate.
  *
  * Cross-engine exactness follows the repo's micro-nat convention
  * (see [[Corpus.unigramLogProb]]): every log-probability is
  * `floor(ln(p)·1e6)` on a BIGINT, per-doc scores are integer sums,
  * and the argmax tie-breaks on the class code — so the DuckDB oracle
  * replays predictions bit-for-bit.
  *
  * Scale shape (100 TB corpus, seed ≪ corpus, K classes small):
  *  - one staged (doc, term, tf) aggregate feeds BOTH training and
  *    scoring (persisted fan-out; the explode never runs twice);
  *  - the model is a PIVOTED vocab-sized table — one row per term
  *    with K smoothed log-likelihood columns — so the scoring join
  *    moves |doc-term pairs| rows, never pairs×K (a dense-grid
  *    formulation expanding to pairs×K rows measured 1.3–3.1× slower
  *    at 1M docs depending on the argmax — see the formulation table
  *    and the GC-sensitivity grid in PROBES.md);
  *  - per-doc scores are K map-side-combinable SUM columns; the
  *    argmax is a per-row `array_min` over K (−score, class) structs
  *    — no window, no second shuffle;
  *  - class metadata (count, total, prior) is collected to the driver
  *    as K rows — the documented O(#strata) driver-bound convention —
  *    and re-enters the plan only as literals.
  */
object Classifier {

  /** Train multinomial NB (add-1 smoothing over the training
    * vocabulary) on rows where `seedLabel` is non-null; score EVERY
    * doc. Returns one row per input doc:
    * (idCol, pred, score_micro, n_scored) where `pred` is the
    * max-posterior class (ties → lexicographically first class),
    * `score_micro` = prior + Σ tf·lnP(term|class) in micro-nats, and
    * `n_scored` counts in-vocabulary token instances (out-of-vocab
    * terms contribute equal smoothing mass to every class, so
    * dropping them is argmax-invariant AND shuffle-minimal). */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 seedLabel: Column): DataFrame = {
    val tf = docs
      .select(col(idCol), seedLabel.as("__lbl"),
        explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("__lbl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // --- training: vocab-sized aggregates off the staged tf, plus a
    // K-row driver collect for the class constants ---
    val classTerm = tf.filter(col("__lbl").isNotNull)
      .groupBy(col("__lbl").as("cls"), col("term"))
      .agg(sum(col("tf")).as("c"))
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
    // K rows + 1 scalar to the driver; everything else stays
    // distributed. The class list comes from PRIORS (left join), not
    // from token counts: a seed class whose docs carry zero
    // in-vocabulary tokens still competes with prior + smoothed
    // 1/(0+V) likelihoods — dropping it would diverge from the oracle
    val classInfo = priors.join(classTot, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("n_cls"), lit(0L)).as("n_cls"),
        col("prior_micro"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(classInfo.nonEmpty, "naiveBayes needs at least one seed class")
    classInfo.foreach { case (c, _, _) =>
      require(!c.contains("`"), s"class label not column-safe: $c") }
    val vocabSize = classTerm.agg(countDistinct(col("term"))).collect()(0).getLong(0)

    // pivoted model: one row per term, K smoothed lp columns
    val lpCols = classInfo.map { case (c, nCls, _) =>
      floor(log((coalesce(col(s"`$c`"), lit(0L)) + 1).cast("double") /
        lit(nCls + vocabSize)) * 1e6).cast("long").as(s"__lp_$c")
    }
    val model = classTerm.groupBy("term")
      .pivot("cls", classInfo.map(_._1).toSeq).sum("c")
      .select((col("term") +: lpCols).toIndexedSeq: _*)

    // --- scoring: ONE pairs-sized join, one hash agg, row-local argmax
    val sumCols = classInfo.map { case (c, _, _) =>
      sum(col("tf") * col(s"__lp_$c")).as(s"__s_$c") } :+
      sum(col("tf")).as("n_scored")
    // persisted: feeds the argmax projection AND the missing-doc
    // anti-join below — doc-sized and narrow (K+2 longs per row)
    val scored = tf.join(model, "term")
      .groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail.toIndexedSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = array(classInfo.map { case (c, _, prior) =>
      struct(((col(s"__s_$c") + prior) * -1).as("neg"), lit(c).as("cls"))
    }.toIndexedSeq: _*)
    val best = scored
      .withColumn("__best", array_min(candidates))
      .select(col(idCol), col("__best.cls").as("pred"),
        (col("__best.neg") * -1).as("score_micro"), col("n_scored"))
    // docs with no in-vocabulary token score prior-only: the argmax is
    // the max-prior class (tie → first class code) — a constant,
    // precomputed from the K driver rows
    val (pCls, _, pMicro) = classInfo.minBy { case (c, _, p) => (-p, c) }
    val missing = docs.select(col(idCol))
      .join(scored.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), lit(pCls).as("pred"),
        lit(pMicro).as("score_micro"), lit(0L).as("n_scored"))
    val out = best.unionByName(missing)
    graft.Caching.releaseAfterFirstUse(out, tf, scored)
  }
}
