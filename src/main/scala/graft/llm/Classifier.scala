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
    val (model, classInfo, _) = trainFromTf(docs, seedLabel, tf)
    val (out, scored) =
      scoreTail(docs, idCol, tf, model, classInfo.map(c => (c._1, c._3)))
    graft.Caching.releaseAfterFirstUse(out, tf, scored)
  }

  /** Training core off a staged (id, __lbl, term, tf) frame: the
    * pivoted model plus the K-row class constants.
    * Returns (model, classInfo = (cls, n_cls, prior_micro) sorted by
    * cls, vocabSize). */
  private def trainFromTf(docs: DataFrame, seedLabel: Column,
      tf: DataFrame): (DataFrame, Array[(String, Long, Long)], Long) = {
    val classTerm = tf.filter(col("__lbl").isNotNull)
      .groupBy(col("__lbl").as("cls"), col("term"))
      .agg(sum(col("tf")).as("c"))
    val priors = docs.select(seedLabel.as("cls"))
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
    (model, classInfo, vocabSize)
  }

  /** Shared scoring tail: ONE pairs-sized vocabulary join, one hash
    * agg, row-local argmax, prior-only rows for docs with no
    * in-vocabulary token. `classInfo` is (cls, prior_micro) sorted by
    * cls; `tf` is a persisted (id, [.,] term, tf) frame. Returns
    * (result, the internal persisted doc-score frame) — the caller
    * owns the release. */
  private def scoreTail(docs: DataFrame, idCol: String, tf: DataFrame,
      model: DataFrame, classInfo: Seq[(String, Long)])
      : (DataFrame, DataFrame) = {
    val sumCols = classInfo.map { case (c, _) =>
      sum(col("tf") * col(s"__lp_$c")).as(s"__s_$c") } :+
      sum(col("tf")).as("n_scored")
    // persisted: feeds the argmax projection AND the missing-doc
    // anti-join below — doc-sized and narrow (K+2 longs per row)
    val scored = tf.join(model, "term")
      .groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail.toIndexedSeq: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = array(classInfo.map { case (c, prior) =>
      struct(((col(s"__s_$c") + prior) * -1).as("neg"), lit(c).as("cls"))
    }.toIndexedSeq: _*)
    val best = scored
      .withColumn("__best", array_min(candidates))
      .select(col(idCol), col("__best.cls").as("pred"),
        (col("__best.neg") * -1).as("score_micro"), col("n_scored"))
    // docs with no in-vocabulary token score prior-only: the argmax is
    // the max-prior class (tie → first class code) — a constant,
    // precomputed from the K driver rows
    val (pCls, pMicro) = classInfo.minBy { case (c, p) => (-p, c) }
    val missing = docs.select(col(idCol))
      .join(scored.select(col(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), lit(pCls).as("pred"),
        lit(pMicro).as("score_micro"), lit(0L).as("n_scored"))
    (best.unionByName(missing), scored)
  }

  /** Train-only: the NB model in its MATERIALIZE-ONCE form — the
    * train-once/serve-many split every production curation stack runs
    * (the classifier trains on the small labeled seed offline; scoring
    * sweeps the 100 TB corpus, and every later ingest batch, against
    * the frozen model). Returns two tables to persist per model
    * version:
    *  - terms: one row per vocabulary term with K smoothed
    *    log-likelihood columns (`__lp_<cls>`) — vocabulary-sized;
    *  - classes: K rows (cls, n_cls, prior_micro, vocab_size) — the
    *    driver-side constants, stamped so scoring replays without
    *    re-scanning the seed (and so an out-of-sync terms/classes pair
    *    fails loudly in [[naiveBayesFromModel]]).
    * Only the SEED rows are tokenized here — training never scans the
    * unlabeled corpus (the combined [[naiveBayes]] stages one tf over
    * all docs because it scores them in the same pass). */
  def trainNaiveBayesModel(docs: DataFrame, idCol: String, textCol: String,
      seedLabel: Column): (DataFrame, DataFrame) = {
    val tf = docs.filter(seedLabel.isNotNull)
      .select(col(idCol), seedLabel.as("__lbl"),
        explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("__lbl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (model, classInfo, vocabSize) = trainFromTf(docs, seedLabel, tf)
    val spark = docs.sparkSession
    import spark.implicits._
    val classes = classInfo.toSeq
      .map { case (c, n, p) => (c, n, p, vocabSize) }
      .toDF("cls", "n_cls", "prior_micro", "vocab_size")
    (graft.Caching.releaseAfterFirstUse(model, tf), classes)
  }

  /** Score docs against a PRE-TRAINED model (the output of
    * [[trainNaiveBayesModel]], typically re-read from parquet):
    * identical output contract to [[naiveBayes]], but the per-batch
    * cost is tokenize + one vocabulary join — no seed scan, no
    * training aggregates, no pivot. The class constants are K rows to
    * the driver (the documented O(#strata) convention); a classes
    * table naming a class the terms table lacks a `__lp_` column for
    * fails loudly instead of scoring garbage. */
  def naiveBayesFromModel(docs: DataFrame, idCol: String, textCol: String,
      terms: DataFrame, classes: DataFrame): DataFrame = {
    val classInfo = classes.select("cls", "prior_micro").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    require(classInfo.nonEmpty,
      "naiveBayesFromModel needs a non-empty class table")
    classInfo.foreach { case (c, _) =>
      require(terms.columns.contains(s"__lp_$c"),
        s"model terms table lacks __lp_$c — the terms/classes artifacts " +
          "are out of sync; re-persist both from one training run") }
    val tf = docs
      .select(col(idCol),
        explode(TextAnalysis.regexTokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (out, scored) = scoreTail(docs, idCol, tf, terms, classInfo)
    graft.Caching.releaseAfterFirstUse(out, tf, scored)
  }
}
