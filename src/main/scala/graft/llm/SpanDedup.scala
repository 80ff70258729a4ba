package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-SPAN deduplication — the "dedup the repeated span,
  * not the whole document" method of Lee et al., *Deduplicating
  * Training Data Makes Language Models Better* (ACL 2022). The paper
  * builds a corpus-wide suffix array; that structure is inherently
  * single-machine. The Spark-first equivalent keeps the same output
  * contract (maximal repeated token spans per document) from three
  * bucketed, shuffle-friendly stages:
  *
  *   1. hash every k-token sliding window (md5 of the space-joined
  *      window — replayable in any engine);
  *   2. one groupBy on the window hash — the inverted index — keeps
  *      hashes occurring ≥ 2 times corpus-wide (covers cross-doc AND
  *      intra-doc repetition, as the suffix-array method does);
  *   3. a left-semi join back to window positions, then per-document
  *      gaps-and-islands (windows whose starts are ≤ k apart overlap
  *      or touch, so they coalesce into one maximal span).
  *
  * Scale shape at 100 TB: stage 1 is narrow (per-doc); stage 2 is one
  * shuffle keyed by content hash — uniform by construction, and the
  * count aggregate is tiny per key no matter how hot the window
  * (boilerplate headers hit one reducer key with a partial-aggregated
  * count, never a row explosion); stage 3's semi join keys on the same
  * hash and the island window partitions by doc_id, whose size is
  * bounded by document length, not corpus size. Nothing is all-pairs
  * and no stage holds a corpus-sized structure in one task — the
  * property the suffix array lacks.
  *
  * Reference scope: the reference pipeline (dwh_lab) dedups whole rows
  * (`preprocessing_batch_load.py` drop_duplicates); span-level dedup is
  * part of the LLM-pipeline extension brief, not a reference port.
  */
object SpanDedup {

  /** (doc_id, pos, h): md5 of each k-token window, pos = 1-based token
    * index of the window start. Docs shorter than k tokens emit no
    * rows. Tokens are raw whitespace splits — span dedup must see
    * stopwords and punctuation, or removed spans would not reassemble. */
  def windowHashes(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // spread the CPU-dense window pass (each doc computes n-k+1 md5s
    // over k-token joins) across cores: a small corpus arrives as 1-2
    // scan splits and the whole hash pass lands on those tasks
    // (measured 1.3 s -> 0.7 s at sf0.1); skipped via plan-stats guard
    // when the scan already has >= parallelism splits (any real-scale
    // corpus) — the shingleTable/spreadForCpu rule applied here
    graft.ops.Partitions.spreadForCpu(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")))
      .select(col("doc_id"), split(col("__text"), "\\s+").as("tk"))
      // guard the short-doc case explicitly: Spark's sequence(1, n)
      // DESCENDS for n < 1 (sequence(1,0) = [1,0]), it is not empty
      .select(col("doc_id"),
        posexplode(when(size(col("tk")) >= k,
          transform(sequence(lit(1), size(col("tk")) - (k - 1)),
            i => md5(concat_ws(" ", slice(col("tk"), i, lit(k))))))
          .otherwise(typedLit(Seq.empty[String]))))
      // posexplode is 0-based over the generated list; window start is
      // the 1-based token index
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("h"))
  }

  /** Gaps-and-islands merge of window-start hits into maximal spans:
    * starts ≤ k apart overlap or touch, so they coalesce. The window
    * partitions by doc_id — bounded by document length, never corpus
    * size. */
  private def islandSpans(hits: DataFrame, k: Int): DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byPos) <= k, lit(0L)).otherwise(lit(1L)))
      .withColumn("island", sum("brk").over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"), (max("pos") + (k - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** Maximal duplicated token spans per document: (doc_id, span_start,
    * span_end), token indices 1-based inclusive. A window counts as
    * duplicated when its hash occurs ≥ 2 times anywhere in the corpus. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // fan-out point: the inverted index AND the position join both
    // consume the window hashes — persisted (spillable) so the text
    // scan + tokenize + 53-per-doc md5 pass runs once, not twice
    val wins = windowHashes(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // inverted index: map-side partial count, one shuffle on the hash
    val dup = wins.groupBy("h").agg(count(lit(1)).as("n")).filter(col("n") >= 2).select("h")
    val hits = wins.join(dup, Seq("h"), "left_semi").select("doc_id", "pos")
    islandSpans(hits, k)
  }

  /** Spans to CUT under the keep-one-copy policy: for every duplicated
    * window hash the globally first occurrence (min (doc_id, pos)) is
    * canonical and stays; all later occurrences become removal hits,
    * island-merged per doc. The canonical pick is a min(struct) hash
    * aggregate — partial-aggregated and skew-safe (a boilerplate
    * window occurring 10M times folds to one struct per partition,
    * never 10M rows on one reducer the way a rank-per-hash window
    * would). */
  def removalSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val wins = windowHashes(docs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = wins.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("c"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("h"), col("c.doc_id").as("c_doc"), col("c.pos").as("c_pos"))
    val hits = wins.join(canon, Seq("h"))
      .filter((col("doc_id") =!= col("c_doc")) || (col("pos") =!= col("c_pos")))
      .select("doc_id", "pos")
    islandSpans(hits, k)
  }

  /** Apply step — the corpus a training pipeline actually keeps:
    * every document with its [[removalSpans]] cut out, reconstructed
    * from the surviving tokens. Per-doc span lists ride a collect_list
    * bounded by document length; the cut itself is a pure higher-order
    * Column expression (no shuffle past the span join). */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    applySpanCuts(docs, idCol, textCol, removalSpans(docs, idCol, textCol, k))

  /** Cut an arbitrary (doc_id, span_start, span_end) list out of the
    * documents — the shared apply step behind [[removeDuplicatedSpans]]
    * (keep-one-copy cuts) and [[removeCrossDuplicatedSpans]]
    * (corpus-known cuts). Per-doc span lists ride a collect_list
    * bounded by document length; the cut itself is a pure higher-order
    * Column expression (no shuffle past the span join). */
  def applySpanCuts(docs: DataFrame, idCol: String, textCol: String,
                    spans: DataFrame): DataFrame = {
    val sp = spans
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e"))).as("sp"))
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("tk"))
      .join(sp, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("tk"),
        coalesce(col("sp"), typedLit(Seq.empty[(Long, Long)])
          .cast("array<struct<s:bigint,e:bigint>>")).as("sp"))
      .select(col("doc_id"),
        filter(transform(col("tk"), (t, i) =>
          when(!exists(col("sp"), p => (i + 1) >= p("s") && (i + 1) <= p("e")), t)),
          _.isNotNull).as("kept"))
      .select(col("doc_id"),
        concat_ws(" ", col("kept")).as("cleaned_text"),
        size(col("kept")).cast("long").as("n_kept"))
  }

  /** Incremental twin of [[duplicatedSpans]]: spans of BATCH documents
    * whose k-token windows already occur in the CORPUS. The corpus
    * side arrives as its distinct window-hash SET — the staged
    * artifact a production pipeline materializes once per snapshot
    * (the corpusBandSignatures pattern) — so each ingest batch probes
    * the artifact with one hash-keyed semi join and the corpus text is
    * never re-tokenized per batch. Batch-internal repetition is
    * deliberately NOT flagged here (that's [[duplicatedSpans]] run on
    * the batch); this operator answers "which parts of the new data
    * already exist in the corpus". */
  def crossDuplicatedSpans(batch: DataFrame, corpusHashes: DataFrame,
                           idCol: String, textCol: String, k: Int): DataFrame = {
    val hits = windowHashes(batch, idCol, textCol, k)
      .join(corpusHashes.select("h"), Seq("h"), "left_semi")
      .select("doc_id", "pos")
    islandSpans(hits, k)
  }

  /** Incremental APPLY — the ingest batch a pipeline actually keeps:
    * every batch document with its CORPUS-KNOWN spans
    * ([[crossDuplicatedSpans]]) cut out. "Never re-ingest what the
    * corpus already has, at substring granularity": exact duplicates
    * come back empty, partially-overlapping docs keep only their novel
    * content, fresh docs pass through intact. No keep-one-copy pick is
    * needed — the surviving copy is the corpus's, by construction. */
  def removeCrossDuplicatedSpans(batch: DataFrame, corpusHashes: DataFrame,
                                 idCol: String, textCol: String, k: Int): DataFrame =
    applySpanCuts(batch, idCol, textCol,
      crossDuplicatedSpans(batch, corpusHashes, idCol, textCol, k))

  /** The corpus window-hash set for [[crossDuplicatedSpans]] — write
    * this once per snapshot. Thin by construction: one 32-hex row per
    * DISTINCT window, and the downstream consumer only ever semi-joins
    * it on `h`. */
  def corpusWindowHashSet(corpus: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame =
    windowHashes(corpus, idCol, textCol, k).select("h").distinct()

  /** Per-document duplication accounting over [[duplicatedSpans]]:
    * token count, tokens covered by duplicated spans, micro-fraction
    * (integer ppm — cross-engine exact, no float summing), span count.
    * Documents with no duplicated span report zeros. */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, k)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + 1).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    docs
      .select(col(idCol).as("doc_id"),
        size(split(col(textCol), "\\s+")).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        floor(coalesce(col("dup_tokens"), lit(0L)) * lit(1000000L) / col("n_tokens"))
          .cast("long").as("dup_frac_micro"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
