package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, *Product Quantization for
  * Nearest Neighbor Search*) — the memory side of the ANN story the
  * IVF family ([[Similarity.buildIvfIndex]]) leaves open: a 64-dim
  * vector stored as m=8 sub-codebook ids is 8 bytes instead of 256+,
  * a 32× compression that decides whether a 100 TB embedding store's
  * index fits the cluster at all. Asymmetric distance computation
  * (ADC) then scores query→vector WITHOUT decompressing: per query,
  * one m×numCells lookup table of exact query-subvector-to-centroid
  * distances; a vector's approximate distance is the sum of its m
  * table entries.
  *
  * Determinism contract (the repo's cross-engine rule): vectors ride
  * the 1e6 fixed-point quantization ([[Similarity.quantize]]), all
  * distances are INTEGER squared-L2 over BIGINT components (diff² ≤
  * 4·10¹², ×8 dims ≪ 2⁵³ — exact in any partial-agg order), codebook
  * init = the subvectors of `vec_id < numCells` (the IVF convention),
  * argmin tie-breaks on (distance asc, cell_id asc), and centroid
  * update is floor(Σ/n) per component. Every step replays exactly in
  * DuckDB.
  *
  * Scale shape: training iterates ONE scan of the (vec_id, s, sv)
  * sub-vector frame per round — all m subspaces train simultaneously
  * keyed by s, against broadcast per-subspace codebook arrays; the
  * argmin is the native per-row [[graft.functions.NearestCell]] loop
  * (no N·m·numCells pair explosion, no aggregate or sort of the
  * corpus); centroid updates aggregate to
  * m·numCells·dim cells. Encoding is the same broadcast argmin. ADC
  * joins the thin (vec_id, s, code) table against a broadcast LUT and
  * hash-aggregates m rows per (query, vector) — no shuffle of raw
  * vectors anywhere past the sub-vector split. Compose with the IVF
  * index to prune candidates before ADC when the corpus outgrows
  * brute-force scoring. */
object Pq {

  private val Dim = 64

  /** Integer squared-L2 between two equal-length BIGINT arrays. */
  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** (vec_id, s, sv): each quantized vector split into m contiguous
    * (Dim/m)-dim subvectors, s = 0-based subspace id. `carry` names
    * extra columns to ride along (e.g. the coarse cell_id in
    * [[ivfAdcTopK]]) — carried here rather than re-joined later so the
    * thin code table never needs a corpus-sized join to recover them. */
  private[llm] def subVectors(v: DataFrame, m: Int,
                              carry: Seq[String] = Nil): DataFrame = {
    require(Dim % m == 0, s"m=$m must divide $Dim")
    val sub = Dim / m
    v.select(col("vec_id") +: carry.map(col) :+
      explode(transform(sequence(lit(0), lit(m - 1)),
        s => struct(s.cast("int").as("s"),
          slice(col("nv"), s * sub + 1, lit(sub)).as("sv")))).as("e"): _*)
      .select(col("vec_id") +: carry.map(col) :+
        col("e.s").as("s") :+ col("e.sv").as("sv"): _*)
  }

  /** Per-subspace codebook as m one-array rows: (s, cells) with cells
    * = sorted `array<struct<cell_id, cv>>` — the broadcast operand of
    * the native [[graft.functions.NearestCell]] per-row argmin (sort
    * is hygiene; the expression tie-breaks explicitly). */
  private def centsBySubspace(cents: DataFrame): DataFrame =
    cents.groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("cell_id"), col("cv")))).as("cells"))

  /** Per-subspace k-means codebooks: (s, cell_id, cv), trained for all
    * m subspaces in one pass per iteration.
    *
    * The argmin is the native [[graft.functions.NearestCell]] L2 loop
    * against the broadcast per-subspace codebook — NOT a
    * `join + min_by` explode: the struct ordering (and the carried
    * subvector) make the min_by agg buffer non-UnsafeRow-mutable, so
    * Spark plans a SortAggregate that sorts the N·m·numCells pair
    * stream per iteration (see Similarity.kmeansCodebookQ). Identical
    * integer argmin, identical (d asc, cell_id asc) tie-break. */
  def trainCodebooks(v: DataFrame, m: Int = 8, numCells: Int = 16,
                     iters: Int = 2): DataFrame = {
    val spark = v.sparkSession
    graft.functions.NearestCell.register(spark)
    import spark.implicits._
    val sv = subVectors(v, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE job per iteration (r21 verdict item 2, the kmeansCodebookQ
    // treatment): the m·numCells centroid rows live on the driver
    // between iterations — exactly what the broadcast collected there
    // anyway — so each iteration is a single collect job (assignment +
    // mean agg) and the per-subspace broadcast operand rebuilds from a
    // LocalRelation with no job. Sorted by (s, cell_id), matching the
    // old sort_array hygiene.
    def collectCents(df: DataFrame): Seq[(Int, Long, Seq[Long])] =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toSeq))
        .toSeq.sortBy(t => (t._1, t._2))
    var cents = collectCents(sv.filter(col("vec_id") < numCells)
      .select(col("s"), col("vec_id").as("cell_id"), col("sv").as("cv")))
    def cellsFrame(cs: Seq[(Int, Long, Seq[Long])]): DataFrame =
      cs.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, rows) => (s, rows.sortBy(_._2).map(t => (t._2, t._3))) }
        .toDF("s", "cells")
    for (_ <- 0 until iters) {
      val assigned = sv.join(broadcast(cellsFrame(cents)), Seq("s"))
        .select(col("s"),
          call_function("nearest_cell_l2", col("sv"), col("cells")).as("cell_id"),
          col("sv"))
      cents = collectCents(assigned
        .select(col("s"), col("cell_id"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("s"), col("cell_id"), col("pos"))
        .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("comp"))
        .groupBy(col("s"), col("cell_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
          _.getField("comp")).as("cv")))
    }
    sv.unpersist()
    cents.toDF("s", "cell_id", "cv")
  }

  /** PQ codes: (vec_id, s, code) — nearest sub-codebook cell per
    * subspace, the 8-byte compressed representation. `carry` columns
    * (functionally dependent on vec_id) ride through the argmin agg. */
  def encode(v: DataFrame, cents: DataFrame, m: Int,
             carry: Seq[String] = Nil): DataFrame = {
    graft.functions.NearestCell.register(v.sparkSession)
    // native per-row argmin (see trainCodebooks): one thin output row
    // per (vec, s) straight off the scan — the min_by shape's struct
    // ordering forced a SortAggregate over the m·numCells-wide pair
    // stream. The codebook array's own cell_id can never collide with
    // a carried coarse `cell_id` (IVFADC) because it only exists
    // inside the expression's struct array, not as a column.
    subVectors(v, m, carry)
      .join(broadcast(centsBySubspace(cents)), Seq("s"))
      .select(col("vec_id") +: carry.map(col) :+ col("s") :+
        call_function("nearest_cell_l2", col("sv"), col("cells")).as("code"): _*)
  }

  /** ADC top-k: train on the corpus, encode it, score every query
    * against the CODES (never the raw corpus vectors) via the per-query
    * distance lookup table. Output: (query_id, rank, neighbor_id,
    * adc_dist), rank 1..k by (distance asc, neighbor asc), self
    * excluded. `queries` and `corpus` are (vec_id, embedding) frames —
    * quantization happens here. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              m: Int = 8, numCells: Int = 16, iters: Int = 2): DataFrame = {
    val v = corpus.select(col("vec_id"), Similarity.quantize(col("embedding")).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainCodebooks(v, m, numCells, iters)
    val codes = encode(v, cents, m)
    graft.Caching.releaseAfterFirstUse(queryAdcCodes(codes, cents, queries, k, m), v)
  }

  /** Query-time half of plain ADC, against an already-encoded corpus:
    * one exact per-query LUT of subvector→centroid distances
    * (m·numCells rows per query, broadcast-sized as long as the query
    * batch is), joined against the thin (vec_id, s, code) table — the
    * raw corpus vectors are never touched. */
  private def queryAdcCodes(codes: DataFrame, cents: DataFrame,
                            queries: DataFrame, k: Int, m: Int): DataFrame = {
    val qv = queries.select(col("vec_id").as("query_id"),
      Similarity.quantize(col("embedding")).as("qnv"))
    val lut = subVectors(qv.withColumnRenamed("query_id", "vec_id")
        .withColumnRenamed("qnv", "nv"), m)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(cents), Seq("s"))
      .select(col("query_id"), col("s"), col("cell_id"), l2(col("sv"), col("cv")).as("d"))
    val adc = codes.withColumnRenamed("code", "cell_id")
      .join(broadcast(lut), Seq("s", "cell_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("adc_dist"))
      .filter(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy("query_id").orderBy(col("adc_dist").asc, col("vec_id").asc)
    adc
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("adc_dist"))
  }

  /** Build a PERSISTED plain-ADC index under `indexDir` — the
    * [[buildPqIndex]] layout minus the coarse level:
    *   - `pq_centroids`: (s, cell_id, cv) sub-codebooks;
    *   - `codes`:        (vec_id, s, code) — NOT cell-partitioned,
    *     because plain ADC scans every code by design (its niche is
    *     exhaustive-but-cheap; IVFADC is the pruned variant).
    * Production encodes the corpus once in the ingest job; a query
    * then pays a broadcast-LUT join over ~8 bytes per corpus vector
    * instead of retraining k-means per call. */
  def buildAdcIndex(corpus: DataFrame, indexDir: String,
                    m: Int = 8, numCells: Int = 16, iters: Int = 2): Unit = {
    val v = corpus.select(col("vec_id"), Similarity.quantize(col("embedding")).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.functions.LongArrayDot.register(corpus.sparkSession)
    val unitNorm = Similarity.isUnitNormQ(v)
    val cents = trainCodebooks(v, m, numCells, iters)
    // the three tables swap live as ONE unit (graft.io.Staging): a
    // reader can never pair centroids from one build with codes or a
    // stamp from another, and a crashed rebuild keeps the old index
    graft.io.Staging.publish(corpus.sparkSession, indexDir) { tmp =>
      cents.write.mode("overwrite").parquet(s"$tmp/pq_centroids")
      encode(v, cents, m).write.mode("overwrite").parquet(s"$tmp/codes")
      writeParams(corpus.sparkSession, tmp, m, numCells, coarseCells = 0, unitNorm)
    }
    purgeValidated(indexDir)
    v.unpersist(false)
  }

  /** Stamp the build parameters into the index itself (the
    * corpusSignBuckets / trainNaiveBayesModel convention): a query
    * with a mismatched `m` would not fail — the LUT's subvector split
    * partially inner-joins the stored (s, code) rows and silently
    * drops per-subvector terms — so the prebuilt readers require() a
    * match and fail loudly on drift instead.
    *
    * `unit_norm` stamps the METRIC contract (round-16 verdict item 2):
    * ADC orders by L2 over the stored codes while the coarse probe and
    * the exact re-rank order by cosine — the two agree exactly when
    * the corpus is unit-norm and silently DISAGREE otherwise (the x24c
    * 1M probe isolated the last recall plateau, 0.944 vs 1.000, as
    * precisely this mismatch on raw random vectors; a unit-norm rerun
    * recovered it). [[Similarity.quantize]] guards per-component
    * amplitude only, so without the stamp a raw-embedding corpus
    * builds fine and loses recall with no error anywhere — the
    * metric-mixing serve paths require() the stamp instead. */
  private def writeParams(spark: org.apache.spark.sql.SparkSession,
                          indexDir: String, m: Int, numCells: Int,
                          coarseCells: Int, unitNorm: Boolean): Unit = {
    import spark.implicits._
    Seq((m, numCells, coarseCells, unitNorm))
      .toDF("m", "num_cells", "coarse_cells", "unit_norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/index_params")
  }

  /** A rebuild may change the stamp — drop every cached verdict for
    * the LIVE index path so the next query re-reads the fresh params.
    * Called after the atomic swap (writeParams itself targets the
    * staging directory, whose path never appears in the memo). */
  private def purgeValidated(indexDir: String): Unit =
    // both key shapes: "<root>|..." (rename-swap) and "<root>/v=N|..."
    validatedParams.keySet().removeIf(k =>
      k.startsWith(indexDir + "|") || k.startsWith(indexDir + "/"))

  /** (liveDir, m, stampMtime) triples already checked this JVM,
    * mapped to the build's unit_norm stamp (None = a pre-norm-stamp
    * external build) so memoized calls return it without re-reading.
    * The guard's expensive part is a single-row parquet read — same
    * order uncached as the whole x22b serve path (~0.1 s vs 0.5 s) —
    * so repeated queries against an unchanged index (the prebuilt
    * family's entire point) must not pay it per call. What a memoized
    * call still pays per query: the live-dir resolve (a handful of
    * exists/LIST metadata ops — [[graft.io.Staging.resolveRead]]) plus
    * one getFileStatus for the stamp mtime; milliseconds on an object
    * store, microseconds locally. A serving loop that wants even that
    * off the per-call path resolves once per batch and pins the
    * returned dir. The mtime is part of the key so a rebuild by
    * ANOTHER process (or, under the versioned layout, a rebuild moving
    * the live dir itself) invalidates the stale verdict — the exact
    * silent-ADC-drop window the guard exists to close. */
  private val validatedParams =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Boolean]]()

  /** Returns the RESOLVED live artifact directory (the root itself
    * under the rename-swap layout, the live `v=N` dir under the
    * versioned one — [[graft.io.Staging.resolveRead]]) plus the
    * build's `unit_norm` stamp (None on a pre-norm-stamp external
    * build); readers scan the index tables under the resolved dir,
    * never under the raw root, and the metric-mixing serve paths gate
    * on the stamp via [[requireUnitNorm]]. */
  private def requireParamMatch(spark: org.apache.spark.sql.SparkSession,
                                indexDir: String, m: Int): (String, Option[Boolean]) = {
    // crash-window availability on either publish protocol: heal a
    // crashed rename-swap, or resolve the live published version
    // (graft.io.Staging contract)
    val live = graft.io.Staging.resolveRead(spark, indexDir)
    val stampPath = new org.apache.hadoop.fs.Path(s"$live/index_params")
    val fs = stampPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mtime =
      try fs.getFileStatus(stampPath).getModificationTime
      catch {
        // distinguish "no index at all" (wrong path / never built) from
        // "index without a stamp" (external or pre-stamp builder) — the
        // second message would assert the existence of an index that
        // isn't there (round-14 self-review finding)
        case _: java.io.FileNotFoundException
            if !fs.exists(new org.apache.hadoop.fs.Path(indexDir)) =>
          throw new IllegalArgumentException(
            s"no PQ index at $indexDir — build it with " +
              "buildAdcIndex/buildPqIndex (or check the path)")
        case _: java.io.FileNotFoundException => throw new IllegalArgumentException(
          s"PQ index at $indexDir has no index_params stamp — it was built by " +
            "an external/pre-stamp builder, so its m cannot be verified and a " +
            "mismatch would silently drop per-subvector ADC terms; rebuild the " +
            "artifact with buildAdcIndex/buildIvfAdcIndex")
      }
    // keyed on the RESOLVED dir: under the versioned layout a rebuild
    // changes the path itself, so stale verdicts can never be reused
    val key = s"$live|$m|$mtime"
    val unitNorm = Option(validatedParams.get(key)).getOrElse {
      val rows =
        try spark.read.parquet(stampPath.toString).collect()
        catch {
          case e: org.apache.spark.sql.AnalysisException => throw new IllegalArgumentException(
            s"index_params stamp at $indexDir is unreadable (${e.getMessage.linesIterator.next()}) " +
              "— a concurrent rebuild may be mid-overwrite, or the artifact is " +
              "corrupt; rebuild the artifact", e)
        }
      require(rows.nonEmpty,
        s"index_params stamp at $indexDir is empty — a concurrent rebuild may " +
          "be mid-overwrite, or the artifact is corrupt; rebuild the artifact")
      val p = rows(0)
      val builtM = p.getInt(p.fieldIndex("m"))
      require(builtM == m,
        s"PQ index at $indexDir was built with m=$builtM but queried with " +
          s"m=$m — per-subvector ADC terms would be silently dropped; " +
          "rebuild the artifact or match the query's m")
      // None = the column predates the norm contract (external build)
      val un = scala.util.Try(p.fieldIndex("unit_norm")).toOption
        .map(i => p.getBoolean(i))
      validatedParams.put(key, un)
      un
    }
    (live, unitNorm)
  }

  /** Gate a metric-MIXING serve path on the build's norm stamp: ADC
    * orders by L2, the coarse probe and exact re-rank by cosine — on a
    * unit-norm corpus they agree exactly; on raw embeddings they
    * silently disagree and recall degrades with no error anywhere (the
    * x24c 1M probe: recall@10 plateaued at 0.944 on raw random
    * vectors, 1.000 after unit-normalizing — metric mismatch, not
    * probe/shortlist budget). Loud failure here is the fix: quantize's
    * amplitude guard cannot see norms, and a recall loss is invisible
    * in any single query's output. `allowRaw = true` is the EXPLICIT
    * opt-out for callers that accept the mixed-metric recall property
    * (diagnostics, geometry tests, corpora where L2 neighborhood is
    * the intended semantics) — the default stays loud. */
  private def requireUnitNorm(indexDir: String, unitNorm: Option[Boolean],
                              what: String, allowRaw: Boolean): Unit =
    if (!allowRaw) unitNorm match {
    case Some(true) => ()
    case Some(false) => throw new IllegalArgumentException(
      s"PQ index at $indexDir was built from UN-normalized embeddings, but " +
        s"$what mixes metrics (ADC ranks by L2, the coarse probe and exact " +
        "re-rank by cosine) — on raw vectors they disagree and recall " +
        "silently degrades (1M probe: recall@10 0.944 raw vs 1.000 " +
        "unit-norm). Unit-normalize the embeddings and rebuild, or serve " +
        "through adcTopKPrebuilt (pure L2, metric-consistent)")
    case None => throw new IllegalArgumentException(
      s"PQ index at $indexDir carries no unit_norm stamp (a pre-norm-contract " +
        s"or external build) — $what cannot verify the cosine/L2 agreement " +
        "it assumes; rebuild the artifact with buildAdcIndex/buildPqIndex")
  }

  /** Query a [[buildAdcIndex]] index: centroid + code reads only —
    * value-identical to [[adcTopK]] on the same corpus because the
    * index round-trip stores the exact integer codes and centroids. */
  def adcTopKPrebuilt(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                      queries: DataFrame, k: Int, m: Int = 8): DataFrame = {
    // no norm gate here: plain ADC is pure L2 end to end —
    // metric-consistent on any corpus, normalized or not
    val (live, _) = requireParamMatch(spark, indexDir, m)
    val cents = spark.read.parquet(s"$live/pq_centroids")
    val codes = spark.read.parquet(s"$live/codes")
    queryAdcCodes(codes, cents, queries, k, m)
  }

  /** ADC shortlist → EXACT re-rank — the standard deployment tail of a
    * PQ index (Jégou et al. 2011 §V evaluate exactly this shape): the
    * 8-byte codes produce a cheap `shortlist`-deep candidate set per
    * query, then the TRUE cosine is computed only for those candidates
    * by joining the raw corpus vectors back — O(queries·shortlist)
    * exact dots instead of O(queries·corpus), with the final ranking
    * free of quantization error whenever the exact top-k survives into
    * the shortlist (the recall the x24 gate measures; widen `shortlist`
    * to buy recall with re-rank cost, never with index size).
    *
    * Scale shape: the shortlist (queries×shortlist id pairs, thin) is
    * BROADCAST against the corpus, so the raw vectors never shuffle —
    * the corpus-side cost is one semi-join-shaped scan; the re-rank
    * itself is the same fused-codegen integer cosine as the exact
    * family, so reranked and brute-force scores are bit-identical. */
  def adcTopKReranked(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                      corpus: DataFrame, queries: DataFrame, k: Int,
                      m: Int = 8, shortlist: Int = 12,
                      allowRawNorms: Boolean = false): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    graft.functions.LongArrayDot.register(spark)
    // the cosine re-rank over an L2-ranked shortlist assumes the two
    // metrics agree — enforced by the build's norm stamp (memoized
    // read, the m-guard pays it anyway)
    val (_, unitNorm) = requireParamMatch(spark, indexDir, m)
    requireUnitNorm(indexDir, unitNorm, "adcTopKReranked", allowRawNorms)
    val short = adcTopKPrebuilt(spark, indexDir, queries, k = shortlist, m)
    rerankExact(corpus, queries, short, k)
  }

  /** IVFADC shortlist → exact re-rank: [[adcTopKReranked]]'s tail over
    * the coarse-pruned [[ivfAdcTopKPrebuilt]] shortlist — the complete
    * billion-scale serving chain (coarse cells prune WHICH, codes rank
    * CHEAPLY, exact cosine decides the final k). Recall here is capped
    * by BOTH knobs: a neighbor outside the probed cells can never enter
    * the shortlist (raise `nProbe`), one quantization-misranked below
    * `shortlist` can't be recovered (raise `shortlist`). */
  def ivfAdcTopKReranked(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                         corpus: DataFrame, queries: DataFrame, k: Int,
                         m: Int = 8, nProbe: Int = 2, shortlist: Int = 12,
                         minCandidates: Option[Long] = None,
                         allowRawNorms: Boolean = false): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    graft.functions.LongArrayDot.register(spark)
    // minCandidates = Some(target) swaps the fixed nProbe for the
    // occupancy-ADAPTIVE probe policy (ivfAdcTopKPrebuilt) — the knob
    // that closes the coarse-prune recall loss the x24b gate isolated,
    // at a data-bounded probe budget. The norm gate fires inside the
    // prebuilt call (IVFADC mixes metrics by construction).
    val short = ivfAdcTopKPrebuilt(spark, indexDir, queries, k = shortlist, m,
      nProbe, minCandidates, allowRawNorms)
    rerankExact(corpus, queries, short, k)
  }

  /** Shared exact-re-rank tail: broadcast the thin (query, neighbor)
    * shortlist against the raw corpus — the corpus never shuffles, the
    * join runs BEFORE quantize so the fixed-point transform + overflow
    * check pay only for shortlist hits (not O(corpus) — round-15
    * review finding), and the scores are the same fused-codegen
    * integer cosine as the exact family, so re-ranked and brute-force
    * scores are bit-identical. A shortlist id absent from the passed
    * corpus frame fails LOUDLY: silently dropping it would return a
    * degraded "exact" top-k — the same silent-drift class the
    * index_params stamp guard closes for m (drift here means the
    * corpus frame is not the one the index was built from). */
  private def rerankExact(corpus: DataFrame, queries: DataFrame,
                          short: DataFrame, k: Int): DataFrame = {
    // eager, shortlist-sized: the count below and the join reuse ONE
    // execution of the ADC/IVFADC shortlist query
    val ids = short.select(col("query_id"), col("neighbor_id")).localCheckpoint()
    val nIds = ids.count()
    val hit = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(ids), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.quantize(col("embedding")).as("nv"))
      .localCheckpoint() // one corpus scan serves the guard and the scoring
    val nHit = hit.count()
    require(nHit == nIds,
      s"re-rank shortlist/corpus drift: expected $nIds matched shortlist rows, " +
        s"got $nHit — the passed corpus frame is not the one the index was " +
        "built from (missing ids: stale index or filtered frame; extra rows: " +
        "duplicate vec_ids); rebuild the index or pass the matching corpus")
    val qn = queries.select(col("vec_id").as("query_id"),
      Similarity.quantize(col("embedding")).as("qv"))
    val scored = hit
      .join(broadcast(qn), Seq("query_id"))
      .withColumn("cosine", Similarity.cosineQ(col("qv"), col("nv")))
    Similarity.topKPerQuery(scored, k)
  }

  /** IVFADC (Jégou et al. 2011 §IV): the full billion-scale ANN
    * layout — IVF coarse cells prune WHICH vectors a query scores,
    * PQ residual codes decide HOW CHEAPLY. Corpus vectors are
    * assigned to their nearest coarse centroid (the trained cosine
    * codebook shared with [[Similarity.ivfTopK]], so the two layers
    * of the family can never disagree on cell geometry); the PQ
    * codebooks are trained on the RESIDUAL nv − cv (classic IVFADC —
    * residuals concentrate around 0 so the same 8-byte budget buys
    * far less quantization error than raw-vector codes). A query
    * probes its `nProbe` nearest cells, builds one exact
    * (m·numCells)-entry LUT of residual-to-centroid distances PER
    * PROBED CELL, and every member of those cells is scored by
    * summing m BIGINT lookups against its stored code — raw corpus
    * vectors are touched exactly twice (coarse assign, residual
    * encode) and never at query time.
    *
    * Scale shape: the only corpus-wide work is two narrow
    * broadcast-argmin scans (coarse assign + PQ encode, both the
    * native per-row [[graft.functions.NearestCell]] loop)
    * and ONE persisted residual frame that feeds training and
    * encoding off a single materialization. Query-time cost is an
    * equi-join of the thin (vec_id, cell_id, s, code) table against a
    * broadcast LUT of #queries·nProbe·m·numCells rows — batch-bounded,
    * never corpus-bounded — and at 100 TB composes with the persisted
    * index layout of [[Similarity.buildIvfIndex]]: partition members
    * by cell_id and the probed-cell IN-filter makes the code scan
    * partition-pruned too. Integer arithmetic end-to-end (residual
    * diffs ≤ 2·10⁶ in magnitude, squares ≤ 4·10¹², ×8 ≪ 2⁵³), so the
    * whole chain replays exactly in DuckDB. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 m: Int = 8, numCells: Int = 16, coarseCells: Int = 16,
                 nProbe: Int = 2, iters: Int = 2): DataFrame = {
    graft.functions.LongArrayDot.register(corpus.sparkSession)
    val v = corpus.select(col("vec_id"), Similarity.quantize(col("embedding")).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (coarse, pqCents, codes) = buildCodes(v, m, numCells, coarseCells, iters)
    val probes = probeResiduals(queries, coarse, nProbe, None)
    val out2 = queryCodes(codes, pqCents, probes, k, m)
    graft.Caching.releaseAfterFirstUse(out2, v)
  }

  /** Train coarse + residual-PQ codebooks and encode the corpus:
    * (coarse centroids, PQ centroids, (vec_id, cell_id, s, code)). */
  private def buildCodes(v: DataFrame, m: Int, numCells: Int,
                         coarseCells: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val coarse = Similarity.kmeansCodebookQ(v, coarseCells, iters)
    // members carry their residual as nv so trainCodebooks/encode
    // apply unchanged; one persisted frame serves both passes
    val members = Similarity.assignCellsQ(v, coarse)
      .join(broadcast(coarse), Seq("cell_id"))
      .select(col("vec_id"), col("cell_id"),
        zip_with(col("nv"), col("cv"), _ - _).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pqCents = trainCodebooks(members.select("vec_id", "nv"), m, numCells, iters)
    val codes = encode(members, pqCents, m, carry = Seq("cell_id"))
    (coarse, pqCents, graft.Caching.releaseAfterFirstUse(codes, members))
  }

  /** Per-query probed-cell residual frame (query_id, cell_id, nv =
    * query − coarse centroid), the coarse-prune stage of every IVFADC
    * query. Cells rank by (cosine desc, cell_id); which survive is the
    * probe POLICY:
    *   - fixed (`minCandidates` = None): the top `nProbe` cells — the
    *     classic knob, recall capped by whatever fraction of true
    *     neighbors the nProbe nearest cells happen to hold;
    *   - adaptive (`minCandidates` = Some((target, occ))): keep cells
    *     while the members of the cells ranked BEFORE them total
    *     < `target` — each query probes exactly as deep as the actual
    *     cell OCCUPANCY requires (round-15 verdict item 2: x24b
    *     isolated coarse-prune casualties as the only remaining recall
    *     loss; a fixed nProbe under-probes queries that land in small
    *     cells and over-probes ones in giant cells). The budget is
    *     data-bounded: a query stops as soon as its candidate pool
    *     reaches `target`, so expected probes ≈ target / mean
    *     occupancy, and the shortlist-bound re-rank cost downstream is
    *     unchanged. `occ` is (cell_id, n_members); empty cells join as
    *     0 and ride through free.
    * Both policies are pure Column arithmetic over a broadcast
    * codebook (#queries·coarseCells rows), so they replay exactly in
    * the DuckDB oracle. */
  private def probeResiduals(queries: DataFrame, coarse: DataFrame, nProbe: Int,
                             minCandidates: Option[(Long, DataFrame)]): DataFrame = {
    val w0 = Window.partitionBy("query_id")
      .orderBy(col("cell_sim").desc, col("cell_id"))
    val ranked = queries
      .select(col("vec_id").as("query_id"), Similarity.quantize(col("embedding")).as("qv"))
      .crossJoin(broadcast(coarse))
      .withColumn("cell_sim", Similarity.cosineQ(col("qv"), col("cv")))
      .withColumn("cell_rank", row_number().over(w0))
    val kept = minCandidates match {
      case None => ranked.filter(col("cell_rank") <= nProbe)
      case Some((target, occ)) =>
        require(target >= 1, s"minCandidates must be >= 1, got $target")
        val wc = Window.partitionBy("query_id").orderBy("cell_rank")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranked
          .join(broadcast(occ), Seq("cell_id"), "left")
          .withColumn("n_members", coalesce(col("n_members"), lit(0L)))
          .withColumn("cum_before",
            sum(col("n_members")).over(wc) - col("n_members"))
          .filter(col("cum_before") < target)
    }
    kept.select(col("query_id"), col("cell_id"),
      zip_with(col("qv"), col("cv"), _ - _).as("nv"))
  }

  /** Query-time half of IVFADC, against an already-encoded corpus;
    * `probes` is the [[probeResiduals]] frame (the policy is the
    * caller's). */
  private def queryCodes(codes: DataFrame, pqCents: DataFrame,
                         probes: DataFrame, k: Int, m: Int): DataFrame = {
    // LUT: exact query-residual → PQ-centroid distances, one table per
    // (query, probed cell) — #queries·probedCells·m·numCells rows
    val lut = subVectors(
        probes.withColumnRenamed("query_id", "vec_id"), m, carry = Seq("cell_id"))
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(pqCents.withColumnRenamed("cell_id", "code")), Seq("s"))
      .select(col("query_id"), col("cell_id"), col("s"), col("code"),
        l2(col("sv"), col("cv")).as("d"))
    val adc = codes
      .join(broadcast(lut), Seq("cell_id", "s", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d")).as("adc_dist"))
      .filter(col("vec_id") =!= col("query_id"))
    val w2 = Window.partitionBy("query_id").orderBy(col("adc_dist").asc, col("vec_id").asc)
    adc
      .withColumn("rank", row_number().over(w2).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("adc_dist"))
  }

  /** Build a PERSISTED IVFADC index under `indexDir` — the
    * [[Similarity.buildIvfIndex]] layout applied to codes:
    *   - `coarse`:       (cell_id, cv) coarse centroids;
    *   - `pq_centroids`: (s, cell_id, cv) residual sub-codebooks;
    *   - `codes`:        (vec_id, s, code), partitioned BY cell_id.
    * A production corpus encodes once in the ingest job; the code
    * table is the ~8-bytes-per-vector artifact that makes a 100 TB
    * embedding store queryable from cluster memory, and partitioning
    * it by coarse cell makes every query's scan partition-pruned to
    * its probed cells. */
  def buildPqIndex(corpus: DataFrame, indexDir: String,
                   m: Int = 8, numCells: Int = 16, coarseCells: Int = 16,
                   iters: Int = 2): Unit = {
    graft.functions.LongArrayDot.register(corpus.sparkSession)
    val v = corpus.select(col("vec_id"), Similarity.quantize(col("embedding")).as("nv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val unitNorm = Similarity.isUnitNormQ(v)
    val (coarse, pqCents, codes) = buildCodes(v, m, numCells, coarseCells, iters)
    // all four tables swap live as ONE unit (see buildAdcIndex)
    graft.io.Staging.publish(corpus.sparkSession, indexDir) { tmp =>
      coarse.write.mode("overwrite").parquet(s"$tmp/coarse")
      pqCents.write.mode("overwrite").parquet(s"$tmp/pq_centroids")
      // clustered write (the k13/buildIvfIndex shape): without the
      // repartition every encode task opens a file per touched cell
      codes.repartition(col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id").parquet(s"$tmp/codes")
      // coarse-cell occupancy (coarseCells rows): the adaptive probe
      // policy's input, staged at build time so serving never re-scans
      // the code table for counts (s=0 slice = one row per member).
      // Counted from the JUST-WRITTEN parquet, not the `codes` frame:
      // the write above was codes' first action, which released its
      // upstream persists (graft.Caching), so re-running the frame here
      // would re-encode the whole corpus — a build-time doubling
      // (round-16 review finding); the read-back is a column-pruned
      // scan of the thin table instead.
      corpus.sparkSession.read.parquet(s"$tmp/codes")
        .filter(col("s") === 0)
        .groupBy(col("cell_id").cast("long").as("cell_id"))
        .agg(count(lit(1)).as("n_members"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/cell_stats")
      writeParams(corpus.sparkSession, tmp, m, numCells, coarseCells, unitNorm)
    }
    purgeValidated(indexDir)
    v.unpersist(false)
  }

  /** Query a [[buildPqIndex]] index: the probed-cell list is collected
    * to the driver — O(#queries·probedCells) values, never
    * corpus-sized — and inlined as a literal IN filter on the RAW
    * partition column (directory-name inference narrows cell_id to
    * int; literals widen, so parquet partition pruning stays effective
    * — the [[Similarity.ivfTopKPrebuilt]] contract).
    *
    * `minCandidates = Some(target)` switches the coarse prune to the
    * occupancy-ADAPTIVE policy ([[probeResiduals]]): each query keeps
    * probing next-nearest cells until the cells already kept hold
    * ≥ `target` candidate vectors — the fix for the recall loss x24b
    * isolated (a fixed nProbe under-probes queries landing in small
    * cells). Occupancy comes from the index's `cell_stats` table
    * (written by [[buildPqIndex]]); an index built before cell_stats
    * existed derives it from the thin code table (one column-pruned
    * scan) so old artifacts stay queryable. */
  def ivfAdcTopKPrebuilt(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                         queries: DataFrame, k: Int,
                         m: Int = 8, nProbe: Int = 2,
                         minCandidates: Option[Long] = None,
                         allowRawNorms: Boolean = false): DataFrame = {
    graft.functions.LongArrayDot.register(spark)
    val (live, unitNorm) = requireParamMatch(spark, indexDir, m)
    // IVFADC mixes metrics BY CONSTRUCTION (cosine coarse probe over
    // L2-ranked codes) — gate on the build's norm stamp
    requireUnitNorm(indexDir, unitNorm, "ivfAdcTopKPrebuilt", allowRawNorms)
    val coarse = spark.read.parquet(s"$live/coarse")
    val pqCents = spark.read.parquet(s"$live/pq_centroids")
    val adaptive = minCandidates.map(t => (t, cellStats(spark, live)))
    // eager, #queries·probedCells-sized: the distinct-cell collect and
    // the LUT join below reuse ONE execution of the probe stage
    val probes = probeResiduals(queries, coarse, nProbe, adaptive).localCheckpoint()
    val probedCells = probes.select("cell_id").distinct()
      .collect().map(_.getLong(0)).sorted
    val codes = spark.read.parquet(s"$live/codes")
      .filter(col("cell_id").isin(probedCells.toSeq: _*))
      .withColumn("cell_id", col("cell_id").cast("long"))
    queryCodes(codes, pqCents, probes, k, m)
  }

  /** (cell_id, n_members) of a live IVFADC index: the staged
    * `cell_stats` table when present, else derived from the code
    * table's s=0 slice (exactly one row per member vector; cell_id and
    * s are partition/metadata columns, so the fallback scan moves no
    * code payload). Coarse-cell counts, numCells rows — broadcast-sized
    * by construction. */
  private def cellStats(spark: org.apache.spark.sql.SparkSession,
                        live: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$live/cell_stats")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(p)) spark.read.parquet(p.toString)
    else spark.read.parquet(s"$live/codes")
      .filter(col("s") === 0)
      .groupBy(col("cell_id").cast("long").as("cell_id"))
      .agg(count(lit(1)).as("n_members"))
  }
}
