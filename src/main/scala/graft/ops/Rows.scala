package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row-level transforms: metadata stamping, domain coercions, lenient
  * timestamp parsing, sampling, truncation (SURVEY §2.3, §2.8).
  */
object Rows {

  /** P3 — lineage metadata stamped on every bronze row
    * (dwh/preprocessing_streaming_full_load.py:17-28). `runTime` is an
    * explicit parameter instead of current_timestamp() so replays and
    * oracle comparisons are deterministic; production callers pass
    * `java.time.Instant.now` once per batch.
    */
  def stampMetadata(
      df: DataFrame,
      sourceName: String,
      sourceId: Long,
      runTime: Column
  ): DataFrame =
    df.withColumn("source_name", lit(sourceName))
      .withColumn("source_id", lit(sourceId))
      .withColumn("is_update", lit(false))
      .withColumn("is_delete", lit(false))
      // ntz: bronze rows carry naive wall-clock stamps like the
      // reference's datetime.now(); also keeps parquet output
      // isAdjustedToUTC=false, matching the DuckDB oracle's TIMESTAMP
      .withColumn("created_time", runTime.cast("timestamp_ntz"))
      // the reference writes created_date as a yyyy-MM-dd string
      // (preprocessing_streaming_incremental_load.py:406-407)
      .withColumn("created_date", date_format(runTime.cast("timestamp"), "yyyy-MM-dd"))

  /** P5 — string-bool domain coercion (dwh/general_lib.py:176-185):
    * a string column whose observed distinct values ⊆ {"true","false"}
    * (case-insensitive, nulls allowed) becomes BooleanType. Faithful
    * two-pass shape: one profiling aggregate over all candidate string
    * columns at once (NOT one job per column), then a single projection.
    */
  def coerceStringBools(df: DataFrame): DataFrame = {
    val candidates =
      df.schema.fields.filter(_.dataType == StringType).map(_.name).toIndexedSeq
    if (candidates.isEmpty) return df
    val row = df.agg(profileExpr(candidates.head), candidates.tail.map(profileExpr): _*).head()
    val boolCols = candidates.zipWithIndex.collect {
      case (c, i) if row.getBoolean(i) => c
    }.toSet
    df.select(df.columns.toIndexedSeq.map { c =>
      if (boolCols(c))
        when(lower(col(c)) === "true", lit(true))
          .when(lower(col(c)) === "false", lit(false))
          .as(c)
      else col(c)
    }: _*)
  }

  private def profileExpr(c: String): Column =
    (count(when(col(c).isNotNull, 1)) > 0 &&
      count(when(col(c).isNotNull && !lower(col(c)).isin("true", "false"), 1)) === 0)
      .as(s"${c}__isbool")

  /** P6 — UUID→string projection (dwh/general_lib.py:45-48): with a
    * typed schema this is a cast, not an applymap. */
  def stringifyColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(df.columns.toIndexedSeq.map { c =>
      if (cols.contains(c)) col(c).cast("string").as(c) else col(c)
    }: _*)

  /** P7/T10 — lenient timestamp parse: try formats in order, null when
    * none matches (dateutil.parser.parse analogue,
    * preprocessing_streaming_incremental_load.py:149-161). */
  def parseTimestampLenient(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** P4 — seeded Bernoulli sample (ingest_batch…ProblemLog:63-64). */
  def seededSample(df: DataFrame, fraction: Double = 0.1, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** P4 twin — hash-gated deterministic sample: keep rows whose md5 of
    * the '#'-joined key falls lexicographically below the 2-hex-digit
    * cut `round(256·fraction)`. Unlike `sample(seed)` (whose membership
    * is engine-specific), md5 is identical everywhere, so the exact row
    * MEMBERSHIP replays in any engine — this is the variant the DuckDB
    * oracle can check, and the one to use when a sample must be
    * reproducible across reruns/backfills at 100 TB (membership is a
    * pure row property: no RNG state, no partition-order sensitivity).
    */
  /** Shared hex cut: round(256·f) as 2 hex digits. Fractions that
    * round to ≥256 (f ≳ 0.998) keep everything via the "g" sentinel —
    * it sorts above every hex string, while the 3-char "100" would NOT
    * (lexicographic "1a.." > "100"). */
  private def hexCut(fraction: Double): String = {
    val r = math.round(fraction * 256).toInt
    if (r >= 256) "g" else f"$r%02x"
  }

  /** '#'-joined key via null-PROPAGATING concat (not concat_ws): a
    * null key must kill membership identically to the DuckDB replay's
    * `||`, and must not collide ('a',NULL,'b') with ('a','b',NULL). */
  private def hashKey(keyCols: Seq[String]): Column =
    md5(concat(keyCols.map(c => col(c).cast("string"))
      .flatMap(c => Seq(lit("#"), c)).tail: _*))

  def hashSample(df: DataFrame, keyCols: Seq[String], fraction: Double = 0.1): DataFrame = {
    require(keyCols.nonEmpty, "hashSample needs at least one key column")
    df.filter(hashKey(keyCols) < lit(hexCut(fraction)))
  }

  /** 4-hex-digit cut at 1/65536 granularity for DERIVED rates (the
    * 2-digit cut is fine for hand-picked fractions; computed rates
    * need finer steps). floor, not round: floor on a double is an
    * exact IEEE operation, so the cut has NO tie boundary for two
    * engines to disagree on (a round() tie at .5/65536 would be the
    * same ulp cliff the unigram-LM scaladoc documents). */
  private def hexCut16(fraction: Double): String = {
    val r = math.floor(fraction * 65536).toInt
    if (r >= 65536) "g" else f"$r%04x"
  }

  /** Mixture sampling — the data-mixing step of a training-data
    * pipeline: given TARGET mixture weights per stratum (e.g. the
    * en/de/fr proportions the training run wants) and a target output
    * size, derive each stratum's keep rate from its realized count,
    * rate_g = min(1, w_g·totalOut / n_g), and apply the md5-gated
    * membership. Strata without a target weight are dropped.
    * Downsampling only — a stratum smaller than its target keeps all
    * rows (rate caps at 1) and the realized mix shifts accordingly;
    * upsampling is a repeat-epoch decision for the trainer, not a
    * row filter.
    *
    * Scale shape: one count aggregate (O(#strata) rows to the driver —
    * strata are languages/sources, bounded), then a pure row-property
    * filter; no shuffle of the data itself. Membership replays in any
    * engine (md5 string compare, floor-derived cut).
    */
  def mixtureSample(
      df: DataFrame,
      strataCol: String,
      keyCols: Seq[String],
      targetWeights: Map[String, Double],
      totalOut: Long
  ): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ >= 0.0),
      "target weights must be non-negative")
    strataHashFilter(df, strataCol, keyCols) { counts =>
      targetWeights.map { case (g, w) =>
        val n = counts.getOrElse(g, 0L)
        g -> (if (n == 0L) 0.0 else math.min(1.0, w * totalOut / n))
      }
    }
  }

  /** Temperature-scaled mixture sampling (τ = 2, i.e. keep mass ∝
    * √n_g) — the multilingual rebalancing rule of mT5/XLM-R-style
    * pipelines: head languages are downsampled, tail languages keep
    * relatively more, without anyone hand-picking weights (that is
    * [[mixtureSample]]'s job). τ is FIXED at 2 because √ is the one
    * fractional power that replays cross-engine exactly — IEEE sqrt is
    * correctly rounded, so `floor(sqrt(n))` is bit-stable everywhere,
    * while a general pow(n, 1/τ) is not.
    *
    * Derivation (all integer, O(#strata) on the driver like
    * mixtureSample): w_g = ⌊√n_g⌋; target kept_g = w_g·totalOut div
    * Σw; rate_g = min(1, kept_g/n_g) applied via the md5 hash gate.
    * Same scale shape as mixtureSample: one count aggregate, then a
    * pure row-property filter — the data itself never shuffles. */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      keyCols: Seq[String],
      totalOut: Long
  ): DataFrame = {
    require(totalOut >= 0, "totalOut must be non-negative")
    strataHashFilter(df, strataCol, keyCols) { counts =>
      val weights = counts.map { case (g, n) =>
        g -> math.floor(math.sqrt(n.toDouble)).toLong }
      val wSum = weights.values.sum
      counts.map { case (g, n) =>
        val kept = if (wSum == 0L) 0L else weights(g) * totalOut / wSum
        g -> (if (n == 0L) 0.0 else math.min(1.0, kept.toDouble / n))
      }
    }
  }

  /** Shared machinery of the md5-gated stratified samplers
    * ([[mixtureSample]], [[temperatureSample]]): one O(#strata) count
    * collect, caller-derived keep rates, a CASE-cut fold, one pure
    * row-property filter. The default cut '00' sorts below every md5
    * hex, so strata without a rate — including a NULL stratum, which
    * is also excluded from the counts handed to `rateFor` — drop. */
  private def strataHashFilter(df: DataFrame, strataCol: String,
      keyCols: Seq[String])(rateFor: Map[String, Long] => Map[String, Double]): DataFrame = {
    require(keyCols.nonEmpty, "stratified sampling needs at least one key column")
    val counts = df.groupBy(col(strataCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    val cutExpr = rateFor(counts).toSeq.sortBy(_._1).foldLeft(lit("00"): Column) {
      case (acc, (g, rate)) =>
        when(col(strataCol).cast("string") === g, lit(hexCut16(rate))).otherwise(acc)
    }
    df.filter(hashKey(keyCols) < cutExpr)
  }

  /** Deterministic train/val/test split assignment — the fixed,
    * backfill-stable split a training pipeline needs (re-running over
    * a grown corpus must never move an old row between splits, which
    * rules out RNG and row-order schemes; the md5 key property
    * guarantees it). Cuts at floor(frac·65536)/65536.
    */
  def splitAssign(df: DataFrame, keyCols: Seq[String],
                  valFrac: Double, testFrac: Double): DataFrame = {
    require(keyCols.nonEmpty, "splitAssign needs at least one key column")
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1,
      "need valFrac, testFrac >= 0 and valFrac + testFrac <= 1")
    val k = hashKey(keyCols)
    df.withColumn("split",
      when(k < lit(hexCut16(valFrac)), "val")
        .when(k < lit(hexCut16(valFrac + testFrac)), "test")
        .otherwise("train"))
  }

  /** Stratified hash sample: per-stratum keep fractions over the same
    * md5-gated membership as [[hashSample]] — the language/source
    * balancing step of a training-data curation pipeline. Strata not
    * in `fractions` get `default`. Fully engine-replayable: the cut is
    * a CASE over the stratum column, membership a pure row property. */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      keyCols: Seq[String],
      fractions: Map[String, Double],
      default: Double = 0.0
  ): DataFrame = {
    require(keyCols.nonEmpty, "stratifiedHashSample needs at least one key column")
    val cutExpr = fractions.toSeq.sortBy(_._1).foldLeft(lit(hexCut(default))) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(hexCut(f))).otherwise(acc)
    }
    df.filter(hashKey(keyCols) < cutExpr)
  }

  /** Deterministic per-group k-sample: the EXACTLY-k counterpart of
    * [[stratifiedHashSample]] (a fraction gate over a skewed stratum
    * yields a binomially-noisy count; audits, eval sets, and per-domain
    * caps need exactly k). Selection = the k smallest md5(key) values
    * per group — a fixed, backfill-stable choice (growing a group can
    * only displace the current k-th member, never reshuffle arbitrary
    * members), replayable in any engine.
    *
    * Scale shape: the naive form is `row_number() OVER (PARTITION BY
    * group ORDER BY md5)` ≤ k — one total sort per group, a hot-group
    * straggler at corpus scale. This is the [[graft.llm.Sketches]]
    * kmvDistinct staging instead: stage 1 ranks within (group, salt) —
    * the salt cut from the hash tail, so no second hash — keeping ≤
    * salts·k survivors per group; stage 2 ranks the survivors. The
    * full group never passes through one reducer. Any salts ≥ 1 gives
    * identical results. */
  def groupSample(df: DataFrame, groupCol: String, keyCols: Seq[String],
                  k: Int, salts: Int = 16): DataFrame = {
    require(k >= 1, s"groupSample needs k >= 1, got $k")
    val hashed = df.withColumn("__h", hashKey(keyCols))
    val salted = hashed.withColumn("__salt",
      pmod(conv(substring(col("__h"), 29, 4), 16, 10).cast("long"), lit(salts.toLong)))
    val orderCols = col("__h") +: keyCols.map(col)
    val local = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(orderCols: _*)
    val global = Window.partitionBy(col(groupCol))
      .orderBy(orderCols: _*)
    salted
      .withColumn("__rn1", row_number().over(local)).filter(col("__rn1") <= k)
      .withColumn("sample_rank", row_number().over(global))
      .filter(col("sample_rank") <= k)
      .drop("__h", "__salt", "__rn1")
  }

  /** O5 — cell truncation, reference caps visible_content at 10 kchars
    * (py:197). */
  def truncateCell(c: Column, maxChars: Int = 10000): Column =
    substring(c, 1, maxChars)

  /** Semi-structured payload handling via Spark 4's VARIANT type —
    * the modern engine path for the reference's free-form JSON
    * property bags (`props` on browsing events): `parse_json` once
    * into the binary-encoded variant (no per-access re-parse, unlike
    * `get_json_object` on strings), then typed `variant_get`
    * extraction. Both are codegen scalar expressions, so the whole
    * parse+extract stays a narrow stage; with variant shredding the
    * parquet scan can serve extracted paths columnar. `path` is a
    * JSON-path like `$.k`; a missing path yields NULL (variant_get's
    * lenient mode), matching JSON-extraction semantics elsewhere. */
  def variantExtract(df: DataFrame, jsonCol: String, path: String,
                     targetType: String, out: String): DataFrame =
    df.withColumn("__v", parse_json(col(jsonCol)))
      .withColumn(out, try_variant_get(col("__v"), path, targetType))
      .drop("__v")
}
