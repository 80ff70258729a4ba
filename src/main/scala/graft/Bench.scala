package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at the sf dir
  * given by SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Queries are materialized through the noop datasource — a full
  * distributed execution of every operator and expression — instead of
  * `.count()`, which would let Catalyst prune all columns and benchmark
  * compute-heavy projections as nearly free (round-1 verdict note).
  */
object Bench {
  /** Fixed normalization reference for the anchor job: the round-15
    * close-out measurement (PROBES.md r15 delta table, anchor 0.521 s —
    * the least-contended anchor sample of that round; the same round's
    * full-sweep anchor read 0.667 s, the 28% same-day swing that
    * motivated normalizing at all). `queries_normalized` below divides
    * out the measured-anchor / reference ratio, so a sweep on a
    * contended box reads comparable across rounds — the raw numbers
    * are always retained beside it. */
  val AnchorRefSec = 0.521

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpusRaw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // parsed loudly up front: the value is interpolated into the JSON
    // env fingerprint as a number, where a non-numeric string would
    // emit an unparseable bench line (round-15 ADVICE)
    val cpus = cpusRaw.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"SPARK_GRAFT_CPUS must be an integer, got '$cpusRaw'"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same contract as Verify: SPARK_GRAFT_PUBLISH_MODE=versioned runs
    // the sweep with every staged artifact publishing/resolving under
    // the object-store protocol — the A/B that prices resolveRead on
    // the serving hot path (PROBES round-15)
    graft.io.Staging.applyPublishModeFromEnv(spark)
    // SPARK_GRAFT_STATE_STORE=heap|rocksdb: the st-family A/B knob —
    // rocksdb is the engine default, heap reverts to Spark's
    // HDFSBackedStateStoreProvider for comparison
    sys.env.get("SPARK_GRAFT_STATE_STORE")
      .foreach(m => spark.conf.set(graft.streaming.Streams.StateStoreModeKey, m))
    // warm-up: exercise scan + window + aggregate + sort codegen paths
    // so JVM/codegen startup isn't billed to the first timed query
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      n.withColumn("rn", row_number().over(Window.partitionBy("n_regionkey").orderBy("n_nationkey")))
        .groupBy("n_regionkey").agg(sum("rn").as("s"), min_by(col("n_name"), col("n_nationkey")))
        .orderBy("n_regionkey")
        .write.format("noop").mode("overwrite").save()
    }
    // environment fingerprint (round-14 verdict item 2): cross-round
    // per-query deltas of ±26-45% have appeared with NO code cause —
    // box contention the sweep can't distinguish from a real
    // regression. Record (a) the pre-sweep 1-min load average and (b) a
    // FIXED CPU+shuffle anchor job (md5 over 8M rows → 256-bucket hash
    // agg, min of 3 — the same work every round by construction), so a
    // round-over-round delta report can divide by the anchor ratio and
    // a drifted-anchor round reads as "contended box", not "regression".
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def anchorOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0, 8000000L, 1, 32)
        .select(md5(col("id").cast("string")).as("h"), col("id"))
        .groupBy(pmod(hash(col("h")), lit(256)).as("b"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val anchorSec = (0 until 3).map(_ => anchorOnce()).min
    // min-of-N-SWEEPS (default 3): single-shot timings on a shared 32-core
    // JVM swing up to 5x with no code change (round-3 verdict), and
    // back-to-back repeats of ONE query share the same GC/page-cache
    // pressure left by its predecessor, so a median of them keeps the
    // interference (round-6 verdict: x15 reported 2.4x and p4 6x over
    // their isolated cost). Worse, the old shape UNDERSTATED every
    // operator with an internal persist: repeats 2-3 built a logical
    // plan identical to repeat 1's, so CacheManager handed them repeat
    // 1's still-cached blocks and the median reported a warm-cache cost
    // no fresh pipeline run would see. Now the FULL suite runs `runs`
    // times with clearCache between queries — every sample is a true
    // cold run — and each query reports its MIN across sweeps; the
    // order is rotated per sweep so a query sees different predecessors
    // each time, and the min picks the least-interfered sample
    // (round-7 check: sweep values within ~±17% of isolated
    // SPARK_GRAFT_BENCH_ONLY runs for x17/x5/x2/x15). Every registered
    // query is idempotent (overwrite-mode scratch sinks, per-run
    // checkpoint reset), so re-running is safe.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // optional regex filter for targeted perf iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY='^(t4|x7)' — full sweep when unset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) }
    val samples = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: $e")
      }
      // several operators persist at internal fan-out points and cannot
      // unpersist before returning (the caller still reads the frame);
      // clearing between queries stops those blocks accumulating across
      // 100+ queries × N sweeps
      spark.catalog.clearCache()
    }
    def sweepOver(qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
                  sweep: Int, totalSweeps: Int): Unit = {
      // deterministic rotation: sweep k starts len*k/runs further along,
      // so each query's predecessor differs across sweeps
      val off = if (qs.isEmpty) 0 else (qs.size.toLong * sweep / totalSweeps.max(1)).toInt
      // settle between sweeps: drop leftover executor-side garbage from
      // the previous sweep's 140+ queries before timing resumes
      System.gc()
      (qs.drop(off) ++ qs.take(off)).foreach { case (n, f) => timeOne(n, f) }
    }
    for (sweep <- 0 until runs) sweepOver(queries, sweep, runs)
    // extra rotated sweeps for the HEAVY TAIL only (round-12 verdict:
    // contended-box flapping concentrated in the >2 s cluster — broad
    // +50-150% swings on untouched code that the idle-box rerun erased).
    // min-of-N converges on the least-interfered sample, so slow queries
    // get runs+extra samples while the sub-threshold majority stays at
    // `runs` and total bench wall grows only by ~extra × Σ(slow mins).
    val slowThresh = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW_SEC", "2.0").toDouble
    val extraRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_SLOW_EXTRA", "2").toInt.max(0)
    val slow = queries.filter { case (n, _) =>
      samples(n).nonEmpty && samples(n).min > slowThresh
    }
    for (sweep <- 0 until extraRuns; if slow.nonEmpty) sweepOver(slow, sweep, extraRuns)
    val results = queries.map { case (name, _) =>
      val xs = samples(name)
      name -> (if (xs.nonEmpty) xs.min else -1.0)
    }
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // anchor-normalized per-query numbers (round-15 verdict item 4):
    // the anchor job is identical work every round, so raw ÷
    // (anchor_measured / anchor_ref) divides out box contention —
    // r15's own anchor moved 0.521→0.667 s same-day, which made every
    // sub-1.3× cross-round delta unattributable by eye. Raw numbers
    // stay in `queries`; delta tooling should diff `queries_normalized`.
    val anchorRatio = anchorSec / AnchorRefSec
    val qsNorm = results.map { case (k, v) =>
      "\"" + k + "\":" + fmt(if (v >= 0) v / anchorRatio else v)
    }.mkString("{", ",", "}")
    // per-query sample counts for every query sampled MORE than `runs`
    // times (the slow tail): cross-round per-query diffs can then tell a
    // real speedup from a min taken over extra samples (round-13 ADVICE)
    val slowSamples = slow.map { case (n, _) => "\"" + n + "\":" + samples(n).size }
      .mkString("{", ",", "}")
    // per-query {min, median, max, n} over the same-HEAD sweep family
    // (round-20 ADVICE item 5, shipped round 22): `queries` keeps the
    // min (the contract field, never renamed), but cross-round delta
    // adjudication needs the SPREAD — this box's untouched sub-second
    // queries drift ±0.2-0.4 s between sweeps, and a min-only schema
    // forces every round to re-litigate that band from scratch.
    // Purely additive: one extra top-level JSON object.
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val qsStats = results.collect { case (k, _) if samples(k).nonEmpty =>
      val xs = samples(k)
      "\"" + k + "\":{\"min\":" + fmt(xs.min) + ",\"median\":" + fmt(median(xs)) +
        ",\"max\":" + fmt(xs.max) + ",\"n\":" + xs.size + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val env =
      s"""{"load_avg_1m":${fmt(loadAvg)},"cpus":$cpus,"anchor_cpu_shuffle_sec":${fmt(anchorSec)},"anchor_ref_sec":${fmt(AnchorRefSec)},"anchor_ratio":${fmt(anchorRatio)}}"""
    val full =
      s"""{"metric":"total","value":${fmt(total)},"value_normalized":${fmt(total / anchorRatio)},"unit":"sec","runs":$runs,"slow_extra_runs":$extraRuns,"slow_thresh_sec":$slowThresh,"n_slow":${slow.size},"slow_samples":$slowSamples,"agg":"min-across-sweeps","env":$env,"queries":$qs,"queries_normalized":$qsNorm,"queries_stats":$qsStats,"sf":"$sfDir"}"""
    println(full)
    // The full line is >2KB at 100+ queries and the driver keeps only an
    // output TAIL — BENCH_r03/r04 both captured it front-truncated and
    // unparseable. Persist the full line to a file and ALSO print a short
    // summary line LAST so any tail-window capture still holds one
    // complete JSON object.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] could not write $outFile: $e") }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"nqueries":${results.size},"env":$env,"file":"$outFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
