// Capture .explain("formatted") for a set of registered queries into
// plans/<tag>/<query>_<suffix>.txt -- the optimization rounds' evidence
// files (the judge reads plan claims against these).
// Env: GRAFT_PLAN_QUERIES = comma-separated names (default: the
//      round-21 examined set), GRAFT_PLAN_TAG = plans subdir (r21),
//      GRAFT_PLAN_SUFFIX = before|after, GRAFT_PLAN_SF = sf dir.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=8 \
//   --conf spark.sql.extensions=graft.plans.GraftExtensions \
//   --driver-class-path target/scala-2.13/classes -i tools/probes/probe_plan_capture.sc -e ':quit'
val sfDir = sys.env.getOrElse("GRAFT_PLAN_SF", "/root/testdata/sf0.001")
val tag = sys.env.getOrElse("GRAFT_PLAN_TAG", "r21")
val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
val wanted: Set[String] = sys.env.get("GRAFT_PLAN_QUERIES")
  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
  .getOrElse(Set(
    "x11_simhash_neardup", "x17_semantic_dedup", "x15_canonical_quality",
    "x21_span_removal", "y20_nb_classifier", "x23_ivfpq_topk",
    "y28_bpe_encode", "x10_dedup_apply", "x19_span_dedup",
    "x8_dedup_clusters", "x7_ann_ivf", "e2_browsing_user",
    "a1_session_merge", "t12_url_canonicalize", "y16_bigram_logprob",
    "y21_dsir_select", "o9_pagerank", "e3_batch_ingest", "x2b_minhash_capped",
    "x20_span_coverage", "e6_ccnet_curation", "x2_minhash_neardup",
    "x18_winnow_neardup", "s11_file_discovery", "y29_nb_eval",
    "x24c_adaptive_recall", "y12_tfidf_topk", "y13_unigram_logprob",
    "y9_repetition_filter", "x22_pq_topk"))
val outDir = java.nio.file.Paths.get(s"plans/$tag")
java.nio.file.Files.createDirectories(outDir)
graft.SparkEntry.queries.toSeq.sortBy(_._1)
  .filter { case (n, _) => wanted(n) }
  .foreach { case (name, q) =>
    try {
      val df = q(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"PLAN $name -> plans/$tag/${name}_$suffix.txt")
    } catch {
      case ex: Throwable =>
        println(s"PLAN $name :: ERROR ${ex.getClass.getSimpleName}: ${ex.getMessage.take(120)}")
    }
  }
println("PLAN capture done")
