package graft.registry

import graft.Tables
import graft.llm.{BloomDedup, Contamination, Corpus, DedupLsh, Inference, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM training-data-pipeline operators: dedup (exact, MinHash-LSH,
  * SimHash, bucketed n-gram Jaccard), similarity search (brute-force +
  * LSH ANN), text analysis, multimodal plumbing. Near-dup corpora are
  * synthesized deterministically (documents ∪ clone / truncated clone)
  * so the dedup queries have real work at every scale factor. */
object LlmQueries {

  /** All LLM-pipeline query families, one registry surface (the
    * pre-split shape): x = dedup/similarity, y = corpus analysis,
    * m = multimodal, e = composed pipelines. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    DedupSimQueries.queries ++ CorpusAnalysisQueries.queries ++
      MultimodalQueries.queries ++ PipelineQueries.queries

  def oracles: Map[String, String] =
    DedupSimQueries.oracles ++ CorpusAnalysisQueries.oracles ++
      MultimodalQueries.oracles ++ PipelineQueries.oracles
}
