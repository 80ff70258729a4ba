package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batched embedding-inference plumbing — the producer side of the
  * vector operators (x5-x9 consume an embedding column; a real pipeline
  * has to CREATE it by running an encoder model over the corpus).
  *
  * The Spark-side contract is the real one:
  *   - typed `mapPartitions` so each executor core holds ONE model
  *     handle for its whole partition (the MessageDigest below stands
  *     where a session/tokenizer handle would load — per-partition,
  *     never per-row);
  *   - `grouped(batchSize)` so rows reach the model as batches — the
  *     shape GPU/ONNX inference needs to amortize the call overhead;
  *   - lazy iterators end-to-end: a 100 TB corpus streams through in
  *     batch-sized memory, nothing materializes per partition.
  *
  * The encoder itself is STUBBED (no ML runtime in this sandbox) with a
  * deterministic md5-derived vector — component j is
  * `(ascii(h[j]) % 16) / 8 − 1` where h[j] is hex-digit CHARACTER j of
  * the digest (ascii modulo, NOT the hex digit's numeric value: 'a'..'f'
  * land on the same residues as '1'..'6', so components span only
  * [−1, 0.125]) — chosen because any engine with an md5() can replay
  * the same formula, so the DuckDB oracle verifies the distributed
  * plumbing end-to-end. Components are exact binary fractions (k/8 − 1),
  * so derived sums compare bit-for-bit across engines.
  */
object Inference {

  def encodeBatched(docs: DataFrame, idCol: String, textCol: String,
                    dim: Int = 16, batchSize: Int = 64): DataFrame = {
    require(dim >= 1 && dim <= 32, "md5 supplies 32 hex digits = 32 stub components")
    require(batchSize >= 1, "batchSize must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      // the typed tuple encoder and text.getBytes both NPE on nulls —
      // rows with no id or no text carry nothing to encode; drop them
      // (routine in scraped corpora) rather than fail the stage
      .na.drop()
      .as[(Long, String)]
      .mapPartitions { rows =>
        // per-partition "model load" — a real encoder session goes here
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.grouped(batchSize).flatMap { batch =>
          // a real pipeline hands `batch` to the model as one tensor call
          batch.map { case (id, text) =>
            val h = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
            (id, (0 until dim).map(j => (h.charAt(j).toInt % 16) / 8.0 - 1.0).toArray)
          }
        }
      }
      .toDF(idCol, "embedding")
  }

  /** Length-aware inference batch assignment — the padding-kill pass
    * before batched encoding: group documents by EXACT token count and
    * fill fixed-size batches within each group, so every batch holds
    * equal-length sequences and pads zero tokens (the dominant
    * inference-throughput lever; length-BUCKETED batching trades some
    * padding back for fuller batches by coarsening the key).
    *
    * One per-length window: the rank is per (n_tokens) group, so the
    * work distributes across the length distribution (rank-limit
    * pushdown does not apply — every row keeps a rank — but group
    * cardinality is bounded by max document length, and any single
    * over-heavy length can be pre-split by a deterministic sub-key).
    * Assignment is a pure function of (n_tokens, id order) — replayable
    * cross-engine. */
  def inferenceBatches(docs: DataFrame, idCol: String, textCol: String,
                       batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("n_tokens")).orderBy(col(idCol))
    docs
      .select(col(idCol),
        TextAnalysis.tokenCountWhitespace(col(textCol)).as("n_tokens"))
      .withColumn("batch_seq",
        floor((row_number().over(w) - 1) / lit(batchSize.toDouble)).cast("long"))
  }
}
