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
  * The encoder is a REAL text vectorizer — feature hashing ("hashing
  * trick", Weinberger et al. 2009, arXiv 0902.2206): token unigrams
  * and bigrams hash into `dim` signed buckets (bucket = first two md5
  * hex digits mod dim, sign = high bit of the third), the bucket sums
  * L2-normalize, and components are emitted in 1e-6 FIXED-POINT
  * (`floor(v·10⁶ / √Σv²)` — the operand longs are exact, so the
  * double divide and floor are IEEE-stable and any engine with md5()
  * replays the vector bit-for-bit; the DuckDB oracle does). No ML
  * runtime, but a genuine, useful projection: cosine over these
  * vectors approximates n-gram Jaccard similarity, and the same
  * mapPartitions/batch shape hosts a learned encoder unchanged.
  */
object Inference {

  /** Canonical name of the encoder implementation, stamped into x13/e4
    * manifests as `encoder_impl` so the sandbox stub boundary is
    * observable IN DATA: a deployment that swaps a learned model into
    * `encodeBatched` must change this constant, and every consumer of
    * the manifest sees which encoder produced its vectors. */
  val EncoderImpl = "feature-hash-md5-stub-v1"

  private val HexVal = "0123456789abcdef"

  /** The per-document projection, exposed for spec replay: signed
    * bucket counts over token uni+bigrams, L2-normalized to 1e-6
    * fixed-point. An all-cancelling (or empty) document yields the
    * zero vector rather than 0/0. */
  def featureHashVector(md: java.security.MessageDigest, text: String, dim: Int): Array[Long] = {
    val tk = text.split("\\s+")
    val grams = tk.iterator ++
      tk.iterator.sliding(2).withPartial(false).map(_.mkString(" "))
    val v = new Array[Long](dim)
    grams.foreach { g =>
      val h = md.digest(g.getBytes("UTF-8"))
      val d0 = (h(0) >> 4) & 0xf
      val d1 = h(0) & 0xf
      val d2 = (h(1) >> 4) & 0xf
      v((d0 * 16 + d1) % dim) += (if (d2 >= 8) 1L else -1L)
    }
    val ss = v.foldLeft(0L)((a, x) => a + x * x)
    if (ss == 0L) v
    else v.map(x => math.floor(x * 1000000.0 / math.sqrt(ss.toDouble)).toLong)
  }

  def encodeBatched(docs: DataFrame, idCol: String, textCol: String,
                    dim: Int = 64, batchSize: Int = 64): DataFrame = {
    // divisors of 256 only: the bucket is (two hex digits) % dim, and
    // a non-divisor dim (e.g. 100) would systematically overload the
    // low buckets (values 0..255 wrap 2x into buckets < 56) — silent
    // projection skew. 256's divisors are exactly the powers of two,
    // which is also what feature-hashing deployments use in practice.
    require(dim >= 1 && dim <= 256 && 256 % dim == 0,
      s"dim must be a power of two <= 256 (bucket = 2 hex digits mod dim, " +
        s"non-divisors bias the low buckets); got $dim")
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
          batch.map { case (id, text) => (id, featureHashVector(md, text, dim)) }
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
