package graft.io

import org.apache.spark.sql.SparkSession

/** Crash-safe ATOMIC overwrite of a staged-artifact directory — the
  * [[graft.incremental.Watermark.writeTable]] two-rename swap (K6)
  * generalized for the model/index artifacts of the
  * train-once/serve-many families (PQ/IVF indexes, SemDeDup cells,
  * BPE/DSIR/NB models, band/bucket/fingerprint tables).
  *
  * Why plain `SaveMode.Overwrite` is not enough for a SHARED artifact:
  * it deletes the live directory before the new job's files commit, so
  * (a) a reader during the rebuild window sees a missing or partial
  * artifact (the raw path-not-found the PQ stamp guard can only
  * REPORT), and (b) a crash mid-rebuild destroys the previous artifact
  * — the "once" in train-once/serve-many is gone and every consumer
  * blocks on a full retrain.
  *
  * Protocol, per artifact ROOT (multi-table artifacts — a PQ index's
  * centroids + codes + stamp — swap as ONE unit, so a reader can never
  * pair centroids from one build with codes from another):
  *   1. heal a previous crash: live missing + old-copy present →
  *      rename it back (the only crash window leaves exactly that state);
  *   2. `build` writes the COMPLETE artifact under a tmp dir BESIDE the target;
  *   3. swap: live → old-copy, tmp → live — each rename
  *      `require`d, because Hadoop rename reports most failures by
  *      RETURNING FALSE (the Watermark lesson: an unchecked failed
  *      second rename would let step 4 delete the last copy);
  *   4. delete the old copy.
  *
  * A reader sees the complete previous artifact up to the instant of
  * the same-filesystem directory rename and the complete new artifact
  * after it. If a build CRASHES between the two renames, serving reads
  * fail fast (no live path) until the next build — or an explicit
  * [[recover]] — restores the previous artifact; nothing is ever torn.
  * Single-writer per artifact root is assumed (the registry's
  * buildOnce memo / global-lock conventions); the swap protects
  * READERS, it does not arbitrate concurrent writers.
  *
  * Filesystem contract, stated honestly for the 100 TB deployment:
  * the protocol relies on directory rename being atomic and O(1),
  * which holds on HDFS and POSIX filesystems. On S3-like object
  * stores rename is a COPY + DELETE — O(artifact bytes) and not
  * atomic — so there the right swap is a pointer one level up
  * (write `<path>/v=<build-id>/`, then atomically update a
  * small manifest/latest marker the readers resolve), not this
  * directory rename. The artifact layout produced here is identical
  * either way; only the publish step differs. */
object Staging {

  /** Build-into-staging then swap live. `build` receives the staging
    * directory and must leave the complete artifact there; on any
    * build failure the live artifact is untouched. Delegates to
    * [[IO.replaceDir]] — compact(), the streaming upsert sink, and
    * every staged-artifact builder share ONE implementation of the
    * swap protocol (tmp at `<path>.__swap_tmp`, the previous build at
    * `<path>.__swap_old` during the window). The watermark control
    * table ([[graft.incremental.Watermark.writeTable]]) keeps its own
    * specialization: its on-disk staged/old naming predates this
    * helper and is part of that table's recovery contract. */
  def atomicSwap(spark: SparkSession, path: String)(build: String => Unit): Unit =
    IO.replaceDir(spark, path)(build)

  /** Heal a crash that died between the two renames — the only state
    * with no live artifact is (live missing, `__swap_old` present).
    * Safe to call any time; [[atomicSwap]] calls it on entry, and a
    * serving path that wants crash-window availability calls it before
    * reading (the prebuilt PQ/IVF readers and semanticDedupStaged do).
    * Concurrent heals are safe: a reader whose rename loses the race
    * re-checks that the artifact is live and proceeds. One benign race
    * with an in-flight swap, stated for the record: a reader's recover
    * firing INSIDE the builder's microsecond rename window can restore
    * the old artifact before the builder's second rename, which then
    * fails its `require` loudly — the live artifact is the intact
    * previous build, nothing is lost, and retrying the build succeeds.
    * A failed-loud build beats readers crashing on a missing artifact. */
  def recover(spark: SparkSession, path: String): Unit =
    IO.recoverSwap(spark, path)
}
