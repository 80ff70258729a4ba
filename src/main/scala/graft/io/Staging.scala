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
  *   1. heal a previous crash: live missing + `.old` present → rename
  *      `.old` back (the only crash window leaves exactly that state);
  *   2. `build` writes the COMPLETE artifact under `<path>.staged`;
  *   3. swap: live → `.old`, `.staged` → live — each rename
  *      `require`d, because Hadoop rename reports most failures by
  *      RETURNING FALSE (the Watermark lesson: an unchecked failed
  *      second rename would let step 4 delete the last copy);
  *   4. delete `.old`.
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
    * build failure the live artifact is untouched. */
  def atomicSwap(spark: SparkSession, path: String)(build: String => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    val staged = new org.apache.hadoop.fs.Path(path + ".staged")
    recover(spark, path)
    fs.delete(staged, true)
    build(staged.toString)
    require(fs.exists(staged), s"staged artifact build left nothing at $staged")
    fs.delete(old, true)
    if (fs.exists(live))
      require(fs.rename(live, old), s"artifact swap rename failed: $live -> $old")
    require(fs.rename(staged, live), s"artifact swap rename failed: $staged -> $live")
    require(fs.exists(live), s"artifact swap left no live artifact at $live")
    fs.delete(old, true)
  }

  /** Heal a crash that died between the two renames — the only state
    * with no live artifact is (live missing, `.old` present). Safe to
    * call any time; [[atomicSwap]] calls it on entry, and a serving
    * path that wants crash-window availability can call it before
    * reading. One benign race, stated for the record: a reader's
    * recover firing INSIDE a live swap's microsecond rename window can
    * restore the old artifact before the builder's second rename, which
    * then fails its `require` loudly — the live artifact is the intact
    * previous build, nothing is lost, and retrying the build succeeds.
    * A failed-loud build beats the alternative (readers crashing on a
    * missing artifact while the swap is in flight). */
  def recover(spark: SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (!fs.exists(live) && fs.exists(old))
      require(fs.rename(old, live), s"artifact swap recovery failed: $old -> $live")
  }
}
