package graft.rel

import org.apache.spark.sql.DataFrame

/** The crash-safe tombstone-log swap shared by the keyed-deletion
  * stores ([[GraphStore]] edges, `sources.MediaDedupStore`
  * fingerprints): a compaction that SHRINKS the log must never leave a
  * window where the log is absent or partial — Spark's
  * `mode("overwrite")` deletes the target before committing, so a bare
  * full-dir rewrite loses the whole log on a crash mid-write,
  * resurrecting deleted keys still suppressed by it.
  *
  * Discipline: (a) write the kept set COMPLETELY to a staged sibling
  * (`<log>_next`), (b) delete the old log, (c) rename the staged dir
  * into place. Each crash window leaves one complete, readable log:
  * after (a) the old log is authoritative (readers ignore a stale
  * staging dir when the log exists — the next run overwrites it);
  * between (b) and (c) readers fall back to the staged dir; the next
  * maintenance entry completes the rename ([[recoverSwap]]).
  */
private[graft] object TombstoneLog {

  private def path(p: String) = new org.apache.hadoop.fs.Path(p)

  /** Where the CURRENT log lives: the log dir, or — inside the swap
    * window — the fully-written staged replacement. None when neither
    * exists (no delete was ever issued). Readers never mutate. */
  def readDir(fs: org.apache.hadoop.fs.FileSystem, log: String,
      next: String): Option[String] =
    if (fs.exists(path(log))) Some(log)
    else if (fs.exists(path(next))) Some(next)
    else None

  /** Complete an interrupted swap (old log deleted, staged rename not
    * done) — call on entry to any maintenance that reads the log. */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, log: String,
      next: String): Unit =
    if (!fs.exists(path(log)) && fs.exists(path(next)))
      require(fs.rename(path(next), path(log)),
        s"cannot complete interrupted tombstone-log swap at $next")

  /** Replace the log with `kept` (already materialized by the caller —
    * it reads the dir this replaces). An EMPTY kept set deletes the log
    * outright (readers probe existence; a schema-less empty parquet dir
    * would fail their read) — the stale staging dir goes FIRST, else a
    * crash between the two deletes would leave readers falling back to
    * an outdated staged log full of already-dropped tombstones. */
  def swapIn(kept: DataFrame, fs: org.apache.hadoop.fs.FileSystem,
      log: String, next: String): Unit =
    if (kept.isEmpty) {
      if (fs.exists(path(next))) fs.delete(path(next), true)
      fs.delete(path(log), true)
    } else {
      // coalesce(1): the log is erasure-request-sized by contract
      kept.coalesce(1).write
        .partitionBy("batch_id")
        .mode("overwrite").parquet(next)
      fs.delete(path(log), true)
      require(fs.rename(path(next), path(log)),
        s"cannot swap staged tombstone log $next into place")
    }
}
