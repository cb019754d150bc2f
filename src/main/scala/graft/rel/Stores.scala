package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-cutting helpers for the engine's batch-partitioned store
  * family (AggStore, Cms, CardinalityStore, KmvStore, QuantileStore,
  * the counted gram store): every one of them persists per-ingest-batch
  * partials under `batch_id=N` partitions with merge-at-read, which
  * makes two capabilities fall out of the layout for free — snapshot
  * (as-of) reads and batch-range reads. Nothing here rewrites data;
  * these are read-path views.
  */
object Stores {

  /** Snapshot read: only batches ≤ `maxBatchId` participate — the
    * reproducible-training-data read. Pin the snapshot id when an
    * experiment starts and every later ingest batch is invisible to
    * it: the same snapshot id always merges the same partials, so the
    * experiment's inputs are bit-replayable no matter how far the
    * store has moved on. The `batch_id` comparison is a PARTITION
    * filter (spec-pinned): a snapshot read prunes to the covered
    * directories and costs no more than a current read.
    *
    * Compose with the store's own merge:
    * `mergePartials(Stores.readAsOf(s, path, n), groupCols)` etc.
    * CAVEAT: compaction folds history into one partition and so
    * truncates the snapshot horizon — pin snapshots only on stores
    * whose compaction cadence respects the experiment's lifetime
    * (the same trade-off every LSM/delta layout documents). */
  def readAsOf(s: SparkSession, storePath: String,
      maxBatchId: Long): DataFrame =
    s.read.parquet(storePath)
      .filter(col("batch_id").cast("long") <= maxBatchId)

  /** Batch-range read: partials of batches in [fromId, toId] — the
    * "what changed between snapshots" read (difference of two as-of
    * views for additive stores; the audit window for the rest). */
  def readBatchRange(s: SparkSession, storePath: String,
      fromId: Long, toId: Long): DataFrame =
    s.read.parquet(storePath)
      .filter(col("batch_id").cast("long").between(fromId, toId))
}
