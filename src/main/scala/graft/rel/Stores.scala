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
    * Compaction folds history into one partition and so truncates the
    * snapshot horizon — ENFORCED (r17): a snapshot below the
    * persisted [[FoldWatermark]] fails loudly instead of silently
    * merging an empty/partial view; pin snapshots only on stores
    * whose compaction cadence respects the experiment's lifetime
    * (the same trade-off every LSM/delta layout documents). */
  def readAsOf(s: SparkSession, storePath: String,
      maxBatchId: Long): DataFrame = {
    FoldWatermark.requireAtOrAbove(s, storePath, maxBatchId)
    s.read.parquet(storePath)
      .filter(col("batch_id").cast("long") <= maxBatchId)
  }

  /** Batch-range read: partials of batches in [fromId, toId] — the
    * "what changed between snapshots" read (difference of two as-of
    * views for additive stores; the audit window for the rest).
    * The INCLUSIVE lower bound must sit strictly above the fold
    * watermark: the `batch_id=watermark` fold partition aggregates
    * ALL prior history, so a window opening at or below it would
    * silently include every folded batch's contribution. */
  def readBatchRange(s: SparkSession, storePath: String,
      fromId: Long, toId: Long): DataFrame = {
    FoldWatermark.requireAbove(s, storePath, fromId)
    s.read.parquet(storePath)
      .filter(col("batch_id").cast("long").between(fromId, toId))
  }

  /** Store manifest — what the single maintenance owner looks at
    * before compacting, snapshotting, or rebuilding: one row per
    * batch partition (id, row count, file count, bytes) plus the
    * adjacent mutation state (tombstoned key count / gated batch ids
    * from the `_tombstones` log, when one exists). Negative batch ids
    * are maintenance artifacts: compaction folds (reserved partitions)
    * or out-of-band deletion batches, per the owning store's
    * convention. Row counts come from parquet FOOTERS — metadata
    * reads, no Spark job per partition (a store can hold thousands of
    * batches; launching a count() job per batch would be a
    * driver-side job loop — the manifest must stay a metadata
    * operation no matter how many batches exist).
    */
  def describe(s: SparkSession, storePath: String): DataFrame = {
    import s.implicits._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(conf)
    val parts = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("batch_id="))
    val rows = parts.map { st =>
      val id = st.getPath.getName.stripPrefix("batch_id=").toLong
      val files = fs.listStatus(st.getPath).filter(f => f.isFile &&
        f.getPath.getName.endsWith(".parquet"))
      val nRows = files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
      (id, nRows, files.length.toLong, files.map(_.getLen).sum)
    }.sortBy(_._1)
    val tombstoned = Tombstones.deletedKeys(s, storePath)
      .map(_.count()).getOrElse(0L)
    rows.toDF("batch_id", "n_rows", "n_files", "bytes")
      .withColumn("n_tombstoned_keys", lit(tombstoned))
  }
}
