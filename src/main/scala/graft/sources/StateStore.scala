package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** The `batch_id=`-partitioned parquet convention every incremental
  * index in the library persists through — one partition per folded
  * batch, written with DYNAMIC partition overwrite so a retried batch
  * REPLACES its own partition instead of duplicating it, and a
  * restarted ingest reads every previously folded batch back with one
  * scan. Used by the streaming twins (MinHash signatures, semantic
  * vectors), the log-structured window index, and the composed
  * incremental pipeline's state — one implementation of the seam the
  * round-14 durability work proved.
  *
  * Reads take an EXPLICIT data schema: a state directory that exists
  * but holds no data files yet (a crash between directory creation and
  * the first commit, or an external listing tool touching the path)
  * must read as an empty frame, not crash parquet schema inference —
  * the caller always knows the schema (it is the frame it folds).
  */
object StateStore {

  /** Append/replace one batch's rows as the `batch_id = id` partition
    * of `path`'s parquet table. O(batch) — never rewrites the other
    * partitions.
    *
    * Writes STRAIGHT INTO the `batch_id=id` leaf directory rather than
    * through `partitionBy("batch_id")`: the on-disk layout and the
    * replace-this-partition-only overwrite semantics are identical
    * (partition discovery reads the value from the directory name
    * either way), but a dynamic-partition write SORTS every row by the
    * partition column first — a full external sort on a CONSTANT key,
    * measured as the entire 6.2 GB spill of the 1000×-class window
    * compaction (the agg itself spilled nothing once scan splits were
    * sized; the constant-key sort still buffered all 160M output rows
    * through the external sorter). The direct leaf write is sort-free.
    *
    * Row groups are written at 16 MB (vs parquet's 128 MB default):
    * state tables are narrow hash-keyed rows consumed by full-scan
    * joins and aggregates, where the row group is the real floor on
    * task granularity — `files.maxPartitionBytes` cannot split below
    * it, so a 128 MB-row-group store hands every downstream aggregate
    * 100 MB+-of-raw-rows tasks whose buffers overflow small per-task
    * memory budgets (the 1000×-class compaction's residual spill was
    * exactly this: ~25 row-group-bounded map tasks × ~260 MB shuffle
    * buffers). Selective-scan locality — what big row groups buy —
    * does not apply to these tables. */
  def writePartition(df: DataFrame, path: String, id: Long): Unit =
    df.write.option("parquet.block.size", 16L * 1024 * 1024)
      .mode("overwrite").parquet(s"$path/batch_id=$id")

  /** True iff the state path exists at all (no batch has ever
    * committed → the caller screens against the static index alone). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Create an empty marker file at `path` (parents created) — the
    * durable stores' "this directory was initialized" witness. The
    * underscore-prefixed name keeps it invisible to Spark/parquet
    * directory listings, so it can live beside state tables. */
  def touch(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true).close()
  }

  /** Read every folded partition back, `batch_id` dropped. `dataSchema`
    * is the schema of the frames [[writePartition]] was given (without
    * batch_id) — passed explicitly so a data-less directory yields an
    * empty frame instead of an inference error. A path that does not
    * exist yet also yields an empty frame: "nothing folded" is a
    * normal state, not an error.
    *
    * `beforeBatch` restricts the read to partitions with
    * `batch_id < bound` — a PARTITION-PRUNED filter (no data files of
    * excluded batches are touched). This is the retry fence a
    * foreachBatch consumer needs: a retried batch N that loads state
    * bounded at N cannot see its own crashed attempt's partial append,
    * so fold-then-screen operators whose screens are NOT
    * self-pair-proof (the composed pipeline's fingerprint set) stay
    * idempotent under the exactly-once contract. */
  def readFolded(spark: SparkSession, path: String,
                 dataSchema: StructType,
                 beforeBatch: Option[Long] = None): DataFrame =
    if (!exists(spark, path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        dataSchema)
    else {
      val all = spark.read.schema(dataSchema.add("batch_id", LongType))
        .parquet(path)
      beforeBatch.fold(all)(b => all.filter(col("batch_id") < b))
        .drop("batch_id")
    }
}
