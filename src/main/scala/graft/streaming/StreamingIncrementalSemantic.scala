package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.operators.Approx

/** Streaming incremental SEMANTIC dedup — the ingest-time twin of the
  * batch screen ([[graft.operators.Approx.incrementalSemanticDedup]] /
  * declared q88), completing the streaming story for BOTH dedup
  * families: [[StreamingIncrementalDedup]] covers the lexical MinHash
  * screen, this twin covers the embedding-space one. The structure is
  * identical because incremental dedup is inherently micro-batch
  * shaped: an "increment" is a batch of newly embedded documents, so
  * the streaming form is the batch operator driven by foreachBatch with
  * one piece of state — the increment vectors already seen on this
  * stream. Each microbatch is screened against (static index,
  * seen-so-far ∪ batch) and only the batch's own verdicts are emitted;
  * a batch vector pairing a PREVIOUS batch's vector is therefore
  * `dup_new` (both are increment vectors), never `dup_old` — the
  * distinction a fold-into-the-index shortcut would get wrong.
  *
  * Ordering contract (same as [[StreamingIncrementalDedup]]): feed
  * batches in vec_id order and the emitted verdicts equal the
  * single-shot batch run row-for-row (proven across three microbatches
  * in StreamingSpec, cross-batch dup_new pair included). On an
  * unordered stream the keep-first convention becomes first-to-arrive.
  *
  * Scale shape: the quantizer (index.centroids) is fixed for the
  * stream's lifetime — per-trigger work is the batch's own
  * O(batch × nlist · dim) cell assignment plus within-cell pairing,
  * and the index's cell assignments are precomputed in the stored
  * [[graft.operators.Approx.SemanticIndex]]. The accumulated state is
  * the seen-increment vector set — linear in the STREAM, independent
  * of the index. Verdicts are delivered through `onBatch` (batch id,
  * verdict frame) — the frame is already materialized (collect-safe)
  * when the callback runs.
  */
object StreamingIncrementalSemantic {

  /** Configure (not start) the stream: call `.start()` on the result.
    * `increments` must be a STREAMING DataFrame with
    * (vec_id, embedding); `index` is the static ingested corpus's
    * prebuilt semantic index. */
  def writer(spark: SparkSession, index: Approx.SemanticIndex,
             increments: DataFrame, minSim: Double = 0.35)
            (onBatch: (Long, DataFrame) => Unit): DataStreamWriter[Row] = {
    var seen: Option[DataFrame] = None
    graft.expressions.GraftFunctions.register(spark)
    increments.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // The microbatch frame belongs to the stream's CLONED session,
        // whose function registry snapshot predates any registration
        // the batch operator performs — rebind the (already
        // materialized) batch to the caller's session so the dedup
        // plan analyzes where float_dot/double_dot live.
        val cp = batch.select("vec_id", "embedding").localCheckpoint()
        val b = spark.createDataFrame(cp.rdd, cp.schema)
        val inc = seen.map(_.unionByName(b)).getOrElse(b)
        val verdicts = Approx
          .incrementalSemanticDedup(index, inc, minSim)
          .join(b.select("vec_id"), Seq("vec_id"), "left_semi")
          .localCheckpoint()
        seen = Some(inc)
        onBatch(id, verdicts)
      }
  }

  /** Start the stream and return the query (test convenience). */
  def start(spark: SparkSession, index: Approx.SemanticIndex,
            increments: DataFrame, minSim: Double = 0.35)
           (onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    writer(spark, index, increments, minSim)(onBatch).start()
}
