package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming incremental dedup — the ingest-time twin of the batch
  * screen ([[graft.operators.Approx.incrementalDedup]] / declared q86).
  * Incremental dedup is INHERENTLY micro-batch shaped: an "increment"
  * is a batch of newly crawled documents, so the streaming form is the
  * batch operator driven by foreachBatch with one piece of state — the
  * increment documents already seen on this stream. Each microbatch is
  * screened against (static index, seen-so-far ∪ batch) and only the
  * batch's own verdicts are emitted; a batch doc pairing a PREVIOUS
  * batch's doc is therefore `dup_new` (both are increment docs), never
  * `dup_old` — the distinction a fold-into-the-index shortcut would
  * get wrong.
  *
  * Ordering contract (same as [[StreamingCap]] / [[StreamingQuota]]):
  * feed batches in doc_id order and the emitted verdicts equal the
  * single-shot batch run row-for-row (proven across three microbatches
  * in StreamingSpec, cross-batch dup_new pair included). On an
  * unordered stream the keep-first convention becomes first-to-arrive
  * (batch id, then doc_id within a batch).
  *
  * Scale shape: the state this twin accumulates is the seen-increment
  * document set — linear in the STREAM, independent of the index. The
  * per-batch recompute of seen signatures is the self-contained form;
  * a production deployment persists the banded signature index through
  * the `md5SetsAndBands` seam and appends each batch's signatures to
  * it, making per-trigger work O(batch × collisions). Verdicts are
  * delivered through `onBatch` (batch id, verdict frame) — the frame
  * is already materialized (collect-safe) when the callback runs.
  */
object StreamingIncrementalDedup {

  /** Configure (not start) the stream: call `.start()` on the result.
    * `increments` must be a STREAMING DataFrame with (doc_id, text);
    * `index` is the static ingested corpus. */
  def writer(spark: SparkSession, index: DataFrame, increments: DataFrame)
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
        // plan analyzes where band_match_before lives.
        val cp = batch.select("doc_id", "text").localCheckpoint()
        val b = spark.createDataFrame(cp.rdd, cp.schema)
        val inc = seen.map(_.unionByName(b)).getOrElse(b)
        val verdicts = graft.operators.Approx
          .incrementalDedup(spark, index, inc)
          .join(b.select("doc_id"), Seq("doc_id"), "left_semi")
          .localCheckpoint()
        seen = Some(inc)
        onBatch(id, verdicts)
      }
  }

  /** Start the stream and return the query (test convenience). */
  def start(spark: SparkSession, index: DataFrame, increments: DataFrame)
           (onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    writer(spark, index, increments)(onBatch).start()
}
