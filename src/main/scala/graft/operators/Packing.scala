package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a curated document corpus into
  * fixed-length training sequences: documents are concatenated in a
  * deterministic order into one virtual token stream and the stream is
  * cut every `seqLen` tokens. Documents MAY straddle a cut (the
  * standard GPT-style packing: zero padding waste except in the final
  * sequence); the output maps every document to the sequence(s) holding
  * it, with exact offsets, so a downstream loader can materialize any
  * sequence by slicing its documents' token ranges.
  *
  * Output, one row per (sequence, document-slice), fully determined by
  * (corpus, seqLen):
  *   - seq_id      — 0-based sequence index in the stream
  *   - doc_id      — the document contributing this slice
  *   - doc_offset  — first token of the slice within the document
  *   - seq_offset  — position of the slice within the sequence
  *   - slice_len   — token count of the slice (> 0)
  * Every document's slices concatenate, in seq_id order, to the whole
  * document; every sequence's slices tile [0, seqLen) exactly (the last
  * sequence tiles [0, total mod seqLen)). Zero-token documents are
  * dropped (nothing to pack).
  *
  * Scale shape — the global prefix sum is the textbook two-phase form,
  * NOT a single-partition window: documents are range-partitioned by
  * id and sorted within partitions; per-partition token totals (one
  * tiny row per partition) take a driver-size window for the partition
  * base offsets, which broadcast back for the within-partition running
  * sum. No stage ever sees more than one partition's rows plus a
  * partition-count-sized side; the explode emits ≤ 1 + len/seqLen rows
  * per document. At 100 TB this is two narrow shuffles (range partition
  * + the per-partition totals) over (id, token-count) pairs — document
  * TEXT never moves.
  */
object Packing {

  /** Pack `docs` (must expose `idCol` and a token-count column `nCol`)
    * into sequences of exactly `seqLen` tokens. Deterministic: stream
    * order is ascending `idCol`. */
  def packSequences(docs: DataFrame, seqLen: Long,
                    idCol: String = "doc_id", nCol: String = "n_tokens",
                    nParts: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val sess = docs.sparkSession
    val parts = if (nParts > 0) nParts
      else math.max(sess.sessionState.conf.numShufflePartitions,
        sess.sparkContext.defaultParallelism)
    val sized = docs.select(col(idCol).as("doc_id"),
        col(nCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("pid", spark_partition_id())
    // Phase 1: per-partition totals — one row per partition — and their
    // exclusive prefix (the partition's base offset in the stream). The
    // window here runs over ≤ `parts` rows, never data.
    val bases = sized.groupBy(col("pid")).agg(sum(col("n")).as("ptotal"))
      .withColumn("base",
        coalesce(sum(col("ptotal")).over(
          Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("pid").as("bpid"), col("base"))
    // Phase 2: within-partition running sum (partitioned window — no
    // global sort) + the broadcast base = each document's [start, end)
    // span in the virtual token stream.
    val wRun = Window.partitionBy("pid").orderBy("doc_id")
    val spans = sized
      .join(broadcast(bases), col("pid") === col("bpid"))
      .withColumn("end", col("base") + sum(col("n")).over(wRun))
      .withColumn("start", col("end") - col("n"))
    // A document spanning [start, end) overlaps sequences
    // floor(start/L) .. floor((end-1)/L); per overlapped sequence the
    // slice bounds are pure arithmetic on the span.
    val L = lit(seqLen)
    val firstSeq = floor(col("start") / L).cast("long")
    val lastSeq = floor((col("end") - 1) / L).cast("long")
    spans
      .select(col("doc_id"), col("start"), col("end"),
        explode(sequence(firstSeq, lastSeq)).as("seq_id"))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("seq_id") * L, col("start")).as("lo"),
        least((col("seq_id") + 1) * L, col("end")).as("hi"),
        col("start"))
      .select(col("seq_id"), col("doc_id"),
        (col("lo") - col("start")).as("doc_offset"),
        (col("lo") - col("seq_id") * L).as("seq_offset"),
        (col("hi") - col("lo")).as("slice_len"))
  }

  /** Packing efficiency summary: sequences, the token count of the last
    * (possibly partial) sequence, and the fill ratio — sanity dial for
    * choosing seqLen. One aggregate over the packed map. */
  def packingStats(packed: DataFrame, seqLen: Long): DataFrame =
    packed.groupBy(col("seq_id"))
      .agg(sum(col("slice_len")).as("seq_tokens"),
           count(lit(1)).as("n_slices"))
      .agg(count(lit(1)).as("n_sequences"),
           sum(col("seq_tokens")).as("total_tokens"),
           max(col("n_slices")).as("max_docs_per_seq"),
           min(col("seq_tokens")).as("min_seq_tokens"))
      .withColumn("fill_ratio",
        col("total_tokens").cast("double") /
          (col("n_sequences") * lit(seqLen)).cast("double"))
}
