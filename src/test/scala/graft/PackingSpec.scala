package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sequence packing: exact slice map on a worked example, reassembly
  * invariants on arbitrary corpora, and partition-layout invariance of
  * the two-phase prefix sum.
  */
class PackingSpec extends SparkSpec {

  private def collectPacked(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._4))

  test("packSequences: worked example with straddling document") {
    import spark.implicits._
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L), (4L, 2L)).toDF("doc_id", "n_tokens")
    // stream: d1 [0,5) d2 [5,8) d3 [8,12) d4 [12,14); cut every 4
    val got = collectPacked(Packing.packSequences(docs, seqLen = 4))
    val want = Seq(
      (0L, 1L, 0L, 0L, 4L),  // seq 0 = first 4 tokens of doc 1
      (1L, 1L, 4L, 0L, 1L),  // seq 1 starts with doc 1's tail...
      (1L, 2L, 0L, 1L, 3L),  // ...then all of doc 2
      (2L, 3L, 0L, 0L, 4L),  // seq 2 = doc 3 exactly
      (3L, 4L, 0L, 0L, 2L)   // final partial sequence
    )
    assert(got.toSeq === want)
  }

  test("packSequences: slices reassemble every document and tile every sequence") {
    import spark.implicits._
    // Deterministic pseudo-random corpus incl. a doc far longer than a
    // sequence (spans many) and zero-token docs (must vanish).
    val sizes = (0L until 300L).map(i =>
      (i, if (i % 37 == 0) 0L else 1 + (i * i * 2654435761L % 97))) :+ (1000L, 5000L)
    val docs = sizes.toDF("doc_id", "n_tokens")
    val L = 64L
    val packed = collectPacked(Packing.packSequences(docs, L))
    val positive = sizes.filter(_._2 > 0).toMap
    // every positive doc reassembles: slices in seq order are contiguous
    // from offset 0 and sum to the doc length
    val bySlicedDoc = packed.groupBy(_._2)
    assert(bySlicedDoc.keySet === positive.keySet)
    for ((doc, slices) <- bySlicedDoc) {
      val inOrder = slices.sortBy(_._1)
      assert(inOrder.map(_._5).sum === positive(doc), s"doc $doc length")
      val offs = inOrder.map(_._3)
      assert(offs.head === 0L && offs === inOrder.map(_._5).scanLeft(0L)(_ + _).init,
        s"doc $doc slices not contiguous")
    }
    // every sequence tiles [0, L) exactly (last may be partial), with
    // contiguous seq_offsets
    val total = positive.values.sum
    val lastSeq = (total - 1) / L
    for ((seq, slices) <- packed.groupBy(_._1)) {
      val inOrder = slices.sortBy(_._4)
      val expectLen = if (seq == lastSeq) total - lastSeq * L else L
      assert(inOrder.map(_._5).sum === expectLen, s"seq $seq fill")
      assert(inOrder.map(_._4) === inOrder.map(_._5).scanLeft(0L)(_ + _).init,
        s"seq $seq slices not contiguous")
    }
    // stats agree
    val stats = Packing.packingStats(
      Packing.packSequences(docs, L), L).collect().head
    assert(stats.getLong(0) === lastSeq + 1)
    assert(stats.getLong(1) === total)
  }

  test("packSequences: output is invariant to the partition count") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, 1 + i % 13)).toDF("doc_id", "n_tokens")
    val one = collectPacked(Packing.packSequences(docs, 32, nParts = 1)).toSeq
    val seven = collectPacked(Packing.packSequences(docs, 32, nParts = 7)).toSeq
    val thirty = collectPacked(Packing.packSequences(docs, 32, nParts = 32)).toSeq
    assert(one === seven)
    assert(one === thirty)
  }

  test("packSequences: duplicate doc ids fail loudly instead of double-counting") {
    import spark.implicits._
    // A duplicate id has no defined stream position; the old RANGE-frame
    // running sum silently handed both rows the full tied cumulative
    // (overlapping spans, double-counted tokens). Now the adjacent-equal
    // guard throws at execution.
    val docs = Seq((1L, 5L), (2L, 3L), (2L, 4L), (3L, 2L)).toDF("doc_id", "n_tokens")
    val e = intercept[Throwable] { Packing.packSequences(docs, 4).count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("duplicate doc_id")),
      s"expected the duplicate-id assertion, got: $e")
  }

  test("packSequences orderCol: shuffled stream packs exactly, dup pairs fail") {
    import spark.implicits._
    val docs = (0L until 120L).map(i => (i, 1 + i % 7))
      .toDF("doc_id", "n_tokens")
      .withColumn("srk", md5(concat_ws(":", lit("s"), col("doc_id"))))
    val packed = Packing.packSequences(docs, seqLen = 16, orderCol = "srk")
    val rows = collectPacked(packed)
    // Conservation and tiling hold regardless of stream order.
    val total = (0L until 120L).map(i => 1 + i % 7).sum
    assert(rows.map(_._5).sum === total)
    val perSeq = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = perSeq.keys.max
    assert(perSeq.filter(_._1 != lastSeq).values.forall(_ == 16L))
    // The stream really follows the hash, not the id: seq 0's docs are
    // the hash-order head, which must not be ids 0,1,2,...
    val ordered = docs.select("doc_id", "srk").collect()
      .sortBy(r => (r.getString(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val streamIds = rows.sortBy(t => (t._1, t._4)).map(_._2).distinct.toSeq
    assert(streamIds === ordered, "packed stream is not in orderCol order")
    assert(streamIds !== streamIds.sorted, "hash order collapsed to id order")
    // Same (orderCol, idCol) pair twice = undefined position -> loud.
    val dup = (Seq((1L, 3L), (2L, 3L), (2L, 3L)))
      .toDF("doc_id", "n_tokens").withColumn("srk", lit("k"))
    val ex = intercept[Exception] {
      Packing.packSequences(dup, 8, orderCol = "srk").collect()
    }
    assert(ex.getMessage.contains("duplicate") ||
      Option(ex.getCause).exists(_.getMessage.contains("duplicate")))
    // ...but a REPEATED id with distinct keys is legal: the epoch-
    // repeat composition (each copy owns its stream slot).
    val epochs = Seq((5L, 4L, "a"), (5L, 4L, "b"), (6L, 4L, "c"))
      .toDF("doc_id", "n_tokens", "srk")
    val rep = Packing.packSequences(epochs, 8, orderCol = "srk")
      .agg(sum(col("slice_len"))).head().getLong(0)
    assert(rep === 12L, "epoch copies must each occupy their own span")
  }

  test("packSequences: seq ids stay exact past 2^53 tokens (integer div)") {
    import spark.implicits._
    // One doc of k·2^40 − 1 tokens (> 2^53) cut every 2^40: the last
    // sequence is k−1 = 8192. Double-routed division rounds (n−1) up to
    // k·2^40 and yields a phantom sequence 8193 with a NEGATIVE slice —
    // exactly the 2^53 hazard the `div` formulation removes.
    val L = 1L << 40
    val n = ((1L << 13) + 1) * L - 1
    val docs = Seq((1L, n)).toDF("doc_id", "n_tokens")
    val packed = Packing.packSequences(docs, L)
    val agg = packed.agg(max(col("seq_id")), min(col("slice_len")),
      sum(col("slice_len"))).collect().head
    assert(agg.getLong(0) === (1L << 13))
    assert(agg.getLong(1) > 0L, "phantom sequence with non-positive slice")
    assert(agg.getLong(2) === n)
  }

  test("packSequences over the documents table: every token lands exactly once") {
    val docs = graft.ops.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), w -> w <> '')")).cast("long").as("n_tokens"))
    val total = docs.filter(col("n_tokens") > 0)
      .agg(sum(col("n_tokens"))).collect().head.getLong(0)
    val packed = Packing.packSequences(docs, 512)
    val packedTotal = packed.agg(sum(col("slice_len"))).collect().head.getLong(0)
    assert(packedTotal === total)
    val stats = Packing.packingStats(packed, 512).collect().head
    val nSeq = (total + 511) / 512
    assert(stats.getLong(0) === nSeq)
    // the ONLY waste is the final partial sequence
    assert(stats.getDouble(4) === total.toDouble / (nSeq * 512).toDouble)
  }

  test("packTokenIds: worked example — payload equals the stream, cut at seqLen") {
    import spark.implicits._
    // Docs of 3, 5, 4 ids; seqLen 4 → stream of 12 cut into exactly
    // [0,1,2,10], [11,12,13,14], [20,21,22,23]: doc 1 straddles the
    // first cut, doc 2 straddles nothing but fills sequence 2 alone.
    val docs = Seq(
      (0L, Seq(0L, 1L, 2L)),
      (1L, Seq(10L, 11L, 12L, 13L, 14L)),
      (2L, Seq(20L, 21L, 22L, 23L))
    ).toDF("doc_id", "token_ids")
    val got = Packing.packTokenIds(docs, seqLen = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got === Map(
      0L -> Seq(0L, 1L, 2L, 10L),
      1L -> Seq(11L, 12L, 13L, 14L),
      2L -> Seq(20L, 21L, 22L, 23L)))
  }

  test("materializeSlices: duplicate ids rows fail loudly; non-default idCol works") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq(0L, 1L, 2L)),
      (1L, Seq(10L, 11L, 12L, 13L, 14L)))
    // Non-default idCol: the slice map always exposes doc_id; idCol
    // names the ids-side column (was an AnalysisException before the
    // round-11 review fix).
    val renamed = docs.toDF("my_id", "token_ids")
    val ok = Packing.packTokenIds(renamed, seqLen = 4, idCol = "my_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(ok === Map(0L -> Seq(0L, 1L, 2L, 10L), 1L -> Seq(11L, 12L, 13L, 14L)))
    // Fan-out hazard: an ids frame carrying one doc twice must throw
    // the guard's message, never emit a double-packed training row.
    val slices = Packing.packSequences(
      docs.toDF("doc_id", "token_ids")
        .select(col("doc_id"), size(col("token_ids")).cast("long").as("n_tokens")),
      seqLen = 4)
    val fanned = (docs ++ Seq((1L, Seq(10L, 11L, 12L, 13L, 14L))))
      .toDF("doc_id", "token_ids")
    val ex = intercept[Throwable] {
      Packing.materializeSlices(slices, fanned).collect()
    }
    val msgs = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate rows per doc"),
      s"expected the loud fan-out guard, got: $msgs")
    // Pruning hazard (round-11 review): a consumer that drops the
    // payload column and reads ONLY doc_spans must still trip the
    // guard — before the fix, column pruning discarded the one column
    // carrying the assert and the spans came back silently overlapped.
    val ex2 = intercept[Throwable] {
      Packing.materializeSlices(slices, fanned, boundaries = true)
        .select("seq_id", "doc_spans").collect()
    }
    val msgs2 = Iterator.iterate(ex2)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs2.contains("duplicate rows per doc"),
      s"expected the guard on the pruned doc_spans path, got: $msgs2")
  }

  test("materializeSlices boundaries: doc_spans tile each sequence in order") {
    import spark.implicits._
    val docs = Seq(
      (0L, Seq(0L, 1L, 2L)),
      (1L, Seq(10L, 11L, 12L, 13L, 14L)),
      (2L, Seq(20L, 21L, 22L, 23L))).toDF("doc_id", "token_ids")
    val slices = Packing.packSequences(
      docs.select(col("doc_id"), size(col("token_ids")).cast("long").as("n_tokens")),
      seqLen = 4)
    val rows = Packing.materializeSlices(slices, docs, boundaries = true)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1),
        r.getSeq[org.apache.spark.sql.Row](2).map(s =>
          (s.getLong(0), s.getLong(1), s.getLong(2)))))
      .sortBy(_._1)
    // seq 0 = doc0 (3 ids) + doc1's first id; seq 1 = doc1's rest;
    // seq 2 = doc2. Spans tile [0, len) contiguously in order.
    assert(rows.map(t => (t._1, t._3)).toSeq === Seq(
      (0L, Seq((0L, 3L, 0L), (3L, 1L, 1L))),
      (1L, Seq((0L, 4L, 1L))),
      (2L, Seq((0L, 4L, 2L)))))
    rows.foreach { case (sid, ids, spans) =>
      assert(spans.map(_._2).sum === ids.length, s"seq $sid spans don't cover it")
      spans.foldLeft(0L) { case (expect, (start, len, _)) =>
        assert(start === expect, s"seq $sid spans not contiguous"); start + len
      }
      // Each span's tokens are the doc's own ids (per the fixtures'
      // value encoding: doc d's ids are 10*d + position).
      spans.foreach { case (start, len, d) =>
        ids.slice(start.toInt, (start + len).toInt).foreach(v =>
          assert(v / 10 === d, s"seq $sid: token $v inside doc-$d span"))
      }
    }
  }

  test("packTokenIds: the materialized payload IS the doc-order stream (real corpus)") {
    // End-to-end over the documents table with real vocab_tokenize ids:
    // flattening the sequences in seq_id order must reproduce the
    // concatenation of every document's id stream in doc_id order, and
    // every sequence except the last must be exactly seqLen long.
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        graft.operators.Tokenizer.tokenIds(spark,
          graft.ops.Extended.Q70Vocab, col("text")).as("token_ids"))
    val seqLen = 512L
    val out = Packing.packTokenIds(docs, seqLen)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    val stream = docs.orderBy("doc_id").collect()
      .flatMap(_.getSeq[Long](1))
    assert(out.map(_._1).toSeq === out.indices.map(_.toLong),
      "seq ids must be dense from 0")
    out.dropRight(1).foreach { case (sid, ids) =>
      assert(ids.length === seqLen, s"sequence $sid not full")
    }
    assert(out.last._2.length === (stream.length % seqLen == 0 match {
      case true => seqLen; case false => stream.length % seqLen
    }), "last sequence must carry total mod seqLen")
    assert(out.flatMap(_._2).toSeq === stream.toSeq,
      "materialized payload diverged from the doc-order stream")
  }
}
