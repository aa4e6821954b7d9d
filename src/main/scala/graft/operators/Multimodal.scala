package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * engine as opaque BinaryType columns with typed metadata, exactly like
  * any other column — partitionable, joinable, writable to parquet
  * (SURVEY.md §2.10 capability row).
  *
  * The Spark-side mechanics (schema, batch shape, partitioning, the
  * mapPartitions decode seam) are real and tested; the actual media
  * decode is STUBBED with a deterministic fake — media codecs are not in
  * this container. Swapping `stubDecode` for a JNI/FFmpeg/JavaCV call (or
  * an `mapInArrow` Python worker) changes nothing about the plan shape.
  */
object Multimodal {

  /** The typed media row: payload + metadata. Mirrors Spark's own
    * binaryFile source schema (path, modificationTime, length, content). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)
  ))

  /** Directory-of-files reader — Spark's binaryFile source; each file one
    * row, content as BinaryType. At scale: prefer consolidating small
    * files into parquet with a binary column (this module's layout) over
    * millions of raw files, which crush the file-listing phase. */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Synthesizes a deterministic media table from the documents table —
    * the testdata has no binary payloads, so payload bytes are derived
    * from doc text (stable across runs; no RNG). Exercises the real
    * BinaryType path end-to-end. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("content"),
      map(lit("src"), col("source"), lit("n_chars"), col("n_chars").cast("string")).as("meta"))

  /** STUB decode: deterministic per-payload "features" (length, xxhash64
    * fingerprint, fake 8-dim embedding from hash bytes). A real decoder
    * replaces only the expressions marked below; the output schema,
    * per-partition batching, and downstream joins are the production
    * shape. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    // real impl: mapPartitions { iter => codec.decode(row.content) ... }
    val h = xxhash64(col("content"))
    val fakeEmbedding = array((0 until 8).map(i =>
      (pmod(shiftright(h, i * 8).bitwiseAND(255), lit(256)).cast("double") / 255.0)): _*)
    media.select(
      col("media_id"), col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      h.as("content_fp"),
      fakeEmbedding.as("features"))
  }

  /** Frame/chunk sampling stub: for video/audio payloads emit every k-th
    * chunk of the byte stream as its own row — the plan shape of frame
    * extraction (explode keeps it parallel; no driver collect). Each row
    * carries ITS OWN byte slice (substring over the binary at
    * chunk_idx·chunkBytes, then base64) — slicing the base64 text at a
    * fixed offset would emit the first chunk's bytes for every index. */
  def sampleChunks(media: DataFrame, chunkBytes: Int = 64, everyK: Int = 2): DataFrame =
    media
      .withColumn("n_chunks",
        greatest(ceil(length(col("content")).cast("double") / chunkBytes).cast("int"), lit(1)))
      .withColumn("chunk_idx",
        explode(filter(sequence(lit(0), col("n_chunks") - 1), i => pmod(i, lit(everyK)) === 0)))
      .select(col("media_id"), col("kind"), col("chunk_idx"),
        base64(expr(s"substring(content, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
          .as("chunk_b64"))
}
