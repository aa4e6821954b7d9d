package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Encoding-adaptive reads for parquet tables whose timestamp column's
  * PHYSICAL encoding varies — across regenerations of the same table, or
  * across the files of one table written over years (the realistic shape
  * of a 100 TB lake: ns/µs/ms annotations, naive vs UTC-adjusted, even
  * raw int64 epochs, all under one path).
  *
  * A fixed-schema read over such data either fails mid-scan on the
  * minority files (low-level converter error) or — far worse — decodes
  * one group at the wrong unit and produces silently shifted timestamps.
  * This round-7 postmortem class (a regeneration moved `events.ts` from
  * ns to µs and a hardcoded `div 1000` collapsed every timestamp 1000×
  * without a single error) is exactly what this reader eliminates:
  * per-file footer probes, one normalized scan per encoding group, and a
  * LOUD refusal for anything ambiguous.
  */
object AdaptiveTimestamps {

  /** Any epoch value ≥ this is unambiguously NANOseconds (it would be
    * year 5138+ as µs); raw int64 below it is NOT trusted as ns — see
    * the magnitude guard in [[tsEncodings]]. 1e17 ns = 1973-03-03. */
  private[graft] val MinPlausibleEpochNs = 100000000000000000L

  /** Per-file encodings of `tsCol` under `path` — parquet footers read
    * directly (no Spark job), keyed by the Spark type each file's column
    * surfaces as under this session:
    *   - `TimestampNTZType`: naive (isAdjustedToUTC=false) µs/ms
    *     timestamp annotations;
    *   - `TimestampType`: instant-semantics (isAdjustedToUTC=true) µs/ms
    *     annotations AND legacy INT96 (Hive/Impala/old-Spark) — read as
    *     LTZ, then rendered as UTC wall-clock;
    *   - `LongType`: ns annotations (via `nanosAsLong`) and unannotated
    *     int64 whose column statistics are ns-magnitude (the raw-epoch-ns
    *     contract). Unannotated int64 that could be µs/ms/s THROWS, and so
    *     does unannotated int64 with no usable stats to corroborate ns —
    *     guessing the unit is exactly how silent 1000× collapses happen.
    * Any other physical shape throws.
    *
    * Footer reads are driver-side and sequential — the same metadata pass
    * Spark's own schema inference makes; a lake with millions of files
    * would distribute this loop (parallelize the file list, read footers
    * on executors), which changes nothing downstream. */
  private[graft] def tsEncodings(
      s: SparkSession, path: String, tsCol: String): Map[DataType, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, /* recursive = */ true)
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (f.isFile && !n.startsWith("_") && !n.startsWith("."))
        files += f.getPath.toString
    }
    files.toSeq.groupBy { file =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file), s.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val sch = reader.getFileMetaData.getSchema
        if (!sch.containsField(tsCol))
          throw new IllegalStateException(
            s"$tsCol is missing from $file (columns: ${sch.getFields.asScala.map(_.getName).mkString(", ")}) — " +
              "the table's column set has drifted, not just its encoding.")
        val ts = sch.getFields.get(sch.getFieldIndex(tsCol))
        val primitive = if (ts.isPrimitive) ts.asPrimitiveType.getPrimitiveTypeName else null
        if (primitive == PrimitiveTypeName.INT96) {
          // Legacy Hive/Impala/old-Spark encoding, still common in real
          // lakes. Spark decodes it natively as an instant → same LTZ
          // read + UTC-wall-clock rendering as adjusted-to-UTC int64.
          TimestampType
        } else if (primitive != PrimitiveTypeName.INT64) {
          throw new IllegalStateException(
            s"$tsCol decoded as $ts in $file — expected a µs/ms timestamp, " +
              "int64 ns, or legacy INT96. The data's encoding has drifted; extend " +
              "AdaptiveTimestamps rather than letting queries run against a misread column.")
        } else ts.getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            if (t.getUnit == TimeUnit.NANOS) {
              // The ns-annotated read path needs the session to surface the
              // column as Long; without the flag the scan dies mid-read with
              // a low-level parquet converter error instead of this module's
              // curated drift message — so check it here, at probe time.
              if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
                throw new IllegalStateException(
                  s"$tsCol is ns-annotated in $file but the session does not set " +
                    "spark.sql.legacy.parquet.nanosAsLong=true — set it (Graft sessions " +
                    "do) so ns columns surface as Long for explicit normalization.")
              LongType
            }
            else if (t.isAdjustedToUTC) TimestampType
            else TimestampNTZType
          case null =>
            // Raw int64 has NO declared unit. A contract may say epoch-ns,
            // but trusting that blindly is the silent-collapse class — so
            // corroborate with the footer's own column statistics (free,
            // same metadata already in hand) and refuse ambiguous data.
            val tsMax = reader.getFooter.getBlocks.asScala.iterator.flatMap { b =>
              b.getColumns.asScala.find(_.getPath.toDotString == tsCol)
                .map(_.getStatistics).filter(st => st != null && st.hasNonNullValue)
                .map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            }.maxOption
            tsMax match {
              case Some(m) if m >= MinPlausibleEpochNs => LongType // ns-magnitude confirmed
              case Some(m) => throw new IllegalStateException(
                s"$tsCol is unannotated int64 with max value $m in $file — " +
                  "too small to be epoch-ns (would be pre-1973); it is probably " +
                  "epoch-µs/ms/s. Refusing to guess the unit: annotate the column " +
                  "or extend AdaptiveTimestamps with the actual encoding.")
              case None => throw new IllegalStateException(
                s"$tsCol is unannotated int64 with no usable column statistics in $file — " +
                  "nothing corroborates the epoch-ns contract, and a writer that " +
                  "stored µs/ms here would be silently collapsed 1000×. Refusing to " +
                  "guess the unit: annotate the column, write stats, or extend " +
                  "AdaptiveTimestamps with the actual encoding.")
            }
          case other => throw new IllegalStateException(
            s"$tsCol decoded as int64[$other] in $file — unsupported annotation")
        }
      } finally reader.close()
    }
  }

  /** Reads the parquet table at `path` with `schema` (which declares
    * `tsCol` as `TimestampNTZType`), normalizing every file's `tsCol` to
    * a naive µs timestamp regardless of its physical encoding:
    *   - naive µs/ms annotations → read as TIMESTAMP_NTZ directly
    *     (time predicates push down to the scan — the ns path below
    *     can't offer that);
    *   - adjusted-to-UTC µs/ms annotations → read as TIMESTAMP, cast to
    *     NTZ: the stored instants surface as UTC wall-clock (engine
    *     sessions pin the UTC time zone);
    *   - ns-annotated or stats-corroborated raw int64 (surfaced as Long
    *     under `spark.sql.legacy.parquet.nanosAsLong`) → `ts div 1000` →
    *     µs. `div` = integral division: `/` would go through DOUBLE,
    *     which cannot represent epoch-ns exactly (2^53 < 1.7e18) and
    *     yields ±1µs errors.
    * A single-encoding table (the overwhelmingly common case) reads the
    * directory itself — identical plan to a plain `spark.read.parquet`.
    * A MIXED table unions one normalized scan per group (`basePath`
    * preserves partition columns). Unknown encodings throw
    * (SchemaDriftSpec). */
  def readNormalized(s: SparkSession, path: String, schema: StructType,
                     tsCol: String): DataFrame = {
    // The adjusted-UTC/INT96 branch renders instants as wall-clock via an
    // LTZ→NTZ cast, which uses the SESSION time zone. Every Graft session
    // pins UTC; a non-UTC caller would get silently shifted timestamps, so
    // fail loudly here at the call boundary rather than drift quietly.
    val tz = s.conf.get("spark.sql.session.timeZone")
    if (tz != "UTC" && tz != "Etc/UTC" && tz != "+00:00")
      throw new IllegalStateException(
        s"AdaptiveTimestamps.readNormalized requires spark.sql.session.timeZone=UTC " +
          s"(found '$tz'): the adjusted-UTC/INT96 normalization casts LTZ→NTZ, which " +
          "renders wall-clock in the session zone — a non-UTC session would shift " +
          "every instant-encoded timestamp silently.")
    def tsAs(t: DataType) = StructType(schema.map(f =>
      if (f.name == tsCol) f.copy(dataType = t) else f))
    def read(sch: StructType, paths: Seq[String]): DataFrame =
      if (paths.isEmpty) s.read.schema(sch).parquet(path)
      else s.read.schema(sch).option("basePath", path).parquet(paths: _*)
    def readGroup(enc: DataType, paths: Seq[String]): DataFrame = enc match {
      case TimestampNTZType => read(schema, paths)
      case TimestampType => read(tsAs(TimestampType), paths)
        .withColumn(tsCol, col(tsCol).cast("timestamp_ntz"))
      case LongType => read(tsAs(LongType), paths)
        .withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")).cast("timestamp_ntz"))
      case other => throw new IllegalStateException(
        s"$tsCol group $other (${paths.size} files) has no reader")
    }
    tsEncodings(s, path, tsCol).toSeq.sortBy(_._1.typeName) match {
      case Seq((enc, _)) => readGroup(enc, Nil) // whole-directory fast path
      case groups if groups.nonEmpty =>
        groups.map { case (enc, files) => readGroup(enc, files) }
          .reduce(_ unionByName _)
      case _ => throw new IllegalStateException(s"no parquet files under $path")
    }
  }
}
