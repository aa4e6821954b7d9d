package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Tables

/** Testdata-drift guard (round-8 postmortem: the sandbox regenerated the
  * parquet fixtures and changed events.ts from timestamp[ns] to
  * timestamp[us]; the then-hardcoded ns conversion silently collapsed
  * every timestamp 1000× and eight queries went wrong WITHOUT A SINGLE
  * ERROR). These tests make the next silent regeneration fail loudly,
  * and pin the full [[graft.sources.AdaptiveTimestamps]] encoding
  * matrix:
  *
  *  1. Every table's parquet footer must still infer to the schema the
  *     explicit readers assume (`Tables.schemas`), with events.ts allowed
  *     either encoding the adaptive reader handles.
  *  2. Every supported encoding round-trips to the same normalized
  *     instants: naive µs, naive ms, adjusted-UTC µs, ns-as-long,
  *     legacy INT96, a mixed flat directory, and a hive-partitioned
  *     mixed layout (partition columns must survive the per-group file
  *     lists). (A Spark-written Long column is plain int64, not
  *     ns-annotated — but under `nanosAsLong` both surface as LongType,
  *     which is exactly the signal the reader dispatches on, so the
  *     fixture drives the same code path as real ns data.)
  *  3. Ambiguous or unsupported encodings must THROW, not mis-read:
  *     unannotated int64 whose stats are µs-magnitude, unannotated int64
  *     with no usable stats at all (nothing corroborates the ns
  *     contract), and non-timestamp physical types.
  *  4. Session-config hazards fail loudly at the boundary: a non-UTC
  *     session (the LTZ→NTZ normalization would silently shift instants)
  *     and a missing `nanosAsLong` flag on ns-annotated data (which would
  *     otherwise die mid-scan with a low-level converter error).
  */
class SchemaDriftSpec extends SparkSpec {

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Fixture dirs live under one suite root, removed in afterAll — repeated
  // runs must not accumulate parquet junk in /tmp.
  private val fixtureRoot = java.nio.file.Files.createTempDirectory("drift_spec")
  private def fixtureDir(name: String): String =
    java.nio.file.Files.createDirectory(fixtureRoot.resolve(name)).toString

  override def afterAll(): Unit = {
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(fixtureRoot).iterator().asScala.toSeq
        .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    } finally super.afterAll()
  }

  test("parquet footers at sf0.001 still match the explicit reader schemas") {
    for (name <- tableNames) {
      val inferred = spark.read.parquet(s"$sf0001/$name.parquet").schema
      val expected = Tables.schemas(name)
      assert(inferred.fieldNames.toSeq === expected.fieldNames.toSeq,
        s"$name: column set/order drifted")
      for ((inf, exp) <- inferred.fields.zip(expected.fields)) {
        if (name == "events" && inf.name == "ts") {
          // Either encoding the adaptive reader supports: µs/ms timestamp
          // (→ TimestampNTZType) or ns-annotated int64 (→ LongType under
          // nanosAsLong). Anything else = regeneration drift.
          assert(inf.dataType == TimestampNTZType || inf.dataType == LongType,
            s"events.ts drifted to unsupported encoding ${inf.dataType}")
        } else {
          assert(inf.dataType === exp.dataType,
            s"$name.${inf.name}: footer gives ${inf.dataType}, readers assume ${exp.dataType}")
        }
      }
    }
  }

  private def probe(dir: String): Set[org.apache.spark.sql.types.DataType] =
    graft.sources.AdaptiveTimestamps.tsEncodings(spark, s"$dir/events.parquet", "ts").keySet

  // Six-column events fixture rows, ts expressed as epoch-µs.
  private val fixtureUs = Seq(
    (1L, 1704067200000000L, 10L, "click", 1.5, """{"k":1}"""),
    (2L, 1704067201500000L, 10L, "purchase", 2.5, """{"k":2}"""),
    (3L, 1704067203000001L, 11L, "view", 3.5, """{"k":3}"""))

  test("Tables.events: µs-timestamp and ns-long encodings normalize identically") {
    import spark.implicits._
    val dirUs = fixtureDir("us")
    val dirNs = fixtureDir("ns")

    // µs branch: write ts as a real naive timestamp (parquet timestamp[us]
    // under the session's TIMESTAMP_MICROS output type).
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dirUs/events.parquet")
    assert(probe(dirUs) === Set(TimestampNTZType))

    // ns branch: write ts as raw epoch-ns longs (int64 footer → LongType).
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts") * lit(1000L))
      .write.mode("overwrite").parquet(s"$dirNs/events.parquet")
    assert(probe(dirNs) === Set(LongType))

    val us = Tables.events(spark, dirUs).orderBy("event_id")
    val ns = Tables.events(spark, dirNs).orderBy("event_id")
    assert(us.schema("ts").dataType === TimestampNTZType)
    assert(ns.schema("ts").dataType === TimestampNTZType)
    assert(us.collect().toSeq === ns.collect().toSeq)
    // And the values are the written instants, not a 1000×-collapsed echo.
    val micros = us.select(unix_micros(col("ts").cast("timestamp"))).as[Long].collect()
    assert(micros.toSeq === fixtureUs.map(_._2))
  }

  test("Tables.events: a MIXED-encoding directory normalizes every file (100 TB lake shape)") {
    import spark.implicits._
    // One table directory whose files disagree on the ts encoding — the
    // realistic shape of a lake written across years. A naive single-
    // schema read fails mid-scan on the minority files (or worse, decodes
    // them 1000× off); the adaptive reader must union one normalized scan
    // per encoding group and lose nothing.
    val dir = fixtureDir("mixed")
    val tablePath = s"$dir/events.parquet"
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .coalesce(1).write.mode("append").parquet(tablePath)
    val shifted = fixtureUs.map { case (id, ts, u, e, v, p) => (id + 10, ts, u, e, v, p) }
    shifted.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts") * lit(1000L))
      .coalesce(1).write.mode("append").parquet(tablePath)

    assert(probe(dir) === Set(TimestampNTZType, LongType))
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampNTZType)
    val got = out.select(col("event_id"), unix_micros(col("ts").cast("timestamp")))
      .as[(Long, Long)].collect().toMap
    assert(got.size === 6)
    for ((id, ts, _, _, _, _) <- fixtureUs) {
      assert(got(id) === ts, s"µs-file row $id")
      assert(got(id + 10) === ts, s"ns-file row ${id + 10} not normalized")
    }
  }

  test("AdaptiveTimestamps: a PARTITIONED mixed-encoding layout keeps partition columns") {
    import spark.implicits._
    // The true lake shape: hive-partitioned directories where each
    // partition era carries its own encoding (day=1 written by the new
    // µs pipeline, day=2 by the old ns one). The group reads go through
    // explicit file lists, so `basePath` must reconstruct the partition
    // column for every group.
    val dir = fixtureDir("part_mixed")
    val tablePath = s"$dir/events.parquet"
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"$tablePath/day=1")
    val shifted = fixtureUs.map { case (id, ts, u, e, v, p) => (id + 10, ts, u, e, v, p) }
    shifted.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts") * lit(1000L))
      .coalesce(1).write.parquet(s"$tablePath/day=2")

    val out = graft.sources.AdaptiveTimestamps.readNormalized(
      spark, tablePath, Tables.schemas("events"), "ts")
    assert(out.schema.fieldNames.contains("day"), "partition column lost")
    assert(out.schema("ts").dataType === TimestampNTZType)
    val got = out.select(col("event_id"), col("day").cast("int"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size === 6)
    for ((id, ts, _, _, _, _) <- fixtureUs) {
      assert(got(id) === ((1, ts)), s"µs partition row $id")
      assert(got(id + 10) === ((2, ts)), s"ns partition row ${id + 10}")
    }
  }

  test("Tables.events: instant-semantics (adjusted-to-UTC) µs surfaces as UTC wall-clock") {
    import spark.implicits._
    val dir = fixtureDir("ltz")
    // timestamp_micros WITHOUT the ntz cast = TimestampType (LTZ) → the
    // session's TIMESTAMP_MICROS output writes isAdjustedToUTC=true. This
    // is exactly what a user pipeline writing instants produces.
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(probe(dir) === Set(TimestampType))
    val out = Tables.events(spark, dir).orderBy("event_id")
    assert(out.schema("ts").dataType === TimestampNTZType)
    // Under the pinned UTC session, the UTC instants render as the same
    // wall-clock values the naive-µs twin carries.
    val micros = out.select(unix_micros(col("ts").cast("timestamp"))).as[Long].collect()
    assert(micros.toSeq === fixtureUs.map(_._2))
  }

  test("Tables.events: ms-annotated timestamps normalize to the same instants") {
    import spark.implicits._
    val dir = fixtureDir("ms")
    // ms-aligned values only — a TIMESTAMP_MILLIS write truncates µs
    // jitter, which would make equality vacuously false, not a reader bug.
    val msAligned = fixtureUs.map { case (id, ts, u, e, v, p) => (id, ts / 1000 * 1000, u, e, v, p) }
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try msAligned.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assert(probe(dir) === Set(TimestampNTZType))
    val micros = Tables.events(spark, dir).orderBy("event_id")
      .select(unix_micros(col("ts").cast("timestamp"))).as[Long].collect()
    assert(micros.toSeq === msAligned.map(_._2))
  }

  test("Tables.events: legacy INT96 timestamps normalize to the same instants") {
    import spark.implicits._
    val dir = fixtureDir("int96")
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    // INT96 writes require an instant (LTZ) column, not NTZ.
    try fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assert(probe(dir) === Set(TimestampType))
    val out = Tables.events(spark, dir).orderBy("event_id")
    assert(out.schema("ts").dataType === TimestampNTZType)
    val micros = out.select(unix_micros(col("ts").cast("timestamp"))).as[Long].collect()
    assert(micros.toSeq === fixtureUs.map(_._2))
  }

  test("Tables.events: unannotated int64 of µs magnitude is refused, not collapsed") {
    import spark.implicits._
    // The round-7 failure class: a raw Long column the ns contract would
    // div-1000 into 1970. The footer-stats magnitude guard must refuse to
    // guess the unit (epoch-µs for 2024 is ~1.7e15, far below the 1e17
    // plausibility floor for ns).
    val dir = fixtureDir("raw_us")
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("too small to be epoch-ns"))
  }

  test("Tables.events: a file missing the ts column names the drift, not a parquet internal") {
    import spark.implicits._
    val dir = fixtureDir("no_ts")
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .drop("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("ts is missing from"))
    assert(e.getMessage.contains("column set has drifted"))
  }

  test("Tables.events: unannotated int64 with NO usable stats is refused, not assumed ns") {
    import spark.implicits._
    // A writer that omits (or nulls out) column statistics gives the
    // magnitude guard nothing to corroborate the epoch-ns contract with.
    // Defaulting to ns here would re-open the silent 1000× collapse for
    // µs/ms writers that skip stats — so the reader must refuse. An
    // all-null column is the easiest stats-less shape to produce: parquet
    // records no min/max for it.
    val dir = fixtureDir("no_stats")
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("no usable column statistics"))
    assert(e.getMessage.contains("Refusing to guess"))
  }

  test("AdaptiveTimestamps: a non-UTC session is rejected before the LTZ→NTZ cast") {
    import spark.implicits._
    // The adjusted-UTC/INT96 normalization renders instants as wall-clock
    // in the SESSION time zone; every Graft session pins UTC, and a
    // non-UTC caller must fail loudly instead of shifting every instant.
    val dir = fixtureDir("tz_guard")
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalStateException](Tables.events(spark, dir))
      assert(e.getMessage.contains("requires spark.sql.session.timeZone=UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  /** True TIMESTAMP(NANOS) annotation — Spark cannot WRITE it, so drive
    * parquet-mr's example writer directly. This is the genuine encoding
    * the `nanosAsLong` branch exists for (the Spark-written raw-int64
    * fixtures above exercise the same LongType dispatch, but not the
    * annotation itself). */
  private def writeNanosAnnotated(dir: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val msg = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(PrimitiveTypeName.INT64).named("user_id")
      .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(PrimitiveTypeName.DOUBLE).named("value")
      .required(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val factory = new SimpleGroupFactory(msg)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet/part-0.parquet"))
      .withConf(spark.sparkContext.hadoopConfiguration)
      .withType(msg)
      .build()
    try fixtureUs.foreach { case (id, tsUs, uid, et, v, p) =>
      val g = factory.newGroup()
      g.append("event_id", id)
      g.append("ts", tsUs * 1000L) // epoch-ns
      g.append("user_id", uid)
      g.append("event_type", et)
      g.append("value", v)
      g.append("props", p)
      writer.write(g)
    } finally writer.close()
  }

  test("Tables.events: ns-ANNOTATED int64 normalizes to the same instants") {
    import spark.implicits._
    val dir = fixtureDir("ns_annotated")
    writeNanosAnnotated(dir)
    assert(probe(dir) === Set(LongType))
    val out = Tables.events(spark, dir).orderBy("event_id")
    assert(out.schema("ts").dataType === TimestampNTZType)
    val micros = out.select(unix_micros(col("ts").cast("timestamp"))).as[Long].collect()
    assert(micros.toSeq === fixtureUs.map(_._2))
  }

  test("AdaptiveTimestamps: ns-annotated data without nanosAsLong fails with the curated message") {
    val dir = fixtureDir("ns_no_flag")
    writeNanosAnnotated(dir)
    val prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val e = intercept[IllegalStateException](Tables.events(spark, dir))
      assert(e.getMessage.contains("spark.sql.legacy.parquet.nanosAsLong=true"))
    } finally spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
  }

  test("Tables.events: an unsupported ts encoding fails loudly") {
    import spark.implicits._
    val dir = fixtureDir("bad")
    fixtureUs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("ts decoded as"))
  }
}
