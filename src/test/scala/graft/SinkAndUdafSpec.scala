package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.ops.Tables
import graft.sources.Sources

/** RDBMS sink smoke (the north-star "ETL to RDBMS" path, against the
  * embedded Derby that ships on the classpath) and custom-UDAF checks.
  */
class SinkAndUdafSpec extends SparkSpec {

  test("JDBC sink round-trips the nation table through embedded Derby") {
    val db = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val nation = Tables.nation(spark, sf0001)
    Sources.jdbcWriter(nation, url, "nation_sink", "app", "app", numPartitions = 2).save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation_sink").load()
    assert(back.count() === 25)
    assert(back.columns.sorted === nation.columns.sorted)
    // appending again doubles the rows — append semantics, no silent replace
    Sources.jdbcWriter(nation, url, "nation_sink", "app", "app", numPartitions = 2).save()
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "nation_sink").load().count() === 50)
  }

  test("staged JDBC write is exactly-once across a simulated mid-write failure") {
    val db = java.nio.file.Files.createTempDirectory("graft_derby_staged").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val nation = Tables.nation(spark, sf0001)

    // First load: stage → validate → swap promotes exactly the source.
    assert(Sources.jdbcStagedWrite(nation, url, "nation_swap", "app", "app",
      numPartitions = 2) === 25L)
    def targetCount(): Long = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation_swap").load().count()
    assert(targetCount() === 25)

    // Simulate a crash mid-way through a SECOND load: the staging table
    // holds a partial write (5 rows), the target still holds the last
    // validated load. A naive append-resume would land 25+5+25 rows.
    nation.limit(5).write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "nation_swap_stg").save()
    assert(spark.read.format("jdbc").option("url", url)
      .option("dbtable", "nation_swap_stg").load().count() === 5)

    // Re-run after the failure: the partial staging table is replaced,
    // the count validated, and the swap lands exactly-once rows.
    assert(Sources.jdbcStagedWrite(nation, url, "nation_swap", "app", "app",
      numPartitions = 2) === 25L)
    assert(targetCount() === 25)
    // the staging table was consumed by the rename, not left behind
    val conn = java.sql.DriverManager.getConnection(url)
    try assert(!conn.getMetaData
      .getTables(null, null, "NATION_SWAP_STG", null).next())
    finally conn.close()

    // Validation failure leaves the target untouched: claim a row count
    // the source cannot land.
    val err = intercept[IllegalStateException] {
      Sources.jdbcStagedWrite(nation, url, "nation_swap", "app", "app",
        numPartitions = 2, expectedRows = Some(26L))
    }
    assert(err.getMessage.contains("expected 26"))
    assert(targetCount() === 25)
  }

  test("streaming foreachBatch JDBC sink lands micro-batches in Derby") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val db = java.nio.file.Files.createTempDirectory("graft_derby_stream").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val stream = MemoryStream[(Long, String, Double)]
    val writer = graft.streaming.Streaming.jdbcSink(
      stream.toDF().toDF("id", "name", "v"), url, "stream_sink", "app", "app")
    val query = writer.start()
    try {
      stream.addData((1L, "a", 1.5), (2L, "b", 2.5))
      query.processAllAvailable()
      stream.addData((3L, "c", 3.5))
      query.processAllAvailable()
      val back = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "stream_sink").load()
      assert(back.count() === 3)
      assert(back.select(sum("v")).head.getDouble(0) === 7.5)
    } finally query.stop()
  }

  test("permissive JSON ingest quarantines malformed records instead of failing") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_json")
    val f = dir.resolve("in.jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "ok"}
        |{"id": oops not json
        |{"id": 3, "name": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    // Spark disallows queries touching ONLY _corrupt_record on raw JSON —
    // materialize the full rows once (what a quarantine sink would do).
    val rows = Sources.jsonLinesPermissive(spark, f.toString, schema).collect()
    val (bad, good) = rows.partition(r => r.getAs[String]("_corrupt_record") != null)
    assert(good.length === 2)
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("_corrupt_record").contains("oops"))
  }

  test("upsert replaces same-key rows and appends new keys (snapshot refresh)") {
    val base = Tables.customer(spark, sf0001)
    val updates = base.filter(col("c_custkey") <= 5)
      .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
      .unionByName(base.filter(col("c_custkey") === 1)
        .withColumn("c_custkey", lit(99999L)))   // a brand-new key
    val merged = Sources.upsert(base, updates, "c_custkey")
    assert(merged.count() === base.count() + 1)
    // updated rows carry the new balance
    val got = merged.filter(col("c_custkey") === 3).select("c_acctbal").head.getDouble(0)
    val old = base.filter(col("c_custkey") === 3).select("c_acctbal").head.getDouble(0)
    assert(got === old + 1000.0)
    // untouched rows unchanged
    assert(merged.filter(col("c_custkey") > 5 && col("c_custkey") < 99999L)
      .exceptAll(base.filter(col("c_custkey") > 5)).count() === 0)
    assert(merged.filter(col("c_custkey") === 99999L).count() === 1)
  }

  test("SCD2 apply closes current versions and appends new ones") {
    import spark.implicits._
    val base = Seq(
      (1L, "alice", "2020-01-01", null.asInstanceOf[String]),
      (1L, "al", "2019-01-01", "2020-01-01"),       // already-closed history
      (2L, "bob", "2020-01-01", null.asInstanceOf[String])
    ).toDF("id", "name", "valid_from", "valid_to")
    val updates = Seq((1L, "alicia", "2021-06-01")).toDF("id", "name", "valid_from")
    val out = Sources.scd2Apply(base, updates, "id")
    assert(out.count() === 4)
    // key 1: old current closed at the update's valid_from
    val closed = out.filter(col("id") === 1 && col("name") === "alice")
      .select("valid_to").head.getString(0)
    assert(closed === "2021-06-01")
    // key 1: new current open
    assert(out.filter(col("id") === 1 && col("valid_to").isNull)
      .select("name").head.getString(0) === "alicia")
    // history row untouched, other keys untouched
    assert(out.filter(col("id") === 1 && col("name") === "al")
      .select("valid_to").head.getString(0) === "2020-01-01")
    assert(out.filter(col("id") === 2 && col("valid_to").isNull).count() === 1)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    def dropClean(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    dropClean("orders_b"); dropClean("lineitem_b")
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    Sources.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Sources.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    // tiny test tables would auto-broadcast; force the SMJ path the
    // bucketing exists for, then check no hash-partition shuffle appears
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ===
        orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      dropClean("orders_b"); dropClean("lineitem_b")
    }
  }

  test("ORC sink/source round-trips the customer table bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/customer"
    val customer = Tables.customer(spark, sf0001).orderBy("c_custkey")
    Sources.writeOrc(customer, dir)
    val back = Sources.readOrc(spark, dir, Tables.schemas("customer")).orderBy("c_custkey")
    assert(back.schema === customer.schema)
    assert(back.exceptAll(customer).count() === 0)
    assert(customer.exceptAll(back).count() === 0)
  }

  test("sorted_intersect_size: two-pointer merge matches array_intersect semantics") {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),   // partial overlap
      (Seq("a", "b"), Seq("c", "d")),             // disjoint
      (Seq[String](), Seq("a")),                  // empty side
      (Seq("a", "b", "c"), Seq("a", "b", "c")),   // identical
      (Seq("aa", "ab"), Seq("ab", "b"))           // prefix-sharing strings
    ).toDF("x", "y")
      .select(sort_array(col("x")).as("x"), sort_array(col("y")).as("y"))
    val got = df.select(expr("sorted_intersect_size(x, y)")).as[Long].collect().toSeq
    assert(got === Seq(2L, 0L, 0L, 3L, 1L))
    // matches the builtin on sorted+distinct inputs (the documented invariant)
    val builtin = df.select(size(array_intersect(col("x"), col("y"))).cast("long"))
      .as[Long].collect().toSeq
    assert(got === builtin)
  }

  test("sorted_intersect_size: null elements are skipped, not NPE'd (ADVICE r2)") {
    graft.expressions.GraftFunctions.register(spark)
    // parquet-sourced arrays carry containsNull=true; sort_array puts
    // nulls FIRST — the merge must step past them on either side and a
    // null never equals anything (SQL semantics).
    val got = spark.sql(
      """SELECT sorted_intersect_size(sort_array(array(CAST(NULL AS STRING), 'a', 'b')),
        |                             sort_array(array('b', CAST(NULL AS STRING), 'c')))
        |""".stripMargin).head.getLong(0)
    assert(got === 1L) // only 'b'; the two nulls don't match each other
    val bothNull = spark.sql(
      "SELECT sorted_intersect_size(array(CAST(NULL AS STRING)), array(CAST(NULL AS STRING)))")
      .head.getLong(0)
    assert(bothNull === 0L)
  }

  test("weighted percentile UDAF: p50 of known weights") {
    import spark.implicits._
    // values 1..4; weight concentrated on 3 → weighted p50 = 3
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 10.0), (4.0, 1.0)).toDF("v", "w")
    val p50 = df.agg(Aggregators.weightedPercentile(0.5)(col("v"), col("w"))).head.getDouble(0)
    assert(p50 === 3.0)
    // uniform weights → ordinary median-ish (2.0 = first value reaching half)
    val dfu = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 1.0)).toDF("v", "w")
    val p50u = dfu.agg(Aggregators.weightedPercentile(0.5)(col("v"), col("w"))).head.getDouble(0)
    assert(p50u === 2.0)
  }

  test("weighted percentile distributes: same answer under repartitioning") {
    val events = Tables.events(spark, sf0001).select(col("value"), lit(1.0).as("w"))
    val a = events.agg(Aggregators.weightedPercentile(0.9)(col("value"), col("w"))).head.getDouble(0)
    val b = events.repartition(13)
      .agg(Aggregators.weightedPercentile(0.9)(col("value"), col("w"))).head.getDouble(0)
    assert(a === b)
  }

  test("weighted percentile buffer stays bounded on a skewed stream, exact under the cap") {
    val cap = 64
    val agg = new Aggregators.WeightedPercentile(0.5, maxBuffer = cap)
    val rnd = new scala.util.Random(42)
    // Skewed stream: values power-law-bunched near 0, weights cycling
    // over two decades — the shape that grew the old buffer without
    // bound (one entry per input row forever).
    val stream = (1 to 100000).map { i =>
      (math.pow(rnd.nextDouble(), 4) * 1000.0, 1.0 / (1 + i % 100))
    }
    var buf = agg.zero
    var maxLen = 0
    stream.foreach { vw =>
      buf = agg.reduce(buf, vw)
      maxLen = math.max(maxLen, buf.length)
    }
    assert(maxLen <= cap, s"buffer grew to $maxLen > cap $cap")
    // merge path is bounded too: merging two full buffers re-compacts
    var buf2 = agg.zero
    stream.take(50000).foreach { vw => buf2 = agg.reduce(buf2, vw) }
    assert(agg.merge(buf, buf2).length <= cap)
    // accuracy: the compacted answer lands within the +-2/cap rank
    // window of the exact weighted p50 (use a generous +-5% window)
    def exactAt(q: Double): Double = {
      val sorted = stream.sortBy(_._1)
      val target = q * sorted.iterator.map(_._2).sum
      var cum = 0.0
      sorted.find { case (_, w) => cum += w; cum >= target }.map(_._1).get
    }
    val approx = agg.finish(buf)
    assert(approx >= exactAt(0.45) && approx <= exactAt(0.55),
      s"approx p50 $approx outside exact rank window [${exactAt(0.45)}, ${exactAt(0.55)}]")
    // small groups (at most cap inputs) never compact: bit-exact with
    // the direct computation, i.e. the pre-cap semantics are unchanged
    val small = stream.take(cap)
    var sbuf = agg.zero
    small.foreach { vw => sbuf = agg.reduce(sbuf, vw) }
    val sortedSmall = small.sortBy(_._1)
    val target = 0.5 * sortedSmall.iterator.map(_._2).sum
    var cum = 0.0
    val exactSmall = sortedSmall.find { case (_, w) => cum += w; cum >= target }.map(_._1).get
    assert(agg.finish(sbuf) === exactSmall)
  }

  test("SimHash near-dup finds exact duplicates, respects Hamming bound") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).limit(100)
      .unionByName(Tables.documents(spark, sf0001).limit(5)
        .withColumn("doc_id", col("doc_id") + 10000)) // planted exact dups
    val pairs = graft.operators.Approx.simHashNearDup(docs)
    // each planted dup (id, id+10000) must be found at hamming 0
    val planted = pairs.filter(col("b") === col("a") + 10000 && col("hamming") === 0)
    assert(planted.count() === 5)
    assert(pairs.filter(col("hamming") > 3).count() === 0)
  }

  test("SimHash band join is COMPLETE: equals brute-force all-pairs Hamming <= 3") {
    // The pigeonhole claim, pinned: 4 disjoint 16-bit bands mean any
    // pair within Hamming 3 shares at least one exact band, so the
    // banded candidate join must find EXACTLY the pairs a quadratic
    // all-pairs scan finds — not a recall estimate, an equality.
    val docs = Tables.documents(spark, sf0001)
    val banded = graft.operators.Approx.simHashNearDup(docs)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash64(col("text")).as("sh"))
    val brute = sh.select(col("doc_id").as("a"), col("sh").as("sha"))
      .crossJoin(sh.select(col("doc_id").as("b"), col("sh").as("shb")))
      .filter(col("a") < col("b") &&
        bit_count(col("sha").bitwiseXOR(col("shb"))) <= 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute)
  }

  test("n-gram Jaccard near-dup: identical docs score 1.0, is symmetric-bounded") {
    val docs = Tables.documents(spark, sf0001).limit(50)
      .unionByName(Tables.documents(spark, sf0001).limit(3)
        .withColumn("doc_id", col("doc_id") + 10000))
    val out = graft.operators.Approx.ngramJaccardNearDup(docs, n = 3, minJaccard = 0.9, maxProbeId = 100000)
    assert(out.filter(col("b") === col("a") + 10000 && col("jaccard") === 1.0).count() === 3)
    assert(out.filter(col("jaccard") > 1.0).count() === 0)
  }

  test("geometric mean UDAF matches exp(avg(ln)) and groups correctly") {
    val events = Tables.events(spark, sf0001).filter(col("value") > 0)
    val viaUdaf = events.groupBy("event_type")
      .agg(Aggregators.geometricMean(col("value")).as("gm"))
    val viaExpr = events.groupBy("event_type")
      .agg(exp(avg(log(col("value")))).as("gm2"))
    val joined = viaUdaf.join(viaExpr, "event_type")
      .filter(abs(col("gm") - col("gm2")) > 1e-9)
    assert(joined.count() === 0)
  }
}
