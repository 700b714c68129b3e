package graft

import java.nio.file.Files

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftTable

/** The `graft` TableCatalog: named tables over graft-arrow shard trees
  * (full CRUD + streaming) and GraftTable commit-log sinks (read +
  * time travel), replacing path-string addressing with
  * `graft.db.table` — the reference's named-destination model
  * (main.go:255 queried at main.go:97). */
class GraftCatalogSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // one catalog per suite run; tests share namespaces but use distinct
  // table names
  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-catalog-wh").toString
    spark.conf.set("spark.sql.catalog.cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cat.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.db")
    dir
  }

  test("create / insert (append) / overwrite / select / drop on a " +
       "managed graft-arrow table") {
    wh
    spark.sql("CREATE TABLE cat.db.docs (doc_id BIGINT, txt STRING) " +
      "USING `graft-arrow`")
    // the empty created table reads back with its declared schema
    val empty = spark.sql("SELECT * FROM cat.db.docs")
    assert(empty.columns.toSeq == Seq("doc_id", "txt") && empty.count() == 0)
    spark.sql("INSERT INTO cat.db.docs VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO cat.db.docs VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM cat.db.docs").head.getLong(0) == 3)
    // each INSERT INTO committed one whole shard
    val loc = s"$wh/db/docs"
    val shards = new java.io.File(loc).list().count(_.startsWith("batch_id="))
    assert(shards == 3, s"expected schema shard + 2 appends, got $shards")
    spark.sql("INSERT OVERWRITE cat.db.docs VALUES (9, 'z')")
    assert(spark.sql("SELECT doc_id, txt FROM cat.db.docs")
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(spark.sql("SHOW TABLES IN cat.db").collect()
      .exists(_.getString(1) == "docs"))
    spark.sql("DROP TABLE cat.db.docs")
    assert(!new java.io.File(loc).exists(), "managed drop deletes data")
    intercept[AnalysisException](spark.sql("SELECT * FROM cat.db.docs"))
  }

  test("CTAS + aggregate through the catalog matches the direct frame") {
    wh
    val src = Seq((1L, "en", 10), (2L, "fr", 20), (3L, "en", 30))
      .toDF("id", "lang", "n")
    src.createOrReplaceTempView("cat_src")
    spark.sql("DROP TABLE IF EXISTS cat.db.ctas")
    spark.sql("CREATE TABLE cat.db.ctas USING `graft-arrow` AS " +
      "SELECT * FROM cat_src")
    val got = spark.sql("SELECT lang, sum(n) AS total FROM cat.db.ctas " +
      "GROUP BY lang ORDER BY lang").as[(String, Long)].collect().toSeq
    assert(got == Seq(("en", 40L), ("fr", 20L)))
    // an append with a MISMATCHED schema is rejected before staging
    val e = intercept[Exception](
      spark.sql("INSERT INTO cat.db.ctas VALUES (4, 'de')"))
    assert(TestErrors.messageChain(e).exists(_.contains("not enough data columns")) ||
      TestErrors.messageChain(e).exists(_.contains("does not match")))
    spark.sql("DROP TABLE cat.db.ctas")
  }

  test("graft-log sink registers as a named table with VERSION AS OF " +
       "time travel and commit-protocol INSERT") {
    wh
    val root = Files.createTempDirectory("graft-catalog-log").toString
    // two committed versions of a 'raw' sink
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$root/raw")
    GraftTable.commit(spark, root, 0L)
    Seq((3L, "c")).toDF("id", "v")
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$root/raw")
    GraftTable.commit(spark, root, 1L)

    spark.sql("CREATE TABLE cat.db.rawlog USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    assert(spark.sql("SELECT count(*) FROM cat.db.rawlog")
      .head.getLong(0) == 3)
    // snapshot parity with the Scala API, column for column
    val byName = spark.sql("SELECT id, v FROM cat.db.rawlog ORDER BY id")
      .as[(Long, String)].collect().toSeq
    val byApi = GraftTable.read(spark, root, "raw")
      .select($"id", $"v").orderBy($"id")
      .as[(Long, String)].collect().toSeq
    assert(byName == byApi)
    // time travel by name
    assert(spark.sql(
      "SELECT count(*) FROM cat.db.rawlog VERSION AS OF 0")
      .head.getLong(0) == 2)
    // filters push into the delegated parquet scan — THROUGH the
    // wrapping builder (Spark's file sources take filters via the
    // internal catalyst trait; the sql-package bridge forwards it)
    val filtered = spark.sql("SELECT v FROM cat.db.rawlog WHERE id = 2")
    assert(filtered.as[String].collect().toSeq == Seq("b"))
    val planStr = filtered.queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2")
      || planStr.contains("PushedFilters: [EqualTo(id,2"),
      s"filter did not reach the parquet scan:\n$planStr")
    // INSERT publishes through the commit protocol (batch_id is log
    // metadata, hidden from the named schema — two columns, not three)
    spark.sql("INSERT INTO cat.db.rawlog VALUES (9, 'x')")
    assert(spark.sql("SELECT count(*) FROM cat.db.rawlog")
      .head.getLong(0) == 4)
    assert(GraftTable.versions(spark, root).size == 3,
      "the INSERT must have published exactly one new version")
    // DROP unregisters without touching external data
    spark.sql("DROP TABLE cat.db.rawlog")
    assert(GraftTable.read(spark, root, "raw").count() == 4)
  }

  test("TIMESTAMP AS OF resolves commit instants: between-commit " +
       "instants see the earlier snapshot, folding preserves them, " +
       "pre-table instants fail loudly") {
    wh
    val root = Files.createTempDirectory("graft-catalog-tt").toString
    def append(id: Long, batch: Long): Unit = {
      Seq((id, s"r$id")).toDF("id", "v")
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(batch))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(s"$root/raw")
      GraftTable.commit(spark, root, batch)
    }
    val before = System.currentTimeMillis() - 5
    append(1L, 0L)
    Thread.sleep(15) // commits must land in distinct instants
    val mid = System.currentTimeMillis()
    Thread.sleep(15)
    append(2L, 1L)
    spark.sql("DROP TABLE IF EXISTS cat.db.tt")
    spark.sql("CREATE TABLE cat.db.tt USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    def fmt(ms: Long): String =
      java.time.Instant.ofEpochMilli(ms).toString.replace("T", " ")
        .stripSuffix("Z")
    // the between-commits instant sees ONLY the first version
    assert(spark.sql(
      s"SELECT count(*) FROM cat.db.tt TIMESTAMP AS OF '${fmt(mid)}'")
      .head.getLong(0) == 1)
    // an instant after the last commit is an error (Delta's contract:
    // resolving "now" to "latest" would break reproducibility)
    val eAfter = intercept[Exception](spark.sql(
      "SELECT count(*) FROM cat.db.tt TIMESTAMP AS OF " +
        s"'${fmt(System.currentTimeMillis() + 60000)}'").collect())
    assert(TestErrors.messageChain(eAfter)
      .exists(_.contains("after")), TestErrors.messageChain(eAfter))
    // the latest commit's own instant still sees everything
    val latest = spark.sql("GRAFT HISTORY cat.db.tt")
      .select("committed_at").collect().map(_.getTimestamp(0).getTime).max
    assert(spark.sql("SELECT count(*) FROM cat.db.tt TIMESTAMP AS OF " +
      s"'${fmt(latest)}'").head.getLong(0) == 2)
    // GRAFT HISTORY exposes the instants TIMESTAMP AS OF resolves
    // against, monotone in version order
    val hist = spark.sql("GRAFT HISTORY cat.db.tt")
      .select("version", "committed_at").collect()
    assert(hist.length == 2 && hist.forall(_.getTimestamp(1) != null))
    assert(!hist(1).getTimestamp(1).before(hist(0).getTimestamp(1)))
    // checkpoint folding destroys the commit files but BAKES the
    // instants into the manifest — time travel keeps resolving
    GraftTable.checkpoint(spark, root, 1L)
    assert(spark.sql(
      s"SELECT count(*) FROM cat.db.tt TIMESTAMP AS OF '${fmt(mid)}'")
      .head.getLong(0) == 1)
    // an instant before the table existed is an error, not empty
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM cat.db.tt TIMESTAMP AS OF '${fmt(before)}'").collect())
    assert(TestErrors.messageChain(e).exists(_.contains("predates")))
    // the path-based reader spells the same thing as options
    assert(spark.read.format("graft-log").option("sink", "raw")
      .option("timestampAsOf", fmt(mid)).load(root).count() == 1)
    assert(spark.read.format("graft-log").option("sink", "raw")
      .option("timestampAsOf", mid.toString).load(root).count() == 1)
    assert(spark.read.format("graft-log").option("sink", "raw")
      .option("versionAsOf", "0").load(root).count() == 1)
    val e3 = intercept[Exception](spark.read.format("graft-log")
      .option("sink", "raw").option("versionAsOf", "0")
      .option("timestampAsOf", fmt(mid)).load(root))
    assert(TestErrors.messageChain(e3).exists(_.contains("mutually exclusive")))
    // graft-arrow tables refuse with a pointer
    spark.sql("DROP TABLE IF EXISTS cat.db.ttarrow")
    spark.sql("CREATE TABLE cat.db.ttarrow (v BIGINT) USING `graft-arrow`")
    val e2 = intercept[Exception](spark.sql(
      "SELECT * FROM cat.db.ttarrow TIMESTAMP AS OF '2026-01-01'").collect())
    assert(TestErrors.messageChain(e2).exists(_.contains("not versioned")))
    spark.sql("DROP TABLE cat.db.tt")
    spark.sql("DROP TABLE cat.db.ttarrow")
  }

  test("registered table OPTIONS persist and take effect on inserts") {
    wh
    spark.sql("DROP TABLE IF EXISTS cat.db.zc")
    spark.sql("DROP TABLE IF EXISTS cat.db.zp")
    spark.sql("CREATE TABLE cat.db.zc (v STRING) USING `graft-arrow` " +
      "OPTIONS (compression 'zstd')")
    spark.sql("CREATE TABLE cat.db.zp (v STRING) USING `graft-arrow`")
    val text = "'" + ("lorem ipsum dolor sit amet " * 40) + "'"
    val rows = (0 until 300).map(_ => s"($text)").mkString(", ")
    spark.sql(s"INSERT INTO cat.db.zc VALUES $rows")
    spark.sql(s"INSERT INTO cat.db.zp VALUES $rows")
    def shardBytes(t: String): Long =
      new java.io.File(s"$wh/db/$t/batch_id=1").listFiles()
        .filter(_.getName.endsWith(".arrows")).map(_.length()).sum
    assert(shardBytes("zc") < shardBytes("zp") / 2,
      s"table-level compression did not reach the insert: " +
        s"zstd=${shardBytes("zc")} plain=${shardBytes("zp")}")
    assert(spark.sql("SELECT count(*) FROM cat.db.zc").head.getLong(0) == 300)
    // a bad codec fails at CREATE, and unescapable metadata is rejected
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE cat.db.bad (v STRING) USING `graft-arrow` " +
        "OPTIONS (compression 'snappy')"))
    assert(TestErrors.messageChain(e1).exists(_.contains("zstd | lz4")))
    assert(!spark.sql("SHOW TABLES IN cat.db").collect()
      .exists(_.getString(1) == "bad"))
    spark.sql("DROP TABLE cat.db.zc")
    spark.sql("DROP TABLE cat.db.zp")
  }

  test("GRAFT maintenance verbs accept catalog-named log tables") {
    wh
    val root = Files.createTempDirectory("graft-catalog-verbs").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .withColumn("batch_id", org.apache.spark.sql.functions.lit(0L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$root/raw")
    GraftTable.commit(spark, root, 0L)
    spark.sql("DROP TABLE IF EXISTS cat.db.verbs")
    spark.sql("CREATE TABLE cat.db.verbs USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    // HISTORY by name
    assert(spark.sql("GRAFT HISTORY cat.db.verbs").count() == 1)
    // DELETE by name rewrites through the commit log
    val del = spark.sql("GRAFT DELETE cat.db.verbs WHERE id = 2").head
    assert(del.getLong(0) == 1L)
    assert(spark.sql("SELECT id FROM cat.db.verbs ORDER BY id")
      .as[Long].collect().toSeq == Seq(1L, 3L))
    // time travel still sees the pre-delete snapshot
    assert(spark.sql("SELECT count(*) FROM cat.db.verbs VERSION AS OF 0")
      .head.getLong(0) == 3)
    // a graft-arrow table refuses the log verbs with a pointer
    spark.sql("DROP TABLE IF EXISTS cat.db.arrowt")
    spark.sql("CREATE TABLE cat.db.arrowt (v BIGINT) USING `graft-arrow`")
    val e = intercept[Exception](
      spark.sql("GRAFT HISTORY cat.db.arrowt"))
    assert(TestErrors.messageChain(e).exists(_.contains("graft-arrow")))
    spark.sql("DROP TABLE cat.db.verbs")
    spark.sql("DROP TABLE cat.db.arrowt")
  }

  test("writeStream.toTable onto a freshly created arrow table works: " +
       "epoch 0 replaces the provably-empty schema shard") {
    wh
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("DROP TABLE IF EXISTS cat.db.sink")
    spark.sql("CREATE TABLE cat.db.sink (value BIGINT) USING `graft-arrow`")
    val in = MemoryStream[Long]
    in.addData(1L, 2L, 3L)
    val q = in.toDF().writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cat-sinkckpt").toString)
      .toTable("cat.db.sink")
    try { q.processAllAvailable() } finally q.stop()
    assert(spark.sql("SELECT value FROM cat.db.sink ORDER BY value")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    spark.sql("DROP TABLE cat.db.sink")
  }

  test("streaming read tails a catalog-named arrow table's shards") {
    wh
    spark.sql("DROP TABLE IF EXISTS cat.db.feed")
    spark.sql("CREATE TABLE cat.db.feed (v BIGINT) USING `graft-arrow`")
    spark.sql("INSERT INTO cat.db.feed VALUES (1), (2)")
    spark.sql("INSERT INTO cat.db.feed VALUES (3)")
    val q = spark.readStream.table("cat.db.feed")
      .writeStream.format("memory").queryName("cat_feed")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT v FROM cat_feed ORDER BY v")
      .as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    spark.sql("DROP TABLE cat.db.feed")
  }

  test("rename moves a managed table's data with its name; namespaces " +
       "list and drop") {
    wh
    spark.sql("DROP TABLE IF EXISTS cat.db.rn1")
    spark.sql("CREATE TABLE cat.db.rn1 (v BIGINT) USING `graft-arrow`")
    spark.sql("INSERT INTO cat.db.rn1 VALUES (7)")
    spark.sql("ALTER TABLE cat.db.rn1 RENAME TO db.rn2")
    assert(spark.sql("SELECT v FROM cat.db.rn2").as[Long].head() == 7L)
    assert(!new java.io.File(s"$wh/db/rn1").exists())
    intercept[AnalysisException](spark.sql("SELECT * FROM cat.db.rn1"))
    spark.sql("DROP TABLE cat.db.rn2")
    spark.sql("CREATE NAMESPACE cat.scratch")
    assert(spark.sql("SHOW NAMESPACES IN cat").collect()
      .map(_.getString(0)).contains("scratch"))
    spark.sql("DROP NAMESPACE cat.scratch")
    assert(!spark.sql("SHOW NAMESPACES IN cat").collect()
      .map(_.getString(0)).contains("scratch"))
  }

  test("rename refuses a stale directory at the destination's managed " +
       "location (mv-into would nest the data)") {
    wh
    spark.sql("DROP TABLE IF EXISTS cat.db.mv1")
    spark.sql("CREATE TABLE cat.db.mv1 (v BIGINT) USING `graft-arrow`")
    spark.sql("INSERT INTO cat.db.mv1 VALUES (5)")
    // stale debris where the renamed table's data would live
    val stale = new java.io.File(s"$wh/db/mv2")
    stale.mkdirs()
    val e = intercept[Exception](
      spark.sql("ALTER TABLE cat.db.mv1 RENAME TO db.mv2"))
    assert(TestErrors.messageChain(e).exists(_.contains("already exists")))
    // the source table is untouched by the refused rename
    assert(spark.sql("SELECT v FROM cat.db.mv1").as[Long].head() == 5L)
    stale.delete()
    spark.sql("ALTER TABLE cat.db.mv1 RENAME TO db.mv2")
    assert(spark.sql("SELECT v FROM cat.db.mv2").as[Long].head() == 5L)
    spark.sql("DROP TABLE cat.db.mv2")
  }

  test("CTAS is staged: a mid-write failure leaves no binding and no " +
       "data at the final location") {
    wh
    spark.sql("DROP TABLE IF EXISTS cat.db.boom")
    intercept[Exception](spark.sql(
      "CREATE TABLE cat.db.boom USING `graft-arrow` AS " +
        "SELECT IF(id = 7, CAST(raise_error('mid-write failure') AS " +
        "STRING), CAST(id AS STRING)) AS v FROM range(10)"))
    assert(spark.sql("SHOW TABLES IN cat.db").collect()
      .forall(_.getString(1) != "boom"), "failed CTAS must not bind")
    assert(!new java.io.File(s"$wh/db/boom").exists(),
      "failed CTAS must leave nothing at the final location")
    // the name is immediately reusable, with no adopted debris
    spark.sql("CREATE TABLE cat.db.boom USING `graft-arrow` AS " +
      "SELECT CAST(id AS STRING) AS v FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM cat.db.boom")
      .head.getLong(0) == 3)
    spark.sql("DROP TABLE cat.db.boom")
  }

  test("RTAS is atomic: a failed REPLACE keeps the old table intact; " +
       "a successful one swaps; CREATE OR REPLACE bootstraps") {
    wh
    spark.sql("DROP TABLE IF EXISTS cat.db.rt")
    spark.sql("CREATE TABLE cat.db.rt USING `graft-arrow` AS " +
      "SELECT id FROM range(2)")
    intercept[Exception](spark.sql(
      "REPLACE TABLE cat.db.rt USING `graft-arrow` AS " +
        "SELECT IF(id = 5, CAST(raise_error('replace failure') AS " +
        "BIGINT), id) AS id FROM range(9)"))
    assert(spark.sql("SELECT count(*) FROM cat.db.rt").head.getLong(0) == 2,
      "a failed REPLACE must leave the old table byte-identical")
    spark.sql("REPLACE TABLE cat.db.rt USING `graft-arrow` AS " +
      "SELECT id FROM range(5)")
    assert(spark.sql("SELECT count(*) FROM cat.db.rt").head.getLong(0) == 5)
    // REPLACE of a nonexistent table refuses; OR REPLACE bootstraps
    spark.sql("DROP TABLE cat.db.rt")
    intercept[Exception](spark.sql(
      "REPLACE TABLE cat.db.rt USING `graft-arrow` AS SELECT 1 AS x"))
    spark.sql("CREATE OR REPLACE TABLE cat.db.rt USING `graft-arrow` AS " +
      "SELECT id FROM range(4)")
    assert(spark.sql("SELECT count(*) FROM cat.db.rt").head.getLong(0) == 4)
    spark.sql("DROP TABLE cat.db.rt")
  }

  test("ALTER TABLE ADD COLUMNS evolves a named log table: old files " +
       "null-fill, VERSION AS OF pre-evolution keeps the old schema, " +
       "old writers keep committing until the column materializes") {
    wh
    val root = Files.createTempDirectory("graft-catalog-evolve").toString
    def seed(b: Long, rows: Seq[(Long, String, String)]): Unit = {
      rows.toDF("id", "v", "lang")
        .withColumn("batch_id", org.apache.spark.sql.functions.lit(b))
        .write.mode("append").partitionBy("lang", "batch_id")
        .parquet(s"$root/raw")
      GraftTable.commit(spark, root, b)
      ()
    }
    seed(0L, Seq((1L, "a", "en"), (2L, "b", "fr")))
    spark.sql("DROP TABLE IF EXISTS cat.db.ev")
    spark.sql("CREATE TABLE cat.db.ev USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'raw')")
    assert(spark.table("cat.db.ev").columns.toSeq == Seq("id", "v", "lang"))
    spark.sql("ALTER TABLE cat.db.ev ADD COLUMNS (score DOUBLE)")
    // the declared column is visible immediately, null for old rows
    val evolved = spark.sql("SELECT id, score FROM cat.db.ev ORDER BY id")
    assert(evolved.columns.toSeq == Seq("id", "score"))
    assert(evolved.collect().forall(_.isNullAt(1)))
    // pre-evolution time travel shows the old schema
    assert(!spark.sql("SELECT * FROM cat.db.ev VERSION AS OF 0")
      .columns.contains("score"))
    // an OLD writer (footer without score) is not bricked by the
    // declaration — the column has not materialized in any file yet
    seed(5L, Seq((3L, "c", "en")))
    assert(spark.sql(
      "SELECT count(*) FROM cat.db.ev WHERE score IS NULL")
      .head.getLong(0) == 3)
    // a writer materializes the column through the named table
    spark.sql("INSERT INTO cat.db.ev VALUES (4, 'd', 0.9, 'fr')")
    assert(spark.sql(
      "SELECT count(*) FROM cat.db.ev WHERE score IS NOT NULL")
      .head.getLong(0) == 1)
    // once real files carry it, dropping it again IS a data-loss signal
    val e = intercept[Exception](
      seed(9L, Seq((5L, "e", "en"))))
    assert(TestErrors.messageChain(e).exists(_.contains("dropped")))
    // guard rails: non-nullable adds and non-add changes refuse
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE cat.db.ev ADD COLUMNS (w INT NOT NULL)"))
    assert(TestErrors.messageChain(e2).exists(_.contains("nullable")))
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE cat.db.ev RENAME COLUMN v TO w"))
    assert(TestErrors.messageChain(e3).exists(_.contains("ADD COLUMNS")))
    // graft-arrow tables stay unalterable
    spark.sql("DROP TABLE IF EXISTS cat.db.noev")
    spark.sql("CREATE TABLE cat.db.noev (x BIGINT) USING `graft-arrow`")
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE cat.db.noev ADD COLUMNS (y INT)"))
    assert(TestErrors.messageChain(e4).exists(_.contains("graft-arrow")))
    spark.sql("DROP TABLE cat.db.noev")
  }

  test("DROP NAMESPACE CASCADE deletes managed tables' data, keeps " +
       "external data") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.casc")
    spark.sql("CREATE TABLE cat.casc.m (v BIGINT) USING `graft-arrow`")
    spark.sql("INSERT INTO cat.casc.m VALUES (1)")
    val extLoc = Files.createTempDirectory("graft-casc-ext").toString
    spark.sql("CREATE TABLE cat.casc.x (v BIGINT) USING `graft-arrow` " +
      s"LOCATION '$extLoc/t'")
    spark.sql("INSERT INTO cat.casc.x VALUES (2)")
    val managedDir = new java.io.File(s"$wh/casc/m")
    assert(managedDir.exists())
    spark.sql("DROP NAMESPACE cat.casc CASCADE")
    assert(!managedDir.exists(),
      "CASCADE must delete managed tables' data, not orphan it")
    assert(new java.io.File(s"$extLoc/t").exists(),
      "CASCADE must not touch external table data")
  }
}
