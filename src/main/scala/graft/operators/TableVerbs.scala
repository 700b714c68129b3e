package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{GraftTable, Tables}

/** End-to-end exercises of the table format's row-level verbs, shaped as
  * oracle-checkable queries: each builds a scratch log-tracked table
  * from the `documents` parquet, drives UPDATE / MERGE (upsert +
  * tombstone) / DELETE / COMPACT / change-feed against it, and returns
  * the resulting state as a deterministic DataFrame whose expected value
  * is computable relationally from `documents` alone (the DuckDB oracle
  * never sees the scratch table — it derives what the verbs MUST
  * produce).
  *
  * This puts the copy-on-write machinery in [[graft.sources.GraftTable]]
  * under the driver's hash-compare gate, not just ScalaTest: a wrong
  * survivor set, a dropped tombstone, a double-counted rewrite, or a
  * compaction that loses rows all surface as an oracle mismatch.
  *
  * The reference keeps no mutable table state (it rotates immutable
  * DuckDB files — /root/reference/main.go:255); these verbs are part of
  * the training-pipeline extension (Delta/Iceberg-class maintenance on
  * corpus tables).
  */
object TableVerbs {

  /** q_table_merge: base append → UPDATE WHERE → MERGE with all three
    * clauses (matched-update, matched-delete tombstones, not-matched
    * insert) → final state.
    *
    * Source-row derivation (disjoint by construction, so Delta's
    * ambiguity law can't trip):
    *  - updates:  doc_id % 10 == 0 and doc_id % 7 != 3 → n_chars + 1000
    *  - deletes:  doc_id % 7 == 3 (op flag drives deleteWhenMatched)
    *  - inserts:  doc_id % 13 == 0 re-keyed to doc_id + 1000000
    * The earlier UPDATE relabels source 'src3' rows with doc_id % 5 == 0;
    * merge-updated rows overwrite that relabel (source version wins),
    * surviving rows keep it — both arms are oracle-visible.
    */
  def mergeFinalState(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-tv-merge").toString
    try mergeFinalStateAt(spark, dir, root)
    catch { case e: Throwable => Scratch.rm(new java.io.File(root)); throw e }
  }

  private def mergeFinalStateAt(
      spark: SparkSession, dir: String, root: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

    docs.write.parquet(s"$root/docs/batch_id=0")
    GraftTable.commit(spark, root, 0)

    // both verbs run through the SQL surface, so the parser and the
    // GRAFT UPDATE / GRAFT MERGE … DELETE WHEN commands sit under the
    // oracle gate, not just the Scala API they delegate to
    spark.sql(s"GRAFT UPDATE '$root' SINK 'docs' " +
      "SET source = 'src3_archive' " +
      "WHERE source = 'src3' AND doc_id % 5 = 0").collect()

    val updates = docs
      .filter(col("doc_id") % 10 === 0 && col("doc_id") % 7 =!= 3)
      .withColumn("n_chars", col("n_chars") + 1000)
      .withColumn("op", lit("u"))
    val deletes = docs
      .filter(col("doc_id") % 7 === 3)
      .withColumn("op", lit("d"))
    val inserts = docs
      .filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        lit("xx").as("lang"), lit("synthetic").as("source"),
        col("doc_id").as("n_chars"))
      .withColumn("op", lit("i"))
    updates.unionByName(deletes).unionByName(inserts)
      .createOrReplaceTempView("graft_tv_merge_src")
    spark.sql(s"GRAFT MERGE '$root' SINK 'docs' " +
      "USING (SELECT * FROM graft_tv_merge_src) ON doc_id " +
      "DELETE WHEN op = 'd'").collect()

    Scratch.materializeAndClean(root,
      GraftTable.read(spark, root, "docs")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id"))
  }

  /** The DuckDB twin of [[mergeFinalState]]'s end state. */
  val mergeFinalStateOracle: String =
    """WITH base AS (SELECT doc_id, lang, source, n_chars FROM documents),
      |upd AS (SELECT doc_id, lang,
      |          CASE WHEN source = 'src3' AND doc_id % 5 = 0
      |               THEN 'src3_archive' ELSE source END AS source,
      |          n_chars
      |        FROM base),
      |src_u AS (SELECT doc_id, lang, source, n_chars + 1000 AS n_chars
      |          FROM base WHERE doc_id % 10 = 0 AND doc_id % 7 <> 3),
      |src_i AS (SELECT doc_id + 1000000 AS doc_id, 'xx' AS lang,
      |                 'synthetic' AS source, doc_id AS n_chars
      |          FROM base WHERE doc_id % 13 = 0)
      |SELECT doc_id, lang, source, n_chars FROM upd
      |WHERE doc_id % 7 <> 3
      |  AND doc_id NOT IN (SELECT doc_id FROM src_u)
      |UNION ALL SELECT * FROM src_u
      |UNION ALL SELECT * FROM src_i
      |ORDER BY doc_id""".stripMargin

  /** q_table_changes: two lang-partitioned appends → row-level DELETE →
    * COMPACT → full typed change feed.
    *
    * Appends split by doc_id parity and are repartitioned on `lang`
    * before the write, so each `lang=X/batch_id=N` directory holds
    * exactly ONE file — which makes "the files DELETE rewrites"
    * (and therefore the rewrite rows the feed must surface) a pure
    * function of the data: a (lang, parity) group is affected iff it
    * contains a matching row. The feed then contains, per the CDF
    * contract ([[GraftTable.readChanges]]):
    *  - every row once as `insert` (the two appends),
    *  - the delete's survivors-in-affected-files as `rewrite`,
    *  - the whole post-delete state again as `rewrite` (compaction
    *    bin-packs every one of these small files).
    */
  def changeFeed(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-tv-cdf").toString
    try changeFeedAt(spark, dir, root)
    catch { case e: Throwable => Scratch.rm(new java.io.File(root)); throw e }
  }

  private def changeFeedAt(
      spark: SparkSession, dir: String, root: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))

    Seq(0L, 1L).foreach { b =>
      docs.filter(col("doc_id") % 2 === b)
        .withColumn("batch_id", lit(b))
        .repartition(col("lang"))
        .write.mode("append")
        .partitionBy("lang", "batch_id")
        .parquet(s"$root/docs")
      GraftTable.commit(spark, root, b)
    }

    GraftTable.deleteWhere(spark, root, "docs",
      col("lang") === "de" && col("doc_id") % 3 === 0)
    // the oracle's `comp` CTE assumes compaction rewrites the ENTIRE
    // post-delete state, which holds iff every lang group still has
    // >= 2 committed files (compact's small-group floor). That is a
    // property of the corpus (each lang must carry both doc_id
    // parities), so assert it here: a degenerate layout fails LOUDLY
    // at the harness instead of surfacing as an opaque hash mismatch
    // in the gate.
    val perLang = GraftTable.committedFiles(spark, root)
      .filter(_.startsWith("docs/"))
      .groupBy(_.split('/').find(_.startsWith("lang=")).getOrElse(""))
    perLang.find(_._2.size < 2).foreach { case (lang, files) =>
      throw new IllegalStateException(
        s"changeFeed oracle invariant broken: partition '$lang' holds " +
          s"only ${files.size} file(s) after the delete — compact would " +
          "skip it and the oracle's full-rewrite CTE would mismatch")
    }
    GraftTable.compact(spark, root, "docs")

    Scratch.materializeAndClean(root,
      GraftTable.readChanges(spark, root, "docs", afterVersion = -1L)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col(GraftTable.ChangeTypeCol))
        .orderBy("doc_id", GraftTable.ChangeTypeCol))
  }

  /** q_table_zorder: the Z-ORDER rewrite under the oracle gate — two
    * lang-partitioned appends, then `GRAFT OPTIMIZE … ZORDER BY
    * (doc_id, n_chars)` rewrites the whole sink clustered on the
    * Morton interleave (within each lang partition). Content must be
    * EXACTLY the union of the appends — a clustering rewrite that
    * drops, duplicates, or mangles a row hash-mismatches; the layout
    * property itself (per-file ranges narrow) is spec-asserted, since
    * an oracle can only see content. */
  def zorderTable(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-tv-zorder").toString
    try zorderTableAt(spark, dir, root)
    catch { case e: Throwable => Scratch.rm(new java.io.File(root)); throw e }
  }

  private def zorderTableAt(
      spark: SparkSession, dir: String, root: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Seq(0L, 1L).foreach { b =>
      docs.filter(col("doc_id") % 2 === b)
        .withColumn("batch_id", lit(b))
        .repartition(col("lang"))
        .write.mode("append")
        .partitionBy("lang", "batch_id")
        .parquet(s"$root/docs")
      GraftTable.commit(spark, root, b)
    }
    val res = spark.sql(s"GRAFT OPTIMIZE '$root' SINK 'docs' " +
      "ZORDER BY (doc_id, n_chars)").head
    require(!res.isNullAt(0), s"zorder was a no-op: ${res.getString(1)}")
    Scratch.materializeAndClean(root,
      GraftTable.read(spark, root, "docs")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id"))
  }

  /** The DuckDB twin of [[zorderTable]]: content is layout-invariant. */
  val zorderTableOracle: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |ORDER BY doc_id""".stripMargin

  /** q_stream_table: the commit-log STREAMING source under the oracle
    * gate — two committed appends land in a scratch log table, the
    * table is registered in a graft catalog, and
    * `spark.readStream.table(...)` drains it with AvailableNow through
    * the version-id offsets. The collected stream must equal the union
    * of the appends (every committed row exactly once, partition
    * columns included) — a dropped version, a double-read, or a
    * mis-planned per-batch parquet scan all surface as a hash
    * mismatch against DuckDB's restatement over the raw corpus. */
  def streamTable(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-tv-stream").toString
    try streamTableAt(spark, dir, root)
    catch { case e: Throwable => Scratch.rm(new java.io.File(root)); throw e }
  }

  private def streamTableAt(
      spark: SparkSession, dir: String, root: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Seq(0L, 1L).foreach { b =>
      docs.filter(col("doc_id") % 2 === b)
        .withColumn("batch_id", lit(b))
        .repartition(col("lang"))
        .write.mode("append")
        .partitionBy("lang", "batch_id")
        .parquet(s"$root/docs")
      GraftTable.commit(spark, root, b)
    }
    val cat = "graft_oracle_logcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$root/wh")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.docs USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'docs')")
    val q = spark.readStream.table(s"$cat.db.docs")
      .writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$root/out")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    Scratch.materializeAndClean(root,
      spark.read.parquet(s"$root/out")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id"))
  }

  /** The DuckDB twin of [[streamTable]]: every committed row once. */
  val streamTableOracle: String =
    """SELECT doc_id, lang, n_chars FROM documents
      |ORDER BY doc_id""".stripMargin

  /** The DuckDB twin of [[changeFeed]]'s feed contents. */
  val changeFeedOracle: String =
    """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
      |aff AS (SELECT DISTINCT lang, doc_id % 2 AS par FROM base
      |        WHERE lang = 'de' AND doc_id % 3 = 0),
      |ins AS (SELECT doc_id, lang, n_chars, 'insert' AS _change_type
      |        FROM base),
      |surv AS (SELECT b.doc_id, b.lang, b.n_chars,
      |                'rewrite' AS _change_type
      |         FROM base b JOIN aff a
      |           ON b.lang = a.lang AND b.doc_id % 2 = a.par
      |         WHERE NOT (b.lang = 'de' AND b.doc_id % 3 = 0)),
      |comp AS (SELECT doc_id, lang, n_chars, 'rewrite' AS _change_type
      |         FROM base WHERE NOT (lang = 'de' AND doc_id % 3 = 0))
      |SELECT * FROM ins
      |UNION ALL SELECT * FROM surv
      |UNION ALL SELECT * FROM comp
      |ORDER BY doc_id, _change_type""".stripMargin
}
