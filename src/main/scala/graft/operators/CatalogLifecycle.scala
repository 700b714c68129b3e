package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftCatalog
import graft.sources.Tables

/** Oracle-harness lifecycle for the `graft` TableCatalog
  * ([[graft.GraftCatalog]]): the documents corpus flows through
  * catalog-NAMED tables — CTAS of the even half, INSERT INTO (a whole
  * appended shard) of the odd half, then a plain `SELECT … FROM
  * <catalog>.db.docs` aggregate — and the result must hash-match DuckDB
  * aggregating the same corpus directly. This is the reference's
  * named-destination addressing (`WithDestinationTable("bidreq")`,
  * /root/reference/main.go:255, queried as `FROM bidreq`, main.go:97)
  * landed on Spark's V2 catalog API: if any step — the catalog binding,
  * the schema-only create shard, the append's shard commit, the scan
  * over the assembled tree — dropped or duplicated a row, the totals
  * would differ. */
object CatalogLifecycle {

  def lifecycle(spark: SparkSession, dir: String): DataFrame = {
    val wh = Files.createTempDirectory("graft-catalog-oracle").toString
    val cat = "graft_oracle_cat"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    Tables.documents(spark, dir)
      .select("doc_id", "lang", "text")
      .createOrReplaceTempView("catalog_docs_src")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.docs")
    spark.sql(s"CREATE TABLE $cat.db.docs USING `graft-arrow` AS " +
      "SELECT doc_id, lang, text FROM catalog_docs_src WHERE doc_id % 2 = 0")
    spark.sql(s"INSERT INTO $cat.db.docs " +
      "SELECT doc_id, lang, text FROM catalog_docs_src WHERE doc_id % 2 = 1")
    // DuckDB len() is BIGINT where Spark length() is INT: cast the sum
    val out = spark.sql(
      s"""SELECT lang, count(*) AS docs,
         |       CAST(sum(length(text)) AS BIGINT) AS chars,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM $cat.db.docs GROUP BY lang ORDER BY lang""".stripMargin)
    Scratch.materializeAndClean(wh, out)
  }

  val lifecycleOracle: String =
    """SELECT lang, count(*) AS docs,
      |       CAST(sum(len(text)) AS BIGINT) AS chars,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** `INSERT INTO` a named COMMIT-LOG table — the reference's
    * append-to-destination-table loop (main.go:255) as SQL over the
    * transactional log: a third of the corpus seeds the sink through
    * the raw commit protocol (the streaming pipeline's layout), two
    * INSERTs publish one version each through the V1 write path, and
    * the aggregate over the named table must match DuckDB over the
    * whole corpus — any dropped/duplicated row, broken partition
    * routing, or staging leak shifts the totals. */
  def logInsert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val root = Files.createTempDirectory("graft-loginsert-oracle").toString
    val cat = "graft_oracle_logins"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$root/wh")
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
    docs.createOrReplaceTempView("log_insert_src")
    docs.filter(col("doc_id") % 3 === 0)
      .withColumn("batch_id", lit(0L))
      .repartition(col("lang"))
      .write.mode("append").partitionBy("lang", "batch_id")
      .parquet(s"$root/docs")
    graft.sources.GraftTable.commit(spark, root, 0L)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.docs")
    spark.sql(s"CREATE TABLE $cat.db.docs USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'docs')")
    // table column order = footer (doc_id, n_chars) then partition (lang)
    spark.sql(s"INSERT INTO $cat.db.docs SELECT doc_id, n_chars, lang " +
      "FROM log_insert_src WHERE doc_id % 3 = 1")
    spark.sql(s"INSERT INTO $cat.db.docs SELECT doc_id, n_chars, lang " +
      "FROM log_insert_src WHERE doc_id % 3 = 2")
    val out = spark.sql(
      s"""SELECT lang, count(*) AS docs,
         |       CAST(sum(n_chars) AS BIGINT) AS chars,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM $cat.db.docs GROUP BY lang ORDER BY lang""".stripMargin)
    Scratch.materializeAndClean(root, out)
  }

  val logInsertOracle: String =
    """SELECT lang, count(*) AS docs,
      |       CAST(sum(n_chars) AS BIGINT) AS chars,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** `ALTER TABLE ADD COLUMNS` on a named commit-log table: the even
    * half of the corpus predates the column (reads back null), the odd
    * half materializes it through `INSERT INTO` with a deterministic
    * value — the aggregate proves null-fill of pre-evolution files,
    * schema pinning, and the evolved write path in one row. */
  def logEvolve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val root = Files.createTempDirectory("graft-logevolve-oracle").toString
    val cat = "graft_oracle_logev"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", s"$root/wh")
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
    docs.createOrReplaceTempView("log_evolve_src")
    docs.filter(col("doc_id") % 2 === 0)
      .withColumn("batch_id", lit(0L))
      .repartition(col("lang"))
      .write.mode("append").partitionBy("lang", "batch_id")
      .parquet(s"$root/docs")
    graft.sources.GraftTable.commit(spark, root, 0L)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.docs")
    spark.sql(s"CREATE TABLE $cat.db.docs USING `graft-log` " +
      s"LOCATION '$root' OPTIONS (sink 'docs')")
    spark.sql(s"ALTER TABLE $cat.db.docs ADD COLUMNS (score DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.docs " +
      "SELECT doc_id, n_chars, CAST(n_chars AS DOUBLE) * 0.5 AS score, " +
      "lang FROM log_evolve_src WHERE doc_id % 2 = 1")
    val out = spark.sql(
      s"""SELECT lang, count(*) AS docs, count(score) AS scored,
         |       round(sum(coalesce(score, CAST(0 AS DOUBLE))), 2) AS score_sum
         |FROM $cat.db.docs GROUP BY lang ORDER BY lang""".stripMargin)
    Scratch.materializeAndClean(root, out)
  }

  val logEvolveOracle: String =
    """SELECT lang, count(*) AS docs,
      |       count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS scored,
      |       round(sum(CASE WHEN doc_id % 2 = 1
      |                 THEN CAST(n_chars AS DOUBLE) * 0.5
      |                 ELSE CAST(0 AS DOUBLE) END), 2) AS score_sum
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
}
