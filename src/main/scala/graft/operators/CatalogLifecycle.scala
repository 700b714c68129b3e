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
}
