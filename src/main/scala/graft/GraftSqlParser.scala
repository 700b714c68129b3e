package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.GraftTable

/** SQL statements for table-format maintenance — the `OPTIMIZE` /
  * `VACUUM` / `DELETE` verbs Delta exposes as SQL, here prefixed with
  * `GRAFT` so they can never collide with Spark's grammar:
  *
  * {{{
  *   GRAFT OPTIMIZE '<root>' SINK '<sink>' [SMALL <bytes>] [TARGET <bytes>]
  *   GRAFT VACUUM '<root>' RETAIN <millis>
  *   GRAFT DELETE '<root>' SINK '<sink>' WHERE <predicate>
  * }}}
  *
  * Everything else delegates to Spark's parser. The commands are
  * `RunnableCommand`s: `spark.sql(...)` executes them eagerly (the
  * same semantics as Spark's own DDL), they run through the same
  * `GraftTable` code paths as the Scala API, and they return their
  * outcome as rows. The DELETE predicate is parsed by Spark's own
  * expression parser — the full SQL expression language is available —
  * and resolves against the sink's frame inside `deleteWhere`.
  *
  * Installed via `spark.sql.extensions=graft.GraftExtensions` (parser
  * injection happens at session build; the live `install(spark)` path
  * cannot add parser rules and documents that).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeRe(root, sink, small, target) =>
      GraftOptimizeCommand(root, sink,
        Option(small).map(_.toLong), Option(target).map(_.toLong))
    case VacuumRe(root, retain) =>
      GraftVacuumCommand(root, retain.toLong)
    case DeleteRe(root, sink, cond) =>
      delegate.parseExpression(cond) // fail fast on bad syntax at parse time
      GraftDeleteCommand(root, sink, cond)
    case HistoryRe(root) => GraftHistoryCommand(root)
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  private val OptimizeRe =
    """(?is)\s*GRAFT\s+OPTIMIZE\s+'([^']+)'\s+SINK\s+'([^']+)'(?:\s+SMALL\s+(\d+))?(?:\s+TARGET\s+(\d+))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*GRAFT\s+VACUUM\s+'([^']+)'\s+RETAIN\s+(\d+)\s*;?\s*""".r
  private val DeleteRe =
    """(?is)\s*GRAFT\s+DELETE\s+'([^']+)'\s+SINK\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*GRAFT\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
}

/** `GRAFT OPTIMIZE`: [[GraftTable.compact]] as a SQL command. */
case class GraftOptimizeCommand(root: String, sink: String,
                                small: Option[Long], target: Option[Long])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("note", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftTable.compact(spark, root, sink,
      small.getOrElse(32L << 20), target.getOrElse(128L << 20)) match {
      case Some(v) => Seq(Row(v, s"compacted '$sink' into version $v"))
      case None => Seq(Row(null, "nothing to compact"))
    }
}

/** `GRAFT VACUUM`: [[GraftTable.vacuum]] as a SQL command. */
case class GraftVacuumCommand(root: String, retainMs: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("removed", LongType)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(GraftTable.vacuum(spark, root, retainMs).size.toLong))
}

/** `GRAFT HISTORY`: Delta's `DESCRIBE HISTORY` analog — one row per
  * published version (survives checkpoint folding), with file counts
  * and the sinks each version touched. */
case class GraftHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("added_files", LongType)(),
    AttributeReference("removed_files", LongType)(),
    AttributeReference("sinks", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftTable.history(spark, root).map { v =>
      Row(v.batchId, v.files.size.toLong, v.removed.size.toLong,
        v.schemas.keys.toSeq.sorted.mkString(","))
    }
}

/** `GRAFT DELETE`: [[GraftTable.deleteWhere]] as a SQL command. The
  * predicate travels as its SQL text (an unresolved Expression held in
  * the node would trip CheckAnalysis before the command runs — it can
  * only resolve against the sink's frame inside deleteWhere). */
case class GraftDeleteCommand(root: String, sink: String,
                              predicateSql: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType)(),
    AttributeReference("note", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    GraftTable.deleteWhere(spark, root, sink,
      org.apache.spark.sql.functions.expr(predicateSql)) match {
      case Some(v) => Seq(Row(v, s"rewrote matching files into version $v"))
      case None => Seq(Row(null, "no rows matched"))
    }
}
