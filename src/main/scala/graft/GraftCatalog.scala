package graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.ArrowInterchange
import graft.sources.GraftTable
import graft.sources.arrow.ArrowSourceProvider

/** TableCatalog plugin — NAMED tables over the engine's two storage
  * planes, so the SQL surface stops passing quoted paths around. The
  * reference addresses destinations and queries by table NAME
  * (`WithDestinationTable("bidreq")`, /root/reference/main.go:255;
  * `FROM bidreq`, main.go:97,118); this is that addressing for Spark:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/graft
  *
  *   CREATE NAMESPACE graft.db;
  *   CREATE TABLE graft.db.docs (doc_id BIGINT, text STRING)
  *     USING graft-arrow;                        -- managed arrow table
  *   INSERT INTO graft.db.docs SELECT …;         -- appends one shard
  *   INSERT OVERWRITE graft.db.docs SELECT …;    -- replaces the tree
  *   SELECT … FROM graft.db.docs;                -- full DSv2 scan
  *   CREATE TABLE graft.db.bids USING graft-log
  *     LOCATION '/exports/table' OPTIONS (sink 'raw');  -- external
  *   SELECT … FROM graft.db.bids VERSION AS OF 3;       -- time travel
  *   DROP TABLE graft.db.docs;                   -- managed: data too
  * }}}
  *
  * Two providers:
  *
  *  - **`graft-arrow`** (default): the table IS a graft-arrow SHARD
  *    TREE ([[graft.sources.arrow.ArrowSourceProvider]] with
  *    `appendable=true`) — batch read with column pruning / zone maps /
  *    COUNT(*) pushdown, INSERT INTO as whole-shard appends, INSERT
  *    OVERWRITE as a wholesale tree swap, and streaming read/write
  *    (`spark.readStream.table(…)` tails the shards). CREATE TABLE
  *    with columns publishes a schema-only `batch_id=0` shard so the
  *    empty table reads back with its declared schema.
  *  - **`graft-log`**: registers an existing [[GraftTable]] commit-log
  *    sink (`LOCATION` = table root, `sink` option = sink name) as a
  *    named table. Reads resolve the committed snapshot at
  *    table-resolution time (consistent within a query) and delegate
  *    the scan to Spark's own vectorized parquet source — full
  *    filter/column pushdown for free. `VERSION AS OF n` maps to
  *    [[GraftTable.readAsOf]]. `INSERT INTO` / `INSERT OVERWRITE` /
  *    `writeStream.toTable` publish through the commit protocol (one
  *    staged-then-promoted version per write, txn-stamped per
  *    streaming epoch); row-level mutation stays with the GRAFT verbs
  *    (MERGE/DELETE/UPDATE/OPTIMIZE). `batch_id` is log metadata, not
  *    a table column — lineage readers use the path API.
  *
  * Catalog METADATA is files, like everything else in the engine: one
  * regex-parseable JSON file per table under
  * `<warehouse>/_graft_catalog/<ns…>/<table>.json`, namespaces are the
  * directories — no metastore service, works on any HCFS. Scale: a
  * lookup is one file read; a listing is one directory listing. The
  * data plane's own commit protocols (shard markers, the commit log)
  * carry all correctness weight; losing catalog metadata loses only
  * name→path bindings, never data.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.warehouse"))
    warehouse = new Path(w)
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs: FileSystem =
    warehouse.getFileSystem(spark.sessionState.newHadoopConf())

  private val MetaDir = "_graft_catalog"

  // name segments become path segments: refuse anything that could
  // escape the metadata tree or collide with the format's own markers
  private val SegmentRe = "[A-Za-z0-9_][A-Za-z0-9_.-]*".r
  private def checkSegment(s: String): String = {
    require(SegmentRe.pattern.matcher(s).matches() && !s.startsWith("_"),
      s"invalid catalog name segment '$s' (want [A-Za-z0-9_.-]+, not " +
        "starting with '_')")
    s
  }

  private def nsPath(ns: Array[String]): Path =
    ns.map(checkSegment).foldLeft(new Path(warehouse, MetaDir))(new Path(_, _))
  private def metaPath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace), s"${checkSegment(ident.name)}.json")
  private def managedLocation(ident: Identifier): Path =
    (ident.namespace.map(checkSegment) :+ checkSegment(ident.name))
      .foldLeft(warehouse)(new Path(_, _))

  import GraftCatalog.{Meta, metaJson}

  private def readMeta(ident: Identifier): Option[Meta] =
    GraftCatalog.readMetaFile(fs, metaPath(ident))

  // metadata fields land in a regex-parseable JSON line: reject values
  // the writer cannot round-trip (quotes, backslashes, control chars)
  // at CREATE time — an unreadable binding could otherwise never even
  // be dropped through SQL
  private def jsonSafe(what: String, v: String): String = {
    require(v.forall(c => c >= ' ' && c != '"' && c != '\\'),
      s"$what '$v' contains characters the catalog metadata cannot " +
        "carry (no quotes, backslashes, or control characters)")
    v
  }

  // OPTIONS(...) arrive under TableCatalog.OPTION_PREFIX or bare
  // case-INSENSITIVE lookup (OPTIONS preserve user case under the
  // option. prefix; per-write options are case-insensitive, so the
  // table-level defaults must not be stricter). Deterministic
  // preference: the bare key (TBLPROPERTIES) wins over the
  // option.-prefixed one — never map-iteration order.
  private def tableOpt(props: scala.collection.Map[String, String],
                       k: String): Option[String] =
    props.find(_._1.equalsIgnoreCase(k)).map(_._2)
      .orElse(props.find(
        _._1.equalsIgnoreCase(TableCatalog.OPTION_PREFIX + k)).map(_._2))
      .map(jsonSafe(s"option $k", _))

  /** Writer options persisted with the binding, validated NOW. */
  private def writerOptsOf(props: scala.collection.Map[String, String])
      : Map[String, String] = Seq(
    tableOpt(props, "compression").map { c =>
      ArrowInterchange.codecType(c); "compression" -> c
    },
    tableOpt(props, "batchrows").map { b =>
      require(scala.util.Try(b.toInt).toOption.exists(_ > 0),
        s"batchrows must be a positive integer, got '$b'")
      "batchrows" -> b
    },
    tableOpt(props, "requiremarker").map { r =>
      require(r.equalsIgnoreCase("true") || r.equalsIgnoreCase("false"),
        s"requiremarker must be true|false, got '$r'")
      "requiremarker" -> r
    }).flatten.toMap

  /** Declared columns: validate the full type surface NOW, then publish
    * a schema-only `batch_id=0` shard so the empty table reads back
    * with its schema (and appends number from 1). */
  private def ensureSchemaShard(loc: String,
                                schema: StructType): Unit = {
    ArrowInterchange.toArrowSchema(schema)
    val hfs = fs
    val shard0 = new Path(new Path(loc), "batch_id=0")
    if (!hfs.exists(shard0)) {
      hfs.mkdirs(shard0)
      ArrowInterchange.writeSchemaOnly(hfs,
        new Path(shard0, "part-00000.arrows"), schema)
      ArrowInterchange.writeStatsManifest(hfs, shard0, Seq(
        ("part-00000.arrows",
          Map(ArrowInterchange.RowsMetaKey -> "0"))))
      hfs.create(new Path(shard0, "_SUCCESS"), true).close()
    }
  }

  // ---- namespaces -------------------------------------------------------

  override def defaultNamespace(): Array[String] = Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean =
    fs.exists(nsPath(namespace))

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse, MetaDir)
    val hfs = fs
    if (!hfs.exists(root)) Array.empty
    else hfs.listStatus(root).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val p = nsPath(namespace)
    val hfs = fs
    if (!hfs.exists(p)) throw new NoSuchNamespaceException(
      name() +: namespace)
    hfs.listStatus(p).filter(_.isDirectory)
      .map(s => namespace :+ s.getPath.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace)
    util.Map.of("location", nsPath(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(name() +: namespace)
    fs.mkdirs(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no alterable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    val hfs = fs
    if (!hfs.exists(p)) return false
    if (!cascade && hfs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty " +
          "(use CASCADE); managed tables' DATA is only deleted by " +
          "explicit DROP TABLE, never by a non-cascading namespace drop")
    // CASCADE owns the tables it drops: MANAGED tables' data goes with
    // the binding (V2 CASCADE semantics) — deleting only the metadata
    // tree would orphan their data under the warehouse with no
    // remaining SQL path to it. External locations stay untouched, as
    // in dropTable. Nested namespaces are walked (metadata dirs nest).
    if (cascade) {
      def walk(dir: Path): Unit =
        hfs.listStatus(dir).foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".json"))
            GraftCatalog.readMetaFile(hfs, st.getPath)
              .filter(_.managed)
              .foreach(m => hfs.delete(new Path(m.location), true))
        }
      walk(p)
    }
    hfs.delete(p, true)
  }

  // ---- tables -----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    val hfs = fs
    if (!hfs.exists(p)) throw new NoSuchNamespaceException(
      name() +: namespace)
    hfs.listStatus(p).filter(_.isFile)
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(n => Identifier.of(namespace, n.stripSuffix(".json")))
  }

  override def tableExists(ident: Identifier): Boolean =
    readMeta(ident).isDefined

  private def arrowTable(meta: Meta): Table = {
    val provider = new ArrowSourceProvider
    // the registered table OPTIONS (compression, batchrows,
    // requiremarker) ride the binding and become the table's DEFAULTS —
    // an INSERT INTO has no write options of its own, so without this
    // a perfectly valid `OPTIONS (compression 'zstd')` would be
    // silently discarded
    val props = new util.HashMap[String, String]()
    props.put("path", meta.location)
    props.put("appendable", "true")
    meta.options.foreach { case (k, v) => props.put(k, v) }
    val schema = provider.inferSchema(new CaseInsensitiveStringMap(props))
    provider.getTable(schema, Array.empty[Transform], props)
  }

  private def logTable(meta: Meta, ident: Identifier,
                       asOf: Option[Long]): Table = {
    val root = meta.location
    val sink = meta.sink.getOrElse(throw new IllegalStateException(
      s"graft-log table ${ident} has no sink recorded"))
    val display = s"$catalogName.${(ident.namespace :+ ident.name).mkString(".")}"
    // shared factory with the path-based format("graft-log") provider:
    // parquet delegation with full pushdown, streaming over versions;
    // only a NEVER-written sink (no schema anywhere) degrades to the
    // zero-column, batch-only empty table
    graft.sources.GraftLogTable.forSink(spark, root, sink, asOf, display)
      .getOrElse(new GraftEmptySnapshotTable(display, new StructType()))
  }

  override def loadTable(ident: Identifier): Table =
    readMeta(ident) match {
      case None => throw new NoSuchTableException(ident)
      case Some(m) if m.provider == "graft-log" => logTable(m, ident, None)
      case Some(m) => arrowTable(m)
    }

  /** `VERSION AS OF n` — time travel by NAME for commit-log tables
    * ([[GraftTable.readAsOf]]'s catalog spelling). */
  override def loadTable(ident: Identifier, version: String): Table =
    readMeta(ident) match {
      case None => throw new NoSuchTableException(ident)
      case Some(m) if m.provider == "graft-log" =>
        val v = scala.util.Try(version.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"VERSION AS OF wants a batch id (long), got '$version'"))
        logTable(m, ident, Some(v))
      case Some(_) => throw new UnsupportedOperationException(
        "graft-arrow tables are not versioned (shard trees keep no " +
          "history) — VERSION AS OF addresses graft-log tables")
    }

  /** `TIMESTAMP AS OF t` — time travel by commit INSTANT: resolves to
    * the latest version whose (monotone-adjusted) commit timestamp is
    * ≤ t via [[graft.sources.GraftTable.versionAt]], then loads that
    * snapshot exactly as `VERSION AS OF` would. Spark hands the
    * instant in MICROSECONDS since the epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    readMeta(ident) match {
      case None => throw new NoSuchTableException(ident)
      case Some(m) if m.provider == "graft-log" =>
        val v = graft.sources.GraftTable.versionAt(
          spark, m.location, Math.floorDiv(timestamp, 1000L))
        logTable(m, ident, Some(v))
      case Some(_) => throw new UnsupportedOperationException(
        "graft-arrow tables are not versioned (shard trees keep no " +
          "history) — TIMESTAMP AS OF addresses graft-log tables")
    }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft catalog tables are unpartitioned (shard trees and the " +
        "commit log manage their own layout)")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    val provider = props.getOrElse(TableCatalog.PROP_PROVIDER, "graft-arrow")
      .toLowerCase
    val location = props.get(TableCatalog.PROP_LOCATION)
    location.foreach(jsonSafe("LOCATION", _))
    val writerOpts = writerOptsOf(props)
    def opt(k: String): Option[String] = tableOpt(props, k)
    val meta = provider match {
      case "graft-arrow" =>
        val loc = location.getOrElse(managedLocation(ident).toString)
        if (schema.nonEmpty) ensureSchemaShard(loc, schema)
        Meta("graft-arrow", loc, None, managed = location.isEmpty,
          options = writerOpts)
      case "graft-log" =>
        val loc = location.getOrElse(throw new IllegalArgumentException(
          "graft-log tables register an EXISTING commit-log root: " +
            "LOCATION '<table root>' is required"))
        val sink = opt("sink")
          .getOrElse(throw new IllegalArgumentException(
            "graft-log tables need OPTIONS (sink '<sink name>')"))
        require(schema.isEmpty,
          "graft-log tables infer their schema from the commit log — " +
            "register without columns")
        Meta("graft-log", loc, Some(jsonSafe("sink", sink)),
          managed = false)
      case other => throw new UnsupportedOperationException(
        s"unknown provider '$other' for the graft catalog " +
          "(want graft-arrow | graft-log)")
    }
    val p = metaPath(ident)
    val hfs = fs
    hfs.mkdirs(p.getParent)
    val out = hfs.create(p, false) // no-overwrite: the exists race loses
    try out.write(metaJson(meta)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    loadTable(ident)
  }

  /** `ALTER TABLE … ADD COLUMNS` for commit-log tables: maps to the
    * data plane's additive evolution ([[GraftTable.evolveSchema]] — a
    * files-empty version recording the extended schema). Old versions
    * keep reading (VERSION AS OF a pre-evolution id shows the old
    * schema); existing files null-fill the new columns. Added columns
    * must be nullable — rows that predate them have no value to give.
    * Everything else stays unalterable: shard-tree (graft-arrow)
    * schemas live in their footers, and non-additive changes are the
    * commit log's hard law. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val meta = readMeta(ident).getOrElse(throw new NoSuchTableException(ident))
    if (meta.provider != "graft-log")
      throw new UnsupportedOperationException(
        "graft-arrow tables carry no alterable metadata — their schema " +
          "lives in shard footers (recreate, or use a graft-log table " +
          "for evolvable schemas)")
    val sink = meta.sink.getOrElse(throw new IllegalStateException(
      s"graft-log table $ident has no sink recorded"))
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          "ADD COLUMNS supports top-level columns only (nested struct " +
            s"evolution is not supported): ${a.fieldNames().mkString(".")}")
        require(a.isNullable,
          s"added column '${a.fieldNames().head}' must be nullable — " +
            "rows that predate it have no value to carry")
        StructType(Seq.empty).add(a.fieldNames().head, a.dataType(),
          nullable = true).fields.head
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER for a graft-log table: $other (additive " +
          "ADD COLUMNS only — types, renames, and drops would break " +
          "committed files)")
    }
    GraftTable.evolveSchema(spark, meta.location, sink, StructType(adds))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    readMeta(ident) match {
      case None => false
      case Some(m) =>
        val hfs = fs
        // managed data goes with the binding; external data is only
        // UNREGISTERED — its lifecycle (vacuum, retention) stays with
        // the storage plane that owns it
        if (m.managed) hfs.delete(new Path(m.location), true)
        hfs.delete(metaPath(ident), false)
    }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val meta = readMeta(oldIdent).getOrElse(
      throw new NoSuchTableException(oldIdent))
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val hfs = fs
    hfs.mkdirs(metaPath(newIdent).getParent)
    // a managed table's data directory moves with its name so the
    // binding stays self-describing; external locations are untouched
    val moved =
      if (meta.managed) {
        val dest = managedLocation(newIdent)
        // a stale directory at the new managed location would turn the
        // rename into a POSIX/HDFS mv-INTO (the data nests one level
        // down inside dest while the binding points at dest) — refuse
        // up front; the operator clears the debris explicitly
        if (hfs.exists(dest)) throw new IllegalStateException(
          s"cannot rename to ${newIdent}: the managed location $dest " +
            "already exists (stale data from a dropped table?) — " +
            "remove it first, or rename to a different name")
        if (hfs.exists(new Path(meta.location)))
          require(hfs.rename(new Path(meta.location), dest),
            s"renaming managed data ${meta.location} -> $dest failed")
        meta.copy(location = dest.toString)
      } else meta
    val out = hfs.create(metaPath(newIdent), false)
    try out.write(metaJson(moved)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    hfs.delete(metaPath(oldIdent), false)
    ()
  }

  // ---- staged (atomic) CTAS / RTAS ---------------------------------------
  //
  // CREATE TABLE … AS SELECT and REPLACE TABLE … AS SELECT write the
  // query's rows BEFORE the table exists; the non-staging path would
  // bind the name first and clean up best-effort on failure (and
  // non-atomic RTAS drops the OLD table before the new data exists —
  // a failed query loses it). Staged semantics: data lands in a
  // DOT-PREFIXED staging tree beside the final location, the binding is
  // written only in commitStagedChanges() after a successful rename,
  // and abort deletes only staging — a failed CTAS leaves no binding,
  // no data at the final location, and a failed RTAS leaves the old
  // table byte-identical.

  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = false, orCreate = false)

  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: util.Map[String, String]): StagedTable =
    stage(ident, schema, partitions, properties,
      replace = true, orCreate = false)

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: util.Map[String, String])
      : StagedTable =
    stage(ident, schema, partitions, properties,
      replace = true, orCreate = true)

  private def stage(ident: Identifier, schema: StructType,
                    partitions: Array[Transform],
                    properties: util.Map[String, String],
                    replace: Boolean, orCreate: Boolean): StagedTable = {
    require(partitions.isEmpty,
      "graft catalog tables are unpartitioned (shard trees manage " +
        "their own layout)")
    val props = properties.asScala
    val provider = props.getOrElse(TableCatalog.PROP_PROVIDER, "graft-arrow")
      .toLowerCase
    if (provider != "graft-arrow") throw new UnsupportedOperationException(
      "CTAS/RTAS creates a table from query rows — only graft-arrow " +
        "tables are created that way (graft-log tables register an " +
        "EXISTING commit log; use CREATE TABLE … USING `graft-log` " +
        "LOCATION …)")
    if (!replace && tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    if (replace && !orCreate && !tableExists(ident))
      throw new NoSuchTableException(ident)
    val location = props.get(TableCatalog.PROP_LOCATION)
    location.foreach(jsonSafe("LOCATION", _))
    val writerOpts = writerOptsOf(props)
    val finalLoc = new Path(
      location.getOrElse(managedLocation(ident).toString))
    new StagedArrow(ident, finalLoc, managed = location.isEmpty,
      writerOpts, schema, replace)
  }

  /** One staged CTAS/RTAS target: a real, writable arrow table over the
    * staging tree; commit renames it into place and binds the name. */
  private class StagedArrow(ident: Identifier, finalLoc: Path,
                            managed: Boolean,
                            writerOpts: Map[String, String],
                            declared: StructType,
                            replace: Boolean)
      extends StagedTable with SupportsRead with SupportsWrite {
    private val staging = new Path(finalLoc.getParent,
      s".${finalLoc.getName}.ctas-${java.util.UUID.randomUUID()}")
    locally {
      fs.mkdirs(staging)
      if (declared.nonEmpty) ensureSchemaShard(staging.toString, declared)
    }
    private val delegate = arrowTable(
      Meta("graft-arrow", staging.toString, None, managed, writerOpts))

    override def name(): String = ident.toString
    override def schema(): StructType = declared
    override def capabilities(): util.Set[TableCapability] =
      delegate.capabilities()
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder =
      delegate.asInstanceOf[SupportsRead].newScanBuilder(options)
    override def newWriteBuilder(
        info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder =
      delegate.asInstanceOf[SupportsWrite].newWriteBuilder(info)

    override def commitStagedChanges(): Unit = {
      val hfs = fs
      val metaP = metaPath(ident)
      if (replace) {
        // the OLD table dies only now, with the new data complete
        readMeta(ident).foreach { old =>
          if (old.managed) hfs.delete(new Path(old.location), true)
          else if (old.location == finalLoc.toString)
            throw new IllegalStateException(
              s"REPLACE of external table $ident at its own location " +
                "would delete data the catalog does not own — drop and " +
                "re-create instead")
        }
        hfs.delete(metaP, false)
      }
      if (hfs.exists(finalLoc)) throw new IllegalStateException(
        s"cannot commit $ident: $finalLoc already exists (stale data " +
          "from a dropped table?) — remove it first")
      hfs.mkdirs(finalLoc.getParent)
      require(hfs.rename(staging, finalLoc),
        s"staged CTAS promotion failed: $staging -> $finalLoc")
      hfs.mkdirs(metaP.getParent)
      val out = hfs.create(metaP, false) // no-overwrite: races lose
      try out.write(metaJson(
        Meta("graft-arrow", finalLoc.toString, None, managed, writerOpts))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }

    override def abortStagedChanges(): Unit = { fs.delete(staging, true); () }
  }
}

object GraftCatalog {
  /** One registered table's binding. */
  private[graft] case class Meta(provider: String, location: String,
                                 sink: Option[String], managed: Boolean,
                                 options: Map[String, String] = Map.empty)

  private val MetaRe =
    ("""\{"provider":"([^"]+)","location":"([^"]+)"""" +
      """(?:,"sink":"([^"]+)")?,"managed":(true|false)""" +
      """(?:,"options":\{([^}]*)\})?\}""").r
  private val OptRe = """"([^"]+)":"([^"]*)"""".r

  private[graft] def metaJson(m: Meta): String = {
    val sink = m.sink.map(s => s""","sink":"$s"""").getOrElse("")
    val opts =
      if (m.options.isEmpty) ""
      else m.options.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }
        .mkString(""","options":{""", ",", "}")
    s"""{"provider":"${m.provider}","location":"${m.location}"$sink,"managed":${m.managed}$opts}"""
  }

  private[graft] def parseMeta(text: String, at: Path): Meta =
    text.trim match {
      case MetaRe(provider, location, sink, managed, opts) =>
        val options = Option(opts).map(o =>
          OptRe.findAllMatchIn(o)
            .map(m => m.group(1) -> m.group(2)).toMap)
          .getOrElse(Map.empty[String, String])
        Meta(provider, location, Option(sink), managed.toBoolean, options)
      case other => throw new IllegalStateException(
        s"unparseable catalog metadata at $at: $other")
    }

  private[graft] def readMetaFile(hfs: FileSystem, p: Path): Option[Meta] =
    if (!hfs.exists(p)) None
    else {
      val in = hfs.open(p)
      val text =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      Some(parseMeta(text, p))
    }

  /** Resolve a catalog-qualified name (`cat.ns….table`) to its
    * commit-log binding (root, sink) — the hook the GRAFT maintenance
    * verbs use to accept NAMED tables. Reads the catalog's own conf
    * keys + metadata file, so it needs no Spark-internal catalog-
    * manager access and works whether or not the catalog was touched
    * yet this session. */
  def resolveLogTable(spark: SparkSession,
                      parts: Seq[String]): (String, String) = {
    require(parts.length >= 3,
      s"expected catalog.namespace….table, got ${parts.mkString(".")}")
    val cat = parts.head
    val cls = spark.conf.getOption(s"spark.sql.catalog.$cat")
    require(cls.contains(classOf[GraftCatalog].getName),
      s"'$cat' is not a graft catalog (spark.sql.catalog.$cat = " +
        s"${cls.getOrElse("<unset>")})")
    val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"spark.sql.catalog.$cat.warehouse is not set"))
    val metaFile = (parts.tail.init :+ s"${parts.last}.json")
      .foldLeft(new Path(new Path(wh), "_graft_catalog"))(new Path(_, _))
    val hfs = metaFile.getFileSystem(spark.sessionState.newHadoopConf())
    val meta = readMetaFile(hfs, metaFile).getOrElse(
      throw new IllegalArgumentException(
        s"no table '${parts.mkString(".")}' registered (expected " +
          s"metadata at $metaFile)"))
    require(meta.provider == "graft-log",
      s"'${parts.mkString(".")}' is a ${meta.provider} table — the GRAFT " +
        "maintenance verbs address commit-log (graft-log) tables; " +
        "graft-arrow tables take INSERT/OVERWRITE/DROP directly")
    (meta.location, meta.sink.getOrElse(throw new IllegalStateException(
      s"graft-log table ${parts.mkString(".")} has no sink recorded")))
  }
}

/** An empty snapshot with a pinned schema — what a commit-log sink with
  * no committed files reads as (same contract as GraftTable.read). */
private[graft] class GraftEmptySnapshotTable(tableName: String,
                                             declared: StructType)
    extends Table with SupportsRead {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.connector.read._

  override def name(): String = tableName
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = declared
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array.empty
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(
                p: InputPartition): PartitionReader[InternalRow] =
              throw new IllegalStateException("empty scan has no partitions")
          }
      }
    }
}
