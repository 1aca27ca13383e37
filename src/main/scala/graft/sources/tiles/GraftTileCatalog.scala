package graft.sources.tiles

import java.io.File

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `TableCatalog` over the tile layout — the DDL face of the connector:
  * with `spark.sql.catalog.tiles = GraftTileCatalog` (+ a `warehouse`
  * option), plain SQL drives the whole lifecycle:
  *
  * {{{
  *   CREATE TABLE tiles.db.t (k BIGINT, v STRING)
  *   INSERT INTO tiles.db.t SELECT ...
  *   SELECT ... FROM tiles.db.t        -- full pushdown/prune read path
  *   ALTER TABLE tiles.db.t ADD COLUMNS (w DOUBLE)  -- nullable-only evolution
  *                                     -- (all other ALTERs rejected)
  *   DROP TABLE tiles.db.t
  * }}}
  *
  * Identity mapping: `db.t` lives at `<warehouse>/db/t`, a table EXISTS
  * iff its manifest file exists (the same atomic-publish object the write
  * commit produces), and `loadTable` returns the ordinary
  * [[GraftTileTable]] — DDL and the path-based `format("graft-tiles")`
  * API are two doors into one layout. A `CREATE` publishes an empty
  * manifest, so a created-but-never-written table reads as zero rows
  * (and the metadata COUNT answers without opening anything).
  */
class GraftTileCatalog extends TableCatalog {

  private var catName: String = "tiles"
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(new File("target/tmp/tile_warehouse").getAbsolutePath)
  }

  override def name(): String = catName

  private def dirFor(ident: Identifier): File =
    new File((warehouse +: ident.namespace() :+ ident.name()).mkString(File.separator))

  private def manifestOf(ident: Identifier): File =
    new File(dirFor(ident), TileFormat.ManifestName)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsDir = new File((warehouse +: namespace).mkString(File.separator))
    if (!nsDir.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(nsDir.listFiles()).getOrElse(Array.empty)
      .filter(d => new File(d, TileFormat.ManifestName).isFile)
      .map(d => Identifier.of(namespace, d.getName))
  }

  override def tableExists(ident: Identifier): Boolean = manifestOf(ident).isFile

  override def loadTable(ident: Identifier): Table =
    TileFormat.readManifest(dirFor(ident).getAbsolutePath) match {
      case Some(m) => new GraftTileTable(dirFor(ident).getAbsolutePath, m.schema)
      case None => throw new NoSuchTableException(ident)
    }

  /** SQL time travel (r13): `SELECT ... FROM tiles.db.t VERSION AS OF <seq>`
    * — the version string is a commit_seq; the returned table is pinned to
    * that committed manifest (read-only, schema AS OF that version). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirFor(ident).getAbsolutePath
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val seq = try version.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft-tiles: VERSION AS OF expects a commit_seq number, got '$version'")
    }
    TileFormat.readManifestVersion(dir, seq) match {
      case Some(m) => new GraftTileTable(dir, m.schema, Some(seq))
      case None => throw new IllegalArgumentException(
        s"graft-tiles: no committed version $seq for $ident (vacuumed or never " +
          s"written; available: ${TileFormat.listVersions(dir).mkString(", ")})")
    }
  }

  /** SQL time travel by instant (r14): `… FROM tiles.db.t TIMESTAMP AS OF
    * <ts>` — Spark hands the instant in MICROSECONDS; the catalog resolves
    * it to the latest commit at-or-before it
    * ([[TileFormat.versionAsOfTimestamp]], Delta semantics) and pins the
    * table exactly like `VERSION AS OF` does. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = dirFor(ident).getAbsolutePath
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val tsMillis = Math.floorDiv(timestamp, 1000L)
    TileFormat.versionAsOfTimestamp(dir, tsMillis) match {
      case Some(seq) =>
        new GraftTileTable(dir, TileFormat.readManifestVersion(dir, seq).get.schema,
          Some(seq))
      case None => throw new IllegalArgumentException(
        s"graft-tiles: no committed version of $ident at or before " +
          s"${java.time.Instant.ofEpochMilli(tsMillis)} (before the oldest " +
          "retained commit, or history vacuumed)")
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    // PARTITIONED BY (r13): a single IDENTITY transform on a zone-mapped
    // column — recorded in the manifest; every INSERT then adopts it (the
    // write builder reads it back), each tile holds one value, and reads
    // report KeyGroupedPartitioning (storage-partitioned joins) + answer
    // GROUP BY <col> aggregates from the manifest. Bucket/range/temporal
    // transforms would need a FunctionCatalog round-trip — rejected.
    val partitionBy: Option[String] = partitions match {
      case Array() => None
      case Array(t) if t.name() == "identity" && t.arguments().length == 1 =>
        val c = t.arguments()(0) match {
          case nr: org.apache.spark.sql.connector.expressions.NamedReference
            if nr.fieldNames().length == 1 => nr.fieldNames()(0)
          case other => throw new UnsupportedOperationException(
            s"graft-tiles: PARTITIONED BY supports a top-level column only, got $other")
        }
        require(schema.fieldNames.contains(c),
          s"graft-tiles: PARTITIONED BY column `$c` is not in the schema")
        require(TileFormat.statTracked(schema(c).dataType),
          s"graft-tiles: PARTITIONED BY column `$c` (${schema(c).dataType.sql}) " +
            "carries no zone map — identity partitioning needs one")
        Some(c)
      case other =>
        throw new UnsupportedOperationException(
          s"graft-tiles: unsupported PARTITIONED BY ${other.mkString(", ")} — " +
            "only a single identity column (ad-hoc clustering comes from the " +
            "cluster_by write option)")
    }
    GraftTilesSource.validateSchema(schema) // type support + reserved names
    val d = dirFor(ident)
    d.mkdirs()
    // durable TBLPROPERTIES (r14): user properties persist in the manifest
    // (engine-reserved keys Spark injects are not table config)
    val userProps = {
      import scala.jdk.CollectionConverters._
      properties.asScala.toMap -- GraftTileCatalog.EngineProps
    }
    // CREATE is the publish of an empty manifest — the same atomic object
    // a write commit replaces, so readers never see a schemaless table
    TileFormat.writeManifest(d.getAbsolutePath, schema, Seq.empty,
      expect = TileFormat.ExpectAbsent, partitionBy = partitionBy,
      tableProps = Some(userProps))
    new GraftTileTable(d.getAbsolutePath,
      TileFormat.readManifest(d.getAbsolutePath).get.schema)
  }

  /** Schema evolution, ALL metadata-only (r14 — field-id mapping): ADD,
    * RENAME, and DROP COLUMN are manifest edits; no tile is ever
    * rewritten.
    *
    *  - '''ADD''': the new column gets a FRESH field id
    *    (`manifest.nextFieldId`); existing tiles carry no chunk with that
    *    id and read it as null (the Iceberg add-column contract).
    *  - '''RENAME''': the field id is stable, only the NAME changes —
    *    old tiles keep resolving through their `colIds`. The name-keyed
    *    zone maps (and bloom column lists / partition column reference)
    *    are re-keyed in the same publish so pruning keeps firing; a
    *    renamed column's bloom SIDEcars still carry the old name inside,
    *    which safely disables (never corrupts) the bloom prune until
    *    compaction regenerates them.
    *  - '''DROP''': the field leaves the schema; its id is never reused
    *    (`nextFieldId` is persistent), so a later re-ADD of the same NAME
    *    reads null on old tiles instead of resurfacing dropped data. The
    *    dropped column's stats keys are removed from every tile — a stale
    *    same-name entry would wrongly prune the re-added column. Requires
    *    every tile to be field-id-stamped (legacy positional tiles would
    *    misparse once positions shift — compact first). The partition
    *    column cannot be dropped.
    *
    *  - '''WIDEN''' (ALTER COLUMN TYPE, INT → BIGINT): the manifest type
    *    widens; stamped tiles decode their chunks with the RECORDED
    *    physical tag and upcast on read — no rewrite, stats and blooms
    *    survive (shared value domain).
    *
    * Any other retype and repositioning stay rejected — rewrite territory. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident).getAbsolutePath
    val m = TileFormat.readManifest(dir).getOrElse(throw new NoSuchTableException(ident))
    var fields = m.schema.fields.toVector
    var tiles = m.tiles
    var partitionBy = m.partitionBy
    var nextId = m.nextFieldId
    var props = m.properties
    changes.foreach {
      case set: TableChange.SetProperty =>
        require(!GraftTileCatalog.EngineProps(set.property()),
          s"graft-tiles: `${set.property()}` is an engine-reserved property")
        props = props + (set.property() -> set.value())
      case rm: TableChange.RemoveProperty =>
        props = props - rm.property()
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "graft-tiles: ADD COLUMN supports top-level columns only")
        require(add.isNullable,
          "graft-tiles: an added column must be nullable (existing tiles read it as null)")
        require(add.position() == null,
          "graft-tiles: ADD COLUMN ... FIRST/AFTER is not supported (chunk order is physical)")
        val name = add.fieldNames()(0)
        require(TileFormat.supported(add.dataType()),
          s"graft-tiles: unsupported column type ${add.dataType().sql} for `$name`")
        require(!TileFormat.ReservedColumns(name),
          s"graft-tiles: `$name` is a reserved metadata column name")
        require(!fields.exists(_.name == name),
          s"graft-tiles: column `$name` already exists")
        fields = fields :+ TileFormat.fieldWithId(
          org.apache.spark.sql.types.StructField(name, add.dataType(), nullable = true),
          nextId)
        nextId += 1
      case ren: TableChange.RenameColumn =>
        require(ren.fieldNames().length == 1,
          "graft-tiles: RENAME COLUMN supports top-level columns only")
        val from = ren.fieldNames()(0)
        val to = ren.newName()
        val idx = fields.indexWhere(_.name == from)
        require(idx >= 0, s"graft-tiles: no column `$from` to rename")
        require(!fields.exists(_.name == to),
          s"graft-tiles: rename target `$to` already exists")
        require(!TileFormat.ReservedColumns(to),
          s"graft-tiles: `$to` is a reserved metadata column name")
        fields = fields.updated(idx, fields(idx).copy(name = to))
        // re-key the name-indexed metadata with the schema, atomically
        tiles = tiles.map { t =>
          t.copy(
            stats = t.stats.map { case (k, v) => (if (k == from) to else k) -> v },
            bloomCols = t.bloomCols.map(c => if (c == from) to else c))
        }
        if (partitionBy.contains(from)) partitionBy = Some(to)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "graft-tiles: DROP COLUMN supports top-level columns only")
        val name = del.fieldNames()(0)
        val idx = fields.indexWhere(_.name == name)
        if (idx < 0) {
          if (!del.ifExists())
            throw new IllegalArgumentException(s"graft-tiles: no column `$name` to drop")
        } else {
          require(fields.length > 1, "graft-tiles: cannot drop the only column")
          require(!partitionBy.contains(name),
            s"graft-tiles: `$name` is the partition column — repartition (rewrite) first")
          require(tiles.forall(t => t.rows == 0 || t.colIds.nonEmpty),
            "graft-tiles: DROP COLUMN requires field-id-stamped tiles " +
              "(legacy positional tiles present — run compaction first)")
          fields = fields.patch(idx, Nil, 1)
          // drop the name-keyed metadata: a stale entry under this name
          // would wrongly prune a later re-added column
          tiles = tiles.map(t => t.copy(stats = t.stats - name,
            bloomCols = t.bloomCols.filterNot(_ == name)))
        }
      case upd: TableChange.UpdateColumnType =>
        // '''WIDEN''' (r14): INT → BIGINT, the Iceberg type promotion —
        // metadata-only because every stamped tile records its chunks'
        // physical tags ([[TileFormat.TileMeta.colTags]]): the manifest
        // type widens, old chunks decode with their own codec and upcast
        // on read. Zone maps and bloom sidecars survive unchanged (both
        // live in the shared ordered/internal domain). Narrowing and any
        // other retype stay rejected — those need a rewrite.
        require(upd.fieldNames().length == 1,
          "graft-tiles: ALTER COLUMN TYPE supports top-level columns only")
        val name = upd.fieldNames()(0)
        val idx = fields.indexWhere(_.name == name)
        require(idx >= 0, s"graft-tiles: no column `$name` to retype")
        val from = fields(idx).dataType
        val to = upd.newDataType()
        require(from == org.apache.spark.sql.types.IntegerType &&
          to == org.apache.spark.sql.types.LongType,
          s"graft-tiles: only the INT -> BIGINT widening is metadata-only; " +
            s"${from.sql} -> ${to.sql} is rewrite territory")
        require(tiles.forall(t => t.rows == 0 ||
          (t.colIds.nonEmpty && t.colTags.nonEmpty)),
          "graft-tiles: ALTER COLUMN TYPE requires type-stamped tiles " +
            "(legacy tiles present — run compaction first)")
        fields = fields.updated(idx, fields(idx).copy(dataType = to))
      case other =>
        throw new UnsupportedOperationException(
          s"graft-tiles: unsupported ALTER TABLE change $other (ADD/RENAME/DROP " +
            "COLUMN and the INT -> BIGINT widening only; other retypes and " +
            "repositions are rewrite territory)")
    }
    val evolved = org.apache.spark.sql.types.StructType(fields)
    // metadata-only publish: tile files, watermark, and generation are
    // unchanged (no tile positions moved, so streaming offsets stay valid)
    TileFormat.writeManifest(dir, evolved, tiles, m.lastEpoch, m.queryId, m.generation,
      expect = TileFormat.ExpectCommitSeq(m.commitSeq), partitionBy = partitionBy,
      nextFieldId = nextId, tableProps = Some(props))
    new GraftTileTable(dir, TileFormat.readManifest(dir).get.schema)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete()
    }
    rm(dirFor(ident))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val target = dirFor(newIdent)
    target.getParentFile.mkdirs()
    require(dirFor(oldIdent).renameTo(target),
      s"graft-tiles: rename $oldIdent -> $newIdent failed")
  }
}

object GraftTileCatalog {
  /** Keys Spark's DDL machinery injects that are NOT user table config —
    * never persisted as TBLPROPERTIES and rejected by an explicit SET. */
  val EngineProps: Set[String] =
    Set("provider", "location", "owner", "external")
}
