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
    // CREATE is the publish of an empty manifest — the same atomic object
    // a write commit replaces, so readers never see a schemaless table
    TileFormat.writeManifest(d.getAbsolutePath, schema, Seq.empty,
      expect = TileFormat.ExpectAbsent, partitionBy = partitionBy)
    new GraftTileTable(d.getAbsolutePath, schema)
  }

  /** Schema evolution (r12): ADD COLUMN only — the one evolution the
    * immutable-tile layout supports without rewrites. The manifest schema
    * gains the column; existing tiles have fewer chunks and read the new
    * column as null ([[TileFormat.TileCursor]]'s add-column contract);
    * compaction upgrades old tiles to the full schema. Everything else
    * (drop/rename/retype/reposition) would change chunk POSITIONS and is
    * rejected — that is rewrite territory. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident).getAbsolutePath
    val m = TileFormat.readManifest(dir).getOrElse(throw new NoSuchTableException(ident))
    val newFields = changes.map {
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
        require(!m.schema.fieldNames.contains(name),
          s"graft-tiles: column `$name` already exists")
        org.apache.spark.sql.types.StructField(name, add.dataType(), nullable = true)
      case other =>
        throw new UnsupportedOperationException(
          s"graft-tiles: unsupported ALTER TABLE change $other (only ADD COLUMN; " +
            "drop/rename/retype would move physical chunk positions)")
    }
    val evolved = org.apache.spark.sql.types.StructType(m.schema.fields ++ newFields)
    // metadata-only publish: tiles, watermark, and generation unchanged
    // (tile positions did not move, so streaming offsets stay valid)
    TileFormat.writeManifest(dir, evolved, m.tiles, m.lastEpoch, m.queryId, m.generation,
      expect = TileFormat.ExpectCommitSeq(m.commitSeq), partitionBy = m.partitionBy)
    new GraftTileTable(dir, evolved)
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
