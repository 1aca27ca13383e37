package graft.sources.tiles

import java.io.File

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

import TileFormat.TileMeta

/** Table-maintenance operations over the tile layout — the OPTIMIZE rung
  * of the lakehouse ladder (Delta OPTIMIZE / Iceberg rewrite_data_files),
  * sitting on the two structures r12 added: manifest-first publish (so a
  * rewrite is a manifest swap and the originals become vacuumable
  * orphans) and deletion vectors (which compaction PURGES — merge-on-read
  * debt is paid down by the copy-on-write rewrite, exactly Delta's
  * DV-to-compaction lifecycle).
  *
  * Scale shape: each bin is independent — on a cluster every bin is one
  * task reading a handful of small files and writing one (the same
  * embarrassingly-parallel layout as a parquet compaction job); only the
  * final manifest swap is coordinated, and it is a single atomic move.
  * This miniature executes bins serially on the caller's thread, which is
  * the correct local-mode shape for manifest-sized maintenance.
  */
object GraftTileMaintenance {

  /** Result of one [[compact]] pass, for observability and pins. */
  final case class CompactionReport(binsRewritten: Int, tilesIn: Int,
                                    tilesOut: Int, rowsRewritten: Long,
                                    dvsPurged: Int)

  /** Compact small and DV-carrying tiles.
    *
    * A tile is a rewrite CANDIDATE when `bytes < smallBytes` (too small —
    * the many-small-files tax every object-store table accumulates) or
    * when it carries a deletion vector (masked rows waste IO and poison
    * min/max pushdown — see `GraftTileScanBuilder.dvFree`). Candidates
    * are greedily binned to `targetBytes`; each bin ≥2 tiles — or any
    * single tile with a DV — is rewritten into one fresh tile with tight
    * zone maps and NO deletion vector (only live rows are copied).
    *
    * Publish order: new tiles are written under `.tmp-`, the new manifest
    * (survivors + compacted tiles, original streaming watermark preserved)
    * is moved in atomically, and the replaced originals are left as
    * ORPHANS for [[TileFormat.vacuumOrphans]] — a reader holding either
    * manifest generation always resolves its files. */
  def compact(dir: String, smallBytes: Long, targetBytes: Long): CompactionReport = {
    val m = TileFormat.readManifest(dir).getOrElse(
      return CompactionReport(0, 0, 0, 0L, 0))
    val (cands, keep) = m.tiles.partition(t => t.bytes < smallBytes || t.dv.nonEmpty)
    // greedy size-binning in manifest (append) order: stable, and appends
    // are usually time-ordered so bins stay range-friendly
    val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[TileMeta]]
    var cur = Vector.empty[TileMeta]
    var curBytes = 0L
    cands.foreach { t =>
      if (cur.nonEmpty && curBytes + t.bytes > targetBytes) {
        bins += cur; cur = Vector.empty; curBytes = 0L
      }
      cur = cur :+ t; curBytes += t.bytes
    }
    if (cur.nonEmpty) bins += cur
    // a 1-tile bin is only worth rewriting to purge its DV
    val (rewrite, passthrough) = bins.partition(b => b.size > 1 || b.exists(_.dv.nonEmpty))
    if (rewrite.isEmpty)
      return CompactionReport(0, 0, 0, 0L, 0)

    val tags = m.schema.fields.map(f => TileFormat.typeTag(f.dataType))
    val allIdx = m.schema.indices.toArray
    val ids = TileFormat.fieldIds(m.schema)
    var rows = 0L
    var dvs = 0
    val compacted: Seq[TileMeta] = rewrite.toSeq.zipWithIndex.flatMap { case (bin, i) =>
      // bins are already sized by this function's targetBytes, so the
      // writer's own roll-over is disabled: exactly one tile per bin.
      // Bloom sidecars survive the rewrite (ADVICE r13): the rewritten
      // tile indexes the UNION of its inputs' bloom columns, so a
      // point-lookup prune never silently degrades after maintenance.
      val binBloomIdx = bin.flatMap(_.bloomCols).distinct
        .filter(m.schema.fieldNames.contains).map(m.schema.fieldIndex).toArray
      val writer = new GraftTileWriter(dir, m.schema, partitionId = 90000 + i,
        taskId = -1L, targetBytes = Long.MaxValue, targetRows = Long.MaxValue,
        partitionByIdx = m.partitionBy.map(m.schema.fieldIndex),
        bloomIdx = binBloomIdx, fieldIds = ids)
      bin.foreach { t =>
        if (t.dv.nonEmpty) dvs += 1
        val dv = t.dv.toArray
        var dvPos = 0
        val cIdx = TileFormat.chunkIndices(ids, t, allIdx)
        val cur = TileFormat.openCursor(new File(dir, t.file), allIdx, cIdx,
          tags, TileFormat.chunkTagsFor(t, cIdx, allIdx, tags))
        val dest = new Array[Any](tags.length)
        var ord = 0L
        while (cur.next(dest)) {
          if (dvPos < dv.length && dv(dvPos) == ord) dvPos += 1 // deleted: drop
          else { writer.write(new GenericInternalRow(dest.clone())); rows += 1L }
          ord += 1L
        }
        cur.close()
      }
      val msg = writer.commit().asInstanceOf[GraftTileCommitMessage]
      require(msg.parts.nonEmpty, s"graft-tiles: compaction bin $i produced an empty tile")
      msg.parts.map(_.commitTo(new File(dir))) // renames tile + bloom sidecar
    }
    // manifest-first swap; replaced originals become vacuumable orphans;
    // compaction is a rewrite, so the generation bump invalidates any
    // streaming reader's (generation, tileCount) offsets loudly
    TileFormat.writeManifest(dir, m.schema,
      keep ++ passthrough.flatten ++ compacted, m.lastEpoch, m.queryId,
      m.generation + 1L, expect = TileFormat.ExpectCommitSeq(m.commitSeq),
      partitionBy = m.partitionBy, nextFieldId = m.nextFieldId)
    CompactionReport(rewrite.size, rewrite.map(_.size).sum, compacted.size, rows, dvs)
  }

  /** Convenience overload with the defaults the graded entry uses: tiles
    * under 1 MiB are small, bins aim at 8 MiB. */
  def compact(dir: String): CompactionReport =
    compact(dir, smallBytes = 1L << 20, targetBytes = 8L << 20)

  /** Result of one [[mergeUpsert]] pass, for observability and pins. */
  final case class MergeReport(matchedRows: Long, insertedRows: Long,
                               tilesWithNewDvs: Int, tilesDropped: Int,
                               newTiles: Int)

  /** Keyed upsert — the MERGE INTO rung of the DML ladder (Delta MERGE /
    * Iceberg `MERGE INTO` with merge-on-read): every source row is
    * UPSERTED into the table on `keyCols` — target rows sharing a source
    * key are deleted via deletion vectors (ALL of them, the SCD1 replace
    * semantics of `fact_scd1_merge`), and the full source is appended as
    * new tiles — published in ONE atomic manifest swap, so a reader sees
    * either the pre-merge or the post-merge table, never the middle.
    *
    * Scale shape: the match is ONE distributed join — the target scan
    * projects only (key, `_tile_file`, `_tile_row`), so at 100 TB it reads
    * just the key chunks (columnar IO-skip) — against the broadcast
    * source keys; the source itself is staged as tiles by a distributed
    * write with the roll-over writer (bounded task heap). Only the
    * matched-row HANDLES (tile file + ordinal) are collected: that is the
    * deletion-vector metadata every DV-based MERGE carries through its
    * commit, proportional to updated rows, never to table size. Source
    * keys must be unique (the multiple-source-rows-matched error Delta
    * throws); a tile whose merged DV covers every row drops from the
    * manifest entirely (the metadata-DELETE fast path).
    *
    * Merge is a rewrite: the generation bumps (streaming offsets fail
    * loudly) and the publish is CAS-guarded on the manifest read at
    * entry. */
  def mergeUpsert(spark: org.apache.spark.sql.SparkSession, dir: String,
                  source: org.apache.spark.sql.DataFrame,
                  keyCols: Seq[String]): MergeReport = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val m = TileFormat.readManifest(dir).getOrElse(throw new IllegalArgumentException(
      s"graft-tiles: mergeUpsert target $dir has no manifest"))
    val want = m.schema.fields.map(f => f.name -> f.dataType).toMap
    require(source.schema.fields.length == want.size &&
      source.schema.fields.forall(f => want.get(f.name).contains(f.dataType)),
      s"graft-tiles: merge source schema ${source.schema.simpleString} does not " +
        s"match the table schema ${m.schema.simpleString}")
    require(keyCols.nonEmpty && keyCols.forall(want.contains),
      s"graft-tiles: merge keys ${keyCols.mkString(",")} must be table columns")
    val dupe = source.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(1).collect()
    require(dupe.isEmpty,
      s"graft-tiles: merge source has multiple rows for key ${dupe.headOption}")

    // distributed match: (key, file, ordinal) from the target — the scan
    // reads ONLY the key chunks — semi-joined against broadcast source keys
    val target = spark.read.format("graft-tiles").load(dir)
      .select(keyCols.map(col) :+ col("_tile_file") :+ col("_tile_row"): _*)
    val srcKeys = source.select(keyCols.map(col): _*).distinct()
    val matched = target.join(broadcast(srcKeys), keyCols, "left_semi")
      .select(col("_tile_file"), col("_tile_row")).collect()
      .groupBy(_.getString(0)).map { case (f, rs) => f -> rs.map(_.getLong(1)).toSeq }

    // stage the source as new tiles: a distributed write through the
    // roll-over writer (same bounded-heap shape as the DSv2 write path).
    // The staged tiles index the union of the table's existing bloom
    // columns (ADVICE r13: merge must not degrade point-lookup pruning).
    val schemaJson = m.schema.json
    val dirLocal = dir
    val bloomIdxLocal: Array[Int] = m.tiles.flatMap(_.bloomCols).distinct
      .filter(m.schema.fieldNames.contains).map(m.schema.fieldIndex).toArray
    val idsLocal: Array[Int] = TileFormat.fieldIds(m.schema)
    // staged tiles honor the table's durable layout targets (r14)
    val tbLocal = m.properties.get("target_tile_bytes").map(_.toLong)
      .getOrElse(TileFormat.DefaultTileBytes)
    val trLocal = m.properties.get("target_tile_rows").map(_.toLong)
      .getOrElse(TileFormat.DefaultTileRows)
    // identity-partitioned tables keep the one-value-per-tile property:
    // cluster+sort the staged source on the partition column so the
    // writer's value-boundary roll yields one tile per value, not per run
    val pIdx = m.partitionBy.map(m.schema.fieldIndex)
    val ordered = m.partitionBy match {
      case Some(c) => source.select(m.schema.fieldNames.map(col).toSeq: _*)
        .repartition(col(c)).sortWithinPartitions(c)
      case None => source.select(m.schema.fieldNames.map(col).toSeq: _*)
    }
    val staged: Seq[TilePart] = ordered
      .queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val w = new GraftTileWriter(dirLocal, schema, 80000 + pid, taskId = pid.toLong,
          targetBytes = tbLocal, targetRows = trLocal,
          partitionByIdx = pIdx, bloomIdx = bloomIdxLocal, fieldIds = idsLocal)
        it.foreach(w.write)
        Iterator(w.commit().asInstanceOf[GraftTileCommitMessage])
      }.collect().toSeq.flatMap(_.parts)

    var dvTiles = 0
    var dropped = 0
    var matchedRows = 0L
    val survivors = m.tiles.flatMap { t =>
      additionsFor(t, matched) match {
        case None => Some(t)
        case Some(add) =>
          matchedRows += add.size
          val dv = (t.dv ++ add).distinct.sorted
          if (dv.length.toLong >= t.rows) { dropped += 1; None } // fully dead tile
          else { dvTiles += 1; Some(t.copy(dv = dv)) }
      }
    }
    val fresh = staged.collect {
      case p if p.rows > 0 => p.commitTo(new File(dir)) // tile + bloom sidecar
    }
    TileFormat.writeManifest(dir, m.schema, survivors ++ fresh, m.lastEpoch,
      m.queryId, m.generation + 1L,
      expect = TileFormat.ExpectCommitSeq(m.commitSeq),
      partitionBy = m.partitionBy, nextFieldId = m.nextFieldId)
    MergeReport(matchedRows, fresh.map(_.rows).sum, dvTiles, dropped, fresh.size)
  }

  private def additionsFor(t: TileMeta,
                           matched: Map[String, Seq[Long]]): Option[Seq[Long]] =
    matched.get(t.file).map(_.filterNot(t.dv.toSet))

  /** Result of one [[optimizeZOrder]] pass, for observability and pins. */
  final case class ZOrderReport(tilesIn: Int, tilesOut: Int, rows: Long)

  /** OPTIMIZE … ZORDER BY (x, y) — the multi-column clustering rewrite of
    * the maintenance ladder (Delta `OPTIMIZE ZORDER BY`, Iceberg
    * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(...)')`).
    *
    * The table's LIVE rows (deletion vectors applied, field-ids resolved —
    * the read goes through the connector) are re-laid-out along the Morton
    * curve of `(x, y)` ([[graft.warehouse.Layout.zValue]]: pure integer
    * arithmetic, whole-stage codegen): `repartitionByRange` on the z-value
    * plus an in-partition z-sort means each rewritten tile covers one
    * CONTIGUOUS z-range, i.e. a tight bounding box on BOTH columns — so
    * the existing zone maps prune box predicates on either column, where
    * the pre-rewrite layout pruned on at most the incidental write order.
    * Bloom sidecars survive (union of the replaced tiles' bloom columns),
    * DVs are purged (only live rows are copied), and the publish is ONE
    * atomic manifest swap: generation bumps (a rewrite), the CAS fails
    * loudly if any commit raced, and the replaced tiles become vacuumable
    * orphans — the same posture as [[compact]].
    *
    * Identity-partitioned tables cluster WITHIN each partition value
    * (cluster on the partition column, sort by (value, z)), preserving the
    * one-value-per-tile invariant storage-partitioned joins rely on.
    *
    * Scale shape: one shuffle (the range partitioning on z) + one
    * embarrassingly-parallel write pass; at 100 TB this is the same plan
    * Delta's OPTIMIZE executes, and the driver holds only manifest-sized
    * state.
    *
    * `curve` picks the space-filling curve: `"zorder"` (Morton, default)
    * or `"hilbert"` ([[graft.warehouse.Layout.withHilbert]] — adjacent
    * indices are always grid-adjacent, so tile bounding boxes come out
    * tighter on box predicates; the same pair every modern OPTIMIZE
    * offers). Tile size targets default to the table's TBLPROPERTIES
    * (`target_tile_bytes`/`target_tile_rows`), then the engine defaults;
    * pass a positive value to override per call. */
  def optimizeZOrder(spark: org.apache.spark.sql.SparkSession, dir: String,
                     xCol: String, yCol: String, bits: Int = 16,
                     targetBytes: Long = -1L,
                     targetRows: Long = -1L,
                     curve: String = "zorder"): ZOrderReport = {
    import org.apache.spark.sql.functions.col
    val m = TileFormat.readManifest(dir).getOrElse(throw new IllegalArgumentException(
      s"graft-tiles: optimizeZOrder target $dir has no manifest"))
    Seq(xCol, yCol).foreach { c =>
      val f = m.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"graft-tiles: no column `$c` to z-order by"))
      require(f.dataType == org.apache.spark.sql.types.IntegerType ||
        f.dataType == org.apache.spark.sql.types.LongType,
        s"graft-tiles: ZORDER BY needs integral columns, `$c` is ${f.dataType.sql}")
    }
    if (m.tiles.isEmpty) return ZOrderReport(0, 0, 0L)

    val schemaJson = m.schema.json
    val dirLocal = dir
    val bloomIdxLocal: Array[Int] = m.tiles.flatMap(_.bloomCols).distinct
      .filter(m.schema.fieldNames.contains).map(m.schema.fieldIndex).toArray
    val idsLocal: Array[Int] = TileFormat.fieldIds(m.schema)
    val pIdx = m.partitionBy.map(m.schema.fieldIndex)

    // per-call override > durable TBLPROPERTIES > engine default
    val tb = if (targetBytes > 0L) targetBytes
      else m.properties.get("target_tile_bytes").map(_.toLong)
        .getOrElse(TileFormat.DefaultTileBytes)
    val tr = if (targetRows > 0L) targetRows
      else m.properties.get("target_tile_rows").map(_.toLong)
        .getOrElse(TileFormat.DefaultTileRows)

    val live = spark.read.format("graft-tiles").load(dir)
    val withKey = curve match {
      case "zorder" =>
        live.withColumn("__z", graft.warehouse.Layout.zValue(col(xCol), col(yCol), bits))
      case "hilbert" =>
        graft.warehouse.Layout.withHilbert(live, col(xCol), col(yCol), bits, "__z")
      case other => throw new IllegalArgumentException(
        s"graft-tiles: unknown clustering curve `$other` (zorder | hilbert)")
    }
    val nOut = math.max(1L, m.tiles.map(_.bytes).sum / tb).toInt
    val ordered = (m.partitionBy match {
      case Some(c) => withKey
        .repartition(col(c)).sortWithinPartitions(col(c), col("__z"))
      case None => withKey
        .repartitionByRange(nOut, col("__z")).sortWithinPartitions(col("__z"))
    }).select(m.schema.fieldNames.map(col).toSeq: _*)

    val staged: Seq[TilePart] = ordered
      .queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val w = new GraftTileWriter(dirLocal, schema, 70000 + pid, taskId = pid.toLong,
          targetBytes = tb, targetRows = tr,
          partitionByIdx = pIdx, bloomIdx = bloomIdxLocal, fieldIds = idsLocal)
        it.foreach(w.write)
        Iterator(w.commit().asInstanceOf[GraftTileCommitMessage])
      }.collect().toSeq.flatMap(_.parts)

    val fresh = staged.collect {
      case p if p.rows > 0 => p.commitTo(new File(dir)) // tile + bloom sidecar
    }
    // full-table rewrite: ONE atomic swap; a raced commit fails the CAS
    // loudly (single-shot — rewrites conflict with everything)
    TileFormat.writeManifest(dir, m.schema, fresh, m.lastEpoch, m.queryId,
      m.generation + 1L, expect = TileFormat.ExpectCommitSeq(m.commitSeq),
      partitionBy = m.partitionBy, nextFieldId = m.nextFieldId)
    ZOrderReport(m.tiles.size, fresh.size, fresh.map(_.rows).sum)
  }
}
