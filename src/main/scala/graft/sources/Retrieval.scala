package graft.sources

import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

/** S1 — idempotent raw-file retrieval, the driver-side util of the
  * reference's download stage (`Ex01DataRetrieval.scala:63-77`): fetch a
  * monthly file to the raw zone unless it is already there, so backfills
  * and re-runs are no-ops. Not a Spark operator (single small file per
  * month); supports any `java.net.URI` scheme the JVM can open — exercised
  * with `file://` sources in the suite (this container has no egress).
  */
object Retrieval {

  sealed trait FetchResult
  case object Skipped extends FetchResult
  final case class Fetched(bytes: Long) extends FetchResult

  /** Copy `source` to `dest` unless dest already exists (idempotent skip). */
  def fetchIfAbsent(source: URI, dest: String): FetchResult = {
    val target = Paths.get(dest)
    if (Files.exists(target)) Skipped
    else {
      Option(target.getParent).foreach(Files.createDirectories(_))
      val in = source.toURL.openStream()
      try {
        val tmp = Files.createTempFile(target.getParent, ".fetch-", ".part")
        try {
          Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
          // atomic publish: a concurrent reader never sees a half file
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        } finally Files.deleteIfExists(tmp)
        Fetched(Files.size(target))
      } finally in.close()
    }
  }

  /** Month-path layout of the raw zone (`Ex01DataRetrieval.scala:57-58`). */
  def monthPath(root: String, dataset: String, year: Int, month: Int): String =
    f"$root/$dataset/$year%04d/$month%02d/data.parquet"
}
