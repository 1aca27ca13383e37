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

  // ------------------------------------------------------- retry semantics

  /** Outcome of probing a remote source before fetching (the HEAD-check the
    * reference's DAG does before each monthly download,
    * `full_pipeline_dag.py:101-127`). */
  sealed trait ProbeStatus
  /** Resource exists and is fetchable. */
  case object Available extends ProbeStatus
  /** Permanent absence (HTTP 404 family): the month isn't published yet —
    * skip WITHOUT retrying; tomorrow's run will pick it up. */
  case object Missing extends ProbeStatus
  /** Transient failure (HTTP 5xx / timeout family): retry with backoff. */
  final case class Transient(detail: String) extends ProbeStatus

  sealed trait PolicyResult
  /** Probe said [[Missing]] — nothing fetched, nothing failed. */
  case object SkippedMissing extends PolicyResult
  /** Fetch (or idempotent skip) succeeded after `attempts` probes. */
  final case class Completed(attempts: Int, result: FetchResult) extends PolicyResult
  /** Probe stayed [[Transient]] through every allowed attempt. */
  final case class GaveUp(attempts: Int, lastDetail: String) extends PolicyResult

  /** Status-aware retrying fetch — the semantics of the reference's
    * download stage (`Ex01DataRetrieval.scala:63-77` retries;
    * `full_pipeline_dag.py:101-127` head-probe then skip-or-fetch),
    * decoupled from any transport: `probe` answers "is the source there?"
    * and `fetch` performs the transfer, so the policy is unit-testable in
    * a no-egress container and reusable over HTTP, object stores, or mock
    * transports. 404-family → skip immediately (a missing month is data
    * lateness, not an error); 5xx-family → bounded retries with
    * exponential backoff (`backoffMs * 2^(attempt-1)`), then a loud
    * [[GaveUp]] the orchestrator can alert on. `sleep` is injectable so
    * tests assert the backoff schedule instead of waiting it out. */
  def fetchWithPolicy(probe: () => ProbeStatus, fetch: () => FetchResult,
                      maxAttempts: Int = 3, backoffMs: Long = 1000L,
                      sleep: Long => Unit = Thread.sleep): PolicyResult = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    var lastDetail = ""
    while (attempt < maxAttempts) {
      attempt += 1
      probe() match {
        case Available => return Completed(attempt, fetch())
        case Missing => return SkippedMissing
        case Transient(detail) =>
          lastDetail = detail
          if (attempt < maxAttempts) sleep(backoffMs << (attempt - 1))
      }
    }
    GaveUp(attempt, lastDetail)
  }
}
