package graft.ml

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.YearMonth

/** File-based model registry + sliding-window arithmetic: the Spark-free
  * state machine of the reference's `src/model_registry.py`.
  *
  *  - Promotion contract (model_registry.py:222-321): a candidate replaces
  *    the current model iff at least 2 of 3 metrics improve
  *    (RMSE down, MAE down, R² up). History is capped at 10 entries.
  *  - Sliding window (model_registry.py:386-418): train on months M-3..M-1,
  *    test on M, with year-boundary wrap.
  */
object ModelRegistry {

  final case class Metrics(rmse: Double, mae: Double, r2: Double)

  /** True iff >= 2 of 3 metrics improve over `current`. */
  def shouldPromote(candidate: Metrics, current: Metrics): Boolean = {
    val wins = Seq(
      candidate.rmse < current.rmse,
      candidate.mae < current.mae,
      candidate.r2 > current.r2,
    ).count(identity)
    wins >= 2
  }

  /** Sliding window: (trainMonths M-3..M-1, testMonth M), "yyyy-MM" keys. */
  def slidingWindow(testMonth: String, trainSpan: Int = 3): (Seq[String], String) = {
    val m = YearMonth.parse(testMonth)
    val train = (trainSpan to 1 by -1).map(k => m.minusMonths(k).toString)
    (train, m.toString)
  }

  /** Inclusive month range iteration (month_range.py semantics). */
  def monthRange(start: String, end: String): Seq[String] = {
    val (s, e) = (YearMonth.parse(start), YearMonth.parse(end))
    require(!e.isBefore(s), s"invalid month range $start..$end")
    Iterator.iterate(s)(_.plusMonths(1)).takeWhile(!_.isAfter(e)).map(_.toString).toSeq
  }

  /** Registry state on disk: `<root>/current/` is the live model dir,
    * `<root>/history.log` the promotion history (capped). */
  final class Registry(root: String, historyCap: Int = 10) {
    private val rootPath = Paths.get(root)
    private val currentDir = rootPath.resolve("current")
    private val historyFile = rootPath.resolve("history.log")
    Files.createDirectories(rootPath)

    def currentMetrics: Option[Metrics] = {
      val f = rootPath.resolve("current_metrics.csv")
      if (!Files.exists(f)) None
      else {
        val Array(r, m, r2) = Files.readString(f).trim.split(",").map(_.toDouble)
        Some(Metrics(r, m, r2))
      }
    }

    private def writeMetrics(m: Metrics): Unit =
      Files.writeString(rootPath.resolve("current_metrics.csv"),
        s"${m.rmse},${m.mae},${m.r2}")

    /** Promote-or-discard a candidate model dir. Returns true if promoted. */
    def register(candidateDir: String, m: Metrics, tag: String): Boolean = {
      val promote = currentMetrics.forall(shouldPromote(m, _))
      if (promote) {
        if (Files.exists(currentDir)) deleteRecursively(currentDir)
        Files.move(Paths.get(candidateDir), currentDir, StandardCopyOption.REPLACE_EXISTING)
        writeMetrics(m)
        appendHistory(s"$tag,${m.rmse},${m.mae},${m.r2}")
      }
      promote
    }

    private def appendHistory(line: String): Unit = {
      val prev = if (Files.exists(historyFile))
        Files.readString(historyFile).linesIterator.toSeq else Seq.empty
      val next = (prev :+ line).takeRight(historyCap)
      Files.writeString(historyFile, next.mkString("\n"))
    }

    def history: Seq[String] =
      if (Files.exists(historyFile))
        Files.readString(historyFile).linesIterator.toSeq else Seq.empty

    private def deleteRecursively(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(deleteRecursively)
      Files.deleteIfExists(p)
    }
  }
}
