package graft.cli

import java.time.{Duration, Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** `--since DUR` / `--from TS` / `--to TS` handling for the `logs` and
  * `errors` commands (reference internal/util.go:20-43: Go
  * `time.ParseDuration` for --since, RFC3339-or-date for --from/--to;
  * --since and --from are mutually exclusive there — same rule here).
  *
  * The resolved range compiles to literal timestamp comparisons, so
  * Spark pushes them to the parquet scan of the log/error tables.
  */
object TimeFlags {

  /** Parse `90s` / `30m` / `24h` / `7d` (Go duration units the
    * reference accepts, plus `d` for convenience). */
  def parseDuration(v: String): Duration = {
    val m = "^(\\d+)(s|m|h|d)$".r
    v match {
      case m(n, "s") => Duration.ofSeconds(n.toLong)
      case m(n, "m") => Duration.ofMinutes(n.toLong)
      case m(n, "h") => Duration.ofHours(n.toLong)
      case m(n, "d") => Duration.ofDays(n.toLong)
      case _ => throw new IllegalArgumentException(
        s"cannot parse duration '$v' (want e.g. 90s, 30m, 24h, 7d)")
    }
  }

  /** `yyyy-mm-dd` or RFC3339 instant. */
  def parseTime(v: String): Instant =
    scala.util.Try(LocalDate.parse(v).atStartOfDay(ZoneOffset.UTC).toInstant)
      .orElse(scala.util.Try(Instant.parse(v)))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot parse time '$v' (want yyyy-mm-dd or RFC3339)"))

  /** Compile the three flags into a predicate on timestamp column
    * `tsCol`; None means match-all. `now` is injectable for tests. */
  def predicate(tsCol: String, since: Option[String], from: Option[String],
      to: Option[String], now: () => Instant = () => Instant.now()): Option[Column] = {
    require(since.isEmpty || from.isEmpty, "--since and --from are exclusive")
    val lower = since.map(d => now().minus(parseDuration(d)))
      .orElse(from.map(parseTime))
    val upper = to.map(parseTime)
    val conds =
      lower.map(i => col(tsCol) >= lit(java.sql.Timestamp.from(i))).toSeq ++
        upper.map(i => col(tsCol) <= lit(java.sql.Timestamp.from(i))).toSeq
    conds.reduceOption(_ && _)
  }
}
