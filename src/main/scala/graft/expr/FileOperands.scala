package graft.expr

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's operand set (expression.go:25-48 + vendored
  * cloudeng.io/file/matcher) mapped onto the flat FileEntry schema
  * (SURVEY.md §1.6):
  *
  * {{{
  * path, parent, name, depth, is_dir, size, blocks, mode, mod_time,
  * uid, gid, device, inode, n_entries
  * }}}
  *
  * Name/uid resolution (reference usernames/usergroups.go:26-60) is
  * injected as driver-side maps — at query time they are constants,
  * so every operand folds into a pushdown-able predicate.
  */
final case class FileOperands(
    userByName: Map[String, Long] = Map.empty,
    groupByName: Map[String, Long] = Map.empty,
    /** `hardlink=path` target resolver: path → (device, inode);
      * reference hardlinks_op.go:38-48 stats the target on the driver. */
    hardlinkStat: String => Option[(Long, Long)] = _ => None) {

  import BoolExpr.globToRegex

  // POSIX mode bits (fs.FileMode semantics on the wire, uint32).
  private val S_IFMT = 0xf000
  private val S_IFLNK = 0xa000
  private val S_IXANY = Integer.parseInt("111", 8)

  private def resolveId(value: String, byName: Map[String, Long]): Long =
    value.toLongOption.orElse(byName.get(value)).getOrElse(
      throw BoolExpr.ParseException(s"unknown user/group '$value'"))

  private def parseTime(value: String): Instant = {
    val asDate = scala.util.Try(
      LocalDate.parse(value).atStartOfDay(ZoneOffset.UTC).toInstant)
    asDate.orElse(scala.util.Try(Instant.parse(value)))
      .getOrElse(throw BoolExpr.ParseException(s"cannot parse time '$value'"))
  }

  /** Operand factory registry; `name` matches basename AND full path
    * (reference expression.go:31-39). */
  def apply(name: String): String => Column = name match {
    case "name" => g =>
      col("name").rlike(globToRegex(g)) || col("path").rlike(globToRegex(g))
    case "iname" => g =>
      lower(col("name")).rlike(globToRegex(g.toLowerCase)) ||
        lower(col("path")).rlike(globToRegex(g.toLowerCase))
    case "re" => re => col("path").rlike(re)
    case "type" => {
      case "f" => !col("is_dir") && (col("mode").bitwiseAND(S_IFMT) =!= S_IFLNK)
      case "d" => col("is_dir")
      case "l" => col("mode").bitwiseAND(S_IFMT) === S_IFLNK
      case "x" => col("mode").bitwiseAND(S_IXANY) =!= 0
      case other => throw BoolExpr.ParseException(s"unknown type '$other'")
    }
    case "newer" => v =>
      col("mod_time") > lit(java.sql.Timestamp.from(parseTime(v)))
    case "larger" => v => col("size") >= v.toLong
    case "smaller" => v => col("size") <= v.toLong
    case "dir-larger" => v => col("is_dir") && col("n_entries") > v.toLong
    case "dir-smaller" => v => col("is_dir") && col("n_entries") < v.toLong
    case "user" => v => col("uid") === resolveId(v, userByName)
    case "group" => v => col("gid") === resolveId(v, groupByName)
    case "hardlink" => p =>
      hardlinkStat(p) match {
        case Some((dev, ino)) => col("device") === dev && col("inode") === ino
        case None => lit(false)
      }
    case other => throw BoolExpr.ParseException(s"unknown operand '$other'")
  }

  /** Parse + compile an expression string against the FileEntry schema. */
  def compile(expr: String, emptyValue: Boolean = true): Column =
    BoolExpr.compile(expr, this.apply, emptyValue)
}
