package graft.ids

/** uid/gid ↔ name resolution (reference
  * internal/usernames/usergroups.go:26-60, consumed by stats.go:213-218
  * and reports.go:164-172): parsed once on the driver from
  * `/etc/passwd` / `/etc/group` (the reference shells out to
  * `user.LookupId`; reading the files directly avoids per-id lookups
  * and works in containers without NSS).
  *
  * At query time the maps are constants: `user=alice` folds to
  * `uid = 1000` — a literal predicate that pushes down to the parquet
  * scan — and report rendering resolves names via a constant
  * `element_at(map, id)` expression, never a shuffle.
  */
final case class IdMaps(
    userById: Map[Long, String],
    groupById: Map[Long, String]) {

  lazy val userByName: Map[String, Long] =
    userById.toSeq.map(_.swap).reverse.toMap // first id wins for dup names
  lazy val groupByName: Map[String, Long] =
    groupById.toSeq.map(_.swap).reverse.toMap

  def userName(id: Long): String = userById.getOrElse(id, id.toString)
  def groupName(id: Long): String = groupById.getOrElse(id, id.toString)

  /** Resolve a CLI `--user`/`--group` value: numeric id or name. */
  def resolveUser(v: String): Option[Long] =
    v.toLongOption.orElse(userByName.get(v))
  def resolveGroup(v: String): Option[Long] =
    v.toLongOption.orElse(groupByName.get(v))
}

object IdMaps {

  val empty: IdMaps = IdMaps(Map.empty, Map.empty)

  /** Parse `name:x:id:...` lines (passwd(5) / group(5) share the
    * layout for the first three fields). First entry per id wins,
    * matching libc lookup order. */
  def parseColonFile(lines: Iterator[String]): Map[Long, String] =
    lines.foldLeft(Map.empty[Long, String]) { (m, l) =>
      val f = l.split(":", -1)
      if (l.startsWith("#") || f.length < 3) m
      else f(2).toLongOption match {
        case Some(id) if !m.contains(id) => m + (id -> f(0))
        case _ => m
      }
    }

  /** Load from the OS databases; unreadable files degrade to empty
    * maps (ids then render numerically, reference usergroups.go:52). */
  def fromOS(passwd: String = "/etc/passwd",
      group: String = "/etc/group"): IdMaps = {
    def load(p: String): Map[Long, String] =
      try {
        val src = scala.io.Source.fromFile(p)
        try parseColonFile(src.getLines()) finally src.close()
      } catch { case _: Exception => Map.empty }
    IdMaps(load(passwd), load(group))
  }
}
