package graft.config

import scala.jdk.CollectionConverters._

import graft.stats.Calculator

/** Per-prefix YAML configuration (reference internal/config/config.go:
  * 19-47): each entry binds a filesystem prefix to its snapshot
  * database location, scan parallelism, exclusions, and disk-usage
  * calculator. Lookup is longest-matching-prefix (config.go:54-65).
  *
  * Example:
  * {{{
  * - prefix: /data/projects
  *   database: /var/graft/projects
  *   parallelism: 64
  *   seed_depth: 3
  *   exclusions: ["\\.snapshot/", "\\.git/"]
  *   calculator: "block:4096"
  *   count_hardlink_as_files: false
  * }}}
  */
final case class PrefixConfig(
    prefix: String,
    database: String,
    parallelism: Int = 0,
    seedDepth: Int = 2,
    exclusions: Seq[String] = Nil,
    calculator: String = "identity",
    countHardlinkAsFiles: Boolean = false,
    separator: String = "/") {
  def calc: Calculator = Calculator.parse(calculator)
}

object Config {

  def parse(yaml: String): Seq[PrefixConfig] = {
    val loaded = new org.yaml.snakeyaml.Yaml().load[Any](yaml)
    val entries = loaded match {
      case l: java.util.List[_] => l.asScala.toSeq
      case null => Seq.empty
      case other =>
        throw new IllegalArgumentException(
          s"config must be a YAML list of prefix entries, got ${other.getClass}")
    }
    entries.map {
      case m: java.util.Map[_, _] =>
        val e = m.asScala.map { case (k, v) => k.toString -> v }.toMap
        def str(k: String): Option[String] = e.get(k).map(_.toString)
        PrefixConfig(
          prefix = str("prefix").getOrElse(
            throw new IllegalArgumentException("config entry missing 'prefix'")),
          database = str("database").getOrElse(
            throw new IllegalArgumentException("config entry missing 'database'")),
          parallelism = str("parallelism").map(_.toInt).getOrElse(0),
          seedDepth = str("seed_depth").map(_.toInt).getOrElse(2),
          exclusions = e.get("exclusions").map {
            case l: java.util.List[_] => l.asScala.map(_.toString).toSeq
            case other => Seq(other.toString)
          }.getOrElse(Nil),
          calculator = str("calculator").getOrElse("identity"),
          countHardlinkAsFiles =
            str("count_hardlink_as_files").exists(_.toBoolean),
          // filename separator for display joins on non-'/'
          // filesystems (reference config.go:22,111-112 — empty
          // defaults to the platform separator; ours defaults '/')
          separator = str("separator").filter(_.nonEmpty).getOrElse("/"))
      case other =>
        throw new IllegalArgumentException(s"config entry must be a map: $other")
    }
  }

  def load(path: String): Seq[PrefixConfig] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Longest-matching-prefix lookup (reference config.go:54-65):
    * a config for `/a/b` governs `/a/b/c` but `/a/bc` matches neither
    * `/a/b` nor vice versa — matches are path-component-wise. */
  def forPath(configs: Seq[PrefixConfig], path: String): Option[PrefixConfig] =
    configs
      .filter(c => path == c.prefix || path.startsWith(c.prefix.stripSuffix("/") + "/"))
      .sortBy(-_.prefix.length)
      .headOption

  /** Resolve a possibly-relative prefix against the working directory
    * before lookup (reference LookupPrefix, internal/util.go:45-56):
    * "", ".", "./x" and bare LOCAL names join onto cwd; absolute
    * paths and parent-escaping paths ("../x" — Go's !IsLocal) pass
    * through unchanged. */
  def resolvePrefix(prefix: String,
      cwd: String = System.getProperty("user.dir")): String = {
    if (prefix.isEmpty) return cwd
    val p = java.nio.file.Paths.get(prefix)
    if (p.isAbsolute) return prefix
    val norm = p.normalize()
    if (norm.toString == ".." || norm.startsWith("..")) prefix
    else java.nio.file.Paths.get(cwd).resolve(norm).normalize().toString
  }

  /** [[resolvePrefix]] + [[forPath]] — the reference's LookupPrefix. */
  def lookupPrefix(configs: Seq[PrefixConfig],
      prefix: String): (String, Option[PrefixConfig]) = {
    val resolved = resolvePrefix(prefix)
    (resolved, forPath(configs, resolved))
  }
}
