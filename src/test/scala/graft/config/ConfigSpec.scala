package graft.config

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Calculator

class ConfigSpec extends AnyFunSuite {

  private val yaml =
    """- prefix: /data
      |  database: /var/graft/data
      |  parallelism: 16
      |- prefix: /data/projects
      |  database: /var/graft/projects
      |  seed_depth: 3
      |  exclusions: ["\\.git/", "\\.snapshot/"]
      |  calculator: "block:4096"
      |  count_hardlink_as_files: true
      |""".stripMargin

  test("parses entries with defaults") {
    val cfgs = Config.parse(yaml)
    assert(cfgs.length == 2)
    assert(cfgs.head == PrefixConfig("/data", "/var/graft/data", parallelism = 16))
    val p = cfgs(1)
    assert(p.seedDepth == 3)
    assert(p.exclusions == Seq("\\.git/", "\\.snapshot/"))
    assert(p.calc == Calculator.Block(4096))
    assert(p.countHardlinkAsFiles)
  }

  test("longest-prefix match is component-wise") {
    val cfgs = Config.parse(yaml)
    assert(Config.forPath(cfgs, "/data/projects/x/y").get.prefix == "/data/projects")
    assert(Config.forPath(cfgs, "/data/other").get.prefix == "/data")
    assert(Config.forPath(cfgs, "/data").get.prefix == "/data")
    // /data/projectsX must NOT match /data/projects (config.go:54-65)
    assert(Config.forPath(cfgs, "/data/projectsX").get.prefix == "/data")
    assert(Config.forPath(cfgs, "/elsewhere").isEmpty)
  }

  test("malformed config throws") {
    assertThrows[IllegalArgumentException](Config.parse("just a string"))
    assertThrows[IllegalArgumentException](Config.parse("- database: /x"))
  }

  test("separator parses, empty falls back to '/' (config.go:22,111-112)") {
    assert(Config.parse(yaml).head.separator == "/")
    val withSep = Config.parse(
      """- prefix: /v
        |  database: /var/v
        |  separator: ":"
        |- prefix: /w
        |  database: /var/w
        |  separator: ""
        |""".stripMargin)
    assert(withSep.head.separator == ":")
    assert(withSep(1).separator == "/")
  }

  test("relative prefixes resolve against cwd (reference TestPrefixLookupRelative)") {
    val cwd = "/work/dir"
    // "", ".", "./" and bare local names all land on / under cwd
    assert(Config.resolvePrefix("", cwd) == "/work/dir")
    assert(Config.resolvePrefix(".", cwd) == "/work/dir")
    assert(Config.resolvePrefix("./", cwd) == "/work/dir")
    assert(Config.resolvePrefix("config", cwd) == "/work/dir/config")
    assert(Config.resolvePrefix("./a/b", cwd) == "/work/dir/a/b")
    // absolute and parent-escaping (Go !IsLocal) pass through
    assert(Config.resolvePrefix("/abs/p", cwd) == "/abs/p")
    assert(Config.resolvePrefix("../x", cwd) == "../x")
    // end-to-end: a config whose prefix IS the cwd matches "."
    val cfgs = Config.parse(s"- prefix: $cwd\n  database: /db\n")
    val (resolved, hit) = {
      val r = Config.resolvePrefix(".", cwd)
      (r, Config.forPath(cfgs, r))
    }
    assert(resolved == cwd)
    assert(hit.map(_.database).contains("/db"))
  }
}
