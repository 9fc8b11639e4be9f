package graft.expr

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.FileEntry

class BoolExprSpec extends SparkSpec {
  import BoolExpr._

  test("parser precedence: ! binds tighter than && binds tighter than ||") {
    val ast = parse("a=1 || b=2 && ! c=3").get
    assert(ast == Or(Operand("a", "1"), And(Operand("b", "2"), Not(Operand("c", "3")))))
  }

  test("parens override precedence") {
    val ast = parse("( a=1 || b=2 ) && c=3").get
    assert(ast == And(Or(Operand("a", "1"), Operand("b", "2")), Operand("c", "3")))
  }

  test("glued structural tokens tokenize") {
    val ast = parse("!(a=1||b=2)&&c=3").get
    assert(ast == And(Not(Or(Operand("a", "1"), Operand("b", "2"))), Operand("c", "3")))
  }

  test("empty expression compiles to the configured constant") {
    assert(parse("   ").isEmpty)
  }

  test("unbalanced parens throw") {
    assertThrows[ParseException](parse("( a=1"))
  }

  test("glob translation") {
    assert(globToRegex("*.txt") == "^[^/]*\\.txt$")
    assert("report-7.txt".matches(globToRegex("report-?.txt")))
    assert(!"report-77.txt".matches(globToRegex("report-?.txt")))
    assert("f3".matches(globToRegex("f[0-9]")))
    assert(!"fx".matches(globToRegex("f[0-9]")))
    assert(!"a/b.txt".matches(globToRegex("*.txt"))) // * does not cross /
  }

  // --- end-to-end against a small FileEntry frame ---

  private def fe(path: String, isDir: Boolean, size: Long, uid: Long, gid: Long,
      mode: Int = Integer.parseInt("644", 8), nEntries: Long = 0,
      modMs: Long = 1700000000000L): FileEntry = {
    val name = path.split("/").last
    val parent = path.split("/").dropRight(1).mkString("/")
    FileEntry(path, parent, name, path.count(_ == '/'), isDir, size,
      (size + 511) / 512, mode, new Timestamp(modMs), uid, gid, 1, size + 1000, 1, nEntries)
  }

  private lazy val fixture = {
    val s = spark
    import s.implicits._
    Seq(
      fe("/r", isDir = true, 100, 100, 2, nEntries = 3),
      fe("/r/a.txt", isDir = false, 10, 100, 2),
      fe("/r/b.log", isDir = false, 20, 101, 2),
      fe("/r/sub", isDir = true, 50, 100, 3, nEntries = 12,
        modMs = 1800000000000L)).toDF()
  }

  private val ops = FileOperands(
    userByName = Map("alice" -> 100L, "bob" -> 101L),
    groupByName = Map("staff" -> 2L))

  private def pathsFor(expr: String): Seq[String] =
    fixture.where(ops.compile(expr)).select("path").collect().map(_.getString(0)).sorted.toSeq

  test("name glob matches basename") {
    assert(pathsFor("name=*.txt") == Seq("/r/a.txt"))
  }

  test("user by name and uid are equivalent") {
    assert(pathsFor("user=alice") == pathsFor("user=100"))
    assert(pathsFor("user=alice") == Seq("/r", "/r/a.txt", "/r/sub"))
  }

  test("compound expression with type and group") {
    assert(pathsFor("type=f && group=staff") == Seq("/r/a.txt", "/r/b.log"))
    assert(pathsFor("type=f && ( user=bob || name=a.txt )") == Seq("/r/a.txt", "/r/b.log"))
  }

  test("negation") {
    assert(pathsFor("! user=alice") == Seq("/r/b.log"))
  }

  test("dir-larger consults n_entries") {
    assert(pathsFor("dir-larger=5") == Seq("/r/sub"))
    assert(pathsFor("dir-smaller=5") == Seq("/r"))
  }

  test("newer compares mod_time") {
    assert(pathsFor("newer=2024-01-01") == Seq("/r/sub"))
  }

  test("unknown operand throws") {
    assertThrows[ParseException](ops.compile("frobnicate=1"))
  }

  test("hardlink operand matches a real file's (device, inode)") {
    // port of the reference ops_test.go hardlink case: stat the target
    // on the driver, compare per row (hardlinks_op.go:38-48)
    val f = java.nio.file.Files.createTempFile("graft-hl", ".dat")
    java.nio.file.Files.write(f, "x".getBytes)
    val attrs = java.nio.file.Files
      .readAttributes(f, "unix:dev,ino").asInstanceOf[java.util.Map[String, Any]]
    val dev = attrs.get("dev").asInstanceOf[Number].longValue
    val ino = attrs.get("ino").asInstanceOf[Number].longValue
    val withHl = FileOperands(hardlinkStat = p =>
      if (p == f.toString) Some((dev, ino)) else None)
    val s = spark
    import s.implicits._
    val rows = Seq(
      fe("/r/link1", isDir = false, 1, 100, 2).copy(device = dev, inode = ino),
      fe("/r/other", isDir = false, 1, 100, 2).copy(device = dev, inode = ino + 1)).toDF()
    val got = rows.where(withHl.compile(s"hardlink=${f.toString}"))
      .select("path").collect().map(_.getString(0))
    assert(got.toSeq == Seq("/r/link1"))
    // unknown target matches nothing
    assert(rows.where(withHl.compile("hardlink=/nope")).count() == 0)
  }
}
