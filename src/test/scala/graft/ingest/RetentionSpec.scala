package graft.ingest

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {

  private def mk(names: String*): String = {
    val base = Files.createTempDirectory("retention").toString
    names.foreach { n =>
      val d = Paths.get(base, n)
      Files.createDirectories(d)
      Files.writeString(d.resolve("payload.txt"), n)
    }
    base
  }

  test("candidates: timestamped dirs only, newest first") {
    val base = mk("20260101T000000.000", "20260301T120000.500",
      "20260201T060000.250")
    Files.createDirectories(Paths.get(base, "not-a-timestamp"))
    Files.writeString(Paths.get(base, "LATEST"), "x")
    assert(Retention.candidates(base) == Seq(
      "20260301T120000.500", "20260201T060000.250", "20260101T000000.000"))
  }

  test("prune keeps newest N and never deletes the protected name") {
    val base = mk("20260101T000000.000", "20260201T000000.000",
      "20260301T000000.000", "20260401T000000.000")
    val gone = Retention.prune(base, keep = 2,
      protect = Some("20260101T000000.000"))
    assert(gone == Seq("20260201T000000.000"))
    assert(Retention.candidates(base) == Seq("20260401T000000.000",
      "20260301T000000.000", "20260101T000000.000"))
    // Recursive delete actually removed the payload.
    assert(!Files.exists(Paths.get(base, "20260201T000000.000")))
  }

  test("snapshot prune protects the LATEST target") {
    val base = Files.createTempDirectory("snapprune").toString
    // Three fake snapshots; LATEST points at the OLDEST (e.g. a
    // pinned-by-hand pointer) — prune must not break the pointer.
    Seq("20260101T000000.000", "20260201T000000.000", "20260301T000000.000")
      .foreach(n => Files.createDirectories(Paths.get(base, "snapshots", n)))
    Files.writeString(Paths.get(base, "LATEST"), "20260101T000000.000")
    val gone = Snapshot.prune(base, keep = 1)
    assert(gone == Seq("20260201T000000.000"))
    assert(Snapshot.candidates(base).contains("20260101T000000.000"))
  }
}
