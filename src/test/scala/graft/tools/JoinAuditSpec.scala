package graft.tools

import graft.SparkSpec

/** Pins the audit's subquery coverage: a FORCED vocab-keyed broadcast
  * hiding inside a scalar subquery must flag exactly like one in the
  * main plan (plain `collect` does not descend into subquery
  * expressions — the blind spot the round-8 verdict called out). */
class JoinAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(sql: String): Seq[String] = {
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("token", "n")
      .createOrReplaceTempView("ja_tokens")
    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("ja_big")
    JoinAudit.forcedVocabBroadcasts(
      spark.sql(sql).queryExecution.optimizedPlan)
  }

  test("planted vocab broadcast inside a scalar subquery flags") {
    val flags = audit(
      """SELECT id, (
        |  SELECT /*+ BROADCAST(v) */ max(v.cnt)
        |  FROM ja_big b
        |  JOIN (SELECT token, count(*) AS cnt FROM ja_tokens
        |        GROUP BY token) v
        |    ON b.id = v.cnt
        |) AS m
        |FROM ja_big""".stripMargin)
    assert(flags.exists(_.contains("VocabBroadcast")),
      s"scalar-subquery vocab broadcast slipped past the audit: $flags")
  }

  test("the same subquery join without a hint does not flag") {
    val flags = audit(
      """SELECT id, (
        |  SELECT max(v.cnt)
        |  FROM ja_big b
        |  JOIN (SELECT token, count(*) AS cnt FROM ja_tokens
        |        GROUP BY token) v
        |    ON b.id = v.cnt
        |) AS m
        |FROM ja_big""".stripMargin)
    assert(flags.isEmpty, s"unhinted join flagged: $flags")
  }

  test("main-plan vocab broadcast still flags (no regression)") {
    val flags = audit(
      """SELECT /*+ BROADCAST(v) */ b.id, v.cnt
        |FROM ja_big b
        |JOIN (SELECT token, count(*) AS cnt FROM ja_tokens
        |      GROUP BY token) v
        |  ON b.id = v.cnt""".stripMargin)
    assert(flags.exists(_.contains("VocabBroadcast")), s"got: $flags")
  }
}
