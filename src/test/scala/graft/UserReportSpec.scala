package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dns.UserReport
import graft.sinks.Sinks

/** UserRpt.main parity: K2 middle data round-trips into the three daily
  * user reports, windows re-aggregated to daily grain first. */
class UserReportSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("middle data -> top-N domains, totals, tag sets") {
    val out = java.nio.file.Files.createTempDirectory("graft-user-mid").toString
    // two 5-min windows: user1 hits a.com in both (3+2), b.com once
    Sinks.middleData(Seq(("user1", "a.com", 3L), ("user1", "b.com", 4L),
      ("user2", "a.com", 1L)).toDF("userName", "domain", "cnt"), s"$out/w1", 1)
    Sinks.middleData(Seq(("user1", "a.com", 2L))
      .toDF("userName", "domain", "cnt"), s"$out/w2", 1)

    val tags = Seq(("a.com", "cdn|video"), ("b.com", "news|video"))
      .toDF("domain", "tags")
    val (topN, totals, tagSets) = UserReport.run(spark, s"$out/*", tags, topN = 2)

    // daily grain: user1 a.com=5 beats b.com=4 -> top-1 is a.com
    val u1top = topN.filter(col("userName") === "user1")
      .select(explode(col("domains")).as("d")).select("d.domain", "d.cnt")
      .as[(String, Long)].collect().toSeq
    assert(u1top == Seq(("a.com", 5L), ("b.com", 4L))) // rank-ordered

    val tot = totals.as[(String, Long)].collect().toMap
    assert(tot == Map("user1" -> 9L, "user2" -> 1L))

    val ts = tagSets.as[(String, Seq[String])].collect().toMap
    assert(ts("user1") == Seq("cdn", "news", "video")) // distinct, sorted
    assert(ts("user2") == Seq("cdn", "video"))
  }
}
