package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dns.Dims
import graft.sources.Sources

/** Equivalence of the two J3 in-net implementations, and S2 legacy path
  * enumeration. */
class InNetAndPathsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ip(s: String): Long =
    s.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toInt)

  test("enrichInNetIndexed matches the broadcast-join variant") {
    val media = Seq((ip("10.0.0.0"), ip("10.255.255.255")))
      .toDF("min_long_ip", "max_long_ip")
    val biz = Seq((ip("115.238.0.0"), ip("115.238.255.255")))
      .toDF("min_long_ip", "max_long_ip")
    val facts = Seq(
      ("10.1.2.3", 7L), ("115.238.9.9", 3L), ("8.8.8.8", 5L), ("bogus", 1L))
      .toDF("aip", "resolver")
    def result(df: org.apache.spark.sql.DataFrame) =
      df.select("aip", "inNet").as[(String, Long)].collect().sortBy(_._1).toSeq
    val naive = result(Dims.enrichInNet(facts, media, biz))
    val indexed = result(Dims.enrichInNetIndexed(spark, facts, media, biz))
    assert(naive == indexed)
    assert(naive == Seq(("10.1.2.3", 7L), ("115.238.9.9", 3L),
      ("8.8.8.8", 0L), ("bogus", 0L)))
  }

  test("windowPaths enumerates HHmmss_epoch steps over the window") {
    val start = 1616631000L // 2021-03-25 00:10:00 UTC
    val paths = Sources.windowPaths("/logs", start, windowSec = 30, stepSec = 10)
    assert(paths == Seq(
      s"/logs/2021/03/25/001000_$start",
      s"/logs/2021/03/25/001010_${start + 10}",
      s"/logs/2021/03/25/001020_${start + 20}"))
  }
}
