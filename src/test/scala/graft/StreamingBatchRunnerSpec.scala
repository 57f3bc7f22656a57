package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dns.BatchRunner
import graft.streaming.StreamRunner

/** End-to-end streaming production path: file-source raw JSON lines →
  * foreachBatch → BatchRunner.run (the per-window batch code path, reused
  * verbatim) → sink tables. */
class StreamingBatchRunnerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val windowStart = 1616631000000L

  private def ip(s: String): Long =
    s.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toInt)

  test("raw log stream drives the full report pipeline via foreachBatch") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-sbr-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sbr-ck").toString
    val lines = Seq(
      s"""{"Domain":"www.taobao.com","Timestamp":${windowStart + 123},"ServerIP":"218.108.248.200","ClientIP":"100.104.103.190","QR":true,"Type":"A","ResponseCode":0,"Answers":[{"Type":"A","Value":"115.238.23.2"}]}""",
      s"""{"Domain":"nx.example.org","Timestamp":${windowStart + 456},"ServerIP":"218.108.248.201","ClientIP":"30.250.11.7","QR":true,"Type":"A","ResponseCode":3,"Answers":[]}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(inDir, "w1.log"),
      lines.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    val dims = BatchRunner.DimTables(
      clientRules = Seq((ip("30.250.11.0"), ip("30.250.11.255"), 1))
        .toDF("min_long_ip", "max_long_ip", "client_type_id"),
      businessRules = Seq((ip("115.238.0.0"), ip("115.238.255.255"),
        "cdn", "cache", "prod"))
        .toDF("min_long_ip", "max_long_ip",
          "resource_name", "resource_type", "resource_props"),
      mediaRules = Seq((ip("10.0.0.0"), ip("10.255.255.255")))
        .toDF("min_long_ip", "max_long_ip"),
      authDomains = Seq(("taobao.com", "淘宝", "电商", "淘宝网", "电商", "web"))
        .toDF("authorityDomain", "companyName", "companyType",
          "websiteName", "websiteType", "soft"),
      whitelist = Seq("www.taobao.com").toDF("domain"),
      users = Seq(("30.250.11.7", "user7")).toDF("clientIp", "userName"),
      userInfo = Seq(("user7", "addr7", "137")).toDF("userName", "address", "phone"),
      geoDim = Seq((ip("115.238.0.0"), ip("115.238.255.255"),
        "中国", "浙江", "杭州", "中国电信"))
        .toDF("min_long_ip", "max_long_ip", "country", "province", "city",
          "operator"))

    val results = scala.collection.mutable.Map[String, Long]()
    val q = StreamRunner.reportEvery(
        StreamRunner.rawStream(spark, inDir), "0 seconds", ckpt) { (batch, _) =>
      val rs = BatchRunner.run(spark, batch, dims, windowStart, trendThreshold = 0L)
      try results.synchronized {
        rs.all.foreach { case (name, df) =>
          results(name) = results.getOrElse(name, 0L) + df.count()
        }
      } finally rs.unpersist()
    }.start()
    try q.processAllAvailable() finally q.stop()

    assert(results("clear") > 0)         // QPS rows (all + per-client)
    assert(results("trend") == 2L)       // both domains at threshold 0
    assert(results("per_code_top") > 0)
    assert(results.contains("top_detail") && results.contains("top_users"))
  }
}
