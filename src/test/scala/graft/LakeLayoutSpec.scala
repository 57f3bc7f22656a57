package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks

/** The scale layout replacing the reference's filename-encoded 10-second
  * files: facts land as parquet partitioned by (date, hour); window queries
  * prune partitions at planning time instead of probing the filesystem
  * (DnsRptCH.scala:983-1012). */
class LakeLayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("partitioned fact layout prunes non-window partitions at the scan") {
    val root = java.nio.file.Files.createTempDirectory("graft-lake").toString
    val rows = Seq(
      ("2021-03-25", 0, "a.com"), ("2021-03-25", 1, "b.com"),
      ("2021-03-26", 0, "c.com"))
      .toDF("date", "hour", "domain")
    Sinks.parquetAppend(rows, root, partitionCols = Seq("date", "hour"))

    val win = spark.read.parquet(root)
      .filter(col("date") === "2021-03-25" && col("hour") === 0)
    assert(win.collect().map(_.getAs[String]("domain")).toSeq == Seq("a.com"))

    // both predicates must land in PartitionFilters (planning-time pruning)
    val scan = win.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"))
    assert(scan.contains("(date"), s"date not a partition filter:\n$scan")
    assert(scan.contains("(hour"), s"hour not a partition filter:\n$scan")
    // and the executed scan reads exactly one file (the matching partition)
    val numFiles = win.queryExecution.executedPlan.collectLeaves().head
      .metrics("numFiles").value
    assert(numFiles == 1L, s"scan read $numFiles files, expected 1")
  }

  test("BatchRunner windows land in the 5-min-bucketed lake and prune on read") {
    import graft.dns.BatchRunner
    def ip(s: String): Long =
      s.split('.').foldLeft(0L)((acc, o) => acc * 256 + o.toInt)
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
    def rawLine(tsMs: Long, domain: String): String =
      s"""{"Domain":"$domain","Timestamp":$tsMs,"ServerIP":"218.108.248.200","ClientIP":"30.250.11.7","QR":true,"Type":"A","ResponseCode":0,"Answers":[{"Type":"A","Value":"115.238.23.2"}]}"""

    val root = java.nio.file.Files.createTempDirectory("graft-lake-rs").toString
    val w1 = 1616631000000L
    val w2 = w1 + 300000L
    Seq((w1, "a.example.com"), (w2, "b.example.com")).foreach { case (ws, dom) =>
      val rs = BatchRunner.run(spark,
        Seq(rawLine(ws + 100, dom)).toDF("value"), dims, ws, trendThreshold = 0L)
      try Sinks.lakeAppend(rs.all, root) finally rs.unpersist()
    }

    // window read of the clear table prunes to w1's 5-min bucket
    val clearW1 = spark.read.parquet(s"$root/clear")
      .filter(col("win") === "20210325_0010")
    val w1Rows = clearW1.collect() // execute so the scan metrics populate
    val scan = clearW1.queryExecution.executedPlan.collectLeaves().head
    assert(scan.toString.contains("PartitionFilters") &&
      scan.toString.contains("(win"), s"win not pruned:\n$scan")
    val filesInW1 = new java.io.File(s"$root/clear/win=20210325_0010")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesInW1 > 0 && scan.metrics("numFiles").value == filesInW1.toLong,
      "pruned scan must read only the matching window's files")
    // the pruned window carries w1's report only
    assert(w1Rows.filter(_.getAs[Int]("clientName") == 0)
      .map(_.getAs[Long]("sampleNum")).toSeq == Seq(1L))
    assert(spark.read.parquet(s"$root/trend").select("domain").distinct()
      .as[String].collect().toSet == Set("a.example.com", "b.example.com"))

    // K2 middle-data save of the same window's parsed facts round-trips
    val rs1 = BatchRunner.run(spark,
      Seq(rawLine(w1 + 100, "a.example.com")).toDF("value"), dims, w1,
      trendThreshold = 0L)
    val mid = java.nio.file.Files.createTempDirectory("graft-lake-mid").toString + "/facts"
    try {
      Sinks.middleData(rs1.facts.select(col("domain"), col("clientIp"),
        col("aip"), col("resolver").cast("string")), mid, numFiles = 2)
      assert(spark.read.option("sep", "").csv(mid).count() == 1L)
    } finally rs1.unpersist()
  }
}
