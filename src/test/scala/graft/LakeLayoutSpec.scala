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
}
