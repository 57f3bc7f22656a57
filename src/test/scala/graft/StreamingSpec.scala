package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dns.DnsRecord
import graft.streaming.StreamRunner

class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rec(tsSec: Long, client: Int, err: Long) = DnsRecord(
    requestType = "A", responseCode = 0, domain = "x.com", dnsIp = "1.1.1.1",
    clientIp = "2.2.2.2", ts = new Timestamp(tsSec * 1000), aip = "3.3.3.3",
    responseType = "A", error = err, resolver = 1L, clientName = client)

  test("5-min tumbling window counts with watermark (complete batch)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DnsRecord]
    val base = 1616631000L // window-aligned? 1616631000 % 300 = 0
    mem.addData(rec(base + 10, 1, 0), rec(base + 20, 1, 1),
      rec(base + 400, 2, 0)) // second window
    val q = StreamRunner.windowedCounts(mem.toDF())
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(col("window.start").cast("long"), col("clientName"),
          col("sampleNum"), col("errorNum"))
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(rows == Seq((base, 1, 2L, 1L), (base + 300, 2, 1L, 0L)))
    } finally q.stop()
  }

  test("foreachBatch report reuses the batch code path and skips empty batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DnsRecord]
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = StreamRunner.reportEvery(mem.toDF(), interval = "0 seconds", ckpt) {
      (batch, _) => seen += batch.count()
    }.start()
    try {
      mem.addData(rec(1616631000L, 1, 0))
      q.processAllAvailable()
      assert(seen.sum == 1L)
    } finally q.stop()
  }
}
