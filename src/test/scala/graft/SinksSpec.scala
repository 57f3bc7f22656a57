package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks

/** K2 middle-data sink: -separated text, bounded file count
  * (reference coalesce(12).saveAsTextFile, DnsRptCH.scala:131-139). */
class SinksSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("middleData round-trips \\u0001-separated rows in <= numFiles files") {
    val out = java.nio.file.Files.createTempDirectory("graft-middle").toString
    val rows = Seq(("user1", "a.com", 3L), ("user2", "b.com", 5L))
      .toDF("userName", "domain", "cnt")
    Sinks.middleData(rows, out, numFiles = 2)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(files.nonEmpty && files.length <= 2)

    val back = spark.read.text(out)
      .as[String].collect()
      .map(_.split('\u0001') match { case Array(u, d, c) => (u, d, c.toLong) })
      .sortBy(_._1).toSeq
    assert(back == Seq(("user1", "a.com", 3L), ("user2", "b.com", 5L)))
  }

  test("K1 jdbcAppend drives a real JDBC endpoint (embedded Derby) with append semantics") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val rows = Seq(("a.com", 3L), ("b.com", 5L)).toDF("domain", "resolver")
    // first append creates the table; batchsize=1 exercises multi-batch flush
    Sinks.jdbcAppend(rows, url, "dns_flow_top", batchSize = 1)
    // second append must add, not replace (ClickUtils.scala:24-27 semantics)
    Sinks.jdbcAppend(rows, url, "dns_flow_top")
    // read back through the S4/S14 source path (Sources.jdbc)
    val back = graft.sources.Sources.jdbc(spark, url, "dns_flow_top",
      new java.util.Properties())
    assert(back.count() == 4L)
    import org.apache.spark.sql.functions.sum
    assert(back.agg(sum("resolver")).head().getLong(0) == 16L)
  }

  test("inParallel runs every body exactly once and rethrows a failure") {
    // r16: the §2.6 overlap helper behind lakeWrite/lakeAppend and the
    // bench fixtures — pin the contract the callers rely on: all bodies
    // run (once each), and one body's failure surfaces after the batch
    val ran = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    graft.sinks.Sinks.inParallel(3)((0 until 7).map(i => () => {
      assert(ran.add(i), s"body $i ran twice"); ()
    }))
    assert(ran.size == 7)
    val boom = intercept[Exception] {
      graft.sinks.Sinks.inParallel(2)(Seq(
        () => (), () => throw new IllegalStateException("body failed")))
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(boom).exists(m => m != null && m.contains("body failed")))
    // degenerate shapes: single body and zero bodies run inline
    val one = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.sinks.Sinks.inParallel(4)(Seq(() => { one.incrementAndGet(); () }))
    graft.sinks.Sinks.inParallel(4)(Nil)
    assert(one.get() == 1)
  }
}
