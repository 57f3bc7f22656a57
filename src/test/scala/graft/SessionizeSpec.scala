package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, SessionSummary}

/** Stateful streaming sessionization: inline close on gap, event-time
  * timeout close via watermark, micro-batch-boundary independence. */
class SessionizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Event]], gapSec: Long): Seq[SessionSummary] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Sessionize.sessions(
      Sessionize.withEventTime(mem.toDS(), "0 seconds"), gapSec)
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[SessionSummary].collect().toSeq
    } finally q.stop()
  }

  test("gap inside one batch closes the earlier session inline") {
    val got = run(Seq(
      Seq(Event(1, 100), Event(1, 150), Event(1, 5000)),
      Seq(Event(9, 99999))), gapSec = 60) // later batch advances watermark
    val u1 = got.filter(_.userId == 1).sortBy(_.startSec)
    assert(u1.map(s => (s.startSec, s.endSec, s.events)) ==
      Seq((100L, 150L, 2L), (5000L, 5000L, 1L)))
  }

  test("watermark-driven timeout closes an idle session across batches") {
    val got = run(Seq(
      Seq(Event(2, 100), Event(2, 130)),   // open session [100,130]
      Seq(Event(3, 10000)),                // watermark -> 130; then 10000
      Seq(Event(3, 20000))),               // push watermark past 130+60
      gapSec = 60)
    val u2 = got.filter(_.userId == 2)
    assert(u2.map(s => (s.startSec, s.endSec, s.events, s.durationSec)) ==
      Seq((100L, 130L, 2L, 30L)))
  }

  test("late within-watermark event in a later batch extends startSec downward") {
    // ADVICE r1: an event preceding the open session's start used to leave
    // startSec unchanged (batching-dependent duration). Watermark delay 1000s
    // keeps ts=80 admissible in batch 2; it is within gap of [100,130]'s
    // start, so the session must become [80,130].
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Sessionize.sessions(
      Sessionize.withEventTime(mem.toDS(), "1000 seconds"), gapSec = 60)
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      mem.addData(Event(7, 100), Event(7, 130)); q.processAllAvailable()
      mem.addData(Event(7, 80)); q.processAllAvailable()       // late, in-gap
      mem.addData(Event(7, 5000)); q.processAllAvailable()     // close by gap
      mem.addData(Event(8, 99999)); q.processAllAvailable()    // flush
      val u7 = spark.table(name).as[SessionSummary].collect().toSeq
        .filter(_.userId == 7).sortBy(_.startSec)
      assert(u7.map(s => (s.startSec, s.endSec, s.events, s.durationSec))
        .headOption.contains((80L, 130L, 3L, 50L)))
    } finally q.stop()
  }

  test("late event more than gap before the open session closes as its own earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Sessionize.sessions(
      Sessionize.withEventTime(mem.toDS(), "10000 seconds"), gapSec = 60)
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      mem.addData(Event(9, 1000), Event(9, 1030)); q.processAllAvailable()
      mem.addData(Event(9, 200)); q.processAllAvailable() // >gap earlier: own session
      mem.addData(Event(10, 99999)); q.processAllAvailable()
      val u9 = spark.table(name).as[SessionSummary].collect().toSeq
        .filter(_.userId == 9).sortBy(_.startSec)
        .map(s => (s.startSec, s.endSec, s.events))
      // the earlier singleton closes as its OWN session (never folded into
      // [1000,1030]) once the watermark passes its boundary; the open
      // session may or may not have been timeout-flushed by the final
      // watermark advance — either is correct
      assert(u9.headOption.contains((200L, 200L, 1L)))
      assert(u9.toSet.subsetOf(Set((200L, 200L, 1L), (1000L, 1030L, 2L))))
    } finally q.stop()
  }

  test("late events merging with an earlier NON-OPEN session fold into one session") {
    // ADVICE r2: sessions preceding the open one used to close eagerly, so
    // gap=60, open=[1000,1030]; batch2 ts=200; batch3 ts=250 emitted two
    // overlapping sessions [200,200]+[250,250] where the batch formulation
    // yields one [200,250]. Within-watermark sessions must stay in state.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = Sessionize.sessions(
      Sessionize.withEventTime(mem.toDS(), "100000 seconds"), gapSec = 60)
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      mem.addData(Event(11, 1000), Event(11, 1030)); q.processAllAvailable()
      mem.addData(Event(11, 200)); q.processAllAvailable()
      mem.addData(Event(11, 250)); q.processAllAvailable()
      // flush: advance the watermark far past every boundary
      mem.addData(Event(12, 500000)); q.processAllAvailable()
      mem.addData(Event(12, 999999)); q.processAllAvailable()
      val u11 = spark.table(name).as[SessionSummary].collect().toSeq
        .filter(_.userId == 11).sortBy(_.startSec)
        .map(s => (s.startSec, s.endSec, s.events))
      assert(u11 == Seq((200L, 250L, 2L), (1000L, 1030L, 2L)))
    } finally q.stop()
  }

  test("streaming sessionize equals the batch gap formulation on real data") {
    // the boundary-independence claim, proven against data: the stateful
    // streaming operator fed in arbitrary chunks must emit exactly the
    // sessions the batch q45 lag/gap formulation computes
    implicit val sqlCtx = spark.sqlContext
    val evs = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .selectExpr("user_id AS userId", "unix_micros(ts) div 1000000 AS tsSec")
      .as[Event].collect().sortBy(e => (e.tsSec, e.userId)).toSeq
    val expected = evs.groupBy(_.userId).flatMap { case (uid, es) =>
      val ts = es.map(_.tsSec).sorted
      val out = collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
      var start = ts.head; var end = ts.head; var n = 1L
      ts.tail.foreach { t =>
        if (t - end <= 1800) { end = t; n += 1 }
        else { out += ((uid, start, end, n)); start = t; end = t; n = 1 }
      }
      out += ((uid, start, end, n)); out
    }.toSet

    val mem = MemoryStream[Event]
    val out = Sessionize.sessions(
      Sessionize.withEventTime(mem.toDS(), "0 seconds"), gapSec = 1800)
    val name = s"sessions_${System.nanoTime()}"
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      evs.grouped(math.max(1, evs.size / 3 + 1)).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      val maxTs = evs.map(_.tsSec).max
      mem.addData(Event(-1L, maxTs + 10000)); q.processAllAvailable()
      mem.addData(Event(-1L, maxTs + 20000)); q.processAllAvailable() // fire timers
      val got = spark.table(name).as[SessionSummary].collect()
        .filter(_.userId >= 0)
        .map(s => (s.userId, s.startSec, s.endSec, s.events)).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("batch-boundary independence: same events, different batching") {
    val evs = Seq(Event(5, 10), Event(5, 40), Event(5, 300), Event(5, 320))
    val flush = Seq(Event(6, 50000), Event(6, 99999))
    val a = run(Seq(evs, flush, flush.map(e => e.copy(tsSec = e.tsSec + 1))), 60)
    val b = run(Seq(evs.take(1), evs.drop(1), flush,
      flush.map(e => e.copy(tsSec = e.tsSec + 1))), 60)
    def u5(x: Seq[SessionSummary]) =
      x.filter(_.userId == 5).map(s => (s.startSec, s.endSec, s.events)).sorted
    assert(u5(a) == Seq((10L, 40L, 2L), (300L, 320L, 2L)))
    assert(u5(a) == u5(b))
  }
}
