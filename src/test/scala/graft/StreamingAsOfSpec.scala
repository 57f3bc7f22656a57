package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{Enriched, Evt}

/** Fixture rows for the generic (arbitrary-schema) asOfStream surface. */
case class GLRow(sym: String, es: Long, qty: Long, note: String)
case class GRRow(sym: String, es: Long, seq: Long, px: Double, src: String)
case class DKLRow(lvl: Double, es: Long, note: String)
case class DKRRow(lvl: Double, es: Long, seq: Long, px: Double)
case class MKLRow(tags: Map[String, Long], es: Long, note: String)
case class MKRRow(tags: Map[String, Long], es: Long, seq: Long, px: Double)

/** Stream-stream temporal (as-of) join: watermark-final emission, arrival-
  * order robustness within the watermark, micro-batch independence, and
  * equality with the batch AsOfJoin over the same events. */
class StreamingAsOfSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[Evt]], watermarkDelay: String,
                  tol: Option[Long] = None,
                  direction: String = AsOfJoin.Backward): Seq[Enriched] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val tagged = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .withWatermark("eventTime", watermarkDelay)
      .as[Evt]
    val name = s"asof_${System.nanoTime()}"
    val q = StreamingAsOf.enrich(tagged, tol, direction)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Enriched].collect().toSeq
    } finally q.stop()
  }

  private def L(k: Long, ts: Long, id: Long) = Evt(k, ts, id, 1)
  private def R(k: Long, ts: Long, id: Long) = Evt(k, ts, id, 0)
  private val flush = Seq(Evt(999L, 9_999_999L, 0L, 0))

  test("left emits once the watermark passes it, matched to the latest prior right") {
    val got = run(Seq(
      Seq(R(1, 10, 200), R(1, 20, 201), L(1, 15, 100), L(1, 25, 101)),
      flush), "0 seconds")
    val byLeft = got.filter(_.key == 1).map(e => e.leftId -> e.rightId).toMap
    assert(byLeft == Map(100L -> Some(200L), 101L -> Some(201L)))
  }

  test("a right arriving AFTER the left (within watermark) still wins") {
    val got = run(Seq(
      Seq(L(1, 50, 100)),          // left first; watermark still far behind
      Seq(R(1, 40, 200)),          // its match arrives a batch later
      flush), "1000 seconds")
    assert(got.find(_.leftId == 100L).flatMap(_.rightId).contains(200L))
  }

  test("no prior right -> null match; tolerance nulls distant matches") {
    val got = run(Seq(
      Seq(L(2, 5, 100), R(2, 50, 200), L(2, 60, 101), L(2, 90, 102)),
      flush), "0 seconds", tol = Some(20L))
    val byLeft = got.filter(_.key == 2).map(e => e.leftId -> e.rightId).toMap
    assert(byLeft == Map(100L -> None, 101L -> Some(200L), 102L -> None))
  }

  test("rights prune to the dominating row without changing future matches") {
    val got = run(Seq(
      Seq(R(3, 10, 200), R(3, 20, 201)),
      Seq(Evt(998, 5000, 0, 0)),   // watermark passes both rights -> prune
      Seq(L(3, 6000, 100)),        // future left must still see right 201
      flush), "0 seconds")
    assert(got.find(_.leftId == 100L).flatMap(_.rightId).contains(201L))
  }

  test("forward: a left waits for its window to seal, then takes the earliest later right") {
    val got = run(Seq(
      Seq(L(1, 100, 100)),
      Seq(R(1, 105, 200), R(1, 108, 201)), // both in [100, 100+10]
      Seq(Evt(998, 111, 0, 0)),  // wm=111 > 100+10 -> left finalizes
      flush), "0 seconds", tol = Some(10L), direction = AsOfJoin.Forward)
    assert(got.find(_.leftId == 100L).flatMap(_.rightId).contains(200L))
    // and a right beyond the tolerance never matches
    val got2 = run(Seq(
      Seq(L(2, 100, 100), R(2, 120, 200)),
      flush), "0 seconds", tol = Some(10L), direction = AsOfJoin.Forward)
    assert(got2.find(_.leftId == 100L).exists(_.rightId.isEmpty))
  }

  test("streaming forward/nearest without a tolerance is rejected") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val e = intercept[IllegalArgumentException] {
      StreamingAsOf.enrich(mem.toDS(), None, AsOfJoin.Forward)
    }
    assert(e.getMessage.contains("tolerance"))
  }

  test("checkpointed as-of state survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-asof-ck").toString
    val mem = MemoryStream[Evt]
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Enriched]()
    def start() = {
      // 100s delay keeps the post-restart right (ts 40 < the left's 50)
      // admissible — the point is state restoration, not late-drop
      val tagged = mem.toDS()
        .withColumn("eventTime", timestamp_seconds(col("tsSec")))
        .withWatermark("eventTime", "100 seconds")
        .as[Evt]
      StreamingAsOf.enrich(tagged)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Enriched], _: Long) =>
          b.collect().foreach(got.add); ()
        }.start()
    }
    // batch 1: a right and a pending left land in state, then CRASH
    val q1 = start()
    mem.addData(R(1, 10, 200), L(1, 50, 100)); q1.processAllAvailable(); q1.stop()
    // batch 2 after restart: a better right (ts 40 <= 50) and the flush —
    // the restored state must still hold left 100 AND right 200
    val q2 = start()
    mem.addData(R(1, 40, 201)); q2.processAllAvailable()
    mem.addData(flush: _*); q2.processAllAvailable()
    try {
      val m = got.toArray(Array.empty[Enriched]).find(_.leftId == 100L)
      assert(m.exists(_.rightId.contains(201L)),
        s"restart lost buffered as-of state: $m")
    } finally q2.stop()
  }

  test("rights-only keys clean their state up once a tolerance seals them") {
    // a key that only ever receives rights must not leak one state entry
    // forever when a tolerance bounds how long its rights stay admissible
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Evt]
    val tagged = mem.toDS()
      .withColumn("eventTime", timestamp_seconds(col("tsSec")))
      .withWatermark("eventTime", "0 seconds")
      .as[Evt]
    val name = s"asofgc_${System.nanoTime()}"
    val q = StreamingAsOf.enrich(tagged, toleranceSec = Some(10L))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      def stateRows: Long = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .lastOption.map(_.numRowsTotal).getOrElse(-1L)
      mem.addData(R(1, 100, 200)); q.processAllAvailable() // rights-only key 1
      mem.addData(R(2, 10000, 201)); q.processAllAvailable() // wm -> 10000
      // key 1's cleanup callback fires on the next trigger after the
      // watermark passed 100 + tolerance
      mem.addData(R(2, 20000, 202)); q.processAllAvailable()
      mem.addData(R(2, 30000, 203)); q.processAllAvailable()
      assert(stateRows == 1L,
        s"rights-only key state not cleaned: $stateRows entries (want only key 2)")
    } finally q.stop()
  }

  test("generic asOfStream: string keys + multi-column payloads == batch, all directions") {
    // the batch-signature surface: arbitrary key/payload schemas travel
    // through the same state machine as Evt-shaped enrich
    val rnd = new scala.util.Random(77L)
    val syms = Vector("ACME", "BETA", "CHI", "DELTA")
    val lefts = Seq.tabulate(120) { i =>
      GLRow(syms(rnd.nextInt(syms.size)), rnd.nextInt(400).toLong,
        10L + i, s"n$i")
    }
    val rights = Seq.tabulate(150) { i =>
      GRRow(syms(rnd.nextInt(syms.size)), rnd.nextInt(400).toLong,
        1000L + i, (rnd.nextInt(9000) + 1000) / 100.0, s"s${i % 7}")
    }
    // chunk the UNION in ts order, never splitting an equal-ts run (the
    // late filter drops eventTime <= watermark)
    val tsOrder = (lefts.map(l => (l.es, Left(l))) ++
      rights.map(r => (r.es, Right(r)))).sortBy(_._1)
    val chunks = collection.mutable.ArrayBuffer[Seq[(Long, Either[GLRow, GRRow])]]()
    var rest = tsOrder
    while (rest.nonEmpty) {
      var n = math.min(1 + rnd.nextInt(40), rest.length)
      val boundary = rest(n - 1)._1
      while (n < rest.length && rest(n)._1 == boundary) n += 1
      chunks += rest.take(n); rest = rest.drop(n)
    }
    val lDf = lefts.toDF()
    val rDf = rights.toDF()
    for (direction <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)) {
      implicit val sqlCtx = spark.sqlContext
      val memL = MemoryStream[GLRow]
      val memR = MemoryStream[GRRow]
      val name = s"gasof_${System.nanoTime()}"
      val out = graft.streaming.StreamingAsOf.asOfStream(
        memL.toDS().toDF(), memR.toDS().toDF(), Seq("sym"), "es", "seq",
        Seq("px", "src"), "0 seconds", Some(100L), direction)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        chunks.foreach { c =>
          memL.addData(c.collect { case (_, Left(l)) => l }: _*)
          memR.addData(c.collect { case (_, Right(r)) => r }: _*)
          q.processAllAvailable()
        }
        // flush both sources so every pending left finalizes
        memL.addData(GLRow("~flush", 9_999_999L, 0L, ""))
        memR.addData(GRRow("~flush", 9_999_999L, 0L, 0.0, ""))
        q.processAllAvailable()
        val streamed = spark.table(name)
          .select(col("sym"), col("es"), col("qty"), col("note"),
            col("asof.px"), col("asof.src"))
          .as[(String, Long, Long, String, Option[Double], Option[String])].collect().toSet
          .filterNot(_._1 == "~flush")
        val batch = AsOfJoin.asOf(lDf, rDf, Seq("sym"), "es", "seq",
            Seq("px", "src"), Some(100L), direction)
          .select(col("sym"), col("es"), col("qty"), col("note"),
            col("asof.px"), col("asof.src"))
          .as[(String, Long, Long, String, Option[Double], Option[String])].collect().toSet
        assert(streamed == batch,
          s"generic streamed $direction diverged from batch " +
            s"(${streamed.size} vs ${batch.size} rows)")
      } finally q.stop()
    }
  }

  test("signed-zero double keys: streamed == batch (-0.0 groups with 0.0)") {
    // the batch operator groups by VALUE, where -0.0 == 0.0; the JSON
    // grouping form renders them "-0.0" vs "0.0" — without normalization
    // these keys silently never match in streaming
    implicit val sqlCtx = spark.sqlContext
    val lefts = Seq(DKLRow(-0.0, 10L, "neg-zero-left"),
      DKLRow(0.0, 20L, "pos-zero-left"), DKLRow(1.5, 30L, "other"))
    val rights = Seq(DKRRow(0.0, 5L, 1L, 42.0),
      DKRRow(-0.0, 15L, 2L, 43.0), DKRRow(1.5, 25L, 3L, 44.0))
    val memL = MemoryStream[DKLRow]
    val memR = MemoryStream[DKRRow]
    val name = s"zasof_${System.nanoTime()}"
    val out = StreamingAsOf.asOfStream(
      memL.toDS().toDF(), memR.toDS().toDF(), Seq("lvl"), "es", "seq",
      Seq("px"), "0 seconds", Some(100L), AsOfJoin.Backward)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      memL.addData(lefts: _*); memR.addData(rights: _*)
      q.processAllAvailable()
      memL.addData(DKLRow(999.0, 9_999_999L, "~flush"))
      memR.addData(DKRRow(999.0, 9_999_999L, 0L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table(name)
        .select(col("es"), col("note"), col("asof.px"))
        .as[(Long, String, Option[Double])].collect().toSet
        .filterNot(_._2 == "~flush")
      val batch = AsOfJoin.asOf(lefts.toDF(), rights.toDF(), Seq("lvl"),
          "es", "seq", Seq("px"), Some(100L), AsOfJoin.Backward)
        .select(col("es"), col("note"), col("asof.px"))
        .as[(Long, String, Option[Double])].collect().toSet
      assert(streamed == batch,
        s"signed-zero keys diverged: $streamed vs $batch")
      // and the zero-key lefts really did match across the sign divide
      assert(batch.forall(_._3.nonEmpty), s"batch missed a match: $batch")
    } finally q.stop()
  }

  test("map-typed keys are rejected loudly, not silently mismatched") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[MKLRow]
    val memR = MemoryStream[MKRRow]
    val e = intercept[IllegalArgumentException] {
      StreamingAsOf.asOfStream(
        memL.toDS().toDF(), memR.toDS().toDF(), Seq("tags"), "es", "seq",
        Seq("px"), "0 seconds", Some(100L), AsOfJoin.Backward)
    }
    assert(e.getMessage.contains("map-typed"))
    assert(e.getMessage.contains("tags"))
  }

  test("streamed == batch AsOfJoin on seeded random data, any chunking") {
    val rnd = new scala.util.Random(55L)
    val events = Seq.tabulate(300) { i =>
      Evt(rnd.nextInt(6).toLong, rnd.nextInt(500).toLong, 1000L + i,
        if (rnd.nextBoolean()) 1 else 0)
    }
    // watermark 0s: feed in ts order so nothing is late; chunk randomly but
    // never split a run of equal timestamps across a boundary — Spark's
    // late filter drops eventTime <= watermark, so an event equal to the
    // previous batch's max would be (correctly) discarded as late
    val sorted = events.sortBy(_.tsSec)
    val chunks = collection.mutable.ArrayBuffer[Seq[Evt]]()
    var rest = sorted
    while (rest.nonEmpty) {
      var n = math.min(1 + rnd.nextInt(60), rest.length)
      val boundary = rest(n - 1).tsSec
      while (n < rest.length && rest(n).tsSec == boundary) n += 1
      chunks += rest.take(n); rest = rest.drop(n)
    }
    val lDf = events.filter(_.side == 1).map(e => (e.key, e.id, e.tsSec))
      .toDF("k", "event_id", "es")
    val rDf = events.filter(_.side == 0).map(e => (e.key, e.id, e.tsSec))
      .toDF("k", "event_id", "es")
    for (direction <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)) {
      val streamed = run(chunks.toSeq :+ flush, "0 seconds",
          tol = Some(100L), direction = direction)
        .filter(_.key != 999L)
        .map(e => (e.key, e.leftId, e.rightId)).toSet
      val batch = AsOfJoin.asOf(lDf, rDf, Seq("k"), "es", "event_id",
          Seq("event_id"), Some(100L), direction)
        .select(col("k"), col("event_id"),
          col("asof.event_id").as("rid"))
        .as[(Long, Long, Option[Long])].collect()
        .map { case (k, lid, rid) => (k, lid, rid) }.toSet
      assert(streamed == batch,
        s"streamed $direction as-of diverged from batch AsOfJoin")
    }
  }
}
