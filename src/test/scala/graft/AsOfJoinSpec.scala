package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of join semantics: at-or-before, per-key, deterministic tie-break,
  * null when no prior right row. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("latest right at-or-before; ties -> highest tie col; no prior -> null") {
    val left = Seq((1L, 100L, 10L), (2L, 101L, 5L), (1L, 102L, 20L))
      .toDF("k", "event_id", "es") // (key, id, ts)
    val right = Seq(
      (1L, 200L, 10L),  // same ts as left 100 -> eligible (at-or-before)
      (1L, 201L, 10L),  // tie on (k, ts): higher id wins
      (1L, 202L, 15L),  // latest before left 102 at ts 20
      (2L, 203L, 7L))   // AFTER left 101 (ts 5) -> not eligible
      .toDF("k", "event_id", "es")
    val out = AsOfJoin.asOf(left, right, keys = Seq("k"), tsCol = "es",
        tieCol = "event_id", payload = Seq("event_id"))
      .select(col("event_id"), col("asof.event_id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(201L)) // tie at ts=10 -> id 201
    assert(out(102L).contains(202L)) // latest <= 20
    assert(out(101L).isEmpty)        // no view at-or-before ts 5
  }

  test("tolerance nulls matches older than the bound") {
    val left = Seq((1L, 100L, 20L)).toDF("k", "event_id", "es")
    val right = Seq((1L, 200L, 5L)).toDF("k", "event_id", "es") // 15 older
    def rid(tol: Option[Long]) = AsOfJoin.asOf(left, right,
        Seq("k"), "es", "event_id", Seq("event_id"), tol)
      .select(col("asof.event_id")).as[Option[Long]].head()
    assert(rid(None).contains(200L))
    assert(rid(Some(20L)).contains(200L))
    assert(rid(Some(10L)).isEmpty)
  }

  test("forward: earliest right at-or-after; equal ts eligible; no later -> null") {
    val left = Seq((1L, 100L, 10L), (1L, 101L, 16L), (2L, 102L, 30L))
      .toDF("k", "event_id", "es")
    val right = Seq(
      (1L, 200L, 10L),  // equal ts -> eligible for left 100 (inclusive)
      (1L, 201L, 10L),  // tie on (k, ts): higher id wins
      (1L, 202L, 15L),  // BEFORE left 101 -> not eligible forward
      (1L, 203L, 20L),  // earliest at-or-after 16
      (2L, 204L, 25L))  // before left 102 -> no forward match for key 2
      .toDF("k", "event_id", "es")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "es", "event_id",
        Seq("event_id"), direction = AsOfJoin.Forward)
      .select(col("event_id"), col("asof.event_id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(201L)) // tie at ts=10 -> id 201
    assert(out(101L).contains(203L)) // earliest >= 16 is ts 20
    assert(out(102L).isEmpty)        // nothing at-or-after ts 30
  }

  test("forward tolerance nulls matches farther than the bound") {
    val left = Seq((1L, 100L, 20L)).toDF("k", "event_id", "es")
    val right = Seq((1L, 200L, 35L)).toDF("k", "event_id", "es") // 15 ahead
    def rid(tol: Option[Long]) = AsOfJoin.asOf(left, right,
        Seq("k"), "es", "event_id", Seq("event_id"), tol, AsOfJoin.Forward)
      .select(col("asof.event_id")).as[Option[Long]].head()
    assert(rid(None).contains(200L))
    assert(rid(Some(15L)).contains(200L))
    assert(rid(Some(14L)).isEmpty)
  }

  test("nearest: closer side wins; exact tie prefers backward; one-sided fallback") {
    val left = Seq(
      (1L, 100L, 20L),  // back at 18 (d=2), fwd at 25 (d=5) -> back
      (1L, 101L, 28L),  // back at 25 (d=3), fwd at 30 (d=2) -> fwd
      (1L, 102L, 35L),  // back at 30 (d=5), fwd at 40 (d=5) -> tie -> back
      (2L, 103L, 10L),  // only a forward candidate exists
      (3L, 104L, 10L))  // no candidates at all
      .toDF("k", "event_id", "es")
    val right = Seq(
      (1L, 200L, 18L), (1L, 201L, 25L), (1L, 202L, 30L), (1L, 203L, 40L),
      (2L, 204L, 50L))
      .toDF("k", "event_id", "es")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "es", "event_id",
        Seq("event_id"), direction = AsOfJoin.Nearest)
      .select(col("event_id"), col("asof.event_id").as("rid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(200L))
    assert(out(101L).contains(202L))
    assert(out(102L).contains(202L)) // tie -> backward
    assert(out(103L).contains(204L)) // backward null -> forward
    assert(out(104L).isEmpty)
  }

  test("nearest tolerance clips each side independently") {
    // back at d=3, fwd at d=8: tolerance 5 clips fwd, keeps back;
    // tolerance 2 clips both.
    val left = Seq((1L, 100L, 20L)).toDF("k", "event_id", "es")
    val right = Seq((1L, 200L, 17L), (1L, 201L, 28L)).toDF("k", "event_id", "es")
    def rid(tol: Option[Long]) = AsOfJoin.asOf(left, right,
        Seq("k"), "es", "event_id", Seq("event_id"), tol, AsOfJoin.Nearest)
      .select(col("asof.event_id")).as[Option[Long]].head()
    assert(rid(None).contains(200L))     // d=3 beats d=8
    assert(rid(Some(5L)).contains(200L))
    assert(rid(Some(2L)).isEmpty)
    // and the other side survives when only backward is clipped
    val left2 = Seq((1L, 100L, 20L)).toDF("k", "event_id", "es")
    val right2 = Seq((1L, 200L, 5L), (1L, 201L, 24L)).toDF("k", "event_id", "es")
    val r2 = AsOfJoin.asOf(left2, right2, Seq("k"), "es", "event_id",
        Seq("event_id"), Some(10L), AsOfJoin.Nearest)
      .select(col("asof.event_id")).as[Option[Long]].head()
    assert(r2.contains(201L)) // backward d=15 clipped; forward d=4 kept
  }

  test("all directions equal a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(20260812L)
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, 1000L + i, rnd.nextInt(60).toLong))
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, 2000L + i, rnd.nextInt(60).toLong))
    val lDf = left.toDF("k", "event_id", "es")
    val rDf = right.toDF("k", "event_id", "es")

    // brute force: scan all right rows per left row
    def brute(direction: String, tol: Option[Long]): Map[Long, Option[Long]] =
      left.map { case (k, lid, les) =>
        val back = right.filter(r => r._1 == k && r._3 <= les
            && tol.forall(t => les - r._3 <= t))
          .sortBy(r => (r._3, r._2)).lastOption
        val fwd = right.filter(r => r._1 == k && r._3 >= les
            && tol.forall(t => r._3 - les <= t))
          .sortBy(r => (-r._3, r._2)).lastOption // min ts, then max id
        val pick = direction match {
          case AsOfJoin.Backward => back
          case AsOfJoin.Forward => fwd
          case AsOfJoin.Nearest => (back, fwd) match {
            case (Some(b), Some(f)) =>
              if (les - b._3 <= f._3 - les) Some(b) else Some(f)
            case (b, f) => b.orElse(f)
          }
        }
        lid -> pick.map(_._2)
      }.toMap

    for (direction <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest);
         tol <- Seq(None, Some(7L), Some(0L))) {
      val got = AsOfJoin.asOf(lDf, rDf, Seq("k"), "es", "event_id",
          Seq("event_id"), tol, direction)
        .select(col("event_id"), col("asof.event_id").as("rid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got == brute(direction, tol),
        s"divergence at direction=$direction tolerance=$tol")
    }
  }

  test("nearest evaluates both directions over a single shuffle") {
    val left = Seq((1L, 100L, 20L)).toDF("k", "event_id", "es")
    val right = Seq((1L, 200L, 18L)).toDF("k", "event_id", "es")
    val df = AsOfJoin.asOf(left, right, Seq("k"), "es", "event_id",
        Seq("event_id"), direction = AsOfJoin.Nearest)
    df.collect() // force AQE to finalize
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }
    assert(shuffles.size <= 1,
      s"nearest as-of should reuse one key exchange, saw ${shuffles.size}")
  }
}
