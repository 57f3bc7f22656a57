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
}
