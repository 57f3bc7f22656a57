package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.{Snapshots, ZLake}

/** Randomized MUTATION FUZZ over the lake's whole CoW/versioning surface:
  * seeded sequences of journaled deletes, keyed upserts, predicated
  * updates, window compactions, snapshots and vacuums run against an
  * in-memory model, with mid-commit CRASHES planted at the journal's
  * published-not-applied window on a random subset of mutations. After
  * EVERY step the live read must equal the model exactly; pinned
  * snapshots must stay byte-equivalent to the model state they captured,
  * across every later mutation, until vacuumed. A planted crash must be
  * healed by the next entry-point recovery into exactly the committed
  * state (the journal is the commit point — published means done).
  *
  * This is the property the unit suites check piecewise, composed the
  * way a real table lives: interleaved, repeated, in random order. */
final case class FuzzRow(id: Long, a: Long, b: Long, u: Long,
                         win: String)

class MutationFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  private type R = FuzzRow
  private def R(id: Long, a: Long, b: Long, u: Long, win: String): R =
    FuzzRow(id, a, b, u, win)

  private def mkRow(id: Long): R =
    R(id, id % 64, id * 7 % 64, id % 97, (id % 2).toString)

  private def toDf(rows: Seq[R]): DataFrame =
    rows.toDF("id", "a", "b", "u", "win")

  private def liveRows(root: String): Set[R] =
    ZLake.read(spark, root).select(col("id"), col("a"), col("b"),
      col("u"), col("win")).as[FuzzRow].collect().toSet

  private def snapRows(root: String, tag: String): Set[R] =
    Snapshots.readSnapshot(spark, root, tag).select(col("id"), col("a"),
      col("b"), col("u"), col("win")).as[FuzzRow].collect().toSet

  private def buildLake(rows: Seq[R], root: String): Unit =
    for (w <- Seq("0", "1"))
      Sinks.zorderedWrite(
        toDf(rows.filter(_.win == w)).drop("win"), "a", "b",
        s"$root/win=$w", numFiles = 4, bits = 6,
        bloomCols = Seq("id"), sumCols = Seq("u"))

  /** One op: mutate the lake AND the model identically; returns a label.
    * `crash` plants a throw at the journal published-not-applied window
    * — the mutation is then COMMITTED, so the model applies it and the
    * next recovery must materialize it. */
  private def step(rnd: Random, root: String,
                   model: collection.mutable.Map[Long, R],
                   crash: Boolean): String = {
    def preds(): (org.apache.spark.sql.Column, R => Boolean) =
      rnd.nextInt(4) match {
        case 0 =>
          val t = rnd.nextInt(64).toLong
          (col("a") < t, r => r.a < t)
        case 1 =>
          val lo = rnd.nextInt(80).toLong; val hi = lo + rnd.nextInt(20)
          (col("u").between(lo, hi), r => r.u >= lo && r.u <= hi)
        case 2 =>
          val w = rnd.nextInt(2).toString; val t = rnd.nextInt(64).toLong
          (col("win") === w && col("b") >= t,
            r => r.win == w && r.b >= t)
        case _ =>
          val k = 2 + rnd.nextInt(7); val j = rnd.nextInt(k)
          (col("id") % k === j, r => r.id % k == j)
      }
    // a crashing mutation either throws at the published-not-applied
    // window (committed — recovery must finish it) or completes having
    // published nothing (no-match predicate) — both fine; the model
    // applies the op's semantics either way
    def withCrash[T](body: => T): Unit =
      if (!crash) { body; () }
      else {
        LakeDelete.journalPublishedHook.set(() => {
          LakeDelete.journalPublishedHook.set(() => ())
          throw new IllegalStateException("fuzz: crash after publish")
        })
        try { body; () }
        catch { case _: IllegalStateException => () }
        finally LakeDelete.journalPublishedHook.set(() => ())
      }
    rnd.nextInt(5) match {
      case 0 => // DELETE
        val (c, f) = preds()
        withCrash(LakeDelete.deleteFromLake(spark, root, c))
        model.filterInPlace((_, r) => !f(r))
        if (crash) LakeDelete.recover(spark, root)
        s"delete${if (crash) "+crash" else ""}($c)"
      case 1 => // keyed UPSERT: existing + fresh keys
        val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(20))
        val fresh = Seq.fill(rnd.nextInt(5))(100000L + rnd.nextInt(100000))
        val delta = rnd.nextInt(1000).toLong
        val ups = (existing ++ fresh).distinct.map { id =>
          val base = mkRow(id); base.copy(u = base.u + delta)
        }
        if (ups.nonEmpty) {
          withCrash(LakeDelete.upsertLake(spark, root, toDf(ups), "id"))
          ups.foreach(r => model(r.id) = r)
          if (crash) LakeDelete.recover(spark, root)
        }
        s"upsert${if (crash) "+crash" else ""}(${ups.size})"
      case 2 => // predicated UPDATE
        val (c, f) = preds()
        val d = 1L + rnd.nextInt(500)
        withCrash(LakeDelete.updateLake(spark, root,
          Seq("u" -> (col("u") + d)), c))
        model.mapValuesInPlace((_, r) =>
          if (f(r)) r.copy(u = r.u + d) else r)
        if (crash) LakeDelete.recover(spark, root)
        s"update${if (crash) "+crash" else ""}(u += $d where $c)"
      case 3 => // window COMPACTION (no crash lane: own seams, own spec)
        Sinks.compactLake(spark, root, "a", "b", filesPerPartition = 2,
          bits = 6, bloomCols = Seq("id"), sumCols = Seq("u"))
        "compact"
      case _ => "noop"
    }
  }

  test("seeded mutation sequences with planted crashes: live == model, " +
      "snapshots pinned, vacuum exact") {
    for (seed <- Seq(11, 42, 77)) {
      val rnd = new Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-fuzz-$seed").toString + "/t"
      val init = (0L until 2048L).map(mkRow)
      buildLake(init, root)
      val model = collection.mutable.Map(init.map(r => r.id -> r): _*)
      val snaps = collection.mutable.Map.empty[String, Set[R]]
      var tagN = 0
      for (i <- 0 until 10) {
        // ~1 in 4 mutations crashes mid-commit
        val label = step(rnd, root, model, crash = rnd.nextInt(4) == 0)
        assert(liveRows(root) == model.values.toSet,
          s"seed $seed step $i ($label): live diverged from model")
        if (rnd.nextInt(3) == 0 && model.nonEmpty) {
          val tag = s"s$tagN"; tagN += 1
          Snapshots.snapshot(spark, root, tag)
          snaps(tag) = model.values.toSet
        }
        // one random pinned snapshot re-checked per step
        if (snaps.nonEmpty) {
          val tag = rnd.shuffle(snaps.keys.toSeq).head
          assert(snapRows(root, tag) == snaps(tag),
            s"seed $seed step $i ($label): snapshot $tag drifted")
        }
      }
      // every snapshot still exact at the end
      snaps.foreach { case (tag, want) =>
        assert(snapRows(root, tag) == want, s"seed $seed: $tag drifted")
      }
      // vacuum keeps exactly one tag; it must survive, others must go
      if (snaps.nonEmpty) {
        val keep = rnd.shuffle(snaps.keys.toSeq).head
        Snapshots.vacuum(spark, root, Seq(keep))
        assert(Snapshots.listSnapshots(spark, root) == Seq(keep))
        assert(snapRows(root, keep) == snaps(keep),
          s"seed $seed: kept snapshot $keep lost bytes to vacuum")
      }
      assert(liveRows(root) == model.values.toSet, s"seed $seed: final")
    }
  }
}
