package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.ZLake

/** CONCURRENT mutation fuzz: several writer threads hammer ONE lake with
  * randomized keyed upserts, keyed deletes, and appends — with no
  * coordination beyond the lake's own optimistic-commit protocol. The
  * workload is KEY-DISJOINT (thread t owns keys ≡ t mod T), so the ops
  * of different threads commute and the final state is the composition
  * of the per-thread serial models REGARDLESS of interleaving — a
  * deterministic oracle for genuinely racy execution. The threads still
  * collide constantly on FILES (every file holds every thread's keys),
  * so this drives the conflict-validate-restage path hard, not just the
  * lock.
  *
  * What a failure here would mean: lost updates (a commit overwriting a
  * racer's files without detecting it), resurrected rows (journal
  * mis-apply), torn manifests (planning drift), or deadlock (the test
  * would time out). */
class ConcurrentFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val T = 3 // writer threads
  private val opsPerThread = 5

  private def mkRow(id: Long, u: Long): (Long, Long, Long, String) =
    (id, id % 64, u, (id % 2).toString)

  private def toDf(rows: Seq[(Long, Long, Long, String)]): DataFrame =
    rows.toDF("id", "a", "u", "win")

  test(s"$T uncoordinated writers over one lake converge to the " +
      "composed per-thread model (key-disjoint ops commute)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cfuzz").toString + "/t"
    val n = 384L
    val init = (0L until n).map(id => mkRow(id, id % 97))
    for (w <- Seq("0", "1"))
      Sinks.zorderedWrite(
        toDf(init.filter(_._4 == w)).drop("win"), "a", "u",
        s"$root/win=$w", numFiles = 4, bits = 6, bloomCols = Seq("id"))

    val retriesBefore = LakeDelete.conflictRetries.get()
    // per-thread serial models over each thread's own key set
    val models = Array.fill(T)(collection.mutable.Map.empty[Long, Long])
    (0L until n).foreach(id => models((id % T).toInt)(id) = id % 97)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]

    def worker(t: Int): Thread = new Thread(() => {
      val rnd = new Random(1000 + t)
      val model = models(t)
      var fresh = 10000L + t // thread-owned fresh-key cursor (≡ t mod T?)
      (0 until opsPerThread).foreach { _ =>
        def retryCme[A](body: => A): A = {
          var i = 0
          while (true) {
            try return body
            catch {
              case e: java.util.ConcurrentModificationException =>
                i += 1
                if (i > 5) throw e // livelock would surface here
            }
          }
          throw new IllegalStateException("unreachable")
        }
        rnd.nextInt(4) match {
          case 0 => // keyed UPSERT of owned keys (existing + fresh)
            val existing = rnd.shuffle(model.keys.toSeq)
              .take(1 + rnd.nextInt(10))
            val nf = rnd.nextInt(3)
            val freshKeys = (0 until nf).map { i =>
              // fresh keys stay in this thread's residue class
              val k = fresh + (i.toLong * T); k
            }
            fresh += nf.toLong * T + T
            val delta = rnd.nextInt(1000).toLong
            val ups = (existing ++ freshKeys).distinct
              .map(id => mkRow(id, id % 97 + delta))
            retryCme(LakeDelete.upsertLake(spark, root, toDf(ups), "id"))
            ups.foreach { case (id, _, u, _) => model(id) = u }
          case 1 => // keyed DELETE of owned keys
            val victims = rnd.shuffle(model.keys.toSeq)
              .take(rnd.nextInt(8))
            if (victims.nonEmpty) {
              retryCme(LakeDelete.deleteFromLake(spark, root,
                col("id").isin(victims: _*)))
              victims.foreach(model.remove)
            }
          case 2 => // APPEND of fresh owned keys
            val ks = (0 until 1 + rnd.nextInt(3)).map(i =>
              fresh + i.toLong * T)
            fresh += ks.length.toLong * T + T
            val rows = ks.map(id => mkRow(id, id % 97))
            retryCme(LakeDelete.appendLake(spark, root, toDf(rows)))
            rows.foreach { case (id, _, u, _) => model(id) = u }
          case _ => // CONDITIONED MERGE over owned keys (r11): clause-
            // routed update/delete on matches, conditional insert on
            // fresh keys — post-images read TARGET state, so a lost
            // race must recompute them (the restage path under fire)
            val existing = rnd.shuffle(model.keys.toSeq)
              .take(rnd.nextInt(8))
            val nf = rnd.nextInt(2)
            val freshKeys = (0 until nf).map(i => fresh + i.toLong * T)
            fresh += nf.toLong * T + T
            val delta = (1 + rnd.nextInt(500)).toLong
            val srcRows = (existing ++ freshKeys).distinct.map { id =>
              (id, id % 64, id % 97 + delta, (id % 2).toString,
                id / T % 2)
            }
            if (srcRows.nonEmpty) {
              val src = srcRows
                .toDF("id", "a", "u", "win", "flag")
              retryCme(LakeDelete.mergeLake(spark, root, src, "id",
                Seq(
                  LakeDelete.MergeMatched(Some(col("s.flag") === 0L),
                    Some(Seq("u" -> (col("t.u") + lit(delta))))),
                  LakeDelete.MergeMatched(Some(col("s.flag") === 1L),
                    None)),
                notMatchedInsert = Some(Some(col("s.flag") === 0L))))
              srcRows.foreach { case (id, _, uSrc, _, flag) =>
                if (model.contains(id)) {
                  if (flag == 0L) model(id) = model(id) + delta
                  else { model.remove(id); () }
                } else if (flag == 0L) model(id) = uSrc
              }
            }
        }
      }
    })

    val threads = (0 until T).map(worker)
    threads.foreach(_.setUncaughtExceptionHandler((_, e) =>
      failures.add(e)))
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(threads.forall(!_.isAlive), "writer thread hung (deadlock?)")
    assert(failures.isEmpty,
      s"writer failed: ${Option(failures.peek()).map(_.toString)}")

    // fresh keys must have stayed key-disjoint (test-harness invariant)
    val owned = models.zipWithIndex.flatMap { case (m, t) =>
      m.keys.map(k => (k, t)) }
    assert(owned.groupBy(_._1).forall(_._2.length == 1),
      "key ownership violated — the oracle would be meaningless")

    val want = models.flatten.map { case (id, u) => id -> u }.toMap
    val got = ZLake.read(spark, root).select(col("id"), col("u"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == want.size,
      s"row count drifted: got ${got.size}, want ${want.size}")
    val bad = want.keys.filter(k => got.get(k) != want.get(k)).take(5)
    assert(bad.isEmpty, s"diverged keys: ${bad.map(k =>
      s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; ")}")

    // planning still covered: zero footer opens after the storm
    val n0 = ZLake.footerOpens.get()
    ZLake.read(spark, root).groupBy("win").count().collect()
    assert(ZLake.footerOpens.get() == n0, "manifest coverage lost")

    info(s"optimistic conflicts retried during the storm: " +
      s"${LakeDelete.conflictRetries.get() - retriesBefore}")
  }
}
