package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.ZLake

/** Optimistic concurrency over the z-lake's mutation layer (r10):
  * staging runs OUTSIDE the writer lock in per-txn `_txn/<uuid>/` dirs,
  * the lock guards only the commit window, the commit validates its
  * read-set, and a lost race restages. Isolation is write-snapshot:
  * a mutation applies to the files it triaged, so rows appended
  * concurrently survive a concurrent DELETE. */
class ConcurrentMutationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val n = 1024

  private def source(from: Long, until: Long): DataFrame =
    spark.range(from, until).select(
      col("id"),
      (col("id") % 64).as("a"),
      (col("id") * 7 % 64).as("b"),
      (col("id") % 97).as("u"))

  /** win=0 / win=1 partitioned z-lake, 4 files each. */
  private def buildLake(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-occ").toString + "/t"
    for (w <- 0 to 1)
      Sinks.zorderedWrite(source(0, n).filter(col("id") % 2 === w),
        "a", "b", s"$root/win=$w", numFiles = 4, bits = 6,
        sumCols = Seq("a"), bloomCols = Seq("id"))
    root
  }

  private def ids(root: String): Set[Long] =
    ZLake.read(spark, root).select("id").as[Long].collect().toSet

  /** One-shot staged-window hook (resets itself before running). */
  private def onceStaged(body: => Unit): Unit =
    LakeDelete.stagedHook.set { () =>
      LakeDelete.stagedHook.set(() => ())
      body
    }

  test("an append lands inside a delete's staging window: both commit, " +
      "appended rows survive the delete (write-snapshot isolation)") {
    val root = buildLake()
    val before = LakeDelete.conflictRetries.get()
    // appended rows INCLUDE predicate-matching ones — the delete triaged
    // before they existed, so they must survive
    onceStaged {
      val extra = source(n, n + 32)
        .withColumn("win", (col("id") % 2).cast("string"))
      val rep = LakeDelete.appendLake(spark, root, extra)
      assert(rep.rowsInserted == 32)
    }
    try {
      val rep = LakeDelete.deleteFromLake(spark, root, col("a") < 16)
      assert(rep.rowsDeleted > 0)
    } finally LakeDelete.stagedHook.set(() => ())
    val got = ids(root)
    (0L until n).foreach { id =>
      assert(got.contains(id) == (id % 64 >= 16), s"old id $id")
    }
    (n until n + 32).foreach { id =>
      assert(got.contains(id), s"appended id $id must survive the delete")
    }
    // pure adds never touch the delete's read-set: no conflict retry paid.
    // NOTE the counter is process-global — if this ever fails with the
    // lake state correct (the assertions above all passed), suspect a
    // leaked background mutation from an earlier suite bumping it, not
    // this test's operators.
    val afterRetries = LakeDelete.conflictRetries.get()
    assert(afterRetries == before,
      s"append vs delete must not conflict (global retries " +
        s"$before -> $afterRetries; lake state was verified correct " +
        "above, so a foreign mutation is the likely source)")
    // manifests repaired across both commits: planning stays zero-footer
    val n0 = ZLake.footerOpens.get()
    ZLake.read(spark, root).filter(col("win") === "0").count()
    assert(ZLake.footerOpens.get() == n0, "manifest coverage lost")
  }

  test("two deletes racing on the same files: the loser detects the " +
      "conflict, restages, and converges to the right answer") {
    val root = buildLake()
    val before = LakeDelete.conflictRetries.get()
    onceStaged {
      // the competing delete commits first and rewrites the same files
      val rep = LakeDelete.deleteFromLake(spark, root, col("a") < 16)
      assert(rep.rowsDeleted > 0)
    }
    try {
      val rep = LakeDelete.deleteFromLake(spark, root, col("a") < 16)
      // the retry's fresh triage finds the rows already gone
      assert(rep.rowsDeleted == 0L, rep.toString)
    } finally LakeDelete.stagedHook.set(() => ())
    assert(LakeDelete.conflictRetries.get() > before,
      "the race must have been detected, not silently double-applied")
    assert(ids(root) == (0L until n).filter(_ % 64 >= 16).toSet)
  }

  test("upsert keeps its staged inserts across a conflict retry and " +
      "applies exactly once") {
    val root = buildLake()
    val before = LakeDelete.conflictRetries.get()
    onceStaged {
      // competing delete drops EVERY file — guaranteed overlap with the
      // upsert's keyed read-set
      LakeDelete.deleteFromLake(spark, root, col("a") < 64)
      ()
    }
    val upd = Seq((5L, 999L, 999L, 5000L))
      .toDF("id", "a", "b", "u")
      .withColumn("win", lit("1"))
    try {
      val rep = LakeDelete.upsertLake(spark, root, upd, "id")
      assert(rep.rowsInserted == 1)
    } finally LakeDelete.stagedHook.set(() => ())
    assert(LakeDelete.conflictRetries.get() > before, "race undetected")
    val got = ZLake.read(spark, root)
      .filter(col("id") === 5L).select("a").as[Long].collect().toSeq
    assert(got == Seq(999L), s"upsert applied ${got.size} times")
    assert(ids(root) == Set(5L),
      "only the upserted row survives the competing full delete")
  }

  test("parallel appends from four threads all land, serialized through " +
      "the short commit window") {
    val root = buildLake()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        val extra = source(n + 100 * t, n + 100 * t + 25)
          .withColumn("win", (col("id") % 2).cast("string"))
        val rep = LakeDelete.appendLake(spark, root, extra)
        assert(rep.rowsInserted == 25)
      })
    }
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    threads.foreach(_.setUncaughtExceptionHandler((_, e) => failures.add(e)))
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(failures.isEmpty, s"appender failed: ${failures.peek()}")
    val got = ids(root)
    (0 until 4).foreach { t =>
      (n + 100 * t until n + 100 * t + 25).foreach(id =>
        assert(got.contains(id), s"thread $t id $id lost"))
    }
    // every commit repaired manifests: planning is still zero-footer
    val n0 = ZLake.footerOpens.get()
    ZLake.read(spark, root).groupBy("win").count().collect()
    assert(ZLake.footerOpens.get() == n0, "manifest coverage lost")
  }

  test("a crash between journal publish and apply leaves the txn dir " +
      "pinned by the journal; recover() heals from the recorded stage dir") {
    val root = buildLake()
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    LakeDelete.journalPublishedHook.set(() =>
      throw new RuntimeException("crash: committed, not applied"))
    try {
      intercept[RuntimeException](
        LakeDelete.deleteFromLake(spark, root, col("a") < 16))
    } finally LakeDelete.journalPublishedHook.set(() => ())
    val jp = new Path(root, "_graft_delete_journal.json")
    assert(fs.exists(jp), "journal must be durable at the crash point")
    val txn = new Path(root, "_txn")
    assert(fs.exists(txn) && fs.listStatus(txn).nonEmpty,
      "the journal-referenced txn dir must not be cleaned up")
    assert(LakeDelete.recover(spark, root))
    assert(!fs.exists(jp))
    assert(ids(root) == (0L until n).filter(_ % 64 >= 16).toSet,
      "recovery must complete the committed delete exactly once")
  }

  test("orphaned pre-commit txn dirs are age-swept by a later commit") {
    val root = buildLake()
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val orphan = new Path(root, "_txn/00000000-dead-beef-0000-000000000000")
    fs.mkdirs(orphan)
    fs.create(new Path(orphan, "leftover.parquet"), true).close()
    // a true orphan is old ALL the way down — the sweep gates on the
    // newest mtime found recursively, so a live stager's fresh writes
    // under .out keep its dir alive however old the dir itself looks
    val old = System.currentTimeMillis() - 3L * 60 * 60 * 1000
    fs.setTimes(new Path(orphan, "leftover.parquet"), old, -1)
    fs.setTimes(orphan, old, -1)
    // decoy: dir mtime ancient but a file inside is FRESH (a staging job
    // mid-write) — must NOT be swept
    val live = new Path(root, "_txn/00000000-dead-beef-0000-000000000001")
    fs.mkdirs(live)
    fs.create(new Path(live, "inflight.parquet"), true).close()
    fs.setTimes(live, old, -1)
    val extra = source(n, n + 8)
      .withColumn("win", (col("id") % 2).cast("string"))
    LakeDelete.appendLake(spark, root, extra)
    assert(!fs.exists(orphan), "stale txn dir not swept")
    assert(fs.exists(live),
      "txn dir with fresh staged writes must survive the sweep")
    fs.delete(live, true)
  }

  test("an append lands inside a RESTORE's staging window: the full-set " +
      "read-set conflicts, the retry converges to exactly the pin") {
    val root = buildLake()
    graft.sources.Snapshots.snapshot(spark, root, "pin")
    val pinned = ids(root)
    LakeDelete.deleteFromLake(spark, root, col("a") < 8)
    val before = LakeDelete.conflictRetries.get()
    // an append races the restore's staging: appends never conflict with
    // anything, but the RESTORE must — a per-file read-set cannot see an
    // ADDITION, and a restore that missed it would leave extra rows
    onceStaged {
      val extra = source(n, n + 16)
        .withColumn("win", (col("id") % 2).cast("string"))
      LakeDelete.appendLake(spark, root, extra); ()
    }
    try {
      val rep = graft.sources.Snapshots.restore(spark, root, "pin")
      assert(rep.filesDropped > 0)
    } finally LakeDelete.stagedHook.set(() => ())
    assert(LakeDelete.conflictRetries.get() > before,
      "the racing append must have cost the restore a conflict retry")
    assert(ids(root) == pinned,
      "restored state must be exactly the pin — racing append included")
  }
}
