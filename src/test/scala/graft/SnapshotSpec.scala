package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.{Snapshots, ZLake}

/** Named lake snapshots: a tagged file set stays byte-identically readable
  * across journaled deletes, upserts, and compactions (retired files move
  * to the trash, resolution is by identity), keeps its planning-time
  * pruning from the embedded stats, and is reclaimed exactly by vacuum.
  * The failure modes guarded here: a snapshot read silently reflecting a
  * later mutation, a mutation breaking an existing snapshot, and vacuum
  * deleting bytes a kept snapshot still needs. */
class SnapshotSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def corpus(n: Int): DataFrame =
    spark.range(n).select(col("id"),
      (col("id") % 64).as("a"), (col("id") / 64 % 64).as("b"),
      concat(lit("u"), (col("id") % 997).cast("string")).as("uid"))

  private def rows(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf).toSeq).toSeq
      .sortBy(_.mkString("|"))

  private def fs(root: String) = new org.apache.hadoop.fs.Path(root)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def trashExists(root: String): Boolean =
    fs(root).exists(new org.apache.hadoop.fs.Path(root,
      Snapshots.TrashDirName))

  test("snapshot survives a journaled DELETE; live read moves on") {
    val root = tmp("snap-del")
    Sinks.zorderedWrite(corpus(4096), "a", "b", root, numFiles = 8, bits = 6,
      bloomCols = Seq("uid"))
    val before = rows(ZLake.read(spark, root))
    Snapshots.snapshot(spark, root, "t0")

    // snapshot planning costs zero footer opens (stats ride the snapshot)
    val opens0 = ZLake.footerOpens.get()
    Snapshots.snapshotIndex(spark, root, "t0")
    assert(ZLake.footerOpens.get() == opens0, "snapshot planning opened footers")

    val rep = LakeDelete.deleteFromLake(spark, root, col("a") < 16)
    assert(rep.rowsDeleted > 0)
    assert(ZLake.read(spark, root).filter(col("a") < 16).count() == 0L)
    assert(rows(Snapshots.readSnapshot(spark, root, "t0")) == before,
      "snapshot read drifted after delete")
    assert(trashExists(root), "deleted files should have retired to trash")
  }

  test("snapshot survives an UPSERT: old values pinned, new ones live") {
    val root = tmp("snap-ups")
    Sinks.zorderedWrite(corpus(1024), "a", "b", root, numFiles = 4, bits = 6)
    Snapshots.snapshot(spark, root, "t0")
    val updates = spark.range(10).select(col("id"),
      (col("id") % 64).as("a"), (col("id") / 64 % 64).as("b"),
      lit("CHANGED").as("uid"))
    LakeDelete.upsertLake(spark, root, updates, "id")
    assert(ZLake.read(spark, root)
      .filter(col("uid") === "CHANGED").count() == 10L)
    val snap = Snapshots.readSnapshot(spark, root, "t0")
    assert(snap.filter(col("uid") === "CHANGED").count() == 0L,
      "snapshot leaked post-snapshot values")
    assert(snap.count() == 1024L)
  }

  test("snapshot survives COMPACTION and still prunes from embedded stats") {
    val root = tmp("snap-comp")
    val table = s"$root/t"
    // clustered but over-fragmented windows (6 files > filesPerPartition),
    // so the snapshot pins a PRUNABLE layout and compaction rewrites it
    for (w <- 0 until 2)
      Sinks.zorderedWrite(corpus(2048).filter(col("id") % 2 === w),
        "a", "b", s"$table/win=$w", numFiles = 6, bits = 6)
    val before = rows(ZLake.read(spark, table))
    Snapshots.snapshot(spark, table, "pin")
    val reports = Sinks.compactLake(spark, table, "a", "b",
      filesPerPartition = 2, bits = 6)
    assert(reports.nonEmpty, "compaction did not run")
    assert(rows(ZLake.read(spark, table)) == before,
      "compaction changed live content")
    assert(rows(Snapshots.readSnapshot(spark, table, "pin")) == before,
      "snapshot broke across compaction")
    assert(trashExists(table), "compacted files should have retired")

    // pruning still works on the snapshot: a tight predicate plans a
    // strict subset of the pinned files
    val idx = Snapshots.snapshotIndex(spark, table, "pin")
    ZLake.readWith(spark, table, idx).filter(col("a") === 3).collect()
    val (kept, total) = idx.lastPrune.get()
    assert(kept >= 0 && kept < total, s"no snapshot pruning: $kept/$total")
  }

  test("compaction crash windows heal without losing snapshot or live rows") {
    // the review-caught window: with a snapshot pinned, the swap must
    // never leave a half-gutted window a rerun misreads as complete.
    // The rename-aside protocol's crash states are planted directly.
    val table = tmp("snap-crash") + "/t"
    for (w <- 0 until 2)
      Sinks.zorderedWrite(corpus(2048).filter(col("id") % 2 === w),
        "a", "b", s"$table/win=$w", numFiles = 6, bits = 6)
    val before = rows(ZLake.read(spark, table))
    Snapshots.snapshot(spark, table, "pin")
    val f = fs(table)
    val tmpRoot = new org.apache.hadoop.fs.Path(table, "_compacting")

    // state A: window moved aside, replacement never swapped in (crash
    // between the two renames with the tmp lost) — recovery must RESTORE
    f.mkdirs(tmpRoot)
    require(f.rename(new org.apache.hadoop.fs.Path(table, "win=0"),
      new org.apache.hadoop.fs.Path(tmpRoot, "win=0.old")))
    val repA = Sinks.compactLake(spark, table, "a", "b",
      filesPerPartition = 2, bits = 6)
    assert(rows(ZLake.read(spark, table)) == before,
      "restore-from-.old lost rows")
    assert(rows(Snapshots.readSnapshot(spark, table, "pin")) == before,
      "snapshot broke across the restore")
    // the SAME invocation both restores AND compacts the restored window
    assert(repA.exists(r => r.dir.endsWith("win=0") && !r.recovered),
      s"restored window missing from the compaction pass: $repA")

    // state B: swap landed but the retire pass died (.old still holds the
    // displaced originals) — recovery must finish retiring them so the
    // SNAPSHOT still resolves, while the live read serves the compacted set
    val dir = new org.apache.hadoop.fs.Path(table, "win=1")
    val old = new org.apache.hadoop.fs.Path(tmpRoot, "win=1.old")
    val twin = new org.apache.hadoop.fs.Path(tmpRoot, "win=1")
    Sinks.zorderedWrite(spark.read.parquet(dir.toString), "a", "b",
      twin.toString, 2, 6)
    require(f.rename(dir, old))
    require(f.rename(twin, dir))
    Sinks.compactLake(spark, table, "a", "b", filesPerPartition = 2,
      bits = 6)
    assert(!f.exists(old), "recovery left the .old staging behind")
    assert(rows(ZLake.read(spark, table)) == before,
      "healed swap changed live content")
    assert(rows(Snapshots.readSnapshot(spark, table, "pin")) == before,
      "snapshot lost the displaced originals")
    assert(trashExists(table), "displaced originals should have retired")
  }

  test("vacuum keeps exactly what surviving snapshots reference") {
    val root = tmp("snap-vac")
    Sinks.zorderedWrite(corpus(2048), "a", "b", root, numFiles = 8, bits = 6)
    Snapshots.snapshot(spark, root, "t0")
    LakeDelete.deleteFromLake(spark, root, col("a") < 8)
    Snapshots.snapshot(spark, root, "t1")
    LakeDelete.deleteFromLake(spark, root, col("a") < 16)
    assert(Snapshots.listSnapshots(spark, root) == Seq("t0", "t1"))

    val keepT1 = rows(Snapshots.readSnapshot(spark, root, "t1"))
    val report = Snapshots.vacuum(spark, root, keep = Seq("t1"))
    assert(report.snapshotsDropped == Seq("t0"))
    assert(Snapshots.listSnapshots(spark, root) == Seq("t1"))
    // t1 still reads exactly; t0 is gone
    assert(rows(Snapshots.readSnapshot(spark, root, "t1")) == keepT1)
    intercept[IllegalArgumentException] {
      Snapshots.readSnapshot(spark, root, "t0")
    }
    // dropping the last snapshot empties the trash entirely
    Snapshots.vacuum(spark, root, keep = Nil)
    assert(!trashExists(root), "trash should be empty after full vacuum")
    // the live lake never flinched
    assert(ZLake.read(spark, root).count() == corpus(2048)
      .filter(col("a") >= 16).count())
  }

  test("snapshot refs are CACHED across journaled mutations, invalidated " +
      "by a new snapshot") {
    // r9 verdict #6: applyJournal loaded every sidecar on every mutation —
    // O(snapshots x files) JSON parsing per merge at a 5-minute cadence.
    // The cache keys on the snapshot-dir listing, so a run of mutations
    // parses each sidecar once, and a new snapshot re-arms exactly once.
    val root = tmp("snap-cache")
    Sinks.zorderedWrite(corpus(1024), "a", "b", root, numFiles = 4, bits = 6)
    Snapshots.snapshot(spark, root, "t0")
    Snapshots.snapshot(spark, root, "t1")
    def upd(lo: Long) = spark.range(lo, lo + 5).select(col("id"),
      (col("id") % 64).as("a"), (col("id") / 64 % 64).as("b"),
      lit(s"CH$lo").as("uid"))
    // every batch updates EXISTING keys, so each mutation retires files
    // and genuinely needs the refs (all-new-key inserts never load them)
    val n0 = Snapshots.sidecarOpens.get()
    for (i <- 0 until 4)
      LakeDelete.upsertLake(spark, root, upd(i * 10L), "id")
    val opened = Snapshots.sidecarOpens.get() - n0
    assert(opened >= 2, s"mutations never loaded refs — vacuous test")
    assert(opened <= 2,
      s"4 mutations re-parsed sidecars $opened times — refs not cached")
    // a NEW snapshot changes the dir listing: the next mutation reloads
    Snapshots.snapshot(spark, root, "t2")
    val n1 = Snapshots.sidecarOpens.get()
    LakeDelete.upsertLake(spark, root, upd(100L), "id")
    assert(Snapshots.sidecarOpens.get() - n1 >= 3,
      "stale refs served after a new snapshot — t2's pins would be lost")
    // and the pinned state is still exact after all of it
    assert(Snapshots.readSnapshot(spark, root, "t0").count() == 1024L)
  }

  test("a lake without snapshots never grows a trash") {
    val root = tmp("snap-none")
    Sinks.zorderedWrite(corpus(1024), "a", "b", root, numFiles = 4, bits = 6)
    LakeDelete.deleteFromLake(spark, root, col("a") < 8)
    assert(!trashExists(root))
  }

  test("snapshot as a SQL view: USING zlake OPTIONS (snapshot ...)") {
    val root = tmp("snap-sql")
    Sinks.zorderedWrite(corpus(512), "a", "b", root, numFiles = 4, bits = 6)
    Snapshots.snapshot(spark, root, "pin")
    LakeDelete.deleteFromLake(spark, root, col("a") < 32)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW snap_pin USING zlake " +
      s"OPTIONS (path '$root', snapshot 'pin')")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW snap_live USING zlake " +
      s"OPTIONS (path '$root')")
    assert(spark.sql("SELECT count(*) FROM snap_pin").head().getLong(0) == 512L)
    assert(spark.sql("SELECT count(*) FROM snap_live").head().getLong(0) ==
      corpus(512).filter(col("a") >= 32).count())
  }

  test("immutability and guard rails") {
    val root = tmp("snap-guard")
    Sinks.zorderedWrite(corpus(256), "a", "b", root, numFiles = 2, bits = 6)
    Snapshots.snapshot(spark, root, "t0")
    intercept[IllegalArgumentException] { // tags are immutable
      Snapshots.snapshot(spark, root, "t0")
    }
    intercept[IllegalArgumentException] { // a typo must not unpin data
      Snapshots.vacuum(spark, root, keep = Seq("t-typo"))
    }
    intercept[IllegalArgumentException] { // path-shaped tags refused
      Snapshots.snapshot(spark, root, "../evil")
    }
  }

  test("timestamp as-of resolution: latest snapshot at or before the " +
      "instant, from Scala and from a SQL view") {
    val root = tmp("snap-asof")
    Sinks.zorderedWrite(corpus(512), "a", "b", root, numFiles = 2, bits = 6)
    Snapshots.snapshot(spark, root, "v0")
    Thread.sleep(10)
    LakeDelete.deleteFromLake(spark, root, col("a") < 8)
    Snapshots.snapshot(spark, root, "v1")
    Thread.sleep(10)
    LakeDelete.deleteFromLake(spark, root, col("a") < 16)
    val det = Snapshots.listSnapshotsDetailed(spark, root)
    assert(det.map(_._1) == Seq("v0", "v1"))
    val Seq((_, c0), (_, c1)) = det
    assert(Snapshots.snapshotAsOf(spark, root, c0) == Some("v0"))
    assert(Snapshots.snapshotAsOf(spark, root, (c0 + c1) / 2) == Some("v0"))
    assert(Snapshots.snapshotAsOf(spark, root, c1) == Some("v1"))
    assert(Snapshots.snapshotAsOf(spark, root,
      System.currentTimeMillis()) == Some("v1"))
    assert(Snapshots.snapshotAsOf(spark, root, c0 - 1).isEmpty)
    assert(Snapshots.readSnapshotAsOf(spark, root, c1).count() ==
      512L - 512L / 8)
    intercept[IllegalArgumentException](
      Snapshots.readSnapshotAsOf(spark, root, c0 - 1))
    // SQL spelling: snapshot_as_of with epoch millis
    spark.sql("DROP VIEW IF EXISTS snap_asof_v")
    spark.sql(s"CREATE TEMPORARY VIEW snap_asof_v USING zlake " +
      s"OPTIONS (path '$root', snapshot_as_of '$c1')")
    assert(spark.sql("SELECT count(*) FROM snap_asof_v")
      .collect()(0).getLong(0) == 512L - 512L / 8)
  }

  test("export materializes a snapshot as an independent lake: bytes, " +
      "layout, pinned vectors, and pruning all travel; the source's " +
      "later life cannot touch it") {
    import graft.sinks.DeletionVectors
    val root = tmp("snap-exp")
    Sinks.zorderedWrite(corpus(2048), "a", "b", root, numFiles = 4,
      bits = 6, bloomCols = Seq("uid"))
    // pin a state WITH live deletion vectors
    DeletionVectors.deleteMoR(spark, root, col("id").isin(5L, 100L))
    Snapshots.snapshot(spark, root, "pin")
    val want = rows(Snapshots.readSnapshot(spark, root, "pin"))
    // source moves on: more MoR deletes, then compaction rewrites files
    DeletionVectors.deleteMoR(spark, root, col("id") === 200L)
    DeletionVectors.compact(spark, root)
    LakeDelete.deleteFromLake(spark, root, col("a") < 32)

    val dest = tmp("snap-exp-dest")
    val rep = spark.sql(s"CALL graft.export('$root', 'pin', '$dest')")
      .collect()(0)
    assert(rep.getInt(0) == 4 && rep.getInt(2) == 1, rep.toString)
    // the export IS the pinned state, vectors applied
    assert(rows(ZLake.read(spark, dest)) == want)
    assert(DeletionVectors.present(spark, dest),
      "pinned vectors must travel")
    // manifests regenerated: planning the export opens no footers
    val opens0 = ZLake.footerOpens.get()
    ZLake.read(spark, dest).filter(col("a") < 8).count()
    assert(ZLake.footerOpens.get() == opens0,
      "exported lake must plan from manifests")
    // independence: vacuuming the source away leaves the export whole
    Snapshots.vacuum(spark, root, keep = Nil)
    assert(rows(ZLake.read(spark, dest)) == want)
    // and the export is a normal lake: compact materializes its vectors
    DeletionVectors.compact(spark, dest)
    assert(rows(ZLake.read(spark, dest)) == want)
    // non-empty destination refused
    intercept[IllegalArgumentException](
      Snapshots.export(spark, root, "missing-tag", dest))
  }

  test("export keeps a bucketed layout exchange-free") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-snap-bexp").toString
    val facts = Seq.tabulate(800)(i => ((i % 100).toLong, i.toLong))
      .toDF("k", "v")
    Sinks.bucketedLakeWrite(facts, Seq("k"), 4, s"$base/t")
    Snapshots.snapshot(spark, s"$base/t", "b0")
    Snapshots.export(spark, s"$base/t", "b0", s"$base/exp")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = ZLake.read(spark, s"$base/exp").groupBy("k")
        .agg(sum("v").as("sv"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = plan.collect {
        case s: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => s
        case s: org.apache.spark.sql.execution.adaptive
          .ShuffleQueryStageExec => s
      }
      assert(shuffles.isEmpty,
        s"exported bucketed lake must aggregate exchange-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("restore rolls back CoW delete + append + MoR delete in place; " +
    "later snapshots keep reading their own state") {
    val root = tmp("snap-restore")
    Sinks.zorderedWrite(corpus(4096), "a", "b", root, numFiles = 8,
      bits = 6, bloomCols = Seq("uid"))
    val v1rows = rows(ZLake.read(spark, root))
    Snapshots.snapshot(spark, root, "v1")

    LakeDelete.deleteFromLake(spark, root, col("a") < 16)
    LakeDelete.appendLake(spark, root,
      corpus(64).withColumn("id", col("id") + 900000))
    Snapshots.snapshot(spark, root, "v2")
    val v2rows = rows(ZLake.read(spark, root))
    graft.sinks.DeletionVectors.deleteMoR(spark, root, col("id") % 97 === 0)
    assert(graft.sinks.DeletionVectors.present(spark, root))

    val rep = Snapshots.restore(spark, root, "v1")
    assert(rep.filesRestored > 0, "CoW-displaced files should copy back")
    assert(rep.filesDropped > 0, "appended/rewritten files should drop")
    assert(rep.dvStoresDropped == 1, "the MoR store should roll away")
    assert(!graft.sinks.DeletionVectors.present(spark, root))
    assert(rows(ZLake.read(spark, root)) == v1rows,
      "restored live read must equal the pinned state")
    // row-level change feed v1 -> live is EMPTY (identities may differ
    // where trash copies came back; rows may not)
    assert(Snapshots.diff(spark, root, "v1", None).count() == 0L)
    // the later snapshot still reads ITS pinned state (restore retired
    // its files to trash, not to oblivion)
    assert(rows(Snapshots.readSnapshot(spark, root, "v2")) == v2rows,
      "restore broke a later snapshot")
    // the restored lake stays fully mutable
    val rep2 = LakeDelete.deleteFromLake(spark, root, col("a") >= 48)
    assert(rep2.rowsDeleted > 0)
    assert(ZLake.read(spark, root).filter(col("a") >= 48).count() == 0L)
  }

  test("restore reinstates a pinned deletion-vector generation") {
    val root = tmp("snap-restore-dv")
    Sinks.zorderedWrite(corpus(2048), "a", "b", root, numFiles = 4,
      bits = 6)
    graft.sinks.DeletionVectors.deleteMoR(spark, root, col("id") % 53 === 0)
    val dvRows = rows(ZLake.read(spark, root))
    Snapshots.snapshot(spark, root, "vdv")
    // materializing clears the store (and retires the pinned generation
    // to trash); restore must bring the vectors back
    graft.sinks.DeletionVectors.compact(spark, root)
    assert(!graft.sinks.DeletionVectors.present(spark, root))
    val rep = Snapshots.restore(spark, root, "vdv")
    assert(rep.dvStoresRestored == 1)
    assert(graft.sinks.DeletionVectors.present(spark, root))
    assert(rows(ZLake.read(spark, root)) == dvRows,
      "restored read must re-apply the pinned vectors")
  }

  test("restore crash between journal publish and apply heals to the " +
      "pinned state") {
    val root = tmp("snap-restore-crash")
    Sinks.zorderedWrite(corpus(2048), "a", "b", root, numFiles = 4,
      bits = 6)
    val pinned = rows(ZLake.read(spark, root))
    Snapshots.snapshot(spark, root, "pin")
    LakeDelete.deleteFromLake(spark, root, col("a") < 24)
    LakeDelete.journalPublishedHook.set(() =>
      throw new RuntimeException("crash: restore committed, not applied"))
    try intercept[RuntimeException](Snapshots.restore(spark, root, "pin"))
    finally LakeDelete.journalPublishedHook.set(() => ())
    // the journal is the commit point: recovery must finish the restore
    assert(LakeDelete.recover(spark, root))
    assert(rows(ZLake.read(spark, root)) == pinned,
      "healed restore must serve the pinned state")
    assert(rows(Snapshots.readSnapshot(spark, root, "pin")) == pinned)
  }

  test("group snapshot pins N lakes consistently under one tag; a " +
      "mid-group failure leaves NO tag anywhere") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-snap-group").toString
    val (r1, r2) = (s"$base/a/t", s"$base/b/t")
    Sinks.zorderedWrite(corpus(1024), "a", "b", r1, numFiles = 4, bits = 6)
    Sinks.zorderedWrite(corpus(2048).withColumn("id", col("id") + 5000),
      "a", "b", r2, numFiles = 4, bits = 6)
    val (v1, v2) = (rows(ZLake.read(spark, r1)), rows(ZLake.read(spark, r2)))
    val r = spark.sql(s"CALL graft.snapshot_all('g0', '$r1', '$r2')")
      .collect()
    assert(r.head.getAs[Int]("tables") == 2)
    LakeDelete.deleteFromLake(spark, r1, col("a") < 16)
    LakeDelete.deleteFromLake(spark, r2, col("a") >= 48)
    assert(rows(Snapshots.readSnapshot(spark, r1, "g0")) == v1)
    assert(rows(Snapshots.readSnapshot(spark, r2, "g0")) == v2)
    // GROUP restore: both tables roll back under held locks (the deletes
    // here align with whole z-order envelopes, so the damage is pure
    // file DROPS — restore COPIES those back and drops nothing)
    val reps = Snapshots.restoreTables(spark, Seq(r1, r2), "g0")
    assert(reps(r1).filesRestored > 0 && reps(r2).filesRestored > 0)
    assert(rows(ZLake.read(spark, r1)) == v1)
    assert(rows(ZLake.read(spark, r2)) == v2)

    // precheck: a tag missing on ONE table fails with ZERO tables
    // touched — damage r1, then group-restore to a tag r2 lacks
    Snapshots.snapshot(spark, r1, "only1")
    LakeDelete.deleteFromLake(spark, r1, col("a") < 8)
    val damaged = rows(ZLake.read(spark, r1))
    intercept[IllegalArgumentException](
      Snapshots.restoreTables(spark, Seq(r1, r2), "only1"))
    assert(rows(ZLake.read(spark, r1)) == damaged,
      "a failed group precheck must not have touched any table")

    // mid-group failure: the tag pre-exists on the LATER root in lock
    // order, so the first pin lands then the second refuses — the
    // rollback must retract the first
    Snapshots.snapshot(spark, r2, "g1")
    intercept[IllegalArgumentException](
      Snapshots.snapshotTables(spark, Seq(r1, r2), "g1"))
    assert(!Snapshots.listSnapshots(spark, r1).contains("g1"),
      "mid-group failure must retract already-written tags")
  }

  test("restore is a no-op on an unchanged lake; SQL spelling works") {
    val root = tmp("snap-restore-noop")
    Sinks.zorderedWrite(corpus(1024), "a", "b", root, numFiles = 4,
      bits = 6)
    Snapshots.snapshot(spark, root, "v1")
    val rep = Snapshots.restore(spark, root, "v1")
    assert(rep.filesRestored == 0 && rep.filesDropped == 0 &&
      rep.dvStoresRestored == 0 && rep.dvStoresDropped == 0)
    assert(rep.filesKept == 4)
    // the SQL verb: CALL graft.restore after a delete
    val before = rows(ZLake.read(spark, root))
    LakeDelete.deleteFromLake(spark, root, col("a") < 8)
    val r = spark.sql(s"CALL graft.restore('$root', 'v1')").collect()
    assert(r.head.getAs[Int]("files_restored") > 0)
    assert(rows(ZLake.read(spark, root)) == before)
    // unknown tag fails loud
    val e = intercept[IllegalArgumentException] {
      Snapshots.restore(spark, root, "nope")
    }
    assert(e.getMessage.contains("no snapshot"))
  }
}
