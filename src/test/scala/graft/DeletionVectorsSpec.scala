package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{DeletionVectors, LakeDelete, Sinks}
import graft.sources.{Snapshots, ZLake}

/** Merge-on-read deletes ([[DeletionVectors]]): point deletes record
  * per-file row positions instead of rewriting files, reads merge them
  * out, repeated/overlapping deletes compose, compact materializes and
  * clears, crashes heal through the shared journal, and every
  * DV-incompatible capability refuses loudly until compaction. */
class DeletionVectorsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val n = 1024

  private def buildLake(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-dv").toString + "/t"
    val src = spark.range(n).select(
      col("id"), (col("id") % 64).as("a"),
      (col("id") * 7 % 64).as("b"), (col("id") % 97).as("u"))
    for (w <- 0 to 1)
      Sinks.zorderedWrite(src.filter(col("id") % 2 === w),
        "a", "b", s"$root/win=$w", numFiles = 4, bits = 6,
        bloomCols = Seq("id"), sumCols = Seq("u"),
        sketchCols = Seq("u"), sketchM = 64)
    root
  }

  private def fileSnap(root: String): Map[String, (Long, Long)] =
    ZLake.envelopes(spark, root).map(fe =>
      fe.status.getPath.toString ->
        (fe.status.getLen, fe.status.getModificationTime)).toMap

  private def ids(root: String): Set[Long] =
    ZLake.read(spark, root).select("id").as[Long].collect().toSet

  test("a point delete touches ZERO data files; reads merge the vectors " +
      "out; overlapping re-delete is a counted no-op") {
    val root = buildLake()
    val before = fileSnap(root)
    val victims = Seq(3L, 97L, 500L, 983L)
    val rep = DeletionVectors.deleteMoR(spark, root,
      col("id").isin(victims: _*))
    assert(rep.rowsDeleted == 4L, rep.toString)
    assert(fileSnap(root) == before,
      "merge-on-read delete must not rewrite any data file")
    assert(ids(root) == (0L until n).toSet -- victims)
    // overlapping second delete: only the new victim counts
    val rep2 = DeletionVectors.deleteMoR(spark, root,
      col("id").isin(3L, 97L, 700L))
    assert(rep2.rowsDeleted == 1L, rep2.toString)
    assert(ids(root) == (0L until n).toSet -- victims - 700L)
    assert(fileSnap(root) == before)
    // aggregates through the merged read are exact
    val got = ZLake.read(spark, root).agg(sum("u")).collect()(0).getLong(0)
    val want = (0L until n).filterNot((victims :+ 700L).contains)
      .map(_ % 97).sum
    assert(got == want)
  }

  test("compact materializes the vectors: only DV-bearing files rewrite, " +
      "the store clears, and every guarded capability reopens") {
    val root = buildLake()
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    DeletionVectors.deleteMoR(spark, root, col("id") === 42L)
    assert(DeletionVectors.present(spark, root))

    // guards: CoW mutations, SQL relation, tail, sketches (snapshots
    // COMPOSE since r11 — they pin the DV store generation)
    intercept[IllegalArgumentException](
      LakeDelete.deleteFromLake(spark, root, col("id") === 1L))
    intercept[IllegalArgumentException](
      LakeDelete.updateLake(spark, root, Seq("u" -> lit(0L)), col("a") < 2))
    intercept[IllegalArgumentException](
      LakeDelete.upsertLake(spark, root,
        Seq((1L, 1L, 7L, 1L)).toDF("id", "a", "b", "u")
          .withColumn("win", lit("1")), "id"))
    intercept[Exception] {
      spark.sql("DROP VIEW IF EXISTS dv_guard")
      spark.sql(s"CREATE TEMPORARY VIEW dv_guard USING zlake " +
        s"OPTIONS (path '$root')")
      spark.sql("SELECT count(*) FROM dv_guard").collect()
    }
    assert(ZLake.approxDistinct(spark, root, "u", Nil).isEmpty,
      "manifest sketches must refuse a DV-bearing lake")

    // appends still compose
    val app = LakeDelete.appendLake(spark, root,
      Seq((5000L, 1L, 7L, 3L)).toDF("id", "a", "b", "u")
        .withColumn("win", lit("0")))
    assert(app.rowsInserted == 1)
    assert(!ids(root).contains(42L) && ids(root).contains(5000L))

    val untouched = fileSnap(root).filterNot { case (p, _) =>
      // the file that held id=42 will rewrite; appended file is new
      false
    }
    val rep = DeletionVectors.compact(spark, root)
    assert(rep.rowsDropped == 1L && rep.filesRewritten >= 1, rep.toString)
    assert(!DeletionVectors.present(spark, root), "store not cleared")
    assert(ids(root) == (0L until n).toSet - 42L + 5000L)
    // guarded capabilities reopen
    Snapshots.snapshot(spark, root, "after")
    assert(ZLake.approxDistinct(spark, root, "u", Nil).nonEmpty)
    val del = LakeDelete.deleteFromLake(spark, root, col("id") === 5000L)
    assert(del.rowsDeleted == 1L)
    val _ = untouched
  }

  test("a crash between journal publish and apply heals: the DV store " +
      "swap is exactly-once") {
    val root = buildLake()
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    DeletionVectors.deleteMoR(spark, root, col("id") === 7L)
    LakeDelete.journalPublishedHook.set(() =>
      throw new RuntimeException("crash: committed, not applied"))
    try intercept[RuntimeException](
      DeletionVectors.deleteMoR(spark, root, col("id") === 9L))
    finally LakeDelete.journalPublishedHook.set(() => ())
    // journal is durable; recovery completes the committed second delete
    assert(LakeDelete.recover(spark, root))
    assert(ids(root) == (0L until n).toSet -- Seq(7L, 9L))
    // exactly one store file remains (old one dropped, new one in)
    val dvDir = new Path(root, "_graft_dv")
    assert(fs.listStatus(dvDir)
      .count(_.getPath.getName.endsWith(".parquet")) == 1)
  }

  test("bulk predicates fail fast toward copy-on-write; zero-match is a " +
      "clean no-op; the metadata-agg rule keeps the scan on DV lakes") {
    val root = buildLake()
    val e = intercept[IllegalArgumentException](
      DeletionVectors.deleteMoR(spark, root, col("a") >= 0,
        maxPositions = 100))
    assert(e.getMessage.contains("bulk"))
    assert(!DeletionVectors.present(spark, root))
    val rep = DeletionVectors.deleteMoR(spark, root, col("id") === -5L)
    assert(rep.rowsDeleted == 0L && !DeletionVectors.present(spark, root))

    DeletionVectors.deleteMoR(spark, root, col("id") === 11L)
    // metadata-only count would overcount by the deleted row: the
    // ManifestAggs guard must keep the scan, and the scan must be right
    val cnt = ZLake.read(spark, root).groupBy("win").count()
      .agg(sum("count")).collect()(0).getLong(0)
    assert(cnt == n - 1L)
  }

  private def snapIds(root: String, tag: String): Set[Long] =
    Snapshots.readSnapshot(spark, root, tag)
      .select("id").as[Long].collect().toSet

  test("snapshots pin the DV store GENERATION: a pre-delete snapshot " +
      "keeps including MoR-deleted rows, a mid-delete snapshot excludes " +
      "exactly its own vectors — across later deletes, compact, vacuum") {
    val root = buildLake()
    val all = (0L until n).toSet
    Snapshots.snapshot(spark, root, "v0")
    DeletionVectors.deleteMoR(spark, root, col("id").isin(10L, 20L))
    assert(ids(root) == all -- Set(10L, 20L))
    assert(snapIds(root, "v0") == all,
      "pre-delete snapshot must not see later vectors")
    // a snapshot taken WHILE vectors are live pins that generation
    Snapshots.snapshot(spark, root, "v1")
    DeletionVectors.deleteMoR(spark, root, col("id") === 30L)
    assert(snapIds(root, "v1") == all -- Set(10L, 20L),
      "mid-delete snapshot must pin its own store, not the grown one")
    assert(snapIds(root, "v0") == all)
    // compact retires the DV-bearing files AND the store to trash; both
    // snapshots still resolve byte-exactly
    val rep = DeletionVectors.compact(spark, root)
    assert(rep.rowsDropped == 3L)
    assert(ids(root) == all -- Set(10L, 20L, 30L))
    assert(snapIds(root, "v0") == all)
    assert(snapIds(root, "v1") == all -- Set(10L, 20L))
    // vacuum to v1 only: v1 keeps resolving, v0 is gone
    Snapshots.vacuum(spark, root, Seq("v1"))
    assert(snapIds(root, "v1") == all -- Set(10L, 20L))
    intercept[IllegalArgumentException](
      Snapshots.readSnapshot(spark, root, "v0"))
  }

  test("diff/diffKeyed see MoR deletes: rows entering the vectors " +
      "between two states surface as deletes, never silently vanish") {
    val root = buildLake()
    Snapshots.snapshot(spark, root, "v0")
    DeletionVectors.deleteMoR(spark, root, col("id").isin(5L, 15L, 25L))
    // v0 → live: the three MoR-deleted rows, as deletes, nothing else —
    // no file identity changed, so this exercises the common-file lane
    val d = Snapshots.diff(spark, root, "v0", None)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(d == Set(5L -> "delete", 15L -> "delete", 25L -> "delete"))
    val k = Snapshots.diffKeyed(spark, root, "id", "v0", None)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(k == Set(5L -> "delete", 15L -> "delete", 25L -> "delete"))
    // v1 (pinned mid-state) → live after a further delete: only the new
    // victim surfaces; the already-deleted three cancel (both states'
    // vectors applied to their own sides)
    Snapshots.snapshot(spark, root, "v1")
    DeletionVectors.deleteMoR(spark, root, col("id") === 35L)
    val d2 = Snapshots.diff(spark, root, "v1", None)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(d2 == Set(35L -> "delete"))
    // and across compact (identities change; exceptAll cancels the moves)
    DeletionVectors.compact(spark, root)
    val d3 = Snapshots.diff(spark, root, "v1", None)
      .select(col("id"), col("_change_type")).as[(Long, String)]
      .collect().toSet
    assert(d3 == Set(35L -> "delete"))
  }

  test("SQL snapshot views judge their PINNED vector generation: a " +
      "vector-free snapshot serves through live DVs, a vector-pinning " +
      "one refuses") {
    val root = buildLake()
    Snapshots.snapshot(spark, root, "clean")
    DeletionVectors.deleteMoR(spark, root, col("id") === 99L)
    Snapshots.snapshot(spark, root, "dirty") // pins the live vectors
    // live view refuses while vectors exist
    intercept[Exception] {
      spark.sql("DROP VIEW IF EXISTS dv_live")
      spark.sql(s"CREATE TEMPORARY VIEW dv_live USING zlake " +
        s"OPTIONS (path '$root')")
      spark.sql("SELECT count(*) FROM dv_live").collect()
    }
    // the vector-free snapshot is a valid SQL view regardless
    spark.sql("DROP VIEW IF EXISTS dv_snap_clean")
    spark.sql(s"CREATE TEMPORARY VIEW dv_snap_clean USING zlake " +
      s"OPTIONS (path '$root', snapshot 'clean')")
    assert(spark.sql("SELECT count(*) AS n FROM dv_snap_clean")
      .collect()(0).getLong(0) == n.toLong)
    // the vector-pinning snapshot refuses — a BaseRelation cannot carry
    // the merge-out anti-join, and serving raw files would resurrect 99
    val e = intercept[Exception] {
      spark.sql("DROP VIEW IF EXISTS dv_snap_dirty")
      spark.sql(s"CREATE TEMPORARY VIEW dv_snap_dirty USING zlake " +
        s"OPTIONS (path '$root', snapshot 'dirty')")
      spark.sql("SELECT count(*) FROM dv_snap_dirty").collect()
    }
    assert(e.getMessage.contains("pins merge-on-read"), e.getMessage)
    // ... while the Scala read applies them
    assert(Snapshots.readSnapshot(spark, root, "dirty").count() ==
      n.toLong - 1L)
  }

  test("vectors key by RELATIVE PATH: an externally written Hive lake " +
      "with the SAME file name in two partition dirs deletes only the " +
      "targeted file's positions") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-dv-dup").toString + "/t"
    // one task writing a partitionBy emits the SAME part file name under
    // every partition dir it touches — the advisor's collision scenario
    spark.range(100)
      .select(col("id"), (col("id") % 2).cast("string").as("win"))
      .coalesce(1)
      .write.partitionBy("win").parquet(root)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new Path(root, "win=0")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(names.nonEmpty && names == fs.listStatus(new Path(root, "win=1"))
      .toSeq.map(_.getPath.getName).filter(_.endsWith(".parquet")),
      "fixture must reproduce the duplicate-name layout")
    // delete one even id (lives in win=0); the same-position row of
    // win=1 must survive
    val rep = DeletionVectors.deleteMoR(spark, root, col("id") === 42L)
    assert(rep.rowsDeleted == 1L, rep.toString)
    assert(ids(root) == (0L until 100L).toSet - 42L,
      "a name-keyed vector would also delete win=1 rows at the position")
  }
}
