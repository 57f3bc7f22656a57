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

    // guards: CoW mutations, snapshot, SQL relation, tail, sketches
    intercept[IllegalArgumentException](
      LakeDelete.deleteFromLake(spark, root, col("id") === 1L))
    intercept[IllegalArgumentException](
      LakeDelete.updateLake(spark, root, Seq("u" -> lit(0L)), col("a") < 2))
    intercept[IllegalArgumentException](
      LakeDelete.upsertLake(spark, root,
        Seq((1L, 1L, 7L, 1L)).toDF("id", "a", "b", "u")
          .withColumn("win", lit("1")), "id"))
    intercept[IllegalArgumentException](
      Snapshots.snapshot(spark, root, "nope"))
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
}
