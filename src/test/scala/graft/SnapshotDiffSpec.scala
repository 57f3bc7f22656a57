package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.Snapshots

/** [[Snapshots.diff]]: the snapshot-derived change feed. File-identity
  * delta plans only changed files; rowLevel cancels copy-on-write
  * carry-over so an upsert reports exactly its touched keys. */
class SnapshotDiffSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def buildLake(root: String, n: Int = 1000): Unit = {
    val base = spark.range(n).select(col("id"),
      (col("id") % 64).as("a"), (col("id") * 7 % 64).as("b"),
      concat(lit("v0-"), col("id")).as("v"))
    for (w <- 0 to 1)
      Sinks.zorderedWrite(base.filter(col("id") % 2 === w),
        "a", "b", s"$root/win=$w", numFiles = 4, bits = 6,
        bloomCols = Seq("id"))
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec =>
      f.metrics.get("numFiles").map(_.value).getOrElse(0L)
    }.sum
  }

  test("append-only diff reports the new rows as inserts, scans only them") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sdiff-app").toString + "/t"
    buildLake(root)
    Snapshots.snapshot(spark, root, "v1")
    Sinks.zorderedWrite(
      spark.range(1000, 1200).select(col("id"), (col("id") % 64).as("a"),
        (col("id") * 7 % 64).as("b"),
        concat(lit("v0-"), col("id")).as("v")),
      "a", "b", s"$root/win=2", numFiles = 2, bits = 6,
      bloomCols = Seq("id"))
    val d = Snapshots.diff(spark, root, "v1", rowLevel = false)
    val rows = d.select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length === 200)
    assert(rows.forall(_._2 == "insert"))
    assert(rows.map(_._1).sorted.toSeq === (1000L until 1200L))
    // only the appended files plan into the scan (8 v1 files untouched)
    assert(scannedFiles(Snapshots.diff(spark, root, "v1", rowLevel = false))
      === 2L)
  }

  test("rowLevel diff of an upsert reports exactly the touched keys") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sdiff-ups").toString + "/t"
    buildLake(root)
    Snapshots.snapshot(spark, root, "v1")
    val updates = spark.range(0, 1000, 101).select(col("id"),
      (col("id") % 64).as("a"), (col("id") * 7 % 64).as("b"),
      concat(lit("v1-"), col("id")).as("v"),
      (col("id") % 2).cast("string").as("win"))
      .unionByName(Seq((5000L, 5L, 6L, "new-5000", "0"))
        .toDF("id", "a", "b", "v", "win"))
    LakeDelete.upsertLake(spark, root, updates, "id")
    Snapshots.snapshot(spark, root, "v2")

    val d = Snapshots.diff(spark, root, "v1", Some("v2"))
      .select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val touched = (0L until 1000L by 101).toSet
    val expected =
      touched.map(k => (k, s"v0-$k", "delete")) ++
        touched.map(k => (k, s"v1-$k", "insert")) + ((5000L, "new-5000", "insert"))
    assert(d === expected, "CoW carry-over rows must cancel")

    // file-level (rowLevel=false) reports whole rewritten files instead
    val fl = Snapshots.diff(spark, root, "v1", Some("v2"), rowLevel = false)
    assert(fl.count() > d.size)
  }

  test("diff against the LIVE state tracks a delete") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sdiff-del").toString + "/t"
    buildLake(root)
    Snapshots.snapshot(spark, root, "v1")
    LakeDelete.deleteFromLake(spark, root, col("a") < 8)
    val d = Snapshots.diff(spark, root, "v1")
    val rows = d.select("id", "a", "_change_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.forall(_._3 == "delete"))
    assert(rows.forall(_._2 < 8))
    assert(rows.map(_._1).toSet ===
      (0L until 1000L).filter(_ % 64 < 8).toSet)
  }

  test("identical states diff to empty; both orders work") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sdiff-id").toString + "/t"
    buildLake(root, n = 200)
    Snapshots.snapshot(spark, root, "v1")
    Snapshots.snapshot(spark, root, "v2")
    assert(Snapshots.diff(spark, root, "v1", Some("v2")).count() === 0)
    assert(Snapshots.diff(spark, root, "v2", Some("v1")).count() === 0)
    assert(Snapshots.diff(spark, root, "v1").count() === 0)
    // the reverse direction of a real change flips insert/delete
    Sinks.zorderedWrite(
      spark.range(200, 210).select(col("id"), (col("id") % 64).as("a"),
        (col("id") * 7 % 64).as("b"),
        concat(lit("v0-"), col("id")).as("v")),
      "a", "b", s"$root/win=2", numFiles = 1, bits = 6)
    Snapshots.snapshot(spark, root, "v3")
    val fwd = Snapshots.diff(spark, root, "v1", Some("v3"))
    val rev = Snapshots.diff(spark, root, "v3", Some("v1"))
    assert(fwd.filter(col("_change_type") === "insert").count() === 10)
    assert(rev.filter(col("_change_type") === "delete").count() === 10)
  }
}
