package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.{Snapshots, ZLake}

/** Keyed change feed ([[Snapshots.diffKeyed]]): the row-level snapshot
  * diff classified per key into the Delta CDF vocabulary — insert /
  * delete / update_preimage / update_postimage — with fail-loud
  * duplicate-key detection and unchanged-row suppression. */
class DiffKeyedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def buildLake(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-cdf").toString + "/t"
    val src = spark.range(64).select(
      col("id"), (col("id") % 16).as("a"), (col("id") * 3).as("v"))
    for (w <- 0 to 1)
      Sinks.zorderedWrite(src.filter(col("id") % 2 === w),
        "a", "v", s"$root/win=$w", numFiles = 2, bits = 5,
        bloomCols = Seq("id"))
    root
  }

  test("upsert between snapshots classifies into pre/post images, " +
      "inserts, and deletes; untouched keys emit nothing") {
    val root = buildLake()
    Snapshots.snapshot(spark, root, "v0")
    // change key 5 (update), add key 1000 (insert), drop key 7 (delete)
    val upd = Seq((5L, 5L, 777L), (1000L, 8L, 1L)).toDF("id", "a", "v")
      .withColumn("win", (col("id") % 2).cast("string"))
    LakeDelete.upsertLake(spark, root, upd, "id")
    LakeDelete.deleteFromLake(spark, root, col("id") === 7L)
    Snapshots.snapshot(spark, root, "v1")

    val feed = Snapshots.diffKeyed(spark, root, "id", "v0", Some("v1"))
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(feed == Set(
      (5L, 15L, "update_preimage"),
      (5L, 777L, "update_postimage"),
      (1000L, 1L, "insert"),
      (7L, 21L, "delete")),
      s"got $feed")
  }

  test("a CoW rewrite that moves rows between files without changing " +
      "them emits no events") {
    val root = buildLake()
    Snapshots.snapshot(spark, root, "v0")
    // delete a key from win=0: the rewrite re-files its neighbors
    LakeDelete.deleteFromLake(spark, root, col("id") === 4L)
    val feed = Snapshots.diffKeyed(spark, root, "id", "v0", None).collect()
    assert(feed.length == 1 && feed(0).getAs[String]("_change_type")
      == "delete", feed.mkString(","))
  }

  test("duplicate keys within a state raise instead of fabricating pairs") {
    val root = buildLake()
    Snapshots.snapshot(spark, root, "v0")
    // append TWO rows with the same key — a multiset state
    LakeDelete.appendLake(spark, root,
      Seq((5000L, 1L, 1L), (5000L, 1L, 2L)).toDF("id", "a", "v")
        .withColumn("win", lit("0")))
    val e = intercept[IllegalArgumentException](
      Snapshots.diffKeyed(spark, root, "id", "v0", None).collect())
    assert(e.getMessage.contains("not unique"))
    // the multiset-honest diff still works
    val raw = Snapshots.diff(spark, root, "v0", None)
    assert(raw.filter(col("id") === 5000L).count() == 2)
  }
}
