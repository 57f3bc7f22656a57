package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Batched manifest repair across dirs with DIFFERENT stats layouts — the
  * branch where repairDirManifests groups fresh files by inferred layout
  * and runs the per-layout stats jobs CONCURRENTLY (r16: the jobs are
  * independent — disjoint file sets — and the driver-side footer harvest
  * overlaps them on a future). The assertions pin the merge of both
  * concurrency seams: every fresh file must come out with ITS dir's
  * layout (bloom vs sketch), exact stats, and a fresh footer envelope. */
class ManifestRepairLayoutsSpec extends AnyFunSuite with SparkSpec {

  private val m = 64

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  /** Drop one extra parquet file (not manifest-covered) into `dir`. */
  private def addFreshFile(dir: String,
                           df: org.apache.spark.sql.DataFrame): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(dir).getFileSystem(conf)
    val part = fs.listStatus(new Path(stage)).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet")).get
    val target = new Path(dir, s"part-fresh-${part.getName}")
    require(fs.rename(part, target), "could not plant fresh file")
  }

  test("two dirs, two layouts: one batched repair keeps each dir's stats lane") {
    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id"), (col("id") % 16).as("a"),
        (col("id") % 7).as("b"), (col("id") % 50).cast("string").as("uid"))

    val bloomDir = tmp("repair-bloom")
    Sinks.zorderedWrite(rows(0, 4000), "a", "b", bloomDir, 2, bits = 4,
      bloomCols = Seq("uid"))
    val sketchDir = tmp("repair-sketch")
    Sinks.zorderedWrite(rows(0, 4000), "a", "b", sketchDir, 2, bits = 4,
      sketchCols = Seq("uid"), sketchM = m)
    val bloomBefore = ZLake.envelopes(spark, bloomDir).size
    val sketchBefore = ZLake.envelopes(spark, sketchDir).size

    addFreshFile(bloomDir, rows(4000, 6000))
    addFreshFile(sketchDir, rows(4000, 6000))

    ZLake.repairDirManifests(spark,
      Seq(new Path(bloomDir), new Path(sketchDir)))

    // every file of each dir is manifest-covered with ITS layout's stats
    val bloomEnvs = ZLake.envelopes(spark, bloomDir)
    assert(bloomEnvs.size == bloomBefore + 1)
    assert(bloomEnvs.forall(_.blooms.get("uid").exists(_.length > 1)))
    assert(bloomEnvs.forall(_.sketches.isEmpty))
    val sketchEnvs = ZLake.envelopes(spark, sketchDir)
    assert(sketchEnvs.size == sketchBefore + 1)
    assert(sketchEnvs.forall(_.sketches.get("uid").exists(_.length == m)))
    assert(sketchEnvs.forall(_.blooms.isEmpty))

    // the fresh files' envelopes carry real footer-harvested row counts
    assert(bloomEnvs.exists(_.rows == 2000L))
    assert(sketchEnvs.exists(_.rows == 2000L))

    // sketch lane stays EXACT through the repair: the repaired dir's
    // estimate equals a FRESHLY-written (same rows, same layout) dir's —
    // register merge across old + fresh files is exact, so any formula
    // branch gives the same answer on both
    val refDir = tmp("repair-ref")
    Sinks.zorderedWrite(rows(0, 6000), "a", "b", refDir, 3, bits = 4,
      sketchCols = Seq("uid"), sketchM = m)
    val got = ZLake.approxDistinct(spark, sketchDir, "uid").get
    val want = ZLake.approxDistinct(spark, refDir, "uid").get
    assert(got.filesUsed == sketchBefore + 1 &&
      got.filesUsed == got.filesTotal)
    assert(got.estimate == want.estimate,
      s"${got.estimate} != ${want.estimate}")

    // no rows lost or duplicated by the repair
    assert(spark.read.parquet(bloomDir).count() == 6000L)
    assert(spark.read.parquet(sketchDir).count() == 6000L)
  }
}
