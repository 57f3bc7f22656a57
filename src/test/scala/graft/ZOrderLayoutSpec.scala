package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Functions => F, Kernels}
import graft.sinks.Sinks

/** Z-order clustered layout: the Morton kernel itself, and the measured
  * pruning benefit — per-file min/max envelopes must be tight on BOTH
  * interleaved columns, which is exactly the statistic parquet row-group
  * skipping and file pruning consume. */
class ZOrderLayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zorder2 kernel: bit interleave, monotone in quadrants, SQL parity") {
    assert(Kernels.zorder2(0L, 0L, 8) == 0L)
    assert(Kernels.zorder2(1L, 0L, 8) == 1L)   // a -> even bits
    assert(Kernels.zorder2(0L, 1L, 8) == 2L)   // b -> odd bits
    assert(Kernels.zorder2(3L, 3L, 8) == 15L)
    assert(Kernels.zorder2(255L, 255L, 8) == 65535L)
    // quadrant order: all of [0,128)^2 sorts before any of [128,256)^2
    assert(Kernels.zorder2(127L, 127L, 8) < Kernels.zorder2(128L, 128L, 8))
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT graft_zorder2(5, 9, 8) AS z").head().getLong(0)
    assert(viaSql == Kernels.zorder2(5L, 9L, 8))
  }

  test("z-ordered files have tight min/max envelopes on BOTH columns") {
    // uniform grid over (a, b) in [0, 256)^2 — the adversarial case for a
    // single-column sort, which leaves the second column's envelope at the
    // full range in every file
    val n = 1 << 16
    val df = spark.range(n.toLong)
      .withColumn("r", F.hash60(col("id").cast("string"))) // shuffle row order
      .select((col("id") % 256).as("a"), (col("id") / 256 % 256).as("b"), col("r"))
      .orderBy("r").drop("r")
    val files = 16
    val zPath = java.nio.file.Files.createTempDirectory("graft-z").toString + "/z"
    val sPath = java.nio.file.Files.createTempDirectory("graft-z").toString + "/s"
    Sinks.zorderedWrite(df, "a", "b", zPath, files, bits = 8)
    // the comparison layout: same file count, sorted by a alone
    df.repartitionByRange(files, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(sPath)

    /** mean per-file (max-min) envelope width of `c`, normalized to [0,1]. */
    def meanWidth(path: String, c: String): Double = {
      val widths = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("w"))
        .select(avg(col("w"))).head().getDouble(0)
      widths / 255.0
    }
    val (za, zb) = (meanWidth(zPath, "a"), meanWidth(zPath, "b"))
    val (sa, sb) = (meanWidth(sPath, "a"), meanWidth(sPath, "b"))
    info(f"zorder envelopes: a=$za%.3f b=$zb%.3f; single-sort: a=$sa%.3f b=$sb%.3f")
    // single-column sort: 'a' razor-thin, 'b' useless (full range)
    assert(sa < 0.15 && sb > 0.9)
    // z-order: BOTH columns' envelopes far below full range -> predicates
    // on either column skip most files/row groups
    assert(za < 0.5 && zb < 0.5,
      f"z-order envelopes not tight: a=$za%.3f b=$zb%.3f")
  }
}
