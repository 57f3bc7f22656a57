package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Kernels
import graft.sinks.Sinks
import graft.sources.ZLake

/** Hilbert-curve clustering ([[Kernels.hilbert2]], [[Sinks.hilbertWrite]]):
  * the index must be the real Hilbert curve (bijective AND continuous —
  * continuity is what z-order lacks and what buys tighter file
  * envelopes), and the layout must EARN its existence on the lake: same
  * data, same box predicate, measured kept-file counts vs z-order. */
class HilbertLayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hilbert2 is a bijection onto [0, 4^bits) for small grids") {
    for (bits <- 1 to 5) {
      val n = 1 << bits
      val ds = for (x <- 0 until n; y <- 0 until n)
        yield Kernels.hilbert2(x, y, bits)
      assert(ds.toSet.size === n * n, s"not injective at bits=$bits")
      assert(ds.min === 0L && ds.max === (n.toLong * n - 1),
        s"not onto at bits=$bits")
    }
  }

  test("consecutive hilbert indices are always grid neighbors") {
    val bits = 5
    val n = 1 << bits
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield Kernels.hilbert2(x, y, bits) -> ((x, y))).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"curve jumped: ($x1,$y1) -> ($x2,$y2)")
    }
    // the defining contrast: z-order DOES jump (quadrant seams)
    val zByD = (for (x <- 0 until n; y <- 0 until n)
      yield Kernels.zorder2(x, y, bits) -> ((x, y))).sortBy(_._1).map(_._2)
    val zJumps = zByD.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0, "control failed: z-order showed no seams")
  }

  test("SQL surface: graft_hilbert2 matches the kernel") {
    val got = spark.range(100)
      .select(expr("graft_hilbert2(id % 10, id / 10, 4)").as("h"))
      .as[Long].collect()
    val want = (0 until 100).map(i => Kernels.hilbert2(i % 10, i / 10, 4))
    assert(got.toSeq === want)
  }

  private def keptFiles(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case f: FileSourceScanExec =>
      f.metrics.get("numFiles").map(_.value).getOrElse(0L)
    }.sum
  }

  test("hilbert lake reads correctly and prunes at least as well on box corners") {
    // uniform 256x256 grid — the layout-neutral adversarial density
    val data = spark.range(65536).select(
      (col("id") % 256).as("a"),
      floor(col("id") / 256).cast("long").as("b"),
      (col("id") * 31 % 9973).as("v"))
    val zRoot = java.nio.file.Files
      .createTempDirectory("graft-hil-z").toString + "/t"
    val hRoot = java.nio.file.Files
      .createTempDirectory("graft-hil-h").toString + "/t"
    Sinks.zorderedWrite(data, "a", "b", zRoot, numFiles = 16, bits = 8)
    Sinks.hilbertWrite(data, "a", "b", hRoot, numFiles = 16, bits = 8)

    // correctness first: identical rows through either layout, filtered
    // and unfiltered
    def canon(df: DataFrame) = df.select("a", "b", "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(canon(ZLake.read(spark, hRoot)) === canon(data.toDF()))
    val box = (d: DataFrame) =>
      d.filter(col("a").between(16, 47) && col("b").between(16, 47))
    assert(canon(box(ZLake.read(spark, hRoot))) === canon(box(data.toDF())))

    // measured pruning: average kept files over corner/edge/center boxes.
    // Hilbert's continuity must not LOSE to the Morton seams overall.
    val boxes = Seq((16, 47, 16, 47), (200, 231, 200, 231),
      (112, 143, 112, 143), (0, 31, 224, 255), (96, 159, 96, 159))
    def avgKept(root: String): Double = boxes.map { case (a1, a2, b1, b2) =>
      keptFiles(ZLake.read(spark, root)
        .filter(col("a").between(a1, a2) && col("b").between(b1, b2)))
    }.sum.toDouble / boxes.size
    val zKept = avgKept(zRoot)
    val hKept = avgKept(hRoot)
    info(f"avg kept files over ${boxes.size} boxes: z-order $zKept%.1f, hilbert $hKept%.1f (16 files)")
    assert(hKept <= zKept + 0.5,
      f"hilbert layout prunes worse than z-order: $hKept%.1f vs $zKept%.1f")
  }
}
