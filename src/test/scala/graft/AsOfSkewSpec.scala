package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Hot-key hardening of the as-of join: `asOfSkewed` must return exactly
  * `asOf`'s rows for every direction/tolerance/bucket width (the stitched
  * prefix-scan is an execution detail, not a semantics change), while
  * splitting one hot key's timeline across many window partitions. */
class AsOfSkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(Long, Long, Long)], names: (String, String, String))
      : DataFrame =
    rows.toDF(names._1, names._2, names._3)

  private def canon(df: DataFrame): Set[(Long, Long, Option[Long], Option[Long])] =
    df.select(col("k"), col("lid"), col("asof.rid"), col("asof.ts"))
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet

  test("asOfSkewed == asOf: every direction x tolerance x bucket width") {
    val rnd = new scala.util.Random(91L)
    val lefts = mk(Seq.tabulate(400)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, 10L + i)),
      ("k", "ts", "lid"))
    val rights = mk(Seq.tabulate(500)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, 1000L + i)),
      ("k", "ts", "rid"))
    for {
      direction <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)
      tol <- Seq(None, Some(50L))
      width <- Seq(1L, 64L, 10000L) // width > range == the unstitched plan
    } {
      val plain = canon(AsOfJoin.asOf(
        lefts, rights, Seq("k"), "ts", "rid", Seq("rid"), tol, direction))
      val skewed = canon(AsOfJoin.asOfSkewed(
        lefts, rights, Seq("k"), "ts", "rid", Seq("rid"), width, tol, direction))
      assert(skewed == plain,
        s"asOfSkewed diverged: direction=$direction tol=$tol width=$width")
    }
  }

  test("a 90%-hot key spreads across buckets and still matches exactly") {
    val rnd = new scala.util.Random(17L)
    // 90% of rows on key 0 — the asOf window serializes all of them
    def key() = if (rnd.nextInt(10) < 9) 0L else 1L + rnd.nextInt(3)
    val n = 30000
    val lefts = mk(Seq.tabulate(n)(i =>
      (key(), rnd.nextInt(100000).toLong, 10L + i)), ("k", "ts", "lid"))
    val rights = mk(Seq.tabulate(n)(i =>
      (key(), rnd.nextInt(100000).toLong, 1000L + i)), ("k", "ts", "rid"))
    val width = 2000L // -> ~50 buckets for the hot key

    val skewedDf = AsOfJoin.asOfSkewed(
      lefts, rights, Seq("k"), "ts", "rid", Seq("rid"), width)
    // the scan really partitions by (key, bucket): the exchange the window
    // sorts behind must hash on __bk too
    val planStr = skewedDf.queryExecution.executedPlan.toString
    assert(planStr.contains("__bk"),
      s"stitched scan does not partition on the bucket:\n$planStr")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (plain, tPlain) = timed(canon(AsOfJoin.asOf(
      lefts, rights, Seq("k"), "ts", "rid", Seq("rid"))))
    val (skewed, tSkewed) = timed(canon(skewedDf))
    info(f"hot-key 90%%/$n rows: asOf $tPlain%.2f s (one serialized task), " +
      f"asOfSkewed $tSkewed%.2f s (~50-way scan; overhead dominates at toy " +
      "scale - the stitch is 100TB insurance, see scaladoc)")
    assert(skewed == plain, "hot-key stitched rows diverged")
  }

  test("empty buckets still inherit the carry from far-earlier buckets") {
    // one right at ts=5, lefts far later with empty buckets between: the
    // prefix scan must chain the carry across the gap, not just one step
    val lefts = mk(Seq((1L, 9000L, 100L), (1L, 20000L, 101L)), ("k", "ts", "lid"))
    val rights = mk(Seq((1L, 5L, 200L)), ("k", "ts", "rid"))
    val got = canon(AsOfJoin.asOfSkewed(
      lefts, rights, Seq("k"), "ts", "rid", Seq("rid"), bucketWidth = 100L))
    assert(got == Set(
      (1L, 100L, Some(200L), Some(5L)),
      (1L, 101L, Some(200L), Some(5L))))
  }
}
