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

  test("epoch-nanos timestamps (> 2^53) bucket exactly — no double collapse") {
    // at 1.7e18 a double's ulp is 256 ns: the old floor(ts/width as double)
    // bucketing collapsed neighboring timestamps onto the same double and
    // mis-bucketed rows near boundaries, silently breaking the carry stitch.
    // Integer floor-division must keep skewed == plain at ns magnitudes.
    val base = 1_700_000_000_000_000_000L // this repo's events.ts scale
    val rnd = new scala.util.Random(23L)
    val lefts = mk(Seq.tabulate(300)(i =>
      (rnd.nextInt(3).toLong, base + rnd.nextInt(100000), 10L + i)),
      ("k", "ts", "lid"))
    val rights = mk(Seq.tabulate(300)(i =>
      (rnd.nextInt(3).toLong, base + rnd.nextInt(100000), 1000L + i)),
      ("k", "ts", "rid"))
    for {
      direction <- Seq(AsOfJoin.Backward, AsOfJoin.Forward, AsOfJoin.Nearest)
      width <- Seq(257L, 1000L) // 257 > the 256-ns ulp: misbucketing visible
    } {
      val plain = canon(AsOfJoin.asOf(
        lefts, rights, Seq("k"), "ts", "rid", Seq("rid"), None, direction))
      val skewed = canon(AsOfJoin.asOfSkewed(
        lefts, rights, Seq("k"), "ts", "rid", Seq("rid"), width, None, direction))
      assert(skewed == plain,
        s"ns-scale bucketing diverged: direction=$direction width=$width")
    }
  }

  test("nearest with tie=highest matches asOf's SQL-abs tie resolution") {
    // equal-distance ties: rights at ts-5 and ts+5 for every left; the
    // higher tie value must win in BOTH plans (the lateral rewrite's shape)
    val lefts = mk(Seq.tabulate(50)(i =>
      (i.toLong % 3, 100L + 10L * i, 10L + i)), ("k", "ts", "lid"))
    val rights = lefts.select(col("k"), col("ts"), col("lid")).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1) - 5, r.getLong(2) * 2),
        (r.getLong(0), r.getLong(1) + 5, r.getLong(2) * 2 + 1)))
    val rdf = mk(rights.toSeq, ("k", "ts", "rid"))
    for (width <- Seq(7L, 1000L)) {
      val plain = canon(AsOfJoin.asOf(lefts, rdf, Seq("k"), "ts", "rid",
        Seq("rid"), None, AsOfJoin.Nearest, AsOfJoin.TieHighest))
      val skewed = canon(AsOfJoin.asOfSkewed(lefts, rdf, Seq("k"), "ts", "rid",
        Seq("rid"), width, None, AsOfJoin.Nearest, AsOfJoin.TieHighest))
      assert(skewed == plain, s"tie=highest diverged at width=$width")
      // and the ties really resolved to the forward row (odd rid) — the
      // backward-preferring default would pick the even one
      assert(plain.forall(_._3.exists(_ % 2 == 1)),
        "tie=highest did not prefer the higher tie value")
    }
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
