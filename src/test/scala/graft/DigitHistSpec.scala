package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KernelAggs => KA, KernelExprs => KE, Kernels}
import graft.operators.TrainPrep

/** Digit-histogram quantile sketch: exact-grid bucket algebra, the
  * conservative rank rule, EXACT re-aggregation (merged == direct — a
  * histogram, not an approximation of one), order independence, and the
  * deterministic training-order shuffle's conservation/contiguity/seed
  * properties. */
class DigitHistSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("digitBucket: exact head, 2-digit grid, negative refuses") {
    assert(Kernels.digitBucket(0L, 2) == 0L)
    assert(Kernels.digitBucket(7L, 2) == 7L)
    assert(Kernels.digitBucket(99L, 2) == 99L)
    assert(Kernels.digitBucket(100L, 2) == 100L)
    assert(Kernels.digitBucket(109L, 2) == 100L)
    assert(Kernels.digitBucket(12345L, 2) == 12000L)
    assert(Kernels.digitBucket(999999L, 2) == 990000L)
    assert(Kernels.digitBucket(12345L, 3) == 12300L)
    assert(Kernels.digitBucket(Long.MaxValue, 2) == 9200000000000000000L)
    intercept[IllegalArgumentException](Kernels.digitBucket(-1L, 2))
  }

  test("digitQuantile rank arithmetic survives totals past Long.Max/10⁶ " +
      "(ADVICE r14: the direct qMicros·total product wrapped)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // two buckets holding 6e12 values each: total 1.2e13 > 9.2e12, where
    // qMicros·total used to wrap negative, clamp rank to 1, and return
    // the minimum bucket for EVERY q
    val big = 6000000000000L
    val hist = new GenericArrayData(Array[Any](
      InternalRow(100L, big), InternalRow(200L, big)))
    assert(Kernels.digitQuantile(hist, 0.25) == 100L)
    assert(Kernels.digitQuantile(hist, 0.75) == 200L)
    assert(Kernels.digitQuantile(hist, 1.0) == 200L)
    // and the exact boundary: rank ceil(0.5·total) is the last value of
    // the first bucket
    assert(Kernels.digitQuantile(hist, 0.5) == 100L)
  }

  test("quantiles walk the conservative rank; relative error bounded") {
    val vals = (1L to 1000L).toDF("v")
    val got = vals.agg(KA.digit_hist(col("v"), 2).as("h"))
      .select(KE.digit_quantile(col("h"), 0.5).as("p50"),
        KE.digit_quantile(col("h"), 0.99).as("p99"),
        KE.digit_quantile(col("h"), 1.0).as("p100"))
      .as[(Long, Long, Long)].head()
    // true p50=500 → bucket 500; p99=990 → bucket 990; max 1000 → 1000
    assert(got == ((500L, 990L, 1000L)))
    // ≤10% relative error at any q on heavy-tailed data
    val skew = (0 until 2000).map(i => (i.toLong * i * i + 1)).toDF("v")
    val sp = skew.agg(KA.digit_hist(col("v"), 2).as("h"))
      .select(KE.digit_quantile(col("h"), 0.9).as("p90"))
      .as[Long].head()
    val trueP90 = skew.as[Long].collect().sorted.apply(
      math.max(1, math.ceil(0.9 * 2000).toInt) - 1)
    assert(sp <= trueP90 && sp > trueP90 - math.max(1, trueP90 / 10),
      s"p90 sketch=$sp true=$trueP90")
  }

  test("re-aggregation is EXACT: merged partials == direct sketch") {
    val data = spark.range(5000).select((col("id") % 7).as("grp"),
      (col("id") * 37 % 99991).as("v"), (col("id") % 13).as("sub"))
    def render(h: org.apache.spark.sql.Column) =
      transform(h, x => concat_ws(":", x("lb"), x("n")))
    val direct = data.groupBy(col("grp"))
      .agg(KA.digit_hist(col("v"), 2).as("h"))
      .select(col("grp"), render(col("h")).as("h"))
    val merged = data.groupBy(col("grp"), col("sub"))
      .agg(KA.digit_hist(col("v"), 2).as("h"))
      .groupBy(col("grp")).agg(KA.digit_hist_merge(col("h")).as("h"))
      .select(col("grp"), render(col("h")).as("h"))
    val d = direct.orderBy("grp").as[(Long, Seq[String])].collect()
    val m = merged.orderBy("grp").as[(Long, Seq[String])].collect()
    assert(d.toSeq == m.toSeq)
  }

  test("sketch is order-independent (partitioning cannot change bytes)") {
    val data = spark.range(3000).select((col("id") * 97 % 10007).as("v"))
    def rendered(df: org.apache.spark.sql.DataFrame) =
      df.agg(KA.digit_hist(col("v"), 2).as("h"))
        .select(transform(col("h"),
          x => concat_ws(":", x("lb"), x("n"))).as("h"))
        .as[Seq[String]].head()
    assert(rendered(data) == rendered(data.repartition(17)))
  }

  test("trainingOrder: conservation, contiguous per-shard ranks, seeds") {
    val de = spark.range(500).select(col("id").as("doc_id"))
      .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("epoch"))
    val out = TrainPrep.trainingOrder(de, col("doc_id"), col("epoch"),
      seed = 7L, numShards = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 1000, "every (doc, epoch) exactly once")
    assert(out.map(r => (r._3, r._4)).toSet.size == 1000)
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.toSeq == (0L until rows.length).toSeq,
        s"shard $shard ranks not contiguous")
    }
    // deterministic: identical under a different physical partitioning
    val again = TrainPrep.trainingOrder(de.repartition(11), col("doc_id"),
      col("epoch"), seed = 7L, numShards = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // a different seed is a different permutation
    val other = TrainPrep.trainingOrder(de, col("doc_id"), col("epoch"),
      seed = 8L, numShards = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sorted.toSeq != other.sorted.toSeq)
  }
}
