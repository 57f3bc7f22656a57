package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.ZLake

/** Randomized-layout soundness property for the stats-pruning read: over
  * MANY file layouts (random hash placement, z-order, sampled range sorts)
  * and a family of predicates, the pruned read's aggregates must equal the
  * full scan's — end to end through [[ZLake.read]], not just `mayMatch` on
  * synthetic envelopes. This is the property the round-6 driver gate
  * tripped on (q96's intermittent hash mismatch under `repartitionByRange`'s
  * run-varying layouts): a layout-dependent answer means an unsound prune —
  * silent data loss at 100 TB — so ANY mismatch here is a release blocker,
  * and a reproducing (seed, layout, predicate) triple prints in full. */
class ZLakeStressSpec extends AnyFunSuite with SparkSpec {

  private val Iters = 36

  /** Mixed-type table with nulls and duplicate keys — the shapes envelope
    * pruning must survive: long ranges, strings, an all-null-chunk-capable
    * nullable column. */
  private def base(): DataFrame = spark.range(2000)
    .select(
      (col("id") % 256).as("a"),
      ((col("id") * 7) % 256).as("b"),
      concat(lit("s"), lpad((col("id") % 97).cast("string"), 2, "0")).as("s"),
      when(col("id") % 11 =!= 0, concat(lit("c"), (col("id") % 13).cast("string")))
        .as("c"),
      col("id").as("payload"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def writeLayout(df: DataFrame, path: String, mode: Int,
                          iter: Int, rnd: scala.util.Random): String = mode match {
    case 0 => // arbitrary hash placement: worst-case overlapping envelopes
      val files = 2 + rnd.nextInt(10)
      df.repartition(files,
          pmod(xxhash64(col("a"), col("b"), col("payload"), lit(iter)),
            lit(files)))
        .write.mode("overwrite").parquet(path)
      s"hash/$files"
    case 1 => // the engine's own deterministic z-order + manifest
      val files = 4 + rnd.nextInt(12)
      Sinks.zorderedWrite(df, "a", "b", path, files, bits = 8)
      s"zorder/$files"
    case 2 => // single-column range sort; boundaries SAMPLED by Spark (the
      // run-varying layout family that tripped the round-6 driver gate)
      val files = 3 + rnd.nextInt(8)
      val key = if (rnd.nextBoolean()) "a" else "b"
      df.repartitionByRange(files, col(key)).sortWithinPartitions(col(key))
        .write.mode("overwrite").parquet(path)
      s"range($key)/$files"
  }

  private def predicates(rnd: scala.util.Random): Seq[(String, Column)] = {
    def range(c: String, span: Int) = {
      val lo = rnd.nextInt(256 - span)
      (s"$c in [$lo,${lo + span}]", col(c).between(lo, lo + span))
    }
    val qShaped = { // the q96 family: conjunctive ranges on both columns
      val (da, pa) = range("a", 31)
      val (db, pb) = range("b", 63)
      (s"$da AND $db", pa && pb)
    }
    val menu: Seq[() => (String, Column)] = Seq(
      () => qShaped,
      () => range("a", 1 + rnd.nextInt(128)),
      () => range("b", 1 + rnd.nextInt(128)),
      () => { val v = rnd.nextInt(256); (s"a = $v", col("a") === v) },
      () => { val vs = Seq.fill(3)(rnd.nextInt(256))
              (s"a in $vs", col("a").isin(vs: _*)) },
      () => { val v = f"s${rnd.nextInt(97)}%02d"
              (s"s <= 's$v'", col("s") <= s"s$v") },
      () => if (rnd.nextBoolean()) ("c IS NULL", col("c").isNull)
            else ("c IS NOT NULL", col("c").isNotNull),
      () => { val (d1, p1) = range("a", 15); val (d2, p2) = range("b", 15)
              (s"($d1) OR ($d2)", p1 || p2) })
    Seq(qShaped) ++ Seq.fill(2)(menu(rnd.nextInt(menu.size))())
  }

  private def checksum(df: DataFrame): Seq[Any] =
    df.agg(count(lit(1)), sum("a"), sum("b"), sum("payload"),
      count("c"), min("s"), max("s")).head().toSeq

  test(s"pruned read == full scan over $Iters randomized layouts") {
    val df = base()
    df.count() // materialize the plan once so per-iter cost is the writes
    for (iter <- 1 to Iters) {
      val rnd = new scala.util.Random(0x5eedL + iter) // seeded: reproducible
      val path = tmp(s"zstress$iter")
      val layout = writeLayout(df, path, iter % 3, iter, rnd)
      val plain = spark.read.parquet(path)
      for ((desc, pred) <- predicates(rnd)) {
        val got = checksum(ZLake.read(spark, path).filter(pred))
        val want = checksum(plain.filter(pred))
        assert(got == want,
          s"UNSOUND PRUNE at iter=$iter layout=$layout predicate=[$desc]: " +
            s"pruned=$got full=$want")
      }
    }
  }
}
