package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Functions => F, Kernels, TextFunctions => TF}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.unsafe.types.UTF8String

/** Parity guard: the native kernel expressions must produce bit-identical
  * values to the SQL-composable formulas they replaced (which the DuckDB
  * oracles encode). Each test evaluates both forms in Spark and compares. */
class KernelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat and more words here"),
    (3L, ""),
    (4L, "one"),
    (5L, "Ünïcode tÈxt — with punctuation!!! and 数字 123")
  ).toDF("id", "text")

  test("Hash60 kernel == conv(substring(md5,1,15),16,10)") {
    val rows = docs.select(
      F.hash60(col("text")).as("k"),
      conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("sql")
    ).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.map(_.getLong(0)).forall(_ >= 0))
  }

  test("MinHashSig kernel == seeded array_min composition") {
    val sh = TF.word_shingles(col("text"), 3)
    val composed = F.bind(sh) { s =>
      transform(sequence(lit(0), lit(7)),
        j => coalesce(
          array_min(transform(s, x =>
            conv(substring(md5(concat(x, lit("#"), j)), 1, 15), 16, 10).cast("long"))),
          lit(0L)))
    }
    val rows = docs.select(
      Dedup.minhashSignature(sh, 8).as("k"), composed.as("sql")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // empty text -> all-zero sentinel
    val empty = docs.filter(col("id") === 3)
      .select(Dedup.minhashSignature(sh, 8)).head().getSeq[Long](0)
    assert(empty == Seq.fill(8)(0L))
  }

  test("SimHash60 kernel == 60-term vote composition") {
    val hs = transform(TF.tokens(col("text")), t => F.hash60(t))
    val composed = F.bind(hs) { h =>
      (0 until 60).map { i =>
        val vote = aggregate(h, lit(0L), (acc, x) =>
          acc + when(shiftright(x, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
        when(vote > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val rows = docs.select(
      Dedup.simhashFromHashes(hs).as("k"), composed.as("sql")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("DotLong / CosineQ6 kernels == zip_with/aggregate composition") {
    val vecs = Seq(
      (Array(1L, 2L, 3L), Array(4L, -5L, 6L)),
      (Array(0L, 0L, 0L), Array(1L, 1L, 1L)),
      (Array(1000L, -2000L, 3000L), Array(1000L, -2000L, 3000L))
    ).toDF("a", "b")
    val dotSql = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val normSql = sqrt(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v).cast("double") *
      aggregate(zip_with(col("b"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).cast("double"))
    val cosSql = when(normSql > 0, F.qround(dotSql.cast("double") / normSql, 6))
      .otherwise(lit(0.0))
    val rows = vecs.select(
      F.vec_dot_long(col("a"), col("b")).as("kd"), dotSql.as("sd"),
      F.vec_cosine_q6(col("a"), col("b")).as("kc"), cosSql.as("sc")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
    // identical vectors -> cosine exactly 1.0; zero vector -> 0.0
    assert(rows(2).getDouble(2) == 1.0)
    assert(rows(1).getDouble(2) == 0.0)
  }

  test("SrpBucket kernel == per-plane md5 projection composition") {
    val vecs = Seq(
      Tuple1(Array(1000L, -500L, 250L, 750L)),
      Tuple1(Array(-1L, -2L, -3L, -4L)),
      Tuple1(Array(0L, 0L, 0L, 0L))
    ).toDF("qv")
    def planeComponent(p: Int, d: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit(s"plane_${p}_"), d)), 1, 15), 16, 10)
        .cast("long") % 1000L - 500L
    val composed = (0 until 4).map { p =>
      val dot = aggregate(
        zip_with(col("qv"), sequence(lit(0), size(col("qv")) - 1),
          (x, d) => x * planeComponent(p, d)),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = vecs.select(
      Similarity.srpBucket(col("qv"), 4).as("k"), composed.as("sql")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // buckets bounded by 2^planes
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < 16))
  }

  test("bloom sketch: no false negatives, duplicate/partitioning invariant") {
    import graft.functions.{KernelAggs, KernelExprs}
    val keys = (0 until 500).map(i => s"key_$i")
    val in = (keys ++ keys.take(100)).toDF("k") // duplicates are no-ops
    def words(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(KernelAggs.bloom_sketch(col("k"), 4096, 3).as("b"))
        .head().getSeq[Long](0)
    val b1 = words(in.repartition(1))
    val b8 = words(in.repartition(8, col("k")))
    val bd = words(keys.toDF("k")) // distinct-only input
    assert(b1 == b8 && b1 == bd, "bits must not depend on partitioning or dups")
    // every inserted key probes true
    val bloomDf = in.agg(KernelAggs.bloom_sketch(col("k"), 4096, 3).as("b"))
    val misses = keys.toDF("k").crossJoin(broadcast(bloomDf))
      .filter(!KernelExprs.bloom_contains(col("b"), col("k"), 3))
      .count()
    assert(misses == 0, "bloom filters admit no false negatives")
    // non-members mostly reject (4096 bits / 1500 set positions -> fp ~ 5%)
    val fp = (1000 until 2000).map(i => s"other_$i").toDF("k")
      .crossJoin(broadcast(bloomDf))
      .filter(KernelExprs.bloom_contains(col("b"), col("k"), 3))
      .count()
    assert(fp < 200, s"false-positive rate out of family: $fp/1000")
    // lake rollup: per-partition bloom partials OR-merge to the union bloom
    val partials = keys.zipWithIndex.toDF("k", "i")
      .groupBy(col("i") % 4)
      .agg(KernelAggs.bloom_sketch(col("k"), 4096, 3).as("b"))
    val merged = partials
      .agg(KernelAggs.sketch_merge_or(col("b")).as("b"))
      .head().getSeq[Long](0)
    assert(merged == bd, "OR-merged partials must equal the union sketch")
  }

  test("bottom-k sample: partitioning invariant, merge = union re-take, SQL surface") {
    import graft.functions.KernelAggs
    val rows = (0 until 2000).map(i => (s"row_$i", (i * 37 % 1000).toDouble))
    def sample(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(KernelAggs.bottomk_sample(col("k"), col("v"), 64).as("s"))
        .head().getSeq[Double](0)
    val s1 = sample(rows.toDF("k", "v").repartition(1))
    val s16 = sample(rows.toDF("k", "v").repartition(16, col("k")))
    assert(s1 == s16, "sample must not depend on partitioning")
    assert(s1.length == 64)
    // the sample is exactly the values of the 64 smallest-hash keys
    val expect = rows
      .map { case (k, v) =>
        (Kernels.hash60(UTF8String.fromString(k)), v) }
      .sorted.take(64).map(_._2)
    assert(s1 == expect)
    // SQL surface
    GraftExtensions.register(spark)
    rows.toDF("k", "v").createOrReplaceTempView("bk_in")
    val viaSql = spark.sql("SELECT graft_bottomk_sample(k, v, 64) AS s FROM bk_in")
      .head().getSeq[Double](0)
    assert(viaSql == s1)
    // non-DOUBLE value columns from SQL must work, not ClassCastException:
    // INT and DECIMAL values convert, and a decimal literal expression too
    val viaInt = spark.sql(
      "SELECT graft_bottomk_sample(k, cast(v AS int), 64) AS s FROM bk_in")
      .head().getSeq[Double](0)
    assert(viaInt == s1, "int-typed values must sample identically")
    val viaDec = spark.sql(
      "SELECT graft_bottomk_sample(k, cast(v AS decimal(10,2)), 64) AS s FROM bk_in")
      .head().getSeq[Double](0)
    assert(viaDec == s1, "decimal-typed values must sample identically")
  }

  test("kmv sketch: k smallest distinct hashes, partitioning/dup invariant") {
    import graft.functions.KernelAggs
    val keys = (0 until 800).map(i => s"kmv_${i % 301}") // dups across range
    def sk(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(KernelAggs.kmv_sketch(col("k"), 32).as("s")).head().getSeq[Long](0)
    val s1 = sk(keys.toDF("k").repartition(1))
    val s8 = sk(keys.toDF("k").repartition(8, col("k")))
    assert(s1 == s8)
    val expect = keys.distinct
      .map(k => Kernels.hash60(UTF8String.fromString(k)))
      .distinct.sorted.take(32)
    assert(s1 == expect, "sketch must be the 32 smallest distinct hashes")
    // under-full sketch holds ALL distinct hashes (exact regime)
    val tiny = sk(keys.take(10).toDF("k"))
    assert(tiny.length == keys.take(10).distinct.length)
  }

  test("bloom sketch: SQL surface + geometry validation") {
    GraftExtensions.register(spark)
    Seq("a", "b", "c").toDF("k").createOrReplaceTempView("bloom_in")
    val row = spark.sql("""
      WITH s AS (SELECT graft_bloom_sketch(k, 256, 2) AS b FROM bloom_in)
      SELECT graft_bloom_contains(b, 'a', 2) AS hit_a,
             graft_bloom_contains(b, 'zzz_not_inserted', 2) AS hit_z
      FROM s""").head()
    assert(row.getBoolean(0))
    assert(!row.getBoolean(1)) // 6 of 256 bits set: a zzz fp would be ~1e-3
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_bloom_sketch(k, 100, 2) FROM bloom_in").collect()
    }
    assert(bad.getMessage.contains("multiple of 64"))
  }

  test("kernels survive whole-stage codegen and interpreted eval equally") {
    // force both paths: codegen on (default) vs off
    val base = docs.select(F.hash60(col("text")).as("h")).collect().map(_.getLong(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = docs.select(F.hash60(col("text")).as("h")).collect().map(_.getLong(0))
      assert(base.toSeq == interp.toSeq)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("L2sqLong kernel == zip_with composition; SQL surface; ranking " +
      "equals sqrt-based L2") {
    import graft.functions.KernelExprs
    val df = spark.range(200).select(col("id"),
      transform(sequence(lit(0), lit(7)),
        i => (col("id") * 13 + i * 7) % 100 - 50).as("a"),
      transform(sequence(lit(0), lit(7)),
        i => (col("id") * 29 + i * 3) % 100 - 50).as("b"))
    val both = df.select(
      KernelExprs.l2sq_long(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
        .as("c"))
    assert(both.filter(col("k") =!= col("c")).count() == 0,
      "kernel must equal the composed spelling")
    val viaSql = spark.sql(
      "SELECT graft_l2sq_long(array(1L, 2L, 3L), array(4L, 6L, 3L)) AS v")
      .head().getLong(0)
    assert(viaSql == 9L + 16L)
  }

  test("KeywordTable: Aho-Corasick matches == naive contains, incl. " +
      "the classic overlap case; codegen path agrees with eval") {
    import graft.functions.{KernelExprs, KeywordTable}
    // the textbook automaton: suffix overlaps force real fail links
    val t = KeywordTable.build(Seq("he", "she", "his", "hers"))
    def m(s: String): Seq[String] =
      t.hits(UTF8String.fromString(s)).toSeq[UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
    assert(m("ushers") == Seq("he", "hers", "she"),
      "all overlapping suffix matches must surface")
    assert(m("this") == Seq("his"))
    assert(m("xyz").isEmpty && m("").isEmpty)
    assert(m("hehehe") == Seq("he"), "repeats dedup")

    // equality vs naive contains over randomized inputs
    val dict = Seq("ab", "bab", "bc", "bca", "c", "caa", "aaa")
    val t2 = KeywordTable.build(dict)
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(20))("abc" (rnd.nextInt(3))).mkString
      val got = t2.hits(UTF8String.fromString(s)).toSeq[UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
      val want = dict.sorted.filter(s.contains(_))
      assert(got == want, s"mismatch on '$s'")
    }

    // through the plan (codegen) — same answers as direct eval
    val df = Seq("ushers live here", "nothing", "she said hers")
      .toDF("text")
      .select(KernelExprs.keyword_hits(col("text"), t).as("hits"))
    assert(df.collect().map(_.getSeq[String](0).toList).toList ==
      List(List("he", "hers", "she"), Nil, List("he", "hers", "she")))

    // build-time refusals
    intercept[IllegalArgumentException](KeywordTable.build(Nil))
    intercept[IllegalArgumentException](KeywordTable.build(Seq("a", "")))
  }
}
