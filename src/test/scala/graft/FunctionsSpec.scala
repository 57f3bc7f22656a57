package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Functions => F, TextFunctions => TF}

class FunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("ip_to_long/long_to_ip round-trip on arbitrary 32-bit values") {
    val rnd = new scala.util.Random(42)
    val vs = Seq.fill(200)(rnd.nextInt().toLong & 0xFFFFFFFFL) ++
      Seq(0L, 1L, 4294967295L, 2147483648L)
    val back = vs.toDF("n")
      .select(F.ip_to_long(F.long_to_ip(col("n")))).as[Long].collect()
    assert(back.toSeq == vs)
  }

  test("ip_to_long matches reference semantics, malformed -> 0") {
    val rows = Seq("1.2.3.4", "0.0.0.0", "255.255.255.255", "256.1.1.1",
      "a.b.c.d", "1.2.3", "", "10.0.0.1.5").toDF("ip")
      .select(F.ip_to_long(col("ip"))).as[Long].collect()
    assert(rows.toSeq == Seq(16909060L, 0L, 4294967295L, 0L, 0L, 0L, 0L, 0L))
  }

  test("ip_in_cidr") {
    val rows = Seq(
      ("10.128.0.1", "10.128.0.0/9"), ("10.127.255.255", "10.128.0.0/9"),
      ("192.168.1.5", "192.168.0.0/16"), ("192.169.0.0", "192.168.0.0/16"),
      ("1.2.3.4", "0.0.0.0/0")).toDF("ip", "cidr")
      .select(F.ip_in_cidr(col("ip"), col("cidr"))).as[Boolean].collect()
    assert(rows.toSeq == Seq(true, false, true, false, true))
  }

  test("authority_domain: registrable suffix, last label pair, fallback to input") {
    val rows = Seq("www.taobao.com", "a.b.example.com.cn", "cdn.x.co.uk",
      "plainhost", "deep.sub.qq.com").toDF("d")
      .select(F.authority_domain(col("d"))).as[String].collect()
    assert(rows.toSeq ==
      Seq("taobao.com", "example.com.cn", "x.co.uk", "plainhost", "qq.com"))
  }

  test("strip_protocol") {
    val rows = Seq("http://x.com", "https://y.net/z", "ftp://keep", "plain")
      .toDF("u").select(F.strip_protocol(col("u"))).as[String].collect()
    assert(rows.toSeq == Seq("x.com", "y.net/z", "ftp://keep", "plain"))
  }

  test("vector math: quantized cosine of identical vectors is 1") {
    val df = Seq((Seq(0.1f, 0.2f, -0.3f), Seq(0.1f, 0.2f, -0.3f)))
      .toDF("a", "b")
      .select(F.vec_cosine_q6(F.vec_quantize(col("a"), 1000),
        F.vec_quantize(col("b"), 1000)))
    assert(df.as[Double].head() == 1.0)
  }

  test("hash60 is non-negative and stable") {
    val h = Seq("abc").toDF("s").select(F.hash60(col("s"))).as[Long].head()
    assert(h == 648541476951500027L) // pinned: first 15 hex chars of md5("abc")
  }

  test("tokens / token_count / shingles") {
    val df = Seq("The quick brown fox, the quick!").toDF("t")
    assert(df.select(TF.token_count(col("t"))).as[Int].head() == 6)
    val sh = df.select(TF.word_shingles(col("t"), 3)).as[Seq[String]].head()
    assert(sh.head == "the quick brown" && sh.size == 4)
    assert(df.select(TF.char_shingles(col("t"), 5)).as[Seq[String]].head().head == "the q")
  }

  test("lang_id picks marker-richest language, en on no hit") {
    val rows = Seq("the cat and the dog is here with that",
      "der hund und die katze ist nicht da mit",
      "zzz qqq").toDF("t").select(TF.lang_id(col("t"))).as[String].collect()
    assert(rows.toSeq == Seq("en", "de", "en"))
  }

  test("quality_score bounded in [0,1]") {
    val rows = Seq("", "short", ("the and of to in is it " * 40))
      .toDF("t").select(TF.quality_score(col("t"))).as[Double].collect()
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("sample_hash: permille=1000 selects every key, threshold is exact") {
    val keys = (0 until 200).map(i => s"key$i").toDF("k")
    assert(keys.filter(!F.sample_hash(col("k"), 1000)).isEmpty)
    assert(keys.filter(F.sample_hash(col("k"), 0)).isEmpty)
    // multiply-then-divide: buckets sum exactly to the full range
    assert(F.sampleThreshold(1000) == (1L << 60))
    assert(F.sampleThreshold(500) == (1L << 59))
  }

  test("stratified_sample: rate-0 drops, rate-1000 keeps, subset of flat sample") {
    val rows = (0 until 3000)
      .map(i => (s"id$i", Seq("a", "b", "c")(i % 3))).toDF("k", "s")
    val kept = rows.filter(F.stratified_sample(col("k"), col("s"),
        Map("a" -> 0, "b" -> 1000, "c" -> 200), defaultPermille = 50))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("a"))
    assert(kept("b") == 1000L) // whole stratum
    assert(kept("c") > 100 && kept("c") < 300) // ~200/1000 of 1000
    // stratum rate r selects exactly the keys a flat r-permille sample would
    val viaFlat = rows.filter(col("s") === "c" && F.sample_hash(col("k"), 200))
      .count()
    assert(kept("c") == viaFlat)
  }

  test("cms_sketch rejects non-positive depth/width at plan time") {
    val df = Seq("a").toDF("k")
    val e = intercept[IllegalArgumentException] {
      df.agg(graft.functions.KernelAggs.cms_sketch(col("k"), 4, 0)).collect()
    }
    assert(e.getMessage.contains("width"))
  }
}
