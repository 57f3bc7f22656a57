package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface checks: functions registered through GraftExtensions resolve
  * in spark.sql text and agree with the Scala column API. */
class ExtensionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("register() exposes kernel + composition functions to SQL") {
    GraftExtensions.register(spark)
    Seq(("10.1.2.3", "the quick brown fox")).toDF("ip", "text")
      .createOrReplaceTempView("ext_probe")
    val r = spark.sql("""
      SELECT graft_ip_to_long(ip) AS ipl,
             graft_long_to_ip(graft_ip_to_long(ip)) AS ip2,
             graft_hash60(text) AS h,
             graft_token_count(text) AS tc,
             graft_minhash(graft_word_shingles(text, 2), 4) AS mh,
             graft_cosine_q6(array(1L, 2L), array(1L, 2L)) AS cos
      FROM ext_probe""").head()
    assert(r.getLong(0) == 167838211L)
    assert(r.getString(1) == "10.1.2.3")
    assert(r.getLong(2) >= 0)
    assert(r.getInt(3) == 4)
    assert(r.getSeq[Long](4).length == 4)
    assert(r.getDouble(5) == 1.0)
  }

  test("aggregate functions resolve in SQL (vec_mean, cms_sketch)") {
    GraftExtensions.register(spark)
    Seq(Seq(1L, 3L), Seq(3L, 5L)).toDF("v").createOrReplaceTempView("ext_vecs")
    assert(spark.sql("SELECT graft_vec_mean(v) FROM ext_vecs")
      .head().getSeq[Double](0) == Seq(2.0, 4.0))
    Seq("a", "a", "b").toDF("k").createOrReplaceTempView("ext_keys")
    val cells = spark.sql("SELECT graft_cms_sketch(k, 2, 8) FROM ext_keys")
      .head().getSeq[Long](0)
    assert(cells.length == 16 && cells.sum == 3L * 2)
  }

  test("extensions class applies cleanly and its builders resolve") {
    // Applying to a fresh SparkSessionExtensions must not throw (the
    // spark.sql.extensions=graft.GraftExtensions path at session build).
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.all.map(_._1).distinct.size == GraftExtensions.all.size)
    // A composition builder's output resolves and evaluates in a plan.
    val builder = GraftExtensions.all.toMap.apply("graft_authority_domain")
    val expr = builder(Seq(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("a.b.example.com"),
      org.apache.spark.sql.types.StringType)))
    val out = spark.range(1)
      .select(org.apache.spark.sql.graftbridge.ColumnBridge.column(expr).as("a"))
      .head().getString(0)
    assert(out == "example.com")
  }

  test("EVERY registered function resolves and evaluates from SQL") {
    GraftExtensions.register(spark)
    Seq(("a.example.com contact the of to 10.0.0.1", "1.2.3.4"))
      .toDF("t", "ip").createOrReplaceTempView("ext_all")
    // one runnable SQL invocation per registered name — a registration or
    // arity drift fails here, not in a user's session
    val calls = Map(
      "graft_hash60" -> "graft_hash60(t)",
      "graft_minhash" -> "graft_minhash(graft_word_shingles(t, 2), 4)",
      "graft_simhash60" -> "graft_simhash60(transform(graft_tokens(t), x -> graft_hash60(x)))",
      "graft_dot_long" -> "graft_dot_long(array(1L, 2L), array(3L, 4L))",
      "graft_cosine_q6" -> "graft_cosine_q6(array(1L, 2L), array(3L, 4L))",
      "graft_l2sq_long" -> "graft_l2sq_long(array(1L, 2L), array(3L, 4L))",
      "graft_srp_bucket" -> "graft_srp_bucket(array(1L, 2L), 4)",
      "graft_best_window" -> "graft_best_window(graft_tokens(t), array('contact', 'example'), 3)",
      "graft_sq8_encode" -> "graft_sq8_encode(array(5L, 70L), array(0L, 0L), array(10L, 100L))",
      "graft_sq8_recon" -> "graft_sq8_recon(graft_sq8_encode(array(5L, 70L), array(0L, 0L), array(10L, 100L)), array(0L, 0L), array(10L, 100L))",
      "graft_vec_mean" -> "(SELECT graft_vec_mean(v) FROM (SELECT array(1L, 2L) AS v))",
      "graft_maxsim_q6" -> "(SELECT graft_maxsim_q6(v, array(array(1L, 2L), array(3L, 4L))) FROM (SELECT array(1L, 2L) AS v))",
      "graft_cms_sketch" -> "(SELECT graft_cms_sketch(x, 2, 8) FROM (SELECT 'a' AS x))",
      "graft_hll_registers" -> "(SELECT graft_hll_registers(x, 16) FROM (SELECT 'a' AS x))",
      "graft_sketch_merge_max" -> "(SELECT graft_sketch_merge_max(v) FROM (SELECT array(1L) AS v))",
      "graft_sketch_merge_sum" -> "(SELECT graft_sketch_merge_sum(v) FROM (SELECT array(1L) AS v))",
      "graft_sketch_merge_or" -> "(SELECT graft_sketch_merge_or(v) FROM (SELECT array(1L) AS v))",
      "graft_bloom_sketch" -> "(SELECT graft_bloom_sketch(x, 64, 2) FROM (SELECT 'a' AS x))",
      "graft_bloom_contains" -> "(SELECT graft_bloom_contains(graft_bloom_sketch(x, 64, 2), 'a', 2) FROM (SELECT 'a' AS x))",
      "graft_bottomk_sample" -> "(SELECT graft_bottomk_sample(x, 1.0D, 4) FROM (SELECT 'a' AS x))",
      "graft_kmv_sketch" -> "(SELECT graft_kmv_sketch(x, 4) FROM (SELECT 'a' AS x))",
      "graft_digit_hist" -> "(SELECT graft_digit_hist(v, 2) FROM (SELECT 12345L AS v))",
      "graft_digit_hist_merge" -> "(SELECT graft_digit_hist_merge(h) FROM (SELECT graft_digit_hist(v, 2) AS h FROM (SELECT 12345L AS v) GROUP BY v))",
      "graft_digit_quantile" -> "(SELECT graft_digit_quantile(graft_digit_hist(v, 2), 0.5D) FROM (SELECT 12345L AS v))",
      "graft_digit_bucket" -> "graft_digit_bucket(12345L, 2)",
      "graft_zorder2" -> "graft_zorder2(3, 5, 8)",
      "graft_zorder3" -> "graft_zorder3(3, 5, 7, 8)",
      "graft_hilbert2" -> "graft_hilbert2(3, 5, 8)",
      "graft_ip_to_long" -> "graft_ip_to_long(ip)",
      "graft_long_to_ip" -> "graft_long_to_ip(16909060L)",
      "graft_ip_in_cidr" -> "graft_ip_in_cidr(ip, '1.2.3.0/24')",
      "graft_authority_domain" -> "graft_authority_domain(t)",
      "graft_strip_protocol" -> "graft_strip_protocol(t)",
      "graft_tokens" -> "graft_tokens(t)",
      "graft_token_count" -> "graft_token_count(t)",
      "graft_lang_id" -> "graft_lang_id(t)",
      "graft_quality_score" -> "graft_quality_score(t)",
      "graft_normalize_text" -> "graft_normalize_text(t)",
      "graft_gopher_rules" -> "graft_gopher_rules(t)",
      "graft_fingerprint" -> "graft_fingerprint(t)",
      "graft_word_shingles" -> "graft_word_shingles(t, 2)",
      "graft_qround" -> "graft_qround(1.23456D, 2)",
      "graft_vec_quantize" -> "graft_vec_quantize(array(CAST(0.5 AS FLOAT)), 1000)")
    val missing = GraftExtensions.all.map(_._1).filterNot(calls.contains)
    assert(missing.isEmpty,
      s"registered functions without a sweep invocation: $missing")
    calls.foreach { case (name, expr) =>
      val r = spark.sql(s"SELECT $expr AS v FROM ext_all").head()
      assert(!r.isNullAt(0) || name.contains("merge"), s"$name returned null")
    }
  }

  test("minhash rejects a non-literal hash count") {
    GraftExtensions.register(spark)
    Seq(Tuple1("x")).toDF("t").createOrReplaceTempView("ext_probe2")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(graft_tokens(t), length(t)) FROM ext_probe2").collect()
    }
    val messages = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("; ")
    assert(messages.contains("integer literal"))
  }
}
