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
