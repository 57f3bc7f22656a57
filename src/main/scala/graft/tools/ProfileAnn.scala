package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Queries}
import graft.functions.{Functions => F}

/** Stage-by-stage timing of the brute-force ANN query (BENCH q35) — used to
  * attribute its wall-clock between scan, quantize kernel, broadcast NLJ,
  * cosine kernel and the top-k window (VERDICT r1 "Next round" #5). */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
      }
    time("q35 full")(Queries.byName("q35_ann_bruteforce").fn(spark, sfDir).count())
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("scan")(emb.count())
    val c = emb.select(col("vec_id").as("neighbor_id"),
      F.vec_quantize(col("embedding"), 1000).as("cv"))
    time("quantize")(c.count())
    val q = emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
      F.vec_quantize(col("embedding"), 1000).as("qv"))
    val joined = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
    time("join")(joined.count())
    val scored = joined.withColumn("cosine", F.vec_cosine_q6(col("cv"), col("qv")))
    time("scored")(scored.count())
    val topk = graft.operators.TopK.perGroup(scored, 5, Seq(col("query_id")),
      Seq(col("cosine").desc, col("neighbor_id").asc))
    time("topk")(topk.count())
    topk.explain("formatted")
    spark.stop()
  }
}
