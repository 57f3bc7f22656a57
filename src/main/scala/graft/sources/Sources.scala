package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source layer (SURVEY §2.1).
  *
  * Every dimension and fact source is `DataFrame`-shaped behind one
  * interface, so tests run on parquet fixtures and production runs on
  * JDBC/object storage without touching pipeline code. The reference
  * hand-rolls each source (HDFS text scan DnsRptCH.scala:1014-1024, four
  * MySQL collects :796-855, three Redis hgetAlls :146-350, a binary geo
  * file IpSearch.java:41-76); here they are declarative reads that Catalyst
  * can prune and push filters into.
  */
object Sources {

  /** S1: text-line scan over explicit paths (raw DNS JSON logs). */
  def textLines(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.textFile(paths: _*).toDF("value")

  /** S1 (columnar variant): JSON logs already landed as parquet — the scale
    * layout: `date=/hour=` partitioned parquet replaces the reference's
    * filename-encoded 10-second files (DnsRptCH.scala:983-1012) and buys
    * partition pruning for free. */
  def factParquet(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)

  /** S2: enumerate the reference's `yyyy/MM/dd/HHmmss_epoch` paths for a
    * window [start, start+windowSec) stepping `stepSec`
    * (DnsRptCH.scala:983-1012). Kept for backfill parity over legacy
    * layouts; existence probing is left to the FS glob. */
  def windowPaths(root: String, startEpochSec: Long, windowSec: Long,
                  stepSec: Long = 10): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy/MM/dd/HHmmss").withZone(java.time.ZoneOffset.UTC)
    (startEpochSec until startEpochSec + windowSec by stepSec).map { t =>
      s"$root/${fmt.format(java.time.Instant.ofEpochSecond(t))}_$t"
    }
  }

  /** S4: generic JDBC dimension read (reference Utils.scala:105-117). */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S5-S12: dimension from parquet with an enforced schema. */
  def dim(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
