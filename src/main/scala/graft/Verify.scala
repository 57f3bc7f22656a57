package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Types the driver's pandas comparator can sort — everything except
    * array/map/struct (those must be string-rendered in the query). */
  def comparable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.ArrayType => false
    case _: org.apache.spark.sql.types.MapType => false
    case _: org.apache.spark.sql.types.StructType => false
    case _ => true
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [namePrefix] — the optional prefix restricts the
    // dump to matching queries (fast local iteration on one query).
    val sfDir = args(0); val outDir = args(1)
    val prefix = if (args.length > 2) args(2) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(_._1.startsWith(prefix)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Schema lint: the gate's pandas comparator sorts cells and crashes
        // on array/map/struct values (r11: q157/q184 ERR'd this way).
        // Refuse the dump loudly instead of handing the driver a result it
        // cannot compare — render complex columns as strings in the query.
        val complex = df.schema.fields.collect {
          case f if !Verify.comparable(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
        }
        if (complex.nonEmpty) throw new IllegalStateException(
          s"result has non-comparable columns [${complex.mkString(", ")}] — " +
            "string-render them (array_join / concat_ws) on both sides")
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // q96 driver-gate evidence: after the pruned-read query executes,
        // dump its lake's per-file envelopes + the (kept, total) pruning
        // decision so a hash red in the gate localizes itself from the log
        if (name.startsWith("q96_")) ZLakeDiag.report(name)
        // q96-family literal rows: a gate hash red is opaque (the driver
        // only records match/no-match), so print the actual one-row result
        // next to the envelope dump — the driver log then carries the
        // numeric delta, not just the verdict.
        if (name.startsWith("q96")) {
          val rows = spark.read.parquet(s"$outDir/$name").collect()
          rows.foreach(r => System.err.println(s"[verify] $name row: $r"))
        }
        // q167/q169 family (driver-hash-red r11-r13, environment-adjudicated
        // r13): print the first rows of every LM-chain query so the driver
        // log carries the actual Spark-side values next to a red verdict —
        // the same evidence pattern that closed the q96 class.
        if (name.startsWith("q167") || name.startsWith("q169")) {
          spark.read.parquet(s"$outDir/$name").limit(5).collect()
            .foreach(r => System.err.println(s"[verify] $name row: $r"))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
