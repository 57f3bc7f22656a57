package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** SQL surface of the stats-pruned lake (read side of
  * [[graft.sinks.Sinks.zorderedWrite]]/`lakeWrite`):
  *
  * {{{
  * spark.read.format("zlake").load("/lake/customer")
  * -- or, from pure SQL:
  * CREATE TEMPORARY VIEW customer_lake USING zlake OPTIONS (path '/lake/customer')
  * }}}
  *
  * Returns the SAME `HadoopFsRelation` that [[ZLake.read]] builds — the
  * manifest-backed [[ZLake.StatsFileIndex]] in front of Spark's own
  * parquet format — so a view declared this way keeps every property the
  * Scala API has: zero-footer planning on a manifest-covered lake,
  * partition-dir pruning, file-level envelope pruning, vectorized read,
  * whole-stage codegen, and the metadata-only aggregate rewrite
  * ([[graft.plans.ManifestAggs]]). The reference exposes its store only
  * through code (a user cannot point plain SQL at it); here the lake is a
  * first-class `USING` source like parquet itself.
  *
  * Time travel from SQL: `OPTIONS (path '...', snapshot 'tag')` plans the
  * [[Snapshots]] file set instead of the live one — the pinned dataset as
  * a queryable view, same pruning stack.
  *
  * Streaming: `spark.readStream.format("zlake").load(root)` tails the
  * lake incrementally — see [[ZLakeTail]] for discovery, pinning, and
  * exactly-once semantics.
  */
class ZLakeSource extends RelationProvider with StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "zlake"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "zlake: a path is required — .load(path) or OPTIONS (path '...')"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse(
      ZLakeTail.schemaOf(sqlContext.sparkSession, pathOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new ZLakeTail(sqlContext.sparkSession, pathOf(parameters), metadataPath,
      schema, parameters)

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    // a BaseRelation cannot carry the merge-on-read anti-join, so a plan
    // through one must prove its file set has NO vectors: a live view
    // refuses while the lake carries any (DeletionVectors.compact
    // reopens it); a snapshot view judges its own PINNED generation —
    // refusing when the snapshot pins vectors (read those via
    // Snapshots.readSnapshot), serving fine when it pins none, however
    // the live store has grown since
    val p = new org.apache.hadoop.fs.Path(path)
    // `snapshot_as_of '<epoch millis | yyyy-MM-dd[ HH:mm:ss]>'` resolves
    // to the latest snapshot at or before that instant (Delta's
    // TIMESTAMP AS OF at snapshot granularity; date/time strings parse
    // in the JVM default zone)
    val resolvedTag = parameters.get("snapshot").orElse(
      parameters.get("snapshot_as_of").map { s =>
        val ts =
          if (s.forall(_.isDigit)) s.toLong
          else if (s.length == 10) java.sql.Date.valueOf(s).getTime
          else java.sql.Timestamp.valueOf(s).getTime
        Snapshots.snapshotAsOf(spark, path, ts).getOrElse(
          throw new IllegalArgumentException(
            s"no snapshot of $path at or before '$s'"))
      })
    val idx = resolvedTag match {
      case Some(tag) =>
        require(!Snapshots.pinsVectors(spark, path, tag),
          s"SQL relation (USING zlake): snapshot '$tag' pins merge-on-" +
            "read deletion vectors a SQL view cannot apply — read it " +
            "via Snapshots.readSnapshot, or snapshot after " +
            "DeletionVectors.compact")
        Snapshots.snapshotIndex(spark, path, tag)
      case None =>
        graft.sinks.DeletionVectors.requireAbsent(
          p.getFileSystem(spark.sessionState.newHadoopConf()), p,
          "SQL relation (USING zlake)")
        ZLake.index(spark, path)
    }
    ZLake.relationWith(spark, path, idx)
  }
}
