package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

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
  */
class ZLakeSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "zlake"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "zlake: a path is required — .load(path) or OPTIONS (path '...')"))
    val spark = sqlContext.sparkSession
    val idx = parameters.get("snapshot") match {
      case Some(tag) => Snapshots.snapshotIndex(spark, path, tag)
      case None => ZLake.index(spark, path)
    }
    ZLake.relationWith(spark, path, idx)
  }
}
