package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.ZLake

/** Join-driven dynamic file pruning over a z-lake — the "dynamic file
  * pruning" every fact-⨝-dim query over a 100 TB lake needs: when the dim
  * side is selective (a handful of customers, one day's campaigns), the
  * fact scan should touch only the files that can hold a matching key, not
  * the whole lake. Spark's own DPP prunes PARTITIONS of a partitioned
  * table; this prunes FILES of a z-lake through the manifest machinery —
  * finer granularity, and it composes with the lake's bloom filters for
  * point-key skipping that min/max envelopes cannot express (a scattered
  * key overlaps every file's range).
  *
  * The reference enriches its fact stream against small in-memory dims
  * (client rules, whitelist — DnsRptCH.scala's broadcast maps); at its
  * scale a full scan is fine. At lake scale the same query must skip data,
  * so the dim's keys are collected (the dim side of such a join is
  * broadcast-small by definition — `maxKeys` guards the driver) and
  * planted as one `IN`-list filter on the lake read:
  *
  *  - file granularity: [[ZLake.mayMatch]]'s `In`/`InSet` lanes drop every
  *    file whose envelope excludes ALL keys or whose write-time bloom
  *    proves every key absent — at planning time, zero tasks;
  *  - row-group granularity: the same IN list reaches parquet as a pushed
  *    filter inside the kept files;
  *  - row granularity: the `IN` is an exact row filter, so the result is
  *    precisely the fact rows whose key appears in the dim — an inner or
  *    semi join on top loses nothing.
  *
  * Soundness contract: the returned frame always contains every fact row
  * that can match a dim key. Under the cap the filter is exact; past the
  * cap (or with a non-collectable dim) it degrades to the UNPRUNED lake —
  * a superset, never a lost row — because a 10-million-key "dim" is not a
  * pruning dim, it is the other fact table of a shuffle join.
  */
object DynamicPrune {

  /** The lake at `root`, restricted to rows whose `keyCol` appears in
    * `dim`'s `dimKey` column — with file/row-group skipping planted from
    * the collected key set. NULL dim keys are dropped (an equi join never
    * matches NULL); an empty dim yields an empty (zero-file) read; a dim
    * with more than `maxKeys` distinct keys falls back to the full lake
    * (superset contract above). Key values must be the lake column's type
    * (the usual join-analysis rules apply downstream). */
  def readSemiFiltered(spark: SparkSession, root: String, keyCol: String,
                       dim: DataFrame, dimKey: Column,
                       maxKeys: Int = 65536): DataFrame = {
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    val lake = ZLake.read(spark, root)
    val keys: Seq[Any] = dim.select(dimKey.as("__graft_key")).na.drop()
      .distinct().limit(maxKeys + 1).collect().map(_.get(0)).toSeq
    if (keys.isEmpty) lake.filter(lit(false))
    else if (keys.size > maxKeys) lake
    else lake.filter(col(keyCol).isInCollection(keys))
  }

  /** Inner fact-⨝-dim with the fact side file-pruned by the dim's keys:
    * [[readSemiFiltered]] then a plain equi join (small side broadcast —
    * the cap already proved it driver-sized). Inner only: an outer join's
    * unmatched fact rows would be lost to the pre-filter.
    *
    * The join condition binds each side EXPLICITLY: the dim key is
    * materialized under the reserved `__graft_key` alias and the fact key
    * resolves against the fact plan — an unbound `col(keyCol) === dimKey`
    * is ambiguous whenever both sides share the key's name (the common
    * natural-join layout, r9 advice) and fails analysis. `__graft_key` is
    * reserved on the dim (as in [[readSemiFiltered]]) and dropped from the
    * output. */
  def innerJoinPruned(spark: SparkSession, root: String, keyCol: String,
                      dim: DataFrame, dimKey: Column,
                      maxKeys: Int = 65536): DataFrame = {
    val fact = readSemiFiltered(spark, root, keyCol, dim, dimKey, maxKeys)
    val keyed = dim.withColumn("__graft_key", dimKey)
    fact.join(broadcast(keyed), fact(keyCol) === keyed("__graft_key"))
      .drop("__graft_key")
  }
}
