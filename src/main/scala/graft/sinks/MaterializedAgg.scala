package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.sources.ZLake

/** Incrementally-maintained AGGREGATE VIEW over the z-lake — the
  * streaming-OLAP serving table (per-client QPS totals, per-domain counts)
  * kept current batch-by-batch instead of recomputed from 100 TB of facts:
  * each micro-batch's PARTIAL aggregate (count + sums — the mergeable
  * kernel of the reference's report aggregates, DnsRptCH.scala's
  * sampleNum/errorNum rollups) is merged into one row per group key, so a
  * point lookup reads a row, not a scan.
  *
  * Merge cost is proportional to the batch, not the view: the batch's
  * group keys prune the read of current rows at FILE granularity (the
  * view's z-layout hashes the key into the z-order columns and blooms it,
  * so [[graft.operators.DynamicPrune]]-style InSet planning skips every
  * file holding none of the touched keys — and [[ZLake.repairDirManifest]]
  * keeps the bloom lane alive across upserts), and the write-back goes
  * through [[LakeDelete.upsertLake]]'s journal, touching only
  * bloom-positive files.
  *
  * EXACTLY-ONCE under replay and crash, without idempotent-merge tricks:
  * aggregation increments are NOT idempotent (a replayed batch would
  * double-count), so every merge publishes the batch id as the lake's
  * commit [[LakeDelete.readFence]] — the fence rides the upsert journal
  * and lands atomically with the merge. A replayed `foreachBatch` sees its
  * own id at-or-below the fence and skips; a crash BEFORE the journal
  * publish left the lake untouched (the replay redoes the whole merge); a
  * crash AFTER it is healed by the journal recovery the next merge runs
  * first, fence included. Bootstrap (the view's very first batch) is made
  * replay-safe by an ownership marker: the root is created with a spec
  * marker, data lands, then the fence — a half-bootstrapped root (marker
  * but no fence) is wiped and redone. [[MaterializedAggSpec]] injects a
  * crash at every one of these windows.
  *
  * Group-key caveats (standard CDC-key trades): string group values must
  * not contain U+0001 (the key separator); `sumCols` should be integral or
  * decimal — double sums are row-order-dependent, which breaks both the
  * merge's exactness and oracle comparison.
  */
object MaterializedAgg {

  /** View definition. `groupCols` key the view (NULLs allowed — encoded
    * distinctly from any string); `sumCols` are summed; a `cnt` row count
    * always rides along, which also makes `avg = sum/cnt` derivable at
    * read time. `minCols`/`maxCols` keep running extrema (mergeable under
    * the view's insert-only increments; a lake DELETE does not unwind
    * them, as in every streaming-OLAP view). `distinctCols` keep
    * per-group HLL REGISTERS (`hllM` buckets, [[graft.functions
    * .KernelAggs.hll_registers]]) — the mergeable approx-distinct state:
    * register-wise max is associative and commutative, so batch
    * boundaries, replays-after-fence and merge order cannot change the
    * stored registers, and `readView` derives a `<c>_distinct` estimate
    * per group. `files`/`bits` shape the bootstrap z-layout. */
  final case class Spec(groupCols: Seq[String], sumCols: Seq[String],
                        minCols: Seq[String] = Nil,
                        maxCols: Seq[String] = Nil,
                        distinctCols: Seq[String] = Nil,
                        hllM: Int = 64,
                        groupingSets: Seq[Seq[String]] = Nil,
                        files: Int = 8, bits: Int = 8) {
    require(groupCols.nonEmpty, "at least one group column")
    require(hllM > 0 && (hllM & (hllM - 1)) == 0,
      s"hllM must be a power of two (got $hllM)")
    require(groupingSets.forall(_.forall(groupCols.contains)),
      s"every grouping set must be a subset of groupCols $groupCols")
    def sumAlias(c: String): String = c + "_sum"
    def minAlias(c: String): String = c + "_min"
    def maxAlias(c: String): String = c + "_max"
    def hllAlias(c: String): String = c + "_hll"
    /** Multi-grain mode: the view maintains the whole ROLLUP LATTICE —
      * one stored row set per grouping set, distinguished by a grain id
      * — in ONE pass per batch (native grouping sets: shared scan, one
      * shuffle with grouping-id expansion). */
    def multiGrain: Boolean = groupingSets.nonEmpty
    /** Spark's grouping_id for one set: bit (n-1-i) set when groupCols(i)
      * is aggregated away. */
    def grainId(set: Seq[String]): Long =
      groupCols.zipWithIndex.collect {
        case (c, i) if !set.contains(c) => 1L << (groupCols.size - 1 - i)
      }.sum
    /** Every stored aggregate column, in view order. */
    def aggAliases: Seq[String] =
      "cnt" +: (sumCols.map(sumAlias) ++ minCols.map(minAlias) ++
        maxCols.map(maxAlias) ++ distinctCols.map(hllAlias))
  }

  private val SpecMarker = "_graft_mv_spec.json"
  private[sinks] val KeyCol = "__mvkey"
  private[sinks] val GrainCol = "__mvgrain"
  private val ZA = "__za"
  private val ZB = "__zb"

  /** Null-safe composite key: each group value renders as `=value`, NULL
    * as `∅` — unambiguous as long as values avoid the U+0001 separator. */
  private def keyExpr(spec: Spec): Column = {
    val parts = spec.groupCols.map(c =>
      when(col(c).isNull, lit("∅"))
        .otherwise(concat(lit("="), col(c).cast("string"))))
    // multi-grain views prefix the GRAIN ID, so a lattice row whose
    // aggregated-away column reads NULL can never collide with a finer
    // grain's genuinely-NULL group value
    val all = if (spec.multiGrain)
      concat(lit("#"), col(GrainCol).cast("string")) +: parts
    else parts
    concat_ws("", all: _*)
  }

  /** Key-adjacent columns the merge groups by (the grain rides the key). */
  private def grainCols(spec: Spec): Seq[String] =
    if (spec.multiGrain) Seq(GrainCol) else Nil

  /** One batch's partial-aggregate rows in view schema (key, z-layout
    * cols, [grain], group cols, cnt, sums, extrema, HLL registers). A
    * multi-grain spec computes the whole lattice with NATIVE grouping
    * sets — one scan, one shuffle with grouping-id expansion — and tags
    * each row's grain with `grouping_id()`. */
  private def partial(batch: DataFrame, spec: Spec): DataFrame = {
    val aggs =
      (if (spec.multiGrain)
        Seq(grouping_id().cast("long").as(GrainCol)) else Nil) ++
      Seq(count(lit(1)).as("cnt")) ++
      spec.sumCols.map(c => sum(col(c)).as(spec.sumAlias(c))) ++
      spec.minCols.map(c => min(col(c)).as(spec.minAlias(c))) ++
      spec.maxCols.map(c => max(col(c)).as(spec.maxAlias(c))) ++
      spec.distinctCols.map(c => graft.functions.KernelAggs
        .hll_registers(col(c).cast("string"), spec.hllM)
        .as(spec.hllAlias(c)))
    val grouped =
      if (spec.multiGrain)
        batch.groupingSets(spec.groupingSets.map(_.map(col)),
          spec.groupCols.map(col): _*)
      else batch.groupBy(spec.groupCols.map(col): _*)
    grouped.agg(aggs.head, aggs.tail: _*).transform(withLayout(spec))
  }

  /** Merge-side re-aggregation of stored partials: sum-of-sums,
    * min-of-mins, max-of-maxes, register-wise max of HLL registers (a
    * fold over built-ins — zip_with/greatest — so the merge stays in
    * whole-stage codegen). */
  private def remerge(spec: Spec): Seq[Column] =
    spec.sumCols.map(c => sum(col(spec.sumAlias(c))).as(spec.sumAlias(c))) ++
      spec.minCols.map(c => min(col(spec.minAlias(c))).as(spec.minAlias(c))) ++
      spec.maxCols.map(c => max(col(spec.maxAlias(c))).as(spec.maxAlias(c))) ++
      spec.distinctCols.map { c =>
        val a = spec.hllAlias(c)
        aggregate(collect_list(col(a)),
          array_repeat(lit(0L), spec.hllM),
          (acc, x) => zip_with(acc, x, (p, q) => greatest(p, q))).as(a)
      }

  private def withLayout(spec: Spec)(df: DataFrame): DataFrame = {
    val mask = (1L << spec.bits) - 1L
    df.withColumn(KeyCol, keyExpr(spec))
      .withColumn(ZA, pmod(xxhash64(col(KeyCol)), lit(mask + 1)))
      .withColumn(ZB, pmod(xxhash64(lit("z"), col(KeyCol)), lit(mask + 1)))
  }

  private def fenceJson(batchId: Long): String = s"""{"batchId":$batchId}"""

  /** The fence's batch id, or None before the first commit. */
  def lastCommitted(spark: SparkSession, root: String): Option[Long] =
    LakeDelete.readFence(spark, root).map { s =>
      val m = java.util.regex.Pattern.compile("\"batchId\"\\s*:\\s*(-?\\d+)")
        .matcher(s)
      require(m.find(), s"unparseable fence at $root: $s")
      m.group(1).toLong
    }

  /** Merge one batch's partial aggregates into the view at `root`.
    * Returns false (and does NOTHING) when `batchId` is at-or-below the
    * committed fence — the replay path. */
  def mergeBatch(spark: SparkSession, root: String, batch: DataFrame,
                 spec: Spec, batchId: Long,
                 maxReadKeys: Int = 65536,
                 maxWriteKeys: Int = 100000): Boolean =
    // the merge's own partials aggregate the (possibly MvRewrite-
    // registered) base — suppress the rewrite rule for this thread so
    // the view is never merged into itself (review-caught double-count)
    graft.plans.MvRewrite.suppressed {
      mergeBatchImpl(spark, root, batch, spec, batchId, maxReadKeys,
        maxWriteKeys)
    }

  private def mergeBatchImpl(spark: SparkSession, root: String,
                             batch: DataFrame, spec: Spec, batchId: Long,
                             maxReadKeys: Int,
                             maxWriteKeys: Int): Boolean = {
    // heal a half-applied previous merge BEFORE the fence check: a crash
    // between its journal publish and its fence write leaves the commit
    // durable but the fence stale — recovery applies journal AND fence in
    // one idempotent pass, so the check below sees the truth. Checking
    // first and recovering later would re-merge an already-committed
    // batch: the double-count this fence exists to prevent.
    LakeDelete.recover(spark, root)
    if (lastCommitted(spark, root).exists(_ >= batchId)) return false
    // ONE materialization of the batch's partial aggregate serves
    // everything downstream: the empty-batch check (was a separate
    // `batch.isEmpty` job — a second scan of the batch), the bootstrap
    // write (whose histogram + write passes each recomputed the
    // aggregate), and the incremental lanes. partial() of an empty batch
    // has zero groups, so delta.isEmpty ⇔ batch.isEmpty. Eager
    // checkpoint measured equal-or-better than lazy here (the consumers
    // re-read the blocks several times; the dedicated fill job is cheap).
    val delta = partial(batch, spec).localCheckpoint(true)
    // an empty batch merges nothing and moves no fence (replaying an
    // empty is vacuously exactly-once); bootstrapping on one would
    // create a rowless root — wait for real data instead
    if (delta.isEmpty) return false
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val marker = new Path(rootPath, SpecMarker)
    if (LakeDelete.readFence(spark, root).isEmpty) {
      // BOOTSTRAP, replay-safe by construction: data + ownership marker
      // are fully written in a SIBLING staging dir, renamed into place
      // atomically, then the fence lands. Every crash state is
      // unambiguous under "no fence": root absent = redo from scratch
      // (stale staging discarded); root present WITH marker = our
      // half-bootstrap (between rename and fence) = wipe and redo; root
      // present WITHOUT marker = someone else's data = refuse — never
      // adopt or wipe a directory this view does not own.
      if (fs.exists(rootPath)) {
        require(fs.exists(marker),
          s"$root exists but is not a MaterializedAgg view (no $SpecMarker)")
        fs.delete(rootPath, true)
      }
      val stage = new Path(rootPath.getParent,
        rootPath.getName + ".bootstrap")
      if (fs.exists(stage)) fs.delete(stage, true)
      Sinks.zorderedWrite(delta, ZA, ZB, stage.toString,
        numFiles = spec.files, bits = spec.bits, bloomCols = Seq(KeyCol))
      val out = fs.create(new Path(stage, SpecMarker), true)
      try out.write(
        (s"""{"groupCols":${spec.groupCols.mkString("[\"", "\",\"", "\"]")},""" +
          s""""sumCols":${if (spec.sumCols.isEmpty) "[]"
            else spec.sumCols.mkString("[\"", "\",\"", "\"]")}}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      require(fs.rename(stage, rootPath), s"could not publish view at $root")
      // fence LAST: its absence marks the bootstrap incomplete
      LakeDelete.publishFence(spark, root, fenceJson(batchId))
      bootstrapTestHook.get()()
      return true
    }
    // INCREMENTAL: current rows for the touched keys (bloom/InSet-pruned
    // read — cost follows the batch, not the view), plus the batch's
    // partials (the checkpointed `delta` above), re-aggregated
    // (sum-of-sums) and upserted atomically with the fence.
    val cols = delta.columns
    val current = graft.operators.DynamicPrune.readSemiFiltered(
      spark, root, KeyCol, delta, col(KeyCol), maxKeys = maxReadKeys)
      .select(cols.map(col): _*)
    val merged = current.union(delta)
      .groupBy((KeyCol +: (grainCols(spec) ++ spec.groupCols)).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), remerge(spec): _*)
      // write back ONLY touched keys: when the pruned read fell back to
      // the full view (batch past DynamicPrune's key cap), the union
      // above carries every key — without this restriction the upsert
      // would rewrite the whole view (and trip its own key bound)
      .join(delta.select(col(KeyCol)).distinct(), Seq(KeyCol), "left_semi")
      .transform(withLayout(spec)) // key + z-layout derived in ONE place
      .select(cols.map(col): _*)
    LakeDelete.upsertLake(spark, root, merged, KeyCol,
      maxKeys = maxWriteKeys, fence = Some(fenceJson(batchId)))
    true
  }

  /** Standard HLL bias constant (mirrors the manifest-sketch estimator). */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HLL distinct estimate from a register-array column — harmonic mean
    * with the standard small-range linear-counting correction, libm-free.
    * 2^-r via an exact literal table (1/(1<<r) — every value exactly
    * representable). r runs to 60, NOT 57: [[graft.functions.KernelAggs
    * .HllAgg]]'s rank is ntz(hash60/m)+1, which reaches 58-60 when
    * m < 8 (m = 1/2/4 pass the power-of-two require), and element_at
    * past the table end is an ANSI runtime error / silent NULL estimate
    * (ADVICE r13). Linear counting via the pure-integer fixed-point log
    * (m·(lnm(m) − lnm(zeros))/10⁶) — the ZLake estimator's formulas
    * exactly. */
  private[graft] def hllEstimate(regs: Column, m: Int): Column = {
    val pow2Inv = typedLit((0 to 60).map(r => 1.0 / (1L << r).toDouble))
    val invSum = aggregate(regs, lit(0.0),
      (acc, x) => acc + element_at(pow2Inv, x.cast("int") + 1))
    val raw = lit(hllAlpha(m) * m * m) / invSum
    val zeros = size(filter(regs, x => x === 0L))
    when(raw <= lit(2.5 * m) && zeros > 0,
      round((lit(m.toLong) *
        (lit(graft.functions.Kernels.lnFixMicros(m.toLong)) -
          graft.functions.KernelExprs.ln_fix_micros(zeros.cast("long"))))
        .cast("double") / lit(1000000.0)))
      .otherwise(round(raw)).cast("long")
  }

  /** The view's rows: group columns + `cnt` + per-column sums/extrema +
    * HLL registers, plus a derived `<c>_distinct` estimate per distinct
    * column ([[hllEstimate]]). The internal key/layout columns drop
    * out. */
  def readView(spark: SparkSession, root: String, spec: Spec): DataFrame = {
    val base = ZLake.read(spark, root)
    val m = spec.hllM
    val withEst = spec.distinctCols.foldLeft(base) { (df, c) =>
      df.withColumn(c + "_distinct", hllEstimate(col(spec.hllAlias(c)), m))
    }
    withEst.select((grainCols(spec) ++ spec.groupCols ++ spec.aggAliases ++
      spec.distinctCols.map(_ + "_distinct")).map(col): _*)
  }

  /** One grain of a multi-grain view: the rows of the grouping set
    * `set`, projected to ITS columns + the aggregates — i.e.
    * `readGrain(..., Seq("g"))` is the lattice's `GROUP BY g` slice,
    * `readGrain(..., Nil)` its grand total, each a file-pruned read of
    * the one stored lattice instead of a recompute. */
  def readGrain(spark: SparkSession, root: String, spec: Spec,
                set: Seq[String]): DataFrame = {
    require(spec.multiGrain, "readGrain needs a groupingSets spec")
    require(spec.groupingSets.exists(_.toSet == set.toSet),
      s"$set is not one of the view's grouping sets ${spec.groupingSets}")
    readView(spark, root, spec)
      .filter(col(GrainCol) === spec.grainId(set))
      .select((set ++ spec.aggAliases ++
        spec.distinctCols.map(_ + "_distinct")).map(col): _*)
  }

  /** Compact the view in place: every merge adds a few upsert files, so a
    * months-old view plans thousands of them — this rewrites the whole
    * (small) view as one fresh z-layout through the journal
    * ([[LakeDelete.rewriteLake]]): crash-atomic, fence and ownership
    * marker untouched, key blooms regenerated, so exactly-once
    * maintenance continues across the compaction. */
  def compactView(spark: SparkSession, root: String,
                  spec: Spec): LakeDelete.RewriteReport =
    LakeDelete.rewriteLake(spark, root, (ZA, ZB),
      numFiles = spec.files, bits = spec.bits, bloomCols = Seq(KeyCol))

  /** Streaming maintenance: each micro-batch merges exactly once (fence-
    * checked under replay; journal-recovered under crash). The batch is
    * scanned exactly once — mergeBatch aggregates it into the checkpointed
    * `delta` up front, so pre-materializing the raw batch here would be a
    * second full pass for nothing. */
  def maintain(updates: DataFrame, root: String, spec: Spec,
               checkpoint: String,
               interval: String = "5 minutes"): DataStreamWriter[Row] =
    updates.writeStream
      .trigger(Trigger.ProcessingTime(interval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // mergeBatch owns the empty-batch no-op — no pre-check job here
        mergeBatch(batch.sparkSession, root, batch, spec, id)
        mergeTestHook.get()()
        ()
      }

  /** Test seams: after a bootstrap / after each merge commit, BEFORE the
    * streaming epoch commits — crash-injection points for replay tests. */
  private[graft] val bootstrapTestHook =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](() => ())
  private[graft] val mergeTestHook =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](() => ())
}
