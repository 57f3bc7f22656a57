package graft.sinks

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
  Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ZLake

/** Copy-on-write DELETE over the z-lake — the lakehouse mutation path
  * (the `DELETE FROM t WHERE p` every GDPR/retention pipeline needs) at
  * the cost model a 100 TB lake requires: the predicate is evaluated
  * against the manifest's per-file envelopes FIRST, so only files that can
  * actually hold a matching row are touched at all.
  *
  * Per-file triage via the lake's own envelope algebra:
  *  - `!mayMatch(p, file)` — no row can match: the file is UNTOUCHED
  *    (not read, not rewritten; at scale this is almost all of the lake);
  *  - `mustMatch(p, file)` — EVERY row provably matches: the file is
  *    dropped whole, METADATA-ONLY (never read — the Iceberg-style
  *    metadata delete; a whole-partition retention drop costs zero tasks);
  *  - otherwise — the file is rewritten without its matching rows (one
  *    task per file, parallel across files).
  * Partition columns participate exactly: each file's `col=value` path
  * values are substituted into the predicate as literals and the result
  * constant-folds before the envelope test, so `WHERE win < '202601'`
  * triages whole directories without reading anything.
  *
  * SQL semantics: DELETE removes rows where `p` IS TRUE; rows where `p` is
  * FALSE or NULL survive (the rewrite keeps `NOT coalesce(p, false)`).
  *
  * CRASH-SAFE via a staged-files + journal protocol (the miniature of a
  * lakehouse commit log): replacements are fully written under
  * `_deleting/` (a '_'-prefixed path every reader ignores), then ONE
  * journal file is published atomically, then the journal is applied
  * (delete originals, move replacements in — idempotent steps), manifests
  * repaired incrementally ([[ZLake.repairDirManifest]] — untouched files
  * keep their exact entries, replaced files get fresh envelopes + stats in
  * the old manifest's layout), and the journal retired. A crash
  *  - before the journal publish leaves the lake bit-identical (staging is
  *    invisible; the stale `_deleting/` is discarded on the next call);
  *  - after the publish is healed by [[recover]] (run automatically at the
  *    start of every [[deleteFromLake]]): re-applying the journal is
  *    idempotent, so the delete completes exactly once.
  * As with [[Sinks.compactLake]], a concurrent reader mid-apply can catch
  * a single file between its delete and its replacement's rename — the
  * same per-file swap window every in-place rewriter has without full
  * snapshot isolation; ZLake planning from the repaired manifest closes it
  * for planning-time readers.
  */
object LakeDelete {

  /** What one delete did. `rowsDeleted` is exact when every touched file
    * had a known row count (manifest- or footer-covered — always true for
    * lakes this repo writes); otherwise -1. */
  final case class DeleteReport(filesTotal: Int, filesUntouched: Int,
                                filesDroppedWhole: Int, filesRewritten: Int,
                                rowsDeleted: Long, recoveredFirst: Boolean)

  /** What one upsert did: the keyed delete's triage plus the insert side.
    * `delete.rowsDeleted` counts replaced rows; `rowsInserted` counts all
    * rows of the update batch. */
  final case class UpsertReport(delete: DeleteReport, filesAdded: Int,
                                rowsInserted: Long)

  private val JournalName = "_graft_delete_journal.json"
  private val StageDirName = "_deleting"
  private val FenceName = "_graft_fence.json"

  /** The lake's commit FENCE: an opaque caller string (e.g. a streaming
    * batch id) published atomically WITH a merge — it rides the journal,
    * and [[applyJournal]] materializes it before retiring, so "the merge
    * landed" and "the fence shows it" are one crash-safe step. The
    * exactly-once handshake for non-idempotent maintenance
    * ([[MaterializedAgg]]): a replayed batch reads the fence first and
    * skips itself if its id already committed. */
  def readFence(spark: SparkSession, root: String): Option[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val fp = new Path(rootPath, FenceName)
    if (!fs.exists(fp)) None
    else {
      val in = fs.open(fp)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Publish a fence OUTSIDE a journal commit — for writers whose data
    * step is itself atomic-or-redoable (e.g. [[MaterializedAgg]]'s
    * bootstrap, where fence-absence marks the whole root redo-able). */
  private[sinks] def publishFence(spark: SparkSession, root: String,
                                  fence: String): Unit = {
    val rootPath = new Path(root)
    writeFence(rootPath.getFileSystem(spark.sessionState.newHadoopConf()),
      rootPath, fence)
  }

  private def writeFence(fs: FileSystem, root: Path, fence: String): Unit = {
    val tmp = new Path(root, s".$FenceName.tmp")
    val out = fs.create(tmp, true)
    try out.write(fence.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(root, FenceName)
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"could not publish fence at $dst")
  }

  /** Delete every row of the lake at `root` satisfying `predicate`
    * (unresolved column refs — `col("a") > 5 && col("win") === "x"`).
    * Returns the per-class file counts and rows removed. Idempotent: a
    * second call with the same predicate touches nothing (the envelopes of
    * the rewritten files no longer intersect it, except boundary-loose
    * files which rewrite to themselves). */
  def deleteFromLake(spark: SparkSession, root: String,
                     predicate: Column): DeleteReport = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    require(fs.exists(rootPath), s"no lake at $root")
    val recovered = recover(spark, root)
    val stageRoot0 = new Path(rootPath, StageDirName)
    if (fs.exists(stageRoot0)) { fs.delete(stageRoot0, true); () } // pre-journal leftovers
    deleteCore(spark, root, predicate, Nil, recovered)
  }

  final case class RewriteReport(filesBefore: Int, filesAfter: Int,
                                 rows: Long)

  /** Journal-atomic WHOLE-LAKE REWRITE — the compaction a FLAT
    * (partitionless) lake needs after incremental growth: a long-lived
    * [[MaterializedAgg]] view gains a handful of upsert files per merge,
    * and after 10^4 merges its read plans 10^4 small files. This rewrites
    * the entire current file set as one fresh z-ordered layout through
    * the SAME staged-files + journal commit the delete/upsert path uses:
    * replacement files land invisibly under the stage dir, the journal
    * (drop = every current file, add = the compact set) publishes
    * atomically, and a crash at ANY point either leaves the old layout
    * intact or is healed by [[recover]] into the new one. The commit
    * fence and any ownership markers are separate root files the journal
    * never touches — exactly-once maintenance state survives compaction.
    * Partitioned lakes have [[Sinks.compactLake]] (per-window swaps with
    * closed-window cutoffs); this operator refuses them. */
  def rewriteLake(spark: SparkSession, root: String,
                  zorderBy: (String, String), numFiles: Int, bits: Int = 8,
                  bloomCols: Seq[String] = Nil): RewriteReport = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    require(fs.exists(rootPath), s"no lake at $root")
    recover(spark, root)
    val idx = ZLake.index(spark, root)
    if (idx.fes.isEmpty) return RewriteReport(0, 0, 0L)
    require(idx.fes.forall(_.partitionValues.isEmpty),
      s"rewriteLake is for flat lakes; $root is partitioned — use compactLake")
    val rows = ZLake.read(spark, root)

    val stageRoot = new Path(rootPath, StageDirName)
    if (fs.exists(stageRoot)) { fs.delete(stageRoot, true); () }
    val tmp = new Path(stageRoot, ".compact")
    Sinks.zorderedWrite(rows, zorderBy._1, zorderBy._2, tmp.toString,
      numFiles, bits, bloomCols = bloomCols)
    val parts = fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .sortBy(_.getName)
    val runId = java.util.UUID.randomUUID()
    val adds = parts.zipWithIndex.map { case (p, i) =>
      val relp = s"compact-$runId-$i.parquet"
      require(fs.rename(p, new Path(stageRoot, relp)),
        s"could not stage $relp")
      relp
    }.toSeq
    fs.delete(tmp, true)

    val rootUri = rootPath.toUri.getPath.stripSuffix("/")
    val dropRels = idx.fes.map(fe =>
      fe.status.getPath.toUri.getPath.stripPrefix(rootUri).stripPrefix("/"))
    writeJournal(fs, rootPath, dropRels, Nil, adds)
    journalPublishedHook.get()() // crash injection: committed, not applied
    applyJournal(spark, fs, rootPath)
    val total = idx.fes.map(_.rows).sum
    RewriteReport(dropRels.size, adds.size, total)
  }

  /** Keyed UPSERT (the CDC / dimension-maintenance merge): every existing
    * row whose `keyCol` appears in `updates` is removed, and ALL rows of
    * `updates` are inserted — one ATOMIC commit (the delete's journal
    * carries an `add` lane, so a crash either leaves the lake untouched or
    * applies the full merge on [[recover]]).
    *
    * Scale shape: the batch's distinct keys are collected (bounded by
    * `maxKeys` — this operator targets the dimension-update / CDC-batch
    * case, not fact-to-fact merges) and become an IN predicate, so file
    * triage runs on the manifest: per-file key ENVELOPES and — where the
    * lake was written with `bloomCols` on the key — per-file BLOOMS skip
    * every file that provably holds none of the keys. A scattered 1k-key
    * update against a 10^5-file lake rewrites only the bloom-positive
    * files. Inserts land as new files in their `win=` partition
    * directories (`updates` must carry the lake's partition columns, as
    * strings matching the directory values); a brand-new partition
    * directory is created with a plain envelope manifest.
    *
    * `updates` rows must have non-null keys; duplicate keys within one
    * batch insert as-is (the caller owns batch-level dedup). */
  def upsertLake(spark: SparkSession, root: String, updates: DataFrame,
                 keyCol: String, maxKeys: Int = 100000,
                 fence: Option[String] = None): UpsertReport = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    require(fs.exists(rootPath), s"no lake at $root")
    val recovered = recover(spark, root)
    val stageRoot = new Path(rootPath, StageDirName)
    if (fs.exists(stageRoot)) { fs.delete(stageRoot, true); () }

    val keyRows = updates.select(col(keyCol)).distinct().limit(maxKeys + 1)
      .collect()
    require(keyRows.length <= maxKeys,
      s"upsert batch has more than $maxKeys distinct keys — this operator " +
        "is for dimension/CDC batches; merge bigger sets in batches")
    val keys = keyRows.map(_.get(0))
    require(!keys.contains(null), "upsert keys must be non-null")
    require(keys.nonEmpty, "empty upsert batch")

    // ---- stage the insert files (before the journal: invisible) ---------
    val partCols = ZLake.index(spark, root).partitionCols
    val missing = partCols.filterNot(c =>
      updates.columns.exists(_.equalsIgnoreCase(c)))
    require(missing.isEmpty,
      s"updates must carry the lake's partition column(s) $missing")
    val partTuples: Seq[Seq[String]] =
      if (partCols.isEmpty) Seq(Nil)
      else updates.select(partCols.map(c => col(c).cast("string")): _*)
        .distinct().collect().map(r =>
          partCols.indices.map(i => r.getString(i)))
    var adds = Vector.empty[String]
    partTuples.zipWithIndex.foreach { case (vals, i) =>
      val dirRel = partCols.zip(vals)
        .map { case (c, v) => s"$c=$v" }.mkString("/")
      var part = updates
      partCols.zip(vals).foreach { case (c, v) =>
        part = part.filter(col(c).cast("string") === v)
      }
      part = part.drop(partCols: _*)
      val tmpDir = new Path(stageRoot, s".add-$i")
      part.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val file = fs.listStatus(tmpDir).map(_.getPath)
        .find(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .getOrElse(sys.error("staged insert produced no file"))
      if (footerRows(fs, conf, file) > 0L) {
        val name = s"upsert-${java.util.UUID.randomUUID()}.parquet"
        val relp = if (dirRel.isEmpty) name else s"$dirRel/$name"
        val dst = new Path(stageRoot, relp)
        fs.mkdirs(dst.getParent)
        require(fs.rename(file, dst), s"could not stage $dst")
        adds :+= relp
      }
      fs.delete(tmpDir, true); ()
    }
    val inserted = adds.map(r =>
      footerRows(fs, conf, new Path(stageRoot, r))).sum

    val del = deleteCore(spark, root, col(keyCol).isin(keys.toSeq: _*),
      adds, recovered, fence)
    UpsertReport(del, adds.size, inserted)
  }

  private def deleteCore(spark: SparkSession, root: String,
                         predicate: Column, adds: Seq[String],
                         recovered: Boolean,
                         fence: Option[String] = None): DeleteReport = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)

    // resolve the predicate once against the lake's read schema (partition
    // columns included), then per-file: substitute that file's partition
    // values as string literals and constant-fold, so the envelope tests
    // see only data-column comparisons and boolean constants
    val df = ZLake.read(spark, root)
    val analyzed = df.filter(predicate).queryExecution.analyzed
    val cond = analyzed.collectFirst { case Filter(c, _) => c }.getOrElse(
      throw new IllegalArgumentException(
        s"predicate did not analyze to a filter: $predicate"))
    require(cond.deterministic, "delete predicate must be deterministic")

    val idx = ZLake.index(spark, root)
    def forFile(fe: ZLake.FileEnvelope): Expression = {
      val pmap = fe.partitionValues
        .map { case (k, v) => k.toLowerCase -> v }.toMap
      val sub = cond.transform {
        case a: AttributeReference if pmap.contains(a.name.toLowerCase) =>
          Literal(UTF8String.fromString(pmap(a.name.toLowerCase)), StringType)
      }
      sub.transformUp {
        case e if e.foldable && e.deterministic =>
          try Literal(e.eval(null), e.dataType)
          catch { case NonFatal(_) => e } // e.g. ANSI cast: stay conservative
      }
    }

    sealed trait Klass
    case object Untouched extends Klass
    case object DropWhole extends Klass
    case object Rewrite extends Klass
    val triage = idx.fes.map { fe =>
      val e = forFile(fe)
      val k =
        if (!ZLake.mayMatch(e, fe)) Untouched
        else if (ZLake.mustMatch(e, fe)) DropWhole
        else Rewrite
      (fe, k)
    }
    val drops = triage.collect { case (fe, DropWhole) => fe }
    val rewrites = triage.collect { case (fe, Rewrite) => fe }
    val untouched = triage.size - drops.size - rewrites.size
    if (drops.isEmpty && rewrites.isEmpty && adds.isEmpty) {
      // nothing to commit: a bare fence write is itself atomic (one
      // rename), and replaying the no-op before it lands changes nothing
      fence.foreach(writeFence(fs, rootPath, _))
      return DeleteReport(triage.size, untouched, 0, 0, 0L, recovered)
    }

    val rootUri = rootPath.toUri.getPath.stripSuffix("/")
    def rel(p: Path): String =
      p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
    val stageRoot = new Path(rootPath, StageDirName)

    // ---- stage: write each rewrite's replacement fully, invisibly -------
    // one single-file write per rewritten file (parallel across files via
    // the driver loop's jobs; each job reads exactly one file). Keep =
    // NOT(p IS TRUE). Partition values ride in as literal columns so the
    // ORIGINAL predicate resolves per file, then drop out before writing.
    val keep = not(coalesce(predicate, lit(false)))
    var staged = Vector.empty[(String, Long, Long)] // (rel, oldRows, newRows)
    var emptied = Vector.empty[String]              // rewrites with 0 kept rows
    rewrites.zipWithIndex.foreach { case (fe, i) =>
      val src = fe.status.getPath
      var kept = spark.read.parquet(src.toString)
      fe.partitionValues.foreach { case (k, v) =>
        kept = kept.withColumn(k, lit(v))
      }
      kept = kept.filter(keep)
      fe.partitionValues.foreach { case (k, _) => kept = kept.drop(k) }
      val tmpDir = new Path(stageRoot, s".tmp-$i")
      kept.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val part = fs.listStatus(tmpDir).map(_.getPath)
        .find(p => p.getName.endsWith(".parquet") &&
          !p.getName.startsWith("_") && !p.getName.startsWith("."))
        .getOrElse(sys.error(s"staged rewrite of $src produced no file"))
      val newRows = footerRows(fs, conf, part)
      if (newRows == 0L) {
        fs.delete(tmpDir, true)
        emptied :+= rel(src)
      } else {
        val dst = new Path(stageRoot, rel(src))
        fs.mkdirs(dst.getParent)
        require(fs.rename(part, dst), s"could not stage $dst")
        fs.delete(tmpDir, true)
        staged :+= ((rel(src), fe.rows, newRows))
      }
    }

    // ---- publish the journal (the commit point), then apply -------------
    val dropRels = drops.map(fe => rel(fe.status.getPath)) ++ emptied
    writeJournal(fs, rootPath, dropRels, staged.map(_._1), adds, fence)
    journalPublishedHook.get()() // crash injection: committed, not applied
    applyJournal(spark, fs, rootPath)

    val dropRows = drops.map(_.rows) ++
      emptied.map(r => rewrites.find(fe => rel(fe.status.getPath) == r)
        .map(_.rows).getOrElse(-1L))
    val rewriteRows = staged.map { case (_, o, n) => if (o < 0) -1L else o - n }
    val allRows = dropRows ++ rewriteRows
    val rows = if (allRows.exists(_ < 0L)) -1L else allRows.sum
    DeleteReport(triage.size, untouched, dropRels.size, staged.size, rows,
      recovered)
  }

  /** Heal a delete that crashed after its journal was published: re-apply
    * the journal (idempotent) and retire it. A `_deleting/` staging dir
    * WITHOUT a journal is a pre-commit crash — the lake is intact and the
    * staging is discarded by the next [[deleteFromLake]]. Returns true if
    * a journal was found and applied. */
  def recover(spark: SparkSession, root: String): Boolean = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(rootPath, JournalName))) false
    else { applyJournal(spark, fs, rootPath); true }
  }

  /** Test seam: fires between the journal PUBLISH (the commit point) and
    * its apply — the crash window where the merge is durable but not yet
    * materialized and the fence not yet flipped. Specs park a throw here
    * to prove [[recover]]-then-fence-check sequencing is exactly-once. */
  private[graft] val journalPublishedHook =
    new java.util.concurrent.atomic.AtomicReference[() => Unit](() => ())

  // ---- journal mechanics ---------------------------------------------------

  private def writeJournal(fs: FileSystem, root: Path,
                           drops: Seq[String], replaces: Seq[String],
                           adds: Seq[String],
                           fence: Option[String] = None): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    node.put("version", 1)
    val d = node.putArray("drop"); drops.foreach(d.add)
    val r = node.putArray("replace"); replaces.foreach(r.add)
    val a = node.putArray("add"); adds.foreach(a.add)
    fence.foreach(f => node.put("fence", f))
    val tmp = new Path(root, s".$JournalName.tmp")
    val out = fs.create(tmp, true)
    try out.write(om.writeValueAsBytes(node)) finally out.close()
    val dst = new Path(root, JournalName)
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"could not publish delete journal at $dst")
  }

  /** Apply + retire the journal at `root`. Every step is idempotent, so a
    * crash mid-apply is healed by simply running this again. */
  private def applyJournal(spark: SparkSession, fs: FileSystem,
                           root: Path): Unit = {
    val jp = new Path(root, JournalName)
    if (!fs.exists(jp)) return
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(jp)
    val node = try om.readTree(in) finally in.close()
    require(node.path("version").asInt(-1) == 1, s"unknown journal at $jp")
    val drops = node.path("drop").elements().asScala.map(_.asText()).toSeq
    val replaces = node.path("replace").elements().asScala.map(_.asText()).toSeq
    val adds = node.path("add").elements().asScala.map(_.asText()).toSeq
    val stageRoot = new Path(root, StageDirName)
    // snapshot-referenced files RETIRE to the trash instead of dying —
    // time-travel reads resolve them there ([[graft.sources.Snapshots]]);
    // a lake with no snapshots takes the plain-delete path unchanged
    lazy val refs = graft.sources.Snapshots.snapshotRefs(spark, root.toString)
    drops.foreach { r =>
      val p = new Path(root, r)
      if (fs.exists(p))
        graft.sources.Snapshots.retire(fs, root, fs.getFileStatus(p), refs)
    }
    (replaces ++ adds).foreach { r =>
      val src = new Path(stageRoot, r)
      val dst = new Path(root, r)
      if (fs.exists(src)) {
        if (fs.exists(dst))
          graft.sources.Snapshots.retire(fs, root, fs.getFileStatus(dst), refs)
        fs.mkdirs(dst.getParent) // adds may open a brand-new partition dir
        require(fs.rename(src, dst), s"could not swap in $dst")
      } // else: already applied before a crash
    }
    // incremental manifest repair for every directory the journal touched
    (drops ++ replaces ++ adds).map(r => new Path(root, r).getParent).distinct
      .foreach(ZLake.repairDirManifest(spark, _))
    // materialize the fence BEFORE retiring the journal: a crash between
    // the two re-applies the journal (idempotent) and rewrites the same
    // fence, so the fence can never show a commit that did not land
    val fnode = node.path("fence")
    if (fnode.isTextual) writeFence(fs, root, fnode.asText())
    fs.delete(jp, false)
    if (fs.exists(stageRoot)) { fs.delete(stageRoot, true); () }
  }

  private def footerRows(fs: FileSystem,
                         conf: org.apache.hadoop.conf.Configuration,
                         p: Path): Long = {
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(fs.getFileStatus(p), conf))
    try rd.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally rd.close()
  }
}
