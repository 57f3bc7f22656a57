package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.StructType

/** The z-lake as a STRUCTURED STREAMING SOURCE — incremental tailing of an
  * append-grown lake, so lake→lake pipelines (ingest lake feeding a
  * report lake, a CDC view, a training-data refresh) run as standing
  * queries instead of scheduled rescans. `spark.readStream.format("zlake")
  * .load(root)` emits each newly-committed data file's rows exactly once,
  * with the same schema (data + string partition columns) the batch read
  * plans.
  *
  * Architecture (the shape of Spark's own FileStreamSource and Delta's
  * streaming source, rebuilt on the lake's manifests):
  *  - DISCOVERY is a manifest read, not a tree walk: each trigger harvests
  *    the lake's per-directory manifests ([[ZLake.harvest]] — one JSON per
  *    partition dir, zero parquet footers on a covered lake) and diffs
  *    file IDENTITIES `(relative path, length, mtime)` against the seen
  *    set. At 100k files that is a handful of small reads, where a
  *    recursive listing walks every directory every trigger.
  *  - Each batch's file list is PINNED in a source-local metadata log
  *    (`<checkpoint>/sources/N/<batchId>`, atomic tmp+rename, replayed on
  *    restart) and the streaming offset is just the batch id — tiny
  *    offsets in the checkpoint, deterministic `getBatch` replay after a
  *    crash, exactly-once end to end.
  *  - A batch plans as the SAME stats-indexed relation the batch read
  *    uses, restricted to the batch's files: downstream filters still
  *    prune at file granularity and the scan is vectorized + codegen'd.
  *
  * File identity is `(relative path, length, mtime)`. Since r10 the
  * journaled mutation paths NEVER reuse a relative path for new content
  * (rewrites journal as drop + add under fresh names), so the
  * second-granularity-mtime collision — a same-length in-place rewrite
  * within one timestamp tick reading as "unchanged" — is reachable only
  * from external writers mutating files in place, which the lake's
  * single-writer contract already excludes.
  *
  * Mutation semantics (mirrors Delta's options, fail-loud by default):
  * tailing assumes APPEND-ONLY growth ([[graft.sinks.Sinks.lakeAppend]],
  * per-window `zorderedWrite`s into new partition dirs). A file that
  * disappears (delete, retention) aborts the stream unless
  * `ignoreDeletes=true`; a file whose identity changes (compaction,
  * upsert rewrite) aborts unless `ignoreChanges=true`, which re-emits the
  * rewritten file's rows — at-least-once for the affected keys, exactly
  * the documented Delta trade. A batch replayed after files were
  * compacted away resolves missing files through the [[Snapshots]] trash
  * when a snapshot pinned them, and fails naming the file otherwise.
  *
  * Options: `startingOffset` = `earliest` (default: the lake's current
  * contents are batch 0) | `latest` (only files committed after the
  * stream starts); `ignoreDeletes`, `ignoreChanges` as above.
  *
  * Schema is pinned at stream start (standard streaming contract):
  * batches project to the start schema, so columns appended to the lake
  * later are ignored until a restart; a column REMOVED from the lake
  * fails the batch analysis loudly.
  */
final class ZLakeTail(spark: SparkSession, root: String, metadataPath: String,
                      userSchema: Option[StructType],
                      options: Map[String, String]) extends Source {

  private val opts = options.map { case (k, v) => k.toLowerCase -> v }
  private val ignoreChanges = opts.get("ignorechanges").exists(_.toBoolean)
  private val ignoreDeletes =
    ignoreChanges || opts.get("ignoredeletes").exists(_.toBoolean)
  private val startLatest = opts.getOrElse("startingoffset", "earliest") match {
    case "earliest" => false
    case "latest" => true
    case x => throw new IllegalArgumentException(
      s"zlake streaming: startingOffset must be earliest|latest, got '$x'")
  }
  /** Rate limit: at most this many new files pin into one batch; the
    * remainder waits for the next trigger (Delta's maxFilesPerTrigger).
    * Without it, the FIRST batch of an earliest-tail over a 10^5-file
    * lake is the whole lake in one epoch — one giant all-or-nothing
    * task wave instead of checkpointed increments. */
  private val maxFilesPerTrigger: Int =
    opts.get("maxfilespertrigger").map { raw =>
      val n = try raw.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"zlake streaming: maxFilesPerTrigger must be a positive " +
            s"integer, got '$raw'")
      }
      require(n > 0,
        s"zlake streaming: maxFilesPerTrigger must be positive, got $n")
      n
    }.getOrElse(Int.MaxValue)
  /** Rate limit by BYTES (Delta's maxBytesPerTrigger): a file-count cap
    * is a weak bound once compaction makes files 100x ingest size — this
    * cuts each batch at the first file that would push cumulative length
    * past the cap (always admitting at least one file, so a single
    * over-cap file still drains). Lengths come from the same identity
    * tuples the offset pins — no extra IO. Composes with
    * maxFilesPerTrigger: whichever cuts first wins. */
  private val maxBytesPerTrigger: Long =
    opts.get("maxbytespertrigger").map { raw =>
      val n = try raw.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"zlake streaming: maxBytesPerTrigger must be a positive " +
            s"long, got '$raw'")
      }
      require(n > 0L,
        s"zlake streaming: maxBytesPerTrigger must be positive, got $n")
      n
    }.getOrElse(Long.MaxValue)

  private val conf = spark.sessionState.newHadoopConf()
  private val rootPath = new Path(root)
  private val metaDir = new Path(metadataPath)
  private val mfs: FileSystem = metaDir.getFileSystem(conf)

  /** Seen file identities `rel -> (len, mtime)`, rebuilt from the log. A
    * deleted file STAYS here (tombstoned by presence): a later file at
    * the same path with a new identity is a change, not an append. */
  private val seen = mutable.Map.empty[String, (Long, Long)]
  private var lastBatchId: Long = -1L
  /** Pinned file lists by batch id: `(emit, files)`. */
  private val logEntries = mutable.SortedMap.empty[Long, (Boolean, Seq[(String, Long, Long)])]
  /** Harvest from the most recent discovery, reused by getBatch. */
  @volatile private var lastHarvest: Option[ZLake.Harvest] = None

  // ---- metadata log ------------------------------------------------------
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  if (!mfs.exists(metaDir)) { mfs.mkdirs(metaDir); () }
  mfs.listStatus(metaDir).toSeq.map(_.getPath)
    .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    .foreach { p =>
      val in = mfs.open(p)
      val node = try om.readTree(in) finally in.close()
      val id = p.getName.toLong
      val emit = node.path("emit").asBoolean(true)
      val files = node.path("files").elements().asScala.map { f =>
        (f.path("rel").asText(), f.path("len").asLong(),
          f.path("mtime").asLong())
      }.toSeq
      logEntries(id) = (emit, files)
      files.foreach { case (r, l, m) => seen(r) = (l, m) }
      lastBatchId = math.max(lastBatchId, id)
    }

  private def writeEntry(id: Long, emit: Boolean,
                         files: Seq[(String, Long, Long)]): Unit = {
    val node = om.createObjectNode()
    node.put("version", 1)
    node.put("emit", emit)
    val arr = node.putArray("files")
    files.foreach { case (r, l, m) =>
      val f = arr.addObject()
      f.put("rel", r); f.put("len", l); f.put("mtime", m); ()
    }
    val tmp = new Path(metaDir, s".$id.tmp")
    val out = mfs.create(tmp, true)
    try out.write(om.writeValueAsBytes(node)) finally out.close()
    require(mfs.rename(tmp, new Path(metaDir, id.toString)),
      s"zlake streaming: could not pin batch $id under $metaDir")
    logEntries(id) = (emit, files)
  }

  // ---- Source ------------------------------------------------------------

  override val schema: StructType = userSchema.getOrElse(
    ZLakeTail.schemaOf(spark, root))

  override def getOffset: Option[V1Offset] = {
    // merge-on-read deletion vectors are row-level retractions a
    // file-granularity tail cannot represent (v1 guard; compact first)
    if (graft.sinks.DeletionVectors.present(mfs, rootPath))
      throw new IllegalStateException(
        s"zlake streaming: $root carries merge-on-read deletion vectors " +
          "— an append-only tail cannot retract rows; run " +
          "DeletionVectors.compact(root) and restart the stream")
    val h = ZLake.harvest(spark, root)
    val live = h.fes.map(fe =>
      ZLake.relPath(rootPath, fe.status.getPath) -> fe).toMap

    val gone = seen.keys.filterNot(live.contains).toSeq.sorted
    if (gone.nonEmpty && !ignoreDeletes) throw new IllegalStateException(
      s"zlake streaming: ${gone.size} tailed file(s) disappeared from " +
        s"$root (first: ${gone.head}) — a DELETE or compaction ran under " +
        "an append-only tail. Pause maintenance, or opt in with " +
        "ignoreDeletes=true (deletes invisible) / ignoreChanges=true " +
        "(rewrites re-emit their rows, at-least-once).")

    val fresh = mutable.ArrayBuffer.empty[(String, Long, Long)]
    live.toSeq.sortBy(_._1).foreach { case (rel, fe) =>
      val id = (fe.status.getLen, fe.status.getModificationTime)
      seen.get(rel) match {
        case None => fresh += ((rel, id._1, id._2))
        case Some(old) if old != id =>
          if (!ignoreChanges) throw new IllegalStateException(
            s"zlake streaming: $rel changed identity under an append-only " +
              s"tail (len/mtime $old -> $id) — compaction or upsert ran. " +
              "Pause maintenance, or opt in with ignoreChanges=true " +
              "(the rewritten file re-emits all its rows, at-least-once).")
          fresh += ((rel, id._1, id._2))
        case _ =>
      }
    }
    // `latest` pins its baseline at the FIRST discovery — even over an
    // empty lake (a possibly-empty non-emitting batch 0), so "files
    // committed after the stream started" has a durable anchor and the
    // first real window is never swallowed as a late baseline. The
    // baseline is whole, never rate-limited (nothing is read from it);
    // every later discovery emits at most maxFilesPerTrigger files per
    // batch — the remainder stays unseen and re-discovers next trigger
    // (identities are stable, so this is just a cut).
    if (fresh.nonEmpty || (startLatest && lastBatchId < 0)) {
      val emit = !(startLatest && lastBatchId < 0)
      val take =
        if (!emit) fresh.toSeq
        else {
          // prefix cut under BOTH caps: stop at the first file that would
          // cross the byte budget (keeping the pin a contiguous prefix of
          // the sorted discovery, as replay determinism requires); a
          // single over-budget file is still admitted alone
          val buf = mutable.ArrayBuffer.empty[(String, Long, Long)]
          var bytes = 0L
          var done = false
          fresh.foreach { f =>
            if (!done) {
              if (buf.size >= maxFilesPerTrigger ||
                (buf.nonEmpty && bytes + f._2 > maxBytesPerTrigger)) done = true
              else { buf += f; bytes += f._2 }
            }
          }
          buf.toSeq
        }
      writeEntry(lastBatchId + 1, emit, take)
      lastBatchId += 1
      take.foreach { case (r, l, m) => seen(r) = (l, m) }
    }
    lastHarvest = Some(h)
    if (lastBatchId < 0) None else Some(LongOffset(lastBatchId))
  }

  private def offsetId(o: V1Offset): Long = o match {
    case LongOffset(x) => x
    case SerializedOffset(json) => json.trim.toLong
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val lo = start.map(offsetId).getOrElse(-1L)
    val hi = offsetId(end)
    val wanted = logEntries.range(lo + 1, hi + 1)
      .filter { case (id, (emit, _)) => emit && id > lo }
      .values.flatMap(_._2).toSeq
    if (wanted.isEmpty)
      return PlanBridge.dataFrame(spark,
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
          org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(
            schema),
          Seq.empty, isStreaming = true))

    val h = lastHarvest.getOrElse(ZLake.harvest(spark, root))
    val liveMap = h.fes.map(fe =>
      ZLake.relPath(rootPath, fe.status.getPath) -> fe).toMap
    val fs = rootPath.getFileSystem(conf)
    val fes = wanted.flatMap { case (rel, len, mtime) =>
      liveMap.get(rel)
        .filter(fe => fe.status.getLen == len &&
          fe.status.getModificationTime == mtime) match {
        case Some(fe) => Some(fe)
        case None =>
          // the pinned file left the live tree between pin and replay:
          // resolve through the snapshot trash (identical identity), and
          // only under ignoreChanges accept reading a same-path rewrite
          val trash = new Path(new Path(rootPath, Snapshots.TrashDirName),
            s"$mtime-$len/$rel")
          if (fs.exists(trash)) {
            val parts = rel.split("/").dropRight(1).toSeq
              .flatMap(_.split("=", 2) match {
                case Array(k, v) => Seq(k.toLowerCase -> v)
                case _ => Nil
              })
            Some(ZLake.FileEnvelope(fs.getFileStatus(trash), 1,
              Map.empty, parts, -1L))
          } else if (ignoreChanges && liveMap.contains(rel)) liveMap.get(rel)
          else if (ignoreChanges || ignoreDeletes) None
          else throw new IllegalStateException(
            s"zlake streaming: cannot replay batch $hi — pinned file $rel " +
              s"(len=$len) is neither live nor snapshot-trashed. A " +
              "maintenance pass rewrote the lake under the tail; restart " +
              "from a fresh checkpoint, or run with ignoreChanges=true.")
      }
    }
    val idx = new ZLake.StatsFileIndex(rootPath, fes, h.schema)
    val df = PlanBridge.dataFrame(spark, LogicalRelation(
      ZLake.relationWith(spark, root, idx), isStreaming = true))
    // pin to the start-time schema: later-appended columns drop out,
    // removed columns fail analysis loudly here
    df.select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"ZLakeTail[$root]"
}

object ZLakeTail {
  /** The tail's schema: the batch relation's (data + partition cols). */
  def schemaOf(spark: SparkSession, root: String): StructType =
    ZLake.read(spark, root).schema
}
