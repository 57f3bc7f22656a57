package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeDelete, Sinks}
import graft.sources.ZLake

/** Copy-on-write DELETE over the z-lake ([[LakeDelete.deleteFromLake]]):
  * envelope-triaged (untouched / metadata-only whole-file drop / rewrite),
  * SQL null semantics, journal crash-safety, and incremental manifest
  * repair that keeps the zero-scan stats paths (sums, HLL sketches) alive
  * across the mutation. */
class LakeDeleteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val n = 4096

  /** (id, a, b, phone nullable, u) — a 64x64 grid per window. */
  private def source: DataFrame =
    spark.range(n).select(
      col("id"),
      (col("id") % 64).as("a"),
      (col("id") * 7 % 64).as("b"),
      when(col("id") % 5 =!= 0, concat(lit("p"), col("id") % 11))
        .as("phone"),
      (col("id") % 97).as("u"))

  /** win=0 / win=1 partitioned z-lake, 8 files each, sum + sketch stats. */
  private def buildLake(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-del").toString + "/t"
    for (w <- 0 to 1)
      Sinks.zorderedWrite(source.filter(col("id") % 2 === w),
        "a", "b", s"$root/win=$w", numFiles = 8, bits = 6,
        sumCols = Seq("a", "u"), sketchCols = Seq("u"), sketchM = 64)
    root
  }

  private def fileSnap(root: String): Map[String, (Long, Long)] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    ZLake.envelopes(spark, root).map { fe =>
      fe.status.getPath.toString ->
        (fe.status.getLen, fe.status.getModificationTime)
    }.toMap
  }

  private def rows(root: String): Seq[(Long, Long, Long, String)] =
    ZLake.read(spark, root)
      .select(col("id"), col("a"), col("b"), col("win"))
      .as[(Long, Long, Long, String)].collect().sorted.toSeq

  private def expect(pred: (Long, Long, Long, Int) => Boolean)
      : Seq[(Long, Long, Long, String)] =
    (0L until n).map(id => (id, id % 64, id * 7 % 64, (id % 2).toInt))
      .filterNot { case (id, a, b, w) => pred(id, a, b, w) }
      .map { case (id, a, b, w) => (id, a, b, w.toString) }.sorted

  test("delete triages untouched / drop-whole / rewrite and matches " +
      "the row-level semantics") {
    val root = buildLake()
    val before = fileSnap(root)
    val rep = LakeDelete.deleteFromLake(spark, root,
      col("win") === "1" || (col("win") === "0" && col("a") < 16))
    // every class exercised: win=1 dropped whole without a read; win=0
    // files whose a-envelope misses [0,16) untouched; boundary files
    // rewritten
    assert(rep.filesDroppedWhole >= 8, rep.toString) // all of win=1
    assert(rep.filesUntouched >= 1, rep.toString)
    assert(rep.filesRewritten >= 1, rep.toString)
    assert(rep.filesTotal == 16)
    val want = expect((_, a, _, w) => w == 1 || (w == 0 && a < 16))
    assert(rows(root) == want)
    assert(rep.rowsDeleted == n - want.size)
    // untouched files were not rewritten: same path, length, mtime
    val after = fileSnap(root)
    val untouched = before.filter { case (p, lm) => after.get(p).contains(lm) }
    assert(untouched.size == rep.filesUntouched)
  }

  test("SQL null semantics: rows where the predicate is NULL survive") {
    val root = buildLake()
    // phone is NULL for id % 5 == 0; phone < 'p3' is NULL there → survive
    LakeDelete.deleteFromLake(spark, root, col("phone") < "p3")
    val got = ZLake.read(spark, root).select(col("id"))
      .as[Long].collect().toSet
    val want = (0L until n).filterNot { id =>
      id % 5 != 0 && s"p${id % 11}" < "p3"
    }.toSet
    assert(got == want)
    assert(got.exists(_ % 5 == 0)) // the NULL-phone rows are really there
  }

  test("manifest repair keeps zero-footer planning and the stats lanes") {
    val root = buildLake()
    LakeDelete.deleteFromLake(spark, root,
      col("a") < 8 || col("win") === "1" && col("b") >= 48)
    // zero-footer planning: the repaired manifests cover every file
    val n0 = ZLake.footerOpens.get()
    val live = ZLake.read(spark, root)
    val total = live.agg(count(lit(1)), sum("a"), sum("u")).collect()(0)
    assert(ZLake.footerOpens.get() == n0, "post-delete read opened footers")
    // exact manifest sums survive the repair: per-file sums add up to the
    // scan's own aggregate (untouched files kept their entries verbatim,
    // rewritten files recomputed theirs in the inferred layout)
    val fes = ZLake.envelopes(spark, root)
    assert(fes.nonEmpty && fes.forall(_.sums.keySet == Set("a", "u")))
    assert(fes.map(_.sums("a")).sum == BigDecimal(total.getLong(1)))
    assert(fes.map(_.sums("u")).sum == BigDecimal(total.getLong(2)))
    // HLL sketches survive too: approxDistinct still answers (±25%)
    val est = ZLake.approxDistinct(spark, root, "u", Nil)
    assert(est.isDefined, "sketches lost in repair")
    val truth = live.select(countDistinct("u")).as[Long].collect()(0)
    assert(math.abs(est.get.estimate - truth) <= 0.25 * truth,
      s"est ${est.get.estimate} vs $truth")
  }

  test("journal crash states heal: pre-commit discarded, post-commit " +
      "re-applied idempotently") {
    val root = buildLake()
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(root).getFileSystem(conf)
    // --- pre-journal crash: staging exists, no journal → lake intact ---
    val stray = new Path(root, "_deleting/win=0/garbage.parquet")
    fs.mkdirs(stray.getParent)
    fs.create(stray, true).close()
    val want = expect((_, a, _, _) => a < 4)
    val rep = LakeDelete.deleteFromLake(spark, root, col("a") < 4)
    assert(!rep.recoveredFirst)
    assert(rows(root) == want)
    assert(!fs.exists(new Path(root, "_deleting")), "staging not retired")

    // --- post-journal crash: hand-build the committed state ------------
    // journal says: drop one real file, replace another with a staged
    // substitute; recovery must apply exactly that and repair manifests
    val fes = ZLake.envelopes(spark, root)
      .filter(_.partitionValues == Seq("win" -> "1"))
    val dropFe = fes.head
    val replFe = fes.last
    val rootP = new Path(root)
    def rel(p: Path): String =
      p.toUri.getPath.stripPrefix(rootP.toUri.getPath).stripPrefix("/")
    // staged replacement: the dropped file's bytes under the replaced name
    val stagedDst = new Path(root,
      "_deleting/" + rel(replFe.status.getPath))
    fs.mkdirs(stagedDst.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, dropFe.status.getPath,
      fs, stagedDst, false, conf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.createObjectNode()
    node.put("version", 1)
    node.putArray("drop").add(rel(dropFe.status.getPath))
    node.putArray("replace").add(rel(replFe.status.getPath))
    val jp = new Path(root, "_graft_delete_journal.json")
    val out = fs.create(jp, true)
    try out.write(om.writeValueAsBytes(node)) finally out.close()

    assert(LakeDelete.recover(spark, root))
    assert(!fs.exists(dropFe.status.getPath))
    assert(fs.exists(replFe.status.getPath))
    assert(fs.getFileStatus(replFe.status.getPath).getLen
      == dropFe.status.getLen, "replacement not swapped in")
    assert(!fs.exists(jp) && !fs.exists(new Path(root, "_deleting")))
    // manifest repaired: planning is still zero-footer and row counts agree
    val n0 = ZLake.footerOpens.get()
    val cnt = ZLake.read(spark, root)
      .filter(col("win") === "1").count()
    assert(ZLake.footerOpens.get() == n0)
    // win=1 lost dropFe's rows and has replFe's rows doubled (the staged
    // copy was dropFe's content) — recompute from the manifest row counts
    val expectRows = ZLake.envelopes(spark, root)
      .filter(_.partitionValues == Seq("win" -> "1")).map(_.rows).sum
    assert(cnt == expectRows)
    // second recover: nothing to do
    assert(!LakeDelete.recover(spark, root))
  }

  /** Like [[buildLake]] but with key blooms, so upsert triage can skip
    * files that provably hold none of the batch's keys. */
  private def buildKeyedLake(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ups").toString + "/t"
    for (w <- 0 to 1)
      Sinks.zorderedWrite(source.filter(col("id") % 2 === w),
        "a", "b", s"$root/win=$w", numFiles = 8, bits = 6,
        bloomCols = Seq("id"))
    root
  }

  private def updatesFor(ids: Seq[Long]): DataFrame =
    ids.toDF("id").select(
      col("id"),
      (col("id") % 64).as("a"),
      (col("id") * 7 % 64).as("b"),
      lit("UPDATED").as("phone"),
      (col("id") % 97).as("u"),
      (col("id") % 2).cast("string").as("win"))

  test("upsert replaces keyed rows atomically and bloom-skips the rest") {
    val root = buildKeyedLake()
    // 4 scattered existing keys + 2 brand-new ones (same two windows)
    val existing = Seq(17L, 1024L, 2049L, 4000L)
    val fresh = Seq(n + 1L, n + 2L)
    val rep = LakeDelete.upsertLake(spark, root,
      updatesFor(existing ++ fresh), "id")
    assert(rep.rowsInserted == 6)
    assert(rep.delete.rowsDeleted == existing.size.toLong)
    // bloom triage: 4 keys live in at most 4 files (plus fp) of 16 —
    // most of the lake is untouched
    assert(rep.delete.filesUntouched >= 10, rep.toString)
    val got = ZLake.read(spark, root)
      .select(col("id"), col("phone")).as[(Long, Option[String])]
      .collect().toMap
    assert(got.size == n + fresh.size)
    (existing ++ fresh).foreach(id =>
      assert(got(id).contains("UPDATED"), s"id $id not upserted"))
    assert(got(18L) == (if (18L % 5 != 0) Some(s"p${18 % 11}") else None))
    // manifest coverage survives: planning stays zero-footer
    val n0 = ZLake.footerOpens.get()
    ZLake.read(spark, root).filter(col("a") === 1).count()
    assert(ZLake.footerOpens.get() == n0)
  }

  test("upsert into a brand-new partition creates the directory + manifest") {
    val root = buildKeyedLake()
    val upd = updatesFor(Seq(9999L)).withColumn("win", lit("2"))
    val rep = LakeDelete.upsertLake(spark, root, upd, "id")
    assert(rep.filesAdded == 1 && rep.delete.rowsDeleted == 0)
    val w2 = ZLake.read(spark, root).filter(col("win") === "2")
      .select(col("id")).as[Long].collect().toSeq
    assert(w2 == Seq(9999L))
    // the new directory is manifest-covered (plain envelopes)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(root, s"win=2/${ZLake.ManifestName}")))
  }

  test("the whole rewrite set stages as ONE job, not one per file") {
    val root = buildLake()
    // u = id % 97 spreads through every file's envelope, so (almost) the
    // whole lake is rewrite-class — the shape that used to pay one
    // sequential Spark job per file
    spark.sparkContext.setJobGroup("graft-del-onejob", "one-job delete", false)
    val rep =
      try LakeDelete.deleteFromLake(spark, root, col("u") === 13)
      finally spark.sparkContext.clearJobGroup()
    assert(rep.filesRewritten >= 10, rep.toString)
    val jobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("graft-del-onejob").length
    assert(jobs <= 5,
      s"delete ran $jobs jobs for ${rep.filesRewritten} rewrite-class files" +
        " — the staging loop is sequential again")
    val want = expect((id, _, _, _) => id % 97 == 13)
    assert(rows(root) == want)
    assert(rep.rowsDeleted == n - want.size)
    // a second identical delete is suppressed dir-wise: nothing changes
    val snap = fileSnap(root)
    val rep2 = LakeDelete.deleteFromLake(spark, root, col("u") === 13)
    assert(rep2.rowsDeleted == 0L, rep2.toString)
    assert(fileSnap(root) == snap, "files changed on a suppressed re-delete")
  }

  test("updateLake: CoW UPDATE with exact match counts, NULL-predicate " +
      "rows untouched, zero-match dirs suppressed") {
    val root = buildLake()
    val before = fileSnap(root)
    // phone < 'p3' is NULL for id % 5 == 0 → those rows must NOT update;
    // value references the updated column itself (u -> u + 1000)
    val rep = LakeDelete.updateLake(spark, root,
      Seq("u" -> (col("u") + 1000)),
      col("win") === "0" && col("phone") < "p3")
    val wantHits = (0L until n).count(id =>
      id % 2 == 0 && id % 5 != 0 && s"p${id % 11}" < "p3")
    assert(rep.rowsUpdated == wantHits.toLong, rep.toString)
    assert(rep.filesTotal == 16)
    // win=1 never matches the partition conjunct: all 8 files untouched
    assert(rep.filesUntouched >= 8, rep.toString)
    val got = ZLake.read(spark, root).select(col("id"), col("u"))
      .as[(Long, Long)].collect().toMap
    (0L until n).foreach { id =>
      val hit = id % 2 == 0 && id % 5 != 0 && s"p${id % 11}" < "p3"
      val want = if (hit) id % 97 + 1000 else id % 97
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
    // untouched files really untouched (same path, len, mtime)
    val after = fileSnap(root)
    assert(before.count { case (p, lm) => after.get(p).contains(lm) }
      == rep.filesUntouched)
    // zero-match predicate: byte-level no-op even where envelopes are loose
    val snap2 = fileSnap(root)
    val rep2 = LakeDelete.updateLake(spark, root,
      Seq("u" -> lit(0L)), col("phone") === "no-such-phone")
    assert(rep2.rowsUpdated == 0L && rep2.filesRewritten == 0)
    assert(fileSnap(root) == snap2, "zero-match update churned bytes")
    // partition columns cannot be assigned
    intercept[IllegalArgumentException](
      LakeDelete.updateLake(spark, root, Seq("win" -> lit("9")), lit(true)))
  }

  test("writer lock: a second writer fails fast; a stale lock is " +
      "broken; the lock never outlives the mutation") {
    val root = buildLake()
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val lock = new Path(root, "_graft_writer.lock")
    // a live foreign lock: every mutating entry point must refuse once
    // the bounded commit-window wait expires (0 here = fail fast)
    val w0 = LakeDelete.lockWaitMs.get()
    LakeDelete.lockWaitMs.set(0L)
    try {
      fs.create(lock, false).close()
      intercept[java.util.ConcurrentModificationException](
        LakeDelete.deleteFromLake(spark, root, col("a") < 4))
      intercept[java.util.ConcurrentModificationException](
        LakeDelete.updateLake(spark, root, Seq("u" -> lit(0L)), col("a") < 4))
      intercept[java.util.ConcurrentModificationException](
        LakeDelete.upsertLake(spark, root, updatesFor(Seq(1L)), "id"))
    } finally LakeDelete.lockWaitMs.set(w0)
    assert(rows(root) == expect((_, _, _, _) => false),
      "a refused writer must not have touched the lake")
    // a STALE lock (dead writer) is broken and the mutation proceeds
    val n0 = LakeDelete.staleLockMs.get()
    LakeDelete.staleLockMs.set(0L)
    try {
      val rep = LakeDelete.deleteFromLake(spark, root, col("a") < 4)
      assert(rep.rowsDeleted > 0)
    } finally LakeDelete.staleLockMs.set(n0)
    assert(!fs.exists(lock), "lock must be released after the mutation")
  }

  test("re-running the same delete is a no-op") {
    val root = buildLake()
    LakeDelete.deleteFromLake(spark, root, col("a").between(16, 31))
    val snap = fileSnap(root)
    val rep2 = LakeDelete.deleteFromLake(spark, root,
      col("a").between(16, 31))
    assert(rep2.rowsDeleted == 0L, rep2.toString)
    assert(fileSnap(root) == snap, "files changed on a no-op delete")
  }
}
