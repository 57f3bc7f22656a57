package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.Sinks
import graft.sources.{Snapshots, ZLake}

/** SQL spellings of the mutation/versioning layer ([[graft.plans
  * .GraftDml]] + `CALL graft.*`): ANSI DELETE/MERGE over a zlake view run
  * the journaled copy-on-write paths, maintenance verbs run as CALLs,
  * unsupported shapes keep Spark's standard refusal, and snapshot
  * (time-travel) targets are never mutated through. */
class SqlMutationsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def buildLake(tag: String, n: Int = 2048): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-sql-$tag").toString + "/t"
    val df = spark.range(n).select(col("id"),
      (col("id") % 64).as("a"), (col("id") * 7 % 64).as("b"),
      concat(lit("u"), (col("id") % 97).cast("string")).as("uid"))
    Sinks.zorderedWrite(df, "a", "b", root, numFiles = 4, bits = 6,
      bloomCols = Seq("id"))
    root
  }

  private def viewOver(root: String, name: String): Unit = {
    spark.sql(s"DROP VIEW IF EXISTS $name")
    spark.sql(
      s"CREATE TEMPORARY VIEW $name USING zlake OPTIONS (path '$root')")
  }

  private def ids(root: String): Set[Long] =
    ZLake.read(spark, root).select(col("id")).as[Long].collect().toSet

  test("ANSI DELETE FROM a zlake view runs the journaled CoW delete") {
    val root = buildLake("del")
    viewOver(root, "sqlmut_del")
    val rep = spark.sql(
      "DELETE FROM sqlmut_del WHERE a < 8 OR uid = 'u13'").collect()
    assert(rep.length == 1)
    assert(rep(0).getLong(4) > 0, "rows_deleted must be reported")
    val want = (0L until 2048L)
      .filterNot(id => id % 64 < 8 || id % 97 == 13).toSet
    assert(ids(root) == want)
    // the view pinned its file set at creation (parquet-parity temp-view
    // semantics); the standard REFRESH verb re-harvests the live lake
    spark.sql("REFRESH TABLE sqlmut_del")
    assert(spark.sql("SELECT count(*) AS n FROM sqlmut_del")
      .as[Long].head() == want.size.toLong)
    // idempotent: the same DELETE again deletes nothing
    val rep2 = spark.sql(
      "DELETE FROM sqlmut_del WHERE a < 8 OR uid = 'u13'").collect()
    assert(rep2(0).getLong(4) == 0L)
  }

  test("MERGE INTO (star update + star insert) runs the keyed upsert") {
    val root = buildLake("merge")
    viewOver(root, "sqlmut_tgt")
    spark.range(5).select((col("id") * 100).as("id"), lit(1L).as("a"),
      lit(2L).as("b"), lit("MERGED").as("uid"))
      .union(spark.range(1).select(lit(9999L), lit(1L), lit(2L),
        lit("MERGED")))
      .createOrReplaceTempView("sqlmut_src")
    val rep = spark.sql(
      """MERGE INTO sqlmut_tgt t USING sqlmut_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    assert(rep.length == 1)
    assert(rep(0).getLong(1) == 6L, s"rows_inserted: ${rep(0)}")
    assert(rep(0).getLong(2) == 5L, s"rows_replaced: ${rep(0)}")
    val got = ZLake.read(spark, root)
      .select(col("id"), col("uid")).as[(Long, String)].collect().toMap
    assert(got.size == 2048 + 1)
    Seq(0L, 100L, 200L, 300L, 400L, 9999L).foreach(id =>
      assert(got(id) == "MERGED", s"id $id not merged"))
    assert(got(1L) == "u1")
  }

  test("ANSI UPDATE SET runs the CoW update; bad targets refused") {
    val root = buildLake("upd")
    viewOver(root, "sqlmut_upd")
    val rep = spark.sql(
      "UPDATE sqlmut_upd SET uid = concat('X', uid), b = b + 100 " +
        "WHERE a < 4").collect()
    assert(rep.length == 1)
    val wantHits = (0L until 2048L).count(_ % 64 < 4)
    assert(rep(0).getLong(3) == wantHits.toLong, rep(0).toString)
    val got = ZLake.read(spark, root)
      .select(col("id"), col("b"), col("uid"))
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (0L until 2048L by 97L).foreach { id =>
      val (b0, u0) = (id * 7 % 64, s"u${id % 97}")
      val want = if (id % 64 < 4) (b0 + 100, s"X$u0") else (b0, u0)
      assert(got(id) == want, s"id $id: got ${got(id)}, want $want")
    }
    // an unknown assignment target fails analysis, lake untouched
    // (partition-column refusal is covered in LakeDeleteSpec, whose
    // fixture lake is partitioned)
    val before = ids(root)
    intercept[Exception](spark.sql(
      "UPDATE sqlmut_upd SET no_such_col = 9 WHERE a < 4").collect())
    assert(ids(root) == before)
  }

  test("unsupported MERGE shapes keep Spark's refusal (no silent merge)") {
    val root = buildLake("mrefuse", n = 64)
    viewOver(root, "sqlmut_refuse")
    spark.range(2).select(col("id"), lit(1L).as("a"), lit(2L).as("b"),
      lit("X").as("uid")).createOrReplaceTempView("sqlmut_refuse_src")
    val before = ids(root)
    // compound (non-single-equi-key) ON condition — must refuse
    val e = intercept[Exception](spark.sql(
      """MERGE INTO sqlmut_refuse t USING sqlmut_refuse_src s
        |ON t.id = s.id AND t.a > 1
        |WHEN MATCHED THEN UPDATE SET uid = s.uid""".stripMargin).collect())
    assert(e.getMessage != null)
    // INSERT with reshuffled (non-name-for-name) assignments — refuse
    intercept[Exception](spark.sql(
      """MERGE INTO sqlmut_refuse t USING sqlmut_refuse_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, a, b, uid)
        |VALUES (s.id, s.b, s.a, s.uid)""".stripMargin).collect())
    // NOT MATCHED BY SOURCE — refuse
    intercept[Exception](spark.sql(
      """MERGE INTO sqlmut_refuse t USING sqlmut_refuse_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).collect())
    assert(ids(root) == before, "refused MERGE must not touch the lake")
  }

  test("conditioned MERGE: WHEN MATCHED AND c THEN UPDATE SET <subset> " +
      "with both-sides values; untouched matches keep their bytes") {
    val root = buildLake("mcond", n = 2048)
    viewOver(root, "sqlmut_cond")
    // source: keys %5==0 under 512; flag drives the clause condition
    spark.range(2048).filter(col("id") % 5 === 0 && col("id") < 512)
      .select(col("id"), (col("id") % 3).as("flag"), lit(1000L).as("bonus"))
      .createOrReplaceTempView("sqlmut_cond_src")
    val rep = spark.sql(
      """MERGE INTO sqlmut_cond t USING sqlmut_cond_src s ON t.id = s.id
        |WHEN MATCHED AND s.flag = 0 THEN
        |  UPDATE SET b = t.b + s.bonus, uid = concat(t.uid, '!')
        |""".stripMargin).collect()
    val matchedFlag0 = (0L until 512L).filter(i => i % 5 == 0 && i % 3 == 0)
    assert(rep(0).getLong(0) == matchedFlag0.size.toLong,
      s"rows_updated: ${rep(0)}")
    assert(rep(0).getLong(1) == 0L && rep(0).getLong(2) == 0L)
    val got = ZLake.read(spark, root)
      .filter(col("uid").endsWith("!"))
      .select(col("id"), col("b")).as[(Long, Long)].collect().toMap
    assert(got.keySet == matchedFlag0.toSet)
    matchedFlag0.foreach(i => assert(got(i) == (i * 7 % 64) + 1000L,
      s"post-image of $i wrong: ${got(i)}"))
    // everything else byte-untouched in value terms
    assert(ids(root) == (0L until 2048L).toSet)
  }

  test("conditioned MERGE: first-match precedence across UPDATE and " +
      "DELETE clauses, plus conditional INSERT *") {
    val root = buildLake("mmix", n = 1024)
    viewOver(root, "sqlmut_mix")
    // keys 0,5,..,495 matched (cls = id%4 hits every class); 5000-5009
    // unmatched (insert candidates)
    val src = spark.range(100).select((col("id") * 5).as("id"))
      .unionByName(spark.range(10).select((col("id") + 5000).as("id")))
      .select(col("id"), (col("id") % 64).as("a"),
        (col("id") * 7 % 64).as("b"),
        concat(lit("m"), col("id")).as("uid"),
        (col("id") % 4).as("cls"))
    src.createOrReplaceTempView("sqlmut_mix_src")
    val rep = spark.sql(
      """MERGE INTO sqlmut_mix t USING sqlmut_mix_src s ON t.id = s.id
        |WHEN MATCHED AND s.cls = 0 THEN UPDATE SET uid = s.uid
        |WHEN MATCHED AND s.cls <= 2 THEN DELETE
        |WHEN NOT MATCHED AND s.cls = 0 THEN INSERT *
        |""".stripMargin).collect()
    val matched = (0L until 500L by 5L).toSeq
    val updated = matched.filter(_ % 4 == 0) // first clause wins
    val deleted = matched.filter(i => i % 4 != 0 && i % 4 <= 2)
    val inserted = (5000L until 5010L).filter(_ % 4 == 0)
    assert(matched.count(_ % 4 == 3) > 0, "fixture must cover no-clause")
    assert(rep(0).getLong(0) == updated.size.toLong, s"upd ${rep(0)}")
    assert(rep(0).getLong(1) == deleted.size.toLong, s"del ${rep(0)}")
    assert(rep(0).getLong(2) == inserted.size.toLong, s"ins ${rep(0)}")
    val want = (0L until 1024L).toSet -- deleted ++ inserted
    assert(ids(root) == want)
    val renamed = ZLake.read(spark, root)
      .filter(col("uid").startsWith("m")).select(col("id"))
      .as[Long].collect().toSet
    assert(renamed == updated.toSet ++ inserted)
    // cls==3 matches fired NO clause: still present, uid untouched
    val untouched = matched.filter(_ % 4 == 3)
    assert(untouched.forall(want.contains))
    assert(untouched.forall(i => !renamed.contains(i)))
  }

  test("mergeLake refuses duplicate source keys; Scala API composes " +
      "conditions from both aliases") {
    import graft.sinks.LakeDelete
    val root = buildLake("mdup", n = 128)
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("id", "v")
    val e = intercept[IllegalArgumentException](
      LakeDelete.mergeLake(spark, root, dup, "id",
        Seq(LakeDelete.MergeMatched(None,
          Some(Seq("a" -> col("s.v")))))))
    assert(e.getMessage.contains("duplicate"))
    // Scala spelling of a conditioned clause over t. and s. refs
    val src = Seq((7L, 100L), (9L, 200L)).toDF("id", "v")
    val rep = LakeDelete.mergeLake(spark, root, src, "id",
      Seq(LakeDelete.MergeMatched(Some(col("t.id") === 7L),
        Some(Seq("b" -> (col("t.b") + col("s.v")))))))
    assert(rep.rowsUpdated == 1L && rep.rowsDeleted == 0L &&
      rep.rowsInserted == 0L)
    val b7 = ZLake.read(spark, root).filter(col("id") === 7L)
      .select(col("b")).as[Long].head()
    assert(b7 == (7L * 7 % 64) + 100L)
  }

  test("CALL graft.delete/snapshot/vacuum/upsert round-trip") {
    val root = buildLake("call")
    // snapshot, mutate via CALL-delete, time-travel still whole, vacuum
    spark.sql(s"CALL graft.snapshot('$root', 'v1')").collect()
    val rep = spark.sql(
      s"CALL graft.delete('$root', 'a BETWEEN 10 AND 20')").collect()
    assert(rep(0).getLong(4) > 0)
    assert(ids(root) == (0L until 2048L).filterNot(id =>
      id % 64 >= 10 && id % 64 <= 20).toSet)
    assert(Snapshots.readSnapshot(spark, root, "v1").count() == 2048L)
    // CALL upsert from a named source view
    spark.range(3).select((col("id") + 5000).as("id"), lit(1L).as("a"),
      lit(2L).as("b"), lit("CALLED").as("uid"))
      .createOrReplaceTempView("sqlmut_call_src")
    val urep = spark.sql(
      s"CALL graft.upsert('$root', 'sqlmut_call_src', 'id')").collect()
    assert(urep(0).getLong(1) == 3L)
    assert(ZLake.read(spark, root).filter(col("uid") === "CALLED")
      .count() == 3L)
    // vacuum keeping nothing drops the snapshot and empties the trash
    val vrep = spark.sql(s"CALL graft.vacuum('$root')").collect()
    assert(vrep(0).getInt(0) == 1)
    assert(Snapshots.listSnapshots(spark, root).isEmpty)
  }

  test("DML through a snapshot (time-travel) view is refused") {
    val root = buildLake("snapdml", n = 256)
    spark.sql(s"CALL graft.snapshot('$root', 'pin')").collect()
    spark.sql("DROP VIEW IF EXISTS sqlmut_pin")
    spark.sql(s"CREATE TEMPORARY VIEW sqlmut_pin USING zlake " +
      s"OPTIONS (path '$root', snapshot 'pin')")
    val before = ids(root)
    intercept[Exception](
      spark.sql("DELETE FROM sqlmut_pin WHERE a < 32").collect())
    assert(ids(root) == before,
      "a DELETE through a time-travel view must never mutate the live lake")
  }

  test("INSERT INTO a zlake view is a journaled append: layout kept, " +
      "manifests repaired, coverage preserved") {
    // partitioned lake: inserts must land in win= dirs and stay covered
    val root = java.nio.file.Files
      .createTempDirectory("graft-sql-ins").toString + "/t"
    val df = spark.range(512).select(col("id"), (col("id") % 64).as("a"),
      (col("id") * 7 % 64).as("b"))
    for (w <- 0 to 1)
      Sinks.zorderedWrite(df.filter(col("id") % 2 === w).drop(), "a", "b",
        s"$root/win=$w", numFiles = 2, bits = 6)
    spark.sql("DROP VIEW IF EXISTS sqlmut_ins")
    spark.sql(s"CREATE TEMPORARY VIEW sqlmut_ins USING zlake " +
      s"OPTIONS (path '$root')")
    val rep = spark.sql(
      """INSERT INTO sqlmut_ins
        |SELECT id + 10000, id % 64, id % 7, CAST(id % 2 AS STRING)
        |FROM range(10)""".stripMargin).collect()
    assert(rep.length == 1 && rep(0).getLong(1) == 10L, rep.mkString(","))
    // rows landed in their partition dirs and the lake is still covered:
    // the read after the insert opens zero footers
    val n0 = graft.sources.ZLake.footerOpens.get()
    val got = ZLake.read(spark, root)
    assert(got.count() == 522L)
    assert(got.filter(col("id") >= 10000 && col("win") === "1")
      .count() == 5L)
    assert(graft.sources.ZLake.footerOpens.get() == n0,
      "SQL INSERT degraded manifest coverage (footers opened)")
    // the journal protocol ran (fresh upsert-*.parquet files, no raw
    // part-* spark output names in the lake)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(root, "win=1"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(names.exists(_.startsWith("upsert-")),
      s"expected journaled staged names, got ${names.mkString(",")}")
  }

  test("CALL observability + maintenance verbs: snapshots, manifest, " +
      "rewrite") {
    val root = buildLake("obs", n = 512)
    spark.sql(s"CALL graft.snapshot('$root', 'a')").collect()
    spark.sql(s"CALL graft.snapshot('$root', 'b')").collect()
    assert(spark.sql(s"CALL graft.snapshots('$root')")
      .as[String].collect().toSeq == Seq("a", "b"))
    // manifest rows: one per file, rows sum to the table, zero footers
    val n0 = graft.sources.ZLake.footerOpens.get()
    val man = spark.sql(s"CALL graft.manifest('$root')").collect()
    assert(graft.sources.ZLake.footerOpens.get() == n0,
      "CALL graft.manifest opened parquet footers on a covered lake")
    assert(man.length == 4)
    assert(man.map(_.getLong(2)).sum == 512L)
    assert(man.forall(_.getString(5).contains("blooms")))
    // flat-lake rewrite through the journal: fewer files, same rows
    val rr = spark.sql(
      s"CALL graft.rewrite('$root', 'a', 'b', '2')").collect()
    assert(rr(0).getInt(0) == 4 && rr(0).getInt(1) == 2)
    assert(ZLake.read(spark, root).count() == 512L)
    // the pinned snapshots still read whole after the rewrite
    assert(Snapshots.readSnapshot(spark, root, "a").count() == 512L)
  }

  test("CALL graft.compact optimizes a windowed lake from SQL") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-sql-cmp").toString + "/t"
    val df = spark.range(1024).select(col("id"),
      (col("id") % 64).as("a"), (col("id") * 7 % 64).as("b"))
    // over-fragmented windows: 6 files each, target 2 per window
    for (w <- 0 to 1)
      Sinks.zorderedWrite(df.filter(col("id") % 2 === w), "a", "b",
        s"$root/win=$w", numFiles = 6, bits = 6)
    val rep = spark.sql(
      s"CALL graft.compact('$root', 'a', 'b', '2')").collect()
    assert(rep.length == 2, rep.mkString(","))
    assert(rep.forall(r => r.getInt(1) == 6 && r.getInt(2) <= 2))
    assert(ZLake.read(spark, root).count() == 1024L)
  }

  test("CALL parse errors are loud; non-CALL SQL is untouched") {
    intercept[Exception](
      spark.sql("CALL graft.snapshot('/tmp/x')").collect()) // arity
    intercept[Exception](
      spark.sql("CALL graft.delete(unquoted, 'p')").collect())
    // the delegating parser leaves ordinary SQL alone
    assert(spark.sql("SELECT 1 + 1 AS v").as[Int].head() == 2)
  }
}
