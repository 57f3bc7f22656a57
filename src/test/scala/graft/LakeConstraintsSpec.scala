package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{LakeConstraints, LakeDelete, Sinks}
import graft.sources.ZLake

/** CHECK constraints on the z-lake ([[LakeConstraints]]): persisted in a
  * root sidecar, validated against existing data at ADD time, enforced on
  * every ingest path (append / upsert insert lane / update post-image /
  * SQL CALL surface), NULL passes (ANSI), rejected batches leave the lake
  * byte-untouched. */
class LakeConstraintsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def buildLake(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-chk").toString + "/t"
    val src = spark.range(256).select(
      col("id"), (col("id") % 64).as("a"),
      (col("id") % 97).as("u"))
    for (w <- 0 to 1)
      Sinks.zorderedWrite(src.filter(col("id") % 2 === w),
        "a", "u", s"$root/win=$w", numFiles = 2, bits = 6)
    root
  }

  private def snap(root: String): Map[String, (Long, Long)] =
    ZLake.envelopes(spark, root).map(fe =>
      fe.status.getPath.toString ->
        (fe.status.getLen, fe.status.getModificationTime)).toMap

  private def batch(rows: Seq[(Long, Long, Long)], win: String): DataFrame =
    rows.toDF("id", "a", "u").withColumn("win", lit(win))

  test("append/upsert batches violating a CHECK are rejected whole; " +
      "compliant ones land; NULL passes") {
    val root = buildLake()
    LakeConstraints.add(spark, root, "a-bounded", "a >= 0 AND a < 64")
    LakeConstraints.add(spark, root, "id-present", "id IS NOT NULL")
    val before = snap(root)

    // violating append: rejected, lake byte-identical
    val bad = batch(Seq((9000L, 99L, 1L)), "0")
    val e = intercept[LakeConstraints.ConstraintViolation](
      LakeDelete.appendLake(spark, root, bad))
    assert(e.getMessage.contains("a-bounded"))
    assert(snap(root) == before, "rejected batch changed files")

    // violating upsert: same
    intercept[LakeConstraints.ConstraintViolation](
      LakeDelete.upsertLake(spark, root, bad, "id"))
    assert(snap(root) == before)

    // compliant append (and a NULL in a non-demanded column passes)
    val ok = Seq((9001L, 5L), (9002L, 6L)).toDF("id", "a")
      .withColumn("u", lit(null).cast("long"))
      .withColumn("win", lit("1"))
    val rep = LakeDelete.appendLake(spark, root, ok)
    assert(rep.rowsInserted == 2)
    assert(ZLake.read(spark, root).filter(col("id") >= 9000).count() == 2)
  }

  test("UPDATE post-images are enforced: an assignment driving a row " +
      "out of bounds is rejected before any file is touched") {
    val root = buildLake()
    LakeConstraints.add(spark, root, "u-bounded", "u < 1000")
    val before = snap(root)
    intercept[LakeConstraints.ConstraintViolation](
      LakeDelete.updateLake(spark, root, Seq("u" -> lit(5000L)),
        col("a") < 8))
    assert(snap(root) == before, "rejected update touched files")
    // an in-bounds update still works
    val rep = LakeDelete.updateLake(spark, root, Seq("u" -> lit(999L)),
      col("a") < 8)
    assert(rep.rowsUpdated > 0)
  }

  test("ADD validates existing data and refuses; drop stops enforcing; " +
      "unknown drop is an error") {
    val root = buildLake()
    // existing rows have a in [0,64) — a stricter bound must refuse
    val e = intercept[LakeConstraints.ConstraintViolation](
      LakeConstraints.add(spark, root, "too-strict", "a < 10"))
    assert(e.getMessage.contains("too-strict"))
    assert(LakeConstraints.list(spark, root).isEmpty)

    LakeConstraints.add(spark, root, "bound", "a < 100")
    assert(LakeConstraints.list(spark, root).map(_.name) == Seq("bound"))
    LakeConstraints.drop(spark, root, "bound")
    assert(LakeConstraints.list(spark, root).isEmpty)
    intercept[IllegalArgumentException](
      LakeConstraints.drop(spark, root, "bound"))
    // after drop, the formerly-violating batch lands
    val rep = LakeDelete.appendLake(spark, root,
      batch(Seq((9000L, 500L, 1L)), "0"))
    assert(rep.rowsInserted == 1)
  }

  test("SQL surface: CALL constraint_add/constraints/constraint_drop; " +
      "INSERT INTO a constrained lake enforces") {
    val root = buildLake()
    spark.sql(s"CALL graft.constraint_add('$root', 'a-bound', 'a < 64')")
    val listed = spark.sql(s"CALL graft.constraints('$root')").collect()
    assert(listed.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a-bound", "a < 64")))
    spark.sql("DROP VIEW IF EXISTS chk_lake")
    spark.sql(s"CREATE TEMPORARY VIEW chk_lake USING zlake " +
      s"OPTIONS (path '$root')")
    batch(Seq((9000L, 99L, 1L)), "0").createOrReplaceTempView("chk_bad")
    val e = intercept[Exception](
      spark.sql("INSERT INTO chk_lake SELECT * FROM chk_bad"))
    assert(e.getMessage.contains("a-bound") ||
      Option(e.getCause).exists(_.getMessage.contains("a-bound")))
    spark.sql(s"CALL graft.constraint_drop('$root', 'a-bound')")
    spark.sql("INSERT INTO chk_lake SELECT * FROM chk_bad") // now fine
    spark.sql("REFRESH TABLE chk_lake")
    assert(spark.sql("SELECT count(*) FROM chk_lake WHERE id = 9000")
      .collect()(0).getLong(0) == 1L)
    // malformed expression fails at parse time
    intercept[Exception](spark.sql(
      s"CALL graft.constraint_add('$root', 'bad', 'a <<>> 1')"))
  }
}
