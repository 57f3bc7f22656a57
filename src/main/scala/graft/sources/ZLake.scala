package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Stats-carrying lake read: per-file min/max envelopes harvested from the
  * parquet FOOTERS (a metadata-only pass — no data pages touched) drive
  * file-level skipping at PLANNING time, before a single task is launched.
  *
  * This is the read-side payoff of [[graft.sinks.Sinks.zorderedWrite]]: the
  * z-order layout makes every file's envelope tight on BOTH clustered
  * columns (measured in ZOrderLayoutSpec), so a predicate on either column
  * eliminates most files here — at 100 TB that is the difference between
  * launching tasks for ~3% of the lake and scanning all of it. Row groups
  * inside the files that DO survive are further skipped by parquet's own
  * row-group statistics once Spark pushes the filters down (asserted via
  * scan metrics in ZOrderPruneSpec).
  *
  * Spark-first shape: a [[FileIndex]] — the same seam Spark's own catalog
  * file listing and open-lakehouse formats use for data skipping — feeding
  * a plain parquet `HadoopFsRelation`, so the scan keeps the vectorized
  * reader, whole-stage codegen, filter pushdown, and every downstream
  * optimization. Pruning consumes the `dataFilters` Spark already hands to
  * `listFiles`; nothing is re-implemented on the read path itself.
  *
  * The envelope test is conservative: unsupported predicates, columns
  * without usable stats (logical types beyond int/float/string), and
  * non-literal comparisons keep the file. Comparisons are null-rejecting,
  * so null-laden chunks are safe: rows with NULL never satisfy the pushed
  * predicate, and a chunk with no non-null values carries no envelope and
  * is kept only when some other conjunct cannot rule it out.
  */
object ZLake {

  /** [lo, hi] of a column within one file; values are Double (numerics)
    * or String (UTF8-annotated binary). */
  final case class ColEnvelope(lo: Any, hi: Any)

  /** `partitionValues`: `col=value` path segments between the table root
    * and the file (the lake's `win=...` layout), in directory order.
    * `rows`/`nullCounts` drive IsNull/IsNotNull pruning: a column with a
    * KNOWN zero null count can never satisfy IS NULL, and a known
    * all-null column never satisfies IS NOT NULL (or any comparison). */
  final case class FileEnvelope(status: FileStatus, rowGroups: Int,
                                cols: Map[String, ColEnvelope],
                                partitionValues: Seq[(String, String)] = Nil,
                                rows: Long = -1L,
                                nullCounts: Map[String, Long] = Map.empty)

  /** Recursively list data files under `root`, carrying the `col=value`
    * segments each file sits beneath. */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem, root: Path)
      : Seq[(FileStatus, Seq[(String, String)])] = {
    def walk(dir: Path, parts: Seq[(String, String)])
        : Seq[(FileStatus, Seq[(String, String)])] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          val part = name.split("=", 2) match {
            case Array(k, v) => Seq(k.toLowerCase -> v)
            case _ => Nil
          }
          walk(st.getPath, parts ++ part)
        } else if (name.endsWith(".parquet")) Seq((st, parts))
        else Nil
      }
    walk(root, Nil).sortBy(_._1.getPath.toString)
  }

  /** Read every footer under `path` (driver-side, metadata-only) into
    * per-file envelopes. One call per table per query plan — at 1000
    * executors this is the only centralized step, and it reads ~KBs/file. */
  def envelopes(spark: SparkSession, path: String): Seq[FileEnvelope] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = listDataFiles(fs, root)
    files.map { case (st, parts) =>
      envelopeOf(st, parts, conf)
    }
  }

  private def envelopeOf(st: FileStatus, parts: Seq[(String, String)],
                         conf: org.apache.hadoop.conf.Configuration)
      : FileEnvelope = {
    {
      val rd = ParquetFileReader.open(HadoopInputFile.fromStatus(st, conf))
      try {
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        val perChunk: Seq[(String, ColEnvelope)] = for {
          b <- blocks
          c <- b.getColumns.asScala
          env <- chunkEnvelope(c)
        } yield c.getPath.toDotString.toLowerCase -> env
        // file envelope = union of its row-group envelopes; a column missing
        // stats in ANY row group gets no file envelope (cannot prune on it)
        val byCol = perChunk.groupBy(_._1).collect {
          case (name, es) if es.size == blocks.size =>
            name -> es.map(_._2).reduce((a, b) =>
              ColEnvelope(minOf(a.lo, b.lo), maxOf(a.hi, b.hi)))
        }
        // null counts: only when every row group reports one for the column
        val perNulls: Seq[(String, Long)] = for {
          b <- blocks
          c <- b.getColumns.asScala
          s = c.getStatistics
          if s != null && s.isNumNullsSet
        } yield c.getPath.toDotString.toLowerCase -> s.getNumNulls
        val nulls = perNulls.groupBy(_._1).collect {
          case (name, es) if es.size == blocks.size =>
            name -> es.map(_._2).sum
        }
        FileEnvelope(st, blocks.size, byCol.toMap, parts,
          blocks.map(_.getRowCount).sum, nulls.toMap)
      } finally rd.close()
    }
  }

  private def chunkEnvelope(
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData)
      : Option[ColEnvelope] = {
    val stats = c.getStatistics
    if (stats == null || !stats.hasNonNullValue) return None
    val ann = c.getPrimitiveType.getLogicalTypeAnnotation
    // EXACT numeric envelopes: a Double lane would collapse BIGINTs above
    // 2^53 (hash60-derived ids reach 2^60 in this repo) and could prune a
    // file that holds a matching row — the one unforgivable direction
    def num(v: Any): Option[BigDecimal] = v match {
      case i: java.lang.Integer => Some(BigDecimal(i.intValue))
      case l: java.lang.Long => Some(BigDecimal(l.longValue))
      case f: java.lang.Float if !f.isNaN && !f.isInfinite =>
        Some(BigDecimal.decimal(f.floatValue))
      case d: java.lang.Double if !d.isNaN && !d.isInfinite =>
        Some(BigDecimal(d.doubleValue))
      case _ => None
    }
    val signedInt = ann match {
      case ia: LogicalTypeAnnotation.IntLogicalTypeAnnotation => ia.isSigned
      case _ => false // unsigned annotations: raw stats are misordered
    }
    (stats.genericGetMin, stats.genericGetMax) match {
      case (lo, hi) if ann == null || signedInt =>
        for (l <- num(lo); h <- num(hi)) yield ColEnvelope(l, h)
      case (lo: Binary, hi: Binary)
          if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
        Some(ColEnvelope(lo.toStringUsingUTF8, hi.toStringUsingUTF8))
      case _ => None // decimal/date/timestamp annotations: stats not comparable here
    }
  }

  private def minOf(a: Any, b: Any): Any = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.min(y)
    case (x: String, y: String) => if (x <= y) x else y
    case _ => a
  }
  private def maxOf(a: Any, b: Any): Any = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => x.max(y)
    case (x: String, y: String) => if (x >= y) x else y
    case _ => a
  }

  /** Catalyst literal → envelope-comparable value (numerics exact). */
  private def litVal(v: Any): Option[Any] = v match {
    case null => None
    case b: Byte => Some(BigDecimal(b.toInt))
    case s: Short => Some(BigDecimal(s.toInt))
    case i: Int => Some(BigDecimal(i))
    case l: Long => Some(BigDecimal(l))
    case f: Float if !f.isNaN && !f.isInfinite => Some(BigDecimal.decimal(f))
    case d: Double if !d.isNaN && !d.isInfinite => Some(BigDecimal(d))
    case d: Decimal => Some(d.toBigDecimal)
    case s: UTF8String => Some(s.toString)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  /** May any row of the file satisfy `e`? Sound over-approximation: every
    * unsupported shape answers true (keep the file). */
  def mayMatch(e: Expression, fe: FileEnvelope): Boolean = {
    def env(a: AttributeReference): Option[ColEnvelope] =
      fe.cols.get(a.name.toLowerCase)
    // test(attr, lit)(f): false only when stats PROVE no row matches
    def test(a: AttributeReference, l: Any)(
        rule: (ColEnvelope, Any) => Option[Boolean]): Boolean =
      (for (ce <- env(a); v <- litVal(l); r <- rule(ce, v)) yield r)
        .getOrElse(true)
    e match {
      case And(l, r) => mayMatch(l, fe) && mayMatch(r, fe)
      case Or(l, r) => mayMatch(l, fe) || mayMatch(r, fe)
      case IsNull(a: AttributeReference) =>
        // prunable only with a KNOWN zero null count
        fe.nullCounts.get(a.name.toLowerCase).forall(_ > 0L)
      case IsNotNull(a: AttributeReference) =>
        // prunable only when the column is KNOWN all-null
        fe.rows < 0L ||
          fe.nullCounts.get(a.name.toLowerCase).forall(_ < fe.rows)
      case EqualTo(a: AttributeReference, Literal(v, _)) =>
        test(a, v)((ce, x) =>
          for (cl <- cmp(x, ce.lo); ch <- cmp(x, ce.hi)) yield cl >= 0 && ch <= 0)
      case EqualTo(Literal(v, _), a: AttributeReference) =>
        mayMatch(EqualTo(a, Literal(v)), fe)
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        test(a, v)((ce, x) => cmp(ce.hi, x).map(_ > 0))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        test(a, v)((ce, x) => cmp(ce.hi, x).map(_ >= 0))
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        test(a, v)((ce, x) => cmp(ce.lo, x).map(_ < 0))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        test(a, v)((ce, x) => cmp(ce.lo, x).map(_ <= 0))
      // flipped operand order: lit OP attr == attr FLIP(OP) lit
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        mayMatch(LessThan(a, Literal(v)), fe)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        mayMatch(LessThanOrEqual(a, Literal(v)), fe)
      case LessThan(Literal(v, _), a: AttributeReference) =>
        mayMatch(GreaterThan(a, Literal(v)), fe)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        mayMatch(GreaterThanOrEqual(a, Literal(v)), fe)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v =>
          mayMatch(EqualTo(a, v.asInstanceOf[Literal]), fe))
      case _ => true
    }
  }

  /** The pruning [[FileIndex]]. Hive-style `col=value` directories become
    * STRING partition columns: partition filters prune whole directories
    * exactly, footer stats prune the surviving files — partition pruning
    * and stat pruning compose on the lake's own `win=` layout. `lastPrune`
    * records (kept, total) of the most recent planning pass. */
  final class StatsFileIndex(root: Path, fes: Seq[FileEnvelope])
      extends FileIndex {
    val lastPrune = new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((-1, fes.size))
    /** Partition column names (lowercase), from the first file's path. */
    val partitionCols: Seq[String] =
      fes.headOption.map(_.partitionValues.map(_._1)).getOrElse(Nil)
    override def rootPaths: Seq[Path] = Seq(root)
    override def partitionSchema: StructType =
      StructType(partitionCols.map(c =>
        org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType, nullable = true)))
    override def inputFiles: Array[String] =
      fes.map(_.status.getPath.toString).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = fes.map(_.status.getLen).sum

    /** Exact partition-filter evaluation against one directory's values;
      * undecidable shapes keep the directory. */
    private def partMatch(e: Expression, row: InternalRow): Boolean =
      try {
        val bound = e.transform {
          case a: AttributeReference =>
            val i = partitionCols.indexOf(a.name.toLowerCase)
            if (i < 0) return true // references something else: keep
            BoundReference(i, org.apache.spark.sql.types.StringType,
              nullable = true)
        }
        bound.eval(row) == true
      } catch { case scala.util.control.NonFatal(_) => true }

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val groups = fes.groupBy(_.partitionValues).toSeq.sortBy(_._1.toString)
      var kept = 0
      val dirs = groups.flatMap { case (parts, group) =>
        val row = InternalRow.fromSeq(
          parts.map(p => UTF8String.fromString(p._2)))
        if (!partitionFilters.forall(f => partMatch(f, row))) None
        else {
          val files = group.filter(fe => dataFilters.forall(mayMatch(_, fe)))
          kept += files.size
          if (files.isEmpty) None
          else Some(PartitionDirectory(row, files.map(_.status).toArray))
        }
      }
      lastPrune.set((kept, fes.size))
      dirs
    }
  }

  def index(spark: SparkSession, path: String): StatsFileIndex =
    new StatsFileIndex(new Path(path), envelopes(spark, path))

  /** Parquet read through the stats-pruning index: identical rows to
    * `spark.read.parquet(path)` (plus string-typed partition columns for a
    * Hive-layout lake), but predicates prune partitions AND files at
    * planning time. */
  def read(spark: SparkSession, path: String): DataFrame =
    readWith(spark, path, index(spark, path))

  def readWith(spark: SparkSession, path: String,
               idx: StatsFileIndex): DataFrame = {
    // data schema from one FILE (partition dirs carry no parquet columns)
    val dataSchema = idx.inputFiles.headOption
      .map(f => spark.read.parquet(f).schema)
      .getOrElse(spark.read.parquet(path).schema)
    val rel = HadoopFsRelation(idx, idx.partitionSchema, dataSchema, None,
      new ParquetFileFormat, Map.empty[String, String])(spark)
    PlanBridge.dataFrame(spark, LogicalRelation(rel))
  }
}
