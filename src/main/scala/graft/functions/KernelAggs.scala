package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native aggregate functions (SURVEY §2.11 extension surface).
  *
  * [[VecMeanAgg]] is the centroid step of IVF similarity search: the exact
  * element-wise mean of quantized (long) vectors per group. The buffer is a
  * primitive long sum vector + count — exact integer partial aggregation, so
  * map-side combine and merge order cannot change the result; the final
  * division is one IEEE double op per element, q6-rounded for oracle parity.
  */
object KernelAggs {

  /** Mutable buffer: element-wise long sums + row count. */
  final class VecSumBuf(var sums: Array[Long], var count: Long) {
    def add(v: ArrayData): Unit = {
      val n = v.numElements()
      if (sums == null) sums = new Array[Long](n)
      require(sums.length == n,
        s"vec_mean: inconsistent vector lengths (${sums.length} vs $n)")
      var i = 0
      while (i < n) { sums(i) += v.getLong(i); i += 1 }
      count += 1L
    }
    def merge(o: VecSumBuf): Unit = if (o.sums != null) {
      if (sums == null) { sums = o.sums.clone(); count = o.count }
      else {
        require(sums.length == o.sums.length,
          s"vec_mean: inconsistent vector lengths (${sums.length} vs ${o.sums.length})")
        var i = 0
        while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
        count += o.count
      }
    }
  }

  /** Element-wise q6-rounded mean of an array<long> column per group;
    * null on an empty group. */
  case class VecMeanAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecSumBuf] with UnaryLike[Expression] {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true

    override def createAggregationBuffer(): VecSumBuf = new VecSumBuf(null, 0L)

    override def update(b: VecSumBuf, input: InternalRow): VecSumBuf = {
      val v = child.eval(input)
      if (v != null) b.add(v.asInstanceOf[ArrayData])
      b
    }

    override def merge(b: VecSumBuf, o: VecSumBuf): VecSumBuf = { b.merge(o); b }

    override def eval(b: VecSumBuf): Any =
      if (b.count == 0L || b.sums == null) null
      else {
        val out = new Array[Double](b.sums.length)
        var i = 0
        while (i < out.length) {
          out(i) = Kernels.qround(b.sums(i).toDouble / b.count, 6)
          i += 1
        }
        new GenericArrayData(out)
      }

    override def serialize(b: VecSumBuf): Array[Byte] = {
      val n = if (b.sums == null) 0 else b.sums.length
      val bb = ByteBuffer.allocate(8 + 4 + 8 * n)
      bb.putLong(b.count).putInt(n)
      var i = 0
      while (i < n) { bb.putLong(b.sums(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): VecSumBuf = {
      val bb = ByteBuffer.wrap(bytes)
      val count = bb.getLong()
      val n = bb.getInt()
      if (n == 0) new VecSumBuf(null, count)
      else {
        val sums = new Array[Long](n)
        var i = 0
        while (i < n) { sums(i) = bb.getLong(); i += 1 }
        new VecSumBuf(sums, count)
      }
    }

    override def withNewMutableAggBufferOffset(n: Int): VecMeanAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): VecMeanAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): VecMeanAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_vec_mean"
  }

  /** Column wrapper: element-wise mean of an array<long> column. */
  def vec_mean(c: Column): Column =
    ColumnBridge.column(VecMeanAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** MaxSim late-interaction score (ColBERT — Khattab & Zaharia 2020) per
    * group, against a CONSTANT query bag: `Σ_j max over the group's rows
    * of cosQ6(cv, q_j)`, each per-token max rounded to integer micros
    * (`floor(cos·10⁶ + 0.5)` — the rounding is monotone, so rounding
    * before or after the max is identical and the partial buffers stay
    * exact integers). This is the aggregate spelling of
    * [[graft.operators.Similarity.maxSimTopK]]'s scoring tail: a user
    * writes `groupBy(doc).agg(maxsim_q6(cv, bag)) ORDER BY ... LIMIT k`
    * (the brute-force shape) and [[graft.plans.MaxSimRewrite]] substitutes
    * the two-stage index probe when one is registered.
    *
    * `queryBag` must be a non-empty constant `array<array<long>>` of
    * quantized query-token vectors. Null corpus rows are skipped (a group
    * whose every vector is null scores null, matching the brute path's
    * null-skipping `max`). The buffer is one long per query token —
    * map-side combinable, merge-order-free. */
  case class MaxSimQ6Agg(
      child: Expression, queryBag: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

    override def left: Expression = child
    override def right: Expression = queryBag

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    @transient private lazy val qVecs: Array[Array[Long]] = {
      require(queryBag.foldable,
        "maxsim_q6: the query bag must be a constant (foldable) expression")
      val elemT = queryBag.dataType match {
        case ArrayType(ArrayType(et @ (LongType | IntegerType), _), _) => et
        case other => throw new IllegalArgumentException(
          s"maxsim_q6: the query bag must be array<array<bigint>> (got $other)")
      }
      val v = queryBag.eval()
      require(v != null, "maxsim_q6: the query bag must not be null")
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() > 0,
        "maxsim_q6: the query bag must not be empty")
      Array.tabulate(arr.numElements()) { j =>
        val e = arr.getArray(j)
        require(e != null,
          "maxsim_q6: the query bag must not contain null vectors")
        if (elemT == LongType) e.toLongArray()
        else e.toIntArray().map(_.toLong)
      }
    }

    override def createAggregationBuffer(): Array[Long] =
      Array.fill(qVecs.length)(Long.MinValue)

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val cv = v.asInstanceOf[ArrayData].toLongArray()
        var j = 0
        while (j < b.length) {
          val m = math.floor(
            Kernels.cosineQ6Arrays(cv, qVecs(j)) * 1000000.0 + 0.5).toLong
          if (m > b(j)) b(j) = m
          j += 1
        }
      }
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      var j = 0
      while (j < b.length) { if (o(j) > b(j)) b(j) = o(j); j += 1 }
      b
    }

    override def eval(b: Array[Long]): Any =
      if (b.isEmpty || b(0) == Long.MinValue) null
      else {
        var s = 0L; var j = 0
        while (j < b.length) { s += b(j); j += 1 }
        s
      }

    override def serialize(b: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * b.length)
      bb.putInt(b.length)
      var j = 0
      while (j < b.length) { bb.putLong(b(j)); j += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val out = new Array[Long](n)
      var j = 0
      while (j < n) { out(j) = bb.getLong(); j += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): MaxSimQ6Agg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): MaxSimQ6Agg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): MaxSimQ6Agg =
      copy(child = newLeft, queryBag = newRight)
    override def prettyName: String = "graft_maxsim_q6"
  }

  /** Column wrapper: MaxSim score of a group's quantized token vectors
    * against a constant quantized query bag. */
  def maxsim_q6(cv: Column, queryBag: Column): Column =
    ColumnBridge.column(MaxSimQ6Agg(ColumnBridge.expression(cv),
      ColumnBridge.expression(queryBag)).toAggregateExpression())

  // ---------------------------------------------------------------------------

  /** Count-Min Sketch buffer: `depth × width` long counters, flattened. */
  final class CmsBuf(val cells: Array[Long]) {
    def add(key: String, depth: Int, width: Int): Unit = {
      var j = 0
      while (j < depth) {
        val b = (Kernels.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(key + "#" + j)) % width).toInt
        cells(j * width + b) += 1L
        j += 1
      }
    }
    def merge(o: CmsBuf): Unit = {
      var i = 0
      while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
    }
  }

  /** Count-Min Sketch over a string column (SURVEY §2.11 extension surface —
    * the approximate-heavy-hitters sketch for 100 TB cardinalities where an
    * exact per-key count is too wide to hold).
    *
    * Hash family = [[Kernels.hash60]] of `key || '#' || row` — the same
    * construction as the MinHash family, so a SQL oracle reproduces every
    * cell and every estimate exactly (the SKETCH is deterministic; only its
    * error vs the true count is probabilistic). Counters are exact longs:
    * merge order cannot change the result. Estimate of a key = min over
    * rows of its cells; always an overcount, never an undercount. */
  case class CmsAgg(
      child: Expression, depth: Int, width: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsBuf] with UnaryLike[Expression] {

    // Fail at plan time with a clear message — the SQL surface
    // (graft_cms_sketch(k, d, w)) hands these straight to query authors, and
    // width<=0 would otherwise surface as an executor ArithmeticException.
    require(depth > 0 && width > 0,
      s"graft_cms_sketch: depth and width must be positive (got depth=$depth, width=$width)")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): CmsBuf = new CmsBuf(new Array[Long](depth * width))

    override def update(b: CmsBuf, input: InternalRow): CmsBuf = {
      val v = child.eval(input)
      if (v != null) b.add(v.toString, depth, width)
      b
    }

    override def merge(b: CmsBuf, o: CmsBuf): CmsBuf = { b.merge(o); b }

    override def eval(b: CmsBuf): Any = new GenericArrayData(b.cells)

    override def serialize(b: CmsBuf): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * b.cells.length)
      var i = 0
      while (i < b.cells.length) { bb.putLong(b.cells(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): CmsBuf = {
      val bb = ByteBuffer.wrap(bytes)
      val cells = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < cells.length) { cells(i) = bb.getLong(); i += 1 }
      new CmsBuf(cells)
    }

    override def withNewMutableAggBufferOffset(n: Int): CmsAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): CmsAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): CmsAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_cms_sketch"
  }

  /** Column wrapper: CMS of a string column as a flat depth×width long array. */
  def cms_sketch(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(c), depth, width).toAggregateExpression())

  // ---------------------------------------------------------------------------

  /** HyperLogLog register vector over a string column: bucket = hash60 low
    * bits, rank = trailing-zero run of the remaining 56 bits + 1 (capped 57
    * when they are all zero), register = max rank. Deterministic (hash60) and
    * merge = element-wise max, so partitioning cannot change the registers
    * and a SQL oracle reproduces them bit-for-bit; the caller derives the
    * harmonic estimate (see q73). The 100 TB shape: a fixed 8·m-byte state
    * per group replaces a count-distinct shuffle of the raw keys. */
  case class HllAgg(
      child: Expression, m: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
    require(m > 0 && (m & (m - 1)) == 0, "m must be a power of two")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = Kernels.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(v.toString))
        val bucket = (h % m).toInt
        val w = h / m
        val rank = if (w == 0L) 57L else java.lang.Long.numberOfTrailingZeros(w) + 1L
        if (rank > b(bucket)) b(bucket) = rank
      }
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      var i = 0
      while (i < m) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
      b
    }

    override def eval(b: Array[Long]): Any = new GenericArrayData(b)

    override def serialize(b: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * m)
      var i = 0
      while (i < m) { bb.putLong(b(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): HllAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): HllAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): HllAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_hll_registers"
  }

  /** Column wrapper: HLL registers (array<long> of length m) per group. */
  def hll_registers(c: Column, m: Int): Column =
    ColumnBridge.column(HllAgg(ColumnBridge.expression(c), m).toAggregateExpression())

  // ---------------------------------------------------------------------------

  /** Bloom filter over a string column: `numBits` bits as numBits/64 long
    * words, key positions from the seeded hash60 family
    * ([[Kernels.bloomPos]]). Deterministic bits, merge = bitwise OR —
    * partitioning, duplicates and merge order cannot change the result, so
    * the update side needs NO pre-distinct (duplicate inserts are no-ops)
    * and a SQL oracle reproduces every probe, false positives included.
    *
    * The 100 TB shape this unlocks: membership of a 10^8-key set as a
    * fixed few-MB value that broadcasts to every executor — a probe is a
    * per-row expression, so the probing side is never shuffled, never
    * joined, never explodes (vs. carrying the full distinct key set of a
    * broadcast semi-join). */
  case class BloomAgg(
      child: Expression, numBits: Int, numHashes: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
    require(numBits > 0 && numBits % 64 == 0,
      s"graft_bloom_sketch: numBits must be a positive multiple of 64 (got $numBits)")
    require(numHashes > 0,
      s"graft_bloom_sketch: numHashes must be positive (got $numHashes)")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null)
        Kernels.bloomUpdate(b,
          org.apache.spark.unsafe.types.UTF8String.fromString(v.toString), numHashes)
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b.length) { b(i) |= o(i); i += 1 }
      b
    }

    override def eval(b: Array[Long]): Any = new GenericArrayData(b)

    override def serialize(b: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * b.length)
      var i = 0
      while (i < b.length) { bb.putLong(b(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): BloomAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BloomAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): BloomAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_bloom_sketch"
  }

  /** Column wrapper: bloom bit words (array<long> of length numBits/64). */
  def bloom_sketch(c: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(c), numBits, numHashes).toAggregateExpression())

  // ---------------------------------------------------------------------------

  /** Element-wise re-aggregation of PRE-COMPUTED sketch vectors across rows —
    * the merge half of the sketch contract and the 100 TB incremental-
    * aggregation pattern: per-window partials land in the lake (a few KB per
    * group-window) and any coarser rollup — day over 5-min windows, global
    * over days — re-combines the vectors without touching raw data again.
    * `mode="max"` merges HLL register vectors (element max), `mode="sum"`
    * merges CMS cell grids (element sum; counters are exact longs), and
    * `mode="or"` merges bloom bit words (bitwise OR). The
    * buffer adopts the first vector's length; mismatched widths fail fast
    * (merging sketches of different geometry is meaningless). Mergeability
    * is oracle-proven: merged per-window sketches hash-equal the sketch of
    * the union (q80). */
  case class SketchMergeAgg(
      child: Expression, mode: String,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
    require(Seq("max", "sum", "or").contains(mode),
      s"graft_sketch_merge: mode must be max|sum|or (got $mode)")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true // empty group → null, like sum

    override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

    private def combine(b: Array[Long], v: Array[Long]): Array[Long] =
      if (b.isEmpty) v.clone()
      else {
        require(b.length == v.length,
          s"${prettyName}: sketch widths differ (${b.length} vs ${v.length})")
        var i = 0
        while (i < b.length) {
          b(i) = mode match {
            case "max" => math.max(b(i), v(i))
            case "sum" => b(i) + v(i)
            case "or" => b(i) | v(i)
          }
          i += 1
        }
        b
      }

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) b else combine(b, v.asInstanceOf[ArrayData].toLongArray())
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] =
      if (o.isEmpty) b else combine(b, o)

    override def eval(b: Array[Long]): Any =
      if (b.isEmpty) null else new GenericArrayData(b)

    override def serialize(b: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * b.length)
      var i = 0
      while (i < b.length) { bb.putLong(b(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < out.length) { out(i) = bb.getLong(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): SketchMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): SketchMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): SketchMergeAgg =
      copy(child = newChild)
    override def prettyName: String = s"graft_sketch_merge_$mode"
  }

  /** Merge HLL register vectors across rows (element-wise max). */
  def sketch_merge_max(c: Column): Column =
    ColumnBridge.column(
      SketchMergeAgg(ColumnBridge.expression(c), "max").toAggregateExpression())

  /** Merge CMS cell grids across rows (element-wise sum). */
  def sketch_merge_sum(c: Column): Column =
    ColumnBridge.column(
      SketchMergeAgg(ColumnBridge.expression(c), "sum").toAggregateExpression())

  /** Merge bloom bit-word vectors across rows (element-wise bitwise OR). */
  def sketch_merge_or(c: Column): Column =
    ColumnBridge.column(
      SketchMergeAgg(ColumnBridge.expression(c), "or").toAggregateExpression())

  // ---------------------------------------------------------------------------

  /** Bottom-k sample sketch: the values of the `k` rows whose hash60(key) is
    * smallest, ordered by (hash, value) — a DETERMINISTIC uniform row sample
    * as a fixed-size mergeable value, the quantile/distribution member of
    * the sketch family (CMS = counts, HLL = distinct, bloom = membership).
    * Merge = union then re-take the k smallest, so partitioning and merge
    * order cannot change the result and any engine hashing the same keys
    * draws the identical sample — a SQL oracle reproduces every element
    * (q88). Quantile estimates read the sorted sample; at 100 TB the state
    * is 8·k bytes per group instead of a sort of the group's rows. */
  case class BottomKAgg(
      left: Expression, right: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[collection.mutable.ArrayBuffer[(Long, Double)]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
    require(k > 0, s"graft_bottomk_sample: k must be positive (got $k)")

    private type Buf = collection.mutable.ArrayBuffer[(Long, Double)]

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Buf = collection.mutable.ArrayBuffer.empty

    /** Keep the buffer small without sorting per row: compact at 4k. */
    private def compact(b: Buf): Buf = {
      if (b.length > k) {
        val kept = b.sorted.take(k)
        b.clear(); b ++= kept
      }
      b
    }

    override def update(b: Buf, input: InternalRow): Buf = {
      val kv = left.eval(input)
      val vv = right.eval(input)
      if (kv != null && vv != null) {
        // accept any numeric value column (INT/BIGINT/DECIMAL/...), not
        // just DOUBLE — SQL callers pass whatever the column's type is
        val d = vv match {
          case n: java.lang.Number => n.doubleValue()
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_bottomk_sample: value must be numeric, got " +
              s"${other.getClass.getSimpleName}")
        }
        b += ((Kernels.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(kv.toString)), d))
        if (b.length >= 4 * k) compact(b)
      }
      b
    }

    override def merge(b: Buf, o: Buf): Buf = { b ++= o; compact(b) }

    override def eval(b: Buf): Any =
      new GenericArrayData(b.sorted.take(k).map(_._2).toArray)

    override def serialize(b: Buf): Array[Byte] = {
      compact(b)
      val bb = ByteBuffer.allocate(4 + 16 * b.length)
      bb.putInt(b.length)
      b.foreach { case (h, v) => bb.putLong(h).putDouble(v) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val out: Buf = collection.mutable.ArrayBuffer.empty
      var i = 0
      while (i < n) { out += ((bb.getLong(), bb.getDouble())); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): BottomKAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): BottomKAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BottomKAgg =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_bottomk_sample"
  }

  /** Column wrapper: bottom-k sample of `value` keyed by hash60(`key`),
    * as array<double> ordered by (hash, value). */
  def bottomk_sample(key: Column, value: Column, k: Int): Column =
    ColumnBridge.column(BottomKAgg(ColumnBridge.expression(key),
      ColumnBridge.expression(value), k).toAggregateExpression())

  // ---------------------------------------------------------------------------

  /** KMV (k-minimum-values / bottom-k theta) sketch: the k smallest DISTINCT
    * hash60 values of a key column, sorted ascending — the set-analytics
    * sketch: distinct-count estimate (k−1)·2^60/kth-value, and set
    * union/intersection/Jaccard estimates by combining two sketches'
    * arrays (q93). Deterministic (hash60, exact distinct longs), merge =
    * distinct-union re-take-k: partitioning, duplicates and merge order
    * cannot change the result, and NO global distinct shuffle is ever
    * paid — the 100 TB overlap question costs 8k bytes per corpus. */
  case class KmvAgg(
      child: Expression, k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[collection.mutable.ArrayBuffer[Long]]
    with UnaryLike[Expression] {
    require(k > 0, s"graft_kmv_sketch: k must be positive (got $k)")

    private type Buf = collection.mutable.ArrayBuffer[Long]

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def createAggregationBuffer(): Buf = collection.mutable.ArrayBuffer.empty

    /** Sorted-distinct insert, dropping the max when past k. */
    private def insert(b: Buf, h: Long): Unit = {
      val i = b.search(h)(Ordering.Long) match {
        case scala.collection.Searching.Found(_) => return // already present
        case scala.collection.Searching.InsertionPoint(p) => p
      }
      if (b.length < k) b.insert(i, h)
      else if (i < k) { b.insert(i, h); b.remove(k) }
    }

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null)
        insert(b, Kernels.hash60(
          org.apache.spark.unsafe.types.UTF8String.fromString(v.toString)))
      b
    }

    override def merge(b: Buf, o: Buf): Buf = { o.foreach(insert(b, _)); b }

    override def eval(b: Buf): Any = new GenericArrayData(b.toArray)

    override def serialize(b: Buf): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * b.length)
      bb.putInt(b.length)
      b.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val out: Buf = collection.mutable.ArrayBuffer.empty
      var i = 0
      while (i < n) { out += bb.getLong(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(n: Int): KmvAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): KmvAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): KmvAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_kmv_sketch"
  }

  /** Column wrapper: KMV sketch (sorted array<long> of ≤ k distinct hashes). */
  def kmv_sketch(key: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(key), k).toAggregateExpression())

  // ---------------------------------------------------------------------------
  // Digit histogram — deterministic re-aggregatable quantiles
  // ---------------------------------------------------------------------------

  /** Shared digit-histogram machinery: bucket-lb → count map, emitted as
    * an lb-SORTED array<struct<lb:long, n:long>> (sorted output = the
    * same bytes regardless of update/merge order). Bucket count is hard-
    * bounded by the grid itself: ≤ 9·10^(digits-1) buckets per decimal
    * magnitude × ≤ 19 magnitudes + the exact head — a few KB at
    * digits=2, which is what makes the sketch safe as a per-group
    * aggregate state and a streaming accumulator. */
  final class DigitHistBuf {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    def add(lb: Long, n: Long): Unit = {
      val cur = m.get(lb)
      m.put(lb, if (cur == null) n else cur.longValue + n)
    }
    def merge(o: DigitHistBuf): Unit = {
      val it = o.m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
    }
  }

  private def histDataType: DataType = ArrayType(StructType(Seq(
    StructField("lb", LongType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  private def histEval(b: DigitHistBuf): Any = {
    import scala.jdk.CollectionConverters._
    val entries = b.m.entrySet().asScala.toArray
      .map(e => (e.getKey.longValue, e.getValue.longValue))
      .sortBy(_._1)
    new GenericArrayData(entries.map { case (lb, n) =>
      org.apache.spark.sql.catalyst.InternalRow(lb, n): Any })
  }

  private def histSerialize(b: DigitHistBuf): Array[Byte] = {
    val n = b.m.size()
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    val it = b.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  private def histDeserialize(bytes: Array[Byte]): DigitHistBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new DigitHistBuf
    var i = 0
    while (i < n) { b.add(bb.getLong(), bb.getLong()); i += 1 }
    b
  }

  /** DECIMAL-DIGIT histogram of a non-negative long column — the
    * deterministic quantile sketch ([[Kernels.digitBucket]]): DDSketch's
    * log-bucket idea on an exact integer grid, so the sketch (and every
    * quantile read from it) is bit-identical across engines, partition
    * orders, and merge trees. Relative error ≤ 10^(1-digits) at the
    * bucket boundary; re-aggregate with [[DigitHistMergeAgg]]. */
  case class DigitHistAgg(
      child: Expression, digits: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DigitHistBuf] with UnaryLike[Expression] {
    require(digits >= 1 && digits <= 15,
      s"digit_hist: digits in [1, 15] (got $digits)")

    override def dataType: DataType = histDataType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): DigitHistBuf = new DigitHistBuf

    override def update(b: DigitHistBuf, input: InternalRow): DigitHistBuf = {
      val v = child.eval(input)
      if (v != null)
        b.add(Kernels.digitBucket(v.asInstanceOf[Number].longValue, digits), 1L)
      b
    }
    override def merge(b: DigitHistBuf, o: DigitHistBuf): DigitHistBuf = {
      b.merge(o); b
    }
    override def eval(b: DigitHistBuf): Any = histEval(b)
    override def serialize(b: DigitHistBuf): Array[Byte] = histSerialize(b)
    override def deserialize(bytes: Array[Byte]): DigitHistBuf =
      histDeserialize(bytes)
    override def withNewMutableAggBufferOffset(n: Int): DigitHistAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): DigitHistAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): DigitHistAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_digit_hist"
  }

  /** RE-aggregation of digit histograms (array<struct<lb,n>> input):
    * count-sum per bucket — the rollup lane (per-minute sketches → per-
    * hour quantiles, per-partition partials → global) and the streaming
    * state update. Output type and sorting identical to [[DigitHistAgg]],
    * and (sketch being a plain histogram) re-aggregation is EXACT: the
    * merged sketch equals the sketch of the concatenated inputs. */
  case class DigitHistMergeAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DigitHistBuf] with UnaryLike[Expression] {

    override def dataType: DataType = histDataType
    override def nullable: Boolean = false
    override def createAggregationBuffer(): DigitHistBuf = new DigitHistBuf

    override def update(b: DigitHistBuf, input: InternalRow): DigitHistBuf = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          val row = arr.getStruct(i, 2)
          b.add(row.getLong(0), row.getLong(1))
          i += 1
        }
      }
      b
    }
    override def merge(b: DigitHistBuf, o: DigitHistBuf): DigitHistBuf = {
      b.merge(o); b
    }
    override def eval(b: DigitHistBuf): Any = histEval(b)
    override def serialize(b: DigitHistBuf): Array[Byte] = histSerialize(b)
    override def deserialize(bytes: Array[Byte]): DigitHistBuf =
      histDeserialize(bytes)
    override def withNewMutableAggBufferOffset(n: Int): DigitHistMergeAgg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): DigitHistMergeAgg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildInternal(newChild: Expression): DigitHistMergeAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_digit_hist_merge"
  }

  /** Column wrapper: digit histogram of a non-negative long column. */
  def digit_hist(c: Column, digits: Int): Column =
    ColumnBridge.column(
      DigitHistAgg(ColumnBridge.expression(c), digits).toAggregateExpression())

  /** Column wrapper: merge pre-built digit histograms (rollup lane). */
  def digit_hist_merge(c: Column): Column =
    ColumnBridge.column(
      DigitHistMergeAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
