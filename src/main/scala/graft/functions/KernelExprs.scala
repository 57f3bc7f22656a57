package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions over the [[Kernels]] static methods.
  *
  * Why expressions and not column compositions / UDFs: the composed
  * higher-order-function versions build expression trees with hundreds of
  * interpreted nodes (one md5 sub-tree per hash member per shingle, one
  * ArrayAggregate per signature bit, …) — slow to analyze, slow to evaluate,
  * codegen-hostile. Each expression here generates a single static call
  * (`defineCodeGen`), stays inside whole-stage codegen, and evaluates in a
  * tight JIT-compiled loop. Semantics (and therefore the DuckDB oracles) are
  * identical to the composed forms they replace.
  */
object KernelExprs {

  /** md5-prefix 60-bit hash of a string column ([[Functions.hash60]]). */
  case class Hash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      Kernels.hash60(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.hash60($c)")
    override protected def withNewChildInternal(newChild: Expression): Hash60 =
      copy(child = newChild)
  }

  /** MinHash signature (array<long> of length `numHashes`) over an
    * array<string> shingle column. */
  case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      Kernels.minhashSig(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.minhashSig($c, $numHashes)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
  }

  /** 60-bit SimHash from an array<long> of token hashes. */
  case class SimHash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      Kernels.simhash60(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash60($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash60 =
      copy(child = newChild)
  }

  /** Exact integer dot product of two array<long> columns. */
  case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.dotLong(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dotLong($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLong =
      copy(left = newLeft, right = newRight)
  }

  /** Exact integer squared L2 distance of two array<long> columns. */
  case class L2sqLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.l2sqLong(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.l2sqLong($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): L2sqLong =
      copy(left = newLeft, right = newRight)
  }

  /** Quantized cosine (q6-rounded) of two array<long> columns. */
  case class CosineQ6(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosineQ6(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosineQ6($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineQ6 =
      copy(left = newLeft, right = newRight)
  }

  /** Bloom membership probe: true iff all `numHashes` seeded-hash60
    * positions of the key are set in the bit-word array (see
    * [[KernelAggs.BloomAgg]]). Per-row expression — the probing side of a
    * bloom semi-filter never joins or shuffles. */
  case class BloomContains(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
    override def dataType: DataType = BooleanType
    override protected def nullSafeEval(bloom: Any, key: Any): Any =
      Kernels.bloomContains(
        bloom.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        key.asInstanceOf[UTF8String], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (b, k) => s"graft.functions.Kernels.bloomContains($b, $k, $numHashes)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BloomContains =
      copy(left = newLeft, right = newRight)
  }

  /** Z-order (Morton) interleave of two integral columns' low `bits` bits
    * (int children widen to long — in eval via Number, in codegen via Java's
    * implicit int→long widening at the static call). */
  case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
    require(bits > 0 && bits <= 30, s"zorder2: bits in [1, 30] (got $bits)")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.zorder2(a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue(), bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.zorder2($a, $b, $bits)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
      copy(left = newLeft, right = newRight)
  }

  /** Unicode NFC normalization — [[graft.functions.Kernels.nfc]] as a
    * codegen'd expression. */
  case class Nfc(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(input: Any): Any =
      Kernels.nfc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.nfc($c)")
    override protected def withNewChildInternal(newChild: Expression): Nfc =
      copy(child = newChild)
  }

  /** Hilbert-curve index — [[graft.functions.Kernels.hilbert2]] as a
    * codegen'd expression; same domain contract as [[ZOrder2]]. */
  case class Hilbert2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
    require(bits > 0 && bits <= 30, s"hilbert2: bits in [1, 30] (got $bits)")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      Kernels.hilbert2(a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue(), bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.hilbert2($a, $b, $bits)")
    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Hilbert2 =
      copy(left = newLeft, right = newRight)
  }

  /** Three-way Morton interleave — [[graft.functions.Kernels.zorder3]] as
    * a codegen'd expression. bits ≤ 20 keeps 3·bits inside a long. */
  case class ZOrder3(first: Expression, second: Expression,
                     third: Expression, bits: Int)
    extends TernaryExpression {
    require(bits > 0 && bits <= 20, s"zorder3: bits in [1, 20] (got $bits)")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
      Kernels.zorder3(a.asInstanceOf[Number].longValue(),
        b.asInstanceOf[Number].longValue(),
        c.asInstanceOf[Number].longValue(), bits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b, c) => s"graft.functions.Kernels.zorder3($a, $b, $c, $bits)")
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): ZOrder3 =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** Best snippet window `[start, distinct_hits, total_hits]` of an
    * array<string> token column for a literal query-term array
    * ([[Kernels.bestWindow]]). */
  case class BestWindow(left: Expression, right: Expression, w: Int)
      extends BinaryExpression {
    require(w >= 1, s"snippet window must be >= 1 (got $w)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(ts: Any, terms: Any): Any =
      Kernels.bestWindow(
        ts.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        terms.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.Kernels.bestWindow($a, $b, $w)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BestWindow =
      copy(left = newLeft, right = newRight)
  }

  /** SQ8 encode: per-dim integer codes 0..255 of an array<long> vector
    * against literal array<long> bounds ([[Kernels.sq8Encode]]). */
  case class Sq8Encode(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(v: Any, mn: Any, mx: Any): Any =
      Kernels.sq8Encode(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        mn.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        mx.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b, c) => s"graft.functions.Kernels.sq8Encode($a, $b, $c)")
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Sq8Encode =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** SQ8 reconstruct: array<long> approximation from codes + bounds
    * ([[Kernels.sq8Recon]]). */
  case class Sq8Recon(first: Expression, second: Expression,
                      third: Expression) extends TernaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(codes: Any, mn: Any, mx: Any): Any =
      Kernels.sq8Recon(
        codes.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        mn.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        mx.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b, c) => s"graft.functions.Kernels.sq8Recon($a, $b, $c)")
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Sq8Recon =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** SRP-LSH bucket id of a quantized vector (array<long>). */
  case class SrpBucket(child: Expression, planes: Int) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      Kernels.srpBucket(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.srpBucket($c, $planes)")
    override protected def withNewChildInternal(newChild: Expression): SrpBucket =
      copy(child = newChild)
  }

  /** BPE-encode a text column against a trained merge table
    * ([[BpeTable]]): array<string> of subword symbols. The table rides
    * the expression (and, under codegen, the references array via
    * `addReferenceObj`) — it serializes to executors with the plan, so
    * there is no registry or broadcast to keep alive. */
  case class BpeEncode(child: Expression, table: BpeTable)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      table.encodeText(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeText($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeEncode =
      copy(child = newChild)
  }

  /** LOSSLESS inverse of byte-level BPE: array<string> tokens back to
    * the original text ([[BpeTable.decodeTokens]]) — the round-trip
    * probe that pins the byte-level coverage guarantee. */
  case class BpeDecode(child: Expression, table: BpeTable)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(input: Any): Any =
      table.decodeTokens(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.decodeTokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeDecode =
      copy(child = newChild)
  }

  /** Byte-level BPE to TOKEN IDS (array<int>, GPT-2 id space: byte
    * value 0-255, merge k → 256+k) — what a training pipeline emits. */
  case class BpeEncodeIds(child: Expression, table: BpeTable)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      table.encodeIds(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeIds($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
      copy(child = newChild)
  }

  /** Lossless inverse of [[BpeEncodeIds]]. */
  case class BpeDecodeIds(child: Expression, table: BpeTable)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(input: Any): Any =
      table.decodeIds(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.decodeIds($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeDecodeIds =
      copy(child = newChild)
  }

  /** BPE token COUNT of a text column — same merge loop, no array
    * materialized (the budget-accounting hot lane). */
  case class BpeCount(child: Expression, table: BpeTable)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      table.countTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeTable", table,
        classOf[BpeTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): BpeCount =
      copy(child = newChild)
  }

  /** Quantile read from a digit histogram
    * ([[KernelAggs.DigitHistAgg]]'s sorted array<struct<lb,n>>): lower
    * bound of the bucket holding the max(1, ceil(q·N))-th value — exact
    * integer walk, identical on every engine. */
  case class DigitQuantile(child: Expression, q: Double)
      extends UnaryExpression {
    require(q > 0.0 && q <= 1.0, s"digit_quantile: q in (0, 1] (got $q)")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override protected def nullSafeEval(input: Any): Any =
      Kernels.digitQuantile(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], q)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        // freshName, NOT a hardcoded local: two digit_quantile calls in
        // one projection (q169's 0.33/0.67 cutoffs) land in one codegen
        // scope — a fixed name redefines and throws the whole stage back
        // to interpreted mode (the intermittent "Redefinition of local
        // variable r" CompileException of BENCH_NOTES r12, root-caused
        // r13 by rerunning Verify under spark.sql.codegen.fallback=false)
        val r = ctx.freshName("dq")
        s"""
        Object $r = graft.functions.Kernels.digitQuantile($c, $q);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Long) $r).longValue(); }"""
      })
    override protected def withNewChildInternal(newChild: Expression): DigitQuantile =
      copy(child = newChild)
  }

  /** Unigram-LM (SentencePiece) Viterbi encode of a text column against a
    * trained piece table ([[UnigramTable]]): array<string> of pieces. The
    * table rides the expression (codegen via `addReferenceObj`) — it
    * serializes to executors with the plan. */
  case class UnigramEncode(child: Expression, table: UnigramTable)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      table.encodeText(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        classOf[UnigramTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeText($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
      copy(child = newChild)
  }

  /** Inverse of [[UnigramEncode]] — byte-exact for marker-free text. */
  case class UnigramDecode(child: Expression, table: UnigramTable)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(input: Any): Any =
      table.decodeTokens(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        classOf[UnigramTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.decodeTokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramDecode =
      copy(child = newChild)
  }

  /** Unigram token IDS (array<int>; 0 = <unk>, piece i → i+1). */
  case class UnigramEncodeIds(child: Expression, table: UnigramTable)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      table.encodeIds(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        classOf[UnigramTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeIds($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramEncodeIds =
      copy(child = newChild)
  }

  /** Inverse of [[UnigramEncodeIds]]. */
  case class UnigramDecodeIds(child: Expression, table: UnigramTable)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override protected def nullSafeEval(input: Any): Any =
      table.decodeIds(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        classOf[UnigramTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.decodeIds($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramDecodeIds =
      copy(child = newChild)
  }

  /** Unigram token COUNT — same Viterbi, no array materialized. */
  case class UnigramCount(child: Expression, table: UnigramTable)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      table.countTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unigramTable", table,
        classOf[UnigramTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): UnigramCount =
      copy(child = newChild)
  }

  /** Per-row digit-histogram bucket lower bound
    * ([[Kernels.digitBucket]]): the row-side companion of
    * [[graft.functions.KernelAggs.DigitHistAgg]], for comparing a value
    * against sketch-derived grid cutoffs on the SAME grid. */
  case class DigitBucket(child: Expression, digits: Int)
      extends UnaryExpression {
    require(digits >= 1, s"digit_bucket: digits must be >= 1 (got $digits)")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      Kernels.digitBucket(input.asInstanceOf[Number].longValue(), digits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Kernels.digitBucket($c, $digits)")
    override protected def withNewChildInternal(newChild: Expression): DigitBucket =
      copy(child = newChild)
  }

  /** WordPiece greedy longest-match encode
    * ([[WordPieceTable.encodeText]]): array<string> pieces; the
    * vocabulary ships with the plan. */
  case class WpEncode(child: Expression, table: WordPieceTable)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      table.encodeText(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpTable", table,
        classOf[WordPieceTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.encodeText($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): WpEncode =
      copy(child = newChild)
  }

  /** WordPiece token count without materializing the pieces. */
  case class WpCount(child: Expression, table: WordPieceTable)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      table.countTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wpTable", table,
        classOf[WordPieceTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.countTokens($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): WpCount =
      copy(child = newChild)
  }

  /** Stupid-backoff n-gram LM document score ([[NgramLmTable.scoreText]]):
    * struct(n_tokens, logscore_micros) — the exact-integer form that makes
    * the per-doc sum order-free. One codegen'd pass per document; the
    * model ships with the plan. */
  case class NgramLmScore(child: Expression, table: NgramLmTable)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("logscore_micros", LongType, nullable = false)))
    override protected def nullSafeEval(input: Any): Any =
      table.scoreText(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ngramLmTable", table,
        classOf[NgramLmTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.scoreText($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): NgramLmScore =
      copy(child = newChild)
  }

  /** [[NgramLmTable.scoreParts]] — the score's four ingredients summed
    * separately per document (num/den/backoffs without any logarithm,
    * plus lnm(num)/lnm(den) sums), for the gate's stage-bisecting q167
    * companion queries. Same codegen shape as [[NgramLmScore]]. */
  case class NgramLmParts(child: Expression, table: NgramLmTable)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("sum_num", LongType, nullable = false),
      StructField("sum_den", LongType, nullable = false),
      StructField("sum_backoffs", LongType, nullable = false),
      StructField("sum_lnum", LongType, nullable = false),
      StructField("sum_lden", LongType, nullable = false)))
    override protected def nullSafeEval(input: Any): Any =
      table.scoreParts(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ngramLmTable", table,
        classOf[NgramLmTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.scoreParts($c)")
    }
    override protected def withNewChildInternal(newChild: Expression): NgramLmParts =
      copy(child = newChild)
  }

  /** Dictionary keyword tagging via the shipped [[KeywordTable]]
    * automaton: distinct matched substrings, lexicographic order, one
    * pass over the text however large the dictionary. */
  case class KeywordHits(child: Expression, table: KeywordTable)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      table.hits(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("keywordTable", table,
        classOf[KeywordTable].getName)
      defineCodeGen(ctx, ev, c => s"$ref.hits($c)")
    }
    override protected def withNewChildInternal(
        newChild: Expression): KeywordHits = copy(child = newChild)
  }

  /** Pure-integer fixed-point ln-micros ([[Kernels.lnFixMicros]]) of a
    * positive long column — the engine-proof log every score lane shares
    * with its SQL oracle (which replays the identical recurrence as a
    * recursive CTE; see OracleLnFix). */
  case class LnFixMicros(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      Kernels.lnFixMicros(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.lnFixMicros($c)")
    override protected def withNewChildInternal(newChild: Expression): LnFixMicros =
      copy(child = newChild)
  }

  // --- Column-level wrappers -------------------------------------------------

  private def e(c: Column): Expression = ColumnBridge.expression(c)

  def ln_fix_micros(v: Column): Column =
    ColumnBridge.column(LnFixMicros(e(v)))

  def hash60(c: Column): Column = ColumnBridge.column(Hash60(e(c)))
  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(e(shingles), numHashes))
  def simhash60(hashes: Column): Column = ColumnBridge.column(SimHash60(e(hashes)))
  def dot_long(a: Column, b: Column): Column = ColumnBridge.column(DotLong(e(a), e(b)))
  def l2sq_long(a: Column, b: Column): Column =
    ColumnBridge.column(L2sqLong(e(a), e(b)))
  def best_window(ts: Column, terms: Column, w: Int): Column =
    ColumnBridge.column(BestWindow(e(ts), e(terms), w))
  def sq8_encode(v: Column, mn: Column, mx: Column): Column =
    ColumnBridge.column(Sq8Encode(e(v), e(mn), e(mx)))
  def sq8_recon(codes: Column, mn: Column, mx: Column): Column =
    ColumnBridge.column(Sq8Recon(e(codes), e(mn), e(mx)))
  def cosine_q6(a: Column, b: Column): Column = ColumnBridge.column(CosineQ6(e(a), e(b)))
  def srp_bucket(qv: Column, planes: Int): Column =
    ColumnBridge.column(SrpBucket(e(qv), planes))
  def bloom_contains(bloom: Column, key: Column, numHashes: Int): Column =
    ColumnBridge.column(BloomContains(e(bloom), e(key), numHashes))
  def zorder2(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(ZOrder2(e(a), e(b), bits))
  def zorder3(a: Column, b: Column, c: Column, bits: Int): Column =
    ColumnBridge.column(ZOrder3(e(a), e(b), e(c), bits))
  def hilbert2(a: Column, b: Column, bits: Int): Column =
    ColumnBridge.column(Hilbert2(e(a), e(b), bits))
  def nfc(c: Column): Column = ColumnBridge.column(Nfc(e(c)))
  def keyword_hits(text: Column, table: KeywordTable): Column =
    ColumnBridge.column(KeywordHits(e(text), table))
  def bpe_encode(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeEncode(e(text), table))
  def bpe_count(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeCount(e(text), table))
  def bpe_decode(tokens: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeDecode(e(tokens), table))
  def bpe_encode_ids(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeEncodeIds(e(text), table))
  def bpe_decode_ids(ids: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeDecodeIds(e(ids), table))
  def unigram_encode(text: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramEncode(e(text), table))
  def unigram_decode(tokens: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramDecode(e(tokens), table))
  def unigram_encode_ids(text: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramEncodeIds(e(text), table))
  def unigram_decode_ids(ids: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramDecodeIds(e(ids), table))
  def unigram_count(text: Column, table: UnigramTable): Column =
    ColumnBridge.column(UnigramCount(e(text), table))
  def digit_quantile(hist: Column, q: Double): Column =
    ColumnBridge.column(DigitQuantile(e(hist), q))
  def digit_bucket(v: Column, digits: Int): Column =
    ColumnBridge.column(DigitBucket(e(v), digits))
  def ngram_lm_score(text: Column, table: NgramLmTable): Column =
    ColumnBridge.column(NgramLmScore(e(text), table))
  def ngram_lm_parts(text: Column, table: NgramLmTable): Column =
    ColumnBridge.column(NgramLmParts(e(text), table))
  def wp_encode(text: Column, table: WordPieceTable): Column =
    ColumnBridge.column(WpEncode(e(text), table))
  def wp_count(text: Column, table: WordPieceTable): Column =
    ColumnBridge.column(WpCount(e(text), table))
}
