package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F, TextFunctions => TF}

/** Training-set preparation operators: sequence packing and
  * corpus-statistics quality scoring — the two steps that turn a cleaned,
  * deduplicated document set into model-ready batches.
  */
object TrainPrep {

  /** Concat-and-chunk sequence packing: documents are laid end-to-end and
    * cut every `budget` tokens — each document is assigned the chunk its
    * FIRST token lands in and its offset within that chunk (GPT-style
    * packing, where a document may span a cut).
    *
    * Packing is a running sum, which is inherently sequential — so it runs
    * WITHIN SHARDS (`shardBy`), the way production packers do: each shard
    * packs its own documents in `orderBy` order independently, one window
    * task per shard. The alternative — one global order — would serialize
    * 100 TB through a single task; with hash shards the parallelism is the
    * shard count and each task streams its shard once. Chunk ids are
    * per-shard (a training loader reads (shard, chunk) pairs).
    *
    * All arithmetic is integral (window sum over longs, `div`/`pmod`) —
    * no double lane to lose exactness past 2^53.
    */
  def packSequences(docs: DataFrame, id: Column, tokenCount: Column,
                    shardBy: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(id.as("doc_id"), tokenCount.cast("long").as("tok"),
        shardBy.cast("long").as("shard"))
      .withColumn("start", sum(col("tok")).over(w) - col("tok"))
      .withColumn("chunk", expr(s"start div $budget"))
      .withColumn("pos", pmod(col("start"), lit(budget.toLong)))
      .drop("start")
  }

  /** MATERIALIZED token-sequence packing — the step that actually EMITS
    * model-ready training rows, where [[packSequences]] only plans the
    * assignment: each document's token-id array gets an `eosId` appended,
    * documents lay end-to-end per shard in `doc_id` order, and the stream
    * is cut into exact `seqLen`-length `array<int>` rows (documents span
    * cuts — GPT-style packing). Each shard's trailing partial sequence is
    * DROPPED (the standard choice: padding would teach the model pad
    * tokens; the loss is < seqLen tokens per shard).
    *
    * Scale shape: one hash exchange on `shard` + an in-partition sort by
    * (shard, doc_id), then a single streaming pass per task holding at
    * most `seqLen` ids — no per-token explode/shuffle (a posexplode
    * spelling would shuffle every token of the corpus), no global order.
    * Deterministic given (shardBy, doc ids): re-runs emit identical
    * sequences, so shards are reproducible training units.
    *
    * Output: `(shard, seq_id, ids)` with `seq_id` dense per shard in
    * stream order. */
  def packTokenIds(docs: DataFrame, id: Column, ids: Column,
                   shardBy: Column, seqLen: Int, eosId: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val in = docs.select(shardBy.cast("long").as("shard"),
      id.cast("long").as("doc_id"), ids.as("ids"))
    val sp = in.sparkSession
    import sp.implicits._
    in.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { rows =>
        new Iterator[(Long, Long, Array[Int])] {
          private var curShard = 0L
          private var started = false
          private var seqId = 0L
          private val buf = new scala.collection.mutable.ArrayBuffer[Int](
            seqLen * 2)
          private val out =
            new scala.collection.mutable.Queue[(Long, Long, Array[Int])]()
          private def drain(): Unit =
            while (buf.length >= seqLen) {
              out.enqueue((curShard, seqId, buf.take(seqLen).toArray))
              buf.remove(0, seqLen)
              seqId += 1
            }
          @annotation.tailrec
          private def fill(): Unit =
            if (out.isEmpty && rows.hasNext) {
              val r = rows.next()
              val shard = r.getLong(0)
              if (!started || shard != curShard) {
                // new shard: the previous one's partial tail drops
                buf.clear(); seqId = 0L; curShard = shard; started = true
              }
              val arr = r.getSeq[Int](2)
              buf ++= arr
              buf += eosId
              drain()
              fill()
            }
          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): (Long, Long, Array[Int]) = {
            fill(); out.dequeue()
          }
        }
      }.toDF("shard", "seq_id", "ids")
  }

  /** One document's slice of a packed sequence: `ids[start, start+len)`
    * came from `doc_id` (its trailing EOS counted as the document's). */
  final case class DocSpan(doc_id: Long, start: Int, len: Int)

  /** Explicit Row schema for [[packWithBoundaries]] — NOT a Product
    * encoder: Spark's serializer codegen for a case class holding an
    * `Array[DocSpan]` field emits an unqualified `doc_spans()` call that
    * Janino cannot resolve ("No applicable constructor/method found"),
    * throwing the stage back to interpreted mode on every run (root-
    * caused r13 under spark.sql.codegen.fallback=false). The Row encoder
    * takes the standard array<struct> serializer path, which codegens
    * cleanly. */
  private val packedSeqSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("shard",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("seq_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ids",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false),
      nullable = false),
    org.apache.spark.sql.types.StructField("doc_spans",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("start",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("len",
            org.apache.spark.sql.types.IntegerType, nullable = false))),
        containsNull = false),
      nullable = false)))

  /** [[packTokenIds]] that ALSO emits each sequence's DOCUMENT SPANS —
    * `doc_spans: array<struct<doc_id, start, len>>` partitioning
    * `[0, seqLen)` in stream order. This is what block-diagonal
    * ("sample packing") attention masks and per-document loss masking
    * need: without the spans, a packed row silently attends across
    * document boundaries. The `ids` column is BIT-IDENTICAL to
    * [[packTokenIds]] (same cuts, same EOS placement, same tail drops) —
    * the spans are bookkeeping carried through the same single streaming
    * pass, so the cost over plain packing is one tiny array per row. */
  def packWithBoundaries(docs: DataFrame, id: Column, ids: Column,
                         shardBy: Column, seqLen: Int,
                         eosId: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val in = docs.select(shardBy.cast("long").as("shard"),
      id.cast("long").as("doc_id"), ids.as("ids"))
    import org.apache.spark.sql.Row
    in.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { rows =>
        new Iterator[Row] {
          private var curShard = 0L
          private var started = false
          private var seqId = 0L
          private val buf = new scala.collection.mutable.ArrayBuffer[Int](
            seqLen * 2)
          // (doc_id, tokens of it still in buf) — heads drain as cuts land
          private val segs =
            new scala.collection.mutable.ArrayBuffer[(Long, Int)]()
          private val out =
            new scala.collection.mutable.Queue[Row]()
          private def drain(): Unit =
            while (buf.length >= seqLen) {
              val spans =
                new scala.collection.mutable.ArrayBuffer[Row]()
              var cursor = 0
              while (cursor < seqLen) {
                val (d, rem) = segs.head
                val take = math.min(rem, seqLen - cursor)
                spans += Row(d, cursor, take)
                if (rem == take) { segs.remove(0); () }
                else segs(0) = (d, rem - take)
                cursor += take
              }
              out.enqueue(Row(curShard, seqId,
                buf.take(seqLen).toArray, spans.toSeq))
              buf.remove(0, seqLen)
              seqId += 1
            }
          @annotation.tailrec
          private def fill(): Unit =
            if (out.isEmpty && rows.hasNext) {
              val r = rows.next()
              val shard = r.getLong(0)
              if (!started || shard != curShard) {
                buf.clear(); segs.clear()
                seqId = 0L; curShard = shard; started = true
              }
              val arr = r.getSeq[Int](2)
              buf ++= arr
              buf += eosId
              segs += ((r.getLong(1), arr.length + 1))
              drain()
              fill()
            }
          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): Row = { fill(); out.dequeue() }
        }
      }(org.apache.spark.sql.Encoders.row(packedSeqSchema))
  }

  /** Corpus-wide PARAGRAPH-level exact deduplication — the line/paragraph
    * dedup step web-scale pipelines run before document-level MinHash
    * (boilerplate navigation, cookie banners, repeated headers): every
    * paragraph that appears anywhere else in the corpus keeps only its
    * FIRST occurrence (smallest (doc, position)), and documents are
    * reassembled from their surviving paragraphs in original order.
    * Output: (doc_id, text, n_para, n_kept) — documents whose every
    * paragraph was claimed elsewhere survive with empty text.
    *
    * Scale shape: first-occurrence is a map-side-combined `min(struct)`
    * GROUP BY paragraph — NOT a row_number window — so a boilerplate
    * paragraph appearing a billion times costs one combine-reduced key,
    * never a single-task sort (the skew case IS the use case).
    * `sort_array(collect_list(struct(pos, para)))` keeps the rebuild
    * order-exact without a per-doc window sort.
    *
    * Shuffle-byte shape (r8 verdict #4 + r9 verdict #3): the
    * first-occurrence aggregate and its join run on a TEXT-FREE
    * (doc_id, pos, h1, h2) lane keyed by a 128-bit paragraph hash (two
    * independent xxhash64 lanes — a single-lane collision never merges
    * distinct text), and paragraph TEXT crosses exactly ONE exchange: a
    * doc_id repartition whose partitioning satisfies both the
    * (doc_id, pos) keep-flag join and the per-doc reassembly groupBy.
    * On the boilerplate-heavy corpora this operator targets that halves
    * shuffled bytes vs letting the text ride the hash join. Collision
    * risk at 2^-128-ish per pair is the standard trade every hash-keyed
    * dedup (FineWeb, CCNet) makes; TrainPrepSpec asserts the text-free
    * exchanges carry only Long keys and that `para` feeds exactly one
    * exchange.
    */
  def paragraphDedup(docs: DataFrame, id: Column, text: Column,
                     sep: String = "\n\n"): DataFrame = {
    val paras = docs.select(id.as("doc_id"), text.as("__text"))
      .select(col("doc_id"), posexplode(split(col("__text"),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
      // two DIFFERENT functions of para (seed salt via a prepended
      // literal), so a single-lane collision never merges distinct text
      .withColumn("h1", xxhash64(col("para")))
      .withColumn("h2", xxhash64(lit(""), col("para")))
    // keep-flags compute on a TEXT-FREE lane (r9 verdict #3): the
    // first-occurrence aggregate and its join move only (doc_id, pos,
    // h1, h2); the text-bearing frame then repartitions ONCE by doc_id —
    // a partitioning that satisfies both the (doc_id, pos) flag join
    // (hash on a subset of the join keys) and the per-doc reassembly
    // groupBy, so the text crosses exactly ONE exchange end to end.
    val keys = paras.select(col("doc_id"), col("pos"), col("h1"), col("h2"))
    val first = keys.groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("h1"), col("h2"),
        col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val flags = keys.join(first, Seq("h1", "h2"))
      .select(col("doc_id"), col("pos"),
        (col("doc_id") === col("f_doc") && col("pos") === col("f_pos"))
          .as("keep"))
    paras.select(col("doc_id"), col("pos"), col("para"))
      .repartition(col("doc_id"))
      .join(flags, Seq("doc_id", "pos"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(sort_array(
            collect_list(when(col("keep"), struct(col("pos"), col("para"))))),
          p => p("para")), sep).as("text"),
        count(lit(1)).as("n_para"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** Domain-weighted CORPUS MIXING to a token budget — the sampling step
    * that turns a cleaned corpus into a training mixture (the
    * Pile/DoReMi-style recipe: "web 50%, code 30%, books 20% of N
    * tokens"): each domain `d` with budget fraction `weights(d)` gets a
    * target of `budget * weights(d)` tokens, sampled from its documents at
    * rate `target / domainTokens`. A rate above 1 means REPETITION — every
    * document appears in `floor(rate)` full epochs, and the fractional
    * remainder is a deterministic hash-sample that fields one extra epoch
    * for ~that fraction of documents. Domains absent from `weights` (or
    * weighted 0) drop out. Output: one row per (doc, epoch) —
    * `(doc_id, dom, epoch)`, epochs numbered from 0.
    *
    * Deterministic by construction: document selection is
    * [[graft.functions.Functions.hash60]] against a per-domain threshold
    * `⌊frac(rate)·2^60⌋`, so the SAME mixture comes out on every run,
    * engine, and cluster size (q128's DuckDB oracle replays it
    * bit-for-bit) — `rand()`-based mixing would break retries and make
    * training runs unreproducible. All arithmetic is IEEE binary64 on both
    * engines (rates are data-dependent ratios, exactness past 2^53 is not
    * required — the threshold only decides which side of a uniform hash a
    * document falls on).
    *
    * Scale shape: one tiny aggregate (rows = domains), a broadcast join of
    * the per-domain rates, then a per-row hash + bounded `sequence`
    * explode — the document table itself is never shuffled. `maxEpochs`
    * fails fast on a degenerate recipe (a near-empty domain asked to fill
    * a huge budget) instead of exploding a billion epoch rows. */
  def mixCorpus(docs: DataFrame, id: Column, domain: Column, tokens: Column,
                weights: Map[String, Double], budget: Long, seed: Int = 0,
                maxEpochs: Int = 1000): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(weights.values.forall(w => w >= 0 && !w.isNaN && !w.isInfinite),
      "weights must be finite and non-negative")
    val wmap = map(weights.toSeq.sortBy(_._1).flatMap {
      case (k, w) => Seq(lit(k), lit(w))
    }: _*)
    val rates = docs
      .select(domain.as("dom"), tokens.cast("long").as("__tok"))
      .groupBy(col("dom"))
      .agg(sum(col("__tok")).cast("double").as("__dtok"))
      .withColumn("__w", element_at(wmap, col("dom")))
      .filter(col("__w").isNotNull && col("__w") > 0 && col("__dtok") > 0)
      .withColumn("__rate",
        lit(budget.toDouble) * col("__w") / col("__dtok"))
      .select(col("dom"), floor(col("__rate")).cast("long").as("__full"),
        floor((col("__rate") - floor(col("__rate"))) *
          lit(1152921504606846976.0 /* 2^60 */)).cast("long").as("__thr"),
        col("__rate"))
    val tooHot = rates.filter(col("__rate") > maxEpochs).limit(1).collect()
    require(tooHot.isEmpty, s"domain '${tooHot.headOption.map(_.getString(0))
      .getOrElse("")}' needs more than $maxEpochs epochs — degenerate recipe")
    docs.select(id.as("doc_id"), domain.as("dom"))
      .join(broadcast(rates.drop("__rate")), Seq("dom"))
      .withColumn("__hi", col("__full") - 1 +
        when(F.hash60(col("doc_id").cast("string"), seed) < col("__thr"), 1L)
          .otherwise(0L))
      .filter(col("__hi") >= 0)
      .select(col("doc_id"), col("dom"),
        explode(sequence(lit(0L), col("__hi"))).as("epoch"))
  }

  /** TEMPERATURE-scaled domain weights for [[mixCorpus]] — the
    * multilingual/multi-source sampling recipe (Llama, XLM-R, mT5):
    * each domain's natural token share `p_d` is raised to `alpha ∈ (0,1]`
    * and renormalized, so `alpha = 1` keeps natural proportions and
    * smaller `alpha` flattens toward uniform, up-sampling the tail
    * domains a raw-share mixture would starve.
    *
    * One combine-reduced aggregate over the corpus (domains are few — the
    * result is a driver map). Weights are quantized to 6 decimals so the
    * recipe is reproducible bit-for-bit across engines and libm
    * implementations (`pow` is not IEEE-exact across platforms; a
    * last-ulp difference must not flip a downstream epoch threshold). */
  def temperatureWeights(docs: DataFrame, domain: Column, tokens: Column,
                         alpha: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val byDom = docs
      .select(domain.as("dom"), tokens.cast("long").as("__tok"))
      .groupBy(col("dom")).agg(sum(col("__tok")).cast("double").as("t"))
      .filter(col("t") > 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq.sortBy(_._1)
    val total = byDom.map(_._2).sum
    // alpha = 0.5 and 1.0 (the common recipes) avoid libm entirely:
    // sqrt is IEEE-correctly-rounded in every engine, so the oracle can
    // replay them exactly; other alphas fall back to pow, whose last-ulp
    // platform drift the 6-decimal quantization below absorbs
    def share(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x)
      else if (alpha == 1.0) x
      else math.pow(x, alpha)
    val pow = byDom.map { case (d, t) => d -> share(t / total) }
    val z = pow.map(_._2).sum
    pow.map { case (d, w) =>
      // floor(x*1e6 + 0.5)/1e6: one rounding rule both engines spell the
      // same way (DuckDB's ROUND ties differ from JVM rint)
      d -> (math.floor(w / z * 1e6 + 0.5) / 1e6)
    }.toMap
  }

  /** Unigram negative-log-likelihood quality score — the cheap stand-in
    * for the KenLM-perplexity filters CCNet-style pipelines run: tokens
    * are scored against the corpus's OWN top-`vocabSize` unigram
    * distribution, and each document gets the mean negative log-prob of
    * its tokens (low = ordinary prose, high = rare-token soup). Documents
    * with zero tokens drop out.
    *
    * Scale shape: the vocabulary is capped at `vocabSize` rows and
    * BROADCAST — the token stream is never shuffled for the lookup;
    * out-of-vocabulary tokens take the floor probability 1/total. The only
    * shuffles are the bounded vocab top-K and the per-document partial
    * aggregation. Per-token log-probs are INTEGER ln-micros
    * (lnm(freq) − lnm(total), the pure-integer fixed-point log) summed
    * exactly, so the per-document mean is order-independent —
    * reproducible bit-for-bit in the DuckDB oracle (q108), which replays
    * the identical integer recurrence.
    */
  def unigramNll(docs: DataFrame, id: Column, text: Column,
                 vocabSize: Int): DataFrame = {
    val toks = docs.select(id.as("doc_id"), explode(TF.tokens(text)).as("token"))
    val total = toks.agg(count(lit(1)).as("total"))
    val vocab = TopK.global(
      toks.groupBy(col("token")).agg(count(lit(1)).as("freq")),
      vocabSize, col("freq").desc, col("token").asc)
    // per-token log-prob as INTEGER ln-micros (lnm(freq) − lnm(total),
    // the pure-integer fixed-point log — no libm on either side), summed
    // exactly; the per-document mean divides once in IEEE doubles
    toks.join(broadcast(vocab), Seq("token"), "left")
      .crossJoin(broadcast(total)) // single-row scalar, exact pattern as sketches
      .withColumn("lpm",
        graft.functions.KernelExprs.ln_fix_micros(coalesce(col("freq"), lit(1L))) -
          graft.functions.KernelExprs.ln_fix_micros(col("total")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        F.qround((-sum(col("lpm"))).cast("double") / lit(1000000.0)
          / count(lit(1)), 4).as("nll"))
  }

  /** DETERMINISTIC training-order shuffle: the global pseudo-random
    * permutation a training run reads its (doc, epoch) stream in —
    * seeded, so every retry, resume, and re-run of the job (any cluster
    * size, any engine) produces the SAME order, which is what makes a
    * loss curve reproducible and a mid-epoch resume well-defined.
    * `rand()` cannot give any of that.
    *
    * Each row is keyed by `md5(seed:epoch:doc_id)`; the key's
    * [[graft.functions.Functions.hash60]] picks one of `numShards`
    * shards and rows order by the md5 hex WITHIN their shard
    * (`pos` = 0-based rank). A distributed loader assigns shard files to
    * workers and streams each in `pos` order — the standard
    * shard-of-shuffled-records layout (WebDataset/tfrecord style).
    *
    * Scale shape: one hash-partitioned exchange on `shard` and one
    * per-shard sort (the window never sees more than a shard — size
    * `numShards` so shards are task-sized); no global sort, no driver
    * state. Epoch fan-out composes upstream ([[mixCorpus]] /
    * [[temperatureWeights]] emit the (doc, epoch) rows). */
  def trainingOrder(docEpochs: DataFrame, id: Column, epoch: Column,
                    seed: Long, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val keyed = docEpochs.select(id.cast("long").as("doc_id"),
        epoch.cast("long").as("epoch"))
      .withColumn("okey",
        md5(concat_ws(":", lit(seed), col("epoch"), col("doc_id"))))
      .withColumn("shard", pmod(F.hash60(col("okey")), lit(numShards.toLong)))
    keyed
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("okey"), col("doc_id"), col("epoch"))).cast("long") - 1L)
      .select(col("shard"), col("pos"), col("doc_id"), col("epoch"))
  }

  /** Overlapping token-window CHUNKING — the document → context-window
    * mapping every embedding/RAG pipeline runs before vectorizing, and
    * the sliding-window variant of training-sequence preparation: window
    * k covers tokens `[k·stride, k·stride + size)`, so consecutive
    * chunks overlap by `size - stride` tokens (overlap preserves
    * cross-boundary context; `stride = size` gives disjoint chunks).
    * Chunk count per doc = 1 + ⌈max(0, n − size) / stride⌉ — every token
    * is covered, the last window may be short, token-free docs emit no
    * chunks. Whitespace tokenization, single-space rejoin (the standard
    * splitter trade); all arithmetic integral.
    *
    * Scale shape: one projection + posexplode — embarrassingly parallel,
    * no shuffle at all; output order is (doc, chunk_id) within each
    * input row. Output: (doc_id, chunk_id, n_tokens, chunk_text). */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0, s"size must be positive (got $size)")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size] (got $stride)")
    docs.select(id.as("doc_id"),
        filter(split(text, "\\s+"), t => length(t) > 0).as("ts"))
      .select(col("doc_id"), col("ts"),
        org.apache.spark.sql.functions.size(col("ts")).as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L),
            expr(s"(greatest(0L, n - $size) + ${stride - 1}) div $stride")),
          k => struct(
            least(lit(size.toLong), col("n") - k * stride).as("nt"),
            concat_ws(" ", slice(col("ts"),
              (k * stride + 1).cast("int"), lit(size))).as("ct"))))
          .as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.nt").as("n_tokens"), col("c.ct").as("chunk_text"))
  }

  /** CCNet-style perplexity curation (Wenzek et al. 2020, "CCNet:
    * Extracting high quality monolingual datasets from web crawl data"):
    * per language, split the corpus into HEAD / MIDDLE / TAIL by the
    * reference LM's per-token negative log-score — head is the most
    * fluent third, the slice CCNet keeps for pretraining.
    *
    * Scale shape — NO per-language global sort (CCNet itself computes
    * percentile CUTOFFS and buckets by comparison, precisely because a
    * total order over a web crawl is unaffordable): one codegen'd pass
    * scores and language-ids every document ([[graft.functions
    * .KernelExprs.NgramLmScore]] + [[TF.lang_id]]); per-language
    * third-boundaries come from the exact-decimal digit-histogram sketch
    * ([[graft.functions.KernelAggs.digit_hist]], map-side combined,
    * languages × ~hundreds of buckets) at q = 0.33 / 0.67 (conservative
    * rank rule); documents bucket by comparing against the broadcast
    * cutoffs. Everything is integer-exact: the metric is
    * `nll = (-logscore_micros) div n_tokens` (truncating division of
    * non-negatives), so sketch, cutoffs, and buckets replay bit-for-bit
    * in the SQL oracle (q169). Cutoff granularity is the sketch's ≤10%
    * relative bucket width at 2 digits — the boundary lands on a grid
    * value, ties bucket toward head/middle, deterministic both engines.
    *
    * Token-free documents are dropped (CCNet drops them; their NLL is
    * undefined). Output: (doc_id, lang, n_tokens, nll, bucket). */
  /** The curation pipeline's pre-bucket surface — (doc_id, lang,
    * n_tokens, nll) for every token-bearing document — exposed on its own
    * so the q169 companion gate (q169a) can pin the score/language stage
    * independently of the cutoff/bucket stage ([[curationBuckets]] = this
    * + digit-histogram cutoffs + the bucket comparison). */
  def curationScores(docs: DataFrame, id: Column, text: Column,
                     lm: graft.functions.NgramLmTable): DataFrame = {
    import graft.functions.{KernelExprs => KE}
    docs.select(id.as("doc_id"), TF.lang_id(text).as("lang"),
        KE.ngram_lm_score(text, lm).as("s"))
      .filter(col("s.n_tokens") > 0)
      .select(col("doc_id"), col("lang"),
        col("s.n_tokens").cast("long").as("n_tokens"),
        F.bind(-col("s.logscore_micros")) { neg =>
          // exact truncating division: subtract the remainder first so
          // the double division is of a divisible pair (< 2^53 — exact)
          ((neg - neg % col("s.n_tokens")) / col("s.n_tokens")).cast("long")
        }.as("nll"))
  }

  /** One bisection notch below [[curationScores]] (the q169b companion
    * surface): the per-document (lang, n_tokens, score_micros) pair
    * BEFORE the `(-m) div n` truncating division — same single-pass
    * select, same token-free drop, no arithmetic past the LM kernel. A
    * gate red that hits [[curationScores]] but not this names the
    * division/negation spelling alone. */
  def curationParts(docs: DataFrame, id: Column, text: Column,
                    lm: graft.functions.NgramLmTable): DataFrame = {
    import graft.functions.{KernelExprs => KE}
    docs.select(id.as("doc_id"), TF.lang_id(text).as("lang"),
        KE.ngram_lm_score(text, lm).as("s"))
      .filter(col("s.n_tokens") > 0)
      .select(col("doc_id"), col("lang"),
        col("s.n_tokens").cast("long").as("n_tokens"),
        col("s.logscore_micros").as("score_micros"))
  }

  def curationBuckets(docs: DataFrame, id: Column, text: Column,
                      lm: graft.functions.NgramLmTable): DataFrame = {
    import graft.functions.{KernelAggs => KA, KernelExprs => KE}
    // scored feeds TWO consumers (the cutoff aggregate and the output
    // join); without a checkpoint each re-runs the dedup + LM-score
    // lineage — two full corpus scoring passes. The frame is OUTPUT-sized
    // (4 narrow columns, no text), so materializing it is the cheap side
    // of that trade at any scale. Lazy localCheckpoint, not persist():
    // the blocks die with the DataFrame instead of leaking a CacheManager
    // entry per call (the Dedup.minhashCandidates convention).
    val scored = curationScores(docs, id, text, lm).localCheckpoint(false)
    val cuts = scored.groupBy(col("lang"))
      .agg(KA.digit_hist(col("nll"), 3).as("h"))
      .select(col("lang"),
        KE.digit_quantile(col("h"), 0.33).as("t_head"),
        KE.digit_quantile(col("h"), 0.67).as("t_mid"))
    // grid-to-grid comparison: the cutoffs are digit-bucket LOWER BOUNDS,
    // so the row compares its OWN bucket — values sharing the boundary
    // bucket land together (in the better bucket), on both engines
    scored.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("nll"),
        F.bind(KE.digit_bucket(col("nll"), 3)) { lb =>
          when(lb <= col("t_head"), "head")
            .when(lb <= col("t_mid"), "middle")
            .otherwise("tail")
        }.as("bucket"))
  }

  /** Parse + validate named split weights into CUMULATIVE micros
    * boundaries: each weight quantizes to round(w·10⁶) and the quantized
    * weights must sum to exactly 10⁶ — the splits partition the corpus by
    * construction, with no float accumulating anywhere. */
  private def splitBoundsMicros(weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate split names in ${weights.map(_._1)}")
    val micros = weights.map { case (nm, w) =>
      val m = math.round(w * 1000000.0)
      require(m > 0, s"split '$nm' weight $w rounds to zero micros")
      nm -> m
    }
    require(micros.map(_._2).sum == 1000000L,
      s"split weights must sum to exactly 1.0 " +
        s"(got ${micros.map(_._2).sum} micros from ${weights.map(_._2)})")
    micros.scanLeft(("", 0L)) { case ((_, acc), (nm, m)) => (nm, acc + m) }
      .drop(1)
  }

  /** DETERMINISTIC NAMED SPLITS by hash threshold — the train/val/test
    * assignment every corpus release needs, in the shape that survives
    * 100 TB and a growing corpus: `split` is a pure per-row function of
    * `hash60(key ‖ '#seed') mod 10⁶` against cumulative integer-micros
    * boundaries. Zero shuffles, zero state, codegen'd — and GROWTH-
    * STABLE: a document's split NEVER changes when other documents
    * arrive or leave (the property that keeps eval sets honest across
    * corpus refreshes; per-row hashing is also how a distributed
    * pipeline avoids coordinating a global permutation). Proportions are
    * exact in expectation, ±binomial noise per stratum — use
    * [[splitExact]] when a bounded stratum needs exact quotas. */
  def splitAssign(docs: DataFrame, key: Column,
                  weights: Seq[(String, Double)], seed: Int = 0): DataFrame = {
    val bounds = splitBoundsMicros(weights)
    val bucket = F.hash60(key.cast("string"), seed) % 1000000L
    val expr = bounds.init.foldRight(lit(bounds.last._1)) {
      case ((nm, hi), alt) => when(bucket < hi, nm).otherwise(alt)
    }
    docs.withColumn("split", expr)
  }

  /** EXACT per-stratum quotas: within every stratum, rows rank by
    * `(hash60(key ‖ '#seed'), key)` — a deterministic shuffle — and the
    * boundary for cumulative weight W over n rows is `(W_micros·n) div
    * 10⁶` (floor; the last split takes the remainder), so split sizes
    * are EXACT integers of the stratum count on any engine. One
    * exchange + per-stratum sort: the right tool for bounded strata
    * (per-language eval quotas, benchmark slices) — for the open-ended
    * corpus-wide assignment use [[splitAssign]], whose membership is
    * also stable under growth (exact quotas inherently are not: row n+1
    * can move a boundary). */
  def splitExact(docs: DataFrame, key: Column, strata: Column,
                 weights: Seq[(String, Double)], seed: Int = 0): DataFrame = {
    val bounds = splitBoundsMicros(weights)
    val h = F.hash60(key.cast("string"), seed)
    // collision-proof working columns (ADVICE r14: fixed `_stratum`/
    // `_rk`/`_n` names silently overwrote-then-dropped caller columns):
    // suffix underscores until the name is free of the input schema
    val taken = docs.columns.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    def fresh(base: String): String = {
      var n = base
      while (taken.contains(n.toLowerCase(java.util.Locale.ROOT))) n += "_"
      n
    }
    val (cS, cRk, cN) = (fresh("_stratum"), fresh("_rk"), fresh("_n"))
    val w = Window.partitionBy(col(cS))
    val ranked = docs
      .withColumn(cS, strata)
      .withColumn(cRk, row_number().over(
        w.orderBy(h.asc, key.cast("string").asc)))
      .withColumn(cN, count(lit(1)).over(w))
    val expr = bounds.init.foldRight(lit(bounds.last._1)) {
      case ((nm, hi), alt) =>
        // exact truncating division (the curationScores pattern): strip
        // the remainder first so the double division is of a divisible
        // pair — hi·n ≤ 10⁶·n stays a long, the quotient stays < 2^53
        val boundary = F.bind(lit(hi) * col(cN)) { prod =>
          ((prod - prod % 1000000L) / 1000000L).cast("long")
        }
        when(col(cRk) <= boundary, nm).otherwise(alt)
    }
    ranked.withColumn("split", expr).drop(cS, cRk, cN)
  }

  /** DATASET CARD: the per-source summary every corpus release ships —
    * document and token counts, exact-duplicate pressure (distinct text
    * hashes vs rows), dominant language, and token-length extremes, all
    * as exact integers so the card replays bit-for-bit in the oracle.
    *
    * Scale shape: ONE grouped aggregate over (source) with a two-phase
    * exact count-distinct on the 128-bit text hash (Spark's expand-based
    * distinct aggregate — partial per partition, one exchange on the
    * group key), plus a (source, lang)-grained count whose argmax
    * (count desc, lang asc — deterministic) broadcasts back. No
    * driver-side iteration; output is source-cardinality-sized. */
  def corpusReport(docs: DataFrame, text: Column, source: Column,
                   lang: Column): DataFrame = {
    val base = docs.select(source.as("source"), lang.as("lang"),
      size(TF.tokens(text)).cast("long").as("n_tok"),
      md5(text.cast("string")).as("h"))
    val per = base.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tok").as("n_tokens"),
      countDistinct(col("h")).as("n_unique_texts"),
      min("n_tok").as("min_tokens"),
      max("n_tok").as("max_tokens"))
    val topLang = base.groupBy("source", "lang")
      .agg(count(lit(1)).as("lang_docs"))
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(col("lang_docs").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("lang_docs").as("top_lang_docs"))
    per.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_unique_texts"),
        (col("n_docs") - col("n_unique_texts")).as("n_dup_docs"),
        col("top_lang"), col("top_lang_docs"),
        col("min_tokens"), col("max_tokens"))
  }
}
