package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Functions => F, TextFunctions => TF}

/** Document deduplication for training-data pipelines, at 100 TB shapes:
  *
  *  - exact:      content-hash groupBy (one shuffle on a 60-bit hash).
  *  - MinHash+LSH: shingle → k minhashes → b bands → candidates share a
  *    band bucket. Only bucket-mates are compared: the O(n²) pair space is
  *    cut to near-linear. Self-join happens on (band, bucketHash) — a
  *    shuffle-hash join on a high-cardinality key, skew-safe.
  *  - SimHash:    64-bit signature; near-dups = small Hamming distance,
  *    candidates via d-choose bit-band buckets.
  *  - n-gram Jaccard: exact verification of candidate pairs.
  *
  * All hashes go through [[F.hash60]] (md5-prefix) so every stage is
  * bit-reproducible in the ANSI-SQL oracle.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the minimum id per group.
    * Returns (hash, keep_id, dup_count) — one row per distinct content. */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Keep one row (min id) per distinct `text`; scalable exact dedup.
    * Spelled as groupBy(hash) + min(id) + per-column min_by(c, id) rather
    * than a row_number window: the aggregate gets MAP-SIDE partial
    * aggregation (each input partition ships at most one candidate row
    * per distinct hash instead of every duplicate — guide §2.3
    * "aggregate before you shuffle"), skips the window's per-partition
    * sorts, and — unlike a single min(struct(all cols)) — keeps COLUMN
    * PRUNING alive: a consumer projecting two columns aggregates two
    * columns (each min_by depends only on its own column + the id),
    * where the struct spelling forced every column through the shuffle.
    * On duplicate ids min_by's tie is arbitrary, exactly like
    * row_number's tie order was; ids are unique by contract. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val others = df.columns.filterNot(_ == idCol)
      .map(c => min_by(col(c), col(idCol)).as(c))
    df.groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol), others.toSeq: _*)
      .select(df.columns.map(col): _*)
  }

  /** MinHash signature as an array<long> of `numHashes` minima over
    * `shingles` (array<string>), using seeded [[F.hash60]] members
    * (`hash60(shingle + "#" + j)`). Empty shingle set → all-zero signature.
    * Native [[graft.functions.KernelExprs.MinHashSig]] expression: one
    * codegen'd call per row instead of `numHashes` md5 expression trees. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.KernelExprs.minhash_sig(shingles, numHashes)

  /** LSH band keys: split the signature into `bands` rows of `rowsPerBand`,
    * hash each band to a bucket string "b:hash". */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(b => concat(lit(b + ":"),
      md5(concat_ws("_", slice(signature, b * rowsPerBand + 1, rowsPerBand))))): _*)

  /** Candidate near-duplicate pairs (idA < idB) from MinHash LSH, with the
    * estimated Jaccard (fraction of agreeing signature components).
    *
    * Degenerate-bucket guard: a pathological corpus (every document
    * identical, a boilerplate page repeated millions of times) collapses
    * into ONE band bucket, and the all-pairs self-join would put O(n²)
    * pairs in a single task. Buckets above `maxBucket` members degrade to
    * SIGNATURE-GROUP stars: members sharing the full MinHash signature are
    * certain candidates (est_jaccard exactly 1.0), so each signature group
    * stars to its min id — identical-document floods keep their
    * above-threshold edges AND their clusters — and the (far fewer) group
    * hubs then pair with each other (all-pairs while hubs ≤ `maxBucket`,
    * else a hub star), preserving cross-group connectivity at hub
    * granularity. Work per bucket is bounded by O(members) + one
    * cap-sized all-pairs — never the raw clique. The only loss vs
    * all-pairs: a cross-group member pair whose est clears a caller's
    * threshold while its HUBS' pair does not — third-order, and only
    * above the cap. Buckets at or under the cap are emitted all-pairs,
    * unchanged.
    *
    * @param df        input
    * @param id        unique document id (long)
    * @param shingleN  word-shingle width
    * @param numHashes signature length
    * @param bands     LSH bands (rows/band = numHashes/bands)
    * @param maxBucket all-pairs cap per band bucket (star degradation above)
    */
  def minhashCandidates(df: DataFrame, id: Column, text: Column,
                        shingleN: Int, numHashes: Int, bands: Int,
                        maxBucket: Int = 4096): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(maxBucket >= 1, s"maxBucket must be >= 1 (got $maxBucket)")
    val r = numHashes / bands
    // The shingle+hash stage is CPU-bound; a small input (one parquet file =
    // one split) would pin it to a single core. Balance up to the cluster's
    // parallelism — at scale the scan already has >= that many splits and no
    // shuffle is added.
    val input = df.select(id.as("doc_id"), text.as("__text"))
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    // Rebalance decision from optimizer STATS, not `.rdd.getNumPartitions`
    // (which materializes the whole RDD lineage just to read a number): an
    // input smaller than one target split per core can't keep every core
    // busy through the CPU-bound shingle+hash stage — spread it. A large
    // input already scans with >= `parallelism` splits; leave it alone.
    val targetSplitBytes = 64L << 20
    val sizeInBytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val balanced =
      if (sizeInBytes < BigInt(parallelism) * targetSplitBytes)
        input.repartition(parallelism)
      else input
    // The CPU-bound shingle+minhash stage runs ONCE: the banded signature
    // table (ids + numHashes longs + a band key — ~100x smaller than the
    // text it came from) is checkpointed LAZILY, so the guard probe's
    // aggregate is the job that materializes it — probe and fill share
    // one pass (the eager localCheckpoint(true) here cost a separate
    // materialization job before the probe could run; measured
    // ~0.3-0.5 s of q30's wall). Lazy localCheckpoint, not persist():
    // checkpoint blocks are reclaimed by the ContextCleaner when the RDD
    // is GC'd, while a persist() registers in the session CacheManager
    // and leaks a cached table per call without an unpersist no caller
    // can safely place. The self-join then reads the stored blocks. At
    // cluster scale this is the standard LSH shape — signatures are
    // materialized, never recomputed per consumer; a 100 TB pipeline that
    // must survive executor loss persists the signature table to its lake
    // instead — same plan, durable store.
    val sigs = balanced.select(col("doc_id"),
        minhashSignature(TF.word_shingles(col("__text"), shingleN), numHashes).as("sig"))
      .withColumn("band", explode(lshBandKeys(col("sig"), bands, r)))
      .localCheckpoint(false)
    def estJaccard = (size(filter(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), e => e))
      .cast("double") / numHashes).as("est_jaccard")

    // ---- ADAPTIVE guard: probe, then plan -------------------------------
    // Whether ANY bucket exceeds the cap is ONE boolean — probe it with a
    // driver-side isEmpty (a limit-1 job over a map-side-combined count,
    // never a collect of the buckets themselves). The common corpus has no
    // hot bucket, and gets EXACTLY the unguarded plan: one band self-join
    // over the materialized signatures — the round-6 shape charged every
    // run for the degenerate case (the guard's count join + star/hub
    // union branches compiled ~60 codegen stages and tripled q30's wall
    // time with zero hot rows flowing through them). The probe is
    // data-deterministic, so results stay oracle-reproducible.
    val hasHot = !sigs.groupBy(col("band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket).isEmpty
    if (!hasHot) {
      val a = sigs.select(col("band"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("band"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
      return a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), estJaccard)
        .distinct()
    }

    // ---- degenerate corpus: star degradation ----------------------------
    // ONE exchange on the band key: the hot-flag aggregate, both self-join
    // sides, and every star/hub branch hang off this same repartition of
    // the materialized signature table.
    val shuffled = sigs.repartition(col("band"))
    val hotBands = shuffled.groupBy(col("band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
    val annotated = shuffled.join(broadcast(hotBands), Seq("band"), "left_outer")
    // at-or-under the cap: all pairs, exactly as before
    val normal = annotated.filter(col("__n").isNull)
    val a = normal.select(col("band"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = normal.select(col("band"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val pairsN = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard)
    // above the cap: signature-group stars + hub-level pairs
    val hot = annotated.filter(col("__n").isNotNull)
    val sigGroups = hot.groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("ghub"))
    // member → its signature-group hub: same signature, est exactly 1.0
    val pairsG = hot.join(sigGroups, Seq("band", "sig"))
      .filter(col("doc_id") =!= col("ghub"))
      .select(col("ghub").as("id_a"), col("doc_id").as("id_b"),
        lit(1.0).as("est_jaccard"))
    // hub-level candidates: all-pairs while the hub count fits the cap,
    // else a star onto the bucket's min hub
    val hubCounts = sigGroups.groupBy(col("band"))
      .agg(count(lit(1)).as("__hn"), min(col("ghub")).as("__minh"))
    val hubs = sigGroups.join(hubCounts, Seq("band"))
    val hubNormal = hubs.filter(col("__hn") <= maxBucket)
    val hubPairs = hubNormal
      .select(col("band"), col("ghub").as("id_a"), col("sig").as("sig_a"))
      .join(hubNormal
        .select(col("band"), col("ghub").as("id_b"), col("sig").as("sig_b")),
        Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), estJaccard)
    val hubHot = hubs.filter(col("__hn") > maxBucket)
    val hubStars = hubHot.filter(col("ghub") =!= col("__minh"))
      .select(col("band"), col("ghub").as("id_b"), col("sig").as("sig_b"))
      .join(hubHot.filter(col("ghub") === col("__minh"))
        .select(col("band"), col("ghub").as("id_a"), col("sig").as("sig_a")),
        Seq("band"))
      .select(col("id_a"), col("id_b"), estJaccard)
    pairsN.unionByName(pairsG).unionByName(hubPairs).unionByName(hubStars)
      .distinct()
  }

  /** Connected components over an undirected candidate-pair edge list —
    * near-dup PAIRS become duplicate CLUSTERS (cluster id = min member id),
    * the step that turns LSH output into a keep-one-per-cluster decision.
    *
    * Iterative min-label propagation: each round every node takes the
    * minimum label among itself and its neighbors; converged when no label
    * changes. Rounds = graph diameter (dup clusters are near-cliques, so
    * 2-3 in practice). Each iteration is one shuffle; `localCheckpoint`
    * truncates the lineage so plans do not grow with iterations — the
    * classic failure mode of iterative DataFrame algorithms at scale.
    * Nodes absent from `pairs` are singletons and not emitted.
    *
    * Output: (id, cluster). */
  def duplicateClusters(pairs: DataFrame, idA: String = "id_a",
                        idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    val fwd = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nlabel"))
      // convergence check rides the SAME action as the materialization: an
      // observe() metric counts changed labels during the eager checkpoint
      // job, so each iteration is exactly one Spark action (the r2 shape ran
      // a second filter/isEmpty job per round)
      val obs = org.apache.spark.sql.Observation(s"cc_changed_$i")
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("newLabel"))
        .observe(obs, coalesce(
          sum(when(col("newLabel") < col("label"), 1L).otherwise(0L)), lit(0L))
          .as("changed"))
        .localCheckpoint(true)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      labels = updated.select(col("id"), col("newLabel").as("label"))
      i += 1
    }
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** 64-bit SimHash over the document's tokens: bit i of the signature is 1
    * iff the sum over tokens of ±1 (sign of bit i of the token hash) is
    * positive. Pure higher-order column expressions — no UDF, no shuffle. */
  def simhash64(text: Column): Column =
    simhashFromHashes(transform(TF.tokens(text), t => F.hash60(t)))

  /** SimHash from a pre-computed array<long> of token hashes: bit i set iff
    * the ±1 votes on bit i of the token hashes sum positive. Native
    * [[graft.functions.KernelExprs.SimHash60]]: one codegen'd call instead of
    * 60 interpreted array-aggregate trees. */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.KernelExprs.simhash60(hashes)

  /** Hamming distance between two long columns (bit-counting). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash LSH band keys: the 60-bit signature split into `bands` chunks
    * of 60/bands bits, each rendered "b:chunk". Pigeonhole guarantee: two
    * signatures within Hamming distance < bands share at least one chunk. */
  def simhashBandKeys(sim: Column, bands: Int): Column = {
    require(60 % bands == 0, "bands must divide 60")
    val w = 60 / bands
    val mask = (1L << w) - 1
    array((0 until bands).map(b => concat(lit(s"$b:"),
      shiftright(sim, b * w).bitwiseAND(mask).cast("string"))): _*)
  }

  /** SimHash near-dup candidates — the banded analogue of
    * [[minhashCandidates]] for the 60-bit signature space: only documents
    * sharing a band chunk are paired (bucketed self-join on the chunk key,
    * never all-pairs), each candidate annotated with its exact Hamming
    * distance. Any pair closer than `bands` bits is guaranteed caught.
    *
    * Degenerate-bucket guard (same shape as [[minhashCandidates]]): a
    * boilerplate flood shares one chunk value, and the unguarded self-join
    * would put O(n²) pairs in a single task. Chunks above `maxBucket`
    * members degrade to SIGNATURE-GROUP stars keyed on the FULL 60-bit
    * signature: identical signatures are Hamming-0 certain duplicates, each
    * group stars to its min id, and the (far fewer) group hubs pair among
    * themselves with their real Hamming distance (all-pairs while hubs fit
    * the cap, else a hub star). Work per chunk bucket is O(members) + one
    * cap-bounded all-pairs. Cold buckets (≤ cap) are emitted all-pairs,
    * bit-identical to the unguarded plan. One exchange total: the guard's
    * count and both join sides reuse the same band repartition.
    * Output: (id_a, id_b, hamming) distinct, id_a < id_b. */
  def simhashCandidates(df: DataFrame, id: Column, text: Column,
                        bands: Int, maxBucket: Int = 4096): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1 (got $maxBucket)")
    val sigs = df.select(id.as("doc_id"), simhash64(text).as("sh"))
      .withColumn("band", explode(simhashBandKeys(col("sh"), bands)))
      .localCheckpoint(true)
    // adaptive guard probe, as in [[minhashCandidates]]: one limit-1 job
    // over the materialized signatures decides between the unguarded plan
    // (common case) and the star-degradation plan (flood case)
    val hasHot = !sigs.groupBy(col("band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket).isEmpty
    if (!hasHot) {
      val a = sigs.select(col("band"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = sigs.select(col("band"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
      return a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          hamming64(col("sh_a"), col("sh_b")).as("hamming"))
        .distinct()
    }
    val shuffled = sigs.repartition(col("band"))
    val hotBands = shuffled.groupBy(col("band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
    val annotated = shuffled.join(broadcast(hotBands), Seq("band"), "left_outer")
    val normal = annotated.filter(col("__n").isNull)
    val a = normal.select(col("band"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = normal.select(col("band"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val pairsN = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).as("hamming"))
    // hot chunks: members sharing the full signature star to the group hub
    // (Hamming 0 by construction), hubs pair at hub granularity
    val hot = annotated.filter(col("__n").isNotNull)
    val sigGroups = hot.groupBy(col("band"), col("sh"))
      .agg(min(col("doc_id")).as("ghub"))
    val pairsG = hot.join(sigGroups, Seq("band", "sh"))
      .filter(col("doc_id") =!= col("ghub"))
      .select(col("ghub").as("id_a"), col("doc_id").as("id_b"),
        hamming64(col("sh"), col("sh")).as("hamming")) // identical sh: 0
    val hubCounts = sigGroups.groupBy(col("band"))
      .agg(count(lit(1)).as("__hn"), min(col("ghub")).as("__minh"))
    val hubs = sigGroups.join(broadcast(
      hubCounts.filter(col("__hn") > maxBucket)), Seq("band"), "left_outer")
    val hubNormal = hubs.filter(col("__hn").isNull)
    val hubPairs = hubNormal
      .select(col("band"), col("ghub").as("id_a"), col("sh").as("sh_a"))
      .join(hubNormal
        .select(col("band"), col("ghub").as("id_b"), col("sh").as("sh_b")),
        Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).as("hamming"))
    val hubHot = hubs.filter(col("__hn").isNotNull)
    val hubStars = hubHot.filter(col("ghub") =!= col("__minh"))
      .select(col("band"), col("ghub").as("id_b"), col("sh").as("sh_b"))
      .join(hubHot.filter(col("ghub") === col("__minh"))
        .select(col("band"), col("ghub").as("id_a"), col("sh").as("sh_a")),
        Seq("band"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).as("hamming"))
    pairsN.unionByName(pairsG).unionByName(hubPairs).unionByName(hubStars)
      .distinct()
  }

  /** The banded signature table for `df` — `(doc_id, sig, band)`, one row
    * per (document, band) — as [[minhashCandidates]] computes internally.
    * Shared by the batch self-join and the incremental probe. */
  private def bandedSignatures(df: DataFrame, id: Column, text: Column,
                               shingleN: Int, numHashes: Int,
                               bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    // same small-input rebalance as minhashCandidates: the shingle+hash
    // stage is CPU-bound and must not pin to one split
    val input = df.select(id.as("doc_id"), text.as("__text"))
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val sizeInBytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    val balanced =
      if (sizeInBytes < BigInt(parallelism) * (64L << 20))
        input.repartition(parallelism)
      else input
    balanced.select(col("doc_id"),
        minhashSignature(TF.word_shingles(col("__text"), shingleN),
          numHashes).as("sig"))
      .withColumn("band", explode(lshBandKeys(col("sig"), bands, r)))
  }

  /** Persist (append) a corpus batch's banded MinHash signatures to
    * `path` — the durable signature store the in-memory LSH shape
    * ([[minhashCandidates]]'s localCheckpoint) points at for 100 TB
    * pipelines: signatures are computed ONCE per document ever (the
    * CPU-bound shingle+hash stage never re-runs over old data), survive
    * executor loss, and each new ingest batch dedups against the whole
    * corpus through [[incrementalMinhashCandidates]] without touching the
    * corpus TEXT again. Layout: plain parquet `(doc_id, sig, band)`
    * appended per batch — ~bands rows of (long + k longs + 36 chars) per
    * document, orders of magnitude smaller than the text it summarizes. */
  def writeSignatureLake(df: DataFrame, id: Column, text: Column,
                         shingleN: Int, numHashes: Int, bands: Int,
                         path: String): Unit =
    bandedSignatures(df, id, text, shingleN, numHashes, bands)
      .write.mode("append").parquet(path)

  /** Candidate near-duplicate pairs of a NEW document batch against a
    * persisted signature lake ([[writeSignatureLake]]) PLUS within the
    * batch itself — incremental corpus dedup: only the new batch is
    * shingled and hashed; the corpus contributes its stored signatures.
    *
    * Pairs are `(id_a, id_b)` with `id_a < id_b` and the same
    * `est_jaccard` (fraction of agreeing signature components) as the
    * batch operator, so on any corpus∪batch the result equals
    * [[minhashCandidates]] over the union RESTRICTED to pairs touching
    * the batch (proven on seeded data in IncrementalDedupSpec).
    *
    * Scale shape: the batch's distinct band keys BROADCAST against the
    * corpus table — the corpus is filtered where it lies (one scan, no
    * shuffle of the lake); only the tiny bucket-mate remainder joins the
    * batch. Hot corpus buckets (over `maxBucket` members — the
    * boilerplate flood this operator meets in the wild) degrade to
    * signature-group hubs: each new doc pairs once per distinct corpus
    * signature in the bucket instead of once per member (est is exact per
    * pair — every member of a signature group shares its hub's
    * signature), mirroring the batch operator's star degradation.
    *
    * Caller contract: batch ids are disjoint from corpus ids; append the
    * batch's own signatures via [[writeSignatureLake]] AFTER probing. */
  def incrementalMinhashCandidates(newDocs: DataFrame, id: Column,
                                   text: Column, shingleN: Int,
                                   numHashes: Int, bands: Int,
                                   sigPath: String,
                                   maxBucket: Int = 4096): DataFrame = {
    val spark = newDocs.sparkSession
    val newSigs = bandedSignatures(newDocs, id, text, shingleN, numHashes,
      bands).localCheckpoint(false)
    val corpus = spark.read.parquet(sigPath)
    // corpus rows in buckets the batch touches: broadcast the batch's
    // band keys — a broadcast hash semi-join, the corpus side stays
    // un-shuffled (at a 100 TB lake this is one pruned scan, not an
    // exchange of the whole signature table)
    val touched = corpus.join(
        broadcast(newSigs.select(col("band")).distinct()), Seq("band"))
      .localCheckpoint(false)
    def est(a: Column, b: Column) = (size(filter(
        zip_with(a, b, (x, y) => x === y), e => e))
      .cast("double") / numHashes).as("est_jaccard")
    def oriented(df: DataFrame): DataFrame = df
      .filter(col("__ia") =!= col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        est(col("__sa"), col("__sb")))
    val hotBands = touched.groupBy(col("band"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
    val annotated = touched.join(broadcast(hotBands), Seq("band"), "left_outer")
    val cold = annotated.filter(col("__n").isNull)
      .select(col("band"), col("doc_id").as("__ia"), col("sig").as("__sa"))
    val probe = newSigs
      .select(col("band"), col("doc_id").as("__ib"), col("sig").as("__sb"))
    val coldPairs = oriented(cold.join(probe, Seq("band")))
    // hot buckets: one pair per (new doc, distinct corpus signature)
    val hubs = annotated.filter(col("__n").isNotNull)
      .groupBy(col("band"), col("sig"))
      .agg(min(col("doc_id")).as("__ia"))
      .select(col("band"), col("__ia"), col("sig").as("__sa"))
    val hotPairs = oriented(hubs.join(probe, Seq("band")))
    // within the batch itself: the batch operator (its own flood guard)
    val newNew = minhashCandidates(newDocs, id, text, shingleN, numHashes,
      bands, maxBucket)
    coldPairs.unionByName(hotPairs).unionByName(newNew).distinct()
  }

  /** Exact n-gram Jaccard similarity between two text columns. Shingle sets
    * and the intersection size are let-bound — each is referenced more than
    * once below, and would otherwise be re-derived per reference. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    F.bind(array_distinct(TF.word_shingles(a, n))) { sa =>
      F.bind(array_distinct(TF.word_shingles(b, n))) { sb =>
        F.bind(size(array_intersect(sa, sb)).cast("double")) { inter =>
          val union = (size(sa) + size(sb)).cast("double") - inter
          when(union > 0, F.qround(inter / union, 6)).otherwise(lit(0.0))
        }
      }
    }

  /** Near-duplicate pairs by embedding cosine within blocking groups.
    * Embeddings are quantized (scale 1000) so the cosine is deterministic.
    * `block` bounds the pair space (e.g. a cluster/label/LSH-bucket column) —
    * at 100 TB you never cross-join unblocked. */
  def embeddingNearDups(df: DataFrame, id: Column, vec: Column, block: Column,
                        threshold: Double): DataFrame = {
    val q = df.select(block.as("blk"), id.as("vid"), F.vec_quantize(vec, 1000).as("qv"))
    val a = q.select(col("blk"), col("vid").as("id_a"), col("qv").as("qv_a"))
    val b = q.select(col("blk"), col("vid").as("id_b"), col("qv").as("qv_b"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", F.vec_cosine_q6(col("qv_a"), col("qv_b")))
      .filter(col("cosine") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), col("cosine"))
  }

  /** EXACT-SUBSTRING deduplication at token granularity — the
    * suffix-array dedup of Lee et al. 2022 ("Deduplicating Training Data
    * Makes Language Models Better", arXiv:2107.06499) re-expressed as a
    * distributed duplicated-n-gram sweep: any run of `n` consecutive
    * whitespace tokens that appears MORE THAN ONCE in the corpus keeps
    * only its first occurrence (smallest `(doc_id, pos)`); every token
    * covered by a NON-first occurrence of a duplicated n-gram is cut,
    * and documents reassemble from their surviving tokens in original
    * order (single-space joined — original whitespace runs are not
    * preserved, the standard token-level trade). Because duplicated
    * windows overlap, a duplicated span of any length ≥ n is removed
    * wholesale from its non-first copies — the fixed window size only
    * sets the MINIMUM match length, exactly the role of the 50-token
    * threshold in the paper's suffix-array formulation.
    *
    * Output: `(doc_id, n_tokens, n_removed, kept_text)`.
    *
    * Scale shape (mirrors [[graft.operators.TrainPrep.paragraphDedup]]):
    * the n-gram occurrence lane is TEXT-FREE — each window is keyed by
    * TWO independent xxhash64 lanes of its space-joined tokens (a
    * single-lane collision never merges distinct text), so the
    * first-occurrence aggregate (a map-side-combined `min(struct)` —
    * never a window sort, so the billion-fold boilerplate gram IS the
    * cheap case) and the occurrence↔first join shuffle only
    * `(doc_id, pos, h1, h2)`. Grams occurring once — the overwhelming
    * bulk of a natural corpus — are dropped before the join
    * (`cnt > 1`), and removal STARTS collapse to one bounded-size
    * per-doc array, so the token-bearing frame crosses exactly ONE
    * exchange: the final doc_id join. Per-token coverage then evaluates
    * as a codegen'd `exists` over that array — no second text shuffle,
    * no interval join. */
  def substringDedup(docs: DataFrame, id: Column, text: Column,
                     n: Int): DataFrame = {
    require(n >= 2, s"substringDedup: window must be >= 2 tokens (got $n)")
    val toks = substrToks(docs, id, text)
    val occ = gramOccurrences(toks, n)
    val dupFirst = occ.groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("h1"), col("h2"),
        col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val removals = occ.join(dupFirst, Seq("h1", "h2"))
      .filter(!(col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
    assembleSurvivors(toks, removals, n)
  }

  /** Tokenized lane shared by the substring-dedup operators. */
  private def substrToks(docs: DataFrame, id: Column,
                         text: Column): DataFrame =
    docs.select(id.as("doc_id"),
      filter(split(text, "\\s+"), t => length(t) > 0).as("ts"))

  /** Text-free n-gram occurrence lane: one `(doc_id, pos, h1, h2)` row
    * per n-token window (dual independent xxhash64 keys). */
  private def gramOccurrences(toks: DataFrame, n: Int): DataFrame = {
    val gram: Column => Column =
      i => concat_ws(" ", slice(col("ts"), i + 1, lit(n)))
    toks
      .select(col("doc_id"),
        posexplode(when(size(col("ts")) >= n,
          transform(sequence(lit(0), size(col("ts")) - n),
            i => struct(xxhash64(gram(i)).as("h1"),
              xxhash64(lit(""), gram(i)).as("h2"))))
          .otherwise(array())).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), col("g.h1"), col("g.h2"))
  }

  /** Collapse removal occurrences to per-doc start arrays, cut covered
    * tokens, reassemble: the one token-bearing exchange. */
  private def assembleSurvivors(toks: DataFrame, removals: DataFrame,
                                n: Int): DataFrame = {
    val starts = removals.groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("starts"))
    toks.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ts"),
        coalesce(col("starts"), array()).as("starts"))
      .withColumn("kept", filter(col("ts"),
        (_, i) => !exists(col("starts"), s => s <= i && i < s + n)))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        (size(col("ts")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("kept_text"))
  }

  /** Persist a batch's DISTINCT n-gram keys `(h1, h2)` — the gram lake
    * [[incrementalSubstringDedup]] probes so a new ingest batch dedups
    * against the WHOLE corpus without ever re-reading corpus text: 16
    * bytes per distinct gram, appended per batch (duplicate keys across
    * appends are harmless — probes are membership joins). Append the
    * batch's grams AFTER probing (caller contract, as the signature
    * lake's). */
  def writeGramLake(df: DataFrame, id: Column, text: Column, n: Int,
                    path: String): Unit =
    gramOccurrences(substrToks(df, id, text), n)
      .select(col("h1"), col("h2")).distinct()
      .write.mode("append").parquet(path)

  /** INCREMENTAL [[substringDedup]]: dedup a NEW document batch against
    * a persisted gram lake ([[writeGramLake]]) plus within the batch
    * itself. Any batch window whose gram exists in the lake is a
    * non-first occurrence by construction (the lake predates the batch —
    * caller keeps batch doc ids above corpus ids, the signature-lake
    * contract), so its tokens cut; batch-internal duplicates follow the
    * batch operator's first-occurrence rule. On corpus∪batch with
    * corpus-lower ids the output equals [[substringDedup]] over the
    * union RESTRICTED to batch documents (q164 pins this equivalence
    * against the union oracle; IncrementalDedupSpec on seeded splits).
    *
    * Scale shape: only the BATCH is tokenized and hashed; the corpus
    * contributes membership through one broadcast-semi-joined pruned
    * scan of the 16-byte-per-gram lake (the lake is never shuffled,
    * never exchanged), and everything downstream runs on batch-sized
    * frames. */
  def incrementalSubstringDedup(newDocs: DataFrame, id: Column,
                                text: Column, n: Int,
                                gramPath: String): DataFrame = {
    require(n >= 2, s"substringDedup: window must be >= 2 tokens (got $n)")
    val spark = newDocs.sparkSession
    val toks = substrToks(newDocs, id, text)
    val occ = gramOccurrences(toks, n).localCheckpoint(false)
    // corpus hits: the lake filtered where it lies by the batch's
    // broadcast key set — one pruned scan, no exchange of the lake
    val touched = spark.read.parquet(gramPath)
      .join(broadcast(occ.select(col("h1"), col("h2")).distinct()),
        Seq("h1", "h2"))
      .select(col("h1"), col("h2")).distinct()
    val lakeRemovals = occ.join(touched, Seq("h1", "h2"))
      .select(col("doc_id"), col("pos"))
    // batch-internal duplicates: the batch operator's rule
    val dupFirst = occ.groupBy(col("h1"), col("h2"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .select(col("h1"), col("h2"),
        col("f.doc_id").as("f_doc"), col("f.pos").as("f_pos"))
    val newNewRemovals = occ.join(dupFirst, Seq("h1", "h2"))
      .filter(!(col("doc_id") === col("f_doc") && col("pos") === col("f_pos")))
      .select(col("doc_id"), col("pos"))
    assembleSurvivors(toks,
      lakeRemovals.unionByName(newNewRemovals).distinct(), n)
  }

  /** SEMANTIC deduplication — SemDeDup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): cluster the corpus' embeddings with k-means, then
    * compare pairs ONLY within a cluster and drop all but one of every
    * semantically-near group. Catches the paraphrase/boilerplate-variant
    * duplicates that lexical MinHash/SimHash can't see, at k-means cost
    * instead of all-pairs.
    *
    * This engine's composition: cells come from the SAME deterministic
    * Lloyd pipeline every IVF entry point uses
    * ([[Similarity.ivfCentroids]] — quantized integer dots, q6 rounding,
    * ties to the lowest cell id, so the ANSI-SQL oracle replays it, q166);
    * within a cell, every `id_a < id_b` pair with q6 cosine >= `threshold`
    * marks `id_b` a duplicate. KEEP POLICY: a row survives unless an
    * EARLIER id in its cell is within the threshold — deterministic
    * min-id representative (the paper keeps the row farthest from the
    * centroid and notes random choice performs identically; min-id is
    * that same arbitrary-pick, made reproducible).
    *
    * Scale shape: assignment is a broadcast-centroid projection (the
    * corpus never shuffles to cluster); the pair stage is one self-join
    * ON the cell key, Σ|cell|² work — the paper's own cost model, bounded
    * by cell balance, which extra `lloydIters` tighten (measured in
    * IvfSpec: max/mean 1.216 → 1.136 at 1 → 3 iters). `nlist` (seed
    * count) sets the knob: at 100 TB you size nlist so corpus/nlist² stays
    * flat per cell, exactly as SemDeDup runs k=50k clusters over LAION.
    *
    * Output: one row per input — (vid, cell, keep). */
  def semanticDedup(corpus: DataFrame, id: Column, vec: Column,
                    seeds: DataFrame, seedId: Column, seedVec: Column,
                    threshold: Double, lloydIters: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(id.as("vid"), F.vec_quantize(vec, 1000).as("qv"))
    val cents = Similarity.ivfCentroids(
      c.select(col("vid").as("neighbor_id"), col("qv").as("cv")),
      seeds, seedId, seedVec, lloydIters)
    val assigned = c.withColumn("cell",
      Similarity.assignCell(spark, cents)(col("qv")))
    val dropped = assigned.alias("a")
      .join(assigned.alias("b"), col("a.cell") === col("b.cell") &&
        col("a.vid") < col("b.vid"))
      .filter(F.vec_cosine_q6(col("a.qv"), col("b.qv")) >= threshold)
      .select(col("b.vid").as("vid")).distinct()
      .withColumn("dup", lit(true))
    assigned.join(dropped, Seq("vid"), "left")
      .select(col("vid"), col("cell"),
        coalesce(!col("dup"), lit(true)).as("keep"))
  }

  /** INCREMENTAL semantic dedup against a persisted IVF index
    * ([[Similarity.writeIvfIndex]]) — the arriving-batch shape: new
    * vectors assign to the STORED centroids (broadcast projection, the
    * corpus never re-clusters), and each new vector is compared against
    * (a) the indexed corpus rows of ITS OWN CELL — read via partition
    * pruning on the batch's cells, the same nprobe-style pruned read
    * every indexed ANN query does — and (b) earlier-id batch rows in the
    * same cell. A new row is dropped when anything indexed is within
    * `threshold` (the index always wins: its rows are the kept
    * representatives) or an earlier batch id is. Batch cost follows the
    * batch (|batch| × cell size + batch-internal pairs), never the
    * corpus — the [[incrementalMinhashCandidates]] contract, semantic
    * edition. Output: (vid, cell, keep) for BATCH rows only. */
  def incrementalSemanticDedup(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String,
                               batch: DataFrame, id: Column, vec: Column,
                               threshold: Double): DataFrame = {
    val cents = Similarity.readCentroids(spark, indexPath)
    val b = batch.select(id.as("vid"), F.vec_quantize(vec, 1000).as("qv"))
      .withColumn("cell", Similarity.assignCell(spark, cents)(col("qv")))
      .localCheckpoint(false)
    val cells = b.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val indexed = Similarity.readAssign(spark, indexPath)
      .filter(col("cell").isin(cells.map(Int.box).toSeq: _*))
    val vsIndex = indexed.join(broadcast(b), Seq("cell"))
      .filter(F.vec_cosine_q6(col("cv"), col("qv")) >= threshold)
      .select(col("vid")).distinct()
    val vsBatch = b.alias("a")
      .join(b.alias("x"), col("a.cell") === col("x.cell") &&
        col("a.vid") < col("x.vid"))
      .filter(F.vec_cosine_q6(col("a.qv"), col("x.qv")) >= threshold)
      .select(col("x.vid").as("vid")).distinct()
    val dropped = vsIndex.unionByName(vsBatch).distinct()
      .withColumn("dup", lit(true))
    b.join(dropped, Seq("vid"), "left")
      .select(col("vid"), col("cell"),
        coalesce(!col("dup"), lit(true)).as("keep"))
  }
}
