package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dsir, IndexSnapshots, Retrieval}

/** Lexical + hybrid retrieval and importance-resampling queries, with
  * DuckDB oracles replaying every stage (BM25 formula, rank fusion,
  * hashed-n-gram importance weights) under the repo-wide exact-micros
  * contract. */
object QueriesRetrieval {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---- DuckDB fragments mirroring graft.functions (QueriesML twins) ----
  private def dkToks(text: String): String =
    s"list_filter(string_split_regex(lower($text), '[^a-z0-9]+'), x -> len(x) > 0)"
  private def dkHash60(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 15)) AS BIGINT)"
  private def dkQuant(e: String): String =
    s"list_transform($e, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
  private def dkDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, 65), i -> ($a)[i] * ($b)[i]))"
  private def dkQround(e: String, decimals: Int): String = {
    val s = "1" + "0" * decimals
    s"CAST(floor(($e) * $s.0 + 0.5) AS DOUBLE) / $s.0"
  }
  private def dkCos(a: String, b: String): String = {
    val n = s"sqrt(CAST(${dkDot(a, a)} AS DOUBLE) * CAST(${dkDot(b, b)} AS DOUBLE))"
    s"CASE WHEN $n > 0 THEN ${dkQround(s"CAST(${dkDot(a, b)} AS DOUBLE) / $n", 6)} ELSE 0.0 END"
  }
  private def dkL2(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), " +
      s"i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i]))) AS BIGINT)"

  /** The fixed query-term set the BM25 gate lanes use: one rare term
    * (high idf), two common ones. */
  private val QTerms = Seq("dup", "vector", "spark")

  /** BM25 per-term micros for DuckDB, spelled in the EXACT association
    * order [[Retrieval.termMicros]] uses:
    * `floor(idf6 · ((tf·(k1+1)) / (tf + k1·((1−b) + b·dl·N/TT))) · 10⁶ + 0.5)`
    * with `idf6 = idf-micros / 10⁶` — the integer
    * `lnm(2N+2) − lnm(2df+1)` of [[Retrieval.Bm25Stats.idfMicros]],
    * carried in by the caller's `$idfCol` column (computed by the
    * self-contained recursive integer-log CTE, never DuckDB's `ln`).
    * `n`/`tt` are scalar columns from the stats CTE. */
  private def dkBm25Term(term: String, idfCol: String,
                         p: Retrieval.Bm25Params): String = {
    val idf = s"(CAST($idfCol AS DOUBLE) / 1000000.0)"
    val tf = s"CAST(len(list_filter(ts, x -> x = '$term')) AS DOUBLE)"
    val norm = s"(${1.0 - p.b} + ${p.b} * CAST(len(ts) AS DOUBLE) * " +
      s"CAST(n AS DOUBLE) / CAST(tt AS DOUBLE))"
    s"CASE WHEN $tf > 0 THEN CAST(floor($idf * ($tf * ${p.k1 + 1.0} / " +
      s"($tf + ${p.k1} * $norm)) * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END"
  }

  /** Per-term integer idf-micros CTE block over a stats CTE `s(n, ...)`
    * and a df CTE `f(df0, df1, ...)` (BIGINT dfs): one recursive
    * integer-log instance covering `{2n+2} ∪ {2·dfᵢ+1}`, then
    * `idfm(idf0, idf1, ...)` with `idfᵢ = lnm(2n+2) − lnm(2·dfᵢ+1)` —
    * [[Retrieval.Bm25Stats.idfMicros]] replayed by the engine itself.
    * Enclosing query must open `WITH RECURSIVE`. */
  private def dkIdfm(nTerms: Int): String = {
    val srcUnion = (s"SELECT 2 * n + 2 AS v FROM s" +:
      (0 until nTerms).map(i => s"SELECT 2 * df$i + 1 FROM f")).mkString(" UNION ")
    val idfCols = (0 until nTerms).map(i =>
      s"((SELECT m FROM bmlnm WHERE v = 2 * s.n + 2) - " +
        s"(SELECT m FROM bmlnm WHERE v = 2 * f.df$i + 1)) AS idf$i").mkString(", ")
    s"""
      bm_src AS ($srcUnion),
      ${OracleLnFix.ctes("bm_src", "bmlnm")},
      idfm AS (SELECT $idfCols FROM s, f)"""
  }

  /** Shared CTE block: tokenized docs, corpus stats, per-term dfs,
    * integer idf-micros ([[dkIdfm]]), and per-doc BM25 micros for
    * [[QTerms]]. Ends at `scored(doc_id, score_micros)` (matching docs
    * only). `where` restricts the corpus (the q194 pinned-generation
    * lane). Enclosing query must open `WITH RECURSIVE`. */
  private def dkBm25Chain(p: Retrieval.Bm25Params,
                          where: String = ""): String = {
    val dfAggs = QTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(ts, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(", ")
    val termSum = QTerms.zipWithIndex
      .map { case (t, i) => dkBm25Term(t, s"idf$i", p) }
      .mkString(" + ")
    s"""
      d AS (SELECT doc_id, ${dkToks("text")} AS ts FROM documents $where),
      s AS (SELECT count(*) AS n, coalesce(sum(len(ts)), 0) AS tt FROM d),
      f AS (SELECT $dfAggs FROM d),
      ${dkIdfm(QTerms.size)},
      scored AS (SELECT doc_id, $termSum AS score_micros
                 FROM d, s, f, idfm)"""
  }

  /** Hashed uni+bigram feature CTE block for DSIR (B = `b` buckets):
    * `feats(doc_id, bucket)` one row per feature occurrence — mirrors
    * [[Dsir.featureBuckets]] (unigrams then adjacent bigrams joined by a
    * single space, 60-bit md5-prefix hash mod B). */
  private def dkDsirFeats(b: Int): String = s"""
      d AS (SELECT doc_id, ${dkToks("text")} AS ts FROM documents),
      feats AS (SELECT doc_id, unnest(list_concat(
                  list_transform(ts, t -> ${dkHash60("t")} % $b),
                  CASE WHEN len(ts) >= 2 THEN
                    list_transform(range(0, len(ts) - 1),
                      i -> ${dkHash60("ts[i+1] || ' ' || ts[i+2]")} % $b)
                  ELSE CAST([] AS BIGINT[]) END)) AS bucket
                FROM d)"""

  /** Per-bucket add-one-smoothed log-ratio micros for DSIR, target =
    * `source = 'src18'`, raw = all documents — spelled exactly as
    * [[Dsir.logRatioMicros]]'s four-integer-log decomposition:
    * `lam = lnm(ct+1) − lnm(Tt) − lnm(cr+1) + lnm(Tr)` with
    * `Tt/Tr = Σcounts + B` and `lnm` the self-contained recursive
    * integer-log CTE (no libm, no overflow at any corpus size). Ends at
    * `lam(bucket, lam)` and `wt(doc_id, n_features, weight_micros)` over
    * ALL docs. Enclosing query must open `WITH RECURSIVE`. */
  private def dkDsirChain(b: Int): String = s"""
      ${dkDsirFeats(b)},
      tgt AS (SELECT bucket, count(*) AS c FROM feats f
              JOIN documents USING (doc_id) WHERE source = 'src18'
              GROUP BY 1),
      raw AS (SELECT bucket, count(*) AS c FROM feats GROUP BY 1),
      dsir_src AS (SELECT c + 1 AS v FROM tgt
                   UNION SELECT c + 1 FROM raw
                   UNION SELECT CAST(1 AS BIGINT)
                   UNION SELECT CAST(coalesce(sum(c), 0) + $b AS BIGINT) FROM tgt
                   UNION SELECT CAST(coalesce(sum(c), 0) + $b AS BIGINT) FROM raw),
      ${OracleLnFix.ctes("dsir_src", "dlnm")},
      lam AS (SELECT g.i AS bucket,
                  (SELECT m FROM dlnm WHERE v = coalesce(t.c, 0) + 1)
                - (SELECT m FROM dlnm WHERE v =
                     (SELECT CAST(coalesce(sum(c), 0) + $b AS BIGINT) FROM tgt))
                - (SELECT m FROM dlnm WHERE v = coalesce(r.c, 0) + 1)
                + (SELECT m FROM dlnm WHERE v =
                     (SELECT CAST(coalesce(sum(c), 0) + $b AS BIGINT) FROM raw))
                  AS lam
              FROM range(0, $b) g(i)
              LEFT JOIN tgt t ON t.bucket = g.i
              LEFT JOIN raw r ON r.bucket = g.i),
      wt AS (SELECT d.doc_id,
               CAST(coalesce(a.nf, 0) AS BIGINT) AS n_features,
               CAST(coalesce(a.w, 0) AS BIGINT) AS weight_micros
             FROM d LEFT JOIN (
               SELECT f.doc_id, count(*) AS nf, sum(l.lam) AS w
               FROM feats f JOIN lam l USING (bucket) GROUP BY 1) a
             USING (doc_id))"""

  private val P = Retrieval.Bm25Params()

  /** Best-snippet-window CTE block over a `(doc_id, ts)` relation `src`:
    * every start `ws`, distinct-hit and total-hit counts for the w-token
    * window, and the per-doc argmax (`brn = 1`) under the kernel's exact
    * order (distinct desc, total desc, earliest start) — mirrors
    * [[graft.functions.Kernels.bestWindow]]. */
  private def dkBestWindow(src: String, w: Int): String = {
    val dh = QTerms.map(t =>
      s"CASE WHEN list_contains(ts[ws+1:ws+$w], '$t') THEN 1 ELSE 0 END")
      .mkString(" + ")
    val inList = QTerms.map(t => s"x = '$t'").mkString(" OR ")
    s"""
      wins AS (SELECT doc_id, ts,
                unnest(range(0, greatest(len(ts) - $w, 0) + 1)) AS ws
               FROM $src),
      wsc AS (SELECT doc_id, ts, ws, ($dh) AS dh,
               len(list_filter(ts[ws+1:ws+$w], x -> $inList)) AS th
              FROM wins),
      best AS (SELECT doc_id, ts, ws, dh, th, row_number() OVER (
                 PARTITION BY doc_id ORDER BY dh DESC, th DESC, ws) AS brn
               FROM wsc)"""
  }

  /** Shared MLT CTE block (source doc 42, minTermFreq = 2, minDocFreq =
    * 1): source-doc tf, corpus df per candidate (`list_contains` join —
    * the relational spelling of the index's postings presence), integer
    * idf-micros `lnm(2n+2) − lnm(2df+1)` from the self-contained
    * recursive integer-log CTE (the engine computes its own idfs — no
    * deposited table, no `ln`; the r11/r12 hash-red class), selection
    * score = exact integer tf·m. Ends at `sel(term, tf, df, m,
    * sel_micros)` over ALL candidates plus the corpus stats `s(n, tt)`
    * and token lane `d`. Enclosing query must open `WITH RECURSIVE`. */
  private def dkMltChain: String = s"""
      src AS (SELECT ${dkToks("text")} AS ts FROM documents
              WHERE doc_id = 42),
      d AS (SELECT doc_id, ${dkToks("text")} AS ts FROM documents),
      cand AS (SELECT term, count(*) AS tf
               FROM (SELECT unnest(ts) AS term FROM src)
               GROUP BY 1 HAVING count(*) >= 2),
      s AS (SELECT count(*) AS n, coalesce(sum(len(ts)), 0) AS tt FROM d),
      dfq AS (SELECT c.term, c.tf, count(*) AS df
              FROM cand c JOIN d ON list_contains(d.ts, c.term)
              GROUP BY 1, 2),
      mlt_src AS (SELECT 2 * df + 1 AS v FROM (SELECT DISTINCT df FROM dfq)
                  UNION SELECT 2 * n + 2 FROM s),
      ${OracleLnFix.ctes("mlt_src", "mltlnm")},
      idf AS (SELECT df AS df_v,
                (SELECT m FROM mltlnm WHERE v = 2 * s.n + 2) -
                (SELECT m FROM mltlnm WHERE v = 2 * u.df + 1) AS m
              FROM (SELECT DISTINCT df FROM dfq) u, s),
      sel AS (SELECT q.term, q.tf, q.df, i.m, q.tf * i.m AS sel_micros
              FROM dfq q JOIN idf i ON q.df = i.df_v)"""

  val all: Vector[QueryDef] = Vector(

    // -- BM25 (Robertson TREC-3; Lucene k1=1.2 b=0.75 variant with the
    //    always-positive idf): every matching doc's score as integer
    //    micros. Spark side: ONE tiny stats aggregate + ONE zero-shuffle
    //    projection; the oracle replays idf→tf-fraction→micros in the
    //    identical association order.
    QueryDef("q173_bm25_scores", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)}
      SELECT doc_id, CAST(score_micros AS BIGINT) AS score_micros
      FROM scored WHERE score_micros > 0 ORDER BY doc_id"""),
      (s, dir) =>
        Retrieval.bm25Scores(T(s, dir, "documents"), col("doc_id"),
            col("text"), QTerms)
          .orderBy(col("doc_id"))),

    // -- Persisted inverted index: postings (term, doc_id, tf, dl)
    //    hash-bucketed BY TERM (partition-pruned probe reads ≤|terms|
    //    buckets), df derived from the pruned postings. The oracle
    //    replays the same scores from the RAW corpus — green proves
    //    index build + pruned probe ≡ full scan. Top-10, score desc /
    //    doc_id asc (TakeOrdered both engines).
    QueryDef("q174_bm25_index_topk", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)}
      SELECT doc_id, CAST(score_micros AS BIGINT) AS score_micros
      FROM scored WHERE score_micros > 0
      ORDER BY score_micros DESC, doc_id LIMIT 10"""),
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft-bm25").toString + "/idx"
        Retrieval.writeBm25Index(T(s, dir, "documents"), col("doc_id"),
          col("text"), path, nBuckets = 16)
        Retrieval.searchBm25Index(s, path, QTerms, 10)
      }),

    // -- INCREMENTAL index: build on doc_id < 250, append the rest, then
    //    probe — must equal the full-corpus oracle (same SQL as q174).
    //    Pins that appendBm25Index keeps df/stats consistent: df comes
    //    from the postings themselves, the sidecar advances atomically.
    QueryDef("q178_bm25_index_append", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)}
      SELECT doc_id, CAST(score_micros AS BIGINT) AS score_micros
      FROM scored WHERE score_micros > 0
      ORDER BY score_micros DESC, doc_id LIMIT 10"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft-bm25-inc").toString + "/idx"
        Retrieval.writeBm25Index(docs.filter(col("doc_id") < 250),
          col("doc_id"), col("text"), path, nBuckets = 16)
        Retrieval.appendBm25Index(docs.filter(col("doc_id") >= 250),
          col("doc_id"), col("text"), path)
        // the maintenance path rides the gate too: compaction + vacuum
        // must leave the rankings byte-identical (pointer-swap layout)
        Retrieval.compactBm25Index(s, path)
        Retrieval.vacuumBm25Index(s, path)
        Retrieval.searchBm25Index(s, path, QTerms, 10)
      }),

    // -- INDEX GENERATION RESTORE, BM25 lane (r12): pin the even-doc
    //    index generation, append the odd docs, compact (new version +
    //    pointer swap), then RESTORE the pin — the probe must answer for
    //    the pinned corpus exactly (stats sidecar included: n/tt/idf all
    //    roll back). The oracle replays the scores from the raw EVEN
    //    half only; a leaked odd posting, a stale stats sidecar, or a
    //    restore that missed the pointer all change the hash.
    QueryDef("q194_bm25_gen_restore", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P, "WHERE doc_id % 2 = 0")}
      SELECT doc_id, CAST(score_micros AS BIGINT) AS score_micros
      FROM scored WHERE score_micros > 0
      ORDER BY score_micros DESC, doc_id LIMIT 15"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft-bm25-gen").toString + "/idx"
        Retrieval.writeBm25Index(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), path, nBuckets = 16)
        IndexSnapshots.snapshot(s, path, "pin")
        Retrieval.appendBm25Index(docs.filter(col("doc_id") % 2 =!= 0),
          col("doc_id"), col("text"), path)
        Retrieval.compactBm25Index(s, path)
        IndexSnapshots.restore(s, path, "pin")
        Retrieval.searchBm25Index(s, path, QTerms, 15)
      }),

    // -- HYBRID search (RRF, Cormack 2009): BM25 top-50 pool fused with
    //    the dense cosine top-50 pool (query vector = embedding 7); rank
    //    points are EXACT integers round(10⁶/(60+rank)) via the
    //    (2a+b) div 2b identity, fused score = integer sum. The oracle
    //    replays both rankings and the fusion bit-for-bit.
    QueryDef("q175_hybrid_rrf", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)},
      lex AS (SELECT doc_id, row_number() OVER (
                ORDER BY score_micros DESC, doc_id) AS r
              FROM (SELECT * FROM scored WHERE score_micros > 0
                    ORDER BY score_micros DESC, doc_id LIMIT 50)),
      qv AS (SELECT ${dkQuant("embedding")} AS q FROM embeddings
             WHERE vec_id = 7),
      dns AS (SELECT vec_id AS doc_id, row_number() OVER (
                ORDER BY cos DESC, vec_id) AS r
              FROM (SELECT vec_id, ${dkCos(dkQuant("embedding"), "q")} AS cos
                    FROM embeddings, qv
                    ORDER BY cos DESC, vec_id LIMIT 50)),
      fused AS (SELECT coalesce(l.doc_id, n.doc_id) AS doc_id,
                  coalesce((2000000 + 60 + l.r) // (2 * (60 + l.r)), 0) +
                  coalesce((2000000 + 60 + n.r) // (2 * (60 + n.r)), 0)
                    AS rrf_micros,
                  l.r AS bm25_rank, n.r AS ann_rank
                FROM lex l FULL OUTER JOIN dns n ON l.doc_id = n.doc_id)
      SELECT doc_id, CAST(rrf_micros AS BIGINT) AS rrf_micros,
             CAST(bm25_rank AS BIGINT) AS bm25_rank,
             CAST(ann_rank AS BIGINT) AS ann_rank
      FROM fused ORDER BY rrf_micros DESC, doc_id LIMIT 20"""),
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val qv = emb.filter(col("vec_id") === 7)
          .select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        Retrieval.hybridTopK(T(s, dir, "documents"), col("doc_id"),
          col("text"), emb, col("vec_id"), col("embedding"),
          QTerms, qv, k = 20, poolK = 50)
      }),

    // -- HYBRID search FROM THE PERSISTED INDEXES (r12): the lexical pool
    //    from the bucket-pruned BM25 probe, the dense pool from the
    //    2-cell IVF probe (query = embedding 7), fused with the same
    //    exact-integer RRF as q175 — one query touches only index dirs,
    //    never either corpus (plan-asserted in RetrievalSpec). The oracle
    //    replays BOTH pruned pools and the fusion; a full-corpus dense
    //    pool (the q175 answer) hash-mismatches, proving the probe lane.
    QueryDef("q198_hybrid_index", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)},
      ${graft.QueriesML.dkIvfCells(8)},
      lex AS (SELECT doc_id, row_number() OVER (
                ORDER BY score_micros DESC, doc_id) AS r
              FROM (SELECT * FROM scored WHERE score_micros > 0
                    ORDER BY score_micros DESC, doc_id LIMIT 50)),
      cell2 AS (SELECT vec_id AS neighbor_id, qv AS cv, cell FROM r2 WHERE rn = 1),
      qv0 AS (SELECT qv AS xv FROM q WHERE vec_id = 7),
      qa AS (SELECT cent.cell, ${dkCos("xv", "cent.cq")} AS cos FROM qv0, cent),
      qr AS (SELECT cell, row_number() OVER (ORDER BY cos DESC, cell) AS rn FROM qa),
      probed AS (SELECT cell FROM qr WHERE rn <= 2),
      dns AS (SELECT doc_id, row_number() OVER (
                ORDER BY cos DESC, doc_id) AS r
              FROM (SELECT neighbor_id AS doc_id, ${dkCos("cv", "xv")} AS cos
                    FROM cell2 JOIN probed USING (cell) CROSS JOIN qv0
                    ORDER BY cos DESC, doc_id LIMIT 50)),
      fused AS (SELECT coalesce(l.doc_id, n.doc_id) AS doc_id,
                  coalesce((2000000 + 60 + l.r) // (2 * (60 + l.r)), 0) +
                  coalesce((2000000 + 60 + n.r) // (2 * (60 + n.r)), 0)
                    AS rrf_micros,
                  l.r AS bm25_rank, n.r AS ann_rank
                FROM lex l FULL OUTER JOIN dns n ON l.doc_id = n.doc_id)
      SELECT doc_id, CAST(rrf_micros AS BIGINT) AS rrf_micros,
             CAST(bm25_rank AS BIGINT) AS bm25_rank,
             CAST(ann_rank AS BIGINT) AS ann_rank
      FROM fused ORDER BY rrf_micros DESC, doc_id LIMIT 20"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val emb = T(s, dir, "embeddings")
        val base = java.nio.file.Files
          .createTempDirectory("graft-q198-hyb").toString
        val bm25 = base + "/bm25"; val ivf = base + "/ivf"
        Retrieval.writeBm25Index(docs, col("doc_id"), col("text"),
          bm25, nBuckets = 16)
        graft.operators.Similarity.writeIvfIndex(emb, col("vec_id"),
          col("embedding"), emb.filter(col("vec_id") < 8),
          col("vec_id"), col("embedding"), ivf)
        val qv = emb.filter(col("vec_id") === 7)
          .select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        Retrieval.hybridIndexTopK(s, bm25, ivf, QTerms, qv,
          k = 20, poolK = 50, nprobe = 2)
      }),

    // -- HYBRID SEARCH over an IVF,SQ8 dense index (r13): the lexical
    //    pool from the bucket-pruned BM25 probe, the DENSE pool from the
    //    codes-only SQ8 probe (decode against trained bounds, rank by
    //    integer ADC l2 ASC — distance metrics rank ascending), fused
    //    with the same exact-integer RRF. The oracle replays encode →
    //    decode → 2-cell probe → ADC ranking → fusion; a cosine-scored
    //    pool, a raw-vector pool, or a descending ADC rank all
    //    hash-mismatch — proving the metric dispatch.
    QueryDef("q212_hybrid_sq8", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)},
      t AS (SELECT vec_id, ${dkQuant("embedding")} AS v FROM embeddings),
      cent AS (SELECT CAST(vec_id AS INTEGER) AS cell, v AS cq
               FROM t WHERE vec_id < 8),
      ca AS (SELECT neighbor_id, v, cell,
                    row_number() OVER (PARTITION BY neighbor_id
                      ORDER BY d, cell) AS arn
             FROM (SELECT t.vec_id AS neighbor_id, t.v, cent.cell,
                          ${dkL2("t.v", "cent.cq")} AS d
                   FROM t, cent)),
      cc AS (SELECT neighbor_id, v, cell FROM ca WHERE arn = 1),
      mm AS (SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
             FROM t, range(1, 65) r(i) GROUP BY i),
      ma AS (SELECT list(mn ORDER BY i) AS mn, list(mx ORDER BY i) AS mx
             FROM mm),
      enc AS (SELECT neighbor_id, cell,
               list_transform(range(1, 65), i -> CASE WHEN mx[i] = mn[i]
                 THEN 0 ELSE (2*255*(LEAST(mx[i], GREATEST(mn[i], v[i]))
                   - mn[i]) + (mx[i]-mn[i])) // (2*(mx[i]-mn[i])) END)
                 AS codes
              FROM cc, ma),
      rec AS (SELECT neighbor_id, cell,
               list_transform(range(1, 65), i -> CASE WHEN mx[i] = mn[i]
                 THEN mn[i] ELSE mn[i] + (2*codes[i]*(mx[i]-mn[i]) + 255)
                   // 510 END) AS rv
              FROM enc, ma),
      lex AS (SELECT doc_id, row_number() OVER (
                ORDER BY score_micros DESC, doc_id) AS r
              FROM (SELECT * FROM scored WHERE score_micros > 0
                    ORDER BY score_micros DESC, doc_id LIMIT 50)),
      qv0 AS (SELECT v AS xv FROM t WHERE vec_id = 7),
      qa AS (SELECT cent.cell, ${dkL2("xv", "cent.cq")} AS d FROM qv0, cent),
      qr AS (SELECT cell, row_number() OVER (ORDER BY d ASC, cell) AS rn FROM qa),
      probed AS (SELECT cell FROM qr WHERE rn <= 2),
      dns AS (SELECT doc_id, row_number() OVER (
                ORDER BY adc ASC, doc_id) AS r
              FROM (SELECT neighbor_id AS doc_id,
                      CAST(list_sum(list_transform(range(1, 65),
                        i -> (rv[i]-xv[i])*(rv[i]-xv[i]))) AS BIGINT) AS adc
                    FROM rec JOIN probed USING (cell) CROSS JOIN qv0
                    ORDER BY adc ASC, doc_id LIMIT 50)),
      fused AS (SELECT coalesce(l.doc_id, n.doc_id) AS doc_id,
                  coalesce((2000000 + 60 + l.r) // (2 * (60 + l.r)), 0) +
                  coalesce((2000000 + 60 + n.r) // (2 * (60 + n.r)), 0)
                    AS rrf_micros,
                  l.r AS bm25_rank, n.r AS ann_rank
                FROM lex l FULL OUTER JOIN dns n ON l.doc_id = n.doc_id)
      SELECT doc_id, CAST(rrf_micros AS BIGINT) AS rrf_micros,
             CAST(bm25_rank AS BIGINT) AS bm25_rank,
             CAST(ann_rank AS BIGINT) AS ann_rank
      FROM fused ORDER BY rrf_micros DESC, doc_id LIMIT 20"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val emb = T(s, dir, "embeddings")
        val base = java.nio.file.Files
          .createTempDirectory("graft-q212-hyb").toString
        val bm25 = base + "/bm25"; val ivf = base + "/ivfsq8"
        Retrieval.writeBm25Index(docs, col("doc_id"), col("text"),
          bm25, nBuckets = 16)
        graft.operators.Similarity.writeIvfIndexSq8(emb, col("vec_id"),
          col("embedding"), emb.filter(col("vec_id") < 8),
          col("vec_id"), col("embedding"), ivf)
        val qv = emb.filter(col("vec_id") === 7)
          .select(col("embedding")).head()
          .getSeq[Float](0).map(_.toDouble)
        Retrieval.hybridIndexTopK(s, bm25, ivf, QTerms, qv,
          k = 20, poolK = 50, nprobe = 2)
      }),

    // -- PHRASE query over the positional index (Lucene PhraseQuery,
    //    slop 0): exact token-sequence match via per-term position lists
    //    (p in pos(t0), p+1 in pos(t1)), scored as one BM25 term whose tf
    //    is the phrase frequency and df the phrase-matching doc count.
    //    The oracle recomputes matches positionally from the RAW text and
    //    replays the scoring — a missed adjacency, an off-by-one in the
    //    position walk, or stale index stats all hash-mismatch.
    QueryDef("q180_phrase_search", Some(s"""
      WITH RECURSIVE d AS (SELECT doc_id, ${dkToks("text")} AS ts FROM documents),
      h AS (SELECT doc_id, len(ts) AS dl,
              len(list_filter(range(1, greatest(len(ts) - 1, 0) + 1),
                i -> ts[i] = 'table' AND ts[i+1] = 'scan')) AS n
            FROM d),
      m AS (SELECT * FROM h WHERE n > 0),
      s AS (SELECT count(*) AS nd, coalesce(sum(len(ts)), 0) AS tt FROM d),
      f AS (SELECT count(*) AS dfp FROM m),
      p_src AS (SELECT 2 * nd + 2 AS v FROM s UNION SELECT 2 * dfp + 1 FROM f),
      ${OracleLnFix.ctes("p_src", "plnm")}
      SELECT doc_id, CAST(n AS BIGINT) AS n_matches,
             CAST(floor(
               (CAST((SELECT m FROM plnm WHERE v = 2 * nd + 2) -
                     (SELECT m FROM plnm WHERE v = 2 * dfp + 1)
                 AS DOUBLE) / 1000000.0)
               * (CAST(n AS DOUBLE) * ${P.k1 + 1.0} /
                  (CAST(n AS DOUBLE) + ${P.k1} *
                   (${1.0 - P.b} + ${P.b} * CAST(dl AS DOUBLE) *
                    CAST(nd AS DOUBLE) / CAST(tt AS DOUBLE))))
               * 1000000.0 + 0.5) AS BIGINT) AS score_micros
      FROM m, s, f
      ORDER BY score_micros DESC, doc_id LIMIT 15"""),
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft-bm25-phrase").toString + "/idx"
        Retrieval.writeBm25Index(T(s, dir, "documents"), col("doc_id"),
          col("text"), path, nBuckets = 16)
        Retrieval.searchPhraseIndex(s, path, Seq("table", "scan"), 15)
      }),

    // -- BOOLEAN query (Lucene BooleanQuery): +spark -slow with should
    //    terms vector/dup — MUST gates and scores, SHOULD only scores,
    //    MUST_NOT only gates; score = BM25 micros summed over the
    //    scoring terms the doc contains. One bucket-pruned postings scan
    //    + one per-doc aggregate. The oracle replays gating via
    //    list_contains and the scoring per term — a doc leaking past
    //    -slow, a must-gate miss, or a wrong df all hash-mismatch.
    QueryDef("q181_boolean_search", Some(s"""
      WITH RECURSIVE d AS (SELECT doc_id, ${dkToks("text")} AS ts FROM documents),
      s AS (SELECT count(*) AS n, coalesce(sum(len(ts)), 0) AS tt FROM d),
      f AS (SELECT
              CAST(sum(CASE WHEN list_contains(ts, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
              CAST(sum(CASE WHEN list_contains(ts, 'vector') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
              CAST(sum(CASE WHEN list_contains(ts, 'dup') THEN 1 ELSE 0 END) AS BIGINT) AS df2
            FROM d),
      ${dkIdfm(3)},
      scored AS (SELECT doc_id,
                   ${dkBm25Term("spark", "idf0", P)} +
                   ${dkBm25Term("vector", "idf1", P)} +
                   ${dkBm25Term("dup", "idf2", P)} AS score_micros
                 FROM d, s, f, idfm
                 WHERE list_contains(ts, 'spark')
                   AND NOT list_contains(ts, 'slow'))
      SELECT doc_id, CAST(score_micros AS BIGINT) AS score_micros
      FROM scored WHERE score_micros > 0
      ORDER BY score_micros DESC, doc_id LIMIT 15"""),
      (s, dir) => {
        val path = java.nio.file.Files
          .createTempDirectory("graft-bm25-bool").toString + "/idx"
        Retrieval.writeBm25Index(T(s, dir, "documents"), col("doc_id"),
          col("text"), path, nBuckets = 16)
        Retrieval.searchBooleanIndex(s, path, must = Seq("spark"),
          should = Seq("vector", "dup"), mustNot = Seq("slow"), k = 15)
      }),

    // -- DSIR importance weights (Xie 2023, arXiv:2302.03169): hashed
    //    uni+bigram bucket models (B=64, add-one smoothed), target =
    //    source 'src18', raw = the whole corpus; per-doc weight = integer
    //    sum of per-bucket log-ratio micros. Spark: two B-bounded
    //    aggregates + one zero-shuffle projection (the log-ratio table is
    //    an array literal in the plan). The oracle recomputes the models
    //    AND the weights relationally.
    QueryDef("q176_dsir_scores", Some(s"""
      WITH RECURSIVE ${dkDsirChain(64)}
      SELECT doc_id, n_features, weight_micros FROM wt ORDER BY doc_id"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        Dsir.scores(docs, col("doc_id"), col("text"),
            docs.filter(col("source") === "src18"), col("text"),
            numBuckets = 64)
          .orderBy(col("doc_id"))
      }),

    // -- DSIR selection: Gumbel-top-k (the Gumbel-max trick = weight-
    //    proportional sampling without replacement), seeded via the
    //    60-bit hash so the draw replays: u = (hash60('42:'||id)+1)/2⁶⁰,
    //    −ln(−ln(u)) as NESTED INTEGER LOGS (two recursive lnm
    //    instances): inner = max(lnm(2⁶⁰) − lnm(h+1), 1), key = weight +
    //    lnm(10⁶) − lnm(inner) — mirrors Dsir.gumbelKey exactly.
    QueryDef("q177_dsir_select", Some(s"""
      WITH RECURSIVE ${dkDsirChain(64)},
      gk AS (SELECT doc_id, weight_micros,
               ${dkHash60("'42:' || CAST(doc_id AS VARCHAR)")} + 1 AS h1
             FROM wt),
      g1_src AS (SELECT DISTINCT h1 AS v FROM gk
                 UNION SELECT CAST(1152921504606846976 AS BIGINT)),
      ${OracleLnFix.ctes("g1_src", "g1lnm")},
      gi AS (SELECT doc_id, weight_micros,
               greatest((SELECT m FROM g1lnm
                         WHERE v = CAST(1152921504606846976 AS BIGINT))
                        - (SELECT m FROM g1lnm WHERE v = gk.h1),
                        CAST(1 AS BIGINT)) AS ginner
             FROM gk),
      g2_src AS (SELECT DISTINCT ginner AS v FROM gi
                 UNION SELECT CAST(1000000 AS BIGINT)),
      ${OracleLnFix.ctes("g2_src", "g2lnm")},
      keyed AS (SELECT doc_id, weight_micros,
                  weight_micros
                  + (SELECT m FROM g2lnm WHERE v = CAST(1000000 AS BIGINT))
                  - (SELECT m FROM g2lnm WHERE v = gi.ginner) AS key_micros
                FROM gi)
      SELECT doc_id, weight_micros, key_micros
      FROM keyed ORDER BY key_micros DESC, doc_id LIMIT 50"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        Dsir.select(docs, col("doc_id"), col("text"),
          docs.filter(col("source") === "src18"), col("text"),
          k = 50, seed = 42L, numBuckets = 64)
      }),

    // -- MORE-LIKE-THIS term selection (Lucene MoreLikeThis, r12): the
    //    source doc's terms with tf >= 2 ranked by the exact integer
    //    tf · idf-micros (idf = the repo's q6 Lucene-BM25 idf, df from
    //    the index postings), top 8. The oracle replays tf, df, and the
    //    ranking over ALL candidates with the self-contained integer-log
    //    idf — a wrong df, a dropped candidate, or a selection-order
    //    slip all change the hash.
    QueryDef("q199_mlt_terms", Some(s"""
      WITH RECURSIVE $dkMltChain
      SELECT term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
             CAST(sel_micros AS BIGINT) AS sel_micros
      FROM sel ORDER BY sel_micros DESC, term LIMIT 8"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft-mlt-terms").toString + "/idx"
        Retrieval.writeBm25Index(docs, col("doc_id"), col("text"), path,
          nBuckets = 16)
        val txt = docs.filter(col("doc_id") === 42)
          .select(col("text")).head().getString(0)
        Retrieval.mltTerms(s, path, txt, maxQueryTerms = 8)
      }),

    // -- MORE-LIKE-THIS search (r12): the 8 selected terms run as a BM25
    //    query through the bucket-pruned probe, source doc excluded
    //    BEFORE the top-k cut. The oracle replays selection AND scoring
    //    (idf6 = m/10⁶ — the IEEE division both engines round
    //    identically — in the probe's exact association order); a leaked
    //    source doc, a post-limit exclusion, or a term-set drift all
    //    hash-mismatch.
    QueryDef("q200_mlt_search", Some(s"""
      WITH RECURSIVE $dkMltChain,
      selt AS (SELECT term, m FROM sel
               ORDER BY sel_micros DESC, term LIMIT 8),
      sc AS (SELECT d.doc_id, CAST(floor((CAST(t.m AS DOUBLE) / 1000000.0) *
               (CAST(len(list_filter(d.ts, x -> x = t.term)) AS DOUBLE)
                  * ${P.k1 + 1.0} /
                (CAST(len(list_filter(d.ts, x -> x = t.term)) AS DOUBLE)
                  + ${P.k1} * (${1.0 - P.b} + ${P.b} *
                    CAST(len(d.ts) AS DOUBLE) * CAST(s.n AS DOUBLE) /
                    CAST(s.tt AS DOUBLE))))
               * 1000000.0 + 0.5) AS BIGINT) AS mm
            FROM d JOIN selt t ON list_contains(d.ts, t.term)
            CROSS JOIN s)
      SELECT doc_id, CAST(score_micros AS BIGINT) AS score_micros
      FROM (SELECT doc_id, sum(mm) AS score_micros FROM sc GROUP BY 1)
      WHERE score_micros > 0 AND doc_id <> 42
      ORDER BY score_micros DESC, doc_id LIMIT 15"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft-mlt-search").toString + "/idx"
        Retrieval.writeBm25Index(docs, col("doc_id"), col("text"), path,
          nBuckets = 16)
        val txt = docs.filter(col("doc_id") === 42)
          .select(col("text")).head().getString(0)
        Retrieval.moreLikeThis(s, path, txt, k = 15,
          excludeDocId = Some(42L), maxQueryTerms = 8)
      }),

    // -- SNIPPETS (Lucene Highlighter fragment selection, r12): for
    //    every matching doc, the best 6-token window by (distinct query
    //    terms, total hits, earliest start) plus its text. The oracle
    //    enumerates EVERY window relationally and replays the argmax —
    //    a sliding-count slip, a tie broken late, or an off-by-one slice
    //    all change the hash.
    QueryDef("q208_snippets", Some(s"""
      WITH d AS (SELECT doc_id, ${dkToks("text")} AS ts FROM documents),
      ${dkBestWindow("d", 6)}
      SELECT doc_id, CAST(ws AS BIGINT) AS win_start,
             CAST(dh AS BIGINT) AS distinct_hits,
             CAST(th AS BIGINT) AS total_hits,
             array_to_string(ts[ws+1:ws+6], ' ') AS snippet
      FROM best WHERE brn = 1 AND dh > 0 ORDER BY doc_id"""),
      (s, dir) =>
        Retrieval.snippets(T(s, dir, "documents"), col("doc_id"),
            col("text"), QTerms, w = 6)
          .orderBy(col("doc_id"))),

    // -- SEARCH + SNIPPETS serving composition (r12): top-10 from the
    //    bucket-pruned probe, snippets computed for the 10 result rows
    //    only (the text join touches k primary-store docs, never the
    //    corpus). Oracle replays ranking AND window selection.
    QueryDef("q209_search_snippets", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)},
      top AS (SELECT doc_id, score_micros FROM scored
              WHERE score_micros > 0
              ORDER BY score_micros DESC, doc_id LIMIT 10),
      td AS (SELECT d.doc_id, d.ts FROM d JOIN top USING (doc_id)),
      ${dkBestWindow("td", 6)}
      SELECT b.doc_id, CAST(t.score_micros AS BIGINT) AS score_micros,
             CAST(b.ws AS BIGINT) AS win_start,
             array_to_string(b.ts[b.ws+1:b.ws+6], ' ') AS snippet
      FROM best b JOIN top t USING (doc_id) WHERE b.brn = 1
      ORDER BY t.score_micros DESC, b.doc_id"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val path = java.nio.file.Files
          .createTempDirectory("graft-snip").toString + "/idx"
        Retrieval.writeBm25Index(docs, col("doc_id"), col("text"), path,
          nBuckets = 16)
        Retrieval.searchWithSnippets(s, path, docs, col("doc_id"),
          col("text"), QTerms, k = 10, w = 6)
      }),

    // -- CROSS-ENCODER-STYLE RERANK HOOK (r15, Nogueira & Cho 2019's
    //    retrieve-then-rerank): BM25 pools top-20, a pairwise scorer
    //    re-scores the POOL ONLY, and the final order is the reranker's.
    //    The scorer here is the deterministic term-interaction stub that
    //    stands in for the learned model (an external-model boundary,
    //    the Multimodal decode-stub convention): per query term,
    //    hash60('ce:'||term) % 1000 times the term's document frequency,
    //    summed as exact integers. The oracle replays pool, weights,
    //    interaction sums, and the rerank order — green proves the
    //    two-stage plumbing, which is what the hook exists to serve.
    QueryDef("q217_ce_rerank", Some {
      val ceSum = QTerms.map(t =>
        s"(${dkHash60(s"'ce:$t'")} % 1000) * " +
          s"CAST(len(list_filter(ts, x -> x = '$t')) AS BIGINT)")
        .mkString(" + ")
      s"""
      WITH RECURSIVE ${dkBm25Chain(P)},
      pool AS (SELECT doc_id, CAST(score_micros AS BIGINT) AS stage1_micros
               FROM scored WHERE score_micros > 0
               ORDER BY score_micros DESC, doc_id LIMIT 20),
      ce AS (SELECT p.doc_id, p.stage1_micros,
               CAST($ceSum AS BIGINT) AS ce_micros
             FROM pool p JOIN d USING (doc_id)),
      ranked AS (SELECT *, CAST(row_number() OVER (ORDER BY ce_micros DESC,
                   doc_id) AS BIGINT) AS rn FROM ce)
      SELECT doc_id, ce_micros, stage1_micros, rn FROM ranked
      WHERE rn <= 10 ORDER BY rn"""
    },
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val pool = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
          QTerms, k = 20)
        Retrieval.crossEncoderRerank(docs, col("doc_id"), col("text"),
          pool, col("doc_id"), col("score_micros"), QTerms, k = 10)
      }),

    // -- LATE-INTERACTION HYBRID (r15): BM25 lexical pool ∘ multi-vector
    //    MaxSim pool (q215's chain — embeddings grouped 4 per doc, the
    //    query = doc 0's token bag, corpus doc 0 self-excluded), fused by
    //    the exact-integer RRF of q198. The oracle replays both rankings
    //    and the fusion; a single-vector dense pool in MaxSim's place
    //    hash-mismatches, proving the late-interaction side.
    QueryDef("q218_hybrid_maxsim", Some(s"""
      WITH RECURSIVE ${dkBm25Chain(P)},
      cmv AS (SELECT vec_id // 4 AS cdoc, ${dkQuant("embedding")} AS cv
              FROM embeddings),
      qmv AS (SELECT vec_id % 4 AS qtok, ${dkQuant("embedding")} AS qv
              FROM embeddings WHERE vec_id < 4),
      ms AS (SELECT cmv.cdoc, qmv.qtok, ${dkCos("cmv.cv", "qmv.qv")} AS cos
             FROM cmv, qmv WHERE cmv.cdoc <> 0),
      tm AS (SELECT cdoc, qtok, max(cos) AS tok_max FROM ms GROUP BY 1, 2),
      pairms AS (SELECT cdoc AS doc_id,
                   CAST(sum(CAST(floor(tok_max * 1000000 + 0.5) AS BIGINT))
                        AS BIGINT) AS ms_micros
                 FROM tm GROUP BY 1),
      msr AS (SELECT doc_id, row_number() OVER (
                ORDER BY ms_micros DESC, doc_id) AS r
              FROM (SELECT * FROM pairms
                    ORDER BY ms_micros DESC, doc_id LIMIT 20)),
      lex AS (SELECT doc_id, row_number() OVER (
                ORDER BY score_micros DESC, doc_id) AS r
              FROM (SELECT * FROM scored WHERE score_micros > 0
                    ORDER BY score_micros DESC, doc_id LIMIT 20)),
      fused AS (SELECT coalesce(l.doc_id, m.doc_id) AS doc_id,
                  coalesce((2000000 + 60 + l.r) // (2 * (60 + l.r)), 0) +
                  coalesce((2000000 + 60 + m.r) // (2 * (60 + m.r)), 0)
                    AS rrf_micros,
                  l.r AS bm25_rank, m.r AS maxsim_rank
                FROM lex l FULL OUTER JOIN msr m ON l.doc_id = m.doc_id)
      SELECT doc_id, CAST(rrf_micros AS BIGINT) AS rrf_micros,
             CAST(bm25_rank AS BIGINT) AS bm25_rank,
             CAST(maxsim_rank AS BIGINT) AS maxsim_rank
      FROM fused ORDER BY rrf_micros DESC, doc_id LIMIT 10"""),
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val emb = T(s, dir, "embeddings")
        val corpusToks = emb.select(
          floor(col("vec_id") / 4).cast("long").as("doc"), col("embedding"))
        val queryToks = emb.filter(col("vec_id") < 4).select(
          lit(0L).as("qd"), (col("vec_id") % 4).as("qtok"), col("embedding"))
        Retrieval.hybridMaxSimTopK(docs, col("doc_id"), col("text"),
          corpusToks, col("doc"), col("embedding"),
          queryToks, col("qd"), col("qtok"), col("embedding"),
          QTerms, k = 10, poolK = 20)
      })
  )
}
