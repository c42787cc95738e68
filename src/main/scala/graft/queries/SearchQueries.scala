package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}

/** Retrieval layer over the document corpus: classic sparse (lexical)
  * search to complement the dense ANN family in [[EmbeddingQueries]].
  * A training-data pipeline uses these for targeted corpus probes
  * ("which documents talk about X") and for hybrid retrieval evals;
  * the reference's engine exposes the same capability through its SQL
  * surface (full-text scoring is expressible as plain aggregation —
  * see duckdb's fts extension for the native analogue).
  *
  * Float discipline (the r5 lesson): BM25 is irreducibly double math
  * (ln, divisions), so each per-(doc, term) score is rounded to an
  * integer MICRO-unit per row — bit-identical across engines for
  * identical inputs — and only the integer partials are summed, which
  * is order-independent. Corpus-wide constants (N, total tokens) are
  * exact integers; avgdl enters as one exact-integer division.
  */
object SearchQueries extends QuerySet {

  // Terms chosen from the synthetic vocabulary so tf>0 paths, df skew,
  // and length normalization all get exercised.
  private val Terms = Seq("scan", "merge", "vector")
  private val TermsSql = Terms.map(t => s"'$t'").mkString(", ")

  // ---- BM25 top-k ---------------------------------------------------------
  // Okapi BM25 (k1=1.2, b=0.75), idf = ln(1 + (N-df+0.5)/(df+0.5)).
  // 100 TB shape: the token explode is filtered to the query terms
  // MAP-SIDE, so the only corpus-sized shuffle carries (doc_id, term)
  // partials for matching docs only; df (≤|query| rows) and the global
  // (N, tot) row broadcast back; doc-length join is a plain hash join
  // on doc_id; the final top-k collapses to TakeOrderedAndProject (no
  // full sort). Ties broken by doc_id so rank is deterministic.
  private val bm25 = QueryDef(
    "bm25_topk",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
            |n AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
            |tf AS (
            |  SELECT doc_id, term, count(*) AS tf
            |  FROM (SELECT doc_id, unnest(w) AS term FROM t)
            |  WHERE term IN ($TermsSql)
            |  GROUP BY doc_id, term),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |s AS (
            |  SELECT tf.doc_id,
            |         CAST(round(ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5)) *
            |                    (tf.tf * 2.2) /
            |                    (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl /
            |                                    (CAST(n.tot AS DOUBLE) / n.n))) *
            |                    1000000.0) AS BIGINT) AS m
            |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
            |sc AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micro
            |       FROM s GROUP BY doc_id)
            |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
            |            AS BIGINT) AS rank,
            |       doc_id, score_micro
            |FROM sc ORDER BY rank LIMIT 10""".stripMargin),
    (s, dir) => {
      val sc = bm25Scores(s, dir)
        .orderBy(col("score_micro").desc, col("doc_id")).limit(10)
      // rank the (tiny) top-k result; the window runs over 10 rows
      sc.withColumn("rank",
          row_number().over(Window.orderBy(col("score_micro").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("score_micro"))
    })

  /** All-doc BM25 scores for [[Terms]] — the shared prelude of the
    * top-k query and the hybrid fusion below. Since r12 this is a
    * doc-keyed rollup of the CHECKPOINTED per-(term, doc) scored frame
    * (bm25TermDoc — identical m arithmetic, proven hash-equal through
    * the MRR/nDCG gates), so the sparse ranking arm re-reads a
    * standing RDD instead of re-tokenizing the corpus per query. */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession, dir: String) =
    bm25TermDoc(s, dir)
      .groupBy("doc_id").agg(sum(col("m")).as("score_micro"))

  // ---- inverted-index postings --------------------------------------------
  // The index-build side of lexical search: per term, document
  // frequency, total term frequency, and a CAPPED posting list (top-5
  // docs by tf, doc_id tie-break) rendered as a deterministic string.
  // 100 TB shape: a hot term's posting candidates are corpus-sized,
  // but `row_number ≤ 5` triggers Catalyst's WindowGroupLimit rewrite —
  // a PARTIAL group-limit runs map-side, pruning every input partition
  // to its own top-5 per term BEFORE the exchange, so the per-term
  // window sees ≤ 5 × partitions rows, never the raw posting list.
  // That is the salted two-phase top-k (the stratified-sample
  // discipline) with Catalyst inserting phase 1 itself; the plan lock
  // pins the Partial stage so a refactor that breaks the rewrite
  // pattern (e.g. rank over a derived frame) fails CI.
  private val postings = QueryDef(
    "inverted_index_postings",
    Some("""WITH tok AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           |tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
           |r AS (SELECT term, doc_id, tf,
           |             row_number() OVER (PARTITION BY term
           |                                ORDER BY tf DESC, doc_id) AS rn
           |      FROM tf),
           |top AS (SELECT term,
           |               array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY rn), ',')
           |                 AS postings
           |        FROM r WHERE rn <= 5 GROUP BY term),
           |st AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
           |       FROM tf GROUP BY term)
           |SELECT st.term, st.df, st.total_tf, top.postings
           |FROM st JOIN top USING (term) ORDER BY st.term""".stripMargin),
    (s, dir) => {
      val tf = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      val termW = Window.partitionBy(col("term"))
        .orderBy(col("tf").desc, col("doc_id"))
      val top = tf
        .withColumn("rn", row_number().over(termW)).filter(col("rn") <= 5)
        .groupBy("term")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")), ",").as("postings"))
      val st = tf.groupBy("term")
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
      st.join(top, "term")
        .select(col("term"), col("df"), col("total_tf"), col("postings"))
        .orderBy("term")
    })

  // ---- hybrid retrieval (reciprocal-rank fusion) ---------------------------
  // Sparse (BM25) and dense (cosine-to-probe) rankings fused with RRF:
  // score(d) = Σ_lists 1/(60 + rank_list(d)) over the two top-50 lists
  // (Cormack et al. 2009) — the standard hybrid-search combiner and the
  // shape a RAG pipeline runs per query. The corpus id spaces align
  // (vec_id i embeds document i, TESTDATA.md).
  //
  // 100 TB shape: each arm is the already-locked scalable form — BM25
  // scores shuffle query-filtered partials; the dense arm is one
  // map-side dot against a broadcast probe — and each arm collapses to
  // TakeOrderedAndProject for its top-50. Fusion itself touches two
  // ≤50-row sets (full outer join + a 100-row sort): constant work
  // regardless of corpus size. RRF contributions are per-row rounds of
  // exact rationals (1e6/(60+rank)) — integer partials, no float sums.
  private val hybrid = QueryDef(
    "hybrid_rrf_topk",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
            |n AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
            |tf AS (
            |  SELECT doc_id, term, count(*) AS tf
            |  FROM (SELECT doc_id, unnest(w) AS term FROM t)
            |  WHERE term IN ($TermsSql)
            |  GROUP BY doc_id, term),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |s AS (
            |  SELECT tf.doc_id,
            |         CAST(round(ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5)) *
            |                    (tf.tf * 2.2) /
            |                    (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl /
            |                                    (CAST(n.tot AS DOUBLE) / n.n))) *
            |                    1000000.0) AS BIGINT) AS m
            |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
            |sc AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micro
            |       FROM s GROUP BY doc_id),
            |sp AS (SELECT doc_id, CAST(row_number() OVER (
            |              ORDER BY score_micro DESC, doc_id) AS BIGINT) AS sparse_rank
            |       FROM sc),
            |sp50 AS (SELECT * FROM sp WHERE sparse_rank <= 50),
            |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            |      FROM embeddings),
            |nn AS (SELECT vec_id, v,
            |              sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
            |       FROM e),
            |p AS (SELECT v AS pv, nrm AS pn FROM nn WHERE vec_id = 0),
            |dn AS (SELECT c.vec_id AS doc_id,
            |              round(list_aggregate(list_transform(range(1, len(c.v) + 1),
            |                      i -> c.v[i] * p.pv[i]), 'sum') / (c.nrm * p.pn), 6) AS cos
            |       FROM nn c, p WHERE c.vec_id <> 0),
            |dr AS (SELECT doc_id, CAST(row_number() OVER (
            |              ORDER BY cos DESC, doc_id) AS BIGINT) AS dense_rank
            |       FROM dn),
            |dr50 AS (SELECT * FROM dr WHERE dense_rank <= 50),
            |f AS (SELECT coalesce(sp50.doc_id, dr50.doc_id) AS doc_id,
            |             coalesce(sp50.sparse_rank, 0) AS sparse_rank,
            |             coalesce(dr50.dense_rank, 0) AS dense_rank
            |      FROM sp50 FULL OUTER JOIN dr50 ON sp50.doc_id = dr50.doc_id),
            |g AS (SELECT doc_id, sparse_rank, dense_rank,
            |             CAST(CASE WHEN sparse_rank > 0
            |                  THEN round(1000000.0 / (60 + sparse_rank))
            |                  ELSE 0 END AS BIGINT) +
            |             CAST(CASE WHEN dense_rank > 0
            |                  THEN round(1000000.0 / (60 + dense_rank))
            |                  ELSE 0 END AS BIGINT) AS rrf_micro
            |      FROM f)
            |SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
            |            AS BIGINT) AS rank,
            |       doc_id, rrf_micro, sparse_rank, dense_rank
            |FROM g ORDER BY rank LIMIT 10""".stripMargin),
    (s, dir) => {
      val sparse = bm25Scores(s, dir)
        .orderBy(col("score_micro").desc, col("doc_id")).limit(50)
        .withColumn("sparse_rank",
          row_number().over(Window.orderBy(col("score_micro").desc, col("doc_id")))
            .cast("long"))
        .select(col("doc_id"), col("sparse_rank"))
      val e = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", expr("sqrt(dot_f64(v, v))"))
      val probe = broadcast(e.filter(col("vec_id") === 0)
        .select(col("v").as("pv"), col("nrm").as("pn")))
      val dense = e.filter(col("vec_id") =!= 0).crossJoin(probe)
        .withColumn("cos", round(expr("dot_f64(v, pv)") / (col("nrm") * col("pn")), 6))
        .orderBy(col("cos").desc, col("vec_id")).limit(50)
        .withColumn("dense_rank",
          row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("dense_rank"))
      sparse.join(dense, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("sparse_rank"), lit(0L)).as("sparse_rank"),
          coalesce(col("dense_rank"), lit(0L)).as("dense_rank"))
        .withColumn("rrf_micro", expr(
          """CAST(CASE WHEN sparse_rank > 0
            |     THEN round(1000000.0D / (60 + sparse_rank), 0)
            |     ELSE 0 END AS BIGINT) +
            |CAST(CASE WHEN dense_rank > 0
            |     THEN round(1000000.0D / (60 + dense_rank), 0)
            |     ELSE 0 END AS BIGINT)""".stripMargin))
        .orderBy(col("rrf_micro").desc, col("doc_id")).limit(10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("rrf_micro").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("rrf_micro"),
          col("sparse_rank"), col("dense_rank"))
    })

  // ---- positional phrase search ------------------------------------------
  // The capability a bag-of-words index can't express: exact phrase
  // match ("scan merge" as ADJACENT tokens) via positional postings —
  // the standard two-term intersection over (doc, position) lists.
  // 100 TB shape: positions are assigned map-side during the explode
  // and the vocabulary filter prunes to the query's terms BEFORE any
  // exchange (the BM25 discipline), so the only shuffled rows are the
  // two terms' postings; adjacency is a pure EQUI join — the left
  // side's key is (doc_id, pos+1) precomputed map-side, so Catalyst
  // plans a hash join, never a theta/nested-loop. Position base
  // (0- vs 1-based) cancels in the adjacency relation.
  private val phrase = QueryDef(
    "phrase_search",
    Some("""WITH tok AS (
           |  SELECT doc_id, t.i AS pos, w[t.i] AS term
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |       unnest(range(1, len(w) + 1)) AS t(i)),
           |a AS (SELECT doc_id, pos FROM tok WHERE term = 'scan'),
           |b AS (SELECT doc_id, pos FROM tok WHERE term = 'merge')
           |SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
           |FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin),
    (s, dir) => {
      val tok = Tables.table(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
        .filter(col("term").isin("scan", "merge"))
      val a = tok.filter(col("term") === "scan")
        .select(col("doc_id"), (col("pos") + 1).as("next_pos"))
      val b = tok.filter(col("term") === "merge")
        .select(col("doc_id").as("doc_b"), col("pos").as("pos_b"))
      a.join(b, a("doc_id") === b("doc_b") && a("next_pos") === b("pos_b"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
        .orderBy("doc_id")
    })

  // ---- per-document keyword extraction (TF-IDF top terms) ----------------
  // The transpose of the capped postings list: instead of "top docs per
  // term", the top-3 TF-IDF KEYWORDS per document — the tagging stage a
  // curation pipeline runs to label documents for mixture/routing
  // decisions. Scoring discipline: tf·ln(N/df) rounded to integer
  // micro-units once per (doc, term) (exact BIGINT counts inside the
  // one double expression, identical parenthesization both engines);
  // terms present in every document carry score 0 and are excluded —
  // ubiquity is the definition of a non-keyword.
  //
  // 100 TB shape: one (doc, term) partial-agg shuffle builds tf (the
  // corpus body never moves raw — the explode is map-side); df is a
  // second partial agg over the already-collapsed tf table at
  // vocabulary scale, broadcast back; the per-doc top-3 window
  // partitions by the corpus's natural high-cardinality doc key and
  // rides Catalyst's WindowGroupLimit — each input partition prunes to
  // its own top-3 per doc BEFORE the exchange (the postings
  // discipline, PlanSpec-locked).
  private def docTopTermsSql(unnestTok: String, oneM: String) =
    s"""WITH tok AS ($unnestTok),
       |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tok),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tok GROUP BY doc_id, term),
       |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |s AS (SELECT tf.doc_id, tf.term,
       |        CAST(round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) * $oneM, 0)
       |             AS BIGINT) AS score_micro
       |      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n),
       |r AS (SELECT doc_id, term, score_micro,
       |        row_number() OVER (PARTITION BY doc_id
       |                           ORDER BY score_micro DESC, term) AS rk
       |      FROM s WHERE score_micro > 0)
       |SELECT doc_id, CAST(rk AS BIGINT) AS rank, term, score_micro
       |FROM r WHERE rk <= 3 ORDER BY doc_id, rank""".stripMargin

  private val docTopTerms = QueryDef(
    "doc_top_terms",
    Some(docTopTermsSql(
      "SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents",
      "1000000.0::DOUBLE")),
    (s, dir) => graft.Tables.sql(s, dir, docTopTermsSql(
      """SELECT doc_id, term FROM documents
        |  LATERAL VIEW explode(split(text, ' ')) t AS term""".stripMargin,
      "1000000.0D")))

  // ---- Dirichlet query-likelihood ranking --------------------------------
  // The other classic lexical ranker next to BM25: language-model
  // retrieval with Dirichlet smoothing (Zhai & Lafferty 2001),
  // score(d) = Σ_t ln((tf_td + μ·p_t)/(|d| + μ)), μ = 2000, p_t the
  // corpus unigram probability. Unlike BM25 every document scores on
  // every query term (absent terms contribute the smoothed background
  // mass), so the scoring frame is |docs|×|terms| — built by crossing
  // the doc-length table with the 3-row term stats and LEFT-joining
  // the sparse tf — with each term's ln rounded to integer micro-units
  // before the order-independent sum (the surprisal/KL discipline).
  private val qlDirichlet = QueryDef(
    "ql_dirichlet_topk",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
            |n AS (SELECT CAST(sum(dl) AS BIGINT) AS tot FROM dl),
            |ctf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
            |  SELECT unnest(w) AS term FROM t) WHERE term IN ($TermsSql) GROUP BY term),
            |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM (
            |  SELECT doc_id, unnest(w) AS term FROM t) WHERE term IN ($TermsSql) GROUP BY doc_id, term),
            |s AS (
            |  SELECT dl.doc_id,
            |    CAST(round(1e6 * ln((coalesce(tf.tf, 0) + 2000.0 * ctf.c / n.tot) / (dl.dl + 2000.0))) AS BIGINT) AS m
            |  FROM dl CROSS JOIN n
            |  JOIN ctf ON true
            |  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.term = ctf.term),
            |sc AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS score_micro FROM s GROUP BY doc_id)
            |SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank,
            |       doc_id, score_micro
            |FROM sc ORDER BY rank LIMIT 10""".stripMargin),
    (s, dir) => {
      // sparse (doc, term) tf comes off the shared checkpointed scored
      // frame; one documents scan remains for the dense doc-length
      // spine (QL scores EVERY doc on every term — absent terms get
      // the smoothed background mass, so dl cannot be term-bound).
      // The ln argument keeps the oracle's exact parenthesization.
      val sc = bm25TermDoc(s, dir).select("doc_id", "term", "tf")
      val dl = Tables.table(s, dir, "documents")
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
      // corpus token total = Σ ctf over the checkpointed vocabulary
      // frame (≡ Σ dl, same tokenization) — re-aggregating dl here
      // would scan documents a second time
      val tot = broadcast(ctfFrame(s, dir).agg(sum("ctf").cast("long").as("tot")))
      val ctf = broadcast(sc.groupBy("term").agg(sum("tf").cast("long").as("c")))
      val scored = dl.crossJoin(ctf).crossJoin(tot)
        .join(sc, Seq("doc_id", "term"), "left")
        .withColumn("m", expr(
          "CAST(round(1e6 * ln((coalesce(tf, 0) + 2000.0 * c / tot) / " +
            "(dl + 2000.0))) AS BIGINT)"))
      val top = scored.groupBy("doc_id")
        .agg(sum("m").cast("long").as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id")).limit(10)
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("score_micro").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("score_micro"))
    })

  // ---- retrieval evaluation: MRR / P@5 / hits@10 -------------------------
  // The eval harness that closes the retrieval loop: for each query
  // term, rank ALL matching documents by single-term BM25 and score
  // the ranking against a graded-relevance oracle (tf ≥ 5 — "the doc
  // is substantially about the term", strict enough that the ranker
  // can and does miss). Reported per query: corpus-wide relevant
  // count, first relevant rank in the top-10, the reciprocal rank as
  // an EXACT integer (×2520 = lcm(1..10), so 1/rank never rounds),
  // relevant@5 and relevant@10. Per-(doc,term) scores reuse bm25's
  // micro-unit float discipline (identical parenthesization, one
  // round per row).
  //
  // 100 TB shape: scoring inherits bm25's map-side term filter (only
  // matching docs shuffle); the per-term top-10 window triggers
  // Catalyst's WindowGroupLimit partial (map-side per-partition
  // top-10 BEFORE the exchange — the inverted_index_postings lock);
  // the relevance rollup aggregates the same tf frame (query-term
  // rows only); the final join is 3 rows against 3 rows.
  private val retrievalEval = QueryDef(
    "retrieval_eval_mrr",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
            |n AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
            |tf AS (
            |  SELECT doc_id, term, count(*) AS tf
            |  FROM (SELECT doc_id, unnest(w) AS term FROM t)
            |  WHERE term IN ($TermsSql)
            |  GROUP BY doc_id, term),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |s AS (
            |  SELECT tf.term, tf.doc_id, tf.tf,
            |         CAST(round(ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5)) *
            |                    (tf.tf * 2.2) /
            |                    (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl /
            |                                    (CAST(n.tot AS DOUBLE) / n.n))) *
            |                    1000000.0) AS BIGINT) AS m
            |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
            |r AS (
            |  SELECT term, doc_id, tf, m,
            |         row_number() OVER (PARTITION BY term
            |                            ORDER BY m DESC, doc_id) AS rn
            |  FROM s),
            |top AS (SELECT * FROM r WHERE rn <= 10),
            |rel AS (SELECT term, count(*) AS n_relevant FROM tf
            |        WHERE tf >= 5 GROUP BY term),
            |ev AS (
            |  SELECT term,
            |         min(CASE WHEN tf >= 5 THEN rn END) AS frr,
            |         count(*) FILTER (WHERE tf >= 5 AND rn <= 5) AS rel_at_5,
            |         count(*) FILTER (WHERE tf >= 5) AS rel_at_10
            |  FROM top GROUP BY term)
            |SELECT ev.term, CAST(rel.n_relevant AS BIGINT) AS n_relevant,
            |       CAST(coalesce(ev.frr, 0) AS BIGINT) AS first_rel_rank,
            |       CAST(CASE WHEN ev.frr IS NULL THEN 0
            |                 ELSE 2520 // ev.frr END AS BIGINT) AS rr_x2520,
            |       CAST(ev.rel_at_5 AS BIGINT) AS rel_at_5,
            |       CAST(ev.rel_at_10 AS BIGINT) AS rel_at_10
            |FROM ev JOIN rel USING (term) ORDER BY ev.term""".stripMargin),
    (s, dir) => {
      // the scoring CTE is the memoized checkpointed frame — the served
      // plan re-reads the standing RDD, zero documents FileScans
      val sc = bm25TermDoc(s, dir)
      val w = Window.partitionBy("term").orderBy(col("m").desc, col("doc_id"))
      val top = sc.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      val rel = sc.filter(col("tf") >= 5)
        .groupBy("term").agg(count(lit(1)).cast("long").as("n_relevant"))
      val ev = top.groupBy("term").agg(
        min(when(col("tf") >= 5, col("rn"))).as("frr"),
        count(when(col("tf") >= 5 && col("rn") <= 5, lit(1)))
          .cast("long").as("rel_at_5"),
        count(when(col("tf") >= 5, lit(1))).cast("long").as("rel_at_10"))
      ev.join(rel, "term")
        .select(col("term"), col("n_relevant"),
          coalesce(col("frr"), lit(0)).cast("long").as("first_rel_rank"),
          when(col("frr").isNull, lit(0L))
            .otherwise(expr("2520 div frr")).cast("long").as("rr_x2520"),
          col("rel_at_5"), col("rel_at_10"))
        .orderBy("term")
    })

  // ---- nDCG@10 -------------------------------------------------------------
  // The graded companion of retrieval_eval_mrr: gain = 2^min(tf,4) − 1
  // (the standard exponential gain, capped), discount weights are the
  // TEN PRECOMPUTED integers round(10⁶/log2(i+1)) — log2 never runs
  // inside either engine, so DCG, the corpus-wide ideal IDCG (gains
  // re-ranked descending), and ndcg_ppm are pure integer arithmetic,
  // exact on both sides. Both top-10s keep their `rn <= 10` filters so
  // Catalyst's WindowGroupLimit prunes map-side before the exchange;
  // candidates stay query-term-bound (bm25's map-side term filter).
  // ONE source of truth for the ten discount integers
  // round(10⁶/log2(rn+1)) — the oracle's VALUES string and the Spark
  // side's broadcast frame both derive from it (review catch: a
  // duplicated literal list would let the engines drift silently)
  private val NdcgWeights: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 630930L, 3 -> 500000L, 4 -> 430677L,
    5 -> 386853L, 6 -> 356207L, 7 -> 333333L, 8 -> 315465L,
    9 -> 301030L, 10 -> 289065L)

  private val ndcgWeights =
    NdcgWeights.map { case (rn, w) => s"($rn,$w)" }.mkString(",")

  private val retrievalNdcg = QueryDef(
    "retrieval_eval_ndcg",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
            |n AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
            |tf AS (
            |  SELECT doc_id, term, count(*) AS tf
            |  FROM (SELECT doc_id, unnest(w) AS term FROM t)
            |  WHERE term IN ($TermsSql)
            |  GROUP BY doc_id, term),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |s AS (
            |  SELECT tf.term, tf.doc_id,
            |         CASE least(tf.tf, 4) WHEN 0 THEN 0 WHEN 1 THEN 1
            |              WHEN 2 THEN 3 WHEN 3 THEN 7 ELSE 15 END AS gain,
            |         CAST(round(ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5)) *
            |                    (tf.tf * 2.2) /
            |                    (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl /
            |                                    (CAST(n.tot AS DOUBLE) / n.n))) *
            |                    1000000.0) AS BIGINT) AS m
            |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
            |r AS (SELECT term, gain,
            |             row_number() OVER (PARTITION BY term
            |                                ORDER BY m DESC, doc_id) AS rn
            |      FROM s),
            |ir AS (SELECT term, gain,
            |              row_number() OVER (PARTITION BY term
            |                                 ORDER BY gain DESC, doc_id) AS rn
            |       FROM s),
            |wgt AS (SELECT * FROM (VALUES $ndcgWeights) AS v(rn, w)),
            |dcg AS (SELECT r.term, CAST(sum(r.gain * wgt.w) AS BIGINT) AS dcg_x1e6
            |        FROM (SELECT * FROM r WHERE rn <= 10) r
            |        JOIN wgt USING (rn) GROUP BY r.term),
            |idcg AS (SELECT ir.term,
            |                CAST(sum(ir.gain * wgt.w) AS BIGINT) AS idcg_x1e6
            |         FROM (SELECT * FROM ir WHERE rn <= 10) ir
            |         JOIN wgt USING (rn) GROUP BY ir.term)
            |SELECT dcg.term, dcg.dcg_x1e6, idcg.idcg_x1e6,
            |       CAST(dcg.dcg_x1e6 * 1000000 // idcg.idcg_x1e6 AS BIGINT)
            |         AS ndcg_ppm
            |FROM dcg JOIN idcg USING (term) ORDER BY dcg.term""".stripMargin),
    (s, dir) => {
      // BOTH rankings (by score and by ideal gain) read the one
      // checkpointed scored frame — the pure-SQL spelling inlined the
      // scoring CTE twice and re-scanned documents 8× in one query,
      // the first live catch of the now-default-on ScanBudgetRule
      import s.implicits._
      val sc = bm25TermDoc(s, dir).withColumn("gain",
        expr("CASE least(tf, 4) WHEN 0 THEN 0 WHEN 1 THEN 1 " +
          "WHEN 2 THEN 3 WHEN 3 THEN 7 ELSE 15 END"))
      val wgt = broadcast(NdcgWeights.toDF("rn", "w"))
      def top10DcgBy(order: Seq[org.apache.spark.sql.Column], out: String) =
        sc.withColumn("rn",
            row_number().over(Window.partitionBy("term").orderBy(order: _*)))
          .filter(col("rn") <= 10)
          .join(wgt, "rn")
          .groupBy("term").agg(sum(expr("gain * w")).cast("long").as(out))
      val dcg = top10DcgBy(Seq(col("m").desc, col("doc_id")), "dcg_x1e6")
      val idcg = top10DcgBy(Seq(col("gain").desc, col("doc_id")), "idcg_x1e6")
      dcg.join(idcg, "term")
        .select(col("term"), col("dcg_x1e6"), col("idcg_x1e6"),
          expr("CAST(dcg_x1e6 * 1000000 div idcg_x1e6 AS BIGINT)")
            .as("ndcg_ppm"))
        .orderBy("term")
    })

  /** Vocabulary-sized (term, ctf) corpus counts, checkpointed once per
    * (session, dir): referenced twice below (grand total + the lift
    * join), and Spark's CTE/plan inlining would re-scan the corpus per
    * reference (the kl_divergence one-pass discipline). */
  private val ctfCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  /** RM1 pass-1 feedback sets, memoized per (session, dir, generation):
    * ~30 (query-term, doc_id) tuples — the BM25 ranking over the FIXED
    * query-term set only changes when the corpus does, which the
    * generation token tracks. */
  private val rm1FbCache =
    new graft.operators.DirMemo[Array[(String, Long)]]()

  /** The retrieval-eval tier's shared intermediate: per-(query-term,
    * doc) single-term BM25 scores `(term, doc_id, tf, m)`, checkpointed
    * once per (session, dir, generation). The eval queries (MRR, nDCG)
    * and RM1's pass-1 ranking all derive from this one frame — before
    * it existed, nDCG's twin rankings (by score and by ideal gain)
    * inlined the scoring CTE twice and re-scanned documents EIGHT times
    * in one query, which is precisely what the now-default-on
    * ScanBudgetRule rejected when it first ran over the gate. The m
    * arithmetic is the bm25_topk oracle's exactly (one round per row,
    * identical parenthesization). Query-term-bound: only docs matching
    * the fixed Terms set survive the map-side filter, so the
    * checkpointed frame is matching-docs × |terms|, not corpus-sized. */
  private val bm25TermDocCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private def bm25TermDoc(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    bm25TermDocCache.getOrElseUpdate(s, dir) {
      bm25TermDocBuild(s, dir).localCheckpoint(true)
    }

  /** The BUILD pipeline (pre-checkpoint), exposed so PlanSpec can lock
    * its scale shape — the served plans only show the standing RDD, so
    * the once-per-generation scoring pass (map-side query-term filter
    * before the partial-agg exchange, vocabulary-scale df and the
    * 1-row (N, tot) stats broadcast back) would otherwise be
    * unlockable (the dupPositions discipline). */
  private[graft] def bm25TermDocBuild(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
      Tables.sql(s, dir,
        s"""WITH t AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
           |dl AS (SELECT doc_id, CAST(size(w) AS BIGINT) AS dl FROM t),
           |n AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
           |tf AS (
           |  SELECT doc_id, term, count(*) AS tf
           |  FROM (SELECT doc_id, term FROM t LATERAL VIEW explode(w) x AS term)
           |  WHERE term IN ($TermsSql)
           |  GROUP BY doc_id, term),
           |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
           |SELECT tf.term, tf.doc_id, tf.tf,
           |       CAST(round(ln(1.0D + (n.n - df.df + 0.5D) / (df.df + 0.5D)) *
           |                  (tf.tf * 2.2D) /
           |                  (tf.tf + 1.2D * (0.25D + 0.75D * dl.dl /
           |                                   (CAST(n.tot AS DOUBLE) / n.n))) *
           |                  1000000.0D, 0) AS BIGINT) AS m
           |FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n""".stripMargin)

  private def ctfFrame(s: org.apache.spark.sql.SparkSession, dir: String) =
    ctfCache.getOrElseUpdate(s, dir) {
      Tables.table(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("ctf"))
        .localCheckpoint(true)
    }

  // ---- RM1 pseudo-relevance feedback ---------------------------------------
  // Query expansion closes the retrieval loop's third side (rank →
  // evaluate → EXPAND): the top-10 BM25 documents per query term form
  // the pseudo-relevant feedback set, and its most DISTINCTIVE terms —
  // feedback-set share over corpus share, the integer-ppm lift of
  // cluster_topic_terms, tf ≥ 5 floor, the query term itself excluded —
  // become the expansion candidates (RM1/Lavrenko-Croft relevance
  // model, reduced to its lift-ranked core so both engines stay
  // integer-exact).
  //
  // 100 TB shape: the feedback sets are 10 doc ids per query — a
  // driver-side side-input (the ANN probe-routing discipline) folded
  // back as an `isin` literal, so pass 2 tokenizes ONLY feedback docs
  // map-side; corpus term totals come from the checkpointed
  // vocabulary frame (one corpus pass per session, shared); the lift
  // join is feedback-vocabulary-sized against vocabulary-sized, never
  // corpus-sized; the per-query top-3 windows over a tiny frame.
  private val rm1Expansion = QueryDef(
    "rm1_expansion_terms",
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM t),
            |n AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tot FROM dl),
            |tf AS (
            |  SELECT doc_id, term, count(*) AS tf
            |  FROM (SELECT doc_id, unnest(w) AS term FROM t)
            |  WHERE term IN ($TermsSql)
            |  GROUP BY doc_id, term),
            |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            |s AS (
            |  SELECT tf.term, tf.doc_id,
            |         CAST(round(ln(1.0 + (n.n - df.df + 0.5) / (df.df + 0.5)) *
            |                    (tf.tf * 2.2) /
            |                    (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl /
            |                                    (CAST(n.tot AS DOUBLE) / n.n))) *
            |                    1000000.0) AS BIGINT) AS m
            |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN n),
            |fb AS (SELECT term AS q, doc_id FROM (
            |         SELECT term, doc_id,
            |                row_number() OVER (PARTITION BY term
            |                                   ORDER BY m DESC, doc_id) AS rn
            |         FROM s) x WHERE rn <= 10),
            |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            |        FROM documents),
            |ct  AS (SELECT term, count(*) AS ctf FROM tok GROUP BY term),
            |gtot AS (SELECT CAST(count(*) AS BIGINT) AS corpus_tot FROM tok),
            |ftok AS (SELECT fb.q, tok.term, count(*) AS ftf
            |         FROM tok JOIN fb USING (doc_id) GROUP BY fb.q, tok.term),
            |ftot AS (SELECT q, CAST(sum(ftf) AS BIGINT) AS fb_tot
            |         FROM ftok GROUP BY q),
            |lift AS (
            |  SELECT ftok.q, ftok.term, CAST(ftok.ftf AS BIGINT) AS ftf,
            |    CAST(CAST(ftok.ftf AS HUGEINT) * gtot.corpus_tot * 1000000
            |         // (CAST(ftot.fb_tot AS HUGEINT) * ct.ctf) AS BIGINT)
            |      AS lift_ppm
            |  FROM ftok JOIN ftot USING (q) JOIN ct USING (term) CROSS JOIN gtot
            |  WHERE ftok.ftf >= 5 AND ftok.term <> ftok.q),
            |r AS (SELECT q, term, ftf, lift_ppm,
            |        row_number() OVER (PARTITION BY q
            |          ORDER BY lift_ppm DESC, ftf DESC, term) AS rn FROM lift)
            |SELECT q, rn, term, ftf, lift_ppm FROM r WHERE rn <= 3
            |ORDER BY q, rn""".stripMargin),
    (s, dir) => {
      // pass 1: the per-term top-10 feedback doc ids — a 30-row
      // side-input, memoized per (session, dir, generation) like its
      // corpus-totals sibling ctfFrame (r11 verdict #4: un-memoized,
      // every invocation re-ran the corpus-wide tokenize+rank). The
      // ranking itself now derives from the SHARED checkpointed scored
      // frame (bm25TermDoc — identical m arithmetic), so even a cold
      // memo miss re-ranks a standing frame instead of re-scanning the
      // corpus. The memoized value is 30 plain tuples — no session
      // reference, so it weak-clears on its own.
      val fbPairs = rm1FbCache.getOrElseUpdate(s, dir) {
        val w = Window.partitionBy("term").orderBy(col("m").desc, col("doc_id"))
        bm25TermDoc(s, dir)
          .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .select(col("term"), col("doc_id"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
      }
      import s.implicits._
      val fb = broadcast(fbPairs.toSeq.toDF("q", "doc_id"))
      val fbIds = fbPairs.map(_._2).distinct.toSeq
      // pass 2: corpus vocabulary from the checkpointed frame; feedback
      // tokens from an isin-literal-filtered map-side tokenize
      val ct = ctfFrame(s, dir)
      val gtot = ct.agg(sum("ctf").cast("long").as("corpus_tot"))
      val ftok = Tables.table(s, dir, "documents")
        .filter(col("doc_id").isin(fbIds: _*))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .join(fb, "doc_id")
        .groupBy("q", "term").agg(count(lit(1)).as("ftf"))
      val ftot = ftok.groupBy("q").agg(sum("ftf").cast("long").as("fb_tot"))
      val w = Window.partitionBy("q")
        .orderBy(col("lift_ppm").desc, col("ftf").desc, col("term"))
      ftok.filter(col("ftf") >= 5).filter(col("term") =!= col("q"))
        .join(broadcast(ftot), "q").join(ct, "term").crossJoin(broadcast(gtot))
        .withColumn("lift_ppm",
          expr("CAST(CAST(ftf AS DECIMAL(38,0)) * corpus_tot * 1000000 div " +
            "(CAST(fb_tot AS DECIMAL(38,0)) * ctf) AS BIGINT)"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q"), col("rn"), col("term"), col("ftf"), col("lift_ppm"))
        .orderBy("q", "rn")
    })

  override val defs: Seq[QueryDef] =
    Seq(bm25, postings, hybrid, phrase, docTopTerms, qlDirichlet, retrievalEval,
      retrievalNdcg, rm1Expansion)
}
