package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}

/** Corpus-operations layer: the recurring jobs a production training-data
  * pipeline runs BETWEEN full rebuilds — incremental deduplication of an
  * incoming crawl batch against the standing corpus, unigram-LM surprisal
  * scoring (the CCNet-style quality signal), retrieval chunking, and
  * deterministic source-mixture sampling. These extend the one-shot stage
  * operators in [[TextQueries]]; each is designed for the 100 TB case
  * first and its plan shape is locked in PlanSpec.
  */
object CorpusOpsQueries extends QuerySet {

  // ---- incremental dedup (incoming batch vs existing corpus) -----------
  // Continuous-crawl pipelines never re-dedup the full corpus per batch:
  // the standing corpus's MinHash band index is a PRECOMPUTED artifact
  // (refreshed like a snapshot cache), and each incoming batch — small
  // relative to the corpus — is banded map-side and hash-joined against
  // that index. Candidates are (incoming, existing) pairs sharing a band
  // bucket; exact Jaccard on the shingle sets verifies. The corpus is
  // never self-joined and the incoming batch never all-pairs anything:
  // the only corpus-sized shuffle carries (band, bandhash, id) triples.
  // Here the "incoming batch" is the deterministic doc_id%5==4 slice so
  // both engines carve identically; a real deployment reads the batch
  // from its own table and loads the index from the snapshot store.
  // Same 72-hash / 24-band / 3-row geometry as TextQueries.neardup
  // (P[miss] ≈ 4e-5 at the J=0.7 report threshold).
  private val incremental = QueryDef(
    "incremental_dedup",
    Some("""WITH sh AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
           |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           |  WHERE len(w) >= 3),
           |i AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 = 4),
           |e AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 <> 4),
           |p AS (
           |  SELECT i.doc_id AS i_id, e.doc_id AS e_id,
           |         len(list_intersect(i.s, e.s)) AS inter,
           |         len(i.s) + len(e.s) - len(list_intersect(i.s, e.s)) AS uni
           |  FROM i, e)
           |SELECT i_id AS incoming_id, count(*) AS n_matches,
           |       min(e_id) AS first_match,
           |       max(round(inter * 1.0::DOUBLE / uni, 6)) AS best_jaccard
           |FROM p WHERE inter * 1.0::DOUBLE / uni >= 0.7
           |GROUP BY i_id ORDER BY incoming_id""".stripMargin),
    (s, dir) => incrementalMatches(s, dir).orderBy("incoming_id"))

  /** Banded-index probe + exact verify, lazy (PlanSpec inspects this
    * stage's shape before the gated entry checkpoints it away).
    * Geometry comes from TextQueries' shared constants — the batch
    * path must probe exactly the full path's bands. */
  private[queries] def incrementalPipeline(sh: org.apache.spark.sql.DataFrame) = {
      val sig = sh.select(col("doc_id"),
        expr(s"minhash_sig(sh, ${TextQueries.NumHashes})").as("sig"))
      val r = TextQueries.RowsPerBand
      val bands = sig.select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, ${TextQueries.NumBands - 1}), " +
          s"b -> xxhash64(sig[$r*b], sig[$r*b+1], sig[$r*b+2]))")))
        .toDF("doc_id", "band", "bh")
      // One groupBy splits each bucket into its incoming/existing sides
      // (collect_set skips the when()'s nulls). The total-membership cap
      // is the full path's [2,1000] guard: a degenerate boilerplate-
      // heavy batch must not turn a bucket into an m×k pair explosion —
      // same discipline, same bound, so batch and full path also agree
      // on WHICH buckets they drop.
      val buckets = bands
        .groupBy("band", "bh")
        .agg(
          collect_set(when(col("doc_id") % 5 === 4, col("doc_id"))).as("in_ids"),
          collect_set(when(col("doc_id") % 5 =!= 4, col("doc_id"))).as("ex_ids"))
        .filter(size(col("in_ids")) >= 1 && size(col("ex_ids")) >= 1 &&
          (size(col("in_ids")) + size(col("ex_ids"))).between(2, 1000))
      val cand = buckets
        .select(explode(col("in_ids")).as("i_id"), col("ex_ids"))
        .select(col("i_id"), explode(col("ex_ids")).as("e_id"))
        .distinct()
      val shI = sh.filter(col("doc_id") % 5 === 4)
        .select(col("doc_id").as("i_id"), col("sh").as("si"))
      val shE = sh.filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("e_id"), col("sh").as("se"))
      cand.join(shI, "i_id").join(shE, "e_id")
        .withColumn("inter", size(array_intersect(col("si"), col("se"))))
        .withColumn("uni", size(col("si")) + size(col("se")) - col("inter"))
        .filter(col("inter") / col("uni") >= 0.7)
        .groupBy("i_id")
        .agg(count(lit(1)).as("n_matches"), min("e_id").as("first_match"),
          max(round(col("inter") / col("uni"), 6)).as("best_jaccard"))
        .select(col("i_id").as("incoming_id"), col("n_matches"),
          col("first_match"), col("best_jaccard"))
  }

  /** Materialized match set, once per (session, dir): the shingle set
    * feeds four consumers (both band branches + both verify sides), so
    * it is persisted for the build and released once the (tiny) match
    * set is checkpointed — the [[TextQueries.neardupPairs]] discipline. */
  private val incCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private def incrementalMatches(s: org.apache.spark.sql.SparkSession, dir: String) =
    incCache.getOrElseUpdate(s, dir) {
      val sh = TextQueries.shingles(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try incrementalPipeline(sh).localCheckpoint(true)
      finally sh.unpersist(false)
    }

  /** Matches of an arbitrary incoming shingle frame against a standing
    * corpus via its precomputed band index — the generalized form the
    * STREAMING face runs per micro-batch
    * ([[graft.streaming.Streaming.incrementalDedupStream]]): probe is
    * a hash join on (band, bh), the bucket cap is the SAME combined
    * [2,1000] membership guard as [[incrementalPipeline]] (so both
    * faces drop the same degenerate buckets), exact Jaccard at 0.7
    * verifies, and the summary aggregates per incoming doc. Each
    * incoming doc's full match set lives in whichever batch carries
    * the doc, so unioning per-batch outputs over any batch split of
    * the incoming slice reproduces the batch operator exactly — the
    * parity StreamingSpec locks that. */
  /** Candidate (i_id, e_id) pairs: band the incoming side, hash-join
    * against the standing index on (band, bh), apply the batch path's
    * combined [2,1000] bucket-membership cap. */
  private def candidatePairs(
      incomingSh: org.apache.spark.sql.DataFrame,
      standingBands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val inBuckets = TextQueries.bandIndexOf(incomingSh)
      .groupBy("band", "bh").agg(collect_set("doc_id").as("in_ids"))
    val exBuckets = standingBands
      .groupBy("band", "bh").agg(collect_set("doc_id").as("ex_ids"))
    inBuckets.join(exBuckets, Seq("band", "bh"))
      .filter((size(col("in_ids")) + size(col("ex_ids"))).between(2, 1000))
      .select(explode(col("in_ids")).as("i_id"), col("ex_ids"))
      .select(col("i_id"), explode(col("ex_ids")).as("e_id"))
      .distinct()
  }

  /** Exact-Jaccard verify + per-incoming-doc summary over candidate
    * pairs (the shared tail of both standing-side variants). */
  private def verifyPairs(
      cand: org.apache.spark.sql.DataFrame,
      incomingSh: org.apache.spark.sql.DataFrame,
      standingSh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val shI = incomingSh.select(col("doc_id").as("i_id"), col("sh").as("si"))
    val shE = standingSh.select(col("doc_id").as("e_id"), col("sh").as("se"))
    cand.join(shI, "i_id").join(shE, "e_id")
      .withColumn("inter", size(array_intersect(col("si"), col("se"))))
      .withColumn("uni", size(col("si")) + size(col("se")) - col("inter"))
      .filter(col("inter") / col("uni") >= 0.7)
      .groupBy("i_id")
      .agg(count(lit(1)).as("n_matches"), min("e_id").as("first_match"),
        max(round(col("inter") / col("uni"), 6)).as("best_jaccard"))
      .select(col("i_id").as("incoming_id"), col("n_matches"),
        col("first_match"), col("best_jaccard"))
  }

  private[graft] def matchesVsStanding(
      incomingSh: org.apache.spark.sql.DataFrame,
      standingBands: org.apache.spark.sql.DataFrame,
      standingSh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    verifyPairs(candidatePairs(incomingSh, standingBands),
      incomingSh, standingSh)

  /** [[matchesVsStanding]] verifying against the corpus DOC table
    * instead of a precomputed shingle frame — the continuous-ingestion
    * shape ([[graft.streaming.Streaming.corpusIngestStream]]): the
    * candidate existing ids (tiny — bounded by batch × bucket cap) are
    * broadcast-semi-joined into the corpus scan, so shingles are
    * recomputed ONLY for candidate docs. The corpus is scanned (PK-
    * prunable when it's a snapshot table with per-dir stats), never
    * shuffled, and never shingled wholesale per batch. */
  private[graft] def matchesVsCorpus(
      incomingSh: org.apache.spark.sql.DataFrame,
      standingBands: org.apache.spark.sql.DataFrame,
      corpusDocs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cand = candidatePairs(incomingSh, standingBands)
      .localCheckpoint(true) // tiny; reused by the semi-join AND the verify
    val eDocs = corpusDocs.join(
      broadcast(cand.select(col("e_id").as("doc_id")).distinct()), Seq("doc_id"))
    verifyPairs(cand, incomingSh, TextQueries.shingleSetsOf(eDocs))
  }

  // ---- unigram-LM surprisal scoring ------------------------------------
  // The CCNet-style quality signal: score each document by its mean
  // negative log-probability under a unigram LM trained on the corpus
  // itself (high surprisal = rare-token soup, low = repetitive filler).
  // Scale shape mirrors tfidf_top_terms: the token explode is map-side;
  // per-(doc,term) tf shuffles WITH map-side combine; the vocabulary agg
  // is VOCABULARY-sized (tiny vs corpus) so its join back onto tf
  // broadcasts; the corpus-wide token total is a 1-row scalar. The
  // corpus body itself is never shuffled — only (doc_id, term, count)
  // partials move.
  //
  // Digest determinism: per-(doc,term) surprisal is rounded to integer
  // micro-units BEFORE the per-doc sum (integer addition is order-
  // independent; a raw double sum is not), and the per-doc mean divides
  // the two exact integers at the end — the tfidf/corpus_prep discipline.
  // DuckDB's sum(BIGINT) widens to HUGEINT, so the oracle pins BIGINT.
  private val surprisalBody =
    """SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |       CAST(sum(u6) AS BIGINT) AS nll_u6
      |FROM s GROUP BY doc_id""".stripMargin

  /** Shared per-doc surprisal prelude ending in `d(doc_id, n_tokens,
    * nll_u6)` — the buckets query reuses it verbatim so both entries
    * gate the same integers (duck/spark differ only in the unnest
    * spelling). */
  private val duckSurprisalPrelude =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
       |v AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
       |n AS (SELECT count(*) AS total FROM tok),
       |s AS (
       |  SELECT tf.doc_id, tf.tf,
       |         CAST(round(tf.tf * ln(CAST(n.total AS DOUBLE) / v.c) * 1000000, 0) AS BIGINT) AS u6
       |  FROM tf JOIN v USING (term) CROSS JOIN n),
       |d AS ($surprisalBody)""".stripMargin

  /** Materialized (doc_id, term, tf) frame, once per (session, dir) —
    * the canonical tfidf-discipline intermediate. Spark inlines CTEs, so
    * the old SQL spelling re-tokenized the corpus once per consumer
    * (tf/v/n → 3 FileScans in unigram_surprisal, 6 in the buckets
    * query); here the corpus is scanned ONCE into the partial-agg
    * combined frame and v (vocabulary counts), n (grand total) and the
    * bigram LM's unigram side all derive from it. SessionMemo so warm
    * serving reuses the standing RDD; on a real cluster this checkpoint
    * would target reliable storage (the [[TextQueries.neardupPairs]]
    * note) — the dataflow is the same. */
  private val tfCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private[queries] def docTermTf(s: org.apache.spark.sql.SparkSession,
                                 dir: String) =
    tfCache.getOrElseUpdate(s, dir) {
      Tables.sql(s, dir,
        """SELECT doc_id, term, count(*) AS tf
          |FROM documents LATERAL VIEW explode(split(text, ' ')) t AS term
          |GROUP BY doc_id, term""".stripMargin)
        .localCheckpoint(true)
    }

  /** d(doc_id, n_tokens, nll_u6) derived from the single materialized tf
    * frame — zero corpus FileScans downstream (PlanSpec locks the scan
    * budget). Arithmetic is parenthesized identically to the oracle:
    * (tf · ln(total/c)) · 1e6, rounded to integer micro-units. */
  private def surprisalPerDoc(s: org.apache.spark.sql.SparkSession,
                              dir: String) = {
    val tf = docTermTf(s, dir)
    val v = tf.groupBy("term").agg(sum("tf").as("c"))
    val n = v.agg(sum("c").as("total"))
    tf.join(v, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tf"),
        round(col("tf") * log(col("total").cast("double") / col("c")) *
          lit(1000000), 0).cast("long").as("u6"))
      .groupBy("doc_id")
      .agg(sum("tf").cast("long").as("n_tokens"),
        sum("u6").cast("long").as("nll_u6"))
  }

  private val surprisal = QueryDef(
    "unigram_surprisal",
    Some(s"""$duckSurprisalPrelude
            |SELECT doc_id, n_tokens, nll_u6,
            |       round(nll_u6 / 1000000.0::DOUBLE / n_tokens, 6) AS mean_nll
            |FROM d ORDER BY doc_id""".stripMargin),
    (s, dir) => surprisalPerDoc(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("nll_u6"),
        round(col("nll_u6") / lit(1000000.0) / col("n_tokens"), 6)
          .as("mean_nll"))
      .orderBy("doc_id"))

  // ---- CCNet-style perplexity buckets -----------------------------------
  // CCNet's signature move: cut the corpus into head/middle/tail by
  // per-doc LM score terciles (head = most fluent) and weight the
  // training mixture by bucket. Scale shape: the thresholds are a
  // 2-value GLOBAL aggregate over per-doc means (exact interpolated
  // percentile here for cross-engine parity — the a7/a7b split applies:
  // at 1e9 docs swap in the approx_percentile sketch twin, the
  // assignment below is unchanged), broadcast back as a 1-row cross
  // join, and bucket assignment is a pure map-side compare — NOT a
  // corpus-wide ntile, which would funnel every doc through one window
  // reducer. percentile() ≡ quantile_cont (both linear-interpolate;
  // proven by a7), and both engines derive mean_nll from the same
  // integers, so the double compares agree exactly.
  private val surprisalBuckets = QueryDef(
    "surprisal_buckets",
    Some(s"""$duckSurprisalPrelude,
            |m AS (
            |  SELECT doc_id, n_tokens,
            |         CAST(nll_u6 AS DOUBLE) / 1000000.0 / n_tokens AS mean_nll
            |  FROM d),
            |t AS (
            |  SELECT quantile_cont(mean_nll, 1.0/3) AS t1,
            |         quantile_cont(mean_nll, 2.0/3) AS t2 FROM m)
            |SELECT doc_id, n_tokens,
            |       CASE WHEN mean_nll <= t1 THEN 'head'
            |            WHEN mean_nll <= t2 THEN 'middle'
            |            ELSE 'tail' END AS bucket
            |FROM m CROSS JOIN t ORDER BY doc_id""".stripMargin),
    (s, dir) => {
      // r15: m used to derive TWICE from the checkpointed tf frame
      // (thresholds + assignment; each derivation = the broadcast join
      // + the per-doc agg exchange), and the declared sort's sampler
      // re-ran the second one's reduce on top. m is one narrow row per
      // document (doc_id, n_tokens, mean_nll — the thresholds must see
      // every row anyway), so materialize it once; thresholds,
      // assignment and the sort all read the same standing rows.
      val m = surprisalPerDoc(s, dir)
        .select(col("doc_id"), col("n_tokens"),
          (col("nll_u6").cast("double") / lit(1000000.0) / col("n_tokens"))
            .as("mean_nll"))
        .localCheckpoint()
      val t = m.agg(
        expr("percentile(mean_nll, 1.0D/3)").as("t1"),
        expr("percentile(mean_nll, 2.0D/3)").as("t2"))
      m.crossJoin(broadcast(t))
        .select(col("doc_id"), col("n_tokens"),
          when(col("mean_nll") <= col("t1"), "head")
            .when(col("mean_nll") <= col("t2"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    })

  // ---- retrieval chunking ----------------------------------------------
  // RAG/embedding pipelines split documents into overlapping fixed-size
  // chunks (window 200 chars, stride 150 → 50-char overlap). Pure
  // map-side: sequence → explode → substring → md5, zero data exchanges
  // at any scale (the only exchange in the plan is the presentation
  // sort's range partitioning). The chunk digest is its md5 so the gate
  // depends on exact chunk bytes without hauling them twice; a real
  // pipeline would keep the chunk text and feed the embedder.
  private val ChunkLen = 200
  private val ChunkStride = 150
  private val chunks = QueryDef(
    "doc_chunks",
    Some(s"""WITH st AS (
            |  SELECT doc_id, text, unnest(range(1, len(text) + 1, $ChunkStride)) AS st
            |  FROM documents WHERE len(text) > 0)
            |SELECT doc_id, CAST((st - 1) // $ChunkStride AS BIGINT) AS chunk_id,
            |       CAST(st AS BIGINT) AS chunk_start,
            |       CAST(len(substr(text, CAST(st AS INT), $ChunkLen)) AS BIGINT) AS chunk_len,
            |       md5(substr(text, CAST(st AS INT), $ChunkLen)) AS chunk_md5
            |FROM st ORDER BY doc_id, chunk_id""".stripMargin),
    // r15 (the cdc_chunks fix applied here too): the declared ORDER BY
    // moves BELOW the chunk kernel (SortedBy on doc_id over the raw
    // rows) — the trailing orderBy's range sampler used to re-run the
    // explode + substring + md5 a second time. Ordering is preserved
    // with no post-kernel sort: docs arrive range-ordered by doc_id and
    // the ascending sequence explode emits chunk_id in order per doc.
    (s, dir) =>
      graft.operators.SortedBy(
        Tables.table(s, dir, "documents")
          // empty docs chunk to nothing on both engines — and Spark's
          // sequence(1, 0, step) THROWS rather than returning [], so
          // the filter is load-bearing, not cosmetic
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text")),
        col("doc_id"))
        .select(col("doc_id"),
          explode(expr(s"sequence(1, length(text), $ChunkStride)")).as("st"),
          col("text"))
        .select(col("doc_id"),
          expr(s"CAST((st - 1) div $ChunkStride AS BIGINT)").as("chunk_id"),
          col("st").cast("long").as("chunk_start"),
          expr(s"substring(text, st, $ChunkLen)").as("chunk"))
        .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
          length(col("chunk")).cast("long").as("chunk_len"),
          md5(col("chunk")).as("chunk_md5")))

  // ---- deterministic source-mixture sampling ---------------------------
  // Training mixtures downsample sources to target weights (web 25%,
  // curated 100%, ...). Sampling must be DETERMINISTIC and seed-stable
  // across engines and reruns — rand() is neither — so the keep decision
  // is a pure function of the row: the first 8 hex chars of
  // md5(doc_id) compared lexically against the rate's hex threshold
  // (floor(rate·16^8) zero-padded; both engines emit lowercase hex, and
  // ASCII compare on same-length lowercase hex IS numeric compare; the
  // rate-1.0 sentinel 'g' sorts above every hex digit). Map-side filter
  // + one partial-combined agg on the low-cardinality source key: no
  // corpus shuffle at any scale. Rates here cycle 0.25/0.5/0.75/1.0 by
  // source index so every branch is exercised; the kept-id sum is the
  // exact-survivor-set digest.
  private val mixThreshold =
    """CASE CAST(substr(source, 4, 10) AS INT) % 4
      |    WHEN 0 THEN '40000000' WHEN 1 THEN '80000000'
      |    WHEN 2 THEN 'c0000000' ELSE 'g' END""".stripMargin

  private val sourceMix = QueryDef(
    "source_mix_sample",
    Some(s"""WITH k AS (
            |  SELECT source, doc_id,
            |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < $mixThreshold AS keep
            |  FROM documents)
            |SELECT source, count(*) AS n_total,
            |       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
            |       CAST(sum(CASE WHEN keep THEN doc_id END) AS BIGINT) AS kept_id_sum,
            |       round(count(*) FILTER (WHERE keep) * 1.0::DOUBLE / count(*), 6) AS achieved_rate
            |FROM k GROUP BY source ORDER BY source""".stripMargin),
    (s, dir) => Tables.sql(s, dir,
      s"""WITH k AS (
         |  SELECT source, doc_id,
         |         substring(md5(CAST(doc_id AS STRING)), 1, 8) < $mixThreshold AS keep
         |  FROM documents)
         |SELECT source, count(*) AS n_total,
         |       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN keep THEN doc_id END) AS BIGINT) AS kept_id_sum,
         |       round(count(*) FILTER (WHERE keep) * 1.0D / count(*), 6) AS achieved_rate
         |FROM k GROUP BY source ORDER BY source""".stripMargin))

  // ---- leakage-safe train/val/test split --------------------------------
  // The eval-hygiene step every training pipeline needs: hash-assigned
  // 80/10/10 splits where all members of a near-dup cluster land in the
  // SAME split — a naive per-doc hash split leaks near-duplicates of
  // training docs into the eval set. The split key is the doc's cluster
  // label (min doc_id of its component) when it has near-dups, its own
  // id otherwise, so the assignment is a pure function of content
  // relationships — deterministic, engine-portable (md5-hex threshold,
  // the source_mix discipline), and stable under re-runs.
  //
  // 100 TB shape: the label set is the (tiny) clustered-doc set, so the
  // corpus-side join is a broadcast left join; the hash CASE is
  // map-side; the final agg groups on 3 splits AFTER the per-split
  // partials combine. Reuses the memoized verified pair set the other
  // near-dup entries build.
  private val splitCase =
    """CASE WHEN substr(md5(CAST(ck AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
      |     WHEN substr(md5(CAST(ck AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
      |     ELSE 'test' END""".stripMargin

  private val leakageSafeSplit = QueryDef(
    "leakage_safe_split",
    Some(TextQueries.neardupPairsSql.replaceFirst("WITH sh", "WITH RECURSIVE sh") + s""",
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION ALL SELECT id_b, id_a FROM pairs),
      |reach AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      |labels AS (
      |  SELECT a AS doc_id, least(a, min(b)) AS label FROM reach GROUP BY a),
      |k AS (
      |  SELECT d.doc_id, coalesce(l.label, d.doc_id) AS ck
      |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
      |s AS (SELECT doc_id, ck, $splitCase AS split FROM k)
      |SELECT split, count(*) AS n_docs,
      |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       CAST(count(DISTINCT ck) AS BIGINT) AS n_groups
      |FROM s GROUP BY split ORDER BY split""".stripMargin),
    (s, dir) => {
      val labels = graft.operators.ConnectedComponents.labels(
        TextQueries.neardupPairs(s, dir).select(col("id_a"), col("id_b")))
        .select(col("id").as("doc_id"), col("label"))
      Tables.table(s, dir, "documents")
        .join(broadcast(labels), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("ck"))
        .withColumn("split", expr(
          splitCase.replace("AS VARCHAR", "AS STRING")))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("doc_id").cast("long").as("id_sum"),
          countDistinct("ck").as("n_groups"))
        .orderBy("split")
    })

  // ---- interpolated bigram-LM surprisal ---------------------------------
  // The next rung of the CCNet quality-signal ladder above
  // unigram_surprisal: per-doc total surprisal under an interpolated
  // bigram LM, −ln(0.8·c₁₂/c₁ + 0.2·c₂/N) summed over bigram
  // positions. Float discipline: each distinct bigram TYPE's surprisal
  // is computed once from exact integer counts with identical
  // parenthesization in both engines ((0.8·c₁₂)/c₁ + (0.2·c₂)/N —
  // every operand < 2^53), rounded to integer micro-units, and the
  // per-doc score is Σ tf·s_micro over integer partials — order-
  // independent. Both literals are spelled as explicit doubles
  // (DuckDB's bare 0.8 parses as DECIMAL and its decimal·BIGINT
  // arithmetic would diverge from Spark's double path).
  //
  // 100 TB shape: one (doc, bigram) partial-agg shuffle (tfidf
  // dataflow); the bigram table collapses to ≤ vocabulary² rows and
  // its unigram joins broadcast; scoring joins back per (doc, bigram)
  // with partial-combined per-doc sums. No corpus-wide window, no
  // self-join.
  private def bigramSql(d8: String, d2: String, oneM: String) =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |bg AS (SELECT doc_id, list_transform(range(1, len(w)),
       |         i -> w[i] || ' ' || w[i+1]) AS gs FROM w WHERE len(w) >= 2),
       |btf AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf
       |        FROM (SELECT doc_id, unnest(gs) AS g FROM bg) GROUP BY doc_id, g),
       |bc AS (SELECT g, CAST(sum(tf) AS BIGINT) AS c12 FROM btf GROUP BY g),
       |uc AS (SELECT t, CAST(count(*) AS BIGINT) AS c1
       |       FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
       |       GROUP BY t),
       |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM uc),
       |sc AS (SELECT bc.g,
       |         CAST(round(-ln($d8 * bc.c12 / u1.c1 + $d2 * u2.c1 / n.n) * $oneM) AS BIGINT) AS s
       |       FROM bc
       |       JOIN uc u1 ON u1.t = string_split(bc.g, ' ')[1]
       |       JOIN uc u2 ON u2.t = string_split(bc.g, ' ')[2]
       |       CROSS JOIN n)
       |SELECT btf.doc_id, CAST(sum(btf.tf) AS BIGINT) AS n_bigrams,
       |       CAST(sum(btf.tf * sc.s) AS BIGINT) AS surprisal_micro
       |FROM btf JOIN sc ON sc.g = btf.g
       |GROUP BY btf.doc_id ORDER BY btf.doc_id""".stripMargin

  /** Materialized (doc_id, bigram, tf) frame, once per (session, dir) —
    * the bigram mate of [[docTermTf]], consumed by the LM's count table
    * and the per-doc scoring join (the old CTE spelling re-ran the
    * word_shingles explode per consumer). */
  private val btfCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private[queries] def docBigramTf(s: org.apache.spark.sql.SparkSession,
                                   dir: String) =
    btfCache.getOrElseUpdate(s, dir) {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(expr("word_shingles(text, 2)")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
    }

  private val bigramSurprisal = QueryDef(
    "bigram_surprisal",
    Some(bigramSql("0.8::DOUBLE", "0.2::DOUBLE", "1000000.0::DOUBLE")),
    (s, dir) => {
      // Scan budget 2: the bigram and unigram tokenizations are
      // genuinely distinct map-side passes, each materialized ONCE
      // (btf below; unigram counts derive from the shared docTermTf
      // frame — c1 = Σ tf per term ≡ count over the token stream).
      // The old spelling re-expanded docs per consumer: 5 FileScans.
      val btf = docBigramTf(s, dir)
      val bc = btf.groupBy("g").agg(sum("tf").cast("long").as("c12"))
      val uc = docTermTf(s, dir)
        .groupBy("term").agg(sum("tf").cast("long").as("c1"))
        .withColumnRenamed("term", "t")
      val n = uc.agg(sum("c1").cast("long").as("n"))
      val sc = bc
        .withColumn("w1", split(col("g"), " ").getItem(0))
        .withColumn("w2", split(col("g"), " ").getItem(1))
        .join(broadcast(uc.select(col("t").as("w1"), col("c1").as("c1a"))), "w1")
        .join(broadcast(uc.select(col("t").as("w2"), col("c1").as("c1b"))), "w2")
        .crossJoin(broadcast(n))
        // identical parenthesization to the oracle: (0.8·c12)/c1 + (0.2·c2)/N
        .select(col("g"), expr(
          "CAST(round(-ln(0.8D * c12 / c1a + 0.2D * c1b / n) * 1000000.0D) AS BIGINT)")
          .as("s"))
      btf.join(sc, "g")
        .groupBy("doc_id")
        .agg(sum("tf").cast("long").as("n_bigrams"),
          sum(col("tf") * col("s")).cast("long").as("surprisal_micro"))
        .orderBy("doc_id")
    })

  // ---- content-defined chunking (CDC) -----------------------------------
  // The dedup-friendly complement of doc_chunks' fixed windows: chunk
  // boundaries are a pure function of LOCAL CONTENT (a boundary sits
  // wherever the 4-char window's hash ≡ 0 mod 64, expected chunk
  // ≈ 64 chars) — so inserting a prefix re-synchronizes after the
  // first boundary and downstream chunks keep their digests, which is
  // what makes chunk-level dedup survive edits (the rsync/LBFS
  // principle; PipelineOpsSpec proves the resynchronization). Entirely
  // map-side: boundary scan (native cdc_bounds expression — one
  // compiled pass), bounds assembly, substring, md5 — zero exchanges
  // at any scale (the doc_chunks discipline). The oracle states the
  // identical rule in SQL; its range(2, x) EXCLUDES x (a Spark
  // sequence() spelling would need x−1 and a length guard because
  // sequence descends, not empties, on an inverted range — the trap
  // the native kernel sidesteps).
  private val cdcChunks = QueryDef(
    "cdc_chunks",
    Some("""WITH d AS (SELECT doc_id, text, len(text) AS L FROM documents),
           |b AS (SELECT doc_id, text,
           |        list_concat(list_concat([1],
           |          list_filter(range(2, CAST(L AS INT) - 2),
           |            i -> ('0x' || substr(md5(substr(text, CAST(i AS INT), 4)), 1, 8))::BIGINT % 64 = 0)),
           |          [CAST(L AS INT) + 1]) AS bounds
           |      FROM d),
           |c AS (SELECT doc_id, j AS chunk_idx, bounds[j] AS start_pos,
           |        bounds[j+1] - bounds[j] AS chunk_len,
           |        md5(substr(text, CAST(bounds[j] AS INT),
           |                   CAST(bounds[j+1] - bounds[j] AS INT))) AS chunk_md5
           |      FROM b, unnest(range(1, len(bounds))) AS t(j))
           |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           |       CAST(start_pos AS BIGINT) AS start_pos,
           |       CAST(chunk_len AS BIGINT) AS chunk_len, chunk_md5
           |FROM c ORDER BY doc_id, chunk_idx""".stripMargin),
    // r15: the declared ORDER BY (doc_id, chunk_idx) moves BELOW the
    // kernel (SortedBy on doc_id over the raw (doc_id, text) rows) —
    // the trailing orderBy's range sampler used to re-run cdc_bounds +
    // every per-chunk md5 a second time. Ordering is preserved without
    // any post-kernel sort: the range exchange orders docs globally by
    // doc_id, and Generate emits each doc's chunk_idx ascending in
    // row order, so the output IS (doc_id, chunk_idx)-ordered.
    (s, dir) => graft.operators.SortedBy(
        Tables.table(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"), col("text"),
        // native cdc_bounds expression (graft.functions): one compiled
        // boundary scan per row — the HOF spelling
        // filter(sequence(2, L-3), i -> md5-prefix % 64 = 0) computes
        // the identical array but pays an interpreted lambda dispatch
        // PER POSITION (measured 5.7 s warm at sf0.1 vs sub-second
        // compiled; the winnow_digest lesson repeated)
        expr("cdc_bounds(text)").as("bounds"))
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(1, size(bounds) - 1)")).as("chunk_idx"),
        col("bounds"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr("CAST(element_at(bounds, chunk_idx) AS BIGINT)").as("start_pos"),
        expr("CAST(element_at(bounds, chunk_idx + 1) - element_at(bounds, chunk_idx) AS BIGINT)")
          .as("chunk_len"),
        expr("""md5(substr(text, element_at(bounds, chunk_idx),
               |    element_at(bounds, chunk_idx + 1) - element_at(bounds, chunk_idx)))""".stripMargin)
          .as("chunk_md5")))

  // ---- temperature-scaled language mixture ------------------------------
  // The multilingual rebalancing step (mT5/XLM-R style): sampling
  // weights ∝ n^(1/τ) with temperature τ=2 upweight tail languages and
  // downweight the head relative to natural frequency. τ=2 means
  // w = √n — deliberately: sqrt is IEEE-correctly-rounded in BOTH
  // engines (hardware op), so unlike pow(n, 1/τ) for general τ there
  // is no last-ulp libm divergence risk before the integer rounding.
  // Each per-language weight rounds to an integer micro-unit FIRST and
  // only the integer partials sum (order-independent); the ppm shares
  // divide exactly-representable integers.
  //
  // 100 TB shape: one partial-combined count on the low-cardinality
  // lang key — the corpus never shuffles — then constant-size (|langs|
  // rows) weight arithmetic against a broadcast 1-row total.
  private def temperatureSql(oneM: String, budget: String) =
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
       |           FROM documents GROUP BY lang),
       |w AS (SELECT lang, n_docs,
       |             CAST(round(sqrt(n_docs) * $oneM) AS BIGINT) AS w_micro
       |      FROM c),
       |t AS (SELECT CAST(sum(w_micro) AS BIGINT) AS tot,
       |             CAST(sum(n_docs) AS BIGINT) AS n_tot FROM w)
       |SELECT lang, n_docs, w_micro,
       |       CAST(round(w_micro * $oneM / t.tot) AS BIGINT) AS weight_ppm,
       |       CAST(round(w_micro * $budget / t.tot) AS BIGINT) AS target_docs,
       |       CAST(round(n_docs * $oneM / t.n_tot) AS BIGINT) AS natural_ppm
       |FROM w CROSS JOIN t ORDER BY lang""".stripMargin

  private val temperatureMix = QueryDef(
    "lang_temperature_mix",
    Some(temperatureSql("1000000.0::DOUBLE", "1000.0::DOUBLE")),
    (s, dir) => Tables.sql(s, dir, temperatureSql("1000000.0D", "1000.0D")))

  // ---- DSIR-style hashed importance weighting ---------------------------
  // Data Selection via Importance Resampling (Xie et al. 2023): score
  // every raw document by how target-like its hashed n-gram feature
  // distribution is, log w(x) = Σ_features ln(p_target(f)/p_raw(f))
  // with Laplace smoothing. Target here = the src0 slice (stand-in for
  // the curated corpus), features = unigrams hashed into 128 buckets
  // via the engine-portable md5-prefix hash.
  //
  // Float discipline: the per-bucket log-ratio is ONE ln of a ratio of
  // exactly-representable integer products ((ct+1)(Tr+B) vs
  // (cr+1)(Tt+B), all < 2^53), rounded to an integer micro-unit per
  // BUCKET; a document's score is Σ tf·w_micro over its buckets — an
  // integer sum of integer products, order-independent, so partial
  // aggregation can combine in any order and both engines emit the
  // identical BIGINT.
  //
  // 100 TB shape: token explode → map-side bucket hash → one
  // (doc, bucket) partial-combined tf agg (the only corpus-sized
  // shuffle, fixed-width keys); bucket stats collapse 128 rows; the
  // 1-row totals and the 128-row weight table broadcast back; the
  // final per-doc sum combines partially on doc_id. Nothing
  // corpus-sized is ever broadcast, sorted, or self-joined.
  private val dsir = QueryDef(
    "dsir_importance",
    Some("""WITH tok AS (
           |  SELECT doc_id, source = 'src0' AS tgt,
           |         unnest(string_split(text, ' ')) AS t FROM documents),
           |tf AS (
           |  SELECT doc_id, tgt, ('0x' || substr(md5(t), 1, 8))::BIGINT % 128 AS b,
           |         CAST(count(*) AS BIGINT) AS tf
           |  FROM tok GROUP BY doc_id, tgt, b),
           |bs AS (
           |  SELECT b, CAST(sum(CASE WHEN tgt THEN tf ELSE 0 END) AS BIGINT) AS ct,
           |         CAST(sum(CASE WHEN NOT tgt THEN tf ELSE 0 END) AS BIGINT) AS cr
           |  FROM tf GROUP BY b),
           |tt AS (SELECT CAST(sum(ct) AS BIGINT) AS t_t,
           |              CAST(sum(cr) AS BIGINT) AS t_r FROM bs),
           |wt AS (
           |  SELECT b, CAST(round(ln(CAST((ct + 1) * (t_r + 128) AS DOUBLE) /
           |                          CAST((cr + 1) * (t_t + 128) AS DOUBLE))
           |                   * 1000000.0) AS BIGINT) AS w
           |  FROM bs CROSS JOIN tt)
           |SELECT tf.doc_id, bool_or(tf.tgt) AS is_target,
           |       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           |       CAST(sum(tf.tf * wt.w) AS BIGINT) AS logw_micro
           |FROM tf JOIN wt USING (b)
           |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin),
    (s, dir) => {
      // the per-doc hashed tf vector is ONE compiled pass
      // (functions/TextDigests.BucketCounts) — the explode below emits
      // ≤128 already-aggregated rows per document instead of every
      // token occurrence, and no (doc, bucket) pre-exchange exists at
      // all ((doc_id, b) is unique by construction)
      val tf = Tables.table(s, dir, "documents")
        .select(col("doc_id"), (col("source") === "src0").as("tgt"),
          expr("bucket_counts(split(text, ' '), 128)").as("bc"))
        .select(col("doc_id"), col("tgt"), posexplode(col("bc")).as(Seq("b", "tf")))
        .filter(col("tf") > 0)
        .select(col("doc_id"), col("tgt"), col("b").cast("long").as("b"), col("tf"))
      val bs = tf.groupBy("b")
        .agg(sum(when(col("tgt"), col("tf")).otherwise(0L)).as("ct"),
          sum(when(!col("tgt"), col("tf")).otherwise(0L)).as("cr"))
      val tt = bs.agg(sum("ct").as("t_t"), sum("cr").as("t_r"))
      val wt = bs.crossJoin(broadcast(tt))
        .select(col("b"),
          expr("""CAST(round(ln(CAST((ct + 1) * (t_r + 128) AS DOUBLE) /
                 |             CAST((cr + 1) * (t_t + 128) AS DOUBLE))
                 |      * 1000000.0D) AS BIGINT)""".stripMargin).as("w"))
      tf.join(broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(bool_or(col("tgt")).as("is_target"),
          sum("tf").cast("long").as("n_tokens"),
          sum(col("tf") * col("w")).cast("long").as("logw_micro"))
        .orderBy("doc_id")
    })

  // ---- corpus-wide duplicate-segment removal (boilerplate strip) --------
  // The RefinedWeb/CCNet line-dedup stage: segments that repeat across
  // the corpus (headers, footers, navigation chrome) are REMOVED from
  // every document — not whole-document dedup (TextQueries) and not
  // just measurement (dup_span_stats): the output is the cleaned text
  // itself. Segments here are consecutive 3-word windows (the synthetic
  // corpus has no newlines; a real crawl would segment on '\n' with the
  // identical dataflow), and a segment is boilerplate when it occurs
  // ≥ 4 times corpus-wide.
  //
  // 100 TB shape, stage by stage: segmentation is PURE MAP-SIDE array
  // arithmetic (one transform over the pre-split words, no explode-
  // regroup round trip to build segments); the corpus-frequency count
  // shuffles ONLY (digest, count) partials — the md5 digest replaces
  // raw segment text on the wire (the dup_span_stats discipline);
  // the boilerplate set — bounded above by n_segments/threshold and in
  // practice ~0.1% of segment types — broadcasts back, so marking is a
  // map-side hash probe; one groupBy(doc_id) rebuilds each document
  // from its kept segments (sort_array on (seg_id, seg) structs —
  // per-doc arrays, never a corpus sort). The rebuilt text leaves the
  // operator as md5 + length, so the gated output is constant-width
  // per doc no matter how large documents get. If a degenerate corpus
  // ever made the boilerplate set exceed broadcast size, the same plan
  // with the hint dropped degrades to a shuffled hash join — still
  // linear, never quadratic.
  private val SegWords = 3
  private val SegDupThreshold = 4

  /** The full per-doc digest pipeline up to (but excluding) the
    * declared ORDER BY — exposed so PlanSpec can lock the combine/
    * broadcast shape that the served plan's checkpoint hides. */
  private[queries] def segmentDigest(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      val segs = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          s"""transform(sequence(1, cast(ceil(size(ws) / ${SegWords}.0D) as int)),
             |  i -> concat_ws(' ', slice(ws, (i - 1) * $SegWords + 1, $SegWords)))"""
            .stripMargin)).as(Seq("pos", "seg")))
        .select(col("doc_id"), (col("pos") + 1).as("seg_id"), col("seg"),
          md5(col("seg")).as("h"))
      val boiler = segs.groupBy("h").agg(count(lit(1)).as("n"))
        .filter(col("n") >= SegDupThreshold)
        .select(col("h").as("dup_h"))
      segs.join(broadcast(boiler), segs("h") === boiler("dup_h"), "left")
        .withColumn("dup", col("dup_h").isNotNull)
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_segments"),
          sum(when(col("dup"), 1).otherwise(0)).cast("long").as("n_removed"),
          concat_ws(" ", expr(
            "transform(filter(array_sort(collect_list(struct(seg_id, dup, seg))), x -> NOT x.dup), x -> x.seg)"))
            .as("clean"))
        .select(col("doc_id"), col("n_segments"), col("n_removed"),
          length(col("clean")).cast("long").as("clean_n_chars"),
          md5(col("clean")).as("clean_md5"))
  }

  private val segmentDedup = QueryDef(
    "segment_dedup_clean",
    Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            |seg AS (
            |  SELECT doc_id, i AS seg_id,
            |         array_to_string(list_slice(ws, (i - 1) * $SegWords + 1,
            |                                    (i - 1) * $SegWords + $SegWords), ' ') AS seg
            |  FROM w, LATERAL unnest(range(1,
            |         CAST(ceil(len(ws) / ${SegWords}.0) AS BIGINT) + 1)) t(i)),
            |c AS (SELECT md5(seg) AS h FROM seg GROUP BY md5(seg)
            |      HAVING count(*) >= $SegDupThreshold),
            |m AS (
            |  SELECT s.doc_id, s.seg_id, s.seg, (c.h IS NOT NULL) AS dup
            |  FROM seg s LEFT JOIN c ON c.h = md5(s.seg)),
            |g AS (
            |  SELECT doc_id,
            |         CAST(count(*) AS BIGINT) AS n_segments,
            |         CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
            |         coalesce(string_agg(CASE WHEN dup THEN NULL ELSE seg END,
            |                             ' ' ORDER BY seg_id), '') AS clean
            |  FROM m GROUP BY doc_id)
            |SELECT doc_id, n_segments, n_removed,
            |       CAST(length(clean) AS BIGINT) AS clean_n_chars,
            |       md5(clean) AS clean_md5
            |FROM g ORDER BY doc_id""".stripMargin),
    // r15, measured and kept AS-IS: a localCheckpoint of the per-doc
    // digest frame before the declared sort (to stop the sort's
    // sampler re-running the rebuild reduce) benchmarked flat-to-worse
    // (interleaved A/B, sf0.1/32c: 1.02–1.07 s without vs 1.07–1.22 s
    // with) — the sampler only re-executes the post-exchange reduce,
    // and the eager materialization costs more than that bounded
    // re-run. The dominant cost is the segment explode + per-doc
    // collect_list exchange, which is the operator's honest floor.
    (s, dir) => segmentDigest(s, dir).orderBy("doc_id"))

  // ---- per-source document cap (domain capping) --------------------------
  // The Common-Crawl-style domain cap: no source may contribute more
  // than K documents, and WHICH K must be unbiased and deterministic —
  // so the keep order is the md5 of the doc id (the source_mix hashing
  // discipline: seed-stable across engines and reruns, uncorrelated
  // with content), not arrival order or length. The output is the
  // KEPT set only — the rank filter is what lets Catalyst prune.
  //
  // 100 TB shape: one window partitioned by the source key, ranked by
  // the hash — the rank ≤ K FILTER rides Catalyst's WindowGroupLimit,
  // so every input partition prunes to its own top-K per source
  // BEFORE the exchange and the shuffle carries at most
  // K·|sources|·partitions rows, not the corpus (plan-locked). A
  // skewed giant source costs its one partition only the K-row heap,
  // never a full sort spill.
  private val SourceCap = 15

  private def capSql(h32: String) =
    s"""WITH k AS (
       |  SELECT doc_id, source, $h32 AS h FROM documents),
       |r AS (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
       |  FROM k)
       |SELECT doc_id, source, CAST(rk AS BIGINT) AS rank
       |FROM r WHERE rk <= $SourceCap ORDER BY doc_id""".stripMargin

  private val sourceCap = QueryDef(
    "source_cap_sample",
    Some(capSql("md5(CAST(doc_id AS VARCHAR))")),
    (s, dir) => Tables.sql(s, dir, capSql("md5(CAST(doc_id AS STRING))")))

  // ---- feature-hashing vectorizer ---------------------------------------
  // The hashing trick (Weinberger et al. 2009): vectorize text into a
  // FIXED-width signed-count vector with no vocabulary pass — bucket =
  // hash(token) mod D, sign = an independent hash bit (the sign makes
  // collision noise zero-mean, which is what lets D stay small). This
  // is how fastText-style quality classifiers featurize a crawl before
  // scoring it, and it pairs with quality_classifier_score: that entry
  // assumes a trained weight vector; this one builds the features a
  // trainer would consume. D = 16 here so the gate can check every
  // lane; production would use 2^18+ with the identical dataflow.
  //
  // 100 TB shape: bucket and sign are map-side md5 arithmetic on the
  // exploded tokens; the only corpus-sized shuffle carries (doc_id,
  // bucket, partial-sum) rows — ≤D per doc survive the map-side
  // combine. The dense 16-lane assembly is a per-doc transform over the
  // ≤16 collected (bucket, weight) pairs (no spine join, no second
  // corpus scan); absent lanes zero-fill via null-safe element lookup.
  private val featureHash = QueryDef(
    "feature_hash_vectorizer",
    Some("""WITH tok AS (
           |  SELECT doc_id, t FROM (
           |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
           |  WHERE t <> ''),
           |hx AS (
           |  SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok),
           |h AS (
           |  SELECT doc_id, h % 16 AS bucket,
           |         CASE WHEN (h // 16) % 2 = 1 THEN 1 ELSE -1 END AS sgn
           |  FROM hx),
           |g AS (
           |  SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS wt
           |  FROM h GROUP BY doc_id, bucket),
           |d AS (
           |  SELECT doc_id,
           |         list_sort(list(struct_pack(b := bucket, w := wt))) AS pairs,
           |         CAST(sum(wt * wt) AS BIGINT) AS l2sq,
           |         CAST(count(*) FILTER (WHERE wt <> 0) AS BIGINT) AS nnz
           |  FROM g GROUP BY doc_id)
           |SELECT doc_id,
           |       to_json(list_transform(range(0, 16),
           |         i -> coalesce(list_filter(pairs, p -> p.b = i)[1].w, 0::BIGINT))) AS vec,
           |       l2sq, nnz
           |FROM d ORDER BY doc_id""".stripMargin),
    (s, dir) => {
      // r14: with D fixed at 16 lanes the (doc, bucket) pre-aggregate
      // is a wasted exchange — pivot the lanes into 16 conditional sums
      // keyed on doc_id alone (guide §2.4 "remove shuffles outright"):
      // ONE partial-combining aggregate replaces groupBy(doc,bucket) +
      // groupBy(doc) + the O(D²) per-doc lane lookup, and the shuffle
      // carries one 17-column row per doc instead of ≤16 (doc, bucket,
      // wt) rows. A present-but-cancelled bucket sums to 0 exactly like
      // the old coalesce(absent → 0) path, so l2sq/nnz/vec are
      // bit-identical. (At production D = 2^18 the column pivot stops
      // making sense and the (doc, bucket) partial-agg form is right —
      // this rewrite is the D-small specialization, the oracle keeps
      // the general spelling.)
      val lanes = 0 until 16
      val sums = lanes.map(i =>
        s"CAST(sum(CASE WHEN bucket = $i THEN sgn ELSE 0 END) AS BIGINT) AS w$i")
        .mkString(",\n         ")
      val vecArr = lanes.map(i => s"w$i").mkString("array(", ", ", ")")
      val l2 = lanes.map(i => s"w$i * w$i").mkString(" + ")
      val nz = lanes.map(i => s"(CASE WHEN w$i <> 0 THEN 1 ELSE 0 END)")
        .mkString(" + ")
      Tables.sql(s, dir,
        s"""WITH tok AS (
           |  SELECT doc_id, t FROM (
           |    SELECT doc_id, explode(split(text, ' ')) AS t FROM documents)
           |  WHERE t <> ''),
           |hx AS (
           |  SELECT doc_id, CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT) AS h FROM tok),
           |h AS (
           |  SELECT doc_id, h % 16 AS bucket,
           |         CASE WHEN (h div 16) % 2 = 1 THEN 1 ELSE -1 END AS sgn
           |  FROM hx),
           |d AS (
           |  SELECT doc_id,
           |         $sums
           |  FROM h GROUP BY doc_id)
           |SELECT doc_id,
           |       to_json($vecArr) AS vec,
           |       CAST($l2 AS BIGINT) AS l2sq,
           |       CAST($nz AS BIGINT) AS nnz
           |FROM d ORDER BY doc_id""".stripMargin)
    })

  // ---- context-length truncation loss -----------------------------------
  // The context-budget question every pretraining run answers before
  // picking a sequence length: at max_len L, how many documents
  // truncate and what fraction of the token mass falls off the end?
  // (The complement of seq_packing_assign — that entry packs short
  // docs; this one prices the cap for long ones.) One map-side token
  // count per doc, a 3-row length spine expanded map-side, and a
  // per-L partial agg; loss is exact integer ppm.
  private val truncationLoss = QueryDef(
    "context_truncation_loss",
    Some("""WITH tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
           |L AS (SELECT unnest([16, 32, 64]) AS max_len)
           |SELECT max_len,
           |  CAST(count(*) FILTER (WHERE n > max_len) AS BIGINT) AS docs_truncated,
           |  CAST(sum(CASE WHEN n > max_len THEN n - max_len ELSE 0 END) AS BIGINT) AS tokens_lost,
           |  CAST(sum(n) AS BIGINT) AS tokens_total,
           |  CAST((sum(CASE WHEN n > max_len THEN n - max_len ELSE 0 END) * 1000000) // sum(n) AS BIGINT) AS loss_ppm
           |FROM tok CROSS JOIN L GROUP BY max_len ORDER BY max_len""".stripMargin),
    (s, dir) => Tables.sql(s, dir,
      """WITH tok AS (SELECT doc_id, size(split(text, ' ')) AS n FROM documents),
        |L AS (SELECT explode(array(16, 32, 64)) AS max_len)
        |SELECT max_len,
        |  CAST(count(*) FILTER (WHERE n > max_len) AS BIGINT) AS docs_truncated,
        |  CAST(sum(CASE WHEN n > max_len THEN n - max_len ELSE 0 END) AS BIGINT) AS tokens_lost,
        |  CAST(sum(n) AS BIGINT) AS tokens_total,
        |  CAST(CAST(sum(CASE WHEN n > max_len THEN n - max_len ELSE 0 END) AS DECIMAL(38,0)) * 1000000 div sum(n) AS BIGINT) AS loss_ppm
        |FROM tok CROSS JOIN L GROUP BY max_len ORDER BY max_len""".stripMargin))

  // ---- curriculum-ordered sequence packing -------------------------------
  // Curriculum learning's data-side half: order the corpus by a quality
  // signal (the classifier milli-score — same deterministic md5 term
  // weights as quality_classifier_score) and assign documents to
  // fixed-token-budget training batches in that order, so early batches
  // carry the highest-quality text. Batch id = exclusive-prefix-sum of
  // tokens div budget — greedy sequential filling, deterministic.
  //
  // 100 TB shape: the oracle's `sum(toks) OVER (ORDER BY …)` is the
  // same single-reducer hazard as ntile — the Spark path runs the
  // two-pass distributed PREFIX SCAN (operators/GlobalRank
  // .withPrefixSum: range partition → per-partition local cumsum →
  // partition totals folded as offsets), so the batch assignment is
  // pure map-side arithmetic after one range exchange of the per-doc
  // (score, tokens) rows. Memoized like q21/q22's ranked frames;
  // PlanSpec locks the window-free served plan.
  private val PackBudgetTokens = 2048

  private val packCache =
    new graft.operators.DirMemo[org.apache.spark.sql.DataFrame]()

  private val curriculumPacking = QueryDef(
    "curriculum_packing",
    Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
           |sc AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS toks,
           |         CAST(sum((ascii(substr(md5(term), 1, 1)) * 31 +
           |                   ascii(substr(md5(term), 2, 1))) % 2001 - 1000) AS BIGINT) AS score
           |  FROM tok GROUP BY doc_id),
           |rk AS (
           |  SELECT doc_id, toks, score,
           |         CAST(sum(toks) OVER (ORDER BY score DESC, doc_id
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           |  FROM sc),
           |b AS (SELECT *, CAST((cum - toks) // $PackBudgetTokens AS BIGINT) AS batch FROM rk)
           |SELECT batch, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(toks) AS BIGINT) AS total_tokens,
           |       CAST(min(score) AS BIGINT) AS min_score,
           |       CAST(max(score) AS BIGINT) AS max_score
           |FROM b GROUP BY batch ORDER BY batch""".stripMargin),
    (s, dir) => {
      val packed = packCache.getOrElseUpdate(s, dir) {
        val sc = Tables.sql(s, dir,
          """SELECT doc_id, CAST(count(*) AS BIGINT) AS toks,
            |  CAST(sum((ascii(substring(md5(term), 1, 1)) * 31 +
            |            ascii(substring(md5(term), 2, 1))) % 2001 - 1000) AS BIGINT) AS score
            |FROM (SELECT doc_id, term FROM documents
            |      LATERAL VIEW explode(split(text, ' ')) t AS term) tok
            |GROUP BY doc_id""".stripMargin)
        graft.operators.GlobalRank.withPrefixSum(
          sc, Seq(col("score").desc, col("doc_id")), col("toks"), "cum")
      }
      packed
        .withColumn("batch",
          expr(s"CAST((cum - toks) div $PackBudgetTokens AS BIGINT)"))
        .groupBy("batch")
        .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"),
          min("score").as("min_score"), max("score").as("max_score"))
        .select(col("batch"), col("n_docs").cast("long").as("n_docs"),
          col("total_tokens").cast("long").as("total_tokens"),
          col("min_score").cast("long").as("min_score"),
          col("max_score").cast("long").as("max_score"))
        .orderBy("batch")
    })

  // ---- vocabulary coverage / OOV rate ------------------------------------
  // The tokenizer-fit readout: what share of each source's tokens falls
  // outside the top-V vocabulary? High OOV flags sources the tokenizer
  // will fragment (cost) or mangle (quality). The vocabulary is the
  // top-V terms by global frequency (V=16 here — the gated slice of a
  // 32k-vocab deployment), fully tie-broken (count DESC, term).
  //
  // 100 TB shape: the vocabulary is VOCABULARY-sized — derived by a
  // TakeOrdered over the term-frequency partials and folded back as an
  // `isin` LITERAL, so the per-token membership test is pure map-side
  // codegen (no join at all; the oracle spells it as a LEFT JOIN, the
  // plan-shape divergence is the point); the only corpus exchange
  // carries (source) partial counts. PlanSpec locks the no-join shape.
  private val OovVocabSize = 16

  private val oovVocabCache =
    new graft.operators.DirMemo[Seq[String]]()

  private val oovRate = QueryDef(
    "oov_rate_by_source",
    Some(s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
           |tf AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
           |vocab AS (SELECT term FROM tf ORDER BY c DESC, term LIMIT $OovVocabSize),
           |j AS (SELECT t.source, (v.term IS NOT NULL) AS inv
           |      FROM tok t LEFT JOIN vocab v ON v.term = t.term)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
           |       CAST(count(*) FILTER (WHERE NOT inv) AS BIGINT) AS oov_tokens,
           |       CAST((count(*) FILTER (WHERE NOT inv)) * 1000000 // count(*) AS BIGINT) AS oov_ppm
           |FROM j GROUP BY source ORDER BY source""".stripMargin),
    (s, dir) => {
      val vocab = oovVocabCache.getOrElseUpdate(s, dir) {
        Tables.sql(s, dir,
          s"""SELECT term FROM (
             |  SELECT term, count(*) AS c FROM documents
             |  LATERAL VIEW explode(split(text, ' ')) t AS term GROUP BY term)
             |ORDER BY c DESC, term LIMIT $OovVocabSize""".stripMargin)
          .collect().map(_.getString(0)).toSeq
      }
      Tables.table(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .withColumn("oov", !col("term").isin(vocab: _*))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("oov"), 1L).otherwise(0L)).as("oov_tokens"))
        .select(col("source"), col("n_tokens").cast("long").as("n_tokens"),
          col("oov_tokens").cast("long").as("oov_tokens"),
          expr("CAST(CAST(oov_tokens AS DECIMAL(38,0)) * 1000000 div n_tokens AS BIGINT)")
            .as("oov_ppm"))
        .orderBy("source")
    })

  // ---- UniMax language-budget allocation ---------------------------------
  // The multilingual mixing rule (Chung et al., "UniMax", ICLR 2023):
  // walk languages from LOWEST-resource up; each gets
  // min(cnt · maxEpochs, remaining_budget / remaining_languages) — so
  // low-resource languages train their full epoch cap and the budget
  // surplus flows to high-resource ones, which are uniformly truncated.
  // Budget = 1.5× the corpus (scale-invariant), epoch cap 2: on this
  // corpus de/fr/es/zh get exactly 2,000,000 epoch-ppm and en is cut to
  // its budget share — the canonical UniMax shape. All-integer
  // arithmetic; nonnegative operands so // and div agree.
  //
  // 100 TB shape: the corpus-scale work is ONE partial-agg token count
  // per language; the allocation walk is |languages|-sized metadata
  // folded on the driver (the codebook discipline). The oracle spells
  // the same walk as a recursive CTE.
  private val unimax = QueryDef(
    "unimax_language_budget",
    Some("""WITH RECURSIVE lc AS (
           |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS cnt
           |  FROM documents GROUP BY lang),
           |ord AS (SELECT lang, cnt, CAST(row_number() OVER (ORDER BY cnt, lang) AS BIGINT) AS rn FROM lc),
           |tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(cnt) AS BIGINT) AS total FROM lc),
           |alloc AS (
           |  SELECT CAST(0 AS BIGINT) AS rn, '' AS lang, CAST(1 AS BIGINT) AS cnt,
           |         CAST(0 AS BIGINT) AS a, CAST((tot.total * 3) // 2 AS BIGINT) AS rem
           |  FROM tot
           |  UNION ALL
           |  SELECT o.rn, o.lang, o.cnt,
           |         least(o.cnt * 2, CAST(al.rem // (t.k - al.rn) AS BIGINT)),
           |         al.rem - least(o.cnt * 2, CAST(al.rem // (t.k - al.rn) AS BIGINT))
           |  FROM alloc al JOIN ord o ON o.rn = al.rn + 1 CROSS JOIN tot t)
           |SELECT lang, cnt AS n_tokens, a AS allocation,
           |       CAST(a * 1000000 // cnt AS BIGINT) AS epochs_ppm
           |FROM alloc WHERE rn > 0 ORDER BY lang""".stripMargin),
    (s, dir) => {
      import s.implicits._
      val counts = Tables.sql(s, dir,
        """SELECT lang, CAST(sum(size(split(text, ' '))) AS BIGINT) AS cnt
          |FROM documents GROUP BY lang""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (l, c) => (c, l) }
      var rem = counts.map(_._2).sum * 3 / 2
      val out = counts.zipWithIndex.map { case ((lang, cnt), i) =>
        val quota = rem / (counts.length - i)
        val a = math.min(cnt * 2, quota)
        rem -= a
        // BigInt: a·1e6 overflows Long once a language holds > 9.2e12
        // tokens (the oracle's // runs on HUGEINT); quotient ≤ 2e6 fits
        (lang, cnt, a, (BigInt(a) * 1000000 / cnt).toLong)
      }
      out.toSeq.sortBy(_._1)
        .toDF("lang", "n_tokens", "allocation", "epochs_ppm")
    })

  override val defs: Seq[QueryDef] =
    Seq(incremental, surprisal, surprisalBuckets, chunks, sourceMix,
      leakageSafeSplit, temperatureMix, dsir, bigramSurprisal, cdcChunks,
      segmentDedup, sourceCap, featureHash, truncationLoss,
      curriculumPacking, oovRate, unimax)
}
