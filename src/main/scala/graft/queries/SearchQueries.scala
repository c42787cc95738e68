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
      val docs = Tables.table(s, dir, "documents")
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"))
      val n = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term").isin(Terms: _*))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf
        .join(broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(broadcast(n))
        // identical parenthesization to the oracle — the doubles must
        // take the same IEEE path in both engines before the round
        .select(col("doc_id"), expr(
          """CAST(round(ln(1.0D + (n - df + 0.5D) / (df + 0.5D)) *
            |           (tf * 2.2D) /
            |           (tf + 1.2D * (0.25D + 0.75D * dl /
            |                         (CAST(tot AS DOUBLE) / n))) *
            |           1000000.0D, 0) AS BIGINT)""".stripMargin).as("m"))
      val sc = scored.groupBy("doc_id").agg(sum(col("m")).as("score_micro"))
        .orderBy(col("score_micro").desc, col("doc_id")).limit(10)
      // rank the (tiny) top-k result; the window runs over 10 rows
      sc.withColumn("rank",
          row_number().over(Window.orderBy(col("score_micro").desc, col("doc_id")))
            .cast("long"))
        .select(col("rank"), col("doc_id"), col("score_micro"))
    })

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

  override val defs: Seq[QueryDef] = Seq(bm25, postings)
}
