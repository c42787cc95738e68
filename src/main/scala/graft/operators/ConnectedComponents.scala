package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Connected components over an undirected edge list `(a, b)` →
  * `(id, label)` where label = the component's minimum node id.
  *
  * Engine choice mirrors Spark's own broadcast decision: a small edge
  * set (≤ `driverThreshold` edges — e.g. the verified near-dup pairs of
  * a corpus, which are tiny relative to the corpus itself) solves with
  * union-find on the driver in O(E α(E)); a large one runs the
  * alternating large-star/small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14): each
  * round is two groupBy+join shuffles over the EDGE set only, and the
  * edge set contracts toward one star per component in O(log n)
  * rounds — independent of component DIAMETER, which is what kills
  * min-label propagation on the chain-shaped components crawl
  * near-dup graphs produce (r7 verdict #3; a d-hop chain cost d
  * shuffle rounds there, log₂ d here). Both paths produce identical
  * labels (locked by ConnectedComponentsSpec on the same fixtures).
  */
object ConnectedComponents {

  val DefaultDriverThreshold = 1000000L

  def labels(edges: DataFrame, driverThreshold: Long = DefaultDriverThreshold): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.toDF("a", "b").persist()
    val n = e.count()
    val out =
      if (n <= driverThreshold) driverUnionFind(spark, e)
      else starContraction(e)._1
    e.unpersist()
    out
  }

  /** Driver union-find: exact, one collect of the EDGE list (never the
    * node universe beyond edge endpoints). */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
                              e: DataFrame): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    e.select(col("a").cast("long"), col("b").cast("long")).collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by MIN so the root IS the component min
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows = parent.keys.toSeq.sorted.map(id => Row(id, find(id)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("label", LongType, nullable = false))))
  }

  /** Large-star: over the bidirectional neighborhood of every node u,
    * with m = min(Γ(u) ∪ {u}), re-point every STRICTLY LARGER
    * neighbor at m — `(v, m)` for v ∈ Γ(u), v > u. Output stays
    * canonically oriented (first > second) and self-loop-free
    * (v > u ≥ m). */
  private def largeStar(e: DataFrame): DataFrame = {
    val bidir = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val mins = bidir.groupBy(col("a").as("u"))
      .agg(min("b").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    bidir.join(mins, bidir("a") === mins("u"))
      .where(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Small-star: edges arrive oriented a > b, so Γ(a) here is the
    * strictly-smaller neighborhood; with m = min(Γ(a)), re-point a and
    * every non-min small neighbor at m — `(a, m)` plus `(v, m)` for
    * v ∈ Γ(a) \ {m}. Orientation is preserved (every emitted first
    * component exceeds m). */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("a").as("u")).agg(min("b").as("m"))
    val joined = e.join(mins, e("a") === mins("u"))
    joined.where(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
      .union(mins.select(col("u").as("a"), col("m").as("b")))
      .distinct()
  }

  /** Alternating star contraction to FIXPOINT; returns (labels,
    * rounds). A fixpoint of one large+small round is exactly "every
    * component is a star rooted at its min" (both operators map a
    * min-rooted star to itself), at which point the edge set IS the
    * non-root label assignment. Convergence is O(log n) rounds
    * independent of diameter; the defensive cap FAILS LOUDLY (a
    * converging contraction cannot reach it — 100 rounds would mean a
    * 2^100-node component). Each round EAGER-localCheckpoints its edge
    * set: an iterative plan that merely persists still CHAINS the
    * logical plan, which doubles per round and OOMs the driver on
    * plan-string generation alone by round ~15 — checkpointing cuts
    * the lineage so every round plans against a leaf; superseded
    * rounds' blocks are reaped by the ContextCleaner once
    * unreferenced. */
  private[operators] def starContraction(e: DataFrame): (DataFrame, Int) = {
    // node universe up front: nodes whose every edge contracts away
    // mid-stream (and single-node inputs via self-loops) must still
    // label themselves in the output
    val nodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cur = e.where(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .distinct()
        .localCheckpoint(true)
      var curCount = cur.count()
      var rounds = 0
      var converged = curCount == 0L
      while (!converged) {
        if (rounds >= 100)
          throw new IllegalStateException(
            s"star contraction did not converge after $rounds rounds")
        val next = smallStar(largeStar(cur)).localCheckpoint(true)
        val nextCount = next.count()
        // equal-cardinality distinct sets with empty difference ⇒ equal
        converged = nextCount == curCount && next.except(cur).isEmpty
        cur = next
        curCount = nextCount
        rounds += 1
      }
      // at fixpoint every edge is (member, componentMin); roots and
      // contracted-away isolated nodes label themselves via the
      // node-universe left join
      val lbl = nodes.join(cur.select(col("a").as("id"), col("b").as("lb")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("lb"), col("id")).as("label"))
      (lbl.localCheckpoint(true), rounds)
    } finally nodes.unpersist(false)
  }
}
