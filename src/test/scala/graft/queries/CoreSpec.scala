package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Behavioral gates for the core/layout operators — currently the
  * Z-order key: an exact driver replay of the interleave plus the two
  * theorems the layout exists for (axis monotonicity under dominance,
  * and rectangle-to-band containment — the property that lets a scan
  * filtered on both columns prune to a contiguous z range of files).
  */
class CoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("core-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def morton(x: Long, y: Long): Long =
    (0 until 16).map(i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))).sum

  test("z-order codes replay exactly and round-trip to their coordinates") {
    val rows = SparkEntry.queries("zorder_layout_key")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.length > 1000)
    rows.foreach { case (xk, yk, z, bucket) =>
      assert(z == morton(xk, yk), s"interleave mismatch at ($xk, $yk)")
      assert(bucket == (z >> 24))
      // round-trip: de-interleave the even/odd bits back out
      val (dx, dy) = (0 until 16).foldLeft((0L, 0L)) { case ((a, b), i) =>
        (a + (((z >> (2 * i)) & 1L) << i), b + (((z >> (2 * i + 1)) & 1L) << i))
      }
      assert(dx == xk && dy == yk, s"decode($z) = ($dx, $dy) != ($xk, $yk)")
    }
  }

  test("z-order is monotone under coordinate dominance (the pruning theorem)") {
    val rnd = new scala.util.Random(7)
    // spread(x) is strictly increasing, z = spread(x) + 2*spread(y) —
    // so dominance (x2 >= x1 AND y2 >= y1) must imply z2 >= z1, which
    // is exactly what makes a z-band a superset of any rectangle
    (1 to 2000).foreach { _ =>
      val (x1, y1) = (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)
      val x2 = x1 + rnd.nextInt(65536 - x1.toInt)
      val y2 = y1 + rnd.nextInt(65536 - y1.toInt)
      assert(morton(x2, y2) >= morton(x1, y1),
        s"dominance violated: z($x2,$y2) < z($x1,$y1)")
      // strict along each axis
      if (x2 > x1) assert(morton(x2, y1) > morton(x1, y1))
      if (y2 > y1) assert(morton(x1, y2) > morton(x1, y1))
    }
  }

  test("a rectangle scan prunes to the corner-to-corner z band") {
    val rows = SparkEntry.queries("zorder_layout_key")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val x0 = rnd.nextInt(60000).toLong; val x1 = x0 + 2000
      val y0 = rnd.nextInt(60000).toLong; val y1 = y0 + 2000
      val (zLo, zHi) = (morton(x0, y0), morton(x1, y1))
      val inRect = rows.filter { case (x, y, _) =>
        x >= x0 && x <= x1 && y >= y0 && y <= y1 }
      // containment: every rectangle row's z lies inside the band a
      // pruned scan would read
      inRect.foreach { case (x, y, z) =>
        assert(z >= zLo && z <= zHi, s"row ($x,$y) z=$z escapes [$zLo,$zHi]")
      }
    }
    // and the band is a real prune: a small rectangle's band excludes
    // most of the corpus
    val (zLo, zHi) = (morton(1000, 1000), morton(3000, 3000))
    val inBand = rows.count { case (_, _, z) => z >= zLo && z <= zHi }
    assert(inBand < rows.length / 2,
      s"band [$zLo,$zHi] covers $inBand of ${rows.length} rows — no pruning value")
  }

  test("z-order key assignment is pure map-side (no hash exchange)") {
    val p = SparkEntry.queries("zorder_layout_key")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning("),
      s"code assignment should never shuffle the table:\n$p")
  }
}
