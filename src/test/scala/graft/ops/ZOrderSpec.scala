package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue: known Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
    val got = df.select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave: a at even bits, b at odd; (5,2): a=101 -> bits {0,4}
    // = 17, b=010 -> bit {3} = 8, z = 25
    assert(got == Seq(0L, 1L, 2L, 15L, 25L))
  }

  test("zValue: 31-bit max coordinates stay in 62 bits (no sign-bit touch)") {
    val m = (1L << 31) - 1
    val z = Seq((m, m)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"))).head().getLong(0)
    assert(z == (1L << 62) - 1)
    assert(z > 0)
  }

  test("z-layout locality: equal-size z-chunks bound BOTH coordinate spans, row-major doesn't") {
    // 64x64 grid; 512-cell chunks. Row-major chunks are 8 full rows:
    // the y span is always the full 64. Z-order chunks are 2^k-aligned
    // boxes: both spans <= 32.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def maxSpans(bucket: org.apache.spark.sql.Column): (Long, Long) = {
      val r = grid.groupBy(bucket.as("bk"))
        .agg((max(col("x")) - min(col("x"))).as("xs"),
          (max(col("y")) - min(col("y"))).as("ys"))
        .agg(max(col("xs")), max(col("ys"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val (zx, zy) = maxSpans(shiftright(ZOrder.zValue(col("x"), col("y")), 9))
    val (rx, ry) = maxSpans(shiftright(col("x") * 64 + col("y"), 9))
    assert(zx <= 32 && zy <= 32, s"z spans ($zx, $zy)")
    assert(ry >= 63, s"row-major y span $ry") // full-width in the trailing dim
  }
}
