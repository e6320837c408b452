package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("blockPack: hand-built stream packs into the expected block spans") {
    // weights 3,4,5,2 over blockSize 4:
    // doc 0 -> [0,3)  blocks 0..0
    // doc 1 -> [3,7)  blocks 0..1 (straddles)
    // doc 2 -> [7,12) blocks 1..2
    // doc 3 -> [12,14) blocks 3..3
    val df = Seq((0L, 3L), (1L, 4L), (2L, 5L), (3L, 2L)).toDF("id", "w")
    val got = Packing.blockPack(df, "id", "w", blockSize = 4L, bucketWidth = 2L)
      .orderBy("id")
      .select("id", "cum_start", "cum_end", "first_block", "last_block", "n_blocks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 0L, 3L, 0L, 0L, 1L),
      (1L, 3L, 7L, 0L, 1L, 2L),
      (2L, 7L, 12L, 1L, 2L, 2L),
      (3L, 12L, 14L, 3L, 3L, 1L)))
  }

  test("blockPack: zero-weight rows are dropped, never shift offsets") {
    val df = Seq((0L, 2L), (1L, 0L), (2L, 2L)).toDF("id", "w")
    val got = Packing.blockPack(df, "id", "w", blockSize = 4L, bucketWidth = 10L)
      .orderBy("id").select("id", "cum_start").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 0L), (2L, 2L)))
  }

  test("blockPack: two-level scan is bucketWidth-invariant (== naive single-bucket scan)") {
    // sparse, non-contiguous ids across many buckets vs one bucket
    val df = (0 until 200).map(i => (i.toLong * 37 + 5, (i % 7 + 1).toLong))
      .toDF("id", "w")
    def run(width: Long) =
      Packing.blockPack(df, "id", "w", blockSize = 16L, bucketWidth = width)
        .orderBy("id")
        .select("id", "cum_start", "cum_end", "first_block", "last_block")
        .collect().toSeq
    assert(run(64L) == run(1L << 40)) // many buckets == single bucket
    assert(run(1L) == run(1L << 40))  // one row per bucket, degenerate
  }

  test("blockPack plan: prefix window is bucket-partitioned, offsets join broadcasts") {
    val df = (0 until 100).map(i => (i.toLong, 3L)).toDF("id", "w")
    val plan = Packing.blockPack(df, "id", "w", blockSize = 8L, bucketWidth = 16L)
      .queryExecution.executedPlan.toString
    // the per-row window must carry the bucket partitioning — a bare
    // global-order window over the data would be the single-task trap
    assert(plan.contains("windowspecdefinition(_bucket"), plan.take(3000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }
}
