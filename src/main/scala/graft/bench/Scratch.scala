package graft.bench
object Scratch {
  def main(args: Array[String]): Unit = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    cms.add("hello"); cms.add("hello"); cms.add("world")
    println("est hello=" + cms.estimateCount("hello") + " depth=" + cms.depth + " width=" + cms.width)
    val bos = new java.io.ByteArrayOutputStream(); cms.writeTo(bos)
    val back = org.apache.spark.util.sketch.CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bos.toByteArray))
    val cms2 = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    cms2.add("world")
    back.mergeInPlace(cms2)
    println("merged world=" + back.estimateCount("world") + " total=" + back.totalCount)
    // determinism of serialized form under same adds?
    val c3 = org.apache.spark.util.sketch.CountMinSketch.create(0.001, 0.99, 42)
    c3.add("hello"); c3.add("hello"); c3.add("world"); c3.add("world")
    val b1 = new java.io.ByteArrayOutputStream(); back.writeTo(b1)
    val b2 = new java.io.ByteArrayOutputStream(); c3.writeTo(b2)
    println("merged-bytes == direct-bytes: " + java.util.Arrays.equals(b1.toByteArray, b2.toByteArray))
  }
}
