package graft.text

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact (hash-groupBy), MinHash LSH, SimHash, and n-gram
  * Jaccard with cheap candidate generation.
  *
  * Scale design (the 100 TB path):
  *  - exact dedup groups on a 256-bit content digest, never shuffling
  *    document bodies;
  *  - near-dup methods are all candidate-generation + verify: candidates
  *    come from equi-joins on small keys (LSH buckets / signature
  *    bands), so the only shuffles are on fixed-width hashes — no
  *    all-pairs comparison anywhere;
  *  - every step is `functions._`/codegen (token explode + hash + bit
  *    arithmetic), no Scala UDFs.
  */
object Dedup {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** k-token shingles as strings; documents shorter than k tokens
    * contribute their whole text as one shingle. (Spark's `sequence`
    * auto-steps backwards when start > stop, so the short-doc case must
    * be guarded explicitly.) */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Exact dedup: one row per distinct content, keeping the smallest id
    * (`keeper`) plus the duplicate count. Groups on sha2-256 of the
    * text — fixed 64-char shuffle key regardless of document size;
    * collision probability is negligible at any corpus size. */
  def exactDedup(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** SimHash: 64-bit locality-sensitive fingerprint. Each token's
    * xxhash64 votes ±1 per bit position weighted by term frequency;
    * the sign of each bit-sum becomes the fingerprint bit. Near-dup
    * pairs differ in few bits (small hamming distance).
    *
    * One explode + one 64-expression aggregate — fully codegen'd,
    * shuffle key is the doc id. */
  def simhash(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val exploded = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val sums = exploded.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fingerprint = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col(idCol), fingerprint.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 64-bit fingerprint into
    * `numBands` equal keys, equi-join on (band index, band value) to
    * generate candidates — by pigeonhole, two documents within hamming
    * distance `numBands - 1` share at least one band — then verify
    * with `bit_count(xor) <= maxHamming`.
    *
    * Tradeoff: more bands → shorter band keys → guaranteed recall at
    * larger hamming distance but more random bucket collisions. 8×8-bit
    * bands suit short-doc corpora (single-token edits flip several
    * bits); at web scale with long docs, 4×16-bit bands keep candidate
    * volume down. */
  def simhashPairs(df: DataFrame, maxHamming: Int = 7, numBands: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(64 % numBands == 0, s"numBands must divide 64: $numBands")
    val bandBits = 64 / numBands
    val mask = (1L << bandBits) - 1
    val fp = simhash(df, textCol, idCol)
    val banded = fp.select(col(idCol), col("simhash"),
      explode(array((0 until numBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(mask).as("key"))
      }: _*)).as("bk"))
    val a = banded.select(col(idCol).as("id_a"), col("simhash").as("sh_a"),
      col("bk.band").as("band"), col("bk.key").as("key"))
    val b = banded.select(col(idCol).as("id_b"), col("simhash").as("sh_b"),
      col("bk.band").as("band"), col("bk.key").as("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup: candidates from min/max shingle-hash
    * signature bands (documents sharing either extreme shingle hash),
    * verified with exact Jaccard over distinct shingle sets.
    * Candidate keys are single longs — the shuffle never carries
    * shingle sets to non-candidates. */
  def ngramJaccardPairs(df: DataFrame, k: Int = 3, minJaccard: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val withShingles = df.select(col(idCol),
      array_distinct(shingles(col(textCol), k)).as("sh"))
      .withColumn("hashes", transform(col("sh"), s => xxhash64(s)))
      .withColumn("sig_min", array_min(col("hashes")))
      .withColumn("sig_max", array_max(col("hashes")))
      .drop("hashes")
    val a = withShingles.select(col(idCol).as("id_a"), col("sh").as("sh_a"),
      col("sig_min").as("min_a"), col("sig_max").as("max_a"))
    val b = withShingles.select(col(idCol).as("id_b"), col("sh").as("sh_b"),
      col("sig_min").as("min_b"), col("sig_max").as("max_b"))
    val candidates = a.join(b,
      (col("min_a") === col("min_b")) || (col("max_a") === col("max_b")))
      .filter(col("id_a") < col("id_b"))
    candidates
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / col("uni")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
      .distinct()
  }

  /** MinHash LSH near-dup pairs (shingle → minhash → OR-amplified
    * bucket join), via spark-mllib's MinHashLSH over binary
    * HashingTF vectors. `approxSimilarityJoin` explodes the
    * `numHashTables` signatures and equi-joins on bucket values —
    * the classic band-join, distributed. Seeded → deterministic. */
  def minhashPairs(df: DataFrame, k: Int = 3, maxJaccardDist: Double = 0.3,
      numHashTables: Int = 8, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val withShingles = df.select(col(idCol), shingles(col(textCol), k).as("sh"))
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vectors = tf.transform(withShingles)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(vectors)
    model.approxSimilarityJoin(vectors, vectors, maxJaccardDist, "jaccard_dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }
}
