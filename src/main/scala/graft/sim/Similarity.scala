package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, plus two
  * sub-linear scale paths — random-projection LSH bucketing and an
  * IVF (inverted-file) coarse quantizer.
  *
  * Scale design:
  *  - embeddings are L2-normalized ONCE up front; cosine then reduces
  *    to a dot product (`zip_with` + `aggregate`, codegen'd — no UDF);
  *  - brute force is the correctness baseline: O(|queries|·N·d)
  *    comparisons via broadcast of the query set — exact, and still the
  *    right tool when |queries| is small;
  *  - IVF: k-means centroids (tiny, broadcast); each corpus vector is
  *    assigned to its nearest centroid at index time; a query probes
  *    only the `nProbe` nearest cells → candidate set shrinks by
  *    ~k/nProbe; per-cell partitioning keeps the search shuffle-local;
  *  - LSH: mllib BucketedRandomProjectionLSH on normalized vectors
  *    (euclidean distance on the unit sphere is monotone in cosine:
  *    d² = 2(1−cos)).
  */
object Similarity {

  /** Cast a float array column to double. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2-normalize a double-array column (zero vectors pass through).
    * The squared norm is `dot_product(c, c)` — the native expression,
    * not an `aggregate` lambda chain. */
  def l2Normalize(c: Column): Column = {
    val n = sqrt(graft.functions.ArrayMath.dotProduct(c, c))
    when(n > 0, transform(c, x => x / n)).otherwise(c)
  }

  /** Dot product of two equal-length double-array columns, via the
    * native codegen [[graft.functions.DotProduct]] expression (the
    * `zip_with`+`aggregate` form runs on the HigherOrderFunction
    * interpreter and allocates an intermediate array per row). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayMath.dotProduct(a, b)

  /** Cosine similarity of two raw (unnormalized) arrays. */
  def cosine(a: Column, b: Column): Column = dot(l2Normalize(a), l2Normalize(b))

  /** Corpus with a pre-normalized embedding column `norm`. */
  def withNormalized(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    graft.functions.ArrayMath.register(df.sparkSession)
    df.withColumn("norm", l2Normalize(asDouble(col(embCol))))
  }

  /** Per-group top-k through the bounded-heap `top_k_by` aggregate
    * ([[graft.functions.TopKBy]]): each input partition reduces a group
    * to ≤ k (score, id) pairs BEFORE the shuffle, so shuffle volume is
    * k × groups × partitions instead of every scored row (the
    * row_number-window spelling this replaced sorted the full scored
    * set per group — at 100 TB, the whole corpus through the wire once
    * per query batch). Tie-break inside the aggregate (higher score,
    * then smaller id) matches the window `ORDER BY score DESC, id ASC`,
    * so results are bit-identical and stay hash-oracled. */
  private[graft] def topKPerGroup(scored: DataFrame, groupCol: String,
      scoreCol: String, idCol2: String, k: Int,
      outScore: String, outId: String): DataFrame =
    scored.groupBy(col(groupCol))
      .agg(graft.functions.TopKBy
        .topKBy(col(scoreCol), col(idCol2), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("t.id").as(outId), col("t.score").as(outScore))

  /** Exact top-k cosine neighbors for each query vector (self-matches
    * excluded). `queries` is expected to be small — it is broadcast, so
    * the corpus is scanned once with no shuffle until the final
    * per-query top-k (bounded-heap partial aggregation — see
    * [[topKPerGroup]]). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      roundScoreTo: Option[Int] = None): DataFrame = {
    val c = withNormalized(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("norm").as("c_norm"))
    val q = withNormalized(queries, embCol)
      .select(col(idCol).as("query_id"), col("norm").as("q_norm"))
    // roundScoreTo rounds cos BEFORE the top-k heap: dot-product fold
    // order and sqrt normalization differ ~1 ulp across engines, so an
    // exact-hash consumer (the DuckDB oracle gate) ranks on rounded
    // scores with the id tie-break deciding exact ties (float-
    // determinism policy, COVERAGE.md). Callers that feed recall
    // metrics keep the raw doubles.
    val scored0 = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("q_norm"), col("c_norm")))
    val scored = roundScoreTo.fold(scored0)(p =>
      scored0.withColumn("cos", round(col("cos"), p)))
    topKPerGroup(scored, "query_id", "cos", "neighbor_id", k, "cos", "neighbor_id")
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF index: corpus vectors assigned to their nearest of `nCells`
    * k-means centroids. Returns (corpus with `cell`, centroid table).
    * Seeded → deterministic. */
  def ivfIndex(corpus: DataFrame, nCells: Int, seed: Long = 42L,
      idCol: String = "vec_id", embCol: String = "embedding"): (DataFrame, DataFrame) = {
    val normed = withNormalized(corpus, embCol)
      .withColumn("features", array_to_vector(col("norm")))
    val km = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(normed)
    val indexed = model.transform(normed).drop("features")
    val centroids = model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
    val spark = corpus.sparkSession
    import spark.implicits._
    (indexed, centroids.toSeq.toDF("cell", "centroid"))
  }

  /** IVF search: probe the `nProbe` nearest cells per query, brute
    * force inside. Candidate volume ≈ N·nProbe/nCells. */
  def ivfTopK(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = withNormalized(queries, embCol)
      .select(col(idCol).as("query_id"), col("norm").as("q_norm"))
    // nearest nProbe cells per query (centroid table is tiny → broadcast).
    // KMeans assigned corpus vectors by EUCLIDEAN distance, so cells are
    // ranked by |q−c|² = |q|² + |c|² − 2·q·c; centroid norms vary (means
    // of unit vectors have |c| < 1), so ranking by q·c alone would probe
    // the wrong cells.
    val qCells = q.join(broadcast(centroids), lit(true))
      .withColumn("cdist",
        dot(col("centroid"), col("centroid")) - lit(2.0) * dot(col("q_norm"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_norm"), col("cell"))
    val scored = indexed
      .select(col(idCol).as("neighbor_id"), col("norm").as("c_norm"), col("cell"))
      .join(broadcast(qCells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("q_norm"), col("c_norm")))
    topKPerGroup(scored, "query_id", "cos", "neighbor_id", k, "cos", "neighbor_id")
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Product-quantization codebooks (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the
    * d-dim normalized embedding splits into `m` subspaces of d/m
    * dims, and each subspace gets its own `k`-centroid k-means
    * codebook. A vector is then stored as m small codes — at
    * (m=8, k=16) that is 8 nibbles = 4 bytes instead of 256 bytes of
    * floats, the 64× memory compression that lets a 100 TB corpus's
    * index live in RAM. Seeded → deterministic. Returns
    * codebooks(j)(c) = centroid c of subspace j. */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, k: Int = 16,
      seed: Long = 42L, embCol: String = "embedding"): Array[Array[Array[Double]]] = {
    // eager cut: the m concurrent fits below otherwise race jobs over
    // the SHARED normalize subtree, and a finished execution
    // unregistering its SQL-metric accumulators while a sibling's
    // tasks still report spams "Failed to update accumulator" ERRORs
    val normed = withNormalized(corpus, embCol)
      .select(col("norm")).localCheckpoint(true)
    val dim = normed.select(size(col("norm"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // the m sub-space fits are independent — submit them concurrently
    // and let Spark's scheduler interleave their (many, tiny) jobs;
    // sequential fits paid m × per-fit scheduling latency (measured
    // 35 s → ~8 s at sf0.1 for m=8)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fits = (0 until m).map { j =>
      Future {
        val sliced = normed.select(
          array_to_vector(slice(col("norm"), j * sub + 1, sub)).as("features"))
        val km = new KMeans().setK(k).setSeed(seed + j)
          .setFeaturesCol("features").setPredictionCol("c")
        km.fit(sliced).clusterCenters.map(_.toArray)
      }
    }
    Await.result(Future.sequence(fits), Duration.Inf).toArray
  }

  /** Encode the corpus against PQ codebooks: one `codes` array per
    * vector (code j = index of the nearest subspace-j centroid, ties
    * to the lowest index). Pure expressions — the codebooks travel as
    * a literal nested array, the argmin is an `array_position` over
    * per-centroid squared distances; no UDF, no shuffle beyond the
    * scan. */
  def pqEncode(corpus: DataFrame, codebooks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val codes = transform(sequence(lit(0), lit(m - 1)), j => {
      val dists = transform(element_at(cb, (j + 1).cast("int")), c =>
        aggregate(
          zip_with(slice(col("norm"), j * lit(sub) + 1, lit(sub)), c,
            (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    })
    withNormalized(corpus, embCol)
      .select(col(idCol), codes.as("codes"))
  }

  /** PQ asymmetric-distance top-k with exact re-rank — the production
    * ANN shape at memory-bound scale: (1) ADC scan — score every
    * CODE row against each query by summing per-subspace dot products
    * between the query's subvector and the centroid the code names
    * (reads 4-byte codes, never the vectors); (2) bounded-heap
    * shortlist of `shortlist` candidates per query; (3) exact cosine
    * re-rank of the shortlist only (the single place full vectors are
    * fetched — a semi-join-sized read, not a corpus scan). Returned
    * scores are the EXACT re-ranked cosines, so output rows agree
    * with [[bruteForceTopK]] wherever the shortlist contains the true
    * neighbors — recall is the shortlist's to lose, measured in
    * SimilaritySpec. */
  /** ADC score column: approx_cos = Σ_j q_sub_j · codebook[j][code_j],
    * over a frame carrying `q_norm` and `codes`. */
  private def adcScore(codebooks: Array[Array[Array[Double]]]): Column = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val cb = typedlit(codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, j) => {
      val centroid = element_at(element_at(cb, (j + 1).cast("int")),
        (element_at(col("codes"), (j + 1).cast("int")) + 1).cast("int"))
      acc + aggregate(
        zip_with(slice(col("q_norm"), j * lit(sub) + 1, lit(sub)), centroid,
          (a, b) => a * b),
        lit(0.0), (a2, v) => a2 + v)
    })
  }

  /** Exact-cosine re-rank of a (query_id, neighbor_id) shortlist —
    * the only place full vectors are read. */
  private[graft] def exactRerank(short: DataFrame, corpus: DataFrame, q: DataFrame,
      k: Int, idCol: String, embCol: String,
      roundScoreTo: Option[Int]): DataFrame = {
    val c = withNormalized(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("norm").as("c_norm"))
    val scored0 = short
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", dot(col("q_norm"), col("c_norm")))
    val scored = roundScoreTo.fold(scored0)(p =>
      scored0.withColumn("cos", round(col("cos"), p)))
    topKPerGroup(scored, "query_id", "cos", "neighbor_id", k, "cos", "neighbor_id")
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  def pqTopK(codes: DataFrame, codebooks: Array[Array[Array[Double]]],
      corpus: DataFrame, queries: DataFrame, k: Int, shortlist: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      roundScoreTo: Option[Int] = None): DataFrame = {
    val q = withNormalized(queries, embCol)
      .select(col(idCol).as("query_id"), col("norm").as("q_norm"))
    val short = topKPerGroup(
      codes.select(col(idCol).as("neighbor_id"), col("codes"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("approx_cos", adcScore(codebooks)),
      "query_id", "approx_cos", "neighbor_id", shortlist, "approx_cos", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(short, corpus, q, k, idCol, embCol, roundScoreTo)
  }

  /** IVF-PQ (the FAISS IVFADC layout — Jégou et al. TPAMI'11 §V): the
    * coarse quantizer prunes to `nProbe` cells, the ADC scan scores
    * only the probed cells' CODES, and the exact re-rank touches only
    * the shortlist. The three reductions compose: candidate volume
    * ≈ N·nProbe/nCells code rows (4-byte payloads), then `shortlist`
    * full vectors, then k results — at 100 TB that is cell-pruned
    * partition reads of a RAM-resident code table, with the vector
    * store hit only per shortlist row. `cellCodes` carries
    * (idCol, cell, codes). */
  def ivfPqTopK(cellCodes: DataFrame, centroids: DataFrame,
      codebooks: Array[Array[Array[Double]]],
      corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int, shortlist: Int,
      idCol: String = "vec_id", embCol: String = "embedding",
      roundScoreTo: Option[Int] = None): DataFrame = {
    val q = withNormalized(queries, embCol)
      .select(col(idCol).as("query_id"), col("norm").as("q_norm"))
    // probe-cell choice: same euclidean ranking as ivfTopK
    val qCells = q.join(broadcast(centroids), lit(true))
      .withColumn("cdist",
        dot(col("centroid"), col("centroid")) - lit(2.0) * dot(col("q_norm"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") <= nProbe)
      .select(col("query_id"), col("q_norm"), col("cell"))
    val short = topKPerGroup(
      cellCodes.select(col(idCol).as("neighbor_id"), col("cell"), col("codes"))
        .join(broadcast(qCells), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("approx_cos", adcScore(codebooks)),
      "query_id", "approx_cos", "neighbor_id", shortlist, "approx_cos", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(short, corpus, q, k, idCol, embCol, roundScoreTo)
  }

  /** LSH near-neighbor pairs over normalized vectors: euclidean
    * threshold d = sqrt(2(1−minCosine)). Seeded → deterministic. */
  def lshNeighbors(corpus: DataFrame, minCosine: Double,
      numHashTables: Int = 4, bucketLength: Double = 0.5,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val normed = withNormalized(corpus, embCol)
      .select(col(idCol), array_to_vector(col("norm")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setBucketLength(bucketLength)
      .setSeed(42L)
    val model = lsh.fit(normed)
    val thr = math.sqrt(2.0 * (1.0 - minCosine))
    model.approxSimilarityJoin(normed, normed, thr, "dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("cos"))
      .filter(col("id_a") < col("id_b"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with seeded k-means (the
    * same machinery as [[ivfIndex]]), generate candidate pairs only
    * WITHIN a cluster, verify with exact cosine, and keep the minimum
    * id of each connected duplicate group
    * ([[graft.text.Dedup.connectedComponents]] — shared with the text
    * dedup tiers). Returns (vec_id, keeper) for every clustered vector.
    *
    * Scale: the within-cell self-join bounds the quadratic term by the
    * largest cell (nCells should grow with corpus size — SemDeDup used
    * 50k cells at 1.3B docs; cell skew is visible in the cell-size agg
    * and handled by raising nCells). Versus [[embeddingNearDupPairs]]
    * (SRP banding): clustering recalls near-dups that differ on a few
    * hyperplane signs but misses cross-cell pairs (boundary effect) —
    * SimilaritySpec pins exact cosine-1 copies, which k-means provably
    * co-assigns (identical normalized vectors get identical distances,
    * tie-broken identically). */
  def semanticDedup(corpus: DataFrame, nCells: Int, minCosine: Double = 0.95,
      seed: Long = 42L, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val (indexed, _) = ivfIndex(corpus, nCells, seed, idCol, embCol)
    semanticDedupFromIndex(indexed, minCosine, idCol)
  }

  /** Pair-gen + keeper resolution over a PRE-CLUSTERED corpus (`cell`,
    * `norm` columns as produced by [[ivfIndex]]) — the per-run half of
    * [[semanticDedup]]; the k-means assignment is the build-once
    * artifact a pipeline persists (SimilarityQueries memoizes it per
    * scale dir under the same build-once contract as the IVF index). */
  def semanticDedupFromIndex(indexed: DataFrame, minCosine: Double = 0.95,
      idCol: String = "vec_id"): DataFrame = {
    val a = indexed.select(col("cell"), col(idCol).as("id_a"), col("norm").as("na"))
    val b = indexed.select(col("cell"), col(idCol).as("id_b"), col("norm").as("nb"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot(col("na"), col("nb")) >= minCosine)
      .select(col("id_a"), col("id_b"))
    val comp = graft.text.Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", idCol).withColumnRenamed("component", "keeper")
    indexed.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("keeper"), col(idCol)).as("keeper"))
  }

  /** Incremental SemDeDup — the semantic member of the incremental-
    * dedup contract (exact digests, MinHash band index, curation
    * SketchState, IVF assign, PageRank warm-start): fold a batch of NEW
    * vectors into an existing dedup state WITHOUT re-verifying history.
    *
    * Inputs are the two persisted artifacts plus the delta:
    * `priorIndex` (vec_id, cell, norm — the clustered corpus as built
    * by [[ivfIndex]]/appended by [[ivfAssign]]), `priorKeepers`
    * (vec_id, keeper — the prior dedup verdict), and `assignedDelta`
    * (the new batch already assigned to the FROZEN centroids via
    * [[ivfAssign]] — no re-clustering, same frozen-centroid pattern as
    * the incremental IVF query).
    *
    * Work is bounded by the AFFECTED cells only (cells receiving at
    * least one new vector, broadcast as a tiny distinct frame):
    * cosine verification runs for new×new and new×old pairs within
    * those cells — never old×old, which the prior keeper map already
    * summarizes as star edges (id → keeper). Connected components over
    * {new pairs ∪ prior star edges of affected cells} then merges
    * groups transitively — a new vector BRIDGING two prior groups
    * collapses them to one keeper, exactly as a from-scratch run over
    * the same clustering would (components never span cells, so
    * unaffected cells are provably unchanged and skip the fold;
    * SimilaritySpec pins batch≡incremental equivalence). Returns the
    * full updated (vec_id, keeper) map over base ∪ delta. */
  def semanticDedupIncrement(priorIndex: DataFrame, priorKeepers: DataFrame,
      assignedDelta: DataFrame, minCosine: Double = 0.95,
      idCol: String = "vec_id"): DataFrame = {
    val affectedCells = assignedDelta.select(col("cell")).distinct()
    val oldAffected = priorIndex.join(broadcast(affectedCells), Seq("cell"))
    val dA = assignedDelta.select(col("cell"), col(idCol).as("id_a"), col("norm").as("na"))
    val dB = assignedDelta.select(col("cell"), col(idCol).as("id_b"), col("norm").as("nb"))
    val oB = oldAffected.select(col("cell"), col(idCol).as("id_b"), col("norm").as("nb"))
    val newPairs = dA.join(dB, Seq("cell")).filter(col("id_a") < col("id_b"))
      .unionByName(dA.join(oB, Seq("cell")))
      .filter(dot(col("na"), col("nb")) >= minCosine)
      .select(col("id_a"), col("id_b"))
    // prior verdicts enter as star edges — transitively equivalent to
    // the old×old pair set, at |group| edges instead of |group|² work
    val priorEdges = priorKeepers
      .join(oldAffected.select(col(idCol)), Seq(idCol))
      .filter(col("keeper") =!= col(idCol))
      .select(col(idCol).as("id_a"), col("keeper").as("id_b"))
    val comp = graft.text.Dedup.connectedComponents(
      newPairs.unionByName(priorEdges))
      .withColumnRenamed("doc_id", idCol).withColumnRenamed("component", "merged")
    priorKeepers.select(col(idCol), col("keeper"))
      .unionByName(assignedDelta.select(col(idCol), col(idCol).as("keeper")))
      .join(comp, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("merged"), col("keeper")).as("keeper"))
  }

  /** Embedding-cosine near-duplicate pairs via signed-random-projection
    * (SRP) LSH: `numBits` fixed pseudo-random hyperplanes (seeded —
    * deterministic) give each vector a bit signature; signatures are
    * banded and equi-joined for candidates; candidates verify with
    * exact cosine.
    *
    * Scale: candidate generation shuffles only (id, band-key) longs;
    * full vectors travel only to deduped candidate pairs — unlike an
    * `approxSimilarityJoin`, which carries both vectors through every
    * candidate row (measured 19.5s → ~2s on the 1000-vector corpus).
    * Exact duplicates always share all bands (recall 1.0 for cos = 1). */
  def embeddingNearDupPairs(corpus: DataFrame, minCosine: Double = 0.95,
      numBits: Int = 16, numBands: Int = 4, dim: Int = 64,
      seed: Long = 42L, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(numBits % numBands == 0)
    val bitsPerBand = numBits / numBands
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(numBits, dim)(rnd.nextGaussian())
    val normed = withNormalized(corpus, embCol)
      .select(col(idCol), col("norm"))
    val withSig = normed.withColumn("bits", array((0 until numBits).map { i =>
        val plane = array(planes(i).map(lit).toIndexedSeq: _*)
        (dot(col("norm"), plane) >= 0).cast("int")
      }: _*))
      .withColumn("sig", array((0 until numBands).map { b =>
        xxhash64(concat_ws(",",
          (0 until bitsPerBand).map(j => col("bits").getItem(b * bitsPerBand + j)): _*))
      }: _*))
      .drop("bits")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = withSig.select(col(idCol),
      posexplode(col("sig")).as(Seq("band", "key")))
    val candidates = banded.select(col(idCol).as("id_a"), col("band"), col("key"))
      .join(banded.select(col(idCol).as("id_b"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val vecs = withSig.select(col(idCol), col("norm"))
    candidates
      .join(vecs.select(col(idCol).as("id_a"), col("norm").as("n_a")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col("norm").as("n_b")), Seq("id_b"))
      .withColumn("cos", dot(col("n_a"), col("n_b")))
      .filter(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Maximal-marginal-relevance diverse top-k (Carbonell & Goldstein
    * SIGIR'98): greedily select k candidates maximizing
    * `λ·cos(q, e) − (1−λ)·max_{s∈S} cos(e, s)` — relevance traded
    * against redundancy with the already-selected set, the selection
    * rule for diverse retrieval / few-shot example picking where plain
    * top-k returns k near-copies of the same document.
    *
    * Scale shape: MMR is inherently sequential in k, so the driver loop
    * runs exactly k rounds (k = a result page or few-shot budget — a
    * small constant, the documented budget). Each round is ONE
    * partial-aggregable argmax over the candidate frame (max_by struct
    * ordering, no sort, no window), and the diversity penalty updates
    * against the single just-selected vector broadcast as a 1-row
    * frame. Per-round `localCheckpoint` keeps lineage depth O(1)
    * instead of O(k). Scores are rounded (id tie-break) so the greedy
    * trajectory is deterministic — float-determinism policy class 2. */
  def mmrTopK(corpus: DataFrame, query: DataFrame, k: Int,
      lambda: Double = 0.7, idCol: String = "vec_id",
      embCol: String = "embedding", roundTo: Int = 9): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = withNormalized(query, embCol)
      .select(col(idCol).as("query_id"), col("norm").as("q_norm"))
    // candidates carry (id, norm, rel, pen): pen = max cos to the
    // selected set so far (0 for the empty set, the standard MMR base)
    var cand = withNormalized(corpus, embCol)
      .select(col(idCol).as("id"), col("norm"))
      .join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("rel", round(dot(col("q_norm"), col("norm")), roundTo))
      .select(col("id"), col("norm"), col("rel"), lit(0.0).as("pen"))
      .localCheckpoint(true)
    val picked = Seq.newBuilder[(Int, Long, Double, Double)]
    var exhausted = false
    for (rank <- 1 to k if !exhausted) {
      val top = cand
        .withColumn("mmr", round(lit(lambda) * col("rel")
          - lit(1.0 - lambda) * col("pen"), roundTo))
        // deterministic argmax: higher mmr, then smaller id (struct
        // comparison is lexicographic; -id makes max prefer small ids)
        .agg(max(struct(col("mmr"), -col("id"), col("id").as("sid"),
          col("rel").as("srel"), col("norm").as("snorm"))).as("t"))
        .select(col("t.sid"), col("t.srel"), col("t.mmr"), col("t.snorm"))
        .collect()(0) // 1 row per round, k rounds — the documented budget
      // max over an empty frame is a NULL struct: the candidate pool ran
      // dry (k > candidates, or an empty corpus) — return the picks so
      // far instead of crashing on getLong
      if (top.isNullAt(0)) exhausted = true
      else {
        val (selId, selRel, selMmr) = (top.getLong(0), top.getDouble(1), top.getDouble(2))
        picked += ((rank, selId, selRel, selMmr))
        if (rank < k) {
          val sel = Seq(Tuple1(top.getSeq[Double](3))).toDF("sel_norm")
          cand = cand.filter(col("id") =!= selId)
            .crossJoin(broadcast(sel))
            .withColumn("pen", greatest(col("pen"),
              round(dot(col("norm"), col("sel_norm")), roundTo)))
            .drop("sel_norm")
            .localCheckpoint(true)
        }
      }
    }
    picked.result().toDF("rank", "vec_id", "relevance", "mmr_score")
  }

  /** Incremental IVF maintenance: assign a batch of NEW vectors to the
    * nearest existing centroid — the index-update path that does NOT
    * re-run k-means or touch the already-indexed corpus (the ANN twin
    * of the incremental-dedup contract: history is never re-processed).
    * Assignment ranks cells by the same Euclidean expansion the search
    * path uses (`|c|² − 2·e·c`; `|e|²` is constant per vector), which
    * is exactly KMeans.transform's nearest-centroid rule — equivalence
    * is spec-pinned. Appending the result to the cell-partitioned index
    * parquet is a partition-local write; probed-cell search then sees
    * old and new vectors alike. */
  def ivfAssign(delta: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val d = withNormalized(delta, embCol)
      .select(col(idCol), col("norm"))
    d.join(broadcast(centroids), lit(true))
      .withColumn("cdist",
        dot(col("centroid"), col("centroid"))
          - lit(2.0) * dot(col("norm"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("cdist").asc, col("cell").asc)))
      .filter(col("crank") === 1)
      .select(col(idCol), col("cell"), col("norm"))
  }
}
