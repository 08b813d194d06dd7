package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *  - `bruteForceTopK`: exact cosine top-k of a SMALL broadcast query set
  *    against the corpus — the correctness baseline and the right tool when
  *    |queries| is tiny (the scan dominates; one pass, no index);
  *  - `lshTopK`: random-hyperplane LSH — corpus bucketed once, candidates
  *    from an equi-join on (table, bucket), exact cosine re-rank on the
  *    candidates only. Sub-linear candidate sets; the scale path.
  *
  * All dot products run in double via `zip_with` + `aggregate` (codegen'd
  * higher-order functions — no UDF in the hot path). Hyperplanes are
  * deterministic Rademacher ±1 vectors derived from xxhash64 — identical
  * buckets on every run with zero stored index state.
  */
object Similarity {

  /** Cosine similarity of two float vectors, accumulated in double with a
    * strict left fold — the SAME summation order as DuckDB's
    * list_cosine_similarity, so oracle hash matches hold bit-for-bit.
    * A native Catalyst expression (`graft.plans.CosineExpression`): reads
    * the unsafe array buffers directly inside whole-stage codegen — no
    * per-row Seq[Float] conversion, no codegen fence (the successive
    * renderings measured here: interpreted HOFs ~10 µs/element → JIT UDF
    * ~100× better → native expression drops the remaining per-row copy). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.CosineExpression(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The prior JIT-UDF rendering, kept as the parity reference —
    * SimilaritySpec asserts the native expression is bit-identical to it. */
  private[llm] val cosineUdfRef = udf { (a: Seq[Float], b: Seq[Float]) =>
    // Invalid vectors → NULL (sorts LAST under desc ordering), never 0.0 —
    // a 0.0 score would outrank every anti-correlated real match.
    if (a == null || b == null || a.isEmpty || a.length != b.length) Option.empty[Double]
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      Some(if (denom == 0.0) 0.0 else dot / denom)
    }
  }

  /** Exact top-k: corpus × broadcast(queries) → k best matches per query.
    * Output: (q_id, vec_id, cosine, rank). */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), col(embCol).as("q_emb")))
    val scored = corpus
      .select(col(idCol).as("vec_id"), col(embCol).as("emb"))
      .join(q, col("vec_id") =!= col("q_id")) // broadcast nested loop — q is tiny
      .select(col("q_id"), col("vec_id"), cosine(col("emb"), col("q_emb")).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Rademacher ±1 hyperplane signs for (table, bit, dim), derived from a
    * splitmix64 of the indices — deterministic, no stored index state. The
    * tensor is tables×bits×dims bytes (a few KB), memoized per JVM: without
    * the cache every corpus row re-derives every sign (tables·bits·dims
    * splitmix rounds per row — measured as the dominant cost of the
    * bucketing pass at 128-dim embeddings). */
  private object Hyperplanes {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Byte]]()
    def signs(tables: Int, bits: Int, dims: Int): Array[Byte] =
      cache.computeIfAbsent((tables, bits, dims), { case (t0, b0, d0) =>
        val out = new Array[Byte](t0 * b0 * d0)
        var t = 0
        while (t < t0) {
          var bit = 0
          while (bit < b0) {
            var d = 0
            while (d < d0) {
              var z = (t.toLong << 42) + (bit.toLong << 21) + d + 0x9E3779B97F4A7C15L
              z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
              z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
              z ^= z >>> 31
              out((t * b0 + bit) * d0 + d) = if ((z & 1L) == 0L) 1 else -1
              d += 1
            }
            bit += 1
          }
          t += 1
        }
        out
      })
  }

  /** All hash-table sign-buckets of one embedding, as a JIT-compiled loop.
    * (The Column-expression rendering — tables × bits interpreted
    * zip_with/aggregate passes — measured ~14 ms/row; this is ~100× less.)
    * Same splitmix64 sign family as always — the memoized tensor only
    * removes the per-row re-derivation. */
  private val bucketsUdf = udf { (emb: Seq[Float], tables: Int, bits: Int) =>
    if (emb == null || emb.isEmpty) Array.empty[Long] // drop-not-fail (F18)
    else {
      val dims = emb.length
      val signs = Hyperplanes.signs(tables, bits, dims)
      val e = emb.toArray
      Array.tabulate(tables) { t =>
        var bucket = 0L
        var bit = 0
        while (bit < bits) {
          var proj = 0.0
          val base = (t * bits + bit) * dims
          var d = 0
          while (d < dims) {
            proj += signs(base + d) * e(d).toDouble
            d += 1
          }
          if (proj >= 0) bucket |= (1L << bit)
          bit += 1
        }
        bucket
      }
    }
  }

  /** Corpus → (vec_id, table, bucket) — one row per hash table. */
  def lshBuckets(
      corpus: DataFrame, tables: Int, bits: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.select(
      col(idCol).as("vec_id"),
      bucketsUdf(col(embCol), lit(tables), lit(bits)).as("buckets"))
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("table", "bucket")))

  /** LSH-bucketed ANN: candidates share a bucket in ≥1 table; exact cosine
    * re-rank on candidates only. Output: (q_id, vec_id, cosine, rank).
    *
    * Tuning: collision prob per table ≈ (1 − θ/π)^bits. Near-dup hunting
    * (cosine ≈ 1) tolerates many bits (tiny buckets); recall of MODERATE-
    * similarity top-k needs fewer bits and more tables (e.g. 16×4) at the
    * cost of larger candidate sets. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 8, bits: Int = 12,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val cb = lshBuckets(corpus, tables, bits, idCol, embCol)
    val qb = broadcast(lshBuckets(queries, tables, bits, idCol, embCol)
      .withColumnRenamed("vec_id", "q_id"))
    val candidates = cb.join(qb, Seq("table", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()

    val scored = candidates
      .join(corpus.select(col(idCol).as("vec_id"), col(embCol).as("emb")), "vec_id")
      .join(broadcast(queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))), "q_id")
      .select(col("q_id"), col("vec_id"), cosine(col("emb"), col("q_emb")).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** L2-normalize a float vector into a unit double vector with a strict
    * left-fold norm. Bit-deterministic, and scale-invariant for power-of-two
    * scalings — fl((2x)/(2n)) == fl(x/n) — which the planted-copy IVF oracle
    * relies on: a ×2/×4/×8 copy normalizes to the bit-identical unit vector
    * and therefore always lands in the same coarse cell as its original. */
  private[llm] def normalize(emb: Seq[Float]): Option[Array[Double]] =
    if (emb == null || emb.isEmpty) None
    else {
      var ss = 0.0
      var i = 0
      while (i < emb.length) { val x = emb(i).toDouble; ss += x * x; i += 1 }
      if (ss == 0.0) None
      else {
        val n = math.sqrt(ss)
        val out = new Array[Double](emb.length)
        i = 0
        while (i < emb.length) { out(i) = emb(i).toDouble / n; i += 1 }
        Some(out)
      }
    }

  private val normalizeVecUdf = udf { (emb: Seq[Float]) =>
    normalize(emb).map(Vectors.dense)
  }

  /** The `n` nearest coarse cells of a vector (squared-L2 over unit vectors
    * ≙ cosine order; ties break on cell id). The SAME function assigns the
    * corpus (n=1) and probes the queries (n=nprobe), so identical vectors
    * are guaranteed to meet — the model's own `transform` is deliberately
    * not used for assignment. */
  private def nearestCellsUdf(centers: Array[Array[Double]], n: Int) =
    udf { (emb: Seq[Float]) =>
      normalize(emb) match {
        case None => Array.empty[Int] // drop-not-fail (F18)
        case Some(v) =>
          centers.zipWithIndex.map { case (c, i) =>
            var d = 0.0
            var j = 0
            while (j < v.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            (d, i)
          }.sortBy(identity).take(n).map(_._2)
      }
    }

  /** IVF (inverted-file) ANN: a spherical k-means coarse quantizer splits
    * the corpus into `nlist` cells; each query probes its `nprobe` nearest
    * cells and exact-cosine re-ranks only those candidates.
    *
    * 100 TB shape: the quantizer trains on normalized vectors (sample the
    * corpus first at real scale — IVF practice is to train on ~1M vectors
    * regardless of corpus size); the centroid table is nlist×dims doubles
    * (KBs — broadcast in the task closure); corpus assignment is one
    * narrow map pass; and the candidate join is an equi-join on the cell
    * id touching ~nprobe/nlist of the corpus per query. Nothing here is
    * quadratic and no raw corpus row is shuffled more than once. */
  /** Train the spherical k-means coarse quantizer and return its centroids.
    *
    * The quantizer only needs a representative sample — IVF practice trains
    * on ~1M vectors regardless of corpus size (the coarse cells barely move
    * past that, and an unsampled fit over 100 TB of embeddings would make
    * k-means itself the bottleneck). Seeded per-partition reservoirs, not
    * fraction-sample + limit: a fraction needs a full count() job first to
    * size it, and GlobalLimit funnels the survivors into ONE partition —
    * serializing the fit on a single task, the exact bottleneck sampling
    * exists to avoid. The reservoir pass is single-scan, shuffle-free,
    * keeps the corpus partitioning (fit stays parallel), and caps the
    * total at maxTrainVectors; partitions smaller than their quota pass
    * through whole, so small corpora train un-sampled with no size branch. */
  private def trainQuantizer(
      corpus: DataFrame, nlist: Int, seed: Long, maxIter: Int,
      maxTrainVectors: Int, embCol: String): Array[Array[Double]] = {
    val candidates = corpus
      .select(normalizeVecUdf(col(embCol)).as("nv"))
      .where(col("nv").isNotNull)
    val spark = corpus.sparkSession
    // More input splits than the cap (the 100 TB shape): merge splits first
    // — coalesce is shuffle-free — so the per-partition quota stays ≥ 1
    // WITHOUT the quota floor silently raising the total above
    // maxTrainVectors (quota × partitions ≤ maxTrainVectors always).
    val raw = candidates.rdd
    val candRdd =
      if (raw.getNumPartitions > maxTrainVectors) raw.coalesce(maxTrainVectors)
      else raw
    val quota = math.max(1, maxTrainVectors / math.max(1, candRdd.getNumPartitions))
    val sampled = candRdd.mapPartitionsWithIndex { (pi, it) =>
      // Algorithm R, seeded by (seed, partition) — deterministic for a
      // fixed file layout, uniform within each partition.
      val rng = new java.util.Random(seed ^ (pi.toLong * 0x9E3779B97F4A7C15L))
      val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      var seen = 0L
      it.foreach { row =>
        seen += 1
        if (buf.length < quota) buf += row
        else {
          val j = (rng.nextDouble() * seen).toLong
          if (j < quota) buf(j.toInt) = row
        }
      }
      buf.iterator
    }
    val train = spark.createDataFrame(sampled, candidates.schema)
    new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("nv")
      .fit(train)
      .clusterCenters.map(_.toArray)
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L, maxIter: Int = 10,
      maxTrainVectors: Int = 1000000,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val centers = trainQuantizer(corpus, nlist, seed, maxIter, maxTrainVectors, embCol)

    val cb = corpus.select(
      col(idCol).as("vec_id"), col(embCol).as("emb"),
      explode(nearestCellsUdf(centers, 1)(col(embCol))).as("cell"))
    val qb = broadcast(queries.select(
      col(idCol).as("q_id"), col(embCol).as("q_emb"),
      explode(nearestCellsUdf(centers, nprobe)(col(embCol))).as("cell")))
    val scored = cb.join(qb, "cell")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine(col("emb"), col("q_emb")).as("cosine"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus with the IVF coarse quantizer, compare pairs WITHIN
    * each cluster only, and drop the higher-id member of every pair above
    * the cosine threshold — each semantic-duplicate group keeps its
    * lowest-id representative. Returns the kept corpus.
    *
    * 100 TB shape: candidate generation is an equi-join on the cell id, so
    * the pair space is Σ|cell|², not |corpus|² — size nlist so cells stay
    * bounded (nlist ≈ corpus/50k keeps cells ~50k) exactly as the paper
    * prescribes; the quantizer itself trains on the bounded reservoir
    * sample. Deterministic end to end: seeded k-means, same assignment
    * function for every row, lowest-id representative rule. */
  /** The ids `semanticDedup` drops — the higher-id member of every
    * within-cell pair at or above the threshold. Exposed separately so
    * callers needing the drop list (audit trails, the oracle query) don't
    * re-derive it by double-anti-joining the kept set. */
  def semanticDuplicates(
      corpus: DataFrame, threshold: Double,
      nlist: Int = 16, seed: Long = 42L, maxIter: Int = 10,
      maxTrainVectors: Int = 1000000,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val centers = trainQuantizer(corpus, nlist, seed, maxIter, maxTrainVectors, embCol)
    val cells = corpus.select(
      col(idCol).as("vec_id"), col(embCol).as("emb"),
      explode(nearestCellsUdf(centers, 1)(col(embCol))).as("cell"))
    cells.select(col("cell"), col("vec_id").as("id_a"), col("emb").as("emb_a"))
      .join(cells.select(col("cell"), col("vec_id").as("id_b"), col("emb").as("emb_b")),
        Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .where(cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
  }

  def semanticDedup(
      corpus: DataFrame, threshold: Double,
      nlist: Int = 16, seed: Long = 42L, maxIter: Int = 10,
      maxTrainVectors: Int = 1000000,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    corpus.join(
      semanticDuplicates(corpus, threshold, nlist, seed, maxIter, maxTrainVectors,
        idCol, embCol),
      Seq(idCol), "left_anti")

  /** Embedding-cosine near-dup: all pairs above a cosine threshold, found
    * through LSH buckets (id_a < id_b, no crossJoin). */
  def embeddingNearDup(
      corpus: DataFrame, threshold: Double,
      tables: Int = 8, bits: Int = 12,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val b = lshBuckets(corpus, tables, bits, idCol, embCol)
    val pairs = b.select(col("table"), col("bucket"), col("vec_id").as("id_a"))
      .join(b.select(col("table"), col("bucket"), col("vec_id").as("id_b")),
        Seq("table", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(corpus.select(col(idCol).as("id_a"), col(embCol).as("emb_a")), "id_a")
      .join(corpus.select(col(idCol).as("id_b"), col(embCol).as("emb_b")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Exact-integer Lloyd (k-means) training of per-subspace PQ codebooks
    * over a quantized-lattice frame `(idCol, qvCol: array<bigint>)` —
    * deterministic AND restatable, so the trained two-stage ANN search
    * stays hash-gated end to end:
    *
    *  - INIT: `ksub` training vectors picked by a Knuth multiplicative-
    *    hash shuffle of ids (`(id·2654435761) mod 2^32`, ties by id) — a
    *    seeded deterministic sample, never "first k", which inherits
    *    whatever skew the id order carries (the round-10/11 flag this
    *    trainer closes);
    *  - ITERATE: each Lloyd step assigns train subvectors to their
    *    nearest code (exact lattice L2, ties to the smaller code) and
    *    re-centers every code at the per-dimension floor(mean) back ON
    *    the lattice — integer sums are exact, and one IEEE divide + floor
    *    is bit-identical across engines. Empty codes keep their previous
    *    centroid.
    *
    * The m=1 case IS the coarse quantizer (one "subspace" = the full
    * vector), so IVF seeds train through the same device.
    *
    * 100 TB shape: the train set is bounded by `trainMod` (modulo
    * sampling — deterministic and restatable; [[trainQuantizer]]'s seeded
    * reservoir is the non-oracled production alternative when ids are
    * adversarial), each iteration is one broadcast join + aggregation
    * over the cached train subset, and the collected model is
    * m × ksub × (dims/m) longs — KBs of driver state: the codebook
    * itself, which then broadcasts into the search. */
  private[graft] def trainCodebookExact(
      quantized: DataFrame, m: Int, ksub: Int, iters: Int, trainMod: Int = 1,
      idCol: String = "vec_id", qvCol: String = "qv"): Array[Array[Array[Long]]] =
    trainCodebooksExact(quantized, Seq((m, ksub)), iters, trainMod, idCol, qvCol).head

  /** Train SEVERAL codebooks in shared Spark jobs — IVF+PQ needs both the
    * coarse quantizer (m=1) and the PQ codebooks (m=8), whose Lloyd
    * iterations are independent of each other, so each iteration runs as
    * ONE job over a union of g-tagged subvector frames instead of one job
    * per codebook (training wall time is job-count-dominated: the per-
    * iteration math is KBs of codebook against the bounded train set).
    * The hash-shuffle init is shared too: every spec takes the first
    * `ksub_g` vectors of the SAME deterministic order, so one
    * TakeOrdered(max ksub) collect seeds all of them — which is also
    * exactly what the per-codebook oracle restatement computes. */
  private[graft] def trainCodebooksExact(
      quantized: DataFrame, specs: Seq[(Int, Int)], iters: Int,
      trainMod: Int = 1,
      idCol: String = "vec_id", qvCol: String = "qv",
      maxDriverTrain: Long = 200000L): Seq[Array[Array[Array[Long]]]] = {
    val spark = quantized.sparkSession
    val base = quantized.select(col(idCol).cast("long").as("vec_id"), col(qvCol).as("qv"))
    val train =
      if (trainMod > 1) base.where(col("vec_id") % trainMod === 0) else base
    val maxK = specs.map(_._2).max
    // Size probe and driver fetch in ONE incremental job: CollectLimit
    // stops scanning once maxDriverTrain+1 rows arrive, so an oversized
    // train set costs one bounded probe, and a bounded one arrives whole.
    val probe = train.limit((maxDriverTrain + 1).toInt).collect()
    require(probe.nonEmpty, "trainCodebooksExact: empty training set")
    if (probe.length <= maxDriverTrain) {
      // The FAISS discipline: quantizers fit IN MEMORY on the bounded
      // train sample (`trainMod` is the bound; a 100 TB corpus samples
      // to ~1M vectors regardless of size) — one collect, zero
      // per-iteration job overhead, bit-identical integer math to the
      // distributed loop below (TrainCodebookSpec pins the equality).
      val vecs = probe
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy { case (id, _) => ((id * 2654435761L) % 4294967296L, id) }
        .map(_._2)
      trainInMemory(vecs, specs, iters)
    } else {
      val trainC = train.cache()
      try {
        // Oversized train set: the same Lloyd steps as distributed jobs.
        // All specs' iterations fuse into ONE job each over a g-tagged
        // union of subvector frames (per-iteration math is KBs of
        // codebook against the train set; wall time is job-count-bound).
        val initRows = trainC
          .withColumn("hk", expr("(vec_id * 2654435761L) % 4294967296L"))
          .orderBy("hk", "vec_id").limit(maxK)
          .select("hk", "vec_id", "qv").collect()
          .sortBy(r => (r.getLong(0), r.getLong(1)))
          .map(_.getSeq[Long](2).toArray)
        val dims = initRows(0).length
        val subExprs = specs.zipWithIndex.map { case ((m, _), g) =>
          val sd = dims / m
          s"""transform(sequence(0, ${m - 1}),
             |          mm -> struct($g AS g, mm AS m, slice(qv, $sd * mm + 1, $sd) AS sq))""".stripMargin
        }
        val sub = trainC.select(col("vec_id"),
          explode(expr(subExprs.mkString("concat(", ", ", ")"))).as("t"))
          .select(col("vec_id"), col("t.g").as("g"), col("t.m").as("m"),
            col("t.sq").as("sq"))
        var cbs: Seq[Array[Array[Array[Long]]]] = specs.map { case (m, k) =>
          val sd = dims / m
          Array.tabulate(m) { mm =>
            (0 until k).map(c => initRows(c).slice(mm * sd, (mm + 1) * sd)).toArray
          }
        }
        var it = 0
        while (it < iters) {
          val stats = sub.join(broadcast(codebookFrames(spark, cbs)), Seq("g", "m"))
            .select(col("vec_id"), col("g"), col("m"), col("code"), col("sq"),
              l2sq(col("sq"), col("cv")).as("d"))
            .groupBy("vec_id", "g", "m")
            .agg(min(struct(col("d"), col("code"))).as("best"),
              // sq is CONSTANT within each (vec_id, g, m) group, so first()
              // is value-deterministic here
              first(col("sq")).as("sq"))
            .select(col("g"), col("m"), col("best.code").as("code"),
              posexplode(col("sq")).as(Seq("pos", "x")))
            .groupBy("g", "m", "code", "pos")
            .agg(sum("x").as("s"), count(lit(1)).as("n"))
            .collect()
          val next = cbs.map(_.map(_.map(_.clone())))
          stats.foreach { r =>
            val g = r.getInt(0); val mm = r.getInt(1); val code = r.getLong(2).toInt
            val pos = r.getInt(3); val s = r.getLong(4); val n = r.getLong(5)
            // CAST(FLOOR(CAST(sum AS DOUBLE) / n) AS BIGINT): lattice sums
            // stay far inside 2^53, so the divide is one exact-input IEEE op
            next(g)(mm)(code)(pos) = math.floor(s.toDouble / n).toLong
          }
          cbs = next
          it += 1
        }
        cbs
      } finally { trainC.unpersist(); () }
    }
  }

  /** The in-memory rendering of the same Lloyd steps: assignment by exact
    * lattice L2 with (d, code) ties, per-dimension floor(sum/n) re-center
    * in one IEEE divide — operation-for-operation the distributed loop's
    * math, so both paths (and the oracle restatement) agree bitwise.
    * `vecs` arrive in hash-shuffle init order; spec g seeds from the
    * first ksub_g. */
  private def trainInMemory(
      vecs: Array[Array[Long]], specs: Seq[(Int, Int)],
      iters: Int): Seq[Array[Array[Array[Long]]]] = {
    val dims = vecs(0).length
    specs.map { case (m, ksub) =>
      val sd = dims / m
      var cb: Array[Array[Array[Long]]] = Array.tabulate(m) { mm =>
        (0 until ksub).map(c => vecs(c).slice(mm * sd, (mm + 1) * sd)).toArray
      }
      var it = 0
      while (it < iters) {
        val sums = Array.fill(m, ksub, sd)(0L)
        val counts = Array.fill(m, ksub)(0L)
        vecs.foreach { v =>
          var mm = 0
          while (mm < m) {
            val off = mm * sd
            var bestCode = 0
            var bestD = Long.MaxValue
            var c = 0
            while (c < ksub) {
              val cv = cb(mm)(c)
              var d = 0L
              var i = 0
              while (i < sd) {
                val x = v(off + i) - cv(i); d += x * x; i += 1
              }
              if (d < bestD) { bestD = d; bestCode = c } // ties keep smaller c
              c += 1
            }
            counts(mm)(bestCode) += 1
            var i = 0
            while (i < sd) { sums(mm)(bestCode)(i) += v(off + i); i += 1 }
            mm += 1
          }
        }
        val next = cb.map(_.map(_.clone()))
        var mm = 0
        while (mm < m) {
          var c = 0
          while (c < ksub) {
            val n = counts(mm)(c)
            if (n > 0L) {
              var i = 0
              while (i < sd) {
                next(mm)(c)(i) = math.floor(sums(mm)(c)(i).toDouble / n).toLong
                i += 1
              }
            } // empty code keeps its previous centroid
            c += 1
          }
          mm += 1
        }
        cb = next
        it += 1
      }
      cb
    }
  }

  /** All codebooks as one g-tagged literal frame (g, m, code, cv). */
  private def codebookFrames(
      spark: org.apache.spark.sql.SparkSession,
      cbs: Seq[Array[Array[Array[Long]]]]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = for {
      g <- cbs.indices; mm <- cbs(g).indices; code <- cbs(g)(mm).indices
    } yield org.apache.spark.sql.Row(g, mm, code.toLong, cbs(g)(mm)(code).toSeq)
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("g", IntegerType, nullable = false),
        StructField("m", IntegerType, nullable = false),
        StructField("code", LongType, nullable = false),
        StructField("cv", ArrayType(LongType, containsNull = false), nullable = false))))
  }

  /** A trained codebook as a broadcastable literal frame (m, code, cv). */
  private[graft] def codebookFrame(
      spark: org.apache.spark.sql.SparkSession,
      cb: Array[Array[Array[Long]]]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = for { mm <- cb.indices; code <- cb(mm).indices }
      yield org.apache.spark.sql.Row(mm, code.toLong, cb(mm)(code).toSeq)
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("m", IntegerType, nullable = false),
        StructField("code", LongType, nullable = false),
        StructField("cv", ArrayType(LongType, containsNull = false), nullable = false))))
  }

  /** PQ asymmetric-distance search (Jégou et al.) over a QUANTIZED-lattice
    * vector frame `(idCol, qvCol: array<bigint>)`: vectors are stored as
    * `m` subspace codes against a codebook — Lloyd-TRAINED in exact
    * lattice integers when `trainIters > 0` ([[trainCodebookExact]]; the
    * production path), or the first `ksub` vectors' subvectors when 0
    * (the legacy toy device, kept for spec baselines); each query builds
    * a (m × ksub)-entry exact distance LUT (bounded by the query batch —
    * the ADC contract), the approximate distance is m table lookups
    * summed per (query, vector), and the `shortlist` best by ADC are
    * exactly re-ranked with the codegen'd `l2_sq` to the final `k`. All
    * integer arithmetic — training included — so the result is
    * deterministic and exactly restatable, which is how `llm_ann_pq_adc`
    * hash-gates it; `PqAdcRecallSpec` gates its retrieval quality against
    * brute force on clustered corpora.
    * Output: (q_id, rank, vec_id, adc_dist, exact_dist). */
  def pqAdcTopK(
      quantized: DataFrame, queryIds: Column => Column, k: Int,
      m: Int = 4, ksub: Int = 4, shortlist: Int = 10,
      trainIters: Int = 0, trainMod: Int = 1,
      idCol: String = "vec_id", qvCol: String = "qv"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = s"size($qvCol) DIV $m"
    val q = quantized.select(col(idCol).as("vec_id"), col(qvCol).as("qv"))
    val sub = q.select(col("vec_id"), explode(expr(
      s"""transform(sequence(0, ${m - 1}),
         |          mm -> struct(mm AS m, slice(qv, ($dim) * mm + 1, $dim) AS sq))""".stripMargin)).as("t"))
      .select(col("vec_id"), col("t.m").as("m"), col("t.sq").as("sq"))
    val cb =
      if (trainIters > 0)
        codebookFrame(quantized.sparkSession,
          trainCodebookExact(quantized, m, ksub, trainIters, trainMod, idCol, qvCol))
      else sub.where(col("vec_id") < ksub)
        .select(col("m"), col("vec_id").as("code"), col("sq").as("cv"))
    val codes = sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("code"), l2sq(col("sq"), col("cv")).as("d"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.code").as("code"))
    val lut = sub.where(queryIds(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("m"), col("sq").as("qs"))
      .join(broadcast(cb), "m")
      .select(col("q_id"), col("m"), col("code"), l2sq(col("qs"), col("cv")).as("ld"))
    val adc = codes.join(broadcast(lut), Seq("m", "code"))
      .groupBy("q_id", "vec_id")
      .agg(sum("ld").as("adc_dist"))
    val wShort = Window.partitionBy("q_id").orderBy(col("adc_dist"), col("vec_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= shortlist).drop("srn")
    val wRank = Window.partitionBy("q_id").orderBy(col("exact_dist"), col("vec_id"))
    short
      .join(q, "vec_id")
      .join(broadcast(q.where(queryIds(col("vec_id")))
        .select(col("vec_id").as("q_id"), col("qv").as("qq"))), "q_id")
      .withColumn("exact_dist", l2sq(col("qv"), col("qq")))
      .withColumn("rank", row_number().over(wRank).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_dist"),
        col("exact_dist"))
  }

  /** IVF + PQ composition — the billion-vector serving architecture
    * (FAISS IVFPQ): a coarse quantizer assigns every vector to the cell of
    * its nearest centroid (Lloyd-trained in exact lattice integers when
    * `trainIters > 0` — [[trainCodebookExact]] at m=1, the production
    * path; the first `nSeeds` vectors when 0 — the legacy
    * `llm_kmeans_assign` device), each query probes its `nprobe` nearest
    * cells, and ONLY the probed cells' vectors are ADC-scored against the
    * (likewise trained) PQ codebooks (codes join the candidate set before
    * the LUT join — the scan prunes BEFORE any distance work, which is
    * the whole point of the coarse stage). The shortlist re-ranks exactly
    * with `l2_sq`. All integer arithmetic, training included →
    * deterministic and exactly restatable.
    * Output: (q_id, rank, vec_id, adc_dist, exact_dist). */
  def ivfPqTopK(
      quantized: DataFrame, queryIds: Column => Column, k: Int,
      nSeeds: Int = 8, nprobe: Int = 2, m: Int = 4, ksub: Int = 4,
      shortlist: Int = 10,
      trainIters: Int = 0, trainMod: Int = 1,
      idCol: String = "vec_id", qvCol: String = "qv",
      excludeLabelCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quantized.select(col(idCol).as("vec_id"), col(qvCol).as("qv"))
    // both levels train through ONE shared job sequence (coarse = m=1)
    val trainedCbs =
      if (trainIters > 0)
        Some(trainCodebooksExact(quantized, Seq((1, nSeeds), (m, ksub)),
          trainIters, trainMod, idCol, qvCol))
      else None
    val seeds = trainedCbs match {
      case Some(cbs) =>
        codebookFrame(quantized.sparkSession, cbs.head)
          .select(col("code").as("seed"), col("cv").as("sv"))
      case None => q.where(col("vec_id") < nSeeds)
        .select(col("vec_id").as("seed"), col("qv").as("sv"))
    }
    // coarse assignment: nearest seed, tie to the smaller seed id
    val assign = q.crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("seed"), l2sq(col("qv"), col("sv")).as("d"))
      .groupBy("vec_id")
      .agg(min(struct(col("d"), col("seed"))).as("best"))
      .select(col("vec_id"), col("best.seed").as("cell"))
    // PQ codes from the same subvector device the search stage uses
    val sub = subvectors(q, m)
    val cb = trainedCbs match {
      case Some(cbs) => codebookFrame(quantized.sparkSession, cbs(1))
      case None => sub.where(col("vec_id") < ksub)
        .select(col("m"), col("vec_id").as("code"), col("sq").as("cv"))
    }
    val codes = sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("code"), l2sq(col("sq"), col("cv")).as("d"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.code").as("code"))
    val labels = excludeLabelCol.map(lc =>
      quantized.select(col(idCol).as("vec_id"), col(lc).as("lbl")))
    ivfPqSearchStage(q, seeds, cb, assign, codes, labels,
      queryIds, k, nprobe, m, shortlist)
  }

  /** One row per (vec_id, m, sq): the m-way subvector split. */
  private def subvectors(q: DataFrame, m: Int): DataFrame =
    q.select(col("vec_id"), explode(expr(
      s"""transform(sequence(0, ${m - 1}),
         |          mm -> struct(mm AS m, slice(qv, (size(qv) DIV $m) * mm + 1,
         |                                       size(qv) DIV $m) AS sq))""".stripMargin)).as("t"))
      .select(col("vec_id"), col("t.m").as("m"), col("t.sq").as("sq"))

  /** The IVF+PQ SEARCH stage over an already-built index: probe nprobe
    * nearest cells per query, prune candidates to probed cells (and,
    * optionally, the opposite label class) BEFORE any distance work,
    * ADC-score via per-query LUTs, exact-re-rank the shortlist. Shared by
    * [[ivfPqTopK]] (which builds the index inline) and
    * [[ivfPqTopKFromIndex]] (which serves a stream-maintained one) — one
    * search, two index provenances, so their results can be compared
    * hash-for-hash. */
  private[graft] def ivfPqSearchStage(
      q: DataFrame, seeds: DataFrame, cb: DataFrame,
      assign: DataFrame, codes: DataFrame, labels: Option[DataFrame],
      queryIds: Column => Column, k: Int, nprobe: Int, m: Int,
      shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // query probes: nprobe nearest cells each
    val wProbe = Window.partitionBy("q_id").orderBy(col("d"), col("seed"))
    val probes = q.where(queryIds(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("qv").as("qq"))
      .crossJoin(broadcast(seeds))
      .select(col("q_id"), col("seed"), l2sq(col("qq"), col("sv")).as("d"))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nprobe)
      .select(col("q_id"), col("seed").as("cell"))
    // candidate set: vectors living in a probed cell — optionally minus
    // the query's own label class (the hard-negative-mining composition).
    // The label filter lands BEFORE any distance work, with the prune.
    val cand0 = assign.join(broadcast(probes), "cell")
      .select(col("q_id"), col("vec_id"))
    val cand = labels match {
      case Some(lb) =>
        cand0.join(lb, "vec_id")
          .join(broadcast(lb.where(queryIds(col("vec_id")))
            .select(col("vec_id").as("q_id"), col("lbl").as("p_lbl"))), "q_id")
          .where(col("lbl") =!= col("p_lbl"))
          .select(col("q_id"), col("vec_id"))
      case None => cand0
    }
    // per-query LUTs (the pqAdcTopK device)
    val lut = subvectors(q, m).where(queryIds(col("vec_id")))
      .select(col("vec_id").as("q_id"), col("m"), col("sq").as("qs"))
      .join(broadcast(cb), "m")
      .select(col("q_id"), col("m"), col("code"), l2sq(col("qs"), col("cv")).as("ld"))
    // ADC restricted to the probed candidates: the scan prunes FIRST
    val adc = codes.join(cand, "vec_id")
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy("q_id", "vec_id")
      .agg(sum("ld").as("adc_dist"))
    val wShort = Window.partitionBy("q_id").orderBy(col("adc_dist"), col("vec_id"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .where(col("srn") <= shortlist).drop("srn")
    val wRank = Window.partitionBy("q_id").orderBy(col("exact_dist"), col("vec_id"))
    short
      .join(q, "vec_id")
      .join(broadcast(q.where(queryIds(col("vec_id")))
        .select(col("vec_id").as("q_id"), col("qv").as("qq2"))), "q_id")
      .withColumn("exact_dist", l2sq(col("qv"), col("qq2")))
      .withColumn("rank", row_number().over(wRank).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"), col("adc_dist"),
        col("exact_dist"))
  }

  /** IVF+PQ search served from a PRE-BUILT index frame
    * `(vec_id, cell, codes: array<bigint>)` — the stream-maintained
    * snapshot path: assignments and PQ codes were computed at ingest
    * against the trained codebooks `cbs` (coarse first, PQ second — the
    * [[trainCodebooksExact]] output), so queries never touch raw corpus
    * vectors except for the bounded query set and the shortlist re-rank.
    * Identical search semantics to [[ivfPqTopK]] by construction. */
  def ivfPqTopKFromIndex(
      quantized: DataFrame, index: DataFrame,
      cbs: Seq[Array[Array[Array[Long]]]],
      queryIds: Column => Column, k: Int, nprobe: Int, m: Int,
      shortlist: Int,
      idCol: String = "vec_id", qvCol: String = "qv"): DataFrame = {
    val q = quantized.select(col(idCol).as("vec_id"), col(qvCol).as("qv"))
    val spark = quantized.sparkSession
    val seeds = codebookFrame(spark, cbs.head)
      .select(col("code").as("seed"), col("cv").as("sv"))
    val cb = codebookFrame(spark, cbs(1))
    val assign = index.select(col("vec_id"), col("cell"))
    val codes = index.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("m", "code")))
    ivfPqSearchStage(q, seeds, cb, assign, codes, labels = None,
      queryIds, k, nprobe, m, shortlist)
  }

  /** Exact squared L2 via the native codegen'd expression. */
  private def l2sq(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.L2SqExpression(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))
}
