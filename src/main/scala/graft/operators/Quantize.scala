package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functional.MayFail
import graft.functions.VectorFunctions.{pqAdcScore, portablePqCodes, portablePqTable, vecCosine, vecCosineDouble, vecDot}

/** Embedding quantization: per-vector int8 scalar quantization (SQ8),
  * 1-bit binary (sign) quantization, and approximate kNN over either
  * code family with exact float rerank.
  *
  * At 100 TB the embedding store, not the compute, is the bottleneck —
  * SQ8 stores each dimension in one byte (`array<tinyint>` in Tungsten
  * rows and parquet) plus two doubles per vector: 4x smaller than
  * float32, with reconstruction error bounded by `(max-min)/510` per
  * dimension. The quantization is per-vector min/max (no trained
  * codebook), so encode/decode are pure column expressions any engine can
  * recompute bit-for-bit — the same portability property as
  * [[Dedup.portableSimhash]].
  */
object Quantize {

  private def encoded(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol), col(vecCol),
        array_min(col(vecCol)).cast("double").as("vmin"),
        array_max(col(vecCol)).cast("double").as("vmax"))
      .withColumn("__scale", (col("vmax") - col("vmin")) / lit(255.0))
      // unsigned code floor((x-vmin)/scale + 0.5) in [0,255], stored
      // shifted to [-128,127] so it fits a signed byte (ANSI-safe)
      .withColumn("codes", transform(col(vecCol), x =>
        (when(col("__scale") === lit(0.0), lit(0.0))
          .otherwise(least(lit(255.0), greatest(lit(0.0),
            floor((x.cast("double") - col("vmin")) / col("__scale") + lit(0.5)))))
          .cast("int") - lit(128)).cast("tinyint")))
      .select(col(idCol), col("codes"), col("vmin"), col("vmax"))

  /** Encode: `(idCol, codes: array<tinyint>, vmin, vmax)`. A null vector
    * yields null codes/bounds. */
  def sqEncode(df: DataFrame, vecCol: String, idCol: String): MayFail[DataFrame] =
    MayFail(encoded(df, vecCol, idCol))

  /** Reconstruct the quantized vector as `array<double>`:
    * `vmin + (code+128) * (vmax-vmin)/255`. */
  def sqDecode(codes: Column, vmin: Column, vmax: Column): Column =
    transform(codes, c =>
      vmin + (c.cast("double") + lit(128.0)) * ((vmax - vmin) / lit(255.0)))

  /** 1-bit (sign) binary codes: bit `j` of word `w` set ⟺
    * `vec[32·w + j] > 0` — packed into `array<bigint>` of 32-bit words
    * (32 dims per word keeps every value positive, so the packing
    * replays in any SQL engine with a bigint shift and no sign-bit
    * edge). 32× smaller than float32; Hamming distance between codes
    * approximates angular distance (Charikar 2002 — the same bound
    * behind [[graft.functions.TextFunctions]]'s simhash). */
  private def packBits(v: Column): Column =
    // empty-vector guard: sequence(0, ceil(0/32)-1) would count DOWN to
    // word -1, whose (w*32+j) < size test passes and evaluates
    // element_at at index ≤ 0 — an ANSI error. Empty in, empty out;
    // null in, null out (the when propagates it).
    when(size(v) > 0,
      transform(
        sequence(lit(0), ceil(size(v).cast("double") / 32.0).cast("int") - 1),
        w => aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, j) =>
          acc + when(
            (w * 32 + j) < size(v) && element_at(v, w * 32 + j + 1) > lit(0.0f),
            pow(lit(2.0), j).cast("long")).otherwise(lit(0L)))))
      .otherwise(when(v.isNotNull, array().cast("array<bigint>")))

  /** Encode: `(idCol, bin_code: array<bigint>)`; null vectors yield null
    * codes. */
  def binEncode(df: DataFrame, vecCol: String, idCol: String): MayFail[DataFrame] =
    MayFail(df.select(col(idCol), packBits(col(vecCol)).as("bin_code")))

  /** Hamming distance between two packed codes (popcount of XOR, summed
    * over words). */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, d) => acc + d)

  /** Top-k cosine neighbors via binary-code Hamming shortlist + exact
    * float rerank — [[sqKnn]]'s shape at 32× (instead of 4×)
    * compression: the Hamming scan touches one or two BIGINTs per
    * vector (popcount-cheap), queries broadcast, the same
    * WindowGroupLimit-capped shortlist shuffle, and only the shortlist
    * rejoins the float corpus. The coarser signal wants a larger
    * `shortlistK` than SQ8 for the same recall (QuantizeSpec locks
    * recall; an exhaustive shortlist reproduces exact brute force,
    * which is how the gate checks the full path). */
  def binKnn(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int = 10,
      shortlistK: Int = 200
  ): MayFail[DataFrame] = MayFail {
    require(k >= 1 && shortlistK >= k,
      s"need shortlistK >= k >= 1 (got k=$k, shortlistK=$shortlistK)")
    // null-code rows (null embeddings) are dropped up front: under the
    // ascending Hamming order Spark sorts nulls FIRST, so they would
    // otherwise crowd real neighbors out of the shortlist; ragged
    // dimensions likewise null the zip_with-based distance, so the
    // ordering is additionally nulls-last as a belt-and-braces guard
    val enc = corpus.select(col(idCol).as("neighborId"),
        packBits(col(vecCol)).as("__code"))
      .filter(col("__code").isNotNull)
    val q = queries.select(col(idCol).as("queryId"),
      col(vecCol).as("__qv"), packBits(col(vecCol)).as("__qcode"))
    val scored = enc.join(broadcast(q), col("queryId") =!= col("neighborId"))
      .withColumn("__ham", hammingDistance(col("__qcode"), col("__code")))
    val wGlob = Window.partitionBy(col("queryId"))
      .orderBy(col("__ham").asc_nulls_last, col("neighborId"))
    val shortlist = scored
      .withColumn("__sr", row_number().over(wGlob))
      .filter(col("__sr") <= shortlistK)
      .select(col("queryId"), col("neighborId"))
    rerankShortlist(corpus, vecCol, idCol,
      q.select(col("queryId"), col("__qv")), shortlist, k)
  }

  /** Shared exact-rerank tail of [[sqKnn]] and [[binKnn]]: join the
    * (bounded, broadcast) shortlist back to the float corpus, score the
    * exact cosine, rank-limit to `k`. ONE definition so a tie-break or
    * ordering fix applies to every shortlist family. */
  private def rerankShortlist(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      q: DataFrame, // (queryId, __qv)
      shortlist: DataFrame, // (queryId, neighborId)
      k: Int): DataFrame = {
    val rerank = corpus.select(col(idCol).as("neighborId"), col(vecCol).as("__cv"))
      .join(broadcast(shortlist), Seq("neighborId"))
      .join(broadcast(q), Seq("queryId"))
      .withColumn("cosine", vecCosine(col("__qv"), col("__cv")))
    val wFinal = Window.partitionBy(col("queryId"))
      .orderBy(col("cosine").desc, col("neighborId"))
    rerank.withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("queryId"), col("neighborId"),
        round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Top-k cosine neighbors scored on the quantized reconstruction, then
    * exact-reranked on the original floats.
    *
    * Shape for scale: queries broadcast against the (4x smaller) code
    * scan; a per-partition `row_number` pre-filter caps the shuffle at
    * `shortlistK x partitions` rows per query; only the shortlist —
    * bounded by `queries x shortlistK` — is joined back (broadcast) to
    * the float corpus for the exact rerank, so the full-precision
    * vectors are never shuffled. `shortlistK` trades recall for cost:
    * 4-10x `k` is the usual setting; a shortlist covering the corpus
    * degenerates to exact brute force (how the oracle gates this path).
    */
  def sqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int = 10,
      shortlistK: Int = 100
  ): MayFail[DataFrame] = MayFail {
    require(k >= 1 && shortlistK >= k,
      s"need shortlistK >= k >= 1 (got k=$k, shortlistK=$shortlistK)")
    val enc = encoded(corpus, vecCol, idCol)
      .select(col(idCol).as("neighborId"),
        sqDecode(col("codes"), col("vmin"), col("vmax")).as("__dv"))
    val q = queries.select(col(idCol).as("queryId"),
      col(vecCol).as("__qv"), col(vecCol).cast("array<double>").as("__qd"))
    val scored = enc.join(broadcast(q), col("queryId") =!= col("neighborId"))
      .withColumn("__approx", vecCosineDouble(col("__qd"), col("__dv")))
    // Single window per stage: Spark's partial WindowGroupLimit caps each
    // map partition to shortlistK rows per query before the exchange when
    // shortlistK <= spark.sql.optimizer.windowGroupLimitThreshold (1000)
    // — production shortlists are tens-to-hundreds, inside that bound.
    val wGlob = Window.partitionBy(col("queryId"))
      .orderBy(col("__approx").desc, col("neighborId"))
    val shortlist = scored
      .withColumn("__sr", row_number().over(wGlob))
      .filter(col("__sr") <= shortlistK)
      .select(col("queryId"), col("neighborId"))
    rerankShortlist(corpus, vecCol, idCol,
      q.select(col("queryId"), col("__qv")), shortlist, k)
  }

  /** Product-quantization codes (Jégou et al. 2011) over the portable
    * md5-sign codebook: the vector splits into `m` subspaces and each
    * subvector is assigned its argmax-projection codebook row — `m`
    * small ints replace `dim` floats (m=8, k=16 over 64-dim float32 is
    * 64×ish compression before code packing). The portable codebook is
    * the cross-engine-checkable stand-in for trained per-subspace
    * k-means (the [[graft.functions.PortableClusterAssign]] convention —
    * any engine with `md5()` replays every code); recall of the
    * ADC-ranked search built on it is measurable with
    * [[Similarity.knnRecall]], which is the contract that matters at
    * scale. Encoding is a pure per-row projection: no shuffle at all.
    * Returns `(idCol, codes: array<int>)`; null vectors yield null. */
  def pqEncode(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      m: Int = 8,
      cells: Int = 16
  ): MayFail[DataFrame] = MayFail {
    require(m >= 1 && cells >= 2, s"need m >= 1, cells >= 2 (got m=$m, cells=$cells)")
    df.select(col(idCol), portablePqCodes(col(vecCol), m, cells).as("codes"))
  }

  /** Top-k neighbors ranked by PQ asymmetric-distance (ADC) scoring,
    * exact-reranked on the original floats — the IVF-PQ scale path's
    * scoring half (compose with [[Similarity.ivfKnn]]'s cell routing to
    * bound the scan).
    *
    * Shape for scale: each query precomputes its `m·cells` lookup table
    * ONCE (broadcast with the query); scoring a candidate is then `m`
    * array reads against a code scan ~`dim/m`× smaller than the float
    * corpus — at 100 TB of embeddings the ADC pass reads codes only, and
    * the full-precision vectors surface exclusively in the bounded
    * shortlist rerank ([[sqKnn]]'s contract: the shortlist is
    * `queries × shortlistK` rows, broadcast back, corpus never
    * shuffled). `shortlistK` trades recall for rerank cost; a shortlist
    * covering the corpus degenerates to exact brute force (how the
    * oracle gates this path — approximate rankings are gated by
    * measured recall, QuantizeSpec). */
  def pqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int = 10,
      m: Int = 8,
      cells: Int = 16,
      shortlistK: Int = 100
  ): MayFail[DataFrame] = MayFail {
    require(k >= 1 && shortlistK >= k,
      s"need shortlistK >= k >= 1 (got k=$k, shortlistK=$shortlistK)")
    require(m >= 1 && cells >= 2, s"need m >= 1, cells >= 2 (got m=$m, cells=$cells)")
    val enc = corpus.select(col(idCol).as("neighborId"),
        portablePqCodes(col(vecCol), m, cells).as("__codes"))
      .filter(col("__codes").isNotNull)
    val q = queries.select(col(idCol).as("queryId"),
      col(vecCol).as("__qv"),
      portablePqTable(col(vecCol), m, cells).as("__tab"))
    val scored = enc.join(broadcast(q), col("queryId") =!= col("neighborId"))
      .withColumn("__approx", pqAdcScore(col("__codes"), col("__tab")))
    val wGlob = Window.partitionBy(col("queryId"))
      .orderBy(col("__approx").desc_nulls_last, col("neighborId"))
    val shortlist = scored
      .withColumn("__sr", row_number().over(wGlob))
      .filter(col("__sr") <= shortlistK)
      .select(col("queryId"), col("neighborId"))
    rerankShortlist(corpus, vecCol, idCol,
      q.select(col("queryId"), col("__qv")), shortlist, k)
  }

  /** PQ encode against a CALLER-SUPPLIED codebook — the production path
    * where per-subspace centroids come from real k-means (train each
    * subspace with `spark.ml` KMeans over `slice(vec, s·sub+1, sub)`
    * and collect the cluster centers into `centroids`), mirroring
    * [[Dedup.semanticDedupAssigned]]'s caller-trained convention.
    *
    * `centroids`: `(s: int, cell: int, centroid: array<float>)`, one row
    * per subspace × cell — m·cells rows, broadcast. `metric` is the
    * assignment rule: `"l2"` (k-means convention, nearest center) or
    * `"dot"` (argmax projection, the portable codebook's rule); ties
    * break toward the smaller cell either way.
    *
    * Plan: the corpus explodes into (id, s, subvector) slim rows — m
    * rows per vector, `sub` floats each — joins the broadcast codebook,
    * and two aggregations (argmax per (id, s), ordered reassembly per
    * id) produce `codes`. Two shuffles of slim rows; vectors never
    * shuffle whole. Returns `(idCol, codes: array<int>)`. */
  def pqEncodeWith(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: DataFrame,
      m: Int,
      metric: String = "l2"
  ): MayFail[DataFrame] = MayFail {
    require(m >= 1, s"need m >= 1 (got $m)")
    require(Seq("l2", "dot").contains(metric), s"metric must be l2 | dot: $metric")
    val exploded = df
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("__sv", expr(s"slice(__v, s * (size(__v) div $m) + 1, size(__v) div $m)"))
      .select(col("__id"), col("s"), col("__sv"))
    val cb = centroids.select(col("s"), col("cell"), col("centroid"))
    val score = metric match {
      case "dot" => vecDot(col("__sv"), col("centroid"))
      // negative squared L2, dot-expanded: argmax(-(|x|²-2x·c+|c|²)) =
      // argmax(2x·c - |c|²) — |x|² is constant per (id, s)
      case "l2" =>
        lit(2.0) * vecDot(col("__sv"), col("centroid")) -
          vecDot(col("centroid"), col("centroid"))
    }
    exploded.join(broadcast(cb), Seq("s"))
      .withColumn("__score", score)
      // max over struct is lexicographic: best score, then smallest cell
      .groupBy(col("__id"), col("s"))
      .agg(max(struct(col("__score"), (-col("cell")).as("__negCell"))).as("__best"))
      .select(col("__id"), col("s"), (-col("__best.__negCell")).cast("int").as("cell"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("cell")))),
        x => x.getField("cell")).as("codes"))
      .select(col("__id").as(idCol), col("codes"))
  }

  /** ADC kNN over a caller-supplied codebook ([[pqEncodeWith]]'s search
    * half): each query's m·cells lookup table assembles from the
    * broadcast codebook (partial = `metric` score of the query
    * subvector against each cell) and candidates cost m array reads via
    * the same native `pq_adc_score` kernel as [[pqKnn]] — then the
    * bounded shortlist reranks on exact float cosines. */
  def pqKnnWith(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: DataFrame,
      m: Int,
      cells: Int,
      k: Int = 10,
      shortlistK: Int = 100,
      metric: String = "l2"
  ): MayFail[DataFrame] = MayFail {
    require(k >= 1 && shortlistK >= k,
      s"need shortlistK >= k >= 1 (got k=$k, shortlistK=$shortlistK)")
    require(m >= 1 && cells >= 2, s"need m >= 1, cells >= 2 (got m=$m, cells=$cells)")
    val enc = pqEncodeWith(corpus, vecCol, idCol, centroids, m, metric).get
      .select(col(idCol).as("neighborId"), col("codes").as("__codes"))
    val cb = centroids.select(col("s"), col("cell"), col("centroid"))
    val partial = metric match {
      case "dot" => vecDot(col("__sv"), col("centroid"))
      case "l2" =>
        lit(2.0) * vecDot(col("__sv"), col("centroid")) -
          vecDot(col("centroid"), col("centroid"))
    }
    val qTab = queries
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("queryId"), col(vecCol).as("__qv"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .withColumn("__sv",
        expr(s"slice(__qv, s * (size(__qv) div $m) + 1, size(__qv) div $m)"))
      .join(broadcast(cb), Seq("s"))
      .withColumn("__p", partial)
      .groupBy(col("queryId"))
      .agg(first(col("__qv")).as("__qv"),
        transform(array_sort(collect_list(
          struct((col("s") * cells + col("cell")).as("i"), col("__p")))),
          x => x.getField("__p")).as("__tab"))
    val scored = enc.join(broadcast(qTab), col("queryId") =!= col("neighborId"))
      .withColumn("__approx", pqAdcScore(col("__codes"), col("__tab")))
    val wGlob = Window.partitionBy(col("queryId"))
      .orderBy(col("__approx").desc_nulls_last, col("neighborId"))
    val shortlist = scored
      .withColumn("__sr", row_number().over(wGlob))
      .filter(col("__sr") <= shortlistK)
      .select(col("queryId"), col("neighborId"))
    rerankShortlist(corpus, vecCol, idCol,
      qTab.select(col("queryId"), col("__qv")), shortlist, k)
  }

  /** IVF-ADC — the FAISS IVFPQ layout expressed as a Spark plan: a
    * coarse k-means router bounds the scan to each query's `nProbe`
    * nearest cells (trained inline like [[Similarity.ivfKnn]], centroid
    * table broadcast), candidates within probed cells score by PQ
    * asymmetric distance (portable codebook, native kernel — m array
    * reads per candidate over codes ~dim/m× smaller than floats), and
    * the bounded shortlist exact-reranks on the original vectors.
    *
    * At 100 TB this is the compounding win: IVF prunes the CANDIDATE SET
    * (scan nProbe/nCentroids of the corpus) while PQ shrinks the BYTES
    * PER CANDIDATE — cluster the corpus by `centroid` at write time
    * (`Optimise.reparBy`) and each probe reads only its cells' files.
    * Simplification vs FAISS: codes quantize raw vectors, not coarse
    * residuals — the exact rerank absorbs the coarser approximation
    * (recall measured in QuantizeSpec); per-cell trained residual
    * codebooks can be composed from [[pqEncodeWith]] when needed.
    *
    * Exhaustive settings (`nProbe = nCentroids`, `shortlistK ≥ corpus`)
    * degenerate to exact brute force — how the gate checks the path. */
  def ivfPqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      cells: Int = 16,
      shortlistK: Int = 100
  ): MayFail[DataFrame] = MayFail {
    require(k >= 1 && shortlistK >= k,
      s"need shortlistK >= k >= 1 (got k=$k, shortlistK=$shortlistK)")
    require(nCentroids >= 1 && nProbe >= 1 && nProbe <= nCentroids,
      s"need 1 <= nProbe <= nCentroids (got nProbe=$nProbe, nCentroids=$nCentroids)")
    require(m >= 1 && cells >= 2, s"need m >= 1, cells >= 2 (got m=$m, cells=$cells)")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val assembled = corpus
      .select(col(idCol).as("neighborId"), col(vecCol).as("__cv"))
      .filter(col("__cv").isNotNull)
      .withColumn("__fv", array_to_vector(col("__cv")))
    val km = new KMeans().setK(nCentroids).setSeed(42L)
      .setFeaturesCol("__fv").setPredictionCol("centroid")
      .fit(assembled)
    // the inverted lists carry codes, never float vectors
    val lists = km.transform(assembled)
      .select(col("neighborId"), col("centroid"),
        portablePqCodes(col("__cv"), m, cells).as("__codes"))
    val centers = km.clusterCenters.zipWithIndex.map { case (v, i) =>
      (i, v.toArray.map(_.toFloat))
    }.toSeq.toDF("centroid", "__cvec")

    val q = queries.select(col(idCol).as("queryId"), col(vecCol).as("__qv"),
      portablePqTable(col(vecCol), m, cells).as("__tab"))
    val wProbe = Window.partitionBy(col("queryId")).orderBy(col("__d2"), col("centroid"))
    val probes = q.crossJoin(broadcast(centers))
      .withColumn("__d2",
        vecDot(col("__qv"), col("__qv")) + vecDot(col("__cvec"), col("__cvec"))
          - lit(2.0) * vecDot(col("__qv"), col("__cvec")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nProbe)
      .select(col("queryId"), col("__qv"), col("__tab"), col("centroid"))

    val scored = lists.join(broadcast(probes), Seq("centroid"))
      .filter(col("queryId") =!= col("neighborId"))
      .withColumn("__approx", pqAdcScore(col("__codes"), col("__tab")))
    val wGlob = Window.partitionBy(col("queryId"))
      .orderBy(col("__approx").desc_nulls_last, col("neighborId"))
    val shortlist = scored
      .withColumn("__sr", row_number().over(wGlob))
      .filter(col("__sr") <= shortlistK)
      .select(col("queryId"), col("neighborId"))
    rerankShortlist(corpus, vecCol, idCol,
      q.select(col("queryId"), col("__qv")), shortlist, k)
  }

  /** Collect + validate a caller coarse-centroid table
    * `(cell: int, centroid: array<float|double>)` into the flat
    * cell-major `double[]` the [[graft.functions.CallerCodebookImpl]]
    * kernels read. Cells must be exactly `0..n-1`, one row each, all the
    * same dimension. Bounded: a coarse router is driver-resident by
    * definition (FAISS keeps it in RAM) — 65536 cells × 1024 dims is
    * ~512 MB, far above any sane setting, and the require names the
    * bound instead of OOMing. */
  private def collectCoarse(coarse: DataFrame): (Array[Double], Int, Int) = {
    val rows = coarse.select(col("cell").cast("int"), col("centroid"))
      .collect()
    val n = rows.length
    require(n >= 1 && n <= 65536,
      s"coarse table must have 1..65536 cells (got $n) — the router is " +
        "driver/broadcast-resident by design")
    val byCell = rows.map { r =>
      (r.getInt(0),
        r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue).toArray)
    }.toMap
    require(byCell.size == n && (0 until n).forall(byCell.contains),
      s"coarse cells must be exactly 0..${n - 1}, one row each")
    val dim = byCell(0).length
    require(dim >= 1 && byCell.values.forall(_.length == dim),
      "coarse centroids must share one dimension")
    val flat = new Array[Double](n * dim)
    for (c <- 0 until n; i <- 0 until dim) flat(c * dim + i) = byCell(c)(i)
    (flat, n, dim)
  }

  /** Collect + validate a PQ codebook `(s, cell, centroid)` (the
    * [[pqEncodeWith]] convention) into the flat `[(s·cells + c)·sub + i]`
    * layout. Every (s, cell) pair for `s < m, cell < cells` must be
    * present; subspace centroids share one sub-dimension. */
  private def collectCodebook(
      codebook: DataFrame, m: Int, cells: Int): (Array[Double], Int) = {
    require(m.toLong * cells <= 1048576,
      s"m*cells must stay <= 2^20 codebook rows (got ${m.toLong * cells})")
    val rows = codebook
      .select(col("s").cast("int"), col("cell").cast("int"), col("centroid"))
      .collect()
    val byKey = rows.map { r =>
      ((r.getInt(0), r.getInt(1)),
        r.getSeq[Any](2).map(_.asInstanceOf[Number].doubleValue).toArray)
    }.toMap
    require(byKey.size == rows.length, "duplicate (s, cell) codebook rows")
    for (s <- 0 until m; c <- 0 until cells)
      require(byKey.contains((s, c)), s"codebook missing row (s=$s, cell=$c)")
    val sub = byKey((0, 0)).length
    require(sub >= 1 && byKey.values.forall(_.length == sub),
      "codebook centroids must share one sub-dimension")
    val flat = new Array[Double](m * cells * sub)
    for (s <- 0 until m; c <- 0 until cells; i <- 0 until sub)
      flat((s * cells + c) * sub + i) = byKey((s, c))(i)
    (flat, sub)
  }

  /** IVF-ADC over CALLER-SUPPLIED coarse centroids and PQ codebook — the
    * deterministic production sibling of [[ivfPqKnn]] (whose router is an
    * inline-trained KMeans): both codebooks come from the caller
    * (train with `spark.ml` KMeans, or synthesize for replayable gates),
    * so every cell assignment, probe choice, and ADC score is exact
    * arithmetic any engine can replay.
    *
    * Plan shape — the one that survives 100 TB:
    *  - corpus side is a SINGLE narrow projection: cell assignment and
    *    PQ codes are per-row codegen kernels over the baked-in codebooks
    *    (zero shuffle, zero join, the full-precision vector never leaves
    *    its scan);
    *  - each query explodes into its `nProbe` probed cells and
    *    broadcasts; candidates join on the cell EQUI-key — a
    *    BroadcastHashJoin scanning ~nProbe/nCells of the corpus, never
    *    the all-pairs BroadcastNestedLoop of [[pqKnn]] (PlanSpec locks
    *    this);
    *  - ADC scoring is `m` array reads per candidate; the
    *    WindowGroupLimit-capped shortlist exact-reranks on floats.
    *
    * Cluster the corpus files by cell at write time (`Optimise.reparBy`)
    * and each probe reads only its cells' files — the scan fraction
    * itself becomes IO pruning. Recall is governed by `nProbe` (routing
    * misses) and `shortlistK` (ADC ordering misses); exhaustive settings
    * reproduce exact brute force, and the q317 gate + REHEARSAL invariant
    * hold pruned-probe recall and scan fraction to stated floors.
    *
    * `metric` governs ROUTING and ADC SHORTLISTING only ('l2' = argmin
    * cell distance + L2 lookup tables; 'dot' = argmax inner product):
    * the exact rerank — and the returned score column — is COSINE
    * regardless, the repo-wide kNN contract shared by [[pqKnn]],
    * [[binKnn]] and [[sqKnn]] (ADVICE r10). On unit-normalized
    * embeddings all three orderings agree; on unnormalized vectors under
    * metric='l2' the returned top-k are the cosine-nearest among probed
    * candidates, NOT the L2-nearest — rerank externally on the shortlist
    * if raw-L2 ranking is required. */
  def ivfPqKnnWith(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      coarse: DataFrame,
      codebook: DataFrame,
      m: Int,
      cells: Int,
      k: Int = 10,
      nProbe: Int = 4,
      shortlistK: Int = 100,
      metric: String = "l2"
  ): MayFail[DataFrame] =
    ivfEncodeWith(corpus, vecCol, idCol, coarse, codebook, m, cells, metric)
      .flatMap(lists => ivfSearchEncoded(lists, corpus, queries, vecCol,
        idCol, coarse, codebook, m, cells, k, nProbe, shortlistK, metric))

  /** The INDEX-BUILD half of [[ivfPqKnnWith]] — the production split:
    * encode the corpus ONCE into `(id, cell: int, codes: array<int>)`
    * inverted lists (a single narrow per-row projection), write them
    * clustered by `cell` (`Optimise.reparBy` + partitioned parquet),
    * and serve every later query batch from the stored lists via
    * [[ivfSearchEncoded]] — re-encoding a 100 TB corpus per query
    * batch is the cost this split removes. */
  def ivfEncodeWith(
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      coarse: DataFrame,
      codebook: DataFrame,
      m: Int,
      cells: Int,
      metric: String = "l2"
  ): MayFail[DataFrame] = MayFail {
    import graft.functions.VectorFunctions.{codebookPqCodes, codebookProbes}
    require(m >= 1 && cells >= 2, s"need m >= 1, cells >= 2 (got m=$m, cells=$cells)")
    require(Seq("l2", "dot").contains(metric), s"metric must be l2 | dot: $metric")
    val (coarseFlat, nCells, dim) = collectCoarse(coarse)
    val (cbFlat, sub) = collectCodebook(codebook, m, cells)
    require(m * sub == dim,
      s"codebook sub-dimension $sub * m=$m != coarse dimension $dim")
    val l2 = metric == "l2"
    corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol),
        element_at(codebookProbes(col(vecCol), coarseFlat, nCells, 1), 1)
          .as("cell"),
        codebookPqCodes(col(vecCol), cbFlat, m, cells, l2).as("codes"))
  }

  /** The SEARCH half of [[ivfPqKnnWith]] over PRE-ENCODED inverted
    * lists ([[ivfEncodeWith]]'s output, possibly read back from
    * cell-partitioned parquet): queries route to their `nProbe` cells,
    * candidates ADC-score against the broadcast query tables, and the
    * WindowGroupLimit-capped shortlist exact-reranks on the float
    * `corpus`. The codebooks must be the ones the lists were encoded
    * with — codes are meaningless under any other table. `metric`
    * governs routing + ADC only; the exact rerank and output column are
    * COSINE (see [[ivfPqKnnWith]]'s contract note). */
  def ivfSearchEncoded(
      lists: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      coarse: DataFrame,
      codebook: DataFrame,
      m: Int,
      cells: Int,
      k: Int = 10,
      nProbe: Int = 4,
      shortlistK: Int = 100,
      metric: String = "l2"
  ): MayFail[DataFrame] = MayFail {
    import graft.functions.VectorFunctions.{codebookPqTable, codebookProbes}
    require(k >= 1 && shortlistK >= k,
      s"need shortlistK >= k >= 1 (got k=$k, shortlistK=$shortlistK)")
    require(m >= 1 && cells >= 2, s"need m >= 1, cells >= 2 (got m=$m, cells=$cells)")
    require(Seq("l2", "dot").contains(metric), s"metric must be l2 | dot: $metric")
    val (coarseFlat, nCells, dim) = collectCoarse(coarse)
    require(nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells (got nProbe=$nProbe, nCells=$nCells)")
    val (cbFlat, sub) = collectCodebook(codebook, m, cells)
    require(m * sub == dim,
      s"codebook sub-dimension $sub * m=$m != coarse dimension $dim")
    val l2 = metric == "l2"
    val q = queries
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("queryId"), col(vecCol).as("__qv"),
        codebookPqTable(col(vecCol), cbFlat, m, cells, l2).as("__tab"),
        explode(codebookProbes(col(vecCol), coarseFlat, nCells, nProbe))
          .as("__cell"))
    // probed-cell set FIRST (bounded: ≤ nCells ≤ 65536 ints, computed on
    // the query batch — the side that broadcasts), so the stored-list
    // scan PARTITION-PRUNES: over [[ivfEncodeWith]] lists written as
    // cell-partitioned parquet the `cell ∈ probed` filter lands in the
    // scan's PartitionFilters and non-probed cells' FILES are never
    // read — the broadcast join then only discards within probed cells.
    // (QuantizeSpec locks the PartitionFilters; the rehearsal law holds
    // the file-level scan fraction to ≈ probed/nCells.)
    val probedCells = q.select(col("__cell")).distinct().collect().map(_.get(0))
    val listCols = lists
      .filter(col("cell").isin(probedCells: _*))
      .select(col(idCol).as("neighborId"),
        col("cell").as("__cell"), col("codes").as("__codes"))
    val scored = listCols.join(broadcast(q), Seq("__cell"))
      .filter(col("queryId") =!= col("neighborId"))
      .withColumn("__approx", pqAdcScore(col("__codes"), col("__tab")))
    val wGlob = Window.partitionBy(col("queryId"))
      .orderBy(col("__approx").desc_nulls_last, col("neighborId"))
    val shortlist = scored
      .withColumn("__sr", row_number().over(wGlob))
      .filter(col("__sr") <= shortlistK)
      .select(col("queryId"), col("neighborId"))
    rerankShortlist(corpus, vecCol, idCol,
      queries.filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
        .select(col(idCol).as("queryId"), col(vecCol).as("__qv")),
      shortlist, k)
  }

  /** Scan-fraction report for [[ivfPqKnnWith]]'s routing: per query, how
    * many corpus rows land in its probed cells vs the corpus size —
    * `(queryId, n_probed_rows, n_corpus, scan_fraction)`. A balanced
    * router reads ≈ nProbe/nCells of the corpus; REHEARSAL_r10 holds the
    * mean fraction under a stated cap so routing skew is caught at 10×,
    * not at 100 TB. One cell-histogram aggregation + a broadcast probe
    * join — the corpus is scanned once and never pair-joined. */
  def ivfScanReport(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      coarse: DataFrame,
      nProbe: Int
  ): MayFail[DataFrame] = MayFail {
    import graft.functions.VectorFunctions.codebookProbes
    val (coarseFlat, nCells, dim) = collectCoarse(coarse)
    require(nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells (got nProbe=$nProbe, nCells=$nCells)")
    val hist = corpus
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(element_at(codebookProbes(col(vecCol), coarseFlat, nCells, 1), 1)
        .as("__cell"))
      .groupBy("__cell").agg(count(lit(1)).as("__n"))
    val total = hist.agg(coalesce(sum("__n"), lit(0L)).as("__N"))
    val probes = queries
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("queryId"),
        explode(codebookProbes(col(vecCol), coarseFlat, nCells, nProbe))
          .as("__cell"))
    probes.join(broadcast(hist), Seq("__cell"), "left")
      .groupBy("queryId")
      .agg(coalesce(sum("__n"), lit(0L)).as("n_probed_rows"))
      .crossJoin(broadcast(total))
      .select(col("queryId"), col("n_probed_rows"), col("__N").as("n_corpus"),
        when(col("__N") > 0,
          col("n_probed_rows").cast("double") / col("__N")).as("scan_fraction"))
  }

  /** Shortlist-truncation report for [[binKnn]]/[[sqKnn]]: per query,
    * how many scorable corpus candidates existed and how many the
    * `shortlistK` cap cut before the exact rerank —
    * `(queryId, n_candidates, n_shortlisted, n_truncated)`.
    *
    * The truncation is a necessary guard (it bounds the rerank join) but
    * a silent recall knob: every truncated candidate is a vector the
    * exact rerank never saw. `n_truncated >> shortlistK` says the
    * approximate ordering is doing real selection work — validate its
    * recall (QuantizeSpec's pattern) or raise `shortlistK`.
    *
    * Scale shape: one corpus count + one broadcast semi-aggregation for
    * the queries' own corpus rows — the corpus is scanned, never
    * shuffled or paired. */
  def shortlistReport(
      corpus: DataFrame,
      queries: DataFrame,
      vecCol: String,
      idCol: String,
      shortlistK: Int
  ): MayFail[DataFrame] = MayFail {
    require(shortlistK >= 1, s"shortlistK must be positive: $shortlistK")
    // candidates = corpus rows with a non-null code (null vectors are
    // dropped up front by the kNN scan) minus the query's own rows —
    // mirroring binKnn's `queryId =!= neighborId` join condition
    val enc = corpus.select(col(idCol).as("neighborId"), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull)
    val qIds = queries.select(col(idCol).as("queryId"))
    val total = enc.agg(count(lit(1)).as("__N"))
    val selfCnt = enc.join(broadcast(qIds), col("neighborId") === col("queryId"))
      .groupBy("queryId").agg(count(lit(1)).as("__self"))
    qIds.crossJoin(broadcast(total))
      .join(broadcast(selfCnt), Seq("queryId"), "left")
      .select(col("queryId"),
        (col("__N") - coalesce(col("__self"), lit(0L))).as("n_candidates"))
      .select(col("queryId"), col("n_candidates"),
        least(col("n_candidates"), lit(shortlistK.toLong)).as("n_shortlisted"),
        greatest(col("n_candidates") - lit(shortlistK.toLong), lit(0L))
          .as("n_truncated"))
  }

  /** Deterministic Johnson–Lindenstrauss random projection: `outCol` =
    * the `outDim`-vector of md5-sign projections `p_j = Σ_i v_i·s(j,i)`
    * over the [[PortableLsh]] ±1 matrix — dimensionality reduction with
    * the JL distance-preservation guarantee (±1 matrices: Achlioptas,
    * JCSS 2003), engine-replayable because the sign matrix is the same
    * public md5 formula as the q37/q39 signatures. With
    * `normalize = true` projections scale by 1/√outDim so squared
    * distances are unbiased estimates of the originals.
    *
    * The cheap pre-filter in front of exact rerank: 64 → 8 dims is an
    * 8× scan-cost cut on the shortlist stage, and unlike PQ needs no
    * codebook. One map-side expression — no shuffle, no state; the
    * input dimension is probed once from the first row (Fail on an
    * empty frame), and every row is GUARDED against it: a ragged
    * vector raises a per-row error (never a silent NULL-padded or
    * truncated projection); a NULL vector projects to NULL. */
  def randomProject(
      df: DataFrame,
      vecCol: String,
      outDim: Int,
      normalize: Boolean = false,
      outCol: String = "proj"
  ): MayFail[DataFrame] = MayFail {
    require(outDim >= 1 && outDim <= 256,
      s"outDim must be in [1, 256]: $outDim")
    val probe = df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
    require(probe.nonEmpty, "randomProject needs at least one vector " +
      "to fix the input dimension")
    val dim = probe.head.getInt(0)
    require(dim >= outDim, s"outDim $outDim exceeds input dim $dim")
    val m = PortableLsh.signMatrix(outDim, dim)
    val vd = transform(col(vecCol), x => x.cast("double"))
    val proj = array((0 until outDim).map { j =>
      val sArr = array(m(j).map(s => lit(s.toDouble)): _*)
      val p = aggregate(zip_with(vd, sArr, (x, sg) => x * sg),
        lit(0.0), (acc, t) => acc + t)
      if (normalize) p / lit(math.sqrt(outDim.toDouble)) else p
    }: _*)
    // per-row dimension guard, still one map-side expression: zip_with
    // NULL-pads ragged vectors, so an unguarded projection would go
    // silently NULL (or drop trailing components) instead of failing
    val guarded = when(col(vecCol).isNull,
        lit(null).cast("array<double>"))
      .when(size(col(vecCol)) === lit(dim), proj)
      .otherwise(raise_error(concat(
        lit(s"randomProject: ragged vector — probed dim $dim, got "),
        size(col(vecCol)).cast("string"))))
    df.withColumn(outCol, guarded)
  }
}
