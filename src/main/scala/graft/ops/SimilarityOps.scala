package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.CosineSimilarity.cosineSim
import graft.functions.NearestCentroids.nearestCentroids

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float> [64-dim], label).
  *
  * Cosine goes through the fused single-pass Catalyst expression
  * [[graft.functions.CosineSimilarity]] (codegen'd; no per-pair array
  * allocation). Float elements are promoted to double per element and
  * accumulated sequentially — the same evaluation order any engine uses
  * for a sequential list reduction, so cosine values are bit-reproducible
  * and only rounded (1e-6) to guard the last ulp of sqrt/division.
  *
  * Scale design:
  *  - Brute-force top-k broadcasts the (small) query set and streams the
  *    corpus — one scan, no corpus shuffle; the per-query rank is a shuffle
  *    of |corpus|×|queries| rows, which is the exact-search lower bound.
  *  - The LSH path (random-hyperplane signatures, banded) prunes that to
  *    bucket-colliding pairs: the ANN shape that survives a 1000-executor
  *    corpus. Recall is tunable via bands/bits.
  */
object SimilarityOps {

  /** Σ aᵢ·bᵢ with per-element double promotion, sequential accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Composable-HOF cosine — kept as the reference formulation the fused
    * expression is validated against (see SimilaritySpec).
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** The score EVERY fp32 similarity operator ranks/filters on: cosine
    * rounded to 1e-6 with NaN (a zero-norm side: 0/0) mapped to NULL.
    * Spark orders NaN ABOVE every real double and `NaN >= t` is true, so
    * an unguarded zero-norm embedding (a failed encoder output) would
    * rank #1 for every query and "near-duplicate" every cell-mate; as
    * NULL it drops out of `>= threshold` filters and sorts last
    * (NULLS LAST) in every desc rank window instead.
    */
  private def cosineScore(a: Column, b: Column): Column = {
    val c = round(cosineSim(a, b), 6)
    when(!isnan(c), c)
  }

  /** The shared per-query exact-rank tail every top-k operator ends
    * with: rank on (cosine_sim desc, vec_id) within query_id, keep `k`,
    * surface the driver-contract schema. One definition so a
    * scoring-policy change (e.g. [[cosineScore]]'s NaN→NULL guard)
    * reaches every variant at once.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine_sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cosine_sim"))
      .orderBy("query_id", "rank")
  }

  /** L2-norm profile of the embedding corpus — the first sanity page
    * of any vector pipeline: count, min/max and exact quartiles of the
    * per-vector norms. A p50 far from 1 flags an un-normalized encoder
    * batch (cosine then silently degrades to dot-product ranking); a
    * min of 0 flags failed encodes (the NaN case [[cosineScore]]
    * guards).
    *
    * Exactness: each squared component is quantized to integer NANOS
    * (`floor(x²·1e9)` — float→double promotion, one IEEE multiply
    * chain, identical in both engines) so the per-vector sum is a
    * BIGINT accumulated row-locally (HOF with a stable LONG
    * accumulator — no decimal-precision drift, no float-sum order
    * dependence); the norm is one double division + `sqrt` pair, and
    * the quartiles are ONE partial-merged [[graft.functions
    * .ExactQuantiles]] count-map. Scale: entirely row-local to the
    * single global reduce.
    */
  def normProfile(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ExactQuantiles.exactQuantiles
    val norms = Tables.embeddings(s, d).select(
        expr("""aggregate(embedding, 0L, (acc, x) ->
          acc + cast(floor(cast(x as double) * cast(x as double) * 1e9)
            as bigint))""").as("ss"))
      .select(sqrt(col("ss").cast("double") / 1e9).as("nrm"))
    norms.agg(count(lit(1)).as("n_vecs"),
        min(col("nrm")).as("min_norm"),
        exactQuantiles(col("nrm"), Seq(25, 50, 75), 100).as("qs"),
        max(col("nrm")).as("max_norm"))
      .select(col("n_vecs"), col("min_norm"),
        col("qs").getItem(0).as("p25_norm"),
        col("qs").getItem(1).as("p50_norm"),
        col("qs").getItem(2).as("p75_norm"),
        col("max_norm"))
  }

  /** Upper-triangle covariance rows (dim_i ≤ dim_j): the shared
    * scaled-integer Gram accumulation behind [[dimCovariance]]'s
    * surface and [[pcaPower]]'s iteration matrix. The pair fan-out
    * carries ONLY the product term — the per-component sums Sx_i are
    * the same number for every pair a dimension appears in, so they
    * are aggregated once from a d-wide posexplode and joined back
    * broadcast (measured ~3× less exploded volume than fanning
    * (pq, xi, xj) triples). Returned localCheckpointed — the
    * fact-sized scan runs once per caller.
    */
  private def covUpper(s: SparkSession, d: String, dim: Int): DataFrame = {
    // ONE corpus scan into the flat scaled-integer Gram aggregate
    // ([[graft.functions.GramUpperAgg]]) — round 13, guide §1.2 step 2
    // (per-task work): the previous form EXPLODED d(d+1)/2 (i, j, term)
    // struct rows per embedding into a 2 080-group hash aggregate
    // (~21 M generated rows at sf0.1, measured as this operator's whole
    // cost — emb_dim_covariance 2.8 s / emb_pca_power 3.1 s medians);
    // the aggregate folds the same floor(x_i·x_j·1e9) longs in a tight
    // per-row loop, so the sums (and every consumer's output) are
    // BIT-identical while the generated-row pipeline disappears. The
    // d²-bounded surface is then one 1-row explode over index structs —
    // no broadcast joins, no second scan for the component sums.
    val g = Tables.embeddings(s, d)
      .agg(graft.functions.GramUpper.gramUpper(col("embedding"), dim)
        .as("g"))
      .select(col("g.n").as("n"), col("g.sx").as("sx"),
        col("g.spq").as("spq"))
    g.select(col("n"), col("sx"), col("spq"),
        explode(expr(
          s"""flatten(transform(sequence(0, ${dim - 1}), i ->
             |  transform(sequence(i, ${dim - 1}), j ->
             |    struct(i AS i, j AS j))))""".stripMargin)).as("t"))
      .filter(col("n") > 0) // empty corpus ⇒ empty frame, as the fan-out form
      .select(col("t.i").cast("long").as("dim_i"),
        col("t.j").cast("long").as("dim_j"), col("n"),
        // row-major upper-triangle index k = i·d − i(i−1)/2 + (j − i);
        // element_at is 1-based. Same double op order as the fan-out
        // form: spq/1e9/n − (sx_i/1e9/n)·(sx_j/1e9/n).
        (element_at(col("spq"), expr(
            s"cast(t.i * $dim - (t.i * (t.i - 1)) div 2 + (t.j - t.i) + 1 as int)"))
            .cast("double") / 1e9 / col("n").cast("double") -
          (element_at(col("sx"), expr("cast(t.i + 1 as int)"))
            .cast("double") / 1e9 / col("n").cast("double")) *
          (element_at(col("sx"), expr("cast(t.j + 1 as int)"))
            .cast("double") / 1e9 / col("n").cast("double")))
          .as("cov"))
      .localCheckpoint()
  }

  /** Dimension–dimension covariance/correlation of the embedding space —
    * the encoder-health matrix behind whitening, PCA sizing, and
    * dead/duplicated-dimension audits: high off-diagonal |corr| means
    * the encoder wastes capacity; a zero-variance diagonal entry is a
    * dead dimension. Emits the full upper triangle (dim_i ≤ dim_j),
    * d(d+1)/2 rows — bounded by the embedding WIDTH, never the corpus.
    *
    * Exactness is [[normProfile]]'s scaled-integer discipline: every
    * per-row term (component and pairwise product) is floored onto a
    * 1e-9 grain as a LONG, so the big sums are exact integer addition —
    * associative, order-free — and the covariance/correlation formulas
    * are then scalar IEEE double ops on those determinate sums.
    * (The 1e-9 quantization IS the documented contract: this measures
    * the covariance of the quantized space, identically in any engine.)
    *
    * Scale: ONE corpus scan fans each row into d(d+1)/2 (i, j, term)
    * rows that feed a partially-aggregated hash aggregate — map-side
    * combine reduces the shuffle to (pairs × partitions) partial rows,
    * the standard distributed Gram-matrix accumulation. No window, no
    * self-join of the corpus, nothing keyed by vec_id.
    */
  def dimCovariance(s: SparkSession, d: String, dim: Int = 64): DataFrame = {
    val sums = covUpper(s, d, dim) // feeds the surface AND the diagonal
    val diag = sums.filter(col("dim_i") === col("dim_j"))
      .select(col("dim_i").as("dd"), col("cov").as("variance"))
    sums
      .join(broadcast(diag.withColumnRenamed("dd", "dim_i")
        .withColumnRenamed("variance", "var_i")), Seq("dim_i"))
      .join(broadcast(diag.withColumnRenamed("dd", "dim_j")
        .withColumnRenamed("variance", "var_j")), Seq("dim_j"))
      .select(col("dim_i"), col("dim_j"), col("n"), col("cov"),
        // dead (zero-variance) dimension ⇒ corr undefined: NULL, not
        // NaN/Inf — the advertised dead-dimension audit must emit a
        // readable row, and floor quantization can push a constant
        // dimension's variance epsilon-NEGATIVE, where sqrt would NaN
        // (the burrowsDelta vr>0 guard, same hazard)
        when(col("var_i") > 0 && col("var_j") > 0,
          col("cov") / (sqrt(col("var_i")) * sqrt(col("var_j"))))
          .as("corr"))
      .orderBy("dim_i", "dim_j")
  }

  /** Top principal component of the embedding space by `iters` power-
    * iteration steps (50 — the fixture's spectral gap ratio is ~0.93,
    * so 15 steps leave a 5% eigen-residual; 50 reach 0.5%, spec-gated)
    * over [[dimCovariance]]'s matrix (Mises–Pollaczek-
    * Geiringer 1929; the PCA sizing readout): per dimension its loading
    * on the first PC, plus the Rayleigh-quotient eigenvalue and the
    * variance share it explains — "how one-dimensional is this encoder?"
    * (explained → 1 means the space collapsed; ≈ 1/d means isotropic).
    *
    * Exactness: the matrix entries are determinate doubles over exact
    * scaled-integer sums ([[covUpper]]); the iteration state is
    * DECIMAL(24,12) — each step's terms are single IEEE products
    * quantized before the ≤ d-term decimal sums, and the rescale by the
    * max-|component| (an exact decimal max) is one double division per
    * entry, so every iterate is bit-identical across engines and the
    * oracle unrolls the same steps as CTEs. All decimal payloads stay
    * under 2⁵³ so both engines' decimal→double casts are exact (the
    * [[TextOps.burrowsDelta]] scale lesson). Convergence quality does
    * not affect the gate: both engines surface the same `iters`-step
    * iterate, and the spec checks it IS an eigenvector numerically.
    *
    * Scale: one fact-sized Gram pass (shared shape with
    * [[dimCovariance]]); the iteration lives on the d²-bounded matrix,
    * which is an algorithm constant — it is collected and iterated ON
    * THE DRIVER (the centroid/codebook bounded-state class), because
    * each round's max-rescale scalar would otherwise cost one Spark
    * job per round (measured: 11.5 s of scheduling for 50 rounds of
    * 4096-row frames vs ~0 ms of driver math). Corpus-sized work never
    * leaves the cluster.
    */
  def pcaPower(s: SparkSession, d: String, dim: Int = 64,
      iters: Int = 50): DataFrame = {
    import s.implicits._
    val covRows = covUpper(s, d, dim)
      .select("dim_i", "dim_j", "cov")
      .collect() // bounded driver state: d(d+1)/2 doubles — a constant
    // of the ALGORITHM (like centroids/codebooks), never of the corpus.
    // The iteration runs here, not as DataFrame supersteps: each round
    // needs a global max-rescale scalar, so the superstep form costs a
    // Spark job per round — 150 scheduled jobs over 4096-row frames,
    // measured 11.5 s of pure overhead vs ~0 ms of driver math. The
    // corpus-sized work (the Gram pass) stays distributed in covUpper.
    val c = Array.ofDim[Double](dim, dim)
    covRows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      c(i)(j) = r.getDouble(2); c(j)(i) = r.getDouble(2)
    }
    // q replicates Spark's double→DECIMAL(24,12) cast bit-for-bit
    // (shortest-repr BigDecimal + HALF_UP — the contract the
    // markovStationary spec pins), so the JVM loop is the oracle's
    // unrolled-CTE iteration verbatim.
    def q(x: Double): BigDecimal = BigDecimal.decimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def step(vc: Array[BigDecimal]): Array[BigDecimal] =
      Array.tabulate(dim)(i =>
        (0 until dim).map(j => q(c(i)(j) * vc(j).toDouble)).sum)
    var v: Array[BigDecimal] = Array.fill(dim)(q(1.0 / dim))
    for (_ <- 1 to iters) {
      val w = step(v)
      val m = w.map(_.abs).max // exact decimal max, as the oracle's
      v = w.map(x => q(x.toDouble / m.toDouble))
    }
    val wf = step(v)
    val num = (0 until dim).map(i => q(v(i).toDouble * wf(i).toDouble)).sum
    val den = (0 until dim).map(i => q(v(i).toDouble * v(i).toDouble)).sum
    val tr = (0 until dim).map(i => q(c(i)(i))).sum
    val lambda = num.toDouble / den.toDouble
    (0 until dim).map { i =>
      (i.toLong, v(i).toDouble / math.sqrt(den.toDouble), lambda,
        lambda / tr.toDouble)
    }.toDF("dim", "loading", "lambda", "explained").orderBy("dim")
  }

  /** Simplified silhouette (Hruschka et al. 2004's centroid variant of
    * Rousseeuw 1987) per embedding label: s = (b − a) / max(a, b) with
    * a = distance to the OWN label centroid, b = the nearest OTHER
    * centroid — the clustering-quality readout next to
    * [[clusterProfile]]'s cohesion page. Mean s near 0 means the label
    * geometry barely separates; n_negative counts vectors sitting
    * closer to a foreign centroid (candidate mislabels / relabel queue).
    *
    * Exactness: centroids are determinate doubles over exact per-
    * (label, dim) integer component sums ([[covUpper]]'s 1e-9 grain),
    * computed distributed and shipped back as literal arrays (bounded
    * driver state: |labels| × dim doubles — the PQ-codebook class, so
    * distances are ZERO-shuffle row-local folds); each squared-gap term
    * is floored onto the 1e-9 grain as a LONG so the per-row fold is
    * exact integer addition; a, b, s are then scalar IEEE double ops,
    * and s is quantized onto DECIMAL(10,6) ([[clusterProfile]]'s grain)
    * before the per-label mean. Scale: one bounded aggregate for the
    * centroids + ONE corpus scan with row-local distance math and a
    * |labels|-bounded rollup.
    */
  /** Per-label centroids as driver arrays: exact integer component
    * sums → determinate double means (|labels| × dim — bounded state
    * of the label alphabet, the PQ-codebook class). Shared by
    * [[silhouette]] and [[labelConfusion]].
    */
  private def labelCentroids(emb: DataFrame,
      dim: Int): Seq[(Int, Array[Double])] =
    emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum(expr("cast(floor(cast(x as double) * 1e9) as bigint)"))
          .as("sx"),
        count(lit(1)).as("cn"))
      .collect() // bounded driver state: |labels| × dim (sx, n) pairs
      .groupBy(_.getInt(0))
      .map { case (l, rows) =>
        val a = new Array[Double](dim)
        rows.foreach(r =>
          a(r.getInt(1)) = r.getLong(2).toDouble / 1e9 / r.getLong(3)
            .toDouble)
        (l, a)
      }.toSeq.sortBy(_._1)

  /** 1e-9-grain integer squared distance from `embedding` to a literal
    * centroid — the shared row-local fold of the centroid family.
    */
  private def d2q(c: Array[Double]): Column = {
    val lits = c.mkString("array(", "D,", "D)")
    expr(s"""aggregate(zip_with(embedding, $lits, (x, c) ->
      |  cast(floor((cast(x as double) - c) * (cast(x as double) - c)
      |    * 1e9) as bigint)), 0L, (acc, t) -> acc + t)""".stripMargin)
  }

  def silhouette(s: SparkSession, d: String, dim: Int = 64): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val cents = labelCentroids(emb, dim)
    val scored = emb
      .withColumn("d2s", array(cents.map { case (l, c) =>
        struct(lit(l).as("l"), d2q(c).as("q")) }: _*))
      .select(col("label"),
        sqrt(expr("filter(d2s, t -> t.l = label)[0].q").cast("double")
          / 1e9).as("a"),
        sqrt(expr(
          "array_min(transform(filter(d2s, t -> t.l != label), t -> t.q))")
          .cast("double") / 1e9).as("b"))
      .withColumn("sil",
        when(greatest(col("a"), col("b")) > 0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)))
    scored.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("sil").cast("decimal(10,6)")).as("ssum"),
        sum(when(col("sil") < 0, 1L).otherwise(0L)).as("n_negative"))
      .select(col("label"), col("n_vectors"),
        (col("ssum").cast("double") / col("n_vectors").cast("double"))
          .as("mean_silhouette"),
        col("n_negative"))
      .orderBy("label")
  }

  /** Nearest-centroid label confusion matrix — the labeling-QA page
    * next to [[silhouette]]'s geometry score: classify every vector to
    * its nearest label centroid (L2 on the shared 1e-9 integer grain,
    * ties broken by label — fully deterministic) and cross-tabulate
    * against the TRUE label. Off-diagonal mass localizes which label
    * pairs the embedding space cannot separate; the diagonal share per
    * label is its recall under the simplest possible classifier.
    *
    * Exactness: distances are exact integer folds against determinate
    * centroid literals ([[labelCentroids]]); the argmin is a
    * lexicographic (q, label) min — integer comparisons only; counts
    * integer, one double division per row. Scale: one bounded centroid
    * aggregate + ONE corpus scan with row-local argmin math and a
    * |labels|²-bounded rollup.
    */
  def labelConfusion(s: SparkSession, d: String, dim: Int = 64)
      : DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val cents = labelCentroids(emb, dim)
    val pred = emb
      .withColumn("qs", array(cents.map { case (l, c) =>
        struct(d2q(c).as("q"), lit(l).as("l")) }: _*))
      // array_min over struct(q, l) = lexicographic (q, l) argmin
      .select(col("label"), expr("array_min(qs).l").as("pred"))
    val tot = pred.groupBy("label").agg(count(lit(1)).as("n_label"))
    pred.groupBy("label", "pred").agg(count(lit(1)).as("n"))
      .join(tot, Seq("label"))
      .select(col("label").cast("long").as("label"),
        col("pred").cast("long").as("pred_label"), col("n"),
        (col("n").cast("double") / col("n_label").cast("double"))
          .as("share"))
      .orderBy("label", "pred_label")
  }

  /** Exact cosine top-k: for each query vector (vec_id < nQueries), the k
    * nearest corpus vectors (self excluded). Deterministic: rank on cosine
    * rounded to 1e-6 with vec_id tiebreak.
    */
  def bruteForceTopK(s: SparkSession, d: String, k: Int = 5,
      nQueries: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        cosineScore(col("q_emb"), col("embedding")))
    rankTopK(scored, k)
  }

  /** Deterministic pseudo-random unit hyperplane components: splitmix64 →
    * uniform in [-1, 1). Generated driver-side (tiny), shipped as literals.
    */
  private[graft] def hyperplane(seed: Long, dim: Int): Seq[Double] = {
    var x = seed
    (0 until dim).map { _ =>
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Random-hyperplane (SimHash-for-vectors) signature: bit j = sign of
    * ⟨v, hⱼ⟩. One narrow pass, no shuffle — compiled in a single loop by
    * the [[graft.functions.HyperplaneSignature]] expression (the HOF
    * formulation evaluated nBits interpreted array walks per row).
    */
  def lshSignature(v: Column, nBits: Int, dim: Int): Column =
    graft.functions.HyperplaneSignature.hyperplaneSignature(v,
      (0 until nBits).map(j => hyperplane(j + 1, dim).toArray).toArray)

  /** Candidate-pair count of the banded hyperplane LSH over an arbitrary
    * (vec_id, embedding) frame: Σ C(bucket, 2) over (band, chunk)
    * buckets, counted bucket-side (no pair materialization). The audit
    * number behind the all-pairs near-dup path: with the bucket space
    * fixed (`2^bandBits` per band), the chance-collision term grows with
    * |corpus|²/2^bandBits — `bandBits` must scale with log₂|corpus| to
    * hold candidates linear (Sf1BandingSpec measures both regimes).
    */
  def lshCandidateCount(emb: DataFrame, nBits: Int = 32,
      bandBits: Int = 8, dim: Int = 64): DataFrame = {
    require(nBits % bandBits == 0, "bandBits must divide nBits")
    val mask = -1L >>> (64 - bandBits) // mod-64-shift-safe at bandBits=64
    emb
      .withColumn("sig", lshSignature(col("embedding"), nBits, dim))
      // signature-less rows (NULL elements / dimension mismatch) never
      // join in the real LSH ops (equi-join keys drop NULLs) — counting
      // them here as one giant colliding bucket would report phantom
      // quadratic blowup the operator can never produce
      .filter(col("sig").isNotNull)
      .select(posexplode(array((0 until nBits / bandBits).map(b =>
        shiftright(col("sig"), b * bandBits).bitwiseAND(mask)): _*)))
      .groupBy("pos", "col").agg(count(lit(1)).as("c"))
      // decimal accumulate + saturating surface, same rationale as
      // DedupOps.candidateCounts.pairSum: the long product would wrap
      // negative exactly when a saturated bucket must be reported
      .agg(coalesce(
          sum(col("c").cast("decimal(20,0)") * (col("c") - lit(1))),
          lit(0).cast("decimal(38,0)")).as("cc2"))
      .select(lit(s"hyperplane_bands_$bandBits").as("generator"),
        least(col("cc2") / lit(2), lit(Long.MaxValue).cast("decimal(38,0)"))
          .cast("long").as("n_candidates"))
  }

  /** ANN via banded hyperplane LSH: signature → `bandBits`-bit chunks →
    * bucket join → exact cosine on candidates → per-query top-k. Same
    * output schema as [[bruteForceTopK]]; recall < 1 by construction (ANN).
    * Band width tunes recall vs candidate volume: P(candidate) =
    * 1-(1-(1-θ/π)^bandBits)^(nBits/bandBits).
    */
  /** (vec_id, embedding, band, chunk) banded hyperplane signatures over
    * an arbitrary (vec_id, embedding) frame — the corpus-side index
    * shape shared by [[lshTopK]], [[lshTopKMultiprobe]], and the
    * multiprobe candidate audit.
    */
  private[graft] def bandedSignatures(emb: DataFrame, nBits: Int,
      bandBits: Int, dim: Int): DataFrame = {
    require(nBits % bandBits == 0,
      s"bandBits ($bandBits) must divide nBits ($nBits) or signature bits are silently unused")
    val mask = -1L >>> (64 - bandBits) // mod-64-shift-safe at bandBits=64
    emb.select(col("vec_id"), col("embedding"),
        lshSignature(col("embedding"), nBits, dim).as("sig"))
      .select(col("vec_id"), col("embedding"),
        posexplode(array((0 until nBits / bandBits).map(b =>
          shiftright(col("sig"), b * bandBits).bitwiseAND(mask)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
  }

  /** Query-side multiprobe expansion: each query band row fans out to
    * its own chunk plus every Hamming-1 flip — bandBits+1 probe rows per
    * (query, band), the only side that grows with the probe count.
    */
  private def multiprobeQueries(banded: DataFrame, nQueries: Int,
      bandBits: Int): DataFrame = {
    val flips = lit(0L) +: (0 until bandBits).map(j => lit(1L << j))
    banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("band"),
        explode(array(flips.map(m => col("chunk").bitwiseXOR(m)): _*))
          .as("chunk"))
  }

  def lshTopK(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
      nBits: Int = 32, bandBits: Int = 8, dim: Int = 64): DataFrame = {
    val banded = bandedSignatures(
      Tables.embeddings(s, d).select("vec_id", "embedding"),
      nBits, bandBits, dim)
    val cand = banded.join(broadcast(
        banded.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
            col("band"), col("chunk"))),
        Seq("band", "chunk"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "q_emb", "vec_id", "embedding")
      .distinct()
    rankTopK(cand.withColumn("cosine_sim",
      cosineScore(col("q_emb"), col("embedding"))), k)
  }

  /** Multiprobe LSH top-k (Lv et al. 2007): [[lshTopK]] plus, per query
    * band, probes of every Hamming-1 neighbor bucket (the `bandBits`
    * single-bit flips of the chunk). A near neighbor that landed one bit
    * away in a band — the dominant miss mode of plain banding, measured
    * at recall 0.14 here (AnnRecallSpec) — is recovered WITHOUT adding
    * bands or re-hashing the corpus: only the tiny query side fans out
    * (bandBits+1 probe rows per query band), the corpus side's banding
    * and the equi-join shape are unchanged. The standard recall/cost
    * knob when more bands (more corpus replicas of the index) are too
    * expensive — which at 100 TB they are.
    */
  def lshTopKMultiprobe(s: SparkSession, d: String, k: Int = 5,
      nQueries: Int = 10, nBits: Int = 32, bandBits: Int = 8,
      dim: Int = 64): DataFrame = {
    val banded = bandedSignatures(
      Tables.embeddings(s, d).select("vec_id", "embedding"),
      nBits, bandBits, dim)
    val probed = multiprobeQueries(banded, nQueries, bandBits)
    val cand = banded.join(broadcast(probed), Seq("band", "chunk"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "q_emb", "vec_id", "embedding")
      .distinct()
    rankTopK(cand.withColumn("cosine_sim",
      cosineScore(col("q_emb"), col("embedding"))), k)
  }

  /** Candidate-row count of [[lshTopKMultiprobe]] over an arbitrary
    * (vec_id, embedding) frame — the banding audit for the multiprobe
    * path: with the query set FIXED, candidate volume is Σ over probed
    * (band, chunk) buckets of their corpus-side occupancy, which must
    * grow LINEARLY with the corpus (each corpus row lands in nBits/
    * bandBits buckets regardless of corpus size; only bucket membership
    * grows). Counted join-side pre-distinct — the rows the exact-cosine
    * verify actually pays for.
    */
  def lshMultiprobeCandidateCount(emb: DataFrame, nQueries: Int = 10,
      nBits: Int = 32, bandBits: Int = 8, dim: Int = 64): DataFrame = {
    val banded = bandedSignatures(emb, nBits, bandBits, dim)
    val probed = multiprobeQueries(banded, nQueries, bandBits)
    banded.join(
        broadcast(probed.select("query_id", "band", "chunk")),
        Seq("band", "chunk"))
      .filter(col("vec_id") =!= col("query_id"))
      .agg(count(lit(1)).as("n"))
      .select(lit(s"multiprobe_bands_$bandBits").as("generator"),
        coalesce(col("n"), lit(0L)).cast("long").as("n_candidates"))
  }

  /** The first `cells` corpus vectors VERBATIM (cast to double) as the
    * medoid-seeded centroid matrix — the ONE bounded driver-state collect
    * (cells × dim doubles) behind [[ivfTopKSeeded]], [[clusterProfile]]
    * and [[semanticDedup]]; at real scale seed from a clustering pass
    * ([[kmeansCentroids]]) instead of the first rows.
    */
  private def medoidCentroids(emb: DataFrame, cells: Int)
      : Array[Array[Double]] =
    emb.select("vec_id", "embedding")
      .filter(col("vec_id") < cells).orderBy("vec_id")
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  /** Element-wise mean vectors per cell key, collected to the driver as a
    * dense matrix — the k-means "update" step. The collect is bounded by
    * |cells|·dim doubles (k-means state is small by construction; this is
    * exactly how MLlib's KMeans iterates). posexplode + avg aggregates with
    * map-side partial aggregation: shuffle volume is
    * partitions·|cells|·dim, independent of corpus size.
    */
  private def cellMeans(df: DataFrame, cellCol: String,
      vecCol: String): Seq[(Int, Array[Double])] =
    df.select(col(cellCol).cast("int").as("c"), posexplode(col(vecCol)))
      .groupBy("c", "pos").agg(avg("col").as("m"))
      .groupBy("c")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("c"), transform(col("pm"), p => p.getField("m")).as("v"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq

  /** k-means centroids over the embedding corpus: initialized from the
    * per-label means (deterministic seeding — the labels partition the
    * fixture into meaningful clusters), refined with `iters` Lloyd
    * iterations. Assignment is the row-local [[nearestCentroids]] scalar
    * expression over the broadcast matrix — ZERO shuffle per iteration on
    * the assignment side; the update is the bounded [[cellMeans]]
    * aggregate. Empty cells keep their previous centroid.
    */
  def kmeansCentroids(emb: DataFrame, iters: Int): Array[Array[Double]] = {
    // seed: per-label means, label→cell index by sorted label order
    // (driver-side — |labels| is bounded)
    var centroids: Array[Array[Double]] = emb
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(avg("col").as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").cast("string").as("label"),
        transform(col("pm"), p => p.getField("m")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    var it = 0
    while (it < iters) {
      val assigned = emb.withColumn("cell",
        element_at(nearestCentroids(col("embedding"), centroids, 1), 1))
      val next = centroids.map(_.clone())
      cellMeans(assigned, "cell", "embedding")
        .foreach { case (c, v) => next(c) = v }
      centroids = next
      it += 1
    }
    centroids
  }

  /** IVF (inverted-file) ANN: partition the corpus into cells around
    * k-means centroids, search only the `nProbe` cells nearest each query.
    *
    * Cell assignment is one narrow pass: the [[NearestCentroids]] scalar
    * expression computes each row's nearest cell over the plan-time
    * centroid matrix — no crossJoin, no per-vector window, no Exchange
    * keyed by vec_id (the previous formulation shuffled and sorted
    * |corpus|×|cells| rows through `row_number`). The probe step touches
    * |corpus|·nProbe/|cells| rows — the classic recall/cost dial. The
    * probe table is broadcast: it is bounded by nQueries·nProbe rows by
    * construction (a query working set, never corpus-sized). Output schema
    * matches [[bruteForceTopK]].
    */
  def ivfTopK(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
      nProbe: Int = 3, kmeansIters: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val centroids = kmeansCentroids(emb, kmeansIters)
    val assigned = emb
      .withColumn("cell",
        element_at(nearestCentroids(col("embedding"), centroids, 1), 1))
      .select(col("vec_id"), col("embedding"), col("cell"))
    // each query probes its nProbe nearest cells (row-local, then explode)
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(nearestCentroids(col("embedding"), centroids, nProbe))
          .as("cell"))
    // search only the probed cells
    rankTopK(assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        cosineScore(col("q_emb"), col("embedding"))), k)
  }

  /** IVF with MEDOID seeding: the centroids are the first `cells` corpus
    * vectors VERBATIM (cast to double), not k-means means. Same cell
    * probe shape and cost model as [[ivfTopK]], but with no data-derived
    * floating-point averages anywhere — every number in the pipeline is
    * either stored data or a sequential dot product, so the whole search
    * is engine-reproducible and carries a full DuckDB oracle (the k-means
    * variant's mean-of-doubles depends on partial-aggregate merge order
    * and is honestly rows-only). Medoid seeding is the standard cheap
    * initialization when a clustering pass hasn't run yet; recall is
    * whatever the seed quality gives (spec-measured vs brute force).
    */
  def ivfTopKSeeded(s: SparkSession, d: String, k: Int = 5,
      nQueries: Int = 10, nProbe: Int = 3, cells: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    // bounded driver state: `cells` vectors, the k-means-style footprint
    val centroids = medoidCentroids(emb, cells)
    val assigned = emb
      .withColumn("cell",
        element_at(nearestCentroids(col("embedding"), centroids, 1), 1))
      .select(col("vec_id"), col("embedding"), col("cell"))
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(nearestCentroids(col("embedding"), centroids, nProbe))
          .as("cell"))
    rankTopK(assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        cosineScore(col("q_emb"), col("embedding"))), k)
  }

  /** Per-cluster corpus profile over the medoid-seeded cells of
    * [[ivfTopKSeeded]]: assign EVERY vector to its nearest centroid (the
    * row-local [[NearestCentroids]] pass — no crossJoin, no window) and
    * aggregate per cell: member count and min / mean / max cosine to the
    * centroid. This is the audit a semantic-dedup or topic-balance pass
    * runs before sampling at 100 TB — cell sizes expose skew (a mega-
    * cluster means the centroid set is too coarse), the cosine spread
    * exposes cell tightness.
    *
    * Determinism / oracle parity: centroids are stored vectors VERBATIM
    * (no floating averages), per-row cosine is rounded to 1e-6 and summed
    * as DECIMAL(10,6) (associative — safe under partial-aggregate merge),
    * one double division at the end. Scale: one narrow corpus pass + one
    * O(cells)-row aggregate; the centroid collect is the same bounded
    * driver state as [[ivfTopKSeeded]] (cells × dim doubles).
    */
  def clusterProfile(s: SparkSession, d: String, cells: Int = 10)
      : DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val centroids = medoidCentroids(emb, cells)
    val cents = emb.filter(col("vec_id") < cells)
      .select(col("vec_id").cast("int").as("cell"),
        col("embedding").as("c_emb"))
    emb
      .withColumn("cell",
        element_at(nearestCentroids(col("embedding"), centroids, 1), 1))
      .join(broadcast(cents), Seq("cell"))
      .withColumn("sim", cosineScore(col("c_emb"), col("embedding")))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        sum(col("sim").cast("decimal(10,6)")).as("sum_sim"),
        min(col("sim")).as("min_sim"),
        max(col("sim")).as("max_sim"))
      .select(col("cell").cast("long").as("cell"), col("n_vectors"),
        (col("sum_sim").cast("double") / col("n_vectors")).as("mean_sim"),
        col("min_sim"), col("max_sim"))
      .orderBy("cell")
  }

  /** Product-quantization (PQ) ANN: split each vector into `m` subspaces,
    * quantize each sub-vector to its nearest codeword (L2, the PQ-standard
    * assignment metric) from a per-subspace codebook, and score queries
    * against the RECONSTRUCTED corpus (concatenated codewords) with exact
    * full-precision queries — the asymmetric-distance setup of Jégou et
    * al.'s "Product Quantization for Nearest Neighbor Search".
    *
    * Scale shape: the stored index is `m` small ints per vector (m bytes
    * once packed — 32× smaller than the fp32 corpus at dim=64/m=8); the
    * codebooks are plan-time constants (m·K·(dim/m) doubles — KBs), so
    * encode and reconstruct are row-local compiled expressions with ZERO
    * shuffle: `slice` → [[graft.functions.NearestCentroids]](metric=l2)
    * per subspace, then literal-array codeword lookups. One corpus pass,
    * broadcast queries — identical join/rank tail to [[bruteForceTopK]].
    *
    * Codebooks here are MEDOID-seeded (the first `codebookSize` corpus
    * vectors' sub-slices, verbatim), the same deliberate choice as
    * [[ivfTopKSeeded]]: no data-derived floating-point averages anywhere,
    * so every number is stored data or a sequential fold and the whole
    * search carries a full DuckDB oracle. A k-means-refined codebook drops
    * in by replacing `codebook` (see [[kmeansCentroids]]); recall vs
    * brute force is spec-measured either way.
    *
    * Production two-stage shape: the ADC pass SHORTLISTS `rerank`
    * candidates per query from codes alone (never touching stored
    * vectors), then only those candidates' true vectors are fetched and
    * re-scored exactly — output similarities are exact cosines, and the
    * full-precision corpus is read at `rerank/|corpus|` selectivity (the
    * IO shape that makes PQ pay at 100 TB).
    */
  def pqTopKSeeded(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
      m: Int = 16, codebookSize: Int = 32, rerank: Int = 50): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    // bounded driver state: `codebookSize` seed vectors (same footprint
    // class as the k-means centroid collect)
    val seeds: Array[Array[Double]] = emb
      .filter(col("vec_id") < codebookSize).orderBy("vec_id")
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    // codebook(si)(code) = codeword: seed si-th sub-slice, code = seed row
    val codebook: Array[Array[Array[Double]]] =
      Array.tabulate(m)(si => seeds.map(_.slice(si * sub, (si + 1) * sub)))
    // encode: per-subspace compiled L2 argmin over the plan-time codebook
    val codeCols = (0 until m).map { si =>
      element_at(nearestCentroids(
        slice(col("embedding"), si * sub + 1, sub),
        codebook(si), 1, "l2"), 1).as(s"code_$si")
    }
    // reconstruct: literal-array codeword lookup per subspace (codes are
    // 0-based, element_at is 1-based), concatenated back to a dim-vector
    val recon = flatten(array((0 until m).map { si =>
      element_at(typedlit(codebook(si).map(_.toSeq).toSeq),
        col(s"code_$si") + 1)
    }: _*))
    val coded = emb.select((col("vec_id") +: codeCols): _*)
      .withColumn("recon", recon)
      .select("vec_id", "recon")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // stage 1 (ADC): shortlist `rerank` per query from codes alone
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_sim").desc, col("vec_id"))
    val shortlist = coded
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("approx_sim", cosineSim(col("q_emb"), col("recon")))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= rerank)
      .select("query_id", "q_emb", "vec_id")
    // stage 2: fetch the shortlist's true vectors, exact re-rank
    rankTopK(shortlist
      .join(emb, Seq("vec_id"))
      .withColumn("cosine_sim",
        cosineScore(col("q_emb"), col("embedding"))), k)
  }

  /** IVF-PQ: the two coarse-to-fine stages composed — the architecture
    * production ANN systems (FAISS IVFPQ) actually run at scale. The
    * coarse quantizer ([[ivfTopKSeeded]]'s seeded centroids) prunes the
    * corpus to `nProbe` cells per query; within the probed cells the
    * ADC pass scores PQ-RECONSTRUCTED vectors ([[pqTopKSeeded]]'s seeded
    * codebooks); only the surviving `rerank` shortlist touches true
    * full-precision vectors.
    *
    * Why this composition is the 100 TB shape: IVF cuts candidates by
    * |cells|/nProbe (coarse geometry), PQ cuts the bytes per candidate
    * by 32× (ADC reads codes, not vectors), and the exact re-rank reads
    * full vectors at `rerank/|corpus|` selectivity. Every stage is
    * row-local compiled expressions (assignment, encode, reconstruct) —
    * the only shuffles are the per-query rank windows, both over
    * already-pruned sets.
    *
    * Fully deterministic (seeded centroids + seeded codebooks, no
    * floating averages) — carries a complete DuckDB oracle like both
    * parents. Recall vs brute force is spec-measured.
    */
  def ivfPqTopK(s: SparkSession, d: String, k: Int = 5, nQueries: Int = 10,
      nProbe: Int = 3, cells: Int = 10, m: Int = 16, codebookSize: Int = 32,
      rerank: Int = 50): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    // bounded driver state: cells + codebookSize stored vectors (the
    // k-means/codebook-training footprint class, collected once)
    val seedRows: Array[Array[Double]] = emb
      .filter(col("vec_id") < math.max(cells, codebookSize))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val centroids = seedRows.take(cells)
    val seeds = seedRows.take(codebookSize)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val sub = dim / m
    val codebook: Array[Array[Array[Double]]] =
      Array.tabulate(m)(si => seeds.map(_.slice(si * sub, (si + 1) * sub)))
    val codeCols = (0 until m).map { si =>
      element_at(nearestCentroids(
        slice(col("embedding"), si * sub + 1, sub),
        codebook(si), 1, "l2"), 1).as(s"code_$si")
    }
    val recon = flatten(array((0 until m).map { si =>
      element_at(typedlit(codebook(si).map(_.toSeq).toSeq),
        col(s"code_$si") + 1)
    }: _*))
    // stored index: (vec_id, cell, codes→recon) — cell + m codes per
    // vector; both compiled row-local, zero shuffle
    val coded = emb
      .withColumn("cell",
        element_at(nearestCentroids(col("embedding"), centroids, 1), 1))
      .select((col("vec_id") +: col("cell") +: codeCols): _*)
      .withColumn("recon", recon)
      .select("vec_id", "cell", "recon")
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(nearestCentroids(col("embedding"), centroids, nProbe))
          .as("cell"))
    // stage 1 (IVF ∩ ADC): only probed cells, codes only
    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_sim").desc, col("vec_id"))
    val shortlist = coded.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("approx_sim", cosineSim(col("q_emb"), col("recon")))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= rerank)
      .select("query_id", "q_emb", "vec_id")
    // stage 2: exact re-rank of the shortlist's true vectors
    rankTopK(shortlist
      .join(emb, Seq("vec_id"))
      .withColumn("cosine_sim",
        cosineScore(col("q_emb"), col("embedding"))), k)
  }

  /** Hyperplane band width sized to the corpus (rationale at
    * [[DedupOps.sizedPow2Bits]]): floor 8 (the fixture geometry),
    * widening with log₂ n up to `nBits`. Sf1BandingSpec measured the
    * fixed 8-bit space saturating 99× at 10×; the sized width restores
    * ~linear candidate growth.
    *
    * The recall trade, stated honestly: per-band recall is
    * p^bandBits with p = 1 − θ/π, total 1-(1-p^bandBits)^L over
    * L = nBits/bandBits bands. Widening bands therefore narrows the
    * similarity regime the operator catches: at 2×32-bit bands, recall
    * is ~86 % at cosine 0.999, ~41 % at 0.99, ~2 % at 0.9. That makes
    * wide-band LSH a NEAR-IDENTICAL dedup operator (the regime where
    * candidate linearity matters most); holding 90 % recall at cosine
    * 0.9 needs L ≈ ln(0.1)/ln(1-p^32) ≈ 290 independent bands — at that
    * point the right tool is the IVF / semantic-cluster path
    * ([[ivfTopKSeeded]], [[semanticDedup]]), which preserves recall by
    * partitioning the space instead of hashing it.
    */
  def sizedBandBits(nVecs: Long, nBits: Int = 32, slackBits: Int = 6): Int =
    DedupOps.sizedPow2Bits(nVecs, 8, nBits, slackBits)

  /** [[cosineNearDupPairsLsh]] with the band width derived from one
    * corpus count — the production entry when the scale is not known up
    * front. nBits 64 keeps ≥ 2 bands even at the 32-bit cap; see
    * [[sizedBandBits]] for the similarity regime each width serves.
    */
  def cosineNearDupPairsLshAuto(s: SparkSession, d: String,
      threshold: Double = 0.9): DataFrame = {
    val n = Tables.embeddings(s, d).count()
    cosineNearDupPairsLsh(s, d, threshold, nBits = 64,
      bandBits = sizedBandBits(n, nBits = 64))
  }

  /** Near-duplicate pairs via banded hyperplane LSH — the 100 TB shape:
    * candidates are bucket collisions (∝ true-dup density in the near-dup
    * regime, never all-pairs), verified with exact cosine. Unlike the
    * label-blocked exact variant below, no blocking key is needed, so a
    * hot label cannot degenerate quadratic.
    *
    * Band geometry targets the real near-dup regime (cosine ≥ ~0.9, where
    * per-bit agreement is 1-θ/π ≈ 0.86): 8 bands × 8 bits give ~93 %
    * recall per [1-(1-p^8)^8] while a random pair (cosine ≈ 0) collides
    * with probability ~3 per mille. At the fixture's looser thresholds
    * recall drops — that is the LSH contract (tune bands), spec'd against
    * planted dups at 0.9.
    */
  def cosineNearDupPairsLsh(s: SparkSession, d: String,
      threshold: Double = 0.9, nBits: Int = 64, bandBits: Int = 8,
      dim: Int = 64): DataFrame = {
    require(nBits % bandBits == 0,
      s"bandBits ($bandBits) must divide nBits ($nBits) or signature bits are silently unused")
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val mask = -1L >>> (64 - bandBits) // mod-64-shift-safe at bandBits=64
    // candidate generation carries IDs only (16-byte rows through the
    // band shuffle); embeddings are fetched per candidate pair for the
    // verify step — work ∝ candidates, not corpus × bands
    val banded = emb
      .withColumn("sig", lshSignature(col("embedding"), nBits, dim))
      .select(col("vec_id"),
        posexplode(array((0 until nBits / bandBits).map(b =>
          shiftright(col("sig"), b * bandBits).bitwiseAND(mask)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "chunk"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a")),
        Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b")),
        Seq("vec_b"))
      .withColumn("cosine_sim", cosineScore(col("e_a"), col("e_b")))
      .filter(col("cosine_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cosine_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Embedding near-duplicate pairs: all (a,b) with cosine ≥ threshold.
    * Exact variant — label-blocked self-join keeps this O(n²/|labels|);
    * the LSH signature above is the unblocked scale path.
    */
  def cosineNearDupPairs(s: SparkSession, d: String,
      threshold: Double = 0.9): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding", "label")
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"),
      col("label"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"),
      col("label"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine_sim",
        cosineScore(col("e_a"), col("e_b")))
      .filter(col("cosine_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label"), col("cosine_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): cluster-blocked semantic
    * dedup. Assign every vector to its nearest medoid centroid (the same
    * row-local pass as [[clusterProfile]]), compare pairs ONLY within a
    * cell (exact cosine), and greedily drop the higher-id member of every
    * pair above `threshold` — keeping, per semantic-duplicate group, its
    * lowest id. Returns the survivors.
    *
    * Scale shape: the paper's exact recipe — clustering makes the
    * quadratic term per-cell (Σ|cell|² ≪ n² with balanced cells; the
    * [[clusterProfile]] audit is how you check that balance BEFORE paying
    * for the join), the pair join shuffles on the cell key only, and the
    * greedy-by-id rule needs one anti-join rather than connected
    * components (a dropped vector can itself still drop others — matching
    * the paper's "keep one representative per ε-ball around the
    * kept set" greedy, evaluated deterministically: v is dropped iff
    * SOME lower-id cell-mate is within ε, kept otherwise).
    *
    * `cells` is simultaneously the pair join's parallelism (it is the
    * only join key) and the quadratic divisor — it must GROW with the
    * corpus (the paper runs ~10⁵ clusters at web scale; 10 here matches
    * the oracle's seeded centroid set). At real scale seed from a
    * clustering pass ([[kmeansCentroids]]) instead of the first rows.
    */
  def semanticDedup(s: SparkSession, d: String, cells: Int = 10,
      threshold: Double = 0.4): DataFrame =
    // default ε: the paper runs ~0.95+ on L2-normalized real embeddings;
    // the synthetic corpus is near-orthogonal (zero in-cell pairs above
    // 0.5 at sf0.01), so the shipped default sits where the operator has
    // observable work — callers tune per embedding space
    semanticDedupFrom(
      Tables.embeddings(s, d).select("vec_id", "embedding"),
      cells, threshold)

  /** [[semanticDedup]]'s core over an explicit (vec_id, embedding)
    * frame — consumed by [[graft.EmbPipeline]] so the pipeline's
    * semdedup stage runs on the STAGED prior stage, not a fresh table
    * scan.
    */
  private[graft] def semanticDedupFrom(embIn: DataFrame, cells: Int,
      threshold: Double): DataFrame = {
    val emb = embIn.select("vec_id", "embedding")
    val centroids = medoidCentroids(emb, cells)
    val assigned = emb.withColumn("cell",
      element_at(nearestCentroids(col("embedding"), centroids, 1), 1))
    val a = assigned.select(col("cell"), col("vec_id").as("vec_a"),
      col("embedding").as("e_a"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("e_b"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .filter(cosineScore(col("e_a"), col("e_b")) >= threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .orderBy("vec_id")
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, element
    * q = ⌊x/scale + 0.5⌋ ∈ [-127, 127] (explicit floor, not `round` —
    * floor is exactly specified on IEEE doubles, so any engine computes
    * the identical integers; an all-zero vector quantizes to zeros).
    * 4× smaller than float32 at rest and in shuffle — the representation
    * a 100 TB ANN index actually stores.
    *
    * This HOF form is the readable spec twin; the hot path uses the
    * compiled [[graft.functions.QuantizeInt8]] (identical values, one
    * codegen'd pass — a property spec pins the equivalence).
    */
  def quantizeInt8(v: Column): Column = {
    val dv = transform(v, x => x.cast("double"))
    val scale =
      aggregate(dv, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0
    when(scale === 0.0, transform(dv, _ => lit(0L)))
      .otherwise(transform(dv, x => floor(x / scale + lit(0.5)).cast("long")))
  }

  /** Brute-force top-k over int8-quantized vectors: cosine on the
    * quantized grid. Same scan shape as [[bruteForceTopK]] (broadcast
    * queries, one corpus pass) at a quarter of the index memory/IO;
    * ranking error vs float is the quantization error (spec measures
    * recall vs [[bruteForceTopK]]).
    *
    * The per-PAIR inner loop is the fused codegen'd [[CosineSimilarity]]
    * over the quantized values widened to double — every product and
    * partial sum is an integer < 2⁵³, IEEE-exact in double, so the result
    * is bit-identical to explicit integer dot products (the oracle's
    * formulation; the interpreted zip_with/aggregate HOF form this
    * replaced measured 3-4× slower per pair). Quantization and the
    * zero-vector guard are narrow per-ROW passes.
    */
  def bruteForceTopKInt8(s: SparkSession, d: String, k: Int = 5,
      nQueries: Int = 10): DataFrame = {
    val emb = Tables.embeddings(s, d)
      // compiled single-expression quantizer (exact-integer doubles); the
      // HOF [[quantizeInt8]] is its spec twin — five interpreted array
      // walks measured ~10× the whole fp32 scan
      .select(col("vec_id"),
        graft.functions.QuantizeInt8.quantizeInt8Compiled(
          col("embedding")).as("qd"))
      // norm2 > 0 ⟺ some element non-zero (cosine undefined on 0-vectors)
      .filter(exists(col("qd"), x => x =!= 0.0))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qd").as("q_qd"))
    rankTopK(emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cosine_sim", cosineScore(col("q_qd"), col("qd"))), k)
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein 1998):
    * greedily re-order each query's cosine top-k so every next pick
    * maximizes λ·rel(c) − (1−λ)·max over already-picked s of sim(c, s)
    * — the diversity re-ranker that keeps a retrieval slate from being
    * k copies of the same document (the slate-level cousin of
    * [[semanticDedup]]). Relevance is [[bruteForceTopK]]'s exact rank
    * surface; candidate↔candidate similarity is the SAME rounded-1e-6
    * [[cosineScore]], so every number entering the greedy argmax is
    * bit-identical across engines, and λ/(1−λ) ride as the literal pair
    * 0.7/0.3 (never `1 − λ` computed in floating point, whose 0.30000…4
    * would diverge from the oracle's decimal literal). The greedy loop
    * is `select − 1` driver-paced rounds over slate-sized frames: the
    * corpus-sized work ends at the top-k scan — candidates are
    * O(queries·k) rows and pairwise slate sims O(queries·k²), so
    * re-ranking is free at 100 TB no matter how the corpus grows; the
    * oracle unrolls the identical rounds as CTEs.
    */
  def mmrRerank(s: SparkSession, d: String, k: Int = 10,
      select: Int = 5, nQueries: Int = 10): DataFrame = {
    val lamRel = lit(0.7)
    val lamDiv = lit(0.3)
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    // candidate slate: the exact top-k, relevance = rounded cosine
    val cand = bruteForceTopK(s, d, k, nQueries)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"))
    val ce = cand
      .join(emb, col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("cosine_sim"), col("embedding"))
      .localCheckpoint()
    // slate-internal similarity, both directions (≤ k² rows per query)
    val csim = ce.as("x").join(ce.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.neighbor_id") =!= col("y.neighbor_id"))
      .select(col("x.query_id").as("query_id"),
        col("x.neighbor_id").as("ca"), col("y.neighbor_id").as("cb"),
        cosineScore(col("x.embedding"), col("y.embedding")).as("sim"))
      .localCheckpoint()
    val slate = ce.select("query_id", "neighbor_id", "cosine_sim")
    val w = Window.partitionBy("query_id")
      .orderBy(col("mmr").desc, col("neighbor_id"))
    def top1(scoredF: DataFrame, rank: Int): DataFrame =
      scoredF.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .withColumn("mmr_rank", lit(rank.toLong))
    var sel = top1(slate.withColumn("mmr",
      lamRel * col("cosine_sim") - lamDiv * lit(0.0)), 1)
    for (i <- 2 to select) {
      val rem = slate.join(sel.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      val mx = sel.select(col("query_id"), col("neighbor_id").as("cb"))
        .join(csim, Seq("query_id", "cb"))
        .groupBy(col("query_id"), col("ca").as("neighbor_id"))
        .agg(max(col("sim")).as("ms"))
      val scoredF = rem.join(mx, Seq("query_id", "neighbor_id"), "left")
        .withColumn("mmr",
          lamRel * col("cosine_sim")
            - lamDiv * coalesce(col("ms"), lit(0.0)))
        .select("query_id", "neighbor_id", "cosine_sim", "mmr")
      // per-round lineage truncation, the CC/PageRank loop discipline:
      // without it each round's plan embeds the whole greedy history
      // (the un-checkpointed chain planned ~900 physical nodes by round
      // 5 — Catalyst pays superlinearly for frames this tiny)
      sel = sel.unionByName(top1(scoredF, i)).localCheckpoint()
    }
    sel.select(col("query_id"), col("mmr_rank"),
        col("neighbor_id"), col("cosine_sim"), col("mmr").as("mmr_score"))
      .orderBy("query_id", "mmr_rank")
  }

  /** MMR plan frames for the committed snapshot (Explain routes
    * `emb_mmr_rerank` through here): the full query plus the
    * corpus-sized slate construction and one REAL greedy round — the
    * frames the checkpointed loop hides.
    */
  def mmrExplainFrames(s: SparkSession, d: String)
      : Seq[(String, DataFrame)] = {
    val cand = bruteForceTopK(s, d, 10, 10)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"))
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val ce = cand.join(emb, col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"),
        col("embedding"))
    val slate = ce.select("query_id", "neighbor_id", "cosine_sim")
      .localCheckpoint()
    val csim = ce.as("x").join(ce.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.neighbor_id") =!= col("y.neighbor_id"))
      .select(col("x.query_id").as("query_id"),
        col("x.neighbor_id").as("ca"), col("y.neighbor_id").as("cb"),
        cosineScore(col("x.embedding"), col("y.embedding")).as("sim"))
      .localCheckpoint()
    val w = Window.partitionBy("query_id")
      .orderBy(col("mmr").desc, col("neighbor_id"))
    val sel1 = slate
      .withColumn("mmr", lit(0.7) * col("cosine_sim") - lit(0.3) * lit(0.0))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .withColumn("mmr_rank", lit(1L))
      .localCheckpoint()
    val rem = slate.join(sel1.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_anti")
    val mx = sel1.select(col("query_id"), col("neighbor_id").as("cb"))
      .join(csim, Seq("query_id", "cb"))
      .groupBy(col("query_id"), col("ca").as("neighbor_id"))
      .agg(max(col("sim")).as("ms"))
    val round2 = rem.join(mx, Seq("query_id", "neighbor_id"), "left")
      .withColumn("mmr", lit(0.7) * col("cosine_sim")
        - lit(0.3) * coalesce(col("ms"), lit(0.0)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    Seq("full query" -> mmrRerank(s, d),
      "slate construction (corpus-sized: brute top-k scan)" ->
        bruteForceTopK(s, d, 10, 10),
      "one greedy round (slate-sized: anti-join + max-sim + argmax)" ->
        round2)
  }

  /** Recall@k audit of the IVF ANN path against brute-force ground
    * truth — the measurement every approximate index owes its users
    * before anyone trusts it at 100 TB (the spec-pinned recall floors
    * assert a lower bound; this surfaces the actual per-query number
    * as data): per query, how many of the true cosine top-k the
    * [[ivfTopKSeeded]] probe set recovered. Both sides are the
    * REGISTERED operators verbatim (same 1e-6 cosine rounding, same
    * (score desc, id) tie-break), so the audit measures the production
    * path, not a reimplementation. Output is queries-sized; the
    * expensive frames are exactly the two audited operators, joined on
    * (query, neighbor) and reduced — recall = |approx ∩ truth| / k.
    *
    * Scale shape: ground truth is the corpus-sized brute pass — that is
    * inherent to a recall audit (you run it on a SAMPLE of queries, as
    * here); the join and reduce are (queries·k)-sized.
    */
  /** Matryoshka-style dimension-truncation audit (Kusupati et al.
    * 2022): recall@k of cosine search over the FIRST `dims` embedding
    * components against the full-dimension truth — the measurement
    * behind the "can we store/search 4× fewer dims?" decision every
    * embedding pipeline faces (truncation is the zeroth compression
    * baseline PQ/int8 must beat). Same audit contract as
    * [[annRecallAudit]]: both sides use the production scoring
    * (1e-6-rounded cosine, (score desc, id) tie-break), per-query
    * recall = |truncated ∩ full| / k. Scale: two brute passes over
    * the query sample + a (queries·k)-sized join — and the truncated
    * pass reads `dims/D` of the vector bytes, which is the point.
    */
  def dimTruncationAudit(s: SparkSession, d: String, k: Int = 5,
      dims: Int = 16, nQueries: Int = 10): DataFrame = {
    val full = bruteForceTopK(s, d, k, nQueries)
      .select(col("query_id"), col("neighbor_id"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"),
        slice(col("embedding"), 1, dims).as("embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val truncated = rankTopK(
        emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
          .withColumn("cosine_sim",
            cosineScore(col("q_emb"), col("embedding"))), k)
      .select(col("query_id").as("a_query"),
        col("neighbor_id").as("got_id"))
    full.join(truncated,
        col("query_id") === col("a_query")
          && col("neighbor_id") === col("got_id"), "left")
      .groupBy("query_id")
      .agg(sum(when(col("got_id").isNotNull, 1L).otherwise(0L))
        .as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / k)
      .orderBy("query_id")
  }

  def annRecallAudit(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val truth = bruteForceTopK(s, d, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = ivfTopKSeeded(s, d, k)
      .select(col("query_id").as("a_query"),
        col("neighbor_id").as("got_id"))
    truth.join(approx,
        col("query_id") === col("a_query")
          && col("neighbor_id") === col("got_id"), "left")
      .groupBy("query_id")
      .agg(sum(when(col("got_id").isNotNull, 1L).otherwise(0L))
        .as("n_hits"))
      .withColumn("recall", col("n_hits").cast("double") / k)
      .orderBy("query_id")
  }

  /** Greedy k-center coreset selection (Gonzalez 1985 farthest-first
    * traversal, the 2-approximation) over the embedding table in cosine
    * space: start from the min-id vector, then `k−1` times pick the
    * point FARTHEST from its nearest already-chosen center (= minimum
    * max-similarity; ties → min vec_id). The diversity-sampling pass a
    * training-data pipeline runs to pick maximally-spread exemplars —
    * the dual of [[semanticDedup]] (keep the spread instead of dropping
    * the dense).
    *
    * Each pick row carries `pick_sim` — its similarity to the nearest
    * earlier center at selection time (descending-radius certificate;
    * `1 − pick_sim` of the LAST pick upper-bounds twice the optimal
    * k-center radius). Determinism: similarities are the shared
    * [[cosineScore]] (round 6; NULL-on-NaN coalesced to −1 before
    * `greatest` so degenerate zero-norm vectors order identically in
    * both engines); the argmin is (max_sim ASC, vec_id).
    *
    * Scale: the classic k-scan shape — each round broadcasts ONE new
    * center row and updates the per-point running max similarity in a
    * single narrow pass (O(k·n) total, no pairwise term); round frames
    * are localCheckpoint-truncated like every driver-paced loop here.
    */
  def kcenterCoreset(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
      .localCheckpoint()
    val first = emb.withColumn("rn",
        row_number().over(Window.orderBy(col("vec_id"))))
      .filter(col("rn") === 1).drop("rn")
      .localCheckpoint()
    var centers = first.select(col("vec_id"), lit(1L).as("k_rank"),
      lit(null).cast("double").as("pick_sim"))
    var state = emb
      .join(first.select(col("vec_id").as("c_id"),
        col("embedding").as("c_emb")), col("vec_id") =!= col("c_id"))
      .select(col("vec_id"), col("embedding"),
        coalesce(cosineScore(col("embedding"), col("c_emb")), lit(-1.0))
          .as("max_sim"))
      .localCheckpoint()
    for (i <- 2 to k) {
      val pick = state.withColumn("rn", row_number().over(
          Window.orderBy(col("max_sim"), col("vec_id"))))
        .filter(col("rn") === 1).drop("rn")
        .localCheckpoint()
      centers = centers.unionByName(pick.select(col("vec_id"),
        lit(i.toLong).as("k_rank"), col("max_sim").as("pick_sim")))
      state = state
        .join(pick.select(col("vec_id").as("c_id"),
          col("embedding").as("c_emb")), col("vec_id") =!= col("c_id"))
        .select(col("vec_id"), col("embedding"),
          greatest(col("max_sim"),
            coalesce(cosineScore(col("embedding"), col("c_emb")),
              lit(-1.0))).as("max_sim"))
        .localCheckpoint()
    }
    centers.select(col("k_rank"), col("vec_id"), col("pick_sim"))
      .orderBy("k_rank")
  }

  /** Embedding-space drift monitor: per label, the cosine between the
    * CENTROIDS of two deterministic halves of the corpus (vec_id
    * parity — production swaps in time windows or train/serve splits).
    * The embedding companion of the scalar drift family
    * ([[graft.ops.EventOps.psiValueDrift]] on values,
    * [[graft.ops.TextOps.ksSplitDrift]] on lengths): a centroid cosine
    * falling from ~1 flags a representation or population shift that
    * per-feature monitors miss.
    *
    * Exactness: per-dimension sums quantize each float component onto
    * DECIMAL(20,10) (floats are exact doubles; the decimal recast is
    * the associativity discipline), so centroid components are one
    * exact-input division each; the 64-term dot/norm reductions are
    * per-term DECIMAL(24,12)-quantized sums — no accumulation-order
    * float anywhere, bit-exact in any engine.
    *
    * Scale shape: one posexplode shuffle to (label, side, dim) grain —
    * the same component-sum pass any distributed mean costs — then
    * everything lives at |labels|×|dims| grain. No pairwise term, no
    * vector materialization on the driver.
    */
  def centroidDrift(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        pmod(col("vec_id"), lit(2)).as("side"),
        posexplode(col("embedding")))
      .select(col("label"), col("side"), col("pos"),
        col("col").cast("double").cast("decimal(20,10)").as("v"))
    val comp = e.groupBy("label", "side", "pos")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .select(col("label"), col("side"), col("pos"),
        (col("sv").cast("double") / col("n").cast("double")).as("c"),
        col("n"))
    val a = comp.filter(col("side") === 0).select(col("label"), col("pos"),
      col("c").as("ca"), col("n").as("n_a"))
    val b = comp.filter(col("side") === 1).select(col("label"), col("pos"),
      col("c").as("cb"), col("n").as("n_b"))
    val g = a.join(b, Seq("label", "pos")).groupBy("label").agg(
      max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
      sum((col("ca") * col("cb")).cast("decimal(24,12)")).as("dot"),
      sum((col("ca") * col("ca")).cast("decimal(24,12)")).as("naa"),
      sum((col("cb") * col("cb")).cast("decimal(24,12)")).as("nbb"))
    g.select(col("label"), col("n_a"), col("n_b"),
        (col("dot").cast("double")
          / (sqrt(col("naa").cast("double"))
            * sqrt(col("nbb").cast("double")))).as("cos_drift"))
      .orderBy("label")
  }
}
