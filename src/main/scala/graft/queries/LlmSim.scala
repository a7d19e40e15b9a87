package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Near-duplicate detection + similarity search for LLM training-data
  * pipelines (SURVEY.md §2.3: d2, d4, d5, s1, s2, s3).
  *
  * Scale design: every candidate-generation step is a hash-shuffle on
  * a small key (band value / bit chunk / bucket id) — the quadratic
  * pair explosion only ever happens *inside* a bucket. Exact
  * verification runs only on candidates. Signatures are computed in a
  * single codegen'd projection (array folds, no UDFs, no shuffle).
  */
object LlmSim extends QueryModule {
  import Q.t

  // ── deterministic coefficient tables (seeded LCG, no RNG at plan time) ──
  private def lcgStream(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private val P30 = 1073741789L // prime < 2^30

  /** 16 (a, b) pairs for the MinHash universal-hash family. */
  private val minhashCoef: Seq[(Long, Long)] = {
    val it = lcgStream(42L)
    Seq.fill(16)(((math.abs(it.next()) % (P30 - 2)) + 1,
      math.abs(it.next()) % P30))
  }

  /** 32 hyperplanes (8 bands × 4 planes) × 64 dims in [-1, 1] for
    * sign-LSH, stored as float arrays so the codegen'd FloatVecDot
    * kernel computes each signed projection (the higher-order
    * aggregate/zip_with alternative runs interpreted).
    */
  private val hyperplanes: Seq[Seq[Float]] = {
    val it = lcgStream(7L)
    Seq.fill(32)(Seq.fill(64)(
      ((math.abs(it.next()) % 2001) / 1000.0 - 1.0).toFloat))
  }

  /** 128 hyperplanes (8 bands × 16 planes) for the near-dup LSH (d5b).
    * 16 planes per band give a 2^-16 random-pair band-collision rate —
    * near-dup detection needs far more selective buckets than top-k
    * search (s2), where missing a candidate only costs rank quality.
    */
  private val ndupPlanes: Seq[Seq[Float]] = {
    val it = lcgStream(19L)
    Seq.fill(128)(Seq.fill(64)(
      ((math.abs(it.next()) % 2001) / 1000.0 - 1.0).toFloat))
  }

  private val DEC = DecimalType(18, 15)

  /** Exact (order-independent) dot product of two float arrays:
    * per-position double products rounded onto a 15-decimal grid and
    * summed with exact integer arithmetic — equivalent to
    * `sum(cast(x*y as decimal(18,15)))` but as a native codegen'd
    * expression ([[graft.functions.FloatVecDot]]) instead of an
    * interpreted higher-order fold.
    */
  private def dotDec(a: Column, b: Column): Column =
    graft.functions.FloatVecDot.dot(a, b)

  /** Spherical k-means coarse quantizer for IVF (s3): Lloyd iterations
    * expressed as Spark aggregations. Assignment is a broadcast-join
    * argmax (`max_by` — one partial→final HashAggregate, no window
    * sort); the update is one HashAggregate over (centroid, dim). Only
    * aggregate results (k vectors at init, k×dim means per iteration)
    * ever reach the driver — never corpus rows — so training scales
    * exactly like any other groupBy.
    *
    * Deterministic end-to-end: seeded init (the k lowest-id vectors),
    * fixed iteration count, order-independent decimal-grid dot products
    * and decimal mean sums, smallest-centroid-id assignment tiebreak.
    */
  private[graft] def trainCentroids(s: SparkSession, e0: DataFrame,
      k: Int, iters: Int): Seq[(Int, Seq[Float])] = {
    import s.implicits._
    // the training set is scanned 2x per Lloyd iteration; persist it
    // for the (bounded) lifetime of training and release before
    // returning — at 100 TB the training input is a sample, so the
    // cached footprint is the sample size, not the corpus
    val e = e0.persist()
    try {
      trainCentroidsOn(s, e, k, iters)
    } finally e.unpersist()
  }

  private def trainCentroidsOn(s: SparkSession, e: DataFrame,
      k: Int, iters: Int): Seq[(Int, Seq[Float])] = {
    import s.implicits._
    def normalize(v: Array[Double]): Seq[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (if (n == 0) 0.0 else x / n).toFloat).toSeq
    }
    var cents: Seq[(Int, Seq[Float])] = e
      .filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => i -> normalize(v.map(_.toDouble).toArray) }
    for (_ <- 0 until iters) {
      val centDf = broadcast(cents.toDF("cent_id", "cent_v"))
      val assigned = e.join(centDf)
        .select(col("vec_id"), col("cent_id"), col("embedding"),
          dotDec(col("embedding"), col("cent_v")).as("d"))
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("cent_id"), col("embedding")),
          struct(col("d"), -col("cent_id"))).as("best"))
        .select(col("best.cent_id").as("cent_id"),
          col("best.embedding").as("embedding"))
      // exact decimal sums keep the mean independent of partitioning;
      // 12 integer digits so raw (unnormalized) embeddings up to 1e12
      // cannot overflow the cast to null and silently skew the mean
      val means = assigned
        .select(col("cent_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cent_id"), col("pos"))
        .agg((sum(col("v").cast(DecimalType(24, 12))).cast("double") /
          count(lit(1))).as("m"))
        .as[(Int, Int, Double)].collect()
      val byId = means.groupBy(_._1).map { case (cid, rows) =>
        cid -> normalize(rows.sortBy(_._2).map(_._3))
      }
      cents = cents.map { case (cid, old) => cid -> byId.getOrElse(cid, old) }
    }
    cents
  }

  /** 64-bit SimHash per document: (doc_id, n_words, simhash).
    *
    * Bit-majority counting uses packed-lane sums in a two-level
    * aggregation so the counters are exact at any realistic document
    * length:
    *   - level 1 groups by (doc_id, 127-word chunk) and sums 8 longs
    *     of 8 independent 8-bit lanes — a chunk holds ≤ 127 words, so
    *     a lane cannot carry into its neighbor and the top lane's
    *     weighted sum (127·2^56·…) stays under Long.Max;
    *   - level 2 spreads each 8-bit lane into a 32-bit slot (mask
    *     0x000000FF000000FF shifted — two lanes per long, 32 sums) and
    *     sums per doc — exact up to 2^31 words per document, with a
    *     raise_error guard past that instead of a silent wrap.
    * The pre-round-3 single-level version silently corrupted the
    * simhash of any ≥ 256-word document. Everything here is codegen'd
    * HashAggregates — higher-order array folds would run interpreted
    * and re-evaluate the hash per fold; level 1's map-side combine
    * does the bulk reduction, so level 2's 33 buffers only ever see
    * one row per 127 words.
    */
  private[graft] def simhash64(docs: DataFrame): DataFrame = {
    val LANES8 = 0x0101010101010101L
    val SPREAD = 0x000000FF000000FFL // lanes k and k+4 → 32-bit slots
    val hashed = docs
      .select(col("doc_id"),
        posexplode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
          " ")).as(Seq("pos", "w")))
      .select(col("doc_id"), (col("pos") / 127).cast("int").as("chk"),
        xxhash64(col("w")).as("wh"))
    val lvl1Aggs = count(lit(1)).as("cn") +: (0 until 8).map { j =>
      sum(shiftright(col("wh"), j).bitwiseAND(LANES8)).as(s"p_$j")
    }
    val lvl1 = hashed.groupBy(col("doc_id"), col("chk"))
      .agg(lvl1Aggs.head, lvl1Aggs.tail: _*)
    val lvl2Aggs = sum(col("cn")).as("n_words") +: (0 until 8).flatMap { j =>
      (0 until 4).map { k =>
        sum(shiftrightunsigned(col(s"p_$j"), 8 * k).bitwiseAND(SPREAD))
          .as(s"q_${j}_$k")
      }
    }
    val packed = lvl1.groupBy(col("doc_id"))
      .agg(lvl2Aggs.head, lvl2Aggs.tail: _*)
    // bit b lived in 8-bit lane l = b/8 of p_{b%8}; after the spread it
    // is the (l/4)-th 32-bit slot of q_{b%8}_{l%4}
    def cnt(b: Int): Column = {
      val (j, l) = (b % 8, b / 8)
      shiftrightunsigned(col(s"q_${j}_${l % 4}"), 32 * (l / 4))
        .bitwiseAND(0xFFFFFFFFL)
    }
    val sim = (0 until 64).map { b =>
      when(cnt(b) * 2 > col("n_words"), lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    packed.select(col("doc_id"), col("n_words"),
      when(col("n_words") < (1L << 31), sim)
        .otherwise(raise_error(concat(
          lit("simhash64: document "), col("doc_id"), lit(" has "),
          col("n_words"),
          lit(" words, beyond the 2^31-word exact-counter capacity"))))
        .as("simhash"))
  }

  /** Word-trigram shingles of the normalized text, hashed into [0, 2^30). */
  private def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ")
        .as("words"))
      .select(col("doc_id"),
        explode(expr(
          """transform(sequence(0, size(words) - 3),
               i -> concat_ws(' ', words[i], words[i+1], words[i+2]))"""))
          .as("sh"))
      .distinct()
      .withColumn("sh30", pmod(xxhash64(col("sh")), lit(1L << 30)))

  /** LSH candidate pairs from a MinHash signature table
    * `(doc_id, sig: array<long>[16])`, bounded two ways:
    *
    *  - **r=2 banding**: 8 bands, each keyed by the hash of a PAIR of
    *    minhashes, so a random pair collides in a band with
    *    probability s² (s = true jaccard) instead of s — mildly
    *    self-similar corpora no longer flood the buckets (the round-5
    *    r=1 form put every pair sharing ANY single minhash in a
    *    bucket).
    *  - **sorted-neighborhood cap** (same as d4): docs rank by id
    *    within each bucket and pair only with their next 8 neighbors,
    *    as a pure equi-join on (band, bh, rank) — candidate count is
    *    ≤ 8·8·n by construction (BandBoundSpec injects a 100-strong
    *    mutual near-dup cluster to pin this), and the quadratic
    *    intermediate never materializes at any scale. A true dup
    *    cluster stays fully discoverable through neighborhood
    *    chaining: consecutive members pair in every band.
    */
  private[graft] def minhashCandidates(mhArr: DataFrame): DataFrame = {
    val bands = mhArr.select(col("doc_id"),
      posexplode(array((0 until 8).map { j =>
        xxhash64(col("sig")(2 * j), col("sig")(2 * j + 1))
      }: _*)).as(Seq("band", "bh")))
    val wb = Window.partitionBy(col("band"), col("bh"))
      .orderBy(col("doc_id"))
    val ranked = bands.withColumn("rn", row_number().over(wb))
    val probes = ranked.select(col("doc_id").as("a"),
      col("band"), col("bh"),
      explode(sequence(col("rn") + 1, col("rn") + 8)).as("rn"))
    probes.join(ranked.select(col("doc_id").as("b"),
        col("band"), col("bh"), col("rn")),
        Seq("band", "bh", "rn"))
      .select(col("a"), col("b"))
      .distinct()
  }

  def queries: Map[String, Q] = Map(
    // ─── d2: MinHash + LSH near-dup candidates, exact-verified ───
    // (rows-only: the banding/bucketing is engine-specific; its exact-
    // jaccard verification is the same computation d3 oracles.)
    "d2_dedup_minhash" -> Q(
      (s, dir) => {
        // Exact duplicates are collapsed FIRST (one md5 hash-shuffle,
        // keep the min-doc_id representative). LSH candidate
        // enumeration is Ω(near-dup pairs); a corpus with k exact
        // copies of a document would otherwise put k identical
        // signatures in every band and pay k² candidate pairs for
        // what the O(n) exact pass resolves outright — the standard
        // dedup-pipeline ordering (exact → near) at 100 TB. On an
        // exact-dup-free corpus this pre-step is the identity.
        val reps = t(s, dir, "documents")
          .groupBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
            .as("fp"))
          .agg(min(col("doc_id")).as("doc_id"),
            min_by(col("text"), col("doc_id")).as("text"))
          .select(col("doc_id"), col("text"))
        val tri = shingles(reps)
        // 16 minhashes per doc, one shuffle
        val mhAggs = minhashCoef.zipWithIndex.map { case ((a, b), i) =>
          min(pmod(col("sh30") * a + b, lit(P30))).as(s"mh_$i")
        }
        val mh = tri.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
        val mhArr = mh.select(col("doc_id"),
          array((0 until 16).map(i => col(s"mh_$i")): _*).as("sig"))
        val cands = minhashCandidates(mhArr)
        // estimated similarity = matching minhash fraction
        val est = cands
          .join(mhArr.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
          .join(mhArr.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
          .withColumn("est_sim",
            size(filter(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => x === y), m => m)).cast("double") / 16.0)
        // rank candidates by estimated similarity, then exact-verify
        // ONLY the top candidates (the 100 TB-safe order of operations:
        // the expensive exact jaccard never touches non-candidates)
        val top = est.orderBy(col("est_sim").desc, col("a"), col("b"))
          .limit(20)
        val sizes = tri.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = top.select(col("a"), col("b"))
          .join(tri.select(col("doc_id").as("a"), col("sh").as("sh_a")), "a")
          .join(tri.select(col("doc_id").as("b"), col("sh").as("sh_b")), "b")
          .filter(col("sh_a") === col("sh_b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("ni"))
        top.join(inter, Seq("a", "b"), "left_outer")
          .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
          .select(col("a"), col("b"), col("est_sim"),
            coalesce(col("ni"), lit(0L)).as("n_shared"),
            (coalesce(col("ni"), lit(0L)).cast("double") /
              (col("na") + col("nb") - coalesce(col("ni"), lit(0L))))
              .as("jaccard"))
          .orderBy(col("est_sim").desc, col("a"), col("b"))
      },
      None),

    // ─── d4: SimHash near-dup (64-bit, 16-bit-chunk banding) ───
    // Signatures come from [[simhash64]] (two-level exact packed-lane
    // majority counters, loud failure past 65,535 words); banding +
    // sorted-neighborhood candidate generation below.
    "d4_dedup_simhash" -> Q(
      (s, dir) => {
        // exact-then-near: byte-identical texts collapse to their
        // min-id representative BEFORE the (word-hash-heavy) simhash
        // pass — exact pairs are d1's O(n) job, and every reported
        // pair here is genuinely near-but-not-exact. Identity on a
        // dup-free corpus.
        val reps = t(s, dir, "documents")
          .groupBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
            .as("fp"))
          .agg(min(col("doc_id")).as("doc_id"),
            min_by(col("text"), col("doc_id")).as("text"))
        val sim = simhash64(reps)
          .select(col("doc_id"), col("simhash"))
        val chunks = sim.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map { c =>
            struct(lit(c).as("chunk"),
              shiftrightunsigned(col("simhash"), 16 * c)
                .bitwiseAND(0xFFFFL).as("cval"))
          }: _*)).as("ck"))
          .select(col("doc_id"), col("simhash"),
            col("ck.chunk").as("chunk"), col("ck.cval").as("cval"))
        // Sorted-neighborhood bound: similar corpora collide heavily on
        // 16-bit chunks, so an unbounded bucket self-join is quadratic.
        // Rank docs within each bucket and pair each doc only with its
        // next 8 neighbors — as a pure equi-join on (chunk, cval, rank),
        // so the quadratic intermediate never materializes at any scale.
        val wb = Window.partitionBy(col("chunk"), col("cval"))
          .orderBy(col("doc_id"))
        val ranked = chunks.withColumn("rn", row_number().over(wb))
        val probes = ranked.select(col("doc_id").as("a"),
            col("simhash").as("sim_a"), col("chunk"), col("cval"),
            explode(sequence(col("rn") + 1, col("rn") + 8)).as("rn"))
        probes.join(ranked
            .select(col("doc_id").as("b"), col("simhash").as("sim_b"),
              col("chunk"), col("cval"), col("rn")),
            Seq("chunk", "cval", "rn"))
          .select(col("a"), col("b"), col("sim_a"), col("sim_b"))
          .distinct()
          .withColumn("hamming",
            bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
          .select(col("a"), col("b"), col("hamming"))
          .orderBy(col("hamming"), col("a"), col("b"))
          .limit(20)
      },
      None),

    // ─── d5: embedding-cosine near-dup pairs (exact oracle) ───
    "d5_embed_neardup" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings").filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding"))
        val norms = e.select(col("vec_id").as("nid"),
          dotDec(col("embedding"), col("embedding")).as("nrm"))
        val pairs = e.as("x").join(e.as("y"),
            col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
            dotDec(col("x.embedding"), col("y.embedding")).as("dot"))
        pairs
          .join(norms.select(col("nid").as("a"), col("nrm").as("na")), "a")
          .join(norms.select(col("nid").as("b"), col("nrm").as("nb")), "b")
          .withColumn("cosine",
            round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 12))
          .filter(col("cosine") > 0.3)
          .select(col("a"), col("b"), col("cosine"))
          .orderBy(col("a"), col("b"))
      },
      Some("""WITH e AS (
          SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        flat AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
                   unnest(embedding) AS val FROM e),
        norms AS (SELECT vec_id,
            cast(sum(cast(cast(val as double) * cast(val as double)
              as decimal(18,15))) as double) AS nrm
          FROM flat GROUP BY vec_id),
        dots AS (SELECT x.vec_id AS a, y.vec_id AS b,
            cast(sum(cast(cast(x.val as double) * cast(y.val as double)
              as decimal(18,15))) as double) AS dot
          FROM flat x JOIN flat y
            ON x.pos = y.pos AND x.vec_id < y.vec_id
          GROUP BY x.vec_id, y.vec_id)
        SELECT a, b, round(dot / (sqrt(na.nrm) * sqrt(nb.nrm)), 12) AS cosine
        FROM dots JOIN norms na ON na.vec_id = a
                  JOIN norms nb ON nb.vec_id = b
        WHERE round(dot / (sqrt(na.nrm) * sqrt(nb.nrm)), 12) > 0.3
        ORDER BY a, b""")),

    // ─── d5b: LSH-bucketed embedding near-dup (the scale path) ───
    // d5 is the capped exact oracle (all-pairs on 200 vectors, fenced
    // by construction). This is the full-corpus version, and like d1b
    // it proves itself by injecting its own targets: perturbed copies
    // (cosine ≈ 0.9999) of the first 50 vectors join the corpus, and
    // the operator must recover every (original, copy) pair WITHOUT
    // materializing the quadratic pair space. Candidates come only
    // from sign-LSH band buckets — 8 bands × 16 planes, so two random
    // vectors share a band with p ≈ 2^-16 (the corpus costs ~n·bands
    // rows), while hamming-1 multi-probe holds near-dup recall at
    // ≈ 1.0. Exact FloatVecDot cosine runs on candidates only; pair
    // recovery is asserted in NearDupSpec (rows-only: banding is
    // engine-specific). Near-dup LSH needs these much more selective
    // buckets than top-k search (s2): here a collision must *mean*
    // near-identical, not merely similar.
    "d5b_embed_neardup_lsh" -> Q(
      (s, dir) => {
        // exact-then-near, like d2: byte-identical vectors collapse to
        // their min-id representative first (one shuffle on the full
        // array as the group key — exact, no hash-collision risk).
        // A corpus with k exact copies of a vector holds k²/2 true
        // near-dup pairs; listing them is the exact pass's O(n) job,
        // not the LSH's.
        val e = t(s, dir, "embeddings")
          .groupBy(col("embedding"))
          .agg(min(col("vec_id")).as("vec_id"))
          .select(col("vec_id"), col("embedding"))
        // deterministic near-dup injection: tiny sinusoidal perturbation
        val injected = e.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            expr("""transform(embedding,
                 (x, i) -> cast(x + 0.001d * sin(cast(vec_id as double) * 31 + i)
                   as float))""").as("embedding"))
        val corpus = e.unionByName(injected)
        val BANDS = 8
        val PLANES = 16
        // all 8 buckets in ONE codegen'd kernel — see FloatVecSignBuckets
        val sigs = corpus.select(col("vec_id"),
          posexplode(graft.functions.FloatVecSignBuckets.buckets(
            col("embedding"), ndupPlanes, BANDS, PLANES))
            .as(Seq("band", "bucket")))
        val probeFlips = 0L +: (0 until PLANES).map(p => 1L << p)
        val probes = sigs.select(col("vec_id"), col("band"),
          explode(array(probeFlips.map(f =>
            col("bucket").bitwiseXOR(lit(f))): _*)).as("bucket"))
        val cands = probes.as("x").join(sigs.as("y"),
            col("x.band") === col("y.band") &&
              col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
          .distinct()
        val withVecs = cands
          .join(corpus.select(col("vec_id").as("a"),
            col("embedding").as("av")), "a")
          .join(corpus.select(col("vec_id").as("b"),
            col("embedding").as("bv")), "b")
        withVecs.select(col("a"), col("b"),
            round(dotDec(col("av"), col("bv")) /
              (sqrt(dotDec(col("av"), col("av"))) *
                sqrt(dotDec(col("bv"), col("bv")))), 12).as("cosine"))
          .filter(col("cosine") > 0.99)
          .orderBy(col("a"), col("b"))
      },
      None),

    // ─── s1: brute-force cosine top-k (exact ANN baseline, oracled) ───
    "s1_ann_brute" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            sqrt(dotDec(col("embedding"), col("embedding"))).as("qn"))
        val cands = e.filter(col("vec_id") >= 10)
          .select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
            sqrt(dotDec(col("embedding"), col("embedding"))).as("cn"))
        val scored = cands.join(broadcast(queries))
          .select(col("query_id"), col("cand_id"),
            round(dotDec(col("qv"), col("cv")) / (col("qn") * col("cn")), 12)
              .as("cosine"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("cand_id"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("cand_id"), col("cosine"),
            col("rank").cast("long").as("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH flat AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
            unnest(embedding) AS val
          FROM embeddings),
        norms AS (SELECT vec_id,
            sqrt(cast(sum(cast(cast(val as double) * cast(val as double)
              as decimal(18,15))) as double)) AS nrm
          FROM flat GROUP BY vec_id),
        dots AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
            cast(sum(cast(cast(q.val as double) * cast(c.val as double)
              as decimal(18,15))) as double) AS dot
          FROM (SELECT * FROM flat WHERE vec_id < 10) q
          JOIN (SELECT * FROM flat WHERE vec_id >= 10) c ON q.pos = c.pos
          GROUP BY q.vec_id, c.vec_id),
        scored AS (SELECT query_id, cand_id,
            round(dot / (nq.nrm * nc.nrm), 12) AS cosine
          FROM dots JOIN norms nq ON nq.vec_id = query_id
                    JOIN norms nc ON nc.vec_id = cand_id),
        ranked AS (SELECT query_id, cand_id, cosine,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id) AS rank
          FROM scored)
        SELECT query_id, cand_id, cosine, rank
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // ─── s2: sign-LSH bucketed approximate top-k (scale path; rows-only,
    // recall vs. s1 asserted in AnnSpec) ───
    // 8 bands × 4 planes: a candidate is probed if it agrees with the
    // query on all 4 signs of ANY band. Queries additionally multi-probe
    // the 4 buckets at hamming distance 1 per band (one flipped sign),
    // which lifts recall without extra shuffles — probing is just more
    // rows on the small (query) side of the same equi-join. At 100 TB
    // the candidate volume per query stays |corpus| × P(collide)
    // per band; bands/planes are the recall/cost dials.
    "s2_ann_lsh" -> Q(
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val BANDS = 8
        val PLANES = 4
        // exact-then-near (the d5b/d2 ordering): byte-identical corpus
        // vectors collapse to their min-id representative before any
        // bucket work — k exact copies would otherwise multiply every
        // probed bucket and every scored pair by k. Each distinct
        // vector is hashed and scored ONCE. The SAME aggregation also
        // carries the rep→member id mapping out (collect_list), so the
        // final expansion back to member ids joins on the 8-byte
        // rep_id — not on the 256-byte float array, which would hash
        // and shuffle the full vector payload again for no information
        // gain. Identity on a dup-free corpus.
        val cand0 = e.filter(col("vec_id") >= 10)
        val grouped = cand0.groupBy(col("embedding"))
          .agg(min(col("vec_id")).as("rep_id"),
            collect_list(col("vec_id")).as("member_ids"))
        val reps = grouped.select(col("embedding"), col("rep_id"))
        val memberMap = grouped.select(col("rep_id"),
          explode(col("member_ids")).as("cand_id"))
        // all 8 4-bit buckets in one codegen'd kernel (FloatVecSignBuckets)
        val candSigs = reps.select(col("rep_id"), col("embedding").as("cv"),
          posexplode(graft.functions.FloatVecSignBuckets.buckets(
            col("embedding"), hyperplanes, BANDS, PLANES))
            .as(Seq("band", "bucket")))
        val probeFlips = 0L +: (0 until PLANES).map(p => 1L << p)
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
            posexplode(graft.functions.FloatVecSignBuckets.buckets(
              col("embedding"), hyperplanes, BANDS, PLANES))
              .as(Seq("band", "bucket0")))
          .select(col("query_id"), col("qv"), col("band"),
            explode(array(probeFlips.map(f =>
              col("bucket0").bitwiseXOR(lit(f))): _*)).as("bucket"))
        val matched = queries.join(candSigs, Seq("band", "bucket"))
          .select(col("query_id"), col("rep_id"), col("qv"), col("cv"))
          .distinct()
        val scored = matched.select(col("query_id"), col("rep_id"),
          round(dotDec(col("qv"), col("cv")) /
            (sqrt(dotDec(col("qv"), col("qv"))) *
              sqrt(dotDec(col("cv"), col("cv")))), 12).as("cosine"))
        // rank() (not row_number) cuts the REP list: cosine ties keep
        // every tied vector, so the expansion below is a superset of
        // the exact top-5 ids and the final cut stays exact
        val wr = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc)
        val topReps = scored.withColumn("rk", rank().over(wr))
          .filter(col("rk") <= 5)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("cand_id"))
        topReps.join(memberMap, Seq("rep_id"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("cand_id"), col("cosine"),
            col("rank").cast("long").as("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ─── s3: IVF-bucketed approximate top-k (rows-only; recall vs s1
    // asserted in AnnSpec) ───
    // Coarse quantizer: 16 centroids trained by seeded spherical
    // k-means ([[trainCentroids]] — Lloyd iterations as Spark
    // aggregations; at 100 TB training runs once offline on a sample).
    // Every corpus vector is assigned to its 2 nearest centroids
    // (standard IVF multi-assignment: 2× index size buys recall with
    // no extra probe cost); a query probes its 3 nearest centroid
    // cells and scores exactly only inside them. The inverted lists
    // are just a partition key — candidate volume per query is
    // |corpus| * assign * nprobe / ncells.
    "s3_ann_ivf" -> Q(
      (s, dir) => {
        import s.implicits._
        val e = t(s, dir, "embeddings")
        // train on an ABSOLUTELY bounded sample (the first 5000 vec
        // ids — a no-op below sf1, the whole point above it): quantizer
        // quality needs a representative sample, not the corpus, and
        // the training cost must not scale with the data
        val centroids = trainCentroids(s,
          e.filter(col("vec_id") < 5000)
            .select(col("vec_id"), col("embedding")), k = 16, iters = 3)
          .toDF("cent_id", "cent_v")
        def assign(df: DataFrame, vec: Column, nprobe: Int,
            idCol: String): DataFrame = {
          val w = Window.partitionBy(col(idCol))
            .orderBy(col("cent_dot").desc, col("cent_id"))
          df.join(broadcast(centroids))
            .withColumn("cent_dot", dotDec(vec, col("cent_v")))
            .withColumn("cent_rank", row_number().over(w))
            .filter(col("cent_rank") <= nprobe)
            .drop("cent_v", "cent_dot", "cent_rank")
        }
        // exact-then-near (same collapse as s2/d5b): byte-identical
        // corpus vectors fill inverted lists ONCE via their min-id
        // representative; the collapse aggregation also carries the
        // rep→member id mapping out (collect_list), so the final
        // expansion joins on the 8-byte rep_id instead of re-hashing
        // the 256-byte float array. Identity on a dup-free corpus.
        val cand0 = e.filter(col("vec_id") >= 10)
        val grouped = cand0.groupBy(col("embedding"))
          .agg(min(col("vec_id")).as("rep_id"),
            collect_list(col("vec_id")).as("member_ids"))
        val memberMap = grouped.select(col("rep_id"),
          explode(col("member_ids")).as("cand_id"))
        val cands = assign(
          grouped.select(col("rep_id"), col("embedding").as("cv")),
          col("cv"), nprobe = 2, idCol = "rep_id")
        val queries = assign(
          e.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"), col("embedding").as("qv")),
          col("qv"), nprobe = 3, idCol = "query_id")
        val scored = queries.join(cands, Seq("cent_id"))
          .select(col("query_id"), col("rep_id"),
            round(dotDec(col("qv"), col("cv")) /
              (sqrt(dotDec(col("qv"), col("qv"))) *
                sqrt(dotDec(col("cv"), col("cv")))), 12).as("cosine"))
          .distinct()
        // rank() keeps cosine ties, so the member expansion is a
        // superset of the exact top-5 ids and the final cut is exact
        val wr = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc)
        val topReps = scored.withColumn("rk", rank().over(wr))
          .filter(col("rk") <= 5)
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("cand_id"))
        topReps.join(memberMap, Seq("rep_id"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("cand_id"), col("cosine"),
            col("rank").cast("long").as("rank"))
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ─── d11: SemDeDup — cluster-then-prune semantic dedup (rows-only;
    // injected-copy recovery asserted in SemDedupSpec) ───
    // The Abbas et al. 2023 recipe the big curation pipelines run:
    // k-means cluster the embedding space, then look for semantic
    // duplicates (cosine > eps) only WITHIN a cluster, keeping one
    // representative per duplicate group. Differs from d5/d5b (pair
    // *listing*) in that the output is the pruned corpus itself.
    //
    // Scale design, stage by stage:
    //   1. exact collapse: byte-identical vectors keep only their
    //      min-id copy (one hash shuffle on the array).
    //   2. quantizer: seeded spherical k-means on an absolutely
    //      bounded sample ([[trainCentroids]] — only k×dim aggregates
    //      reach the driver). k is fixed here; at corpus scale k grows
    //      ∝ n / target-cell-size (SemDeDup's own knob), which keeps
    //      every stage below linear-times-constant.
    //   3. candidates: each vector joins its 2 nearest cells (IVF
    //      multi-assignment, same trick as s3 — a near-dup pair split
    //      by a cell boundary still meets in one of the 2×2 cells);
    //      within a cell, members sort by cosine-to-centroid and only
    //      W=16 sorted neighbors pair up — near-identical vectors have
    //      near-identical centroid-cosines, so true dups are adjacent
    //      and the pair volume is ≤ cells·|cell|·W — linear in n, never
    //      quadratic (the d2/d4 sorted-neighborhood bound).
    //   4. verdict: exact decimal-grid cosine on candidates only;
    //      deterministic keep rule — a vector is dropped iff some
    //      lower-id vector within its neighborhood is near-identical
    //      (drop the larger id of every dup pair).
    "d11_semdedup" -> Q(
      (s, dir) => {
        import s.implicits._
        val EPS = 0.99
        val W = 16
        val e0 = t(s, dir, "embeddings")
        // deterministic injection (same scheme as d5b): perturbed
        // copies of the first 50 vectors — cosine ≈ 0.9999 to their
        // originals — must all be pruned, and only they may be.
        val injected = e0.filter(col("vec_id") < 50)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            expr("""transform(embedding,
                 (x, i) -> cast(x + 0.001d * sin(cast(vec_id as double) * 31 + i)
                   as float))""").as("embedding"))
        val corpus = e0.select(col("vec_id"), col("embedding"))
          .unionByName(injected)
        // 1. exact collapse (k byte-identical copies are k-1 drops here,
        //    never k²/2 pairs downstream)
        val reps = corpus.groupBy(col("embedding"))
          .agg(min(col("vec_id")).as("vec_id"))
          .select(col("vec_id"), col("embedding"))
        // 2. bounded-sample quantizer (shared machinery with s3)
        val centroids = trainCentroids(s,
          e0.filter(col("vec_id") < 5000)
            .select(col("vec_id"), col("embedding")), k = 16, iters = 3)
          .toDF("cent_id", "cent_v")
        // 3. 2-nearest-cell assignment + sorted-neighborhood pairing
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("cent_dot").desc, col("cent_id"))
        val assigned = reps.join(broadcast(centroids))
          .withColumn("cent_dot",
            dotDec(col("embedding"), col("cent_v")) /
              sqrt(dotDec(col("embedding"), col("embedding"))))
          .withColumn("cent_rank", row_number().over(wAssign))
          .filter(col("cent_rank") <= 2)
          .select(col("cent_id"), col("vec_id"), col("embedding"),
            col("cent_dot"))
        val wCell = Window.partitionBy(col("cent_id"))
          .orderBy(col("cent_dot").desc, col("vec_id"))
        val ranked = assigned.withColumn("pos", row_number().over(wCell))
        val pairs = ranked.as("x").join(ranked.as("y"),
            col("x.cent_id") === col("y.cent_id") &&
              col("y.pos") > col("x.pos") &&
              col("y.pos") <= col("x.pos") + W &&
              col("x.vec_id") =!= col("y.vec_id"))
          .select(
            least(col("x.vec_id"), col("y.vec_id")).as("a"),
            greatest(col("x.vec_id"), col("y.vec_id")).as("b"),
            col("x.embedding").as("av"), col("y.embedding").as("bv"))
        // 4. exact verdict on candidates only; drop the larger id
        val drops = pairs
          .withColumn("cosine",
            dotDec(col("av"), col("bv")) /
              (sqrt(dotDec(col("av"), col("av"))) *
                sqrt(dotDec(col("bv"), col("bv")))))
          .filter(col("cosine") > EPS)
          .select(col("b").as("vec_id")).distinct()
        reps.join(drops, Seq("vec_id"), "left_anti")
          .select(col("vec_id"))
          .orderBy(col("vec_id"))
      },
      None),

    // ─── s4: IVF-bucketed kNN graph (rows-only; recall vs brute force
    // asserted in KnnGraphSpec) ───
    // The all-vectors top-k neighbor graph that SemDeDup-style
    // clustering, graph-based ANN indexes (NSW seeding), and
    // diversity-aware sampling all start from. Differs from s2/s3
    // (fixed query set → corpus) in that EVERY vector is a query, so
    // candidate generation must avoid the n² pair space on the corpus
    // itself:
    //   1. exact collapse — byte-identical vectors keep one
    //      representative (the d5b/d2 ordering).
    //   2. IVF cells — every rep joins its 3 nearest of 16 centroids
    //      (seeded spherical k-means on an absolutely bounded sample,
    //      shared [[trainCentroids]] machinery; 3-way multi-assignment
    //      is the graph analogue of s3's nprobe — both pair sides
    //      probe, so recall needs the extra cell). Within a cell,
    //      members sort by cosine-to-centroid and each pairs only its
    //      W=24 sorted neighbors (the d11 sorted-neighborhood bound —
    //      vectors close to each other have close centroid-cosines,
    //      and a pair missed in one shared cell's ordering gets two
    //      more chances in the other assigned cells). Pair volume is
    //      ≤ assign·n·W — LINEAR in n at FIXED k, where the pre-r8
    //      all-pairs form was Σ|cell|² (quadratic at fixed k; it was
    //      already the most expensive bench entry at 2000 vectors).
    //      The pairing itself is one window pass emitting W lead()
    //      columns — no self-join, no 16-key skewed shuffle beyond
    //      the window's own partitioning.
    //   3. id-pair dedup BEFORE vectors re-join: pairs sharing both
    //      cells dedup on 16 bytes of ids, never on the 256-byte
    //      arrays; exact decimal-grid cosine runs once per pair side.
    //   4. per-vector top-3 by a bounded window (candidates per
    //      vector ≤ 2·assign·W, a constant).
    "s4_knn_graph" -> Q(
      (s, dir) => {
        import s.implicits._
        val K = 3
        val W = 48
        val e = t(s, dir, "embeddings")
        val reps = e.groupBy(col("embedding"))
          .agg(min(col("vec_id")).as("vec_id"))
          .select(col("vec_id"), col("embedding"))
        val centroids = trainCentroids(s,
          e.filter(col("vec_id") < 5000)
            .select(col("vec_id"), col("embedding")), k = 16, iters = 3)
          .toDF("cent_id", "cent_v")
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("cent_dot").desc, col("cent_id"))
        val assigned = reps.join(broadcast(centroids))
          .withColumn("cent_dot",
            dotDec(col("embedding"), col("cent_v")) /
              sqrt(dotDec(col("embedding"), col("embedding"))))
          .withColumn("cent_rank", row_number().over(wAssign))
          .filter(col("cent_rank") <= 3)
          .select(col("cent_id"), col("vec_id"), col("cent_dot"))
        val wCell = Window.partitionBy(col("cent_id"))
          .orderBy(col("cent_dot").desc, col("vec_id"))
        val fwd = assigned
          .withColumn("nbrs", array((1 to W).map(i =>
            lead(col("vec_id"), i).over(wCell)): _*))
          .select(col("vec_id"), explode(col("nbrs")).as("nbr_id"))
          .filter(col("nbr_id").isNotNull)
        val candIds = graft.queries.GateCache.swap("s4_cand", fwd
          .union(fwd.select(col("nbr_id").as("vec_id"),
            col("vec_id").as("nbr_id")))
          .distinct().cache())
        def scorePairs(cand: DataFrame): DataFrame = cand
          .join(reps.select(col("vec_id"), col("embedding").as("xv")),
            Seq("vec_id"))
          .join(reps.select(col("vec_id").as("nbr_id"),
            col("embedding").as("yv")), Seq("nbr_id"))
          .select(col("vec_id"), col("nbr_id"),
            round(dotDec(col("xv"), col("yv")) /
              (sqrt(dotDec(col("xv"), col("xv"))) *
                sqrt(dotDec(col("yv"), col("yv")))), 12).as("cosine"))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("nbr_id"))
        // one NN-descent refinement round: a vector's true neighbor is
        // very likely a neighbor-of-a-neighbor in the provisional
        // graph, so compose the (undirected) top-K edges once and
        // rescore — Θ((2K)²·n) extra pairs, linear in n, and it buys
        // back the recall the W-bounded neighborhood gives up vs the
        // quadratic all-pairs form this replaced.
        // expand from a wider provisional graph (top-8, not top-K):
        // composition through rank-4..8 edges is what reaches the
        // neighbors the 1-D neighborhood ordering missed
        val g0 = scorePairs(candIds)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 8)
          .select(col("vec_id"), col("nbr_id"))
        val ug = g0.union(
          g0.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")))
        val expanded = ug.as("a").join(ug.as("b"),
            col("a.nbr_id") === col("b.vec_id") &&
              col("a.vec_id") =!= col("b.nbr_id"))
          .select(col("a.vec_id").as("vec_id"), col("b.nbr_id").as("nbr_id"))
        val cand2 = candIds.union(expanded).distinct()
        scorePairs(cand2).withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select(col("vec_id"), col("nbr_id"), col("cosine"),
            col("rank").cast("long").as("rank"))
          .orderBy(col("vec_id"), col("rank"))
      },
      None)
  )
}
