package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale (training-data) corpora.
  *
  * The reference supports only full-row DISTINCT (reference:
  * pandasql/core.py:597-607 — `subset/keep` explicitly rejected); these are
  * the designed extensions a 100 TB pipeline needs. All of them are
  * declarative DataFrame compositions: shuffles happen only on the chosen
  * keys, shingle/minhash evaluation is per-row inside whole-stage codegen,
  * and near-dup candidate generation is banded LSH — never an all-pairs
  * cross join.
  *
  * Hash parity note: [[simhash]] and [[fingerprint60]] derive token hashes
  * from md5 hex (available identically in DuckDB/Spark/most engines) so
  * results are verifiable cross-engine; [[minhashLsh]] uses xxhash64
  * internally (faster) because only its FINAL exact-Jaccard output needs
  * cross-engine parity, not the intermediate sketch.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Keyed/subset exact dedup: keep the first row per `keys` group under
    * `order` (pandas `drop_duplicates(subset=keys, keep='first')` with a
    * deterministic order instead of input order, which is undefined in a
    * distributed setting). One hash-partitioned shuffle on `keys`; at
    * scale prefer low-cardinality-safe keys or pre-salt upstream.
    */
  def exact(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "exact dedup needs at least one key column")
    require(order.nonEmpty, "exact dedup needs a deterministic keep order")
    val w = Window.partitionBy(keys.map(df(_)): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ------------------------------------------------------------- shingles

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct k-word shingles of `text` (n-gram units for Jaccard /
    * MinHash). Empty array when the document has fewer than k tokens.
    * Single-pass custom expression ([[graft.plans.WordShingles]]) — the
    * declarative transform/slice/concat_ws chain re-tokenizes per shingle
    * through interpreted lambdas. */
  def shingles(text: Column, k: Int): Column =
    graft.plans.TextExpressions.wordShingles(text, k)

  /** Drop rows of the exploded (…, s=shingle) relation whose shingle has
    * document frequency > `cap` — the fan-out bound shared by
    * [[jaccardPairs]] and [[sharedSpanPairs]]. A count-only pre-pass
    * (map-side partial agg; the shuffle carries one row per distinct
    * shingle) finds the hot set, and the exploded relation is anti-joined
    * against it. The hot set is force-broadcast as a deliberate, measured
    * trade: leaving the choice to AQE costs a full extra shuffle of the
    * exploded relation (the shuffle files must be written before AQE can
    * decide — measured 2.1x wall on q_jaccard_pairs at sf0.1), paid even
    * when the hot set turns out empty. Escape hatch: the hot set is
    * heuristically small (df > cap members only) but can reach Σdf/cap
    * entries on a pathological corpus, and past Spark's broadcast limit a
    * forced hint fails the job outright —
    * `spark.graft.dedup.broadcastHotSet=false` drops the hint so the
    * anti-join degrades to a shuffled join instead of failing. */
  private def dropHotShingles(ex: DataFrame, cap: Int): DataFrame = {
    val hot = ex.groupBy("s").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > cap)
      .select("s")
    val forceBroadcast = ex.sparkSession.conf
      .get("spark.graft.dedup.broadcastHotSet", "true").toBoolean
    ex.join(if (forceBroadcast) broadcast(hot) else hot, Seq("s"), "left_anti")
  }

  // -------------------------------------------------- exact n-gram Jaccard

  /** All pairs with shingle-set Jaccard ≥ `threshold`, via an inverted
    * index in postings-list form. Output: (a_id, b_id, jaccard), a_id<b_id.
    *
    * Pipeline (the shingle expression runs exactly ONCE per document —
    * the relation is consumed by a single aggregation, never self-joined):
    *  1. per-doc shingle array + its size `n` (map-side, one pass);
    *  2. postings: groupBy(shingle) → collect_list(struct(id, n)) — one
    *     shuffle keyed by the shingle;
    *  3. candidate pairs: a double explode of each posting list generates
    *     (a, b) in place (only documents sharing the shingle ever meet);
    *  4. size-ratio prune BEFORE the intersection count: jaccard ≤
    *     min(na,nb)/max(na,nb), so pairs with min < threshold·max cannot
    *     reach the threshold and are dropped pre-shuffle;
    *  5. count pair multiplicity = |A∩B|, then
    *     `|A∩B| / (|A|+|B|-|A∩B|)` ≥ threshold.
    *
    * Scale: a stop-shingle appearing in f documents fans out to f² pairs;
    * `maxDf` caps that by removing hot shingles BEFORE posting lists are
    * built — see [[dropHotShingles]] for the pre-pass, the measured
    * force-broadcast trade, and its escape hatch. Filtering on
    * posting-list size AFTER collect_list would bound pair fan-out but
    * not executor memory: a df-in-the-millions stop shingle would still
    * materialize one multi-GB aggregation buffer row. Pairs whose overlap
    * rides only on dropped hot shingles are missed and counted
    * intersections exclude them, so with the cap engaged the reported
    * jaccard is a lower bound (conservative near-dup semantics). For
    * corpora where even capped fan-out is too hot, use [[minhashLsh]] —
    * candidate volume there is bounded by signature agreement.
    */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double,
      maxDf: Option[Int] = None): DataFrame = {
    // widen the NARROW (id, text) input before the shingle explode: on a
    // compacted single-row-group input the scan is one task, and the
    // shingle pass (the operator's heavy leg, consumed twice when maxDf
    // engages) would run serially. Widening must happen BELOW the heavy
    // expressions with no filter above them — r19 measured that a filter
    // above the widen gets alias-substituted and pushed back under the
    // exchange, re-running the heavy leg single-task AND twice. The old
    // `filter(size(sh) > 0)` here was exactly that bait; it is redundant
    // (explode emits nothing for an empty array), so it is gone.
    val base = SortFirst.widenScanSide(
      docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), shingles(col("__t"), k).as("sh"))
    val ex = base.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    val kept = maxDf.fold(ex)(cap => dropHotShingles(ex, cap))
    val postings = kept.groupBy("s")
      .agg(collect_list(struct(col("id"), col("n"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    val pairs = postings
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a.id").as("a_id"), col("a.n").as("na"), explode(col("ds")).as("b"))
      .select(col("a_id"), col("na"), col("b.id").as("b_id"), col("b.n").as("nb"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")))
    pairs
      .groupBy("a_id", "b_id", "na", "nb").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Cross-corpus near-dup pairs — benchmark decontamination. Finds all
    * (train_id, eval_id, jaccard) pairs with shingle-set Jaccard >=
    * `threshold` BETWEEN two corpora (never within one), the operation
    * behind "remove eval-set leakage from the training corpus" (the
    * contamination analyses published with GPT-3/Gopher/Llama report
    * exactly these n-gram-overlap hits). Same inverted-index shape as
    * [[jaccardPairs]] — shingle both sides once, tag the side, one
    * postings shuffle — but each posting keeps the sides separate, so
    * candidates are generated strictly across (|L|·|R| per shingle, not
    * (|L|+|R|)²/2), and the pair keys never collide between namespaces.
    * `maxDf` caps fan-out on the COMBINED document frequency (a
    * boilerplate shingle is noise whichever corpus it lives in). At
    * scale the eval side is typically tiny; AQE will then pick a
    * broadcast for nothing here — the postings path needs no join at
    * all, and the one shuffle is keyed by shingle, which also bounds
    * the skew a popular eval document could otherwise cause.
    *
    * Output: (a_id from `left`, b_id from `right`, jaccard); with the
    * cap engaged jaccard is a lower bound, as in [[jaccardPairs]]. To
    * decontaminate, anti-join `left` on the distinct a_id values. */
  def crossJaccardPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double,
      maxDf: Option[Int] = None): DataFrame = {
    def side(docs: DataFrame, tag: String) = docs
      .select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"),
        lit(tag).as("side"))
    val exR = side(right, "R")
    // the 100 TB shape: only train shingles that ALSO occur in the eval
    // side can produce a cross pair, so a semi-join against the distinct
    // eval shingles prunes the train explode BEFORE the postings shuffle
    // — the wide stage then carries matching shingles only, not the full
    // training corpus. AQE broadcasts the distinct eval shingles when
    // small (the normal case for an eval set); no hint forced, so a
    // huge right side degrades to a shuffled semi-join instead of
    // failing. Cap semantics are unchanged: a pruned train shingle is
    // absent from the union entirely, and for surviving shingles every
    // occurrence still counts toward the combined df.
    val exL = side(left, "L")
      .join(exR.select("s").distinct(), Seq("s"), "left_semi")
      .select("id", "n", "s", "side") // the join key moved first; re-align for the positional union
    val ex = exL.union(exR)
    val kept = maxDf.fold(ex)(cap => dropHotShingles(ex, cap))
    // one list per side; collect_list drops the nulls the when() leaves
    // on rows of the other side
    val postings = kept.groupBy("s").agg(
        collect_list(when(col("side") === "L", struct(col("id"), col("n"))))
          .as("ls"),
        collect_list(when(col("side") === "R", struct(col("id"), col("n"))))
          .as("rs"))
      .filter(size(col("ls")) >= 1 && size(col("rs")) >= 1)
    val pairs = postings
      .select(explode(col("ls")).as("a"), col("rs"))
      .select(col("a.id").as("a_id"), col("a.n").as("na"), explode(col("rs")).as("b"))
      .select(col("a_id"), col("na"), col("b.id").as("b_id"), col("b.n").as("nb"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")))
    pairs
      .groupBy("a_id", "b_id", "na", "nb").agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** End-to-end decontamination: remove from `train` every document with
    * a [[crossJaccardPairs]] hit against `eval`. One anti-join on the
    * distinct contaminated ids — a relation bounded by the eval set's
    * match fan-out, so AQE broadcasts it in the common case. */
  def decontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double,
      maxDf: Option[Int] = None): DataFrame = {
    val hit = crossJaccardPairs(train, eval, idCol, textCol, k, threshold, maxDf)
      .select(col("a_id").as(idCol)).distinct()
    train.join(hit, Seq(idCol), "left_anti")
  }

  /** Incremental ingestion dedup: drop rows of `incoming` whose
    * normalized-text fingerprint ([[TextAnalysis.fingerprint60]] over
    * [[TextAnalysis.normalized]]) already exists in `corpus` — the
    * "new batch vs what we already ingested" step of a continuously fed
    * corpus, where re-running full-corpus dedup per batch is wasted
    * work. One anti-join shuffled on the 60-bit fingerprint (never on
    * text); the corpus side reduces to distinct fingerprints first, so
    * the shuffle carries 8 bytes per known document and AQE broadcasts
    * it when the corpus is small. Exact-duplicate semantics — chain with
    * [[minhashLsh]] against the survivors for near-dups. Also the LIVE
    * ingestion face: `incoming` may be a streaming DataFrame
    * (stream-static anti-join, stateless per micro-batch — the corpus
    * relation is joined fresh each batch; StreamingSpec proves the
    * stream face == batch face). */
  def dedupAgainstCorpus(
      incoming: DataFrame,
      corpus: DataFrame,
      textCol: String,
      normalized: Boolean = true): DataFrame = {
    import graft.functions.TextAnalysis
    // normalized=false matches byte-exact content only — the right mode
    // when a case/whitespace edit SHOULD count as new (e.g. the
    // incremental-refresh pipeline, which forwards changed revisions)
    def fp(df: DataFrame) =
      TextAnalysis.fingerprint60(
        if (normalized) TextAnalysis.normalized(col(textCol)) else col(textCol))
    val known = corpus.select(fp(corpus).as("__fp")).distinct()
    incoming.withColumn("__fp", fp(incoming))
      .join(known, Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Corpus-level boilerplate line removal — the cross-document
    * complement of [[graft.functions.TextAnalysis.dedupLines]] and the
    * paragraph-dedup step of CCNet (Wenzek et al., "CCNet: Extracting
    * High Quality Monolingual Datasets from Web Crawl Data", LREC'20) and
    * similar curation pipelines: a line occurring in more than `maxDf`
    * DISTINCT documents (nav bars, cookie banners, license footers) is
    * boilerplate and is stripped from EVERY document, preserving the
    * order (and intra-doc multiplicity) of the surviving lines.
    *
    * Plan: posexplode lines → df count per line (map-side partial agg,
    * the shuffle carries one row per distinct line) → anti-join the
    * exploded relation against the hot set (AQE broadcasts it when
    * small — the normal case, since only df > maxDf lines qualify) →
    * regroup by doc and rebuild the text with an in-place array sort on
    * (pos, line) structs. Two keyed shuffles total (line, then doc id),
    * both on bounded relations; nothing quadratic, nothing driver-side.
    * A document whose every line is boilerplate comes back as the empty
    * string, not a dropped row. */
  def stripCommonLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Int,
      sep: String = "\n"): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val quoted = java.util.regex.Pattern.quote(sep)
    val lines = docs.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), quoted)).as(Seq("__pos", "__line")))
    val hot = lines.groupBy("__line")
      .agg(count_distinct(col("__id")).as("__df"))
      .filter(col("__df") > maxDf)
      .select("__line")
    val rebuilt = lines.join(hot, Seq("__line"), "left_anti")
      .groupBy("__id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        sep).as("__clean"))
    docs.join(rebuilt, docs(idCol) === rebuilt("__id"), "left")
      .withColumn(textCol, coalesce(col("__clean"), lit("")))
      .drop("__id", "__clean")
  }

  /** Exact-substring near-dup pairs: documents sharing at least one run
    * of `spanTokens` consecutive tokens (the criterion of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL'22
    * — there built on a suffix array; restated here as LONG-shingle
    * postings, which Spark executes as one keyed shuffle). A shared
    * k-token span and a shared k-shingle are the same event, so the
    * postings index from [[jaccardPairs]] answers it directly — no
    * similarity threshold, ANY long-enough exact overlap pairs the docs
    * (catches quotation/boilerplate overlap Jaccard dilutes away on
    * otherwise-different documents).
    *
    * Output: (a_id, b_id, n_spans) with n_spans = number of DISTINCT
    * shared k-shingles (a run of m >= k shared tokens contributes
    * m-k+1). `maxDf` drops spans present in more than maxDf docs before
    * the postings explode — same fan-out bound and same conservative
    * (lower-bound) semantics as in [[jaccardPairs]].
    */
  def sharedSpanPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      spanTokens: Int = 20,
      maxDf: Option[Int] = Some(1000)): DataFrame = {
    val ex = docs
      .select(col(idCol).as("id"), explode(shingles(col(textCol), spanTokens)).as("s"))
    val kept = maxDf.fold(ex)(cap => dropHotShingles(ex, cap))
    val postings = kept.groupBy("s")
      .agg(collect_list(col("id")).as("ds"))
      .filter(size(col("ds")) >= 2)
    postings
      .select(explode(col("ds")).as("a_id"), col("ds"))
      .select(col("a_id"), explode(col("ds")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_spans"))
  }

  // ----------------------------------------------------------- MinHash-LSH

  /** MinHash prime (fits int; products with 64-bit hashes stay exact in
    * the long range after the inner pmod). */
  private val MinhashPrime = 2038074743L

  /** k-minhash signature of a shingle array: for each seeded universal
    * hash h_i(x) = (a_i·x + b_i) mod p, the minimum over the document's
    * shingle hashes. All k minima are computed in one fused codegen'd
    * loop ([[graft.plans.MinHashSignature]]) — the equivalent
    * `array_min(transform(...))` × k form costs k interpreted lambda
    * sweeps per document.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val coefA = Array.fill(numHashes)(1 + rnd.nextInt((MinhashPrime - 1).toInt).toLong)
    val coefB = Array.fill(numHashes)(rnd.nextInt(MinhashPrime.toInt).toLong)
    val base = transform(shingleCol, s => pmod(xxhash64(s), lit(MinhashPrime)))
    graft.plans.SketchExpressions.minhashSignature(base, coefA, coefB, MinhashPrime)
  }

  /** (id, band, bucket) LSH banding rows from a pre-shingled frame
    * (`id`, `sh` columns): b bands of r = numHashes/bands signature
    * rows, bucket = hash of the band's slice. The shared candidate
    * keying of batch [[minhashLsh]] and the streaming face
    * ([[graft.streaming.StreamingOps.streamingNearDupCandidates]]) —
    * one definition, so a pipeline that backfills in batch and ingests
    * live buckets identically. */
  private[graft] def bandBucketsFromShingled(
      withSh: DataFrame,
      numHashes: Int,
      bands: Int,
      seed: Long): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    withSh
      .withColumn("sig", minhashSignature(col("sh"), numHashes, seed))
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          i => struct(i.as("band"), hash(slice(col("sig"), i * r + 1, lit(r))).as("bucket"))))
          .as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
  }

  /** [[bandBucketsFromShingled]] from raw documents: shingle, sign, band.
    * All narrow map-side work — runs unchanged on a streaming frame. */
  def lshBandBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      seed: Long = 42L): DataFrame =
    bandBucketsFromShingled(
      docs.select(col(idCol).as("id"), shingles(col(textCol), shingleK).as("sh"))
        .filter(size(col("sh")) > 0),
      numHashes, bands, seed)

  /** Near-duplicate pairs by MinHash + LSH banding + exact confirmation.
    *
    * Pipeline (all distributed, no all-pairs stage):
    *  1. signature: k minhashes per doc (map-side only);
    *  2. banding: b bands of r = k/b rows; docs agreeing on any band land
    *     in the same bucket (shuffle key = (band, bucket-hash));
    *  3. candidates: per-bucket pairs, distinct;
    *  4. confirm: exact shingle-set Jaccard on candidates only, keep ≥
    *     `threshold`.
    *
    * With k=64, b=16 (r=4), a pair at true Jaccard s is missed with
    * probability (1-s⁴)^16 — ~2·10⁻⁴ at s=0.8, ~10⁻¹⁵ at s=0.97 — and a
    * random pair (s≈0.1) is a candidate with probability ~0.2%, so the
    * confirm stage touches a vanishing fraction of the corpus.
    * Output: (a_id, b_id, jaccard), a_id < b_id.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.8,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val withSh = docs.select(
      col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)

    // banding carries ONLY (id, band, bucket) — the shingle arrays never
    // ride through the candidate join/dedup shuffles; they are equi-joined
    // back in per UNIQUE candidate pair for the exact confirm
    val buckets = bandBucketsFromShingled(withSh, numHashes, bands, seed)

    val left = buckets.select(col("band"), col("bucket"), col("id").as("a_id"))
    val right = buckets.select(col("band"), col("bucket"), col("id").as("b_id"))
    val candidates = left.join(right, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct() // a pair can collide in several bands

    // merge hints: the confirm relation is computed — letting Catalyst
    // broadcast it re-evaluates that work on the driver and caps the
    // build at driver memory; at scale the document side is always the
    // big side, so the honest plan is a shuffle join on id (measured
    // 5-20x faster locally too).
    //
    // The join carries raw TEXT, not shingle arrays, and re-shingles
    // AFTER the join on candidate rows only: a shingle array is several
    // times wider than its source text (one ~k-word string per token),
    // so both confirm exchanges narrow accordingly, and the corpus-wide
    // shingle pass runs once (banding) instead of three times — the
    // per-candidate re-shingle touches only rows that survived banding,
    // a vanishing fraction of the corpus by LSH design.
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("__txt"))
    candidates
      .join(txt.select(col("id").as("a_id"), col("__txt").as("a_t")).hint("merge"), "a_id")
      .join(txt.select(col("id").as("b_id"), col("__txt").as("b_t")).hint("merge"), "b_id")
      .withColumn("a_sh", shingles(col("a_t"), shingleK))
      .withColumn("b_sh", shingles(col("b_t"), shingleK))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // --------------------------------------------------------------- SimHash

  /** Bits used for simhash / numeric fingerprints: 60 = 15 hex digits of
    * md5, chosen so the value parses identically as a signed 64-bit int in
    * Spark (`conv`) and DuckDB (`('0x'||…)::BIGINT`). */
  val FingerprintBits = 60

  /** 60-bit cross-engine-stable hash of a string: the first 15 hex digits
    * of its md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash fingerprints over whitespace tokens (with
    * multiplicity). One explode + one hash-partitioned aggregation per
    * corpus: bit i of the fingerprint is set iff Σ_tokens (±1 by token-hash
    * bit i) > 0. Near-dup detection then compares fingerprints by Hamming
    * distance (bucketable by bit-blocks, same LSH idea as MinHash bands).
    * Output: (id, simhash).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(
      col(idCol).as("id"),
      explode(tokens(col(textCol))).as("t"))
      .withColumn("h", hash60(col("t")))
    val bitSums = (0 until FingerprintBits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$i")
    }
    val agg = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until FingerprintBits).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("id"), fp.as("simhash"))
  }

  /** DuckDB SQL computing the same simhash (for differential checks). */
  def simhashOracleSql(table: String, idCol: String, textCol: String): String = {
    val bitSums = (0 until FingerprintBits).map { i =>
      s"sum(case when (h >> $i) & 1 = 1 then 1 else -1 end) as b$i"
    }.mkString(", ")
    val fp = (0 until FingerprintBits).map { i =>
      s"(case when b$i > 0 then (1::BIGINT << $i) else 0 end)"
    }.mkString(" + ")
    s"""WITH tok AS (
          SELECT $idCol AS id,
                 ('0x' || substr(md5(unnest(string_split($textCol, ' '))), 1, 15))::BIGINT AS h
          FROM $table),
        bits AS (SELECT id, $bitSums FROM tok GROUP BY id)
        SELECT id, $fp AS simhash FROM bits"""
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-duplicate pairs by SimHash + bit-block banding — the third
    * dedup family (exact key, shingle-Jaccard, and this: token-multiset
    * similarity at Hamming granularity).
    *
    * EXACT, not approximate: splitting the 60-bit fingerprint into
    * `maxHamming + 1` blocks guarantees (pigeonhole) that any pair within
    * `maxHamming` differing bits agrees on at least one whole block, so
    * block-equality candidate generation has zero false negatives and the
    * `hamming ≤ d` confirm makes the output identical to the all-pairs
    * scan — at a candidate volume bounded by per-(block, value) bucket
    * agreement instead of n².
    *
    * Pipeline: fingerprint (one explode + one agg, [[simhash]]) →
    * per-doc block values (map-side bit arithmetic) → self-equi-join on
    * (block-idx, block-value) — the ONLY shuffle keyed by content —
    * → distinct pairs → confirm by [[hamming]]. Fingerprints (two longs)
    * ride along with the candidates, so no join-back pass is needed.
    *
    * Scale: with d=3, blocks are 15 bits ⇒ 32k buckets per block-index;
    * documents sharing a hot block value (e.g. a boilerplate-heavy
    * corpus where many fingerprints share low bits) fan out
    * quadratically within the bucket, same failure mode as Jaccard stop
    * shingles. `maxBucket` caps that: buckets with more than `maxBucket`
    * docs are dropped (conservative — missed pairs only ride on dropped
    * buckets, and only if they collide nowhere else).
    * Output: (a_id, b_id, hamming), a_id < b_id.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Option[Int] = None): DataFrame =
    hammingPairs(simhash(docs, idCol, textCol), "id", "simhash",
      FingerprintBits, maxHamming, maxBucket)

  /** Per-document (block-index, block-value) rows — [[simhashPairs]]'s
    * candidate-bucket keys, exposed so tests (and capacity planning) can
    * measure the pre-confirm candidate volume Σ_buckets C(size, 2)
    * directly. With b = maxHamming+1 blocks over 60 bits, block values
    * span 60/b bits, so small `maxHamming` means wide blocks and
    * selective buckets; large `maxHamming` (few-bit blocks) degrades
    * toward all-pairs — declare the tightest distance the use case
    * allows. Output: (id, simhash, blk, v). */
  private[graft] def simhashBlocks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int): DataFrame =
    fingerprintBlocks(
      simhash(docs, idCol, textCol).withColumnRenamed("simhash", "fp"),
      FingerprintBits, maxHamming)
      .withColumnRenamed("fp", "simhash")

  /** Per-row (block-index, block-value) rows over an arbitrary
    * (id, fp long) relation — the pigeonhole banding [[simhashBlocks]]
    * instantiates for text; reused by any Hamming-space near-dup family
    * (image dHash, audio fingerprints). Output: (id, fp, blk, v). */
  private[graft] def fingerprintBlocks(
      fps: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming must be in [0, $bits)")
    val nBlocks = maxHamming + 1
    val widths = Array.tabulate(nBlocks)(i =>
      bits / nBlocks + (if (i < bits % nBlocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def mask(w: Int) = if (w == 64) lit(-1L) else lit((1L << w) - 1)
    fps.select(col("id"), col("fp"),
      explode(array((0 until nBlocks).map { i =>
        struct(
          lit(i).as("blk"),
          shiftright(col("fp"), offsets(i)).bitwiseAND(mask(widths(i))).as("v"))
      }: _*)).as("bv"))
      .select(col("id"), col("fp"), col("bv.blk"), col("bv.v"))
  }

  /** EXACT Hamming-distance near-dup pairs over an arbitrary
    * (`idCol`, `fpCol` long) relation — [[simhashPairs]]' banding +
    * confirm generalized past text: any ≤ `maxHamming` pair agrees on a
    * whole block (pigeonhole ⇒ zero false negatives), candidates form on
    * the (blk, v) equi-join, the `hamming` confirm makes output identical
    * to the all-pairs scan. `maxBucket` caps hot-bucket fan-out exactly
    * as in [[simhashPairs]]. Output: (a_id, b_id, hamming), a_id < b_id. */
  def hammingPairs(
      fps: DataFrame,
      idCol: String,
      fpCol: String,
      bits: Int,
      maxHamming: Int,
      maxBucket: Option[Int] = None): DataFrame = {
    val blockVals = fingerprintBlocks(
      fps.select(col(idCol).as("id"), col(fpCol).as("fp")), bits, maxHamming)
    val kept = maxBucket.fold(blockVals) { cap =>
      val w = Window.partitionBy("blk", "v")
      blockVals.withColumn("__bc", count(lit(1)).over(w))
        .filter(col("__bc") <= cap).drop("__bc")
    }
    val left = kept.select(col("blk"), col("v"),
      col("id").as("a_id"), col("fp").as("a_fp"))
    val right = kept.select(col("blk"), col("v"),
      col("id").as("b_id"), col("fp").as("b_fp"))
    left.join(right, Seq("blk", "v"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_fp", "b_fp")
      .distinct()
      .withColumn("hamming", hamming(col("a_fp"), col("b_fp")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact edit-distance near-dup pairs over a short-string column
    * (titles, URLs, product names): all (a_id, b_id, dist) with
    * Levenshtein distance <= `maxDist`, a_id < b_id — without the
    * all-pairs cross join, via Ed-Join-style q-gram prefix filtering
    * (Xiao, Wang & Lin, PVLDB 1(1) 2008).
    *
    * Why it is exact: a string of length l has l-q+1 positional q-grams
    * and one edit destroys at most q of them, so two strings within
    * distance d share all but at most d·q grams. Under ANY fixed global
    * order on gram tokens, the first d·q+1 grams of each string (its
    * "prefix") must therefore intersect the other's prefix — indexing
    * only prefixes loses no pair. We use the performance-optimal global
    * order (document frequency ascending, gram): rare grams land in
    * prefixes, so hot grams ("the ", "ing ") never build posting lists.
    * Candidates then pass a length filter (|l_a−l_b| <= d, a necessary
    * condition) before the exact per-pair `levenshtein` confirm, which
    * makes the output identical to the brute-force scan.
    *
    * Strings too short for the prefix bound to bite (the multiset
    * overlap lower bound max(g₁,g₂) − d·q is ≥ 1 only when
    * max(l₁,l₂) >= q·(d+1)) additionally emit one synthetic bucket
    * gram. A pair at risk has BOTH sides below that length, both carry
    * the bucket gram, and a short string's whole gram multiset
    * (<= d·q+1 grams including the synthetic) fits inside its prefix —
    * so the tiny-string tail still meets its within-distance partners.
    *
    * Plan: one df aggregation (gram -> df), one window per id for the
    * prefix ranks, one postings shuffle on prefix grams, two key joins
    * to rehydrate strings for the confirm. Candidate volume is bounded
    * by Σ over prefix grams of |postings|² — with rare-first ordering
    * that is near-linear on natural text. For adversarial corpora (many
    * identical strings — which are better handled by [[exact]] dedup
    * first) `maxBucket` caps any single posting list, trading
    * completeness on >cap duplicate groups for a hard fan-out bound.
    *
    * Choosing `q`: discrimination scales with the gram alphabet ^q, so
    * larger corpora (or low-entropy strings) need larger q; the x10
    * probe (EditScaleProbe, SCALEPROBE.md round-11) measured q=2
    * candidate-bound (x36 time at x10 corpus) vs q=3 output-bound (x20,
    * exactly the output's own growth). The exactness guarantee holds for
    * every q >= 1 — q trades only candidate volume against the shorter
    * synthetic-bucket threshold q·(d+1).
    */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 3,
      maxBucket: Option[Int] = None): DataFrame = {
    require(maxDist >= 1 && q >= 1, "editDistancePairs needs maxDist >= 1, q >= 1")
    val prefixLen = q * maxDist + 1
    val base = docs.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    // positional q-grams (duplicates kept — the prefix bound is on the
    // multiset) plus the short-string bucket gram. The explicit empty
    // array for len < q matters: sequence(1, 0) steps DOWN to [1, 0],
    // which would fabricate two whole-string "grams" per short string
    val grams = when(length(col("s")) < q, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(col("s")) - (q - 1)),
        i => substring(col("s"), i, lit(q))))
    val withShort = when(length(col("s")) < q * (maxDist + 1),
      concat(grams, array(lit("\u0000S")))).otherwise(grams)
    val ex = base.select(col("id"), length(col("s")).as("len"),
      explode(withShort).as("g"))
    val dfs = ex.groupBy("g").agg(countDistinct(col("id")).as("__df"))
    val ranked = ex.join(dfs, "g")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("__df"), col("g"))))
      .filter(col("__rn") <= prefixLen)
      .select("id", "len", "g").distinct()
    val kept = maxBucket.fold(ranked) { cap =>
      val w = Window.partitionBy("g")
      ranked.withColumn("__bc", count(lit(1)).over(w))
        .filter(col("__bc") <= cap).drop("__bc")
    }
    val postings = kept.groupBy("g")
      .agg(collect_list(struct(col("id"), col("len"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    val cand = postings
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a.id").as("a_id"), col("a.len").as("la"), explode(col("ds")).as("b"))
      .select(col("a_id"), col("la"), col("b.id").as("b_id"), col("b.len").as("lb"))
      .filter(col("a_id") < col("b_id"))
      .filter(abs(col("la") - col("lb")) <= maxDist)
      .select("a_id", "b_id").distinct()
    cand
      .join(base.select(col("id").as("a_id"), col("s").as("__sa")), "a_id")
      .join(base.select(col("id").as("b_id"), col("s").as("__sb")), "b_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("int"))
      .filter(col("dist") <= maxDist)
      .select("a_id", "b_id", "dist")
  }

  /** DuckDB SQL for the brute-force all-pairs equivalent of
    * [[simhashPairs]] (differential oracle — exactness of the banding
    * means brute force must agree bit-for-bit). */
  def simhashPairsOracleSql(
      table: String, idCol: String, textCol: String, maxHamming: Int): String =
    s"""WITH fp AS (${simhashOracleSql(table, idCol, textCol)})
        SELECT a.id AS a_id, b.id AS b_id,
               bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
        FROM fp a JOIN fp b ON a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming"""
}
