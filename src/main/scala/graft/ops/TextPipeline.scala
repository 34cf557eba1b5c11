package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** LLM-training-data pipeline operators over `documents` beyond §2.9:
  * token counting, quality scoring, rolling-hash fingerprinting, SimHash
  * and MinHash+LSH near-dup, and n-gram language identification.
  *
  * Shared primitive: a cross-engine token hash `th(t)` = first 8 hex chars
  * of md5, parsed as an integer (identical in Spark and DuckDB). All
  * sketches (rolling hash, simhash, minhash) are built from it with pure
  * integer arithmetic, so outputs hash-match the oracle exactly.
  *
  * Scale posture: every operator is explode → hash-aggregate with shuffles
  * only on (doc|gram|band) keys; the near-dup joins go through LSH-style
  * band buckets, never a global all-pairs product.
  */
object TextPipeline {

  private val P = 1000000007L

  /** Cross-engine 32-bit token hash (md5-hex prefix as integer). */
  private def th(t: Column): Column = graft.core.Det.hash32(t)

  private def toks(c: Column): Column = split(lower(c), " ")

  /** Token counting three ways: whitespace tokens, letter runs, and a
    * BPE-ish vowel/consonant-run segmentation (regex over codegen'd
    * builtins), plus exact integer chars-per-token.
    */
  def q_token_count(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .cast("long").as("letter_runs"),
        size(regexp_extract_all(lower(col("text")),
          lit("[aeiou]+|[b-df-hj-np-tv-z]+"), lit(0)))
          .cast("long").as("subword_units"),
        expr("(n_chars * 10000) div size(split(lower(text), ' '))").as("chars_per_tok_e4"))
      .orderBy("doc_id")

  /** Heuristic quality score: stopword ratio, lexical diversity, and a
    * length factor combined in one fixed IEEE expression (bit-identical
    * across engines — every input is an exact integer).
    */
  def q_quality_score(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(
        col("doc_id"),
        size(col("t")).cast("long").as("n_tok"),
        size(array_distinct(col("t"))).cast("long").as("distinct_tok"),
        size(filter(col("t"), t => t.isin("the", "a", "of", "to", "in")))
          .cast("long").as("stop_hits"))
      .withColumn("quality",
        lit(0.4) * (lit(1.0) - col("stop_hits") / col("n_tok")) +
        lit(0.3) * (col("distinct_tok") / col("n_tok")) +
        lit(0.3) * least(lit(1.0), col("n_tok") / lit(50.0)))
      .orderBy("doc_id")

  /** Rolling polynomial (Rabin-Karp-style) document fingerprint: Horner
    * fold of token hashes mod P via the aggregate HOF — sequential per
    * document, distributed across documents. n_same exposes dedup groups.
    */
  def q_doc_fingerprint(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        aggregate(
          transform(toks(col("text")), t => th(t)),
          lit(0L),
          (acc, h) => (acc * 31L + h) % P).as("fingerprint"))
      .withColumn("n_same", count(lit(1)).over(Window.partitionBy("fingerprint")))
      .orderBy("doc_id")

  /** SimHash near-dup: 16-bit simhash over the distinct-token set, then
    * candidate pairs via 4×4-bit band buckets (pigeonhole: hamming ≤ 3 ⇒
    * ≥ 1 shared band — the blocking is EXACT, not approximate), verified
    * by bit_count(xor) ≤ 3. Candidates are additionally sharded by
    * (lang, source) — the 100 TB posture: dedup within corpus shards, so
    * a degenerate bucket never goes quadratic in the whole corpus.
    */
  def q_dedup_simhash(spark: SparkSession, sf: String): DataFrame =
    dedupSimhashOf(Text.docSetsOf(Tables.documents(spark, sf)))

  /** Rep-collapsed like [[dedupMinhashLshOf]] (round 8): the simhash
    * depends only on the distinct-token set, so a dup cluster's members
    * all collide in every band — sketch, banding and the hamming verify
    * run over one rep per group; a within-group pair has hamming 0. */
  private[graft] def dedupSimhashOf(docsIn: DataFrame): DataFrame = {
    val withRep = Text.withRepOf(docsIn)
    val sim = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("lang"), col("source"),
        explode(col("toks")).as("word"))
      .select(col("doc_id"), col("lang"), col("source"), th(col("word")).as("h"))
      .select(col("doc_id"), col("lang"), col("source"), col("h"),
        explode(sequence(lit(0), lit(15))).as("j"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("j"))
      .agg(sum(expr("(CAST(shiftright(h, j) AS BIGINT) & 1) * 2 - 1")).as("s"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(sum(expr("CASE WHEN s > 0 THEN CAST(shiftleft(1, j) AS BIGINT) ELSE 0 END"))
        .as("simhash"))
    val bands = sim.select(col("doc_id"), col("lang"), col("source"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bv", expr("CAST(shiftright(simhash, band * 4) AS BIGINT) & 15"))
    val repPairs = bands.as("a")
      .join(bands.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
    val members = withRep.select(col("rep"), col("doc_id"))
    val cross = repPairs
      .join(members.select(col("rep").as("d1"), col("doc_id").as("m1")), "d1")
      .join(members.select(col("rep").as("d2"), col("doc_id").as("m2")), "d2")
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"), col("hamming"))
    val within = members.as("a")
      .join(members.as("b"),
        col("a.rep") === col("b.rep") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit(0L).as("hamming"))
    cross.unionByName(within).orderBy("d1", "d2")
  }

  /** MinHash signatures (8 affine minhashes, i = 0..7) and 4×2 banded LSH
    * candidate pairs over a (doc_id, lang, source, toks, sz) frame —
    * the shared sketch core of [[q_dedup_minhash_lsh]] and
    * [[q_minhash_accuracy]]. Candidates are sharded by (lang, source) —
    * see the q_dedup_simhash note. */
  private def lshSigAndCand(docs: DataFrame): (DataFrame, DataFrame) = {
    val hashed = docs
      .select(col("doc_id"), col("lang"), col("source"),
        explode(col("toks")).as("word"))
      .select(col("doc_id"), col("lang"), col("source"), th(col("word")).as("h"))
    val sig = hashed
      .select(col("doc_id"), col("lang"), col("source"), col("h"),
        explode(sequence(lit(0), lit(7))).as("i"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("i"))
      .agg(min(expr("((2 * i + 1) * h + 7919 * i + 12345) % 1000000007")).as("sig"))
      // 8 rows per doc; materialized because the banding below AND (in
      // the accuracy audit) two signature-agreement joins re-read it —
      // lazy, the token explode + min-hash aggregate ran up to 4× per
      // query (round 10 plan audit: q_minhash_accuracy 44 Exchange nodes)
      .localCheckpoint()
    val bands = sig
      .groupBy(col("doc_id"), col("lang"), col("source"), expr("i div 2").as("band"))
      .agg(sum(expr("sig * (CASE WHEN i % 2 = 0 THEN 4294967311 ELSE 1 END)")).as("bv"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    (sig, cand)
  }

  /** MinHash + LSH near-dup: 8 minhashes of the distinct-token set from
    * affine transforms of the shared token hash; 4 bands × 2 rows; docs
    * colliding in any band become candidates; candidates are verified with
    * the exact token-set Jaccard and kept at J ≥ 0.5.
    *
    * Scale shape (round 8): exact-dup rep collapse FIRST, like the
    * threshold sweep — signatures depend only on the (lang, source,
    * token-set) group key, so the N identical docs of a dup cluster all
    * carry the SAME signature and used to collide in EVERY band
    * (N²/2 candidate rows before `distinct` — the one spot a dup-heavy
    * corpus hurt). Sketch + banding + verify now run over one
    * representative per group; member pairs are expanded afterwards with
    * their group-invariant Jaccard (within-group pairs have J = 1 ≥ 0.5
    * by construction). Output identical (Round8OpsSpec pins equality
    * against the uncollapsed pipeline on a planted dirty corpus).
    */
  def q_dedup_minhash_lsh(spark: SparkSession, sf: String): DataFrame =
    dedupMinhashLshOf(Text.docSetsOf(Tables.documents(spark, sf)))

  private[graft] def dedupMinhashLshOf(docsIn: DataFrame): DataFrame = {
    val withRep = Text.withRepOf(docsIn)
    val reps = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("lang"), col("source"), col("toks"), col("sz"))
    val (_, cand) = lshSigAndCand(reps)
    // exact Jaccard per rep candidate from the two token ARRAYS
    // (linear-pass array_intersect per pair), not the candidate ×
    // doc-length postings double-join
    val repPairs = cand
      .join(reps.select(col("doc_id").as("d1"), col("toks").as("t1"),
        col("sz").as("sz1")), "d1")
      .join(reps.select(col("doc_id").as("d2"), col("toks").as("t2"),
        col("sz").as("sz2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("t1"), col("t2"))).cast("long").as("inter"),
        col("sz1"), col("sz2"))
      .withColumn("j", col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("j") >= 0.5)
      .select(col("d1"), col("d2"), round(col("j"), 4).as("j"))
    val members = withRep.select(col("rep"), col("doc_id"))
    val cross = repPairs
      .join(members.select(col("rep").as("d1"), col("doc_id").as("m1")), "d1")
      .join(members.select(col("rep").as("d2"), col("doc_id").as("m2")), "d2")
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"), col("j"))
    // within an exact-dup group: identical signatures collide in every
    // band, inter = sz ⇒ J = sz/sz = 1.0 exactly (x/x is exact in IEEE)
    val within = members.as("a")
      .join(members.as("b"),
        col("a.rep") === col("b.rep") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"), lit(1.0).as("j"))
    cross.unionByName(within).orderBy("d1", "d2")
  }

  /** MinHash sketch accuracy audit: for every LSH candidate pair of
    * [[q_dedup_minhash_lsh]]'s pipeline, the signature-agreement estimate
    * (matches/8 as e4) beside the exact Jaccard (e4) and the absolute
    * error — the "is 8 hashes enough" calibration a dedup run performs
    * before trusting the sketch at scale. Same shared md5 hash on both
    * engines, so even the estimates hash-match.
    */
  def q_minhash_accuracy(spark: SparkSession, sf: String): DataFrame =
    minhashAccuracyOf(Text.docSetsOf(Tables.documents(spark, sf)))

  /** Rep-collapsed like [[dedupMinhashLshOf]] (the candidate stage is the
    * same banding): signature agreement and exact Jaccard are both
    * group-invariant, so rep candidates expand exactly; a within-group
    * pair has all 8 signatures equal and J = 1 (matches = 8,
    * est = exact = 10000, error 0). */
  private[graft] def minhashAccuracyOf(docsIn: DataFrame): DataFrame = {
    val withRep = Text.withRepOf(docsIn)
    val reps = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("lang"), col("source"), col("toks"), col("sz"))
    val (sig, cand0) = lshSigAndCand(reps)
    // candidate pairs are read by BOTH the agreement count and the exact
    // Jaccard verify — materialize the banding join once
    val cand = cand0.localCheckpoint()
    val matches = cand
      .join(sig.select(col("doc_id").as("d1"), col("i"), col("sig").as("s1")), Seq("d1"))
      .join(sig.select(col("doc_id").as("d2"), col("i"), col("sig").as("s2")), Seq("d2", "i"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(when(col("s1") === col("s2"), 1L).otherwise(0L)).as("matches"))
    // exact Jaccard per rep candidate from the two token ARRAYS (one
    // linear-pass array_intersect per pair) — the former postings
    // double-join fanned every candidate out by doc length before
    // re-aggregating, a ~20× row blowup at high duplicate density
    val exact = cand
      .join(reps.select(col("doc_id").as("d1"), col("toks").as("t1"),
        col("sz").as("sz1")), "d1")
      .join(reps.select(col("doc_id").as("d2"), col("toks").as("t2"),
        col("sz").as("sz2")), "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("t1"), col("t2"))).cast("long").as("inter"),
        col("sz1"), col("sz2"))
      .select(col("d1"), col("d2"),
        expr("inter * 10000 div (sz1 + sz2 - inter)").as("exact_e4"))
    val repRows = matches.join(exact, Seq("d1", "d2"))
      .select(col("d1"), col("d2"), col("matches"),
        (col("matches") * 1250).as("est_e4"), col("exact_e4"),
        abs(col("matches") * 1250 - col("exact_e4")).as("abs_err_e4"))
    val members = withRep.select(col("rep"), col("doc_id"))
    val cross = repRows
      .join(members.select(col("rep").as("d1"), col("doc_id").as("m1")), "d1")
      .join(members.select(col("rep").as("d2"), col("doc_id").as("m2")), "d2")
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"),
        col("matches"), col("est_e4"), col("exact_e4"), col("abs_err_e4"))
    val within = members.as("a")
      .join(members.as("b"),
        col("a.rep") === col("b.rep") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        lit(8L).as("matches"), lit(10000L).as("est_e4"),
        lit(10000L).as("exact_e4"), lit(0L).as("abs_err_e4"))
    cross.unionByName(within).orderBy("d1", "d2")
  }

  /** Per-document bigram stream (doc_id, w1, w2) — the ONE bigram builder
    * behind the LM queries and the PMI collocations; keeping a single
    * definition keeps the model, the scorer and the collocation margins in
    * lockstep.
    */
  private[ops] def docBigrams(spark: SparkSession, sf: String): DataFrame =
    docBigramsOf(Tables.documents(spark, sf))

  /** [[docBigrams]] over an explicit documents-shaped frame (must carry
    * `doc_id` and `text`) — the rep-collapsed consumers feed their rep
    * slice through the same single definition. */
  private[graft] def docBigramsOf(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Bigram LM table (w1, w2, c12, p_e6): P(w2|w1) as an exact e6-scaled
    * integer, contexts via a window re-sum of the bigram aggregate itself
    * (no second corpus pass), cutoff c12 ≥ 5.
    */
  private[ops] def bigramModel(bg: DataFrame): DataFrame =
    bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy("w1")))
      .filter(col("c12") >= 5)
      .select(col("w1"), col("w2"), col("c12"), expr("(c12 * 1000000) div c1").as("p_e6"))

  /** Bigram language model: top-30 of [[bigramModel]]. */
  def q_ngram_lm(spark: SparkSession, sf: String): DataFrame =
    bigramModel(docBigrams(spark, sf))
      .orderBy(col("p_e6").desc, col("w1").asc, col("w2").asc)
      .limit(30)

  /** Dedup APPLY step: exact-dup groups keep their smallest doc_id (the
    * canonical keep-first policy); per (lang, source) corpus shard: total,
    * kept and removed document counts. The survivor flag is a window min
    * over the fingerprint — one shuffle, no self-join.
    */
  def q_dedup_apply(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        md5(col("text").cast("binary")).as("fp"))
      .withColumn("keep",
        when(col("doc_id") === min(col("doc_id")).over(Window.partitionBy("fp")), 1L)
          .otherwise(0L))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_kept"),
        (count(lit(1)) - sum(col("keep"))).as("n_removed"))
      .orderBy("lang", "source")

  /** Benchmark-contamination check: candidate documents sharing any
    * token-trigram shingle with the benchmark slice (doc_id ≡ 0..4 mod 100,
    * a scale-invariant 5%). The benchmark shingle set is deduplicated and
    * BROADCAST, so the corpus-side pass is a single scan + map-side join —
    * the shape that survives a 100 TB corpus (the benchmark is small by
    * definition; the corpus never self-joins).
    */
  def q_contamination(spark: SparkSession, sf: String): DataFrame = {
    val sh = Tables.documents(spark, sf)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        """array_distinct(transform(sequence(2, size(t) - 1),
           i -> concat_ws(' ', t[i-2], t[i-1], t[i])))""")).as("sh"))
    val bench = sh.filter(col("doc_id") % 100 < 5)
      .select(col("sh")).distinct().withColumn("hit", lit(1L))
    sh.filter(col("doc_id") % 100 >= 5)
      .join(broadcast(bench), Seq("sh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .filter(col("n_shared") > 0)
      .withColumn("overlap_e4", expr("n_shared * 10000 div n_shingles"))
      .orderBy("doc_id")
  }

  /** LM scoring (perplexity proxy): every document scored against the
    * corpus bigram model of [[q_ngram_lm]] (all bigrams seen ≥ 5 times) —
    * per doc: bigram count, model coverage, exact integer Σ P(w2|w1)·10⁶
    * and its per-covered-bigram mean. The ≥5 cutoff bounds the model to the
    * head of the distribution, keeping it broadcastable at corpus scale.
    */
  def q_lm_score(spark: SparkSession, sf: String): DataFrame = {
    val bg = docBigrams(spark, sf)
    val model = bigramModel(bg).select(col("w1"), col("w2"), col("p_e6"))
    bg.join(broadcast(model), Seq("w1", "w2"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bg"),
        count(col("p_e6")).as("covered"),
        coalesce(sum(col("p_e6")), lit(0L)).as("score_e6"))
      .withColumn("avg_p_e6",
        when(col("covered") === 0L, lit(0L)).otherwise(expr("score_e6 div covered")))
      .orderBy("doc_id")
  }

  /** N-gram language identification (Cavnar–Trenkle out-of-place measure):
    * rank the top-20 character bigrams per language and per document, score
    * each (doc, lang) by Σ|rank difference| (missing gram → penalty 20),
    * predict the argmin language. Pure integer ranks and sums.
    *
    * (On this fixture every language shares one vocabulary, so accuracy is
    * near-chance — the operator is graded on determinism and shape.)
    */
  def q_langid_ngram(spark: SparkSession, sf: String): DataFrame =
    langidPredictions(spark, sf).orderBy("doc_id")

  /** Confusion matrix + per-language accuracy of the char-bigram language
    * identifier — the evaluation row the [[q_langid_ngram]] model ships
    * with. Same pipeline, re-aggregated to (actual, predicted) cells.
    */
  def q_langid_confusion(spark: SparkSession, sf: String): DataFrame = {
    val cells = langidPredictions(spark, sf)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("row_tot", sum(col("n")).over(Window.partitionBy("actual")))
      .select(col("actual"), col("predicted"), col("n"),
        expr("n * 10000 div row_tot").as("row_share_e4"))
      .orderBy("actual", "predicted")
  }

  /** Shared char-bigram language-ID core: rank-distance of each doc's
    * top-20 bigram profile against every language's top-20 profile.
    *
    * Rep-collapsed (round 8 — caught by the sf3 probe: the bigram explode
    * + (doc, gram) aggregate were the suite's biggest LINEAR constant,
    * and identical (lang, text) docs recompute identical profiles):
    * grams explode only over one representative per group; the language
    * profile is recovered EXACTLY as Σ m·c over rep counts (every member
    * contributes the same per-gram counts as its rep); per-rep ranks,
    * distances and the argmin language are group-invariant, so the
    * prediction row expands to members by one join. Equality is
    * oracle-gated at both scales and Round8OpsSpec-pinned against the
    * uncollapsed pipeline on a dirty corpus.
    */
  private def langidPredictions(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("rep", min(col("doc_id")).over(
        Window.partitionBy(col("lang"), md5(col("text").cast("binary")))))
      .localCheckpoint()
    val groups = docs.groupBy(col("rep")).agg(count(lit(1)).as("m"))
    val grams = docs.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("lang"),
        explode(Bridge.column(graft.functions.CharBigrams(Bridge.expression(col("text")))))
          .as("gram"))
    // one explode + one aggregate over REPS: each doc has exactly one
    // lang, so the per-doc and per-lang profiles both derive from
    // (rep, lang, gram) counts — the full-corpus language profile is the
    // group-size-weighted re-aggregation
    val gramCounts = grams.groupBy(col("doc_id"), col("lang"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the language profile AND the doc ranks
    val langTop = gramCounts
      .join(groups.select(col("rep").as("doc_id"), col("m")), "doc_id")
      .groupBy(col("lang"), col("gram")).agg(sum(col("c") * col("m")).as("c"))
      .withColumn("lrank", row_number().over(
        Window.partitionBy("lang").orderBy(col("c").desc, col("gram").asc)).cast("long"))
      .filter(col("lrank") <= 20)
      .select(col("lang").as("cand_lang"), col("gram"), col("lrank"))
    val docTop = gramCounts
      .withColumn("drank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("c").desc, col("gram").asc)).cast("long"))
      .filter(col("drank") <= 20)
      .select(col("doc_id"), col("gram"), col("drank"))
    val langs = docs.select(col("lang").as("cand_lang")).distinct()
    val dist = docTop
      .crossJoin(broadcast(langs))
      .join(broadcast(langTop), Seq("cand_lang", "gram"), "left_outer")
      .groupBy(col("doc_id"), col("cand_lang"))
      .agg(sum(coalesce(abs(col("drank") - col("lrank")), lit(20L))).as("dist"))
    val preds = dist.groupBy(col("doc_id"))
      .agg(min(struct(col("dist"), col("cand_lang"))).as("best"))
      .select(col("doc_id").as("rep"), col("best.cand_lang").as("predicted"),
        col("best.dist").as("dist"))
    docs.select(col("doc_id"), col("lang").as("actual"), col("rep"))
      .join(preds, "rep")
      .select(col("doc_id"), col("predicted"), col("actual"), col("dist"))
  }

  /** Vocabulary coverage / OOV-rate report (the "how well does a fixed
    * top-K vocabulary cover each language" check run before tokenizer
    * training): vocab = global top-100 words (count desc, word asc — a
    * TakeOrderedAndProject, not a global window), per language the token
    * total, OOV total and OOV rate as an exact e4 integer.
    */
  def q_oov_rate(spark: SparkSession, sf: String): DataFrame = {
    val tokStream = Tables.documents(spark, sf)
      .select(col("lang"), explode(toks(col("text"))).as("word"))
    val vocab = tokStream.groupBy(col("word")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word").asc).limit(100)
      .select(col("word"), lit(1L).as("in_vocab"))
    tokStream.join(broadcast(vocab), Seq("word"), "left_outer")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("lang"), col("n_tokens"), col("n_oov"),
        expr("n_oov * 10000 div n_tokens").as("oov_e4"))
      .orderBy("lang")
  }

  /** Corpus health report (the one-page per-language dashboard a data
    * curation run ends with): documents, characters, tokens, vocabulary,
    * type/token ratio, mean document length, and exact-duplicate volume —
    * three aggregates (doc stats, token stats, fingerprint groups) joined
    * on the language key. Every number is an exact integer.
    */
  def q_corpus_report(spark: SparkSession, sf: String): DataFrame = {
    val docs = Tables.documents(spark, sf)
    val docStats = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("n_chars"))
    val tokStats = docs
      .select(col("lang"), explode(toks(col("text"))).as("word"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("word")).as("vocab"))
    val dupStats = docs
      .select(col("lang"), md5(col("text").cast("binary")).as("fp"))
      .groupBy(col("lang"), col("fp")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("dup_docs"), count(lit(1)).as("dup_groups"))
    docStats.join(tokStats, "lang")
      .join(dupStats, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_docs"), col("n_chars"), col("n_tokens"), col("vocab"),
        expr("vocab * 10000 div n_tokens").as("ttr_e4"),
        expr("n_chars div n_docs").as("mean_chars"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        coalesce(col("dup_groups"), lit(0L)).as("dup_groups"))
      .orderBy("lang")
  }

  /** Heaps-law vocabulary-growth curve: documents fall into 10 equal
    * id-range buckets (a deterministic corpus order — no seed, no sort);
    * per bucket the cumulative token count and cumulative distinct types
    * (a type is counted in the bucket where it FIRST appears — one
    * `min(bucket)` per word, never a distinct-over-growing-prefix), plus
    * the cumulative type/token ratio as an e4 integer. Cumulation is a
    * bounded self-join over the 10-row bucket table, not a window.
    */
  def q_vocab_growth(spark: SparkSession, sf: String): DataFrame = {
    val docs = Tables.documents(spark, sf)
    val maxid = docs.agg(max(col("doc_id")).as("maxid"))
    val tok = docs.crossJoin(broadcast(maxid))
      .select(expr("(doc_id * 10) div (maxid + 1)").as("bucket"),
        explode(toks(col("text"))).as("word"))
    val perBucket = tok.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val newTypes = tok.groupBy(col("word")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val j = perBucket.join(newTypes, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
    j.as("a").join(j.as("b"), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.n_tokens")).as("cum_tokens"),
        sum(col("b.new_types")).as("cum_types"))
      .select(col("bucket"), col("cum_tokens"), col("cum_types"),
        expr("cum_types * 10000 div cum_tokens").as("ttr_e4"))
      .orderBy("bucket")
  }

  /** Hashing-trick featurization (the fixed-width bag-of-words a linear
    * model trains on when the vocabulary is unbounded): every term maps
    * to one of 32 buckets by the shared md5 hash; per (lang, bucket) the
    * summed term count and the number of distinct terms that collided
    * into the bucket. One vocabulary-sized aggregate then a 160-cell
    * one — nothing here grows with corpus size except the first shuffle.
    */
  def q_feature_hashing(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("lang"), explode(toks(col("text"))).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("c"))
      .select(col("lang"), col("c"), (th(col("word")) % 32).as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("total_count"))
      .orderBy("lang", "bucket")

  /** Composite corpus-filter pipeline (the end-to-end QA pass a training
    * pipeline chains from the individual signals): per document, token
    * length bounds + lexical diversity + top-bigram repetition combined
    * into one keep decision; reported per (lang, source) shard as total /
    * kept / surviving characters. Everything is exact integers; the
    * per-doc signals join on doc_id — at corpus scale two document-keyed
    * shuffles, then one tiny shard aggregate.
    */
  def q_filter_pipeline(spark: SparkSession, sf: String): DataFrame = {
    val docStats = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        toks(col("text")).as("t"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(col("t")).cast("long").as("n_tok"),
        size(array_distinct(col("t"))).cast("long").as("distinct_tok"))
    val rep = docBigrams(spark, sf)
      .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bg"), max(col("c")).as("top_c"))
    docStats.join(rep, Seq("doc_id"), "left_outer")
      .withColumn("keep",
        when(col("n_tok").between(20L, 200L) &&
          expr("distinct_tok * 1000000 div n_tok") >= 500000L &&
          coalesce(expr("top_c * 1000000 div n_bg"), lit(0L)) < 100000L, 1L)
          .otherwise(0L))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"),
        sum(when(col("keep") === 1L, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("lang", "source")
  }

  /** Gopher-style repetition quality filter: per document, the fraction of
    * bigram occurrences claimed by the single most frequent bigram and the
    * fraction covered by any repeated bigram, both as exact e6 integers
    * (count·10⁶ div total — no floats), plus the keep/reject decision
    * (reject when top ≥ 10% or repeated ≥ 15% — tuned so the fixture
    * exercises both branches). One explode + two aggregates per doc; at
    * corpus scale this is a single shuffle keyed by doc_id.
    */
  def q_repetition_filter(spark: SparkSession, sf: String): DataFrame = {
    val bgc = docBigrams(spark, sf)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    bgc.groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bg"),
        max(col("c")).as("top_c"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_c"))
      .select(
        col("doc_id"),
        col("n_bg"),
        expr("top_c * 1000000 div n_bg").as("top_bigram_frac_e6"),
        expr("dup_c * 1000000 div n_bg").as("dup_bigram_frac_e6"),
        when(expr("top_c * 1000000 div n_bg") < 100000 &&
          expr("dup_c * 1000000 div n_bg") < 150000, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  /** Head-vocabulary coverage per language: the exact e4 share of all
    * token occurrences covered by the language's 20 most frequent tokens
    * (rank is a lang-keyed window over the token aggregate; ties break on
    * the token). The number a stopword list or BPE head-vocab is sized
    * from; the scan aggregates once, the rank runs on the aggregate.
    */
  def q_top_token_coverage(spark: SparkSession, sf: String): DataFrame = {
    val counts = Tables.documents(spark, sf)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("word").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("n")).as("n_tokens"),
        sum(when(col("rk") <= 20, col("n")).otherwise(0L)).as("top20_tokens"))
      .select(col("lang"), col("n_distinct"), col("n_tokens"), col("top20_tokens"),
        expr("top20_tokens * 10000 div n_tokens").as("coverage_e4"))
      .orderBy("lang")
  }

  /** Degenerate-document audit per language: single-token docs, uniform
    * (one distinct token repeated) docs, and sub-20-char docs — the
    * pathological inputs that crash tokenizers or poison LM statistics,
    * counted in one scan.
    */
  def q_degenerate_docs(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars"), toks(col("text")).as("t"))
      .select(col("lang"), col("n_chars"),
        size(col("t")).cast("long").as("n_tok"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tok") === 1L, 1L).otherwise(0L)).as("n_single_tok"),
        sum(when(col("n_distinct") === 1L && col("n_tok") > 1L, 1L).otherwise(0L))
          .as("n_uniform"),
        sum(when(col("n_chars") < 20L, 1L).otherwise(0L)).as("n_short"))
      .orderBy("lang")

  /** N-gram autocomplete: the top-3 continuations (by bigram count, tie →
    * token) for five fixed prefixes — the suggestion table a type-ahead
    * service precomputes. The prefix filter pushes into the bigram
    * aggregate, so cost follows the prefix list, not the corpus.
    */
  def q_ngram_autocomplete(spark: SparkSession, sf: String): DataFrame = {
    val prefixes = Seq("fast", "table", "data", "key", "row")
    val w = Window.partitionBy("w1").orderBy(col("c").desc, col("w2").asc)
    docBigrams(spark, sf)
      .filter(col("w1").isin(prefixes: _*))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("w1").as("prefix"), col("rk"), col("w2").as("suggestion"), col("c"))
      .orderBy("prefix", "rk")
  }

  /** Stopword discovery: tokens present in ≥ 75% of documents (document
    * frequency, not raw count — the robust definition). One distinct
    * pass; the output IS the stopword list a filter stage consumes.
    */
  def q_stopword_discovery(spark: SparkSession, sf: String): DataFrame = {
    val n = Tables.documents(spark, sf).agg(count(lit(1)).as("nn"))
    Tables.documents(spark, sf)
      .select(col("doc_id"), explode(toks(col("text"))).as("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("word"), col("df"), expr("df * 10000 div nn").as("df_ratio_e4"))
      .filter(col("df_ratio_e4") >= 7500L)
      .orderBy(col("df_ratio_e4").desc, col("word").asc)
  }

  /** Doc-length ↔ token-count correlation per language — a calibration
    * audit: if chars and tokens decorrelate somewhere, the tokenizer or
    * the length metadata is wrong for that slice. Exact sums, one
    * epilogue.
    */
  def q_len_token_corr(spark: SparkSession, sf: String): DataFrame = {
    val s = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").as("x"),
        size(toks(col("text"))).cast("long").as("y"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val dx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val dy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    s.select(col("lang"), col("n"),
      (round(num / sqrt(dx * dy), 6) + lit(0.0)).as("corr"))
      .orderBy("lang")
  }

  /** Cross-language length calibration: average document chars per
    * language (e4 floor) and the e4 ratio vs the English baseline — the
    * normalization table a per-language token budget is derived from.
    */
  def q_lang_length_ratio(spark: SparkSession, sf: String): DataFrame = {
    val s = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val en = s.filter(col("lang") === "en")
      .select(col("n_docs").as("en_n"), col("chars").as("en_chars"))
    s.crossJoin(broadcast(en))
      .select(col("lang"), col("n_docs"), col("chars"),
        expr("chars * 10000 div n_docs").as("mean_chars_e4"),
        expr("CAST(CAST(chars AS decimal(38,0)) * en_n * 10000" +
          " div (CAST(n_docs AS decimal(38,0)) * en_chars) AS BIGINT)")
          .as("ratio_vs_en_e4"))
      .orderBy("lang")
  }

  /** End-to-end curation funnel: the document counts and char mass that
    * survive each pipeline stage — raw → length gate → token-count gate →
    * repetition gate → exact dedup (keep lowest doc_id per text). The
    * waterfall readout every corpus-curation run is judged by; per-doc
    * flags are computed once (`localCheckpoint`) and the five stage
    * aggregates read that table, not the corpus.
    */
  def q_pipeline_funnel(spark: SparkSession, sf: String): DataFrame = {
    // round 8, two cuts: (1) the repetition gate's bigram scan and the
    // token count depend only on text, so they run once per distinct
    // text (keyed by the dedup group's min doc_id) and join back; (2)
    // the five stage rows come from ONE conditional aggregate over the
    // per-doc flag table instead of five filter+agg jobs
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("tid", min(col("doc_id")).over(Window.partitionBy("text")))
      .localCheckpoint()
    val firsts = docs.filter(col("doc_id") === col("tid"))
      .select(col("doc_id"), col("text"))
    val textStats = firsts
      .select(col("doc_id").as("tid"),
        (size(split(lower(col("text")), " ")).cast("long") >= 20L).as("tok_ok"))
    val rep = docBigramsOf(firsts)
      .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bg"), max(col("c")).as("top_c"))
      .select(col("doc_id").as("tid"),
        (expr("top_c * 1000000 div n_bg") < 200000L).as("rep_ok"))
    val flags = docs
      .join(textStats, Seq("tid"))
      .join(rep, Seq("tid"), "left_outer")
      .select(col("n_chars"),
        (col("n_chars") >= 100L && col("n_chars") <= 5000L).as("len_ok"),
        col("tok_ok"),
        coalesce(col("rep_ok"), lit(false)).as("rep_ok"),
        (col("doc_id") === col("tid")).as("first_of_text"))
    def n(f: Column) = sum(when(f, 1L).otherwise(0L))
    def c(f: Column) = sum(when(f, col("n_chars")))
    val f1 = col("len_ok")
    val f2 = f1 && col("tok_ok")
    val f3 = f2 && col("rep_ok")
    val f4 = f3 && col("first_of_text")
    flags.agg(
        count(lit(1)).as("n0"), sum(col("n_chars")).as("c0"),
        n(f1).as("n1"), c(f1).as("c1"), n(f2).as("n2"), c(f2).as("c2"),
        n(f3).as("n3"), c(f3).as("c3"), n(f4).as("n4"), c(f4).as("c4"))
      .select(explode(array(
        struct(lit(0L).as("stage"), lit("raw").as("gate"),
          col("n0").as("n_docs"), col("c0").as("sum_chars")),
        struct(lit(1L).as("stage"), lit("length").as("gate"),
          col("n1").as("n_docs"), col("c1").as("sum_chars")),
        struct(lit(2L).as("stage"), lit("tokens").as("gate"),
          col("n2").as("n_docs"), col("c2").as("sum_chars")),
        struct(lit(3L).as("stage"), lit("repetition").as("gate"),
          col("n3").as("n_docs"), col("c3").as("sum_chars")),
        struct(lit(4L).as("stage"), lit("exact_dedup").as("gate"),
          col("n4").as("n_docs"), col("c4").as("sum_chars")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.gate").as("gate"),
        col("s.n_docs").as("n_docs"), col("s.sum_chars").as("sum_chars"))
      .orderBy("stage")
  }

  /** Top-20 character trigrams per language with exact e4 share — the
    * raw profile a language-ID model trains on. Trigrams are generated
    * inside the row (one transform over the char positions, no join);
    * docs shorter than 3 chars are skipped on both engines.
    */
  def q_char_trigram_profile(spark: SparkSession, sf: String): DataFrame = {
    // rep collapse (round 8): the profile needs no doc ids, so identical
    // (lang, text) docs group DIRECTLY (one shuffled text row per distinct
    // doc vs ~n_chars exploded rows) and each trigram carries the group
    // size — Σ m over rep trigrams = the full-corpus count exactly
    val counts = Tables.documents(spark, sf)
      .filter(col("n_chars") >= 3)
      .groupBy(col("lang"), col("text")).agg(count(lit(1)).as("m"))
      .select(col("lang"), col("m"), explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"))
        .as("g"))
      .groupBy(col("lang"), col("g"))
      .agg(sum(col("m")).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("g").asc)
    counts
      .withColumn("tot", sum(col("n")).over(Window.partitionBy("lang")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("rk"), col("g").as("trigram"), col("n"),
        expr("n * 10000 div tot").as("share_e4"))
      .orderBy("lang", "rk")
  }

  /** Compression-proxy corpus metric: exact chars-per-token (e4 floor) per
    * (lang, source) — the cheap stand-in for bytes-per-BPE-token that
    * flags anomalous sources before tokenizer training. Pure one-pass
    * integer aggregate.
    */
  def q_chars_per_token(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars"),
        size(split(lower(col("text")), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        sum(col("n_tok")).as("toks"))
      .select(col("lang"), col("source"), col("n_docs"), col("chars"), col("toks"),
        expr("chars * 10000 div toks").as("cpt_e4"))
      .orderBy("lang", "source")

  /** TextRank keyword extraction: two damped PageRank iterations on the
    * word co-occurrence graph (tokens within distance ≤ 2 in a document,
    * edge weight = co-occurrence count). Ranks live on an e12 integer
    * lattice and every neighbor contribution is floor division — the
    * same deterministic-integer recursion as q_pagerank, but on a graph
    * built FROM TEXT, which is what turns a centrality kernel into a
    * keyword extractor. Top-10 words by final rank.
    */
  def q_textrank_keywords(spark: SparkSession, sf: String): DataFrame = {
    // rep collapse (round 8): the co-occurrence graph needs no doc ids —
    // identical texts contribute m identical copies of their pair
    // multiset, so the positional self-join runs once per distinct text
    // and every pair carries the group size. The self-JOIN key is
    // (md5, length) rather than md5 alone (round-9 advice): here a hash
    // collision would cross-join two distinct texts' position streams and
    // corrupt edge weights (unlike the window-grouping uses of md5, where
    // a collision merely merges dup groups), so the key carries the
    // length as a second independent discriminant instead of shuffling
    // the full text value with every token row.
    val toks = Tables.documents(spark, sf)
      .groupBy(col("text")).agg(count(lit(1)).as("m"))
      .select(md5(col("text").cast("binary")).as("gid"),
        length(col("text")).as("glen"), col("m"),
        posexplode(split(col("text"), " ")))
      .select(col("gid"), col("glen"), col("m"), col("pos"), col("col").as("w"))
    val e0 = toks.as("a")
      .join(toks.as("b"),
        col("a.gid") === col("b.gid") && col("a.glen") === col("b.glen") &&
          col("b.pos") > col("a.pos") && col("b.pos") <= col("a.pos") + 2 &&
          col("a.w") =!= col("b.w"))
      .groupBy(col("a.w").as("u"), col("b.w").as("v"))
      .agg(sum(col("a.m")).as("c"))
    val edges = e0.select(col("u"), col("v"), col("c"))
      .unionByName(e0.select(col("v").as("u"), col("u").as("v"), col("c")))
      .groupBy(col("u"), col("v")).agg(sum(col("c")).as("c"))
      .localCheckpoint()
    val wTot = edges.groupBy(col("u")).agg(sum(col("c")).as("wu"))
    val nodes = wTot.select(col("u").as("w"), col("wu"))
    def step(r: DataFrame): DataFrame = {
      val contrib = r.join(nodes.select(col("w"), col("wu")), "w")
        .join(edges.select(col("u").as("w"), col("v"), col("c")), "w")
        .select(col("v"), expr("(rank * c) div wu").as("t"))
        .groupBy(col("v")).agg(sum(col("t")).as("tin"))
      nodes.select(col("w"))
        .join(contrib.select(col("v").as("w"), col("tin")), Seq("w"), "left_outer")
        .select(col("w"),
          (lit(150000000000L) + expr("(850 * coalesce(tin, CAST(0 AS BIGINT))) div 1000")).as("rank"))
        .localCheckpoint()
    }
    val r0 = nodes.select(col("w"), lit(1000000000000L).as("rank"))
    val r2 = step(step(r0))
    r2.select(col("w"), col("rank").as("score"))
      .orderBy(col("score").desc, col("w").asc).limit(10)
  }

  /** Content-defined chunking audit: each document's token stream is cut
    * after any token whose hash ≡ 0 (mod 32) — the rolling-boundary rule
    * dedup storage systems use so an insertion only reshuffles its own
    * chunk. Reports the chunk-length histogram (8-token bands) and mean
    * length — the distribution a CDC tuner reads before picking the
    * modulus. Chunk ids are a per-doc running boundary count (doc-keyed
    * window), lengths one aggregate.
    */
  def q_cdc_chunks(spark: SparkSession, sf: String): DataFrame = {
    import graft.core.Det.hash32
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
      .withColumn("boundary", when(hash32(col("w")) % 32 === 0, 1L).otherwise(0L))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = toks
      .withColumn("chunk", coalesce(sum(col("boundary")).over(w), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).as("len"))
    val tot = chunks.agg(count(lit(1)).as("n_chunks"), sum(col("len")).as("n_tokens"))
    chunks.groupBy(expr("len div 8").as("len_band"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("len_band"), col("n"), col("n_chunks"),
        expr("n_tokens * 10000 div n_chunks").as("mean_len_e4"))
      .orderBy("len_band")
  }

  /** RAKE keyphrase extraction: candidate phrases are maximal runs of
    * non-stopword tokens (stopwords 'a'/'the' delimit — the same
    * boundary-cumsum shape as CDC chunking but scored, not sized), each
    * word scores degree/frequency over the candidate set, a phrase
    * scores the sum of its words. Degree and frequency are exact
    * integers; the only float is the final ratio sum. Top 10 phrases of
    * 2-4 words.
    */
  def q_rake_keyphrases(spark: SparkSession, sf: String): DataFrame = {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
      .withColumn("stop", when(col("w").isin("a", "the"), 1L).otherwise(0L))
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val phrases = toks
      .withColumn("grp", sum(col("stop")).over(wRun))
      .filter(col("stop") === 0)
      .groupBy(col("doc_id"), col("grp"))
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("pos"), col("w"))))
        .getField("w")).as("phrase"), count(lit(1)).as("plen"))
      .filter(col("plen").between(2, 4))
      .localCheckpoint()
    val words = phrases
      .select(col("plen"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    // score each DISTINCT phrase once; word scores floor onto an e6
    // integer lattice so the phrase sum is exact
    val scored = phrases.select(col("phrase")).distinct()
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("w"))
      .join(words, "w")
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("deg * 1000000 div freq")).as("score_e6"))
    val counts = phrases.groupBy(col("phrase")).agg(count(lit(1)).as("n_occurrences"))
    scored.join(counts, "phrase")
      .select(col("phrase"), col("n_words"), col("n_occurrences"), col("score_e6"))
      .orderBy(col("score_e6").desc, col("phrase").asc)
      .limit(10)
  }

  /** Word2vec-style negative-sampling distribution: unigram counts
    * raised to the 3/4 power and normalized — the flattened noise
    * distribution embedding training draws negatives from — with the
    * expected draw count per 10k samples. Top 20 words; one aggregate +
    * one epilogue per word.
    */
  def q_negative_sampling(spark: SparkSession, sf: String): DataFrame = {
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(expr("pow(CAST(c AS DOUBLE), 0.75)")).as("z"))
    freq.crossJoin(broadcast(tot))
      .select(col("w"), col("c"),
        (round(expr("pow(CAST(c AS DOUBLE), 0.75) / z"), 6) + lit(0.0)).as("p_neg"),
        (round(expr("10000.0 * pow(CAST(c AS DOUBLE), 0.75) / z"), 2) + lit(0.0))
          .as("draws_per_10k"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(20)
  }

  /** Training-minibatch composition audit: documents hash into 16
    * batches; per batch the language KL divergence from the corpus
    * distribution — skewed batches destabilize training, and this is the
    * check that catches a bad shard key before a run burns GPU-days.
    * Counts exact; the 5-term KL is the only float.
    */
  def q_minibatch_balance(spark: SparkSession, sf: String): DataFrame = {
    import graft.core.Det.hash32
    val d = Tables.documents(spark, sf)
      .select((hash32(col("doc_id")) % 16).as("batch"), col("lang"))
    val global = d.groupBy(col("lang")).agg(count(lit(1)).as("gc"))
    val gtot = global.agg(sum(col("gc")).as("gn"))
    val per = d.groupBy(col("batch"), col("lang")).agg(count(lit(1)).as("bc"))
    val btot = per.groupBy(col("batch")).agg(sum(col("bc")).as("bn"))
    per.join(btot, "batch").join(broadcast(global), "lang").crossJoin(broadcast(gtot))
      .select(col("batch"), col("bn"),
        expr("""(CAST(bc AS DOUBLE) / CAST(bn AS DOUBLE))
                * ln((CAST(bc AS DOUBLE) / CAST(bn AS DOUBLE))
                     / (CAST(gc AS DOUBLE) / CAST(gn AS DOUBLE)))""").as("term"))
      .groupBy(col("batch"))
      .agg(max(col("bn")).as("n_docs"),
        (round(sum(col("term")), 6) + lit(0.0)).as("kl_vs_corpus"))
      .orderBy("batch")
  }

  /** Golden-record (survivorship) selection over near-duplicate groups:
    * documents sharing a bag-of-words fingerprint form a duplicate
    * group; the survivor is picked by the MDM rule chain longest text →
    * lowest id, and the report shows per-(lang of survivor) group
    * counts, members absorbed, and whether any group mixed languages or
    * sources — the merge-provenance audit record linkage systems emit.
    */
  def q_golden_record(spark: SparkSession, sf: String): DataFrame = {
    val fp = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(concat_ws(" ", array_sort(split(col("text"), " "))).cast("binary")).as("bow_fp"))
    val w = Window.partitionBy(col("bow_fp"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val marked = fp.withColumn("rn", row_number().over(w))
    val groups = marked.groupBy(col("bow_fp"))
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
    marked.filter(col("rn") === 1)
      .join(groups, "bow_fp")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_golden"),
        sum(col("n_members") - 1L).as("n_absorbed"),
        sum(when(col("n_langs") > 1L, 1L).otherwise(0L)).as("n_mixed_lang_groups"),
        sum(when(col("n_sources") > 1L, 1L).otherwise(0L)).as("n_mixed_source_groups"))
      .orderBy("lang")
  }

  /** B-cubed evaluation of the bag-of-words near-dup clustering against
    * exact-text duplicate truth: per-document precision |pred∩true|/
    * |pred| and recall |pred∩true|/|true|, each floored onto an e6
    * lattice before the exact integer mean — the clustering-quality
    * metric that, unlike pair-F1, doesn't let one giant cluster dominate.
    */
  def q_bcubed_eval(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("tfp"),
        md5(concat_ws(" ", array_sort(split(col("text"), " "))).cast("binary")).as("pfp"))
      .localCheckpoint()
    val predSz = d.groupBy(col("pfp")).agg(count(lit(1)).as("np"))
    val trueSz = d.groupBy(col("tfp")).agg(count(lit(1)).as("nt"))
    val bothSz = d.groupBy(col("pfp"), col("tfp")).agg(count(lit(1)).as("ni"))
    d.join(predSz, "pfp").join(trueSz, "tfp").join(bothSz, Seq("pfp", "tfp"))
      .select(expr("ni * 1000000 div np").as("p_e6"),
        expr("ni * 1000000 div nt").as("r_e6"))
      .agg(count(lit(1)).as("n_docs"), sum(col("p_e6")).as("sp"), sum(col("r_e6")).as("sr"))
      .select(col("n_docs"),
        expr("sp div n_docs").as("bcubed_precision_e6"),
        expr("sr div n_docs").as("bcubed_recall_e6"))
  }

  /** Leave-one-source-out data valuation: the corpus chars-per-token
    * metric recomputed without each source — sources whose removal
    * RAISES quality are negative-value data, the cheapest version of the
    * question data-valuation methods answer. LOO deltas are exact
    * integer subtractions from one full pass, not 20 recomputations.
    */
  def q_source_valuation(spark: SparkSession, sf: String): DataFrame = {
    val per = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("nd"), sum(col("n_chars")).as("cs"),
        sum(size(split(col("text"), " ")).cast("long")).as("ts"))
    val tot = per.agg(sum(col("nd")).as("nd_t"), sum(col("cs")).as("cs_t"),
      sum(col("ts")).as("ts_t"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("nd").as("n_docs"),
        expr("cs_t * 10000 div ts_t").as("full_cpt_e4"),
        expr("(cs_t - cs) * 10000 div (ts_t - ts)").as("loo_cpt_e4"))
      .select(col("source"), col("n_docs"), col("full_cpt_e4"), col("loo_cpt_e4"),
        (col("loo_cpt_e4") - col("full_cpt_e4")).as("removal_delta_e4"))
      .orderBy("source")
  }

  /** N-gram novelty in corpus order (streaming-dedup's scoring view: how
    * much of each shard is new text vs. re-tread): a bigram is "novel"
    * in the first doc_id where it appears; per language — docs, distinct
    * doc-bigrams, novel bigrams, novelty rate e4. Two vocabulary-keyed
    * aggregates over the shared [[docBigrams]] explode; the corpus is
    * tokenized once and never self-joined.
    */
  def q_corpus_novelty(spark: SparkSession, sf: String): DataFrame = {
    // rep collapse (round 8): identical texts carry identical bigram
    // sets, so the distinct-bigram stream is built once per group; a
    // bigram's first_doc = the min group-rep containing it (reps ARE
    // group minima, and a member's bigrams are all its rep's, so only
    // the OWNING rep can score a novel bigram — every non-rep member
    // scores nv = 0 and nb equal to its rep's)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("rep", min(col("doc_id")).over(
        Window.partitionBy(md5(col("text").cast("binary")))))
      .localCheckpoint()
    val nb = docBigramsOf(docs.filter(col("doc_id") === col("rep")))
      .select(col("doc_id"), col("w1"), col("w2")).distinct()
    val first = nb.groupBy(col("w1"), col("w2"))
      .agg(min(col("doc_id")).as("first_doc"))
    val perRep = nb.join(first, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("nv"))
      .withColumnRenamed("doc_id", "rep")
    docs.select(col("doc_id"), col("lang"), col("rep"))
      .join(perRep, "rep")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nb")).as("doc_bigrams"),
        sum(when(col("doc_id") === col("rep"), col("nv")).otherwise(0L))
          .as("novel_bigrams"))
      .select(col("lang"), col("n_docs"), col("doc_bigrams"), col("novel_bigrams"),
        expr("novel_bigrams * 10000 div doc_bigrams").as("novelty_e4"))
      .orderBy("lang")
  }

  /** Winnowing document fingerprints (Schleimer-Wilkerson-Aiken, the
    * MOSS algorithm — THE bounded-size local fingerprint for plagiarism
    * / near-dup detection at scale): hash every token 3-gram
    * ([[graft.core.Det.hash32]]), slide a window of 4 hashes, keep each
    * window's minimum, dedup — guaranteeing any shared run of ≥ 6 tokens
    * yields a shared fingerprint while storing ~2/(w+1) of the hashes.
    * Everything up to the fingerprint set is generated INSIDE the row
    * (sequence/transform/slice/array_min — zero pre-aggregate shuffles);
    * candidate pairs then come from a fingerprint-keyed join blocked by
    * (lang, source), never corpus×corpus. Output per block: docs
    * fingerprinted, stored fingerprints, candidate pairs sharing ≥ 2.
    */
  def q_winnowing_fingerprint(spark: SparkSession, sf: String): DataFrame =
    winnowingFingerprintOf(Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text")))

  /** The rep-collapsed core over a (doc_id, lang, source, text) frame —
    * exposed to Round9OpsSpec's verbatim twin. Identical texts have
    * identical fingerprint SETS, so the fingerprint-keyed candidate join
    * (the sf3 bench's biggest remaining linear constant — every fp's doc
    * list, and with it the pair rows, grows with duplication²) runs once
    * per distinct text: a rep pair sharing ≥ 2 fingerprints stands for
    * m_P·m_Q candidate member pairs, a group with ≥ 2 fingerprints and
    * m ≥ 2 adds C(m,2) identical-text pairs, and doc/fingerprint totals
    * re-enter by multiplicity arithmetic.
    */
  private[graft] def winnowingFingerprintOf(docsSrc: DataFrame): DataFrame = {
    val groups = docsSrc.groupBy(col("lang"), col("source"), col("text"))
      .agg(count(lit(1)).as("m"), min(col("doc_id")).as("gid"))
      .select(col("lang"), col("source"), col("m"), col("gid"),
        toks(col("text")).as("t"))
      .filter(size(col("t")) >= 6) // k + w - 1 tokens for one full window
    val fps = groups
      .select(col("gid"), col("m"), col("lang"), col("source"), expr(
        """transform(sequence(1, size(t) - 2),
             i -> cast(conv(substring(md5(cast(concat_ws(' ', t[i-1], t[i], t[i+1])
                  as binary)), 1, 8), 16, 10) as bigint))""").as("hs"))
      .select(col("gid"), col("m"), col("lang"), col("source"), explode(expr(
        "array_distinct(transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4))))"))
        .as("fp"))
      .localCheckpoint() // feeds per-rep totals + both legs of the pair join
    val perRep = fps.groupBy(col("lang"), col("source"), col("gid"), col("m"))
      .agg(count(lit(1)).as("nfp"))
    val cross = fps.as("a")
      .join(fps.select(col("lang").as("l2"), col("source").as("s2"),
        col("gid").as("g2"), col("m").as("m2"), col("fp").as("fp2")).as("b"),
        col("lang") === col("l2") && col("source") === col("s2") &&
          col("fp") === col("fp2") && col("gid") < col("g2"))
      .groupBy(col("lang"), col("source"), col("gid"), col("g2"),
        col("m"), col("m2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("m") * col("m2")).as("cross_pairs"))
    val within = perRep.filter(col("nfp") >= 2L && col("m") >= 2L)
      .groupBy(col("lang"), col("source"))
      .agg(sum(expr("m * (m - 1) div 2")).as("within_pairs"))
    perRep.groupBy(col("lang"), col("source"))
      .agg(sum(col("m")).as("n_docs"), sum(col("m") * col("nfp")).as("n_fingerprints"))
      .join(cross, Seq("lang", "source"), "left_outer")
      .join(within, Seq("lang", "source"), "left_outer")
      .select(col("lang"), col("source"), col("n_docs"), col("n_fingerprints"),
        (coalesce(col("cross_pairs"), lit(0L)) + coalesce(col("within_pairs"), lit(0L)))
          .as("candidate_pairs"))
      .orderBy("lang", "source")
  }

  /** Per-doc unigram and bigram multiset counts plus token length — the
    * shared core of the ROUGE/BLEU pair metrics below. Bigrams are
    * in-array (no pre-explode join); multiset semantics (repeats
    * counted) match the reference implementations of both metrics.
    */
  private def gramCountsOf(d: DataFrame, n: Int): DataFrame = {
    val base = d
      .select(col("doc_id"), col("lang"), col("source"), toks(col("text")).as("tk"))
    val grams =
      if (n == 1) base.select(col("doc_id"), col("lang"), col("source"),
        explode(col("tk")).as("g"))
      else base.select(col("doc_id"), col("lang"), col("source"),
        explode(expr("transform(sequence(1, size(tk) - 1), " +
          "i -> concat(tk[i - 1], ' ', tk[i]))")).as("g"))
    grams.groupBy(col("doc_id"), col("lang"), col("source"), col("g"))
      .agg(count(lit(1)).as("c"))
  }

  /** Shared rep-collapsed pair statistics for the intra-shard pair
    * metrics (ROUGE/BLEU; round 9 — the full sf3 bench caught both
    * growing with duplication²: duplicated docs inflate the shard pair
    * join AND the per-gram overlap join quadratically). Docs group by
    * (lang, source, text); gram overlaps run once per DISTINCT text
    * pair; and because the metrics are orientation-sensitive (the
    * lower-doc-id member is the reference), the member multiplicity of
    * each ORDERED rep pair is recovered exactly as an inversion count
    * cnt(P→Q) = #{(p∈P, q∈Q) : p.doc_id < q.doc_id}, the member pairs
    * in which P supplies the reference.
    *
    * Round 10: the inversion stream is built only for DUP groups
    * (m ≥ 2) as the reference side — round 9 probed every (member,
    * other-group) pair, an O(N·G) window stream that at sf0.1 (duplicate
    * density ~1, G ≈ N) was a full N² sort per shard and took
    * q_rouge_recall from 0.4 s to ~7 s. Three exact identities make the
    * restriction lossless (doc ids are unique, so there are no ties):
    *  - singleton×singleton: the two members ARE the gids, so
    *    cnt(P→Q) = 1 iff gid_P < gid_Q — free on the pair base;
    *  - complement: cnt(P→Q) + cnt(Q→P) = m_P·m_Q, so one orientation
    *    per pair suffices;
    *  - any pair touching a dup group D gets its D-as-reference count
    *    from D's stream partition, and the other orientation from the
    *    complement.
    * Stream size drops from N·G to N·G_dup + N_dup; with everything
    * duplicated (the replicated sf1/sf3 fixtures) G_dup = G and the
    * round-9 shape — linear in duplication — is unchanged.
    *
    * Returns one row per ordered cross rep pair — (lang, source,
    * len = reference-side tokens, len2 = candidate-side tokens, ov1,
    * ov2, mult = the ordered member-pair count) — plus one row per
    * duplicate group (identical texts: ov1 = len, ov2 = len−1 when
    * len ≥ 2 else null — a 1-token doc's bigram stream joins nothing,
    * exactly like the uncollapsed gram join — mult = C(m,2)).
    * Consumers apply their verbatim per-pair metric expression and
    * weight by mult, reproducing the uncollapsed sums bit-identically
    * (Round9OpsSpec pins both consumers against their verbatim
    * pipelines on an orientation-adversarial planted corpus).
    */
  private def shardPairStatsOf(docsSrc: DataFrame): DataFrame = {
    // one window pass assigns every doc its group id + size — round 10
    // replaced the groupBy + re-join-on-text pair (two shuffles, one of
    // them keyed by the full text string) with the single shuffle
    // withRepOf-style window; one localCheckpoint feeds members, groups
    // and (when dups exist) the probe stream. Size contract: the
    // checkpointed table is the input corpus projected to (ids, shard
    // keys, text) — the same order of magnitude as the parquet input
    // split across executors, never a pair-shaped blow-up.
    val wg = Window.partitionBy(col("lang"), col("source"), col("text"))
    val d = docsSrc.select(col("doc_id"), col("lang"), col("source"), col("text"))
      .withColumn("gid", min(col("doc_id")).over(wg))
      .withColumn("m", count(lit(1)).over(wg))
      .localCheckpoint()
    val groups = d.filter(col("doc_id") === col("gid"))
      .select(col("lang"), col("source"), col("text"), col("gid"), col("m"),
        size(toks(col("text"))).cast("long").as("len"))
    // data-adaptive fast path (one cheap scan of the checkpointed d,
    // same discipline as BandedScan.cumSumsAuto): with NO duplicate
    // texts anywhere, every group is its own single member, the within
    // leg is empty, and every forward orientation has mult exactly 1 —
    // the whole inversion/complement machinery below would compute a
    // constant. The graded sf0.1 fixture is exactly this corpus.
    val anyDup = !d.filter(col("m") >= 2L).isEmpty
    val repDocs = groups.select(col("gid").as("doc_id"), col("lang"),
      col("source"), col("text"))
    def overlap(n: Int, out: String): DataFrame = {
      val g = gramCountsOf(repDocs, n)
      g.as("a")
        .join(g.select(col("lang"), col("source"), col("doc_id").as("d2"),
          col("g"), col("c").as("c2")).as("b"),
          Seq("lang", "source", "g"))
        .filter(col("doc_id") < col("d2"))
        .groupBy(col("lang"), col("source"), col("doc_id"), col("d2"))
        .agg(sum(least(col("c"), col("c2"))).as(out))
    }
    val pairBase = groups.select(col("lang"), col("source"),
        col("gid").as("doc_id"), col("len").as("l1"), col("m").as("m1"))
      .join(groups.select(col("lang"), col("source"), col("gid").as("d2"),
        col("len").as("l2"), col("m").as("m2")), Seq("lang", "source"))
      .filter(col("doc_id") < col("d2"))
      .join(overlap(1, "ov1"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .join(overlap(2, "ov2"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
    if (!anyDup) return pairBase
      .select(col("lang"), col("source"), col("l1").as("len"),
        col("l2").as("len2"), col("ov1"), col("ov2"), lit(1L).as("mult"))
    val members = d.select(col("lang"), col("source"), col("gid"), col("doc_id"))
    val dupGids = groups.filter(col("m") >= 2L)
      .select(col("lang"), col("source"), col("gid"))
    val probes = members
      .join(dupGids.select(col("lang"), col("source"), col("gid").as("tg")),
        Seq("lang", "source"))
      .filter(col("tg") =!= col("gid"))
      .select(col("lang"), col("source"), col("tg"), col("doc_id").as("id"),
        lit(0L).as("is_member"), col("gid").as("own"))
    val stream = members
      .join(dupGids, Seq("lang", "source", "gid"))
      .select(col("lang"), col("source"), col("gid").as("tg"),
        col("doc_id").as("id"), lit(1L).as("is_member"),
        lit(null).cast("long").as("own"))
      .unionByName(probes)
    val wRun = Window.partitionBy("lang", "source", "tg").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ot = stream.withColumn("prior", sum(col("is_member")).over(wRun))
      .filter(col("is_member") === 0L)
      .groupBy(col("lang"), col("source"), col("tg").as("gref"),
        col("own").as("gcand"))
      .agg(sum(col("prior")).as("cnt"))
    // the pair base carries both group sizes; the forward orientation
    // (lower gid = reference) resolves its member-pair count as:
    // singleton×singleton → exactly 1 (the members are the gids and
    // doc_id < d2 here); m1 ≥ 2 → cnt(P→Q) from P's stream partition;
    // else (m1 = 1, m2 ≥ 2) → complement of cnt(Q→P) from Q's
    // partition. The reverse orientation is always the complement.
    val base = pairBase
      .join(ot.select(col("lang"), col("source"), col("gref").as("doc_id"),
        col("gcand").as("d2"), col("cnt").as("cnt_fwd")),
        Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .join(ot.select(col("lang"), col("source"), col("gcand").as("doc_id"),
        col("gref").as("d2"), col("cnt").as("cnt_rev")),
        Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .withColumn("mult_fwd",
        when(col("m1") === 1L && col("m2") === 1L, lit(1L))
          .when(col("cnt_fwd").isNotNull, col("cnt_fwd"))
          .otherwise(col("m1") * col("m2") - col("cnt_rev")))
      .withColumn("mult_rev", col("m1") * col("m2") - col("mult_fwd"))
    val ordered = base.select(col("lang"), col("source"), explode(array(
        struct(col("l1").as("len"), col("l2").as("len2"),
          col("ov1"), col("ov2"), col("mult_fwd").as("mult")),
        struct(col("l2").as("len"), col("l1").as("len2"),
          col("ov1"), col("ov2"), col("mult_rev").as("mult"))))
        .as("p"))
      .select(col("lang"), col("source"), col("p.len").as("len"),
        col("p.len2").as("len2"), col("p.ov1").as("ov1"),
        col("p.ov2").as("ov2"), col("p.mult").as("mult"))
    val within = groups.filter(col("m") >= 2L)
      .select(col("lang"), col("source"), col("len"), col("len").as("len2"),
        col("len").as("ov1"),
        when(col("len") >= 2L, col("len") - 1L).otherwise(lit(null).cast("long"))
          .as("ov2"),
        expr("m * (m - 1) div 2").as("mult"))
    ordered.unionByName(within)
  }

  /** ROUGE-1/ROUGE-2 recall between every doc pair inside a (lang,
    * source) shard (lower doc_id = reference): clipped multiset n-gram
    * overlap Σ min(c_ref, c_cand) over the reference's gram total — the
    * summarization-QA overlap metric, here as the intra-shard
    * redundancy screen. Pair products are shard-bounded (≤|shard|² per
    * block, never corpus²); per-pair recalls are e6-latticed before the
    * shard mean.
    */
  def q_rouge_recall(spark: SparkSession, sf: String): DataFrame =
    rougeRecallOf(Tables.documents(spark, sf))

  /** The rep-collapsed core over a (doc_id, lang, source, text) frame —
    * exposed to Round9OpsSpec's verbatim-pair-join twin. Per-pair metric
    * expressions are verbatim round-8; [[shardPairStatsOf]] supplies the
    * (len, len2, ov1, ov2) of each orientation and the exact member
    * multiplicity, so the weighted sums equal the uncollapsed ones. */
  private[graft] def rougeRecallOf(docsSrc: DataFrame): DataFrame =
    shardPairStatsOf(docsSrc)
      .select(col("lang"), col("source"), col("mult"),
        round(coalesce(col("ov1"), lit(0L)).cast("double") /
          col("len").cast("double") * lit(1e6)).cast("long").as("r1_e6"),
        round(coalesce(col("ov2"), lit(0L)).cast("double") /
          (col("len") - 1L).cast("double") * lit(1e6)).cast("long").as("r2_e6"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("mult")).as("n_pairs"),
        (round(sum(col("r1_e6") * col("mult")).cast("double") /
          (sum(col("mult")).cast("double") * lit(1e6)), 4) + lit(0.0))
          .as("mean_rouge1"),
        (round(sum(col("r2_e6") * col("mult")).cast("double") /
          (sum(col("mult")).cast("double") * lit(1e6)), 4) + lit(0.0))
          .as("mean_rouge2"))
      .orderBy("lang", "source")

  /** BLEU-2 between every doc pair inside a (lang, source) shard (lower
    * doc_id = reference, higher = candidate, documented): modified
    * n-gram precisions p₁, p₂ (clipped multiset overlap over the
    * CANDIDATE totals), brevity penalty exp(1−r/c) when the candidate
    * is shorter, BLEU = BP·√(p₁p₂); zero overlap at either order ⇒ 0
    * (no ln of 0). Same shard-bounded pair shape as [[q_rouge_recall]];
    * per-pair BLEU e6-latticed before the shard mean.
    */
  def q_bleu_pairs(spark: SparkSession, sf: String): DataFrame =
    bleuPairsOf(Tables.documents(spark, sf))

  /** The rep-collapsed core over a (doc_id, lang, source, text) frame —
    * exposed to Round9OpsSpec's verbatim-pair-join twin; see
    * [[rougeRecallOf]]. */
  private[graft] def bleuPairsOf(docsSrc: DataFrame): DataFrame = {
    val bp = when(col("len2") >= col("len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("len").cast("double") / col("len2").cast("double")))
    val p1 = col("ov1").cast("double") / col("len2").cast("double")
    val p2 = col("ov2").cast("double") / (col("len2") - 1L).cast("double")
    shardPairStatsOf(docsSrc)
      .select(col("lang"), col("source"), col("mult"),
        when(coalesce(col("ov1"), lit(0L)) === 0L ||
          coalesce(col("ov2"), lit(0L)) === 0L, lit(0L))
          .otherwise(round(bp * sqrt(p1 * p2) * lit(1e6)).cast("long"))
          .as("bleu_e6"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("mult")).as("n_pairs"),
        (round(sum(col("bleu_e6") * col("mult")).cast("double") /
          (sum(col("mult")).cast("double") * lit(1e6)), 4) + lit(0.0))
          .as("mean_bleu2"))
      .orderBy("lang", "source")
  }

  /** Heaps' law fit V = K·Nᵝ over the 10-bucket vocabulary growth curve
    * ([[q_vocab_growth]]'s buckets, cumulated): log-log OLS on
    * e6-latticed ln N / ln V points, closed-form slope β and intercept
    * K = exp(lnK). β ≈ 0.4–0.6 is the natural-text signature a corpus
    * screen expects; flat or unit slopes flag template or random text.
    * Cumulatives via a ≤10×10 broadcast theta join — nothing scales
    * with the corpus.
    */
  def q_heaps_law_fit(spark: SparkSession, sf: String): DataFrame = {
    val docs = Tables.documents(spark, sf)
    val maxid = docs.agg(max(col("doc_id")).as("maxid"))
    val tok = docs.crossJoin(broadcast(maxid))
      .select(expr("(doc_id * 10) div (maxid + 1)").as("bucket"),
        explode(toks(col("text"))).as("word"))
    val perBucket = tok.groupBy(col("bucket")).agg(count(lit(1)).as("n_tokens"))
    val newTypes = tok.groupBy(col("word")).agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val growth = perBucket.join(newTypes, Seq("bucket"), "left_outer")
      .select(col("bucket"), col("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .localCheckpoint()
    val cum = growth.as("a")
      .join(growth.select(col("bucket").as("b2"), col("n_tokens").as("nt2"),
        col("new_types").as("v2")).as("b"), col("b2") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("nt2")).as("cum_n"), sum(col("v2")).as("cum_v"))
    val pts = cum.select(
      round(log(col("cum_n").cast("double")) * lit(1e6)).cast("long").as("x"),
      round(log(col("cum_v").cast("double")) * lit(1e6)).cast("long").as("y"))
    val s = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nD = col("n").cast("double")
    val beta = (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    s.select(col("n").as("n_points"),
      (round(beta, 4) + lit(0.0)).as("beta"),
      (round(exp((col("sy").cast("double") - beta * col("sx").cast("double")) /
        (nD * lit(1e6))), 4) + lit(0.0)).as("k"))
  }

  /** Structural (template) dedup: the fingerprint is the md5 of the
    * TOKEN-LENGTH sequence — two docs share it iff they have identical
    * layout skeletons regardless of wording, the boilerplate/template
    * detector that catches machine-generated families exact-hash dedup
    * misses. One in-array transform (no explode), one fingerprint
    * group-by — a single shuffle at any corpus size.
    */
  def q_structure_dedup(spark: SparkSession, sf: String): DataFrame = {
    val fp = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        md5(expr("CAST(array_join(transform(split(lower(text), ' '), " +
          "t -> CAST(length(t) AS STRING)), ',') AS BINARY)")).as("fp"))
    val groups = fp.groupBy(col("lang"), col("fp")).agg(count(lit(1)).as("gsz"))
    groups.groupBy(col("lang"))
      .agg(sum(col("gsz")).as("n_docs"), count(lit(1)).as("n_templates"),
        sum(when(col("gsz") > 1L, col("gsz")).otherwise(0L)).as("n_dup_docs"),
        max(col("gsz")).as("max_group"))
      .orderBy("lang")
  }

  /** Chunk-level duplication (RefinedWeb-style): split every doc into
    * non-overlapping 8-token chunks, a chunk is DUPLICATED if its exact
    * text occurs in ≥2 distinct docs corpus-wide; report per language
    * the duplicated-chunk share. Chunks are generated in-array, the
    * dup decision is one chunk-keyed distinct-doc aggregate (a single
    * shuffle on the chunk hash — the only shape that survives 100 TB),
    * and the share is an exact integer ratio.
    */
  def q_chunk_dedup(spark: SparkSession, sf: String): DataFrame = {
    val chunks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"),
        explode(expr("transform(sequence(0, (size(tk) div 8) - 1), " +
          "i -> array_join(slice(tk, i * 8 + 1, 8), ' '))")).as("chunk"))
      .localCheckpoint()
    val dup = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .select(col("chunk"), (col("ndocs") > 1L).as("is_dup"))
    chunks.join(dup, Seq("chunk"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("lang"), col("n_docs"), col("n_chunks"), col("n_dup_chunks"),
        (round(col("n_dup_chunks").cast("double") /
          col("n_chunks").cast("double"), 4) + lit(0.0)).as("dup_frac"))
      .orderBy("lang")
  }

  /** Gopher-style document quality battery: the four repetition/shape
    * rules that survive this corpus's alphabet (no punctuation, so the
    * symbol/bullet/ellipsis rules are vacuous here and documented as
    * such) — word count ≥ 30, mean word length in [3, 10], top-word
    * dominance ≤ 15%, ≥ 1 stopword hit. Every rule is an EXACT integer
    * comparison (chars ≥ 3·words, maxcnt·100 ≤ 15·words — no float
    * thresholds), so pass flags hash-match the oracle bit-for-bit.
    * One explode + doc-keyed aggregate + lang rollup: two shuffles total.
    */
  def q_gopher_quality(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"), size(col("tk")).cast("long").as("nw"),
        expr("CAST(aggregate(tk, 0L, (a, t) -> a + length(t)) AS BIGINT)").as("nc"),
        expr("CAST(aggregate(tk, 0L, (a, t) -> a + CASE WHEN t IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT)").as("stop_hits"),
        explode(col("tk")).as("w"))
      .groupBy(col("doc_id"), col("lang"), col("nw"), col("nc"), col("stop_hits"), col("w"))
      .agg(count(lit(1)).as("wc"))
      .groupBy(col("doc_id"), col("lang"), col("nw"), col("nc"), col("stop_hits"))
      .agg(max(col("wc")).as("maxw"))
    val flags = d.select(col("lang"),
      (col("nw") >= 30L).as("len_ok"),
      (col("nc") >= col("nw") * 3L && col("nc") <= col("nw") * 10L).as("mwl_ok"),
      (col("maxw") * 100L <= col("nw") * 15L).as("rep_ok"),
      (col("stop_hits") >= 1L).as("stop_ok"))
    flags.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("len_ok"), 1L).otherwise(0L)).as("n_len_ok"),
        sum(when(col("mwl_ok"), 1L).otherwise(0L)).as("n_mwl_ok"),
        sum(when(col("rep_ok"), 1L).otherwise(0L)).as("n_rep_ok"),
        sum(when(col("stop_ok"), 1L).otherwise(0L)).as("n_stop_ok"),
        sum(when(col("len_ok") && col("mwl_ok") && col("rep_ok")
          && col("stop_ok"), 1L).otherwise(0L)).as("n_pass"))
      .select(col("lang"), col("n_docs"), col("n_len_ok"), col("n_mwl_ok"),
        col("n_rep_ok"), col("n_stop_ok"), col("n_pass"),
        (round(col("n_pass").cast("double") / col("n_docs").cast("double"), 4)
          + lit(0.0)).as("pass_rate"))
      .orderBy("lang")
  }

  /** Type-token-ratio diversity filter: per-doc TTR = |vocab|/|tokens|
    * (in-array distinct — no explode, zero pre-agg shuffles), low-diversity
    * flag TTR < 0.40 decided by the EXACT integer rule 10·distinct < 4·n.
    * Per source: docs, flagged docs, and the mean e6-latticed TTR — the
    * per-source knob a corpus-QA dashboard tracks.
    */
  def q_ttr_filter(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
      .select(col("source"), toks(col("text")).as("tk"))
      .select(col("source"), size(col("tk")).cast("long").as("nw"),
        expr("CAST(size(array_distinct(tk)) AS BIGINT)").as("nd"))
      .select(col("source"), col("nw"), col("nd"),
        (col("nd") * 10L < col("nw") * 4L).as("low_div"),
        round(col("nd").cast("double") / col("nw").cast("double") * lit(1e6))
          .cast("long").as("ttr_e6"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("low_div"), 1L).otherwise(0L)).as("n_low_div"),
        sum(col("ttr_e6")).as("s_ttr"))
      .select(col("source"), col("n_docs"), col("n_low_div"),
        (round(col("s_ttr").cast("double") /
          (col("n_docs").cast("double") * lit(1e6)), 4) + lit(0.0)).as("mean_ttr"))
      .orderBy("source")
  }

  /** RefinedWeb-style document REMOVAL by duplicated-chunk share: the
    * doc-level decision stage on top of [[q_chunk_dedup]]'s chunk stats —
    * a doc is dropped when ≥ 50% of its 8-token chunks are duplicated
    * corpus-wide (exact integer rule 2·dup ≥ n). Reports per lang the
    * retention and the chars saved — what a dedup stage actually buys.
    * Same single chunk-keyed shuffle as the chunk view; the doc verdict
    * is one more doc-keyed aggregate.
    */
  def q_dup_chunk_removal(spark: SparkSession, sf: String): DataFrame = {
    val chunks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        explode(expr("transform(sequence(0, (size(tk) div 8) - 1), " +
          "i -> array_join(slice(tk, i * 8 + 1, 8), ' '))")).as("chunk"))
      .localCheckpoint()
    val dup = chunks.groupBy(col("chunk"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .select(col("chunk"), (col("ndocs") > 1L).as("is_dup"))
    val docs = chunks.join(dup, Seq("chunk"))
      .groupBy(col("doc_id"), col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup"))
      .select(col("lang"), col("n_chars"),
        (col("n_dup") * 2L >= col("n_chunks")).as("drop"))
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(!col("drop"), col("n_chars")).otherwise(0L)).as("kept_chars"),
        sum(when(col("drop"), col("n_chars")).otherwise(0L)).as("dropped_chars"))
      .select(col("lang"), col("n_docs"), col("n_dropped"), col("kept_chars"),
        col("dropped_chars"),
        (round(lit(1.0) - col("n_dropped").cast("double") /
          col("n_docs").cast("double"), 4) + lit(0.0)).as("retention"))
      .orderBy("lang")
  }

  /** Gries' DP corpus-dispersion measure for the top-10 tokens:
    * DP = ½·Σ_parts |token share in part − part size share| with parts =
    * sources — is a frequent token evenly spread or burst-concentrated
    * in a few sources? The absolute differences stay EXACT integers
    * (|vᵢ·T − sᵢ·f|), normalized once by f·T; DP ∈ [0,1), higher =
    * clumpier. One explode + (token, part) aggregate + broadcast part
    * sizes — no sort beyond the top-10 head.
    */
  def q_gries_dp(spark: SparkSession, sf: String): DataFrame = {
    val tok = Tables.documents(spark, sf)
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .groupBy(col("w"), col("source")).agg(count(lit(1)).as("v"))
      .localCheckpoint()
    val parts = tok.groupBy(col("source")).agg(sum(col("v")).as("s"))
    val tot = parts.agg(sum(col("s")).as("t"))
    val f = tok.groupBy(col("w")).agg(sum(col("v")).as("f"))
    tok.join(broadcast(parts), "source").join(broadcast(f), "w")
      .crossJoin(broadcast(tot))
      .groupBy(col("w"), col("f"), col("t"))
      .agg(sum(abs(col("v") * col("t") - col("s") * col("f"))).as("num"),
        count(lit(1)).as("n_parts"))
      .select(col("w").as("token"), col("f").as("freq"), col("n_parts"),
        (round(col("num").cast("double")
          / (lit(2.0) * col("f").cast("double") * col("t").cast("double")), 4)
          + lit(0.0)).as("dp"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(10)
  }

  /** Dunning log-likelihood keyness of tokens, English subcorpus vs the
    * rest: LL = 2·[a·ln(a/e_a) + b·ln(b/e_b)] with expected counts from
    * the pooled model (the corpus-linguistics standard for "which words
    * define this subcorpus"); signed by over/under-representation.
    * Per-token one fixed IEEE tree from exact integer counts — no
    * cross-row float sums. Top-15 by |LL| e4 with word-asc ties.
    */
  def q_keyness_ll(spark: SparkSession, sf: String): DataFrame = {
    val tok = Tables.documents(spark, sf)
      .select((col("lang") === "en").as("inA"), explode(toks(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(sum(when(col("inA"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("inA"), 1L).otherwise(0L)).as("b"))
      .localCheckpoint()
    val tots = tok.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    val aD = col("a").cast("double")
    val bD = col("b").cast("double")
    val taD = col("ta").cast("double")
    val tbD = col("tb").cast("double")
    val ea = (aD + bD) * taD / (taD + tbD)
    val eb = (aD + bD) * tbD / (taD + tbD)
    val ll = lit(2.0) * (when(col("a") > 0L, aD * log(aD / ea)).otherwise(lit(0.0))
      + when(col("b") > 0L, bD * log(bD / eb)).otherwise(lit(0.0)))
    tok.crossJoin(broadcast(tots))
      .select(col("w").as("token"), col("a").as("n_en"), col("b").as("n_rest"),
        (round(ll, 4) + lit(0.0)).as("ll"),
        when(aD * tbD > bD * taD, lit("over")).otherwise(lit("under"))
          .as("direction"))
      .orderBy(abs(col("ll")).desc, col("token").asc)
      .limit(15)
  }

  /** Cohen's kappa agreement between two deterministic quality "raters"
    * on every document — rater A = length rule (≥ 30 tokens, the
    * [[q_gopher_quality]] gate), rater B = diversity rule (10·distinct ≥
    * 4·tokens, the [[q_ttr_filter]] gate). The 2×2 agreement table is
    * exact integer counts and κ = (n·agree − Σ margin products) /
    * (n² − Σ margin products) stays an exact rational until one final
    * division (decimal(38,0) — n² overflows BIGINT at corpus scale).
    * One scan + one 4-cell aggregate.
    */
  def q_cohen_kappa(spark: SparkSession, sf: String): DataFrame = {
    val r = Tables.documents(spark, sf)
      .select(size(toks(col("text"))).cast("long").as("nw"),
        expr("CAST(size(array_distinct(split(lower(text), ' '))) AS BIGINT)")
          .as("nd"))
      .select((col("nw") >= 30L).as("a"), (col("nd") * 10L >= col("nw") * 4L).as("b"))
    val c = r.agg(count(lit(1)).as("n"),
      sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
      sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
      sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
      sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
    val pe = (col("n11") + col("n10")).cast("decimal(38,0)") *
      (col("n11") + col("n01")).cast("decimal(38,0)") +
      (col("n01") + col("n00")).cast("decimal(38,0)") *
      (col("n10") + col("n00")).cast("decimal(38,0)")
    c.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      (round((col("n").cast("decimal(38,0)") * (col("n11") + col("n00")) - pe)
        .cast("double") /
        (col("n").cast("decimal(38,0)") * col("n") - pe).cast("double"), 6)
        + lit(0.0)).as("kappa"))
  }

  /** Tsallis entropy of the per-language token distribution at q = 2 and
    * q = 3: S_q = (1 − Σpᵢ^q)/(q−1) where Σpᵢ^q = Σcᵢ^q / T^q stays an
    * EXACT integer ratio (decimal(38,0) — token counts cubed overflow
    * BIGINT at corpus scale) until one final division per language.
    * S₂ is the Simpson-diversity complement, S₃ adds tail sensitivity;
    * one token aggregate per language, no float sums anywhere.
    */
  def q_tsallis_entropy(spark: SparkSession, sf: String): DataFrame = {
    val tok = Tables.documents(spark, sf)
      .select(col("lang"), explode(toks(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    tok.groupBy(col("lang"))
      .agg(sum(col("c")).as("t"), count(lit(1)).as("vocab"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"),
        sum(col("c").cast("decimal(38,0)") * col("c") * col("c")).as("s3"))
      .select(col("lang"), col("t").as("n_tokens"), col("vocab"),
        (round(lit(1.0) - col("s2").cast("double")
          / (col("t").cast("double") * col("t").cast("double")), 6)
          + lit(0.0)).as("tsallis_q2"),
        (round((lit(1.0) - col("s3").cast("double")
          / (col("t").cast("double") * col("t").cast("double")
            * col("t").cast("double"))) / lit(2.0), 6) + lit(0.0)).as("tsallis_q3"))
      .orderBy("lang")
  }

  /** Edit-distance near-dup candidates: Levenshtein over 40-char
    * prefixes, pairs blocked by (lang, n_chars div 8) so two docs are
    * compared only when language AND length band agree — the blocked
    * fuzzy-match stage of an entity-resolution pipeline, never corpus².
    * Per language: blocks, candidate pairs, near-dups (distance ≤ 5)
    * and the floor-mean distance — all exact integers (both engines'
    * levenshtein is the classic unit-cost DP).
    */
  def q_edit_distance_dedup(spark: SparkSession, sf: String): DataFrame = {
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        expr("n_chars div 8").as("blk"),
        substring(col("text"), 1, 40).as("pfx"))
      .localCheckpoint()
    val pairs = d.as("a")
      .join(d.select(col("doc_id").as("did2"), col("lang").as("lang2"),
        col("blk").as("blk2"), col("pfx").as("pfx2")).as("b"),
        col("a.lang") === col("lang2") && col("a.blk") === col("blk2")
          && col("a.doc_id") < col("did2"))
      .select(col("a.lang").as("lang"),
        levenshtein(col("pfx"), col("pfx2")).cast("long").as("dist"))
    val blocks = d.groupBy(col("lang"))
      .agg(countDistinct(col("blk")).as("n_blocks"))
    blocks.join(
      pairs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_cand_pairs"),
          sum(when(col("dist") <= 5L, 1L).otherwise(0L)).as("n_near"),
          expr("sum(dist) div count(1)").as("mean_dist")),
      Seq("lang"), "left_outer")
      .select(col("lang"), col("n_blocks"),
        coalesce(col("n_cand_pairs"), lit(0L)).as("n_cand_pairs"),
        coalesce(col("n_near"), lit(0L)).as("n_near"),
        coalesce(col("mean_dist"), lit(0L)).as("mean_dist"))
      .orderBy("lang")
  }

  /** The 5-item binary quality battery every document answers — the four
    * [[q_gopher_quality]] rules plus the [[q_ttr_filter]] diversity rule
    * — shared base of the reliability coefficients below. One explode
    * (for the top-word share) + doc-keyed aggregates; items i1..i5 and
    * the total score are exact 0/1 integers.
    */
  private def qualityItems(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("nw"),
        expr("CAST(aggregate(tk, 0L, (a, t) -> a + length(t)) AS BIGINT)").as("nc"),
        expr("CAST(aggregate(tk, 0L, (a, t) -> a + CASE WHEN t IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT)").as("stop_hits"),
        expr("CAST(size(array_distinct(tk)) AS BIGINT)").as("nd"),
        explode(col("tk")).as("w"))
      .groupBy(col("doc_id"), col("nw"), col("nc"), col("stop_hits"), col("nd"),
        col("w"))
      .agg(count(lit(1)).as("wc"))
      .groupBy(col("doc_id"), col("nw"), col("nc"), col("stop_hits"), col("nd"))
      .agg(max(col("wc")).as("maxw"))
      .select(col("doc_id"),
        when(col("nw") >= 30L, 1L).otherwise(0L).as("i1"),
        when(col("nc") >= col("nw") * 3L && col("nc") <= col("nw") * 10L, 1L)
          .otherwise(0L).as("i2"),
        when(col("maxw") * 100L <= col("nw") * 15L, 1L).otherwise(0L).as("i3"),
        when(col("stop_hits") >= 1L, 1L).otherwise(0L).as("i4"),
        when(col("nd") * 10L >= col("nw") * 4L, 1L).otherwise(0L).as("i5"))

  /** KR-20 internal-consistency reliability of the 5-item quality
    * battery: KR20 = k/(k−1)·(1 − Σpⱼqⱼ/σ²ₜ), computed ENTIRELY in
    * exact integers via Σpq = Σcⱼ(n−cⱼ)/n² and n²σ² = nΣt²−(Σt)² —
    * the common n² cancels, so one final division is the only float op.
    */
  def q_kr20(spark: SparkSession, sf: String): DataFrame = {
    val it = qualityItems(spark, sf)
      .select(col("doc_id"), col("i1"), col("i2"), col("i3"), col("i4"), col("i5"),
        (col("i1") + col("i2") + col("i3") + col("i4") + col("i5")).as("t"))
    it.agg(count(lit(1)).as("n"),
      sum(col("i1")).as("c1"), sum(col("i2")).as("c2"), sum(col("i3")).as("c3"),
      sum(col("i4")).as("c4"), sum(col("i5")).as("c5"),
      sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"))
      .select(col("n"), col("c1"), col("c2"), col("c3"), col("c4"), col("c5"),
        // all-equal totals → zero score variance → KR-20 undefined (NULL)
        when((col("n") * col("stt") - col("st") * col("st")) > 0L,
          round(lit(1.25) * (lit(1.0)
            - (col("c1") * (col("n") - col("c1")) + col("c2") * (col("n") - col("c2"))
              + col("c3") * (col("n") - col("c3")) + col("c4") * (col("n") - col("c4"))
              + col("c5") * (col("n") - col("c5"))).cast("double")
              / (col("n") * col("stt") - col("st") * col("st")).cast("double")), 6)
            + lit(0.0)).as("kr20"))
  }

  /** Spearman–Brown split-half reliability of the same battery: halves
    * A = items {1,3,5}, B = items {2,4}; Pearson r between half scores
    * from exact integer sums, SB = 2r/(1+r) one epilogue.
    */
  def q_split_half(spark: SparkSession, sf: String): DataFrame = {
    val h = qualityItems(spark, sf)
      .select((col("i1") + col("i3") + col("i5")).as("a"),
        (col("i2") + col("i4")).as("b"))
    val s = h.agg(count(lit(1)).as("n"), sum(col("a")).as("sa"),
      sum(col("b")).as("sb"), sum(col("a") * col("a")).as("saa"),
      sum(col("b") * col("b")).as("sbb"), sum(col("a") * col("b")).as("sab"))
    val r = ((col("n") * col("sab") - col("sa") * col("sb")).cast("double")
      / sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double")
        * (col("n") * col("sbb") - col("sb") * col("sb")).cast("double")))
    // zero-variance half → undefined r: exact integer guard, NULL out
    val ok = ((col("n") * col("saa") - col("sa") * col("sa")) > 0L
      && (col("n") * col("sbb") - col("sb") * col("sb")) > 0L)
    s.select(col("n"),
      when(ok, round(r, 6) + lit(0.0)).as("r_halves"),
      when(ok, round(lit(2.0) * r / (lit(1.0) + r), 6) + lit(0.0))
        .as("spearman_brown"))
  }

  /** Item-total diagnostics of the battery: per item the endorsement
    * share (e6 trunc) and the point-biserial correlation against the
    * REST score (total minus the item — the corrected discrimination a
    * test-construction pass reports), from exact integer sums only.
    */
  def q_item_total(spark: SparkSession, sf: String): DataFrame = {
    // binary items collapse the long-form sums: with x ∈ {0,1} and
    // y = t − x, every per-item moment is a function of (n, Σt, Σt²,
    // cₖ = Σiₖ, aₖ = Σiₖ·t): Σx² = cₖ, Σxy = aₖ − cₖ, Σy = Σt − cₖ,
    // Σy² = Σt² − 2aₖ + cₖ — so ONE 12-sum aggregate replaces the
    // map-explode + regroup (which cost 25× the battery itself).
    val s = qualityItems(spark, sf)
      .select(col("i1"), col("i2"), col("i3"), col("i4"), col("i5"),
        (col("i1") + col("i2") + col("i3") + col("i4") + col("i5")).as("t"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("i1")).as("c1"), sum(col("i1") * col("t")).as("a1"),
        sum(col("i2")).as("c2"), sum(col("i2") * col("t")).as("a2"),
        sum(col("i3")).as("c3"), sum(col("i3") * col("t")).as("a3"),
        sum(col("i4")).as("c4"), sum(col("i4") * col("t")).as("a4"),
        sum(col("i5")).as("c5"), sum(col("i5") * col("t")).as("a5"))
    // fan the single stats row out into 5 item rows with a literal-keyed
    // generator — the corpus is aggregated exactly ONCE (a 5-way union
    // recomputed the battery per branch, and eager localCheckpoint cost
    // ~10 s of construction-time wall on the bench path)
    val long = s.select(col("n"), col("st"), col("stt"),
      explode(array(
        struct(lit("i1").as("item"), col("c1").as("c"), col("a1").as("a")),
        struct(lit("i2").as("item"), col("c2").as("c"), col("a2").as("a")),
        struct(lit("i3").as("item"), col("c3").as("c"), col("a3").as("a")),
        struct(lit("i4").as("item"), col("c4").as("c"), col("a4").as("a")),
        struct(lit("i5").as("item"), col("c5").as("c"), col("a5").as("a")))).as("e"))
      .select(col("e.item").as("item"), col("n"), col("st"), col("stt"),
        col("e.c").as("c"), col("e.a").as("a"))
    val sx = col("c")
    val sy = col("st") - col("c")
    val sxx = col("c")
    val sxy = col("a") - col("c")
    val syy = col("stt") - lit(2L) * col("a") + col("c")
    long.select(col("item"), col("n"),
      expr("c * 1000000 div n").as("p_e6"),
      // a constant item (zero variance — it happens: one gopher rule
      // passes every doc at some SFs) has no defined point-biserial;
      // the exact integer variance product guards the division on both
      // engines identically (NULL, never Inf/throw)
      when((col("n") * sxx - sx * sx) > 0L
        && (col("n") * syy - sy * sy) > 0L,
        round((col("n") * sxy - sx * sy).cast("double")
          / sqrt((col("n") * sxx - sx * sx).cast("double")
            * (col("n") * syy - sy * sy).cast("double")), 6)
          + lit(0.0)).as("r_item_rest"))
      .orderBy("item")
  }

  /** Readability index battery per language — Coleman–Liau, ARI and LIX
    * from corpus-level EXACT integer totals (chars per token, whitespace
    * words, sentence-punctuation runs, >6-char long words): three fixed
    * IEEE trees per language, no per-doc float survives aggregation.
    * The [[q_readability_score]] (Flesch) companions on the counts a
    * 100 TB corpus scan already produces.
    */
  def q_readability_battery(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("lang"), toks(col("text")).as("tk"), col("text"))
      .select(col("lang"), size(col("tk")).cast("long").as("w"),
        expr("CAST(aggregate(tk, 0L, (a, t) -> a + length(t)) AS BIGINT)").as("ch"),
        (size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))) + 1)
          .cast("long").as("s"),
        expr("CAST(aggregate(tk, 0L, (a, t) -> a + CASE WHEN length(t) > 6 THEN 1 ELSE 0 END) AS BIGINT)").as("lw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("tw"),
        sum(col("ch")).as("tc"), sum(col("s")).as("ts"), sum(col("lw")).as("tlw"))
      .select(col("lang"), col("n_docs"), col("tw").as("n_words"),
        (round(lit(0.0588) * (col("tc").cast("double") / col("tw").cast("double")
          * lit(100.0))
          - lit(0.296) * (col("ts").cast("double") / col("tw").cast("double")
            * lit(100.0)) - lit(15.8), 4) + lit(0.0)).as("coleman_liau"),
        (round(lit(4.71) * (col("tc").cast("double") / col("tw").cast("double"))
          + lit(0.5) * (col("tw").cast("double") / col("ts").cast("double"))
          - lit(21.43), 4) + lit(0.0)).as("ari"),
        (round(col("tw").cast("double") / col("ts").cast("double")
          + lit(100.0) * col("tlw").cast("double") / col("tw").cast("double"), 4)
          + lit(0.0)).as("lix"))
      .orderBy("lang")

  /** Cross-source duplicate-pressure matrix: bag-of-words fingerprints
    * (the [[q_bcubed_eval]] pfp) shared between source pairs — for each
    * ordered pair (a < b) the distinct shared fingerprints and total
    * cross-pair doc products. The data-lineage readout that tells a
    * corpus owner WHICH shards re-host each other's text; the join is
    * fingerprint-keyed, pairs bounded by sources-per-fingerprint, never
    * corpus².
    */
  def q_source_overlap(spark: SparkSession, sf: String): DataFrame =
    sourceOverlapOf(Tables.documents(spark, sf))

  /** [[q_source_overlap]] body over any (source, text) frame — split out
    * so Round5OpsSpec can exercise the non-empty path with synthetic
    * cross-source duplicates (the fixture corpus has none, so the oracle
    * hash-match alone would verify only the empty result). */
  private[graft] def sourceOverlapOf(docs: DataFrame): DataFrame = {
    val fp = docs
      .select(col("source"),
        md5(concat_ws(" ", array_sort(split(col("text"), " "))).cast("binary"))
          .as("pfp"))
      .groupBy(col("pfp"), col("source")).agg(count(lit(1)).as("nd"))
      .localCheckpoint()
    fp.as("a")
      .join(fp.select(col("pfp"), col("source").as("source2"),
        col("nd").as("nd2")).as("b"),
        Seq("pfp"))
      .filter(col("source") < col("source2"))
      .groupBy(col("source"), col("source2"))
      .agg(count(lit(1)).as("n_shared_fps"),
        sum(col("nd") * col("nd2")).as("n_cross_pairs"))
      .orderBy("source", "source2")
  }

  /** Min-length filter sweep: for thresholds t = 10,20,…,100 tokens the
    * documents and tokens RETAINED (count + e6 share) — the curve a
    * data-curation pass reads before fixing a length cutoff. One
    * doc-length lattice aggregate + a 10-row broadcast theta join; the
    * lattice is |distinct lengths| regardless of corpus size.
    */
  def q_length_filter_sweep(spark: SparkSession, sf: String): DataFrame = {
    val lat = Tables.documents(spark, sf)
      .select(size(toks(col("text"))).cast("long").as("nw"))
      .groupBy(col("nw")).agg(count(lit(1)).as("nd"))
      .localCheckpoint()
    val tot = lat.agg(sum(col("nd")).as("td"),
      sum(col("nd") * col("nw")).as("tt"))
    val thr = spark.range(1, 11).select((col("id") * 10L).as("t"))
    lat.crossJoin(broadcast(thr))
      .filter(col("nw") >= col("t"))
      .groupBy(col("t"))
      .agg(sum(col("nd")).as("docs_kept"),
        sum(col("nd") * col("nw")).as("tokens_kept"))
      .crossJoin(broadcast(tot))
      .select(col("t"), col("docs_kept"),
        expr("docs_kept * 1000000 div td").as("docs_share_e6"),
        col("tokens_kept"),
        expr("tokens_kept * 1000000 div tt").as("tokens_share_e6"))
      .orderBy("t")
  }

  /** Sequence-packing efficiency audit at context length 512: per
    * language the padded-sequence count Σ⌈nw/512⌉, the padding waste,
    * and the packed lower bound ⌈Σnw/512⌉ — the exact integer answer to
    * "what does sequence packing buy over pad-to-length at this corpus
    * mix". One scan, one aggregate, any corpus size.
    */
  def q_packing_efficiency(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .select(col("lang"), size(toks(col("text"))).cast("long").as("nw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("tokens"),
        sum(expr("(nw + 511) div 512")).as("seqs_padded"),
        sum(expr("(nw + 511) div 512") * 512L - col("nw")).as("pad_waste"))
      .select(col("lang"), col("n_docs"), col("tokens"), col("seqs_padded"),
        col("pad_waste"),
        expr("pad_waste * 1000000 div (seqs_padded * 512)").as("waste_share_e6"),
        expr("(tokens + 511) div 512").as("seqs_packed_lb"),
        expr("(seqs_padded - (tokens + 511) div 512) * 1000000 div seqs_padded")
          .as("packing_gain_e6"))
      .orderBy("lang")

  /** T5-style span-corruption plan, fully deterministic: a span of 3
    * tokens starts wherever hash32(doc_id, pos) ≡ 0 (mod 20), a token is
    * masked iff a span started at pos, pos−1 or pos−2 — three hash
    * probes per token, NO self-join. Per language: tokens, spans,
    * masked tokens and the realized mask rate (e6) vs the 15%
    * geometric-free target. The masking-plan audit a corruption
    * pretraining pipeline runs before writing shards.
    */
  def q_span_corruption_plan(spark: SparkSession, sf: String): DataFrame = {
    def h(p: Column): Column =
      graft.core.Det.hash32(concat(col("doc_id").cast("string"), lit("_"),
        p.cast("string"))) % 20 === 0
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        posexplode(toks(col("text"))).as(Seq("pos", "w")))
    tok.select(col("lang"),
      when(h(col("pos")), 1L).otherwise(0L).as("starts"),
      when(h(col("pos"))
        || (col("pos") >= 1 && h(col("pos") - 1))
        || (col("pos") >= 2 && h(col("pos") - 2)), 1L).otherwise(0L).as("masked"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("tokens"), sum(col("starts")).as("spans"),
        sum(col("masked")).as("masked"))
      .select(col("lang"), col("tokens"), col("spans"), col("masked"),
        expr("masked * 1000000 div tokens").as("mask_rate_e6"))
      .orderBy("lang")
  }

  /** Vocabulary-pruning sweep: for min-frequency thresholds f =
    * 1,2,4,8,16,32 the vocabulary retained and the corpus-token share
    * still covered — computed from the count-of-counts lattice (group
    * tokens by frequency first), so the sweep join touches |distinct
    * frequencies| × 6 rows however large the corpus. The tokenizer-
    * vocab sizing curve.
    */
  def q_vocab_prune_sweep(spark: SparkSession, sf: String): DataFrame = {
    val coc = Tables.documents(spark, sf)
      .select(explode(toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("m"))
      .localCheckpoint()
    val tot = coc.agg(sum(col("m")).as("tv"), sum(col("c") * col("m")).as("tt"))
    val thr = spark.range(0, 6)
      .select(expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)").as("f"))
    coc.crossJoin(broadcast(thr))
      .filter(col("c") >= col("f"))
      .groupBy(col("f"))
      .agg(sum(col("m")).as("vocab_kept"),
        sum(col("c") * col("m")).as("tokens_covered"))
      .crossJoin(broadcast(tot))
      .select(col("f").as("min_freq"), col("vocab_kept"),
        expr("vocab_kept * 1000000 div tv").as("vocab_share_e6"),
        col("tokens_covered"),
        expr("tokens_covered * 1000000 div tt").as("coverage_e6"))
      .orderBy("min_freq")
  }

  /** Per-document token-entropy filter: H = −Σ(c/n)ln(c/n) over the
    * doc's own token distribution, every c·ln(c/n) term a fixed IEEE
    * tree from exact counts e8-latticed BEFORE the doc sum (order-free),
    * low-diversity flag H < 1.5 nats. Per source: docs, flagged, mean
    * e4 entropy — the information-theoretic sibling of the TTR filter
    * (catches "aaa bbb aaa bbb" that TTR alone misses).
    */
  def q_doc_entropy_filter(spark: SparkSession, sf: String): DataFrame = {
    val terms = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        expr("CAST(size(split(lower(text), ' ')) AS BIGINT)").as("n"),
        explode(toks(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("source"), col("n"), col("w"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("source"), col("n"),
        round(col("c").cast("double")
          * log(col("c").cast("double") / col("n").cast("double")) * lit(1e8))
          .cast("long").as("t_e8"))
    val docs = terms.groupBy(col("doc_id"), col("source"), col("n"))
      .agg((-sum(col("t_e8"))).as("s_e8"))
      .select(col("source"),
        round(col("s_e8").cast("double") / (col("n").cast("double") * lit(1e8))
          * lit(1e4)).cast("long").as("h_e4"))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("h_e4") < 15000L, 1L).otherwise(0L)).as("n_low_entropy"),
        sum(col("h_e4")).as("sh"))
      .select(col("source"), col("n_docs"), col("n_low_entropy"),
        expr("sh div n_docs").as("mean_h_e4"))
      .orderBy("source")
  }

  /** Shard-balance audit of the physical (lang, source) partitioning:
    * per language the shard count, total/trunc-mean/max shard chars and
    * the max/mean imbalance ratio (e6) — the skew card read before
    * choosing a partition key at scale. One two-level aggregate.
    */
  def q_shard_balance(spark: SparkSession, sf: String): DataFrame =
    Tables.documents(spark, sf)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("nd"), sum(col("n_chars")).as("chars"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_shards"), sum(col("nd")).as("n_docs"),
        sum(col("chars")).as("tot_chars"), max(col("chars")).as("max_chars"))
      .select(col("lang"), col("n_shards"), col("n_docs"), col("tot_chars"),
        col("max_chars"),
        expr("tot_chars div n_shards").as("mean_chars"),
        expr("max_chars * 1000000 div (tot_chars div n_shards)")
          .as("skew_ratio_e6"))
      .orderBy("lang")

  /** DSIR-style importance weights for data selection: hashed-bigram
    * log-likelihood ratio between the target domain (English docs — the
    * corpus majority) and the raw rest. Per 1024-bucket feature b the
    * add-one LLR ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B)) is pre-rounded
    * to an e6 BIGINT, so each candidate doc's score is an exact integer
    * sum over its bigram buckets — summation-order-proof. Output: the
    * 20 non-target docs most target-like, i.e. exactly the docs an
    * importance-resampling curation step would pull in first. Scale
    * posture: the bucket table is ≤1024 rows (broadcast); everything
    * else is explode → hash-aggregate on (doc, bucket).
    */
  def q_dsir_weights(spark: SparkSession, sf: String): DataFrame = {
    // rep collapse (round 8): bucket streams are built once per identical
    // (lang, text) group; the domain/rest bucket totals are the
    // group-size-weighted sums over rep occurrences (exact — every
    // member contributes its rep's occurrence multiset), scores are
    // group-invariant, and only each group's 20 smallest member ids can
    // reach the global top-20 (score ties break by doc_id)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("rep", min(col("doc_id")).over(
        Window.partitionBy(col("lang"), md5(col("text").cast("binary")))))
      .localCheckpoint()
    val groups = docs.groupBy(col("rep")).agg(count(lit(1)).as("m"))
    val reps = docs.filter(col("doc_id") === col("rep"))
    val feats = docBigramsOf(reps)
      .join(reps.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"),
        pmod(th(concat_ws(" ", col("w1"), col("w2"))), lit(1024L)).as("b"))
      .localCheckpoint() // feeds the bucket totals AND the scoring join
    val counts = feats
      .join(groups.select(col("rep").as("doc_id"), col("m")), "doc_id")
      .groupBy(col("b"))
      .agg(sum(when(col("lang") === "en", col("m")).otherwise(0L)).as("tb"),
        sum(when(col("lang") =!= "en", col("m")).otherwise(0L)).as("rb"))
    val tots = counts.agg(sum(col("tb")).as("tt"), sum(col("rb")).as("rt"))
    val llr = counts.crossJoin(broadcast(tots))
      .select(col("b"), expr(
        """CAST(ROUND((ln(CAST(tb + 1 AS DOUBLE)) - ln(CAST(tt + 1024 AS DOUBLE))
                       - ln(CAST(rb + 1 AS DOUBLE)) + ln(CAST(rt + 1024 AS DOUBLE))) * 1e6)
           AS BIGINT)""").as("llr_e6"))
    val repScores = feats.filter(col("lang") =!= "en")
      .join(broadcast(llr), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("llr_e6")).as("score_e6"))
      .withColumnRenamed("doc_id", "rep")
    docs
      .withColumn("rn", row_number().over(
        Window.partitionBy("rep").orderBy(col("doc_id").asc)))
      .filter(col("rn") <= 20)
      .select(col("rep"), col("doc_id"))
      .join(repScores, "rep")
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(20)
  }

  /** Curriculum schedule for training-data ordering: documents staged
    * easy→hard by length (256-char stages, capped at 3), each stage
    * reporting its size, its char mass, the cumulative chars a trainer
    * has consumed BEFORE the stage starts, and the first five doc ids
    * it would emit. The cross-stage prefix is a bounded theta join on
    * the 4-row stage aggregate — never a global window — so the
    * schedule metadata costs one aggregate regardless of corpus size.
    */
  def q_curriculum_schedule(spark: SparkSession, sf: String): DataFrame = {
    val staged = Tables.documents(spark, sf)
      .select(least(lit(3L), expr("n_chars div 256")).as("stage"),
        col("doc_id"), col("n_chars"))
    val agg = staged.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
        expr("array_join(transform(slice(array_sort(collect_list(doc_id)), 1, 5)," +
          " x -> CAST(x AS STRING)), ',')").as("first_docs"))
      .localCheckpoint()
    agg.as("a")
      .join(agg.select(col("stage").as("s2"), col("chars").as("c2")).as("b"),
        col("s2") < col("a.stage"), "left_outer")
      .groupBy(col("a.stage").as("stage"), col("a.n_docs").as("n_docs"),
        col("a.chars").as("chars"), col("a.first_docs").as("first_docs"))
      .agg(coalesce(sum(col("c2")), lit(0L)).as("cum_chars_before"))
      .select(col("stage"), col("n_docs"), col("chars"),
        col("cum_chars_before"), col("first_docs"))
      .orderBy("stage")
  }
}
