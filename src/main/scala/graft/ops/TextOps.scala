package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Murmur3

/**
 * Text-analysis operators for large-scale training-data pipelines.
 *
 * Everything here is embarrassingly parallel per-row (no shuffle), so it
 * scales linearly to 100 TB: each operator is a narrow projection that
 * Catalyst fuses into the scan's whole-stage-codegen pipeline. Prefer
 * `org.apache.spark.sql.functions` built-ins (codegen'd); the UDFs
 * (simhash / fingerprint / langid) are per-row pure functions with no
 * driver-side state, broadcast implicitly as part of the closure.
 */
object TextOps {

  /** Whitespace tokens. Testdata uses single-space separation. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-grams with multiplicity (positional); empty array when fewer
    * than n tokens. Codegen-friendly (transform/sequence, no UDF). */
  def wordNgramsRaw(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))
    when(size(toks) >= n, grams).otherwise(array())
  }

  /** Word n-grams (default 3) as a distinct SET (jaccard semantics). */
  def wordNgrams(toks: Column, n: Int = 3): Column =
    array_distinct(wordNgramsRaw(toks, n))

  /** Distinct word-n-gram 64-bit hashes, one pass over the raw text — the
    * scale path for set-similarity joins. Gram identity lives only as a
    * hash (8 bytes through every shuffle, never a string), and the whole
    * shingling is one JVM call per row: Spark's higher-order-function
    * expressions (`transform`/`sequence`) evaluate their lambdas
    * interpreted per element, which measured ~10x slower per doc. */
  def gramHashes(n: Int): Column => Column = {
    // The function IS deterministic; the marking is a measured perf
    // contract: every consumer projects it to an attribute and explodes
    // that attribute, and Catalyst then infers the generator's
    // isnotnull/size>0 filters on the attribute and pushes them through
    // the defining projection — substituting the UDF into BOTH filters,
    // i.e. 3 evaluations per row on the Jaccard family's hottest stage
    // (accumulator-measured). Nondeterministic blocks the push-through:
    // the filters run on the materialized array, the UDF once per row.
    // Consequence callers must respect: use it in projections (as all
    // Dedup sites do), not in WHERE clauses.
    val f = udf((text: String) => {
      if (text == null) Array.empty[Long]
      else {
        val toks = text.split(' ')
        if (toks.length < n) Array.empty[Long]
        else {
          // hash each token ONCE — the sliding window would otherwise
          // murmur the same token n times (bit-identical output, ~n× less
          // hashing on the hottest stage of the Jaccard family)
          val th = new Array[Long](toks.length)
          var j = 0
          while (j < toks.length) {
            th(j) = Murmur3.hashString(toks(j)).toLong & 0xffffffffL
            j += 1
          }
          val seen = new java.util.HashSet[Long]()
          val out = new scala.collection.mutable.ArrayBuffer[Long](toks.length)
          var i = 0
          while (i + n <= toks.length) {
            var h = 0x9e3779b97f4a7c15L
            var k = 0
            while (k < n) {
              // 64-bit avalanche mix (splitmix64 finalizer)
              h ^= th(i + k)
              h *= 0xbf58476d1ce4e5b9L
              h ^= h >>> 27
              h *= 0x94d049bb133111ebL
              h ^= h >>> 31
              k += 1
            }
            if (seen.add(h)) out += h
            i += 1
          }
          out.toArray
        }
      }
    })
    val nd = f.asNondeterministic()
    c => nd(c)
  }

  /** Token count via codegen'd `size(split(...))`. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Overlapping token-window chunking — the standard long-document prep
    * for a fixed-context trainer: chunk `i` covers tokens
    * `[i*stride, i*stride + maxTokens)` with `stride = maxTokens - overlap`,
    * so consecutive chunks share `overlap` tokens and every token lands in
    * at least one chunk (the last chunk may be shorter). Pure
    * sequence/transform/posexplode built-ins — a narrow, shuffle-free
    * projection that fuses into the scan's codegen at 100 TB like the rest
    * of TextOps. Returns (doc_id, chunk_id, chunk_text, chunk_tokens). */
  def chunk(docs: DataFrame, textCol: String = "text",
      maxTokens: Int = 256, overlap: Int = 32): DataFrame = {
    require(overlap >= 0 && maxTokens > overlap,
      s"need maxTokens > overlap >= 0, got ($maxTokens, $overlap)")
    val stride = maxTokens - overlap
    val toks = tokens(col(textCol))
    val nChunks = when(size(toks) <= maxTokens, lit(1)).otherwise(
      ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    val chunks = transform(sequence(lit(0), nChunks - 1), i =>
      concat_ws(" ", slice(toks, i * stride + 1, lit(maxTokens))))
    docs.select(col("doc_id"),
        posexplode(chunks).as(Seq("chunk_id", "chunk_text")))
      .withColumn("chunk_tokens", size(split(col("chunk_text"), " ")))
  }

  /** BPE-ish sub-word segmentation count: splits on whitespace AND on
    * letter/digit/punct boundaries, approximating a byte-pair tokenizer's
    * piece count without a vocab. Codegen'd regexp. */
  def bpeishTokenCount(text: Column): Column =
    size(split(text, "\\s+|(?<=[a-z])(?=[A-Z0-9])|(?<=[0-9])(?=[a-zA-Z])"))

  /** Token-budget sequence packing: assign each document (in doc_id
    * order) to a training shard so every shard holds ~`budget` tokens —
    * `shard = floor(tokens-before-this-doc / budget)`, the layout a
    * pretraining data loader consumes. Returns `(doc_id, toks, shard)`.
    *
    * The global running total is a DISTRIBUTED two-phase prefix sum, not
    * a single-partition window (`Window.orderBy` with no partition key
    * funnels 100 TB through one task): docs cut into ~shuffle-partition
    * QUANTILE range groups by doc_id (skew-robust on sparse/clustered id
    * spaces), each group's within-group cumsum is a group-keyed window,
    * and the tiny per-group totals (one row per group) get their prefix
    * offsets in a one-task window that is metadata-scale by construction
    * — then a broadcast join stitches `offset(group) +
    * within-group-cumsum`. The narrow `(doc_id, toks)` projection is
    * scanned three times (quantile cuts, totals, final); no driver
    * collect, no silent cache.
    *
    * Determinism contract: the doc_id order is the pack order; rows
    * sharing a doc_id sort arbitrarily WITHIN the tie (they always land
    * in the same group, so the set of shards is stable, but tied rows may
    * swap shards run to run when a budget boundary falls inside the tie)
    * — give every row a distinct doc_id for a fully deterministic
    * layout. NULL doc_ids pack first (nulls-first order). */
  def packByTokenBudget(docs: DataFrame, budget: Long,
      textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L)).as("toks"))
    val nGroups = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val keyed = quantileGroups(base, "doc_id", nGroups)
    // one row PER GROUP — prefix offsets via a triangular broadcast
    // self-join over the per-group totals instead of a global window:
    // off(g) = Σ t(g') for g' < g, identical to the ordered prefix sum
    // (one row per grp). G ≈ numShufflePartitions by construction, so the
    // G² join tuples are metadata-scale, the work is fully parallel, and
    // no partition-less WindowExec exists at ANY scale (a constant
    // partitionBy(lit) key does not survive Catalyst — the optimizer
    // folds it away and the single-task window comes back)
    val totals = keyed.groupBy("grp").agg(sum("toks").as("t"))
    val prior = totals.select(col("grp").as("_pg"), col("t").as("_pt"))
    val offsets = totals
      .join(broadcast(prior), col("_pg") < col("grp"), "left")
      .groupBy("grp").agg(coalesce(sum("_pt"), lit(0L)).as("off"))
    val withinW = Window.partitionBy("grp").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed
      .withColumn("cb", coalesce(sum("toks").over(withinW), lit(0L)))
      .join(broadcast(offsets), "grp")
      .select(col("doc_id"), col("toks"),
        floor((col("off") + col("cb")) / budget).cast("long").as("shard"))
  }

  /** Skew-robust order-preserving group key: cut `keyCol` (long) into
    * `nGroups` QUANTILE ranges, not arithmetic on (min, max). Arithmetic
    * width degenerates on sparse/clustered id spaces (snowflake-style ids:
    * one group swallows the whole corpus and a per-group window becomes a
    * single-task sort). Quantile cuts give ~equal group populations for
    * ANY id distribution; the boundary array (< nGroups longs) is computed
    * once and baked into a codegen'd array-filter, so group assignment is
    * deterministic across runs and across every reuse of the returned
    * frame (no repartitionByRange re-sampling hazard). Equal keys always
    * land in the same group (duplicates never split), and NULL keys
    * deterministically land in group 0 — consistent with the nulls-first
    * global key order. `grp` is nondecreasing in `keyCol`. */
  private[graft] def quantileGroups(base: DataFrame, keyCol: String,
      nGroups: Int): DataFrame = {
    val probs = (1 until nGroups).map(_.toDouble / nGroups).toArray
    val bounds: Array[Long] =
      if (probs.isEmpty) Array.empty
      else base.stat.approxQuantile(keyCol, probs, 0.001)
        .filterNot(_.isNaN).map(_.toLong).distinct.sorted
    if (bounds.isEmpty) base.withColumn("grp", lit(0L))
    else {
      val bArr = array(bounds.map(lit(_)).toIndexedSeq: _*)
      base.withColumn("grp",
        size(filter(bArr, b => b <= col(keyCol))).cast("long"))
    }
  }

  /** Quality score in [0,1]: length saturation + type-token ratio +
    * stopword ratio. Formula is fixed and float-deterministic (left-assoc). */
  val StopWords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  def qualityScore(toks: Column): Column = {
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    val stops = size(filter(toks, t => t.isin(StopWords: _*))).cast("double")
    lit(0.5) * least(lit(1.0), n / lit(50.0)) + lit(0.3) * (uniq / n) + lit(0.2) * (stops / n)
  }

  // --- PII redaction ------------------------------------------------------

  /** Engine-portable PII patterns: the common subset of java.util.regex
    * and RE2 (no lookaround, no backreferences), so a DuckDB/Trino stage
    * reproduces the scrub decision for the same text. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** International format only (`+` then 7-15 digits): bare digit runs are
    * too ambiguous to scrub unconditionally (ids, quantities, years). */
  val PhonePattern = "\\+[0-9]{7,15}"

  /** PII scrub — emails → `<EMAIL>`, IPv4s → `<IP>`, international-format
    * phone numbers → `<PHONE>` — the redaction stage a training pipeline
    * runs before tokenization. Replacement order is fixed (emails first:
    * their local/domain parts contain digit-and-dot runs the IP pattern
    * would otherwise bite into). Codegen'd `regexp_replace` chain: a
    * narrow per-row map that fuses into the scan at 100 TB like the rest
    * of TextOps. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailPattern, "<EMAIL>"), Ipv4Pattern, "<IP>"), PhonePattern, "<PHONE>")

  /** Per-row PII hit counts (n_emails, n_ips, n_phones) — corpus audit /
    * filter-threshold companion to [[redactPii]]. */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).as("n_emails"),
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).as("n_ips"),
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).as("n_phones"))

  // --- token hashing ------------------------------------------------------

  /** Lower 64 bits of MD5(UTF-8 bytes), little-endian — the same value as
    * DuckDB's `md5_number_lower`, so every operator built on it (simhash,
    * fingerprint) is reproducible bit-for-bit by an independent engine.
    * Honest cost note: JCA MD5 is roughly an order of magnitude slower per
    * token than murmur3; we accept that for cross-engine verifiability
    * because simhash/fingerprint are per-row projections off the join hot
    * path — the Jaccard gram path keeps murmur3 (`gramHashes`). Swap in a
    * cheap 64-bit hash here if a deployment doesn't need oracle parity. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Lower64(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  // --- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over distinct tokens: per-token md5-lower-64 hash; sum
    * of +/-1 per bit; positive sum → fingerprint bit. Near-duplicate docs
    * land within small Hamming distance.
    *
    * Scale path: per-row map (no shuffle); grouping by 16-bit bands of the
    * fingerprint gives a shuffle-light candidate join (see Dedup.simhashPairs).
    */
  def simhash64(toks: Seq[String]): Long = {
    val counts = new Array[Int](64)
    var ti = 0
    val distinct = toks.distinct
    while (ti < distinct.length) {
      val h = md5Lower64(distinct(ti))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      ti += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  val simhashUdf = udf((toks: Seq[String]) => simhash64(toks))

  // --- Rolling-hash fingerprint ------------------------------------------

  /** Polynomial rolling hash over the token stream (base 31, mod 2^64,
    * md5-lower-64 token hashes) — an order-sensitive document fingerprint
    * (winnowing-style building block). Per-row, no shuffle. */
  def fingerprint64(toks: Seq[String]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < toks.length) {
      h = h * 31L + md5Lower64(toks(i))
      i += 1
    }
    h
  }

  val fingerprintUdf = udf((toks: Seq[String]) => fingerprint64(toks))

  // --- Language ID --------------------------------------------------------

  /** Charset + stopword language heuristic (en/es/de/fr/zh/unknown).
    * CJK codepoint ratio decides zh; else argmax of per-language stopword
    * hits with deterministic first-wins tie-break in (de,en,es,fr) order.
    * Counts are codepoint-based (\p{L} letters, CJK by codepoint range) so
    * the decision is reproducible by any engine with Unicode regex. */
  private val langStops: Seq[(String, Set[String])] = Seq(
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "en" -> Set("the", "and", "is", "of", "to", "in", "that", "it", "was", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "los", "es", "en", "una", "por"),
    "fr" -> Set("le", "la", "les", "et", "est", "dans", "une", "que", "pour", "des"))

  def languageOf(text: String): String = {
    if (text == null || text.isEmpty) return "unknown"
    var cjk = 0
    var letters = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF)) cjk += 1
      }
      i += Character.charCount(cp)
    }
    if (letters > 0 && cjk * 2 > letters) return "zh"
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var best = "unknown"
    var bestScore = 0
    langStops.foreach { case (lang, stops) =>
      val score = toks.count(stops.contains)
      if (score > bestScore) { best = lang; bestScore = score }
    }
    best
  }

  val langIdUdf = udf((text: String) => languageOf(text))

  /** Convenience: full per-document text-analysis projection. */
  def analyze(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq"),
      qualityScore(t).as("quality"),
      simhashUdf(t).as("simhash"),
      fingerprintUdf(t).as("fingerprint"),
      langIdUdf(col("text")).as("lang_pred"))
  }

  /** Per-document top-k terms by tf·idf (idf = ln(n_docs / df)) — keyword
    * extraction for corpus exploration and quality filters. Unlike the
    * per-row ops above this is corpus-relative, so it shuffles: once on
    * (doc, term) for term frequencies, once on term for document
    * frequencies, a term-keyed join (vocabulary-sized build side — AQE
    * broadcasts it when small), and a per-doc rank that plans as a
    * WindowGroupLimit (local top-k before the doc shuffle). The raw score
    * stays internal; output carries (tf, df, rank). Exact score TIES
    * break on the term string, so identical (tf, df) pairs rank the same
    * in every engine; the residual cross-engine hazard is two DISTINCT
    * (tf, df) pairs whose scores differ by under one ulp of ln() — such
    * a flip is data-determined (not flaky) and absent from the gate
    * corpus at all three scale factors. */
  def tfidfTopTerms(docs: DataFrame, topK: Int = 5): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    val terms = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy((col("tf") * log(col("n_docs").cast("double") / col("df"))).desc,
        col("term").asc)
    tf.join(dfreq, "term").crossJoin(n)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
  }
}
