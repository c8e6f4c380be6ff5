package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}

/**
 * The correctness-gate query suite: every entry has a Spark definition
 * and (where SQL-expressible) a DuckDB oracle over the same parquet
 * tables. Column names and deterministic ORDER BY are kept identical on
 * both sides; monetary SUMS run AND ship as DECIMAL (exact, order-independent
 * at any scale factor — a final double cast diverges at the last ulp once
 * sums reach ~17 significant digits); averages/ratios ship as DOUBLE.
 *
 * Scale notes are on each query; the common principles:
 *  - filters/projections stay in the scan (Catalyst pushdown),
 *  - small dims are broadcast,
 *  - top-k uses TakeOrderedAndProject (no global sort),
 *  - pair-joins (dedup) key on grams/bands, never cross-join.
 */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet timestamp[us] with isAdjustedToUTC=false (naive).
    * The oracle (DuckDB) renders naive timestamps verbatim, so rendering
    * must not apply a timezone shift: a UTC session timezone guarantees
    * that whether Spark maps the column to TIMESTAMP_NTZ (no shift by
    * definition) or legacy TIMESTAMP (shift by session tz = UTC = no-op).
    * The conf is scoped to an isolated child session — same SparkContext,
    * own SQLConf — so the caller's session is never mutated and queries
    * stay independent of execution order. One child per parent session
    * (building a SessionState costs ~250ms — not per query), weakly held. */
  private val eventsSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()
  private def events(s: SparkSession, dir: String): DataFrame = {
    val es = eventsSessions.synchronized {
      eventsSessions.computeIfAbsent(s, parent => {
        val child = parent.newSession()
        child.conf.set("spark.sql.session.timeZone", "UTC") // oracle is naive
        child
      })
    }
    t(es, dir, "events")
  }

  // exact decimal money math, deterministic across engines
  private def dec14(c: Column): Column = c.cast(DecimalType(14, 4))
  private def dec8(c: Column): Column = c.cast(DecimalType(8, 4))
  private val one = lit(1).cast(DecimalType(8, 4))
  private def dbl(c: Column): Column = c.cast(DoubleType)
  private def tsLit(s: String): Column = lit(s).cast(TimestampNTZType)

  /** Money aggregation runs on exact decimals (order-independent across
    * partitionings), rounds ONCE to DECIMAL(38,6), and ships as DOUBLE at
    * the output boundary: both Spark and DuckDB then perform one
    * decimal→double conversion of equal exact values — bit-identical
    * doubles at any scale factor. The ORACLES apply the SAME (38,6)
    * rounding to product sums (discount/tax factors give products more
    * than 6dp, so an unrounded oracle diverges once sums grow past the
    * shared prefix — seen at sf0.1). Shipping DECIMAL itself would trip
    * harnesses whose read paths render decimals differently. */
  private def money(c: Column): Column = c.cast(DecimalType(38, 6)).cast(DoubleType)

  private def revenue(price: Column, disc: Column): Column =
    money(sum(dec14(price) * (one - dec8(disc))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = base ++ FormatQueries.queries

  private lazy val base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core -------------------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= tsLit("2000-06-30"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money(sum(dec14(col("l_quantity")))).as("sum_qty"),
          money(sum(dec14(col("l_extendedprice")))).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          money(sum(dec14(col("l_extendedprice")) * (one - dec8(col("l_discount"))) * (one + dec8(col("l_tax"))))).as("sum_charge"),
          (dbl(sum(dec14(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (dbl(sum(dec14(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
          (dbl(sum(dec8(col("l_discount")))) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_revenue_by_year" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy(year(col("l_shipdate")).as("yr"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("yr"))
    }),

    "q03_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "q04_top_orders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.filter(col("l_shipdate") > tsLit("1996-06-15"))
        .join(o.filter(col("o_orderdate") < tsLit("1996-06-15")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          col("o_orderdate").cast(DateType).as("odate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q05_order_priority" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      o.join(li.filter(col("l_quantity") >= 45).select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    "q06_selective_filter" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") >= tsLit("1996-01-01") &&
          col("l_shipdate") < tsLit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(money(sum(dec14(col("l_extendedprice")) * dec8(col("l_discount")))).as("revenue"),
          count(lit(1)).as("n"))
    }),

    "q07_brand_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    "q08_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      graft.ops.Skew.saltedJoin(
          li.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          o, "o_orderkey", buckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), money(sum(dec14(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    "q09_customers_without_orders" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    "q10_suppliers_with_returns" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem")
      sup.join(li.filter(col("l_returnflag") === "R").select(col("l_suppkey")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // --- window functions ------------------------------------------------
    "q11_running_total" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          dbl(sum(dec14(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("run_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q12_rank_parts" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
      p.select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          dense_rank().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(col("p_brand"), col("rk"), col("p_partkey"))
    }),

    "q13_order_deltas" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)).as("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // --- set ops / grouping ----------------------------------------------
    "q14_custkeys_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.select(col("o_custkey").as("custkey")).distinct()
        .except(c.filter(col("c_acctbal") < 0).select(col("c_custkey").as("custkey")))
        .orderBy(col("custkey"))
    }),

    "q15_rollup_flags" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), money(sum(dec14(col("l_quantity")))).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    }),

    "q16_segment_stats" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n"),
          money(sum(dec14(col("c_acctbal")))).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- events (streaming-shaped, batch semantics) ----------------------
    "q17_events_hourly" -> ((s, dir) => {
      val ev = events(s, dir)
      ev.select(date_format(col("ts"), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"), col("value"))
        .groupBy(col("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), money(sum(dec14(col("value")))).as("sum_value"))
        .orderBy(col("hour"), col("event_type"))
    }),

    "q18_sessionization" -> ((s, dir) => {
      val ev = events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = ev.select(col("user_id"), col("ts"), col("event_id"),
        when(col("ts") - lag(col("ts"), 1).over(w) > expr("INTERVAL '1800' SECOND"), 1)
          .otherwise(0).as("new_sess"))
      val sessioned = flagged.select(col("user_id"), col("event_id"),
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("sess"))
      sessioned.groupBy(col("user_id"), col("sess")).agg(count(lit(1)).as("sess_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), max(col("sess_events")).as("max_sess_events"),
          sum(col("sess_events")).cast(LongType).as("n_events"))
        .orderBy(col("user_id"))
    }),

    "q19_events_top_users" -> ((s, dir) => {
      val ev = events(s, dir)
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), money(sum(dec14(col("value")))).as("sum_value"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(20)
    }),

    // --- text analysis ----------------------------------------------------
    "q30_text_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val tok = TextOps.tokens(col("text"))
      docs.select(col("doc_id"),
          size(tok).as("n_tokens"),
          size(array_distinct(tok)).as("n_uniq"),
          (size(array_distinct(tok)).cast(DoubleType) / size(tok).cast(DoubleType)).as("ttr"))
        .orderBy(col("doc_id"))
    }),

    "q31_lang_profile" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast(LongType).as("total_chars"),
          (dbl(sum(size(TextOps.tokens(col("text"))))) / count(lit(1))).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    "q32_exact_dedup" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents")).orderBy(col("keeper"))),

    // GATE-ONLY parameterization: maxDf = 0 (exact — every gram joins) so the
    // result is the exact n-gram Jaccard answer the DuckDB oracle computes.
    // The library DEFAULT keeps maxDf = 2000 (`Dedup.jaccardPairsFast`): at
    // corpus scale, hot (stopword) grams must be dropped before their doc
    // lists materialize, and an approximate answer is the documented scale
    // trade (same pattern as q34's GATE-ONLY band parameters).
    "q33_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairsFast(t(s, dir, "documents"), n = 3, threshold = 0.5, maxDf = 0)
        .orderBy(col("a"), col("b"))),

    // SCALE-PATH twin of q33, benched so regressions in the path a 100 TB
    // run actually uses are measured, not inferred: library-default maxDf
    // (2000 — broadcast hot-gram left-anti before doc lists materialize).
    // Oracle: the exact-Jaccard SQL (see defaultTwinOracles) — at gate
    // scale 2000 > corpus size, so the hot-gram guard is a no-op and the
    // default path's answer is exact.
    "q33_jaccard_default" -> ((s, dir) =>
      Dedup.jaccardPairsFast(t(s, dir, "documents"), n = 3, threshold = 0.5)
        .orderBy(col("a"), col("b"))),

    // INCREMENTAL near-dup: dedupe a fresh increment (doc_id % 10 = 0 —
    // a deterministic ~10% slice standing in for "this week's crawl")
    // against the standing corpus; corpus×corpus pairs are never
    // materialized, which is the steady-state append path at 100 TB.
    // Exact parameters (maxDf = 0) so the q33-style oracle applies with
    // the touching-pair restriction; benched so the incremental path's
    // sub-q33 cost is measured, not asserted.
    "q113_incremental_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.incrementalJaccardPairs(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        n = 3, threshold = 0.5, maxDf = 0)
        .orderBy(col("a"), col("b"))
    }),

    // 32 bands x 2 rows: P(candidate | J=0.5) = 1-(1-0.25)^32 ≈ 0.9999, so
    // the exact-verified output equals the exact-Jaccard answer (the oracle)
    // with overwhelming probability while shuffle volume stays O(docs x b).
    // GATE-ONLY parameterization: 32x2 admits many low-similarity candidates
    // (P≈28% at J=0.1), which is fine at gate scale but approaches O(n²)
    // candidates on a mildly-similar 100 TB corpus — the library DEFAULT
    // stays 16x4 (the documented scale path, steep S-curve at J=0.5).
    "q34_minhash_lsh_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), n = 3, bands = 32, rows = 2, threshold = 0.5)
        .orderBy(col("a"), col("b"))),

    // INCREMENTAL MinHash+LSH: q34's steady-state twin — the band join is
    // fresh×all (corpus bands never self-join), exact-verified, so the
    // oracle is the exact-Jaccard answer restricted to fresh-touching
    // pairs (q113's oracle; same 32x2 gate-only parameterization as q34 —
    // the library default stays 16x4, see q34's note)
    "q125_incremental_minhash" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.minhashLshPairsIncremental(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        n = 3, bands = 32, rows = 2, threshold = 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // dedup clustering: connected components over the EXACT jaccard pair
    // graph (threshold 0.5) — every member doc labeled with its component's
    // min doc id. The oracle recomputes components via a recursive CTE.
    "q45_dup_clusters" -> ((s, dir) =>
      Dedup.duplicateClusters(
        Dedup.jaccardPairsFast(t(s, dir, "documents"), n = 3, threshold = 0.5, maxDf = 0))
        .orderBy(col("doc_id"))),

    // quality-aware dedup survivors: cluster the 0.5-jaccard pair graph,
    // keep each cluster's longest doc (n_chars desc, ties → lowest id),
    // pass unclustered docs through — the step that turns pairs into the
    // deduped corpus. Integral score keeps the oracle float-free.
    "q118_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.keepBest(docs.select(col("doc_id"), col("n_chars"), col("text")),
          Dedup.jaccardPairsFast(docs, n = 3, threshold = 0.5, maxDf = 0),
          col("n_chars"))
        .select(col("doc_id"), col("cluster"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // deterministic content-hash sampling / splitting — buckets are a power
    // of two so the signed-hash pmod equals the oracle's unsigned mod
    "q46_hash_sample" -> ((s, dir) =>
      graft.ops.Sampling.hashSample(t(s, dir, "documents"), col("doc_id"), 0.25)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))),

    "q47_split" -> ((s, dir) =>
      graft.ops.Sampling.split(t(s, dir, "documents"), col("doc_id"),
          valFraction = 0.1, testFraction = 0.2)
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"))),

    // stratified sampling: exactly n docs per language, deterministic by
    // content hash — WindowGroupLimit keeps the per-task state at n rows
    // per (group, partition) before the single group shuffle
    "q102_stratified_sample" -> ((s, dir) =>
      graft.ops.Sampling.stratified(t(s, dir, "documents"),
          col("lang"), col("doc_id"), 40)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))),

    // exact-substring dedup (Lee et al.): docs sharing any 20-token window
    "q103_dup_spans" -> ((s, dir) =>
      graft.ops.Dedup.duplicateSpans(t(s, dir, "documents"), k = 20)
        .orderBy(col("doc_id"))),

    // corpus-relative keyword extraction: top-3 tf-idf terms per doc
    "q104_tfidf_terms" -> ((s, dir) =>
      graft.ops.TextOps.tfidfTopTerms(t(s, dir, "documents"), topK = 3)
        .orderBy(col("doc_id"), col("rank"))),

    // overlapping token-window chunking for a fixed-context trainer
    // (32-token windows, 8-token overlap at gate scale; library default is
    // 256/32) — per-chunk exact oracle via DuckDB list slicing
    "q49_chunking" -> ((s, dir) =>
      TextOps.chunk(t(s, dir, "documents"), "text", maxTokens = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // token-budget sequence packing: contiguous ~2048-token training
    // shards via a distributed two-phase prefix sum (group-keyed windows
    // + a metadata-scale offsets window — never a single-partition global
    // window over the corpus)
    "q130_token_packing" -> ((s, dir) =>
      TextOps.packByTokenBudget(t(s, dir, "documents"), budget = 2048)
        .orderBy(col("doc_id"))),

    // parallel-scaling probe (added round 21, optimization round 2).
    // Guards CORE-COUNT scaling visibility: every other headline query at
    // sf0.1 is overhead-bound (the r20 scaling block read sec@8 <= sec@32
    // on ALL 22 queries — the bench inputs are single-file single-row-group
    // parquet, so every map stage runs one task), which made a
    // parallelization regression invisible to the artifact of record
    // (VERDICT r20 item 3). This query is deliberately compute-heavy per
    // row — an iterated digest chain, the per-row cost shape of content
    // fingerprinting — so wall-clock tracks cores. The repartition spreads
    // the unsplittable input across the cluster (guide §2.5 input skew)
    // and is scale-adaptive (defaultParallelism), not a local[32] constant;
    // the result is a partitioning-invariant global aggregate.
    "q136_digest_scaling" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val seed = concat_ws("|", col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"), col("r").cast("string"))
      val h = (1 to 48).foldLeft(seed)((c, _) => md5(c.cast("binary")))
      // grouped by the digest's first hex char so the OUTPUT ROW COUNT
      // depends on every digest — a bare global aggregate lets a count()
      // action prune the whole hash chain away (guide §1.4)
      l.select(col("l_orderkey"), col("l_linenumber"))
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), lit(6))).as("r"))
        .select(h.as("h"))
        .groupBy(substring(col("h"), 1, 1).as("b"))
        .agg(count(lit(1)).as("n"), min(col("h")).as("min_h"),
          max(col("h")).as("max_h"))
        .orderBy(col("b"))
    }),

    // benchmark decontamination: every 17th document plays the held-out
    // benchmark; corpus docs sharing any distinct 3-gram with it are
    // flagged with their overlap count and fraction. The benchmark gram
    // set broadcasts, so the corpus side is one map-side join — the exact
    // shape a 100 TB decontamination run uses.
    "q51_decontamination" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      Dedup.contamination(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0), n = 3)
        .orderBy(col("doc_id"))
    }),

    // PII redaction (emails / IPv4s / intl phone numbers → typed
    // placeholders) — the scrub stage before tokenization. The synthetic
    // corpus is digit-free, so the gate PLANTS one of each per document
    // deterministically, then redacts and counts; DuckDB reproduces the
    // plant and the scrub with its own regex engine (RE2) — the patterns
    // are written to the java.util.regex ∩ RE2 subset, so a hash match
    // means an independent engine agrees on every redaction decision.
    // Narrow per-row map: no shuffle beyond the final sort.
    "q117_pii_redaction" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."),
          (col("doc_id") % 200).cast("string"), lit(".7 call +1415555"),
          (col("doc_id") % 10000).cast("string")).as("text"))
      planted.select(
        Seq(col("doc_id"), TextOps.redactPii(col("text")).as("red")) ++
          TextOps.piiCounts(col("text")): _*)
        .orderBy(col("doc_id"))
    }),

    // within-document repetition ratio (duplicate n-gram fraction) — the
    // standard corpus-quality rule for boilerplate/looping text; pure
    // codegen'd built-ins, no shuffle beyond the final sort
    "q48_repetition" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def rep(n: Int): Column = {
        // RAW grams (with multiplicity) — wordNgrams dedupes for jaccard
        val g = TextOps.wordNgramsRaw(TextOps.tokens(col("text")), n)
        when(size(g) > 0,
          lit(1.0) - size(array_distinct(g)).cast(DoubleType) / size(g).cast(DoubleType))
      }
      docs.select(col("doc_id"), rep(2).as("rep2"), rep(3).as("rep3"))
        .orderBy(col("doc_id"))
    }),

    "q35_simhash" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          TextOps.simhashUdf(TextOps.tokens(col("text"))).as("simhash"))
        .orderBy(col("doc_id"))
    }),

    // INCREMENTAL SimHash pairs: fresh×all 16-bit band join with exact
    // recall at hamming<=3 (pigeonhole over 4 bands), so the oracle is the
    // EXACT hamming pair set restricted to fresh-touching pairs — DuckDB
    // recomputes the fingerprints bit-for-bit (md5-lower-64 tokens, q35's
    // construction) and brute-forces the pairs.
    "q126_incremental_simhash" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.simhashPairsIncremental(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 10 === 0),
        maxHamming = 3)
        .orderBy(col("a"), col("b"))
    }),

    "q36_langid" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), TextOps.langIdUdf(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    "q37_quality_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"), TextOps.qualityScore(TextOps.tokens(col("text"))).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "q38_fingerprint" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          TextOps.fingerprintUdf(TextOps.tokens(col("text"))).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // --- similarity search -----------------------------------------------
    "q39_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val query = emb.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      Similarity.cosineTopK(emb.filter(col("vec_id") =!= 0), query, 10)
        .select(col("vec_id"), round(col("cos"), 5).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
    }),

    "q40_lsh_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val query = emb.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      // GATE parameters sized to stay exact-with-overwhelming-probability
      // through sf0.1 (probeHamming 2; 1 missed a true top-10 at 10x corpus)
      Similarity.lshTopK(emb.filter(col("vec_id") =!= 0), query, 10, nTables = 32, nBits = 8, probeHamming = 2)
        .select(col("vec_id"), round(col("cos"), 5).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
    }),

    // GATE-ONLY parameterization: nProbe = nCentroids (exhaustive probing)
    // makes IVF exact — the full assignment/probe/verify dataflow runs, and
    // the result equals the exact top-k oracle. The library default probes
    // 4 of 16 lists (the scale path; recall measured in OpsSpec).
    "q44_ivf_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val query = emb.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).toArray
      Similarity.ivfTopK(emb.filter(col("vec_id") =!= 0), query, 10,
          nCentroids = 16, nProbe = 16)
        .select(col("vec_id"), round(col("cos"), 5).as("cos"))
        .orderBy(col("cos").desc, col("vec_id"))
    }),

    "q42_embedding_neardup" -> ((s, dir) =>
      Dedup.embeddingNearDupExact(t(s, dir, "embeddings"), threshold = 0.45)
        .select(col("a"), col("b"), round(col("cos"), 5).as("cos"))
        .orderBy(col("a"), col("b"))),

    // GATE parameters sized to stay exact-with-overwhelming-probability
    // through sf0.1 (64 tables; 32 recalled 135/144 at 10x corpus)
    "q43_embedding_neardup_lsh" -> ((s, dir) =>
      Dedup.embeddingNearDupLsh(t(s, dir, "embeddings"), threshold = 0.45, nTables = 64)
        .select(col("a"), col("b"), round(col("cos"), 5).as("cos"))
        .orderBy(col("a"), col("b"))),

    "q41_embedding_stats" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      emb.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          (dbl(sum(Similarity.norm(col("embedding")).cast(DecimalType(18, 6)))) / count(lit(1))).as("avg_norm"))
        .orderBy(col("label"))
    }),

    // INCREMENTAL embedding near-dup: fresh vectors (vec_id % 10 = 0)
    // LSH-joined against the full corpus — corpus buckets never
    // self-join. Same exact-with-overwhelming-probability parameters as
    // q43 (64 tables), oracle = exact cosine pairs touching fresh.
    "q114_embedding_neardup_incr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Dedup.embeddingNearDupIncremental(
        emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0),
        threshold = 0.45, nTables = 64)
        .select(col("a"), col("b"), round(col("cos"), 5).as("cos"))
        .orderBy(col("a"), col("b"))
    }),

    // INCREMENTAL exact dedup: the fresh increment is a re-keyed copy of
    // a corpus slice (doc_id + 100000, same text — sf0.01 documents are
    // all distinct, so the dup relation is synthesized deterministically
    // and the oracle reproduces it verbatim); every fresh doc must
    // resolve to its original as keeper via the digest semi-join path.
    "q115_exact_dedup_incr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.incrementalExact(
        d,
        d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
        .orderBy(col("doc_id"))
    }),

    // --- multimodal plumbing ---------------------------------------------
    "q50_multimodal_decode" -> ((s, dir) => {
      val media = Multimodal.withPayload(t(s, dir, "documents"))
      Multimodal.decodeAll(s, media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"), col("format"), col("sha"))
        .orderBy(col("doc_id"))
    }),

    // REAL image decode: synthesize a real PNG/JPEG per doc in executors
    // (dimensions derived from doc_id), then header-probe the bytes back
    // through the JDK's ImageIO readers — the oracle recomputes the
    // expected dimensions from doc_id, so a decode that misparses the
    // container (or a fallback to the stub) breaks the hash. Encode and
    // probe both run partition-local; no shuffle.
    "q123_image_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          val fmt = if (id % 2 == 0) "png" else "jpeg"
          (id, Multimodal.ImageCodec.encode(
            1 + (id % 13).toInt, 1 + (id % 7).toInt, fmt, seed = id))
        }).toDF("doc_id", "payload")
      Multimodal.decodeAll(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("channels"), col("format"))
        .orderBy(col("doc_id"))
    }),

    // REAL image resize: synthesize real PNG/JPEG bytes per doc, resize
    // through the JDK pipeline (decode -> bilinear scale -> PNG), then
    // RE-PROBE the emitted bytes — the oracle recomputes the aspect-fit
    // dimensions from doc_id with integer arithmetic, so a wrong fit, a
    // non-PNG output, or a fallback to the stub all break the hash
    "q131_image_resize" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          val fmt = if (id % 2 == 0) "png" else "jpeg"
          (id, Multimodal.ImageCodec.encode(
            1 + (id % 13).toInt, 1 + (id % 7).toInt, fmt, seed = id))
        }).toDF("doc_id", "payload")
      val probed = udf((png: Array[Byte]) =>
        Multimodal.ImageCodec.probe(png)
          .map(m => Seq(m.width, m.height)).getOrElse(Seq(-1, -1)))
      Multimodal.resizeImages(s, media, maxW = 8, maxH = 8)
        .withColumn("pr", probed(col("png")))
        .select(col("doc_id"), col("src_w"), col("src_h"),
          col("out_w"), col("out_h"),
          col("pr")(0).as("probe_w"), col("pr")(1).as("probe_h"))
        .orderBy(col("doc_id"))
    }),

    // REAL audio header decode: synthesize a real WAV/AIFF/AU container
    // per doc in executors (sample rate / channels derived from doc_id via
    // the JDK's own audio writers), then header-probe the bytes back
    // through AudioSystem — the oracle recomputes the expected header
    // fields from doc_id, so a misparse (or a fallback to the stub)
    // breaks the hash. Encode and probe both run partition-local.
    "q129_audio_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          val fmt = (id % 3) match {
            case 0 => "wave"; case 1 => "aiff"; case _ => "au"
          }
          val rate = (id % 3) match {
            case 0 => 8000; case 1 => 16000; case _ => 44100
          }
          (id, Multimodal.AudioCodec.encode(rate,
            channels = 1 + (id % 2).toInt, frames = 4 + (id % 5).toInt,
            fileType = fmt, seed = id))
        }).toDF("doc_id", "payload")
      Multimodal.decodeAll(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("channels"), col("format"))
        .orderBy(col("doc_id"))
    }),

    // REAL video header decode across all three container families:
    // progressive MP4 (ftyp + moov{mvhd, trak{tkhd}}), fragmented MP4
    // (duration in moov{mvex{mehd}}, one moof — the streaming-origin
    // shape) and WebM/Matroska (EBML: Segment{Info, Tracks{TrackEntry
    // {Video}}}). Payloads are synthesized per doc in executors with
    // dimensions/brand derived from doc_id, then parsed back through
    // the box/EBML probes in decodeAll — the oracle recomputes the
    // expected header fields from doc_id, so a misparse (or a fallback
    // to the stub) breaks the hash. Encode and probe run partition-local.
    "q132_video_decode" -> ((s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents")
        .select(col("doc_id").cast("long")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 16 + (id % 640).toInt
          val h = 9 + (id % 480).toInt
          val payload = (id % 5) match {
            case 3 => Multimodal.VideoCodec.encodeFragmented(
              width = w, height = h,
              timescale = 1000L, durationTicks = 1000L * (1 + id % 30))
            case 4 => Multimodal.WebmCodec.encode(
              width = w, height = h, durationSec = (1 + id % 30).toDouble,
              unknownSegmentSize = id % 2 == 0)
            case _ =>
              val brand = (id % 3) match {
                case 0 => "isom"; case 1 => "mp42"; case _ => "avc1"
              }
              Multimodal.VideoCodec.encode(width = w, height = h,
                timescale = 1000L, durationTicks = 1000L * (1 + id % 30), brand)
          }
          (id, payload)
        }).toDF("doc_id", "payload")
      Multimodal.decodeAll(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("channels"), col("format"))
        .orderBy(col("doc_id"))
    }))

  /** DuckDB oracles. Keys absent here get the driver's rows-only check. */
  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_base_price,
        |CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
        |CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-06-30'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_year" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
        |CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY yr""".stripMargin,

    "q03_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q04_top_orders" ->
      """SELECT o_orderkey,
        |CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1996-06-15' AND o_orderdate < TIMESTAMP '1996-06-15'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q06_selective_filter" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |COUNT(*) AS n FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_brand_revenue" ->
      """SELECT p_brand,
        |CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q08_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q10_suppliers_with_returns" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_returnflag = 'R')
        |ORDER BY s_suppkey""".stripMargin,

    "q11_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(14,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q12_rank_parts" ->
      """SELECT p_brand, p_partkey, p_retailprice, rk FROM (
        |SELECT p_brand, p_partkey, p_retailprice,
        |DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |FROM part) WHERE rk <= 3 ORDER BY p_brand, rk, p_partkey""".stripMargin,

    "q13_order_deltas" ->
      """SELECT o_custkey, o_orderkey,
        |o_totalprice - LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q14_custkeys_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |EXCEPT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY custkey""".stripMargin,

    "q15_rollup_flags" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls,
        |COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls""".stripMargin,

    "q16_segment_stats" ->
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n,
        |CAST(SUM(CAST(c_acctbal AS DECIMAL(14,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q17_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
        |COUNT(*) AS n, CAST(SUM(CAST("value" AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q18_sessionization" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN epoch_ns(ts) - LAG(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sessioned AS (
        |  SELECT user_id, event_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged),
        |per_sess AS (SELECT user_id, sess, COUNT(*) AS sess_events FROM sessioned GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions, MAX(sess_events) AS max_sess_events, CAST(SUM(sess_events) AS BIGINT) AS n_events
        |FROM per_sess GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q19_events_top_users" ->
      """SELECT user_id, COUNT(*) AS n, CAST(SUM(CAST("value" AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20""".stripMargin,

    "q30_text_stats" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        |CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q31_lang_profile" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q32_exact_dedup" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper""".stripMargin,

    "q33_jaccard_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin,

    // q33's exact-Jaccard oracle restricted to pairs touching the fresh
    // slice (doc_id % 10 = 0): old×old pairs are out of scope by the
    // operator's contract, so the gate fails if the incremental path
    // either LEAKS an old×old pair or DROPS a fresh-touching one.
    "q113_incremental_jaccard" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |  AND (p.a % 10 = 0 OR p.b % 10 = 0)
        |ORDER BY a, b""".stripMargin,

    // q125 shares q113's oracle: the incremental LSH path is
    // exact-verified and the 32x2 gate bands make a recall miss
    // vanishingly unlikely, so the answer is the exact fresh-touching
    // Jaccard pair set
    "q125_incremental_minhash" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |  AND (p.a % 10 = 0 OR p.b % 10 = 0)
        |ORDER BY a, b""".stripMargin,

    // q34's LSH candidates are exact-verified against threshold 0.5, and the
    // band parameters make missing a true pair vanishingly unlikely, so the
    // oracle is the EXACT n-gram-Jaccard answer (same formulation as q33):
    // the gate fails if LSH drops a pair (recall) or leaks one (precision).
    "q34_minhash_lsh_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin,

    "q136_digest_scaling" -> {
      // the oracle states the digest chain directly; both engines emit
      // lowercase hex md5, and min/max over hex strings order identically
      val chain = (1 to 48).foldLeft(
        "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)" +
          " || '|' || CAST(r AS VARCHAR)")(
        (c, _) => s"md5($c)")
      s"""SELECT SUBSTRING(h, 1, 1) AS b, COUNT(*) AS n,
         |MIN(h) AS min_h, MAX(h) AS max_h
         |FROM (SELECT $chain AS h FROM lineitem,
         |  LATERAL (SELECT unnest(generate_series(1, 6)) AS r) t) u
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q51_decontamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
        |c AS (SELECT doc_id, gram FROM g WHERE doc_id % 17 <> 0),
        |s AS (SELECT doc_id, COUNT(*) AS total_grams FROM c GROUP BY 1),
        |o AS (SELECT c.doc_id, COUNT(*) AS overlap_grams FROM c JOIN b USING (gram) GROUP BY 1)
        |SELECT o.doc_id, o.overlap_grams, s.total_grams,
        |  CAST(o.overlap_grams AS DOUBLE) / CAST(s.total_grams AS DOUBLE) AS contamination
        |FROM o JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q49_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |c AS (SELECT doc_id, tok,
        |  CASE WHEN len(tok) <= 32 THEN 1
        |       ELSE CAST(CEIL((len(tok) - 8) / 24.0) AS BIGINT) END AS k FROM t),
        |x AS (SELECT doc_id, i - 1 AS chunk_id,
        |  array_to_string(tok[(i-1)*24 + 1 : (i-1)*24 + 32], ' ') AS chunk_text
        |  FROM c, LATERAL (SELECT unnest(generate_series(1, k)) AS i) r)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id, chunk_text,
        |  CAST(len(string_split(chunk_text, ' ')) AS INT) AS chunk_tokens
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin,

    // shard = floor(tokens-before-this-doc / budget), doc_id order —
    // DuckDB states it as the straightforward global running sum; the
    // Spark side must reproduce it from the two-phase distributed form
    "q130_token_packing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, toks,
        |  COALESCE(SUM(toks) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM t)
        |SELECT doc_id, toks, CAST(FLOOR(cb / 2048) AS BIGINT) AS shard
        |FROM c ORDER BY doc_id""".stripMargin,

    "q117_pii_redaction" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |  '@example.com from 10.0.' || CAST(doc_id % 200 AS VARCHAR) ||
        |  '.7 call +1415555' || CAST(doc_id % 10000 AS VARCHAR) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9]{7,15}', '<PHONE>', 'g') AS red,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(text,
        |    '\+[0-9]{7,15}')) AS INT) AS n_phones
        |FROM p ORDER BY doc_id""".stripMargin,

    "q48_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT doc_id,
        |  [tok[i] || ' ' || tok[i+1] FOR i IN generate_series(1, len(tok)-1)] AS g2,
        |  [tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] FOR i IN generate_series(1, len(tok)-2)] AS g3
        |  FROM t)
        |SELECT doc_id,
        |CASE WHEN len(g2) > 0 THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)/CAST(len(g2) AS DOUBLE) END AS rep2,
        |CASE WHEN len(g3) > 0 THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)/CAST(len(g3) AS DOUBLE) END AS rep3
        |FROM g ORDER BY doc_id""".stripMargin,

    "q118_keep_best" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2),
        |jp AS (SELECT p.a, p.b
        |      FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |      WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5),
        |edges AS (SELECT a AS x, b AS y FROM jp UNION SELECT b AS x, a AS y FROM jp),
        |reach(x, y) AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x WHERE e.y <> r.x),
        |members AS (SELECT DISTINCT x FROM edges),
        |comp AS (SELECT m.x AS doc_id, LEAST(m.x, MIN(r.y)) AS cluster
        |         FROM members m LEFT JOIN reach r ON r.x = m.x GROUP BY m.x),
        |lab AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster, d.n_chars
        |        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
        |rk AS (SELECT doc_id, cluster,
        |         ROW_NUMBER() OVER (PARTITION BY cluster
        |           ORDER BY n_chars DESC, doc_id ASC) AS rn FROM lab)
        |SELECT doc_id, cluster, (rn = 1) AS keep FROM rk ORDER BY doc_id""".stripMargin,

    "q45_dup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2),
        |jp AS (SELECT p.a, p.b
        |      FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |      WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5),
        |edges AS (SELECT a AS x, b AS y FROM jp UNION SELECT b AS x, a AS y FROM jp),
        |reach(x, y) AS (
        |  SELECT x, y FROM edges
        |  UNION
        |  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x WHERE e.y <> r.x),
        |members AS (SELECT DISTINCT x FROM edges)
        |SELECT m.x AS doc_id, LEAST(m.x, MIN(r.y)) AS cluster
        |FROM members m LEFT JOIN reach r ON r.x = m.x
        |GROUP BY m.x ORDER BY doc_id""".stripMargin,

    // sampling/split cuts: 0.25*8192=2048; val 819 = (0.1*8192).toInt,
    // test cut 2457 = 819 + (0.2*8192).toInt — hardcoded so both engines
    // truncate identically
    "q46_hash_sample" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 8192 < 2048
        |ORDER BY doc_id""".stripMargin,

    "q47_split" ->
      """SELECT CASE WHEN b < 819 THEN 'val' WHEN b < 2457 THEN 'test'
        |ELSE 'train' END AS split, COUNT(*) AS n
        |FROM (SELECT md5_number_lower(CAST(doc_id AS VARCHAR)) % 8192 AS b FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // scores stay internal (ln may differ in the last ulp across engines);
    // (tf, df, rank) are integers and rank ties break on the term string
    "q104_tfidf_terms" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df, rank FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |           ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df) DESC,
        |                    tf.term) AS rank
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q103_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |w AS (SELECT doc_id,
        |        md5_number_lower(array_to_string(list_slice(toks, i, i + 19), ' ')) AS h
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks) - 19)) AS i) s
        |      WHERE len(toks) >= 20),
        |d AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
        |tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM w GROUP BY 1),
        |dup AS (SELECT doc_id, COUNT(*) AS dup_windows
        |        FROM w WHERE h IN (SELECT h FROM d) GROUP BY 1)
        |SELECT dup.doc_id, tot.n_windows, dup.dup_windows
        |FROM dup JOIN tot USING (doc_id) ORDER BY doc_id""".stripMargin,

    // hex-digest ordering is engine-agnostic (unsigned), unlike the signed
    // 64-bit reinterpretation the bucket ops use
    "q102_stratified_sample" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM (SELECT lang, n_chars, row_number() OVER (
        |        PARTITION BY lang
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rk
        |      FROM documents)
        |WHERE rk <= 40 GROUP BY 1 ORDER BY 1""".stripMargin,

    // simhash/fingerprint hash tokens with md5-lower-64 (= DuckDB's
    // md5_number_lower), so the oracle recomputes the identical bits.
    "q35_simhash" ->
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents),
        |b AS (SELECT doc_id, bit, SUM(CASE WHEN (md5_number_lower(tok) >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS w
        |      FROM t CROSS JOIN (SELECT unnest(generate_series(0,63)) AS bit) bits GROUP BY 1,2)
        |SELECT doc_id, CAST(SUM(CASE WHEN w > 0 THEN (CASE WHEN bit = 63 THEN -9223372036854775808 ELSE (1::BIGINT << bit) END) ELSE 0 END) AS BIGINT) AS simhash
        |FROM b GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q126_incremental_simhash" ->
      """WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok FROM documents),
        |b AS (SELECT doc_id, bit, SUM(CASE WHEN (md5_number_lower(tok) >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS w
        |      FROM t CROSS JOIN (SELECT unnest(generate_series(0,63)) AS bit) bits GROUP BY 1,2),
        |f AS (SELECT doc_id, CAST(SUM(CASE WHEN w > 0 THEN (CASE WHEN bit = 63 THEN -9223372036854775808 ELSE (1::BIGINT << bit) END) ELSE 0 END) AS BIGINT) AS simhash
        |      FROM b GROUP BY doc_id)
        |SELECT fa.doc_id AS a, fb.doc_id AS b,
        |       CAST(bit_count(xor(fa.simhash, fb.simhash)) AS INTEGER) AS hamming
        |FROM f fa JOIN f fb ON fa.doc_id < fb.doc_id
        |WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3
        |  AND (fa.doc_id % 10 = 0 OR fb.doc_id % 10 = 0)
        |ORDER BY a, b""".stripMargin,

    "q36_langid" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(text, '\p{L}')) AS letters,
        |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}\x{3400}-\x{4DBF}]')) AS cjk,
        |    string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, text, letters, cjk,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für','von'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(['the','and','is','of','to','in','that','it','was','for'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los','es','en','una','por'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(['le','la','les','et','est','dans','une','que','pour','des'], x))) AS s_fr
        |  FROM f)
        |SELECT doc_id, CASE
        |  WHEN text IS NULL OR text = '' THEN 'unknown'
        |  WHEN letters > 0 AND cjk * 2 > letters THEN 'zh'
        |  WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'unknown'
        |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |  WHEN s_es >= s_fr THEN 'es'
        |  ELSE 'fr' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "q38_fingerprint" ->
      """SELECT doc_id, CAST(CASE WHEN m >= 9223372036854775808::HUGEINT THEN m - 18446744073709551616::HUGEINT ELSE m END AS BIGINT) AS fingerprint FROM (
        | SELECT doc_id, list_reduce(list_prepend(1125899906842597::HUGEINT, list_transform(string_split(text,' '), t -> md5_number_lower(t)::HUGEINT)), (a,x) -> (a*31+x) % 18446744073709551616::HUGEINT) AS m
        | FROM documents) ORDER BY doc_id""".stripMargin,

    "q37_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents)
        |SELECT doc_id,
        |0.5 * least(1.0, CAST(len(tok) AS DOUBLE) / 50.0)
        |+ 0.3 * (CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE))
        |+ 0.2 * (CAST(len(list_filter(tok, x -> list_contains(['the','a','an','of','and','to','in','is','on','for'], x))) AS DOUBLE) / CAST(len(tok) AS DOUBLE)) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,

    // selection happens on the UNROUNDED cosine with vec_id tie-break —
    // exactly what Spark's cosineTopK does — and only the presentation is
    // rounded, so a rounded tie at the rank-10 boundary can't diverge.
    "q39_cosine_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT e.vec_id,
        |  list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosx
        |FROM embeddings e, q WHERE e.vec_id <> 0),
        |t AS (SELECT vec_id, cosx FROM c ORDER BY cosx DESC, vec_id LIMIT 10)
        |SELECT vec_id, round(cosx, 5) AS cos FROM t ORDER BY cos DESC, vec_id""".stripMargin,

    // q40's multiprobe LSH ranks its candidates by the same exact cosine as
    // q39, and 32 tables x 8 bits x Hamming-1 probing makes missing a true
    // top-10 vector vanishingly unlikely — so the oracle is the exact top-10
    // (selected on the unrounded cosine, same as q39).
    "q40_lsh_ann" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT e.vec_id,
        |  list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosx
        |FROM embeddings e, q WHERE e.vec_id <> 0),
        |t AS (SELECT vec_id, cosx FROM c ORDER BY cosx DESC, vec_id LIMIT 10)
        |SELECT vec_id, round(cosx, 5) AS cos FROM t ORDER BY cos DESC, vec_id""".stripMargin,

    // q44 probes every IVF list at the gate (exhaustive), so the output is
    // the exact top-10 — same oracle as q39/q40
    "q44_ivf_ann" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT e.vec_id,
        |  list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosx
        |FROM embeddings e, q WHERE e.vec_id <> 0),
        |t AS (SELECT vec_id, cosx FROM c ORDER BY cosx DESC, vec_id LIMIT 10)
        |SELECT vec_id, round(cosx, 5) AS cos FROM t ORDER BY cos DESC, vec_id""".stripMargin,

    "q42_embedding_neardup" ->
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |round(list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |/ (sqrt(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 5) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |/ (sqrt(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) >= 0.45
        |ORDER BY a, b""".stripMargin,

    // q114 = q42's exact-cosine oracle restricted to pairs touching the
    // fresh slice (vec_id % 10 = 0): the gate fails if the incremental
    // LSH path leaks an old×old pair or drops a fresh-touching one.
    "q114_embedding_neardup_incr" ->
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |round(list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |/ (sqrt(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 5) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE (a.vec_id % 10 = 0 OR b.vec_id % 10 = 0)
        |AND list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |/ (sqrt(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) >= 0.45
        |ORDER BY a, b""".stripMargin,

    // the fresh increment is documents (doc_id % 10 = 0) re-keyed by
    // +100000 with unchanged text; texts are globally distinct, so each
    // fresh doc's sole digest-mate is its original — keeper = original id
    "q115_exact_dedup_incr" ->
      """SELECT doc_id + 100000 AS doc_id, doc_id AS keeper, md5(text) AS h
        |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,

    // q43's LSH candidates are exact-cosine-verified at the same threshold
    // as q42, so with 32 hash tables the output equals the exact answer.
    "q43_embedding_neardup_lsh" ->
      """SELECT a.vec_id AS a, b.vec_id AS b,
        |round(list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |/ (sqrt(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))), 5) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_sum(list_transform(generate_series(1, len(a.embedding)), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |/ (sqrt(list_sum(list_transform(a.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(b.embedding, x->CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) >= 0.45
        |ORDER BY a, b""".stripMargin,

    "q41_embedding_stats" ->
      """SELECT label, COUNT(*) AS n,
        |CAST(SUM(CAST(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "q50_multimodal_decode" ->
      """SELECT doc_id,
        |CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |CAST(3 AS INTEGER) AS channels,
        |CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q123_image_decode" ->
      """SELECT doc_id,
        |CAST(1 + doc_id % 13 AS INTEGER) AS width,
        |CAST(1 + doc_id % 7 AS INTEGER) AS height,
        |CAST(3 AS INTEGER) AS channels,
        |CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // aspect-fit resize into (8, 8): outW = max(1, min(8, w*8/h)) floor
    // division (and symmetrically outH); probe_w/h restate the same values
    // — the Spark side must read them back from the REAL emitted PNG
    "q131_image_resize" ->
      """WITH d AS (SELECT doc_id,
        |  CAST(1 + doc_id % 13 AS INTEGER) AS w,
        |  CAST(1 + doc_id % 7 AS INTEGER) AS h FROM documents),
        |f AS (SELECT doc_id, w, h,
        |  GREATEST(1, LEAST(8, (w * 8) // h)) AS ow,
        |  GREATEST(1, LEAST(8, (h * 8) // w)) AS oh FROM d)
        |SELECT doc_id, w AS src_w, h AS src_h,
        |  CAST(ow AS INTEGER) AS out_w, CAST(oh AS INTEGER) AS out_h,
        |  CAST(ow AS INTEGER) AS probe_w, CAST(oh AS INTEGER) AS probe_h
        |FROM f ORDER BY doc_id""".stripMargin,

    // audio header probe round-trip: width = sample rate, height = bits
    // per sample (encoder always writes 16-bit PCM), format = container
    "q129_audio_decode" ->
      """SELECT doc_id,
        |CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS INTEGER) AS width,
        |CAST(16 AS INTEGER) AS height,
        |CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |CASE doc_id % 3 WHEN 0 THEN 'wave' WHEN 1 THEN 'aiff' ELSE 'au' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // video header probe round-trip: width/height from tkhd 16.16 fixed
    // point, channels = trak count (encoder writes one), format = ftyp
    // major brand
    "q132_video_decode" ->
      """SELECT doc_id,
        |CAST(16 + doc_id % 640 AS INTEGER) AS width,
        |CAST(9 + doc_id % 480 AS INTEGER) AS height,
        |CAST(1 AS INTEGER) AS channels,
        |CASE WHEN doc_id % 5 = 3 THEN 'iso5'
        |     WHEN doc_id % 5 = 4 THEN 'webm'
        |     ELSE CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42' ELSE 'avc1' END
        |END AS format
        |FROM documents ORDER BY doc_id""".stripMargin) ++ FormatQueries.oracles ++ defaultTwinOracles

  /** q33_jaccard_default runs the library-default hot-gram guard
    * (maxDf = 2000). At gate scale the corpus has far fewer than 2000
    * documents, so no gram can exceed the cap and the guard is a no-op:
    * the default path's answer equals the exact n-gram Jaccard answer,
    * and the q33_jaccard_pairs oracle applies verbatim. */
  private def defaultTwinOracles: Map[String, String] = {
    val exactJaccard =
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
        |g AS (SELECT DISTINCT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
        |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tok)-2)) AS i) r
        |      WHERE len(tok) >= 3),
        |s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY 1),
        |p AS (SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS inter
        |      FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id GROUP BY 1, 2)
        |SELECT p.a, p.b, CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) AS jaccard
        |FROM p JOIN s sa ON p.a = sa.doc_id JOIN s sb ON p.b = sb.doc_id
        |WHERE CAST(p.inter AS DOUBLE) / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.5
        |ORDER BY a, b""".stripMargin
    Map("q33_jaccard_default" -> exactJaccard)
  }

  /** Headline benchmark subset (scan-agg, selective filter, join, window,
    * dedup, similarity — mirrors BASELINE.md's suggested shapes). */
  val headline: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_by_year", "q03_revenue_by_nation",
    "q06_selective_filter", "q11_running_total", "q17_events_hourly",
    "q32_exact_dedup", "q33_jaccard_pairs", "q33_jaccard_default",
    "q39_cosine_topk", "q63_partition_prune", "q78_sql_catalog",
    "q82_orc_source", "q83_avro_source",
    // metadata-only aggregation: expected ~0.1s regardless of table size
    // (the whole point — compare against q01's full-scan aggregate)
    "q94_agg_pushdown", "q98_partition_agg",
    // merge-on-read planning stress: ~5k live eq-delete files at sf0.1 —
    // guards the interval-index planning path with wall-clock, not only
    // MetaScaleSpec asserts (added round 14)
    "q110_mor_eq_planning",
    // incremental near-dup (added round 16): must bench well UNDER the
    // full-corpus q33 — the contrast is the point (pair volume tracks
    // the increment, not the corpus)
    "q113_incremental_jaccard",
    // store-amortized near-dup (added round 18): the production
    // steady-state shape — corpus MinHash signatures persisted in a graft
    // table (built once in warmup), measured passes pay only the fresh
    // increment's hashing + the band join; tracked round-over-round so
    // the amortization claim carries spreads, not one-shot probes
    "q127_signature_store",
    // store-amortized exact Jaccard (added round 18): the gram store is
    // persisted bucket[16](g) and read back through the catalog as a
    // storage-partitioned join — the corpus-scale side never shuffles;
    // tracked so the bucketed-store claim carries spreads too
    "q128_gram_store",
    // write-shaped entry (added round 20): partitioned write of events by
    // day(ts) through the unified fanout write path — the write side had
    // zero standing perf coverage before this; a fanout-routing or
    // clustering regression now moves a tracked number
    "q134_partitioned_write",
    // hash-DISTRIBUTED write twin (added round 20, optimization): same
    // rows through write.distribution-mode=hash — one exchange clusters
    // each day(ts) partition into a single task so the fanout write runs
    // in parallel; benched alongside q134 so the distribution win (and
    // its shuffle cost) carries spreads across rounds
    "q135_distributed_write",
    // parallel-scaling probe (added round 21, optimization): the only
    // headline entry whose wall-clock tracks CORE COUNT at sf0.1 (every
    // other query is overhead-bound there — r20's scaling block read
    // sec@8 <= sec@32 across the board), so the driver's low-core run
    // can finally see a parallelization regression
    "q136_digest_scaling")

  /** The 11 queries benched since round 1 — the stable cross-round signal.
    * Per-query times are ±20% noisy run to run; this subtotal is what the
    * BENCH series is compared on. Append-only: never remove entries (that
    * would break the like-for-like property); new queries join `headline`
    * and the all-query total instead. */
  val likeForLike11: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_by_year", "q03_revenue_by_nation",
    "q06_selective_filter", "q11_running_total", "q17_events_hourly",
    "q32_exact_dedup", "q33_jaccard_pairs", "q39_cosine_topk",
    "q63_partition_prune", "q78_sql_catalog")
}
