package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Training-data curation operators beyond the per-signal building blocks
  * in [[TextAnalysis]] — the composed / corpus-level passes a 100 TB
  * pipeline actually schedules (SURVEY.md §2.3 J):
  *
  *  - [[contamination]] — benchmark decontamination by n-gram containment;
  *  - [[piiScrub]] — regex PII redaction (emails / IPv4 / phone-shaped);
  *  - [[mixPlan]] — temperature-weighted source mixing plan;
  *  - [[filterFunnel]] — the composed keep/drop gate with a first-fail
  *    reason, stacking the length, stopword, repetition and language
  *    signals in one per-row pass.
  */
object Curation {

  // one tokenizer / scorer implementation, shared with TextAnalysis — the
  // funnel's "exactly consistent with the per-signal queries" contract is
  // structural (same Column expressions), not a maintained copy
  private def toks(text: Column): Column = TextAnalysis.toks(text)

  private def hitCount(tokens: Column, words: Seq[String]): Column =
    TextAnalysis.hitCount(tokens, words)

  // ------------------------------------------------- benchmark contamination

  /** Docs with id < EvalDocs form the "benchmark" set — a FIXED prefix, so
    * the broadcast eval-gram set is O(1) in corpus scale (the same
    * fixed-query-set discipline as [[SimSearch.NumQueries]]). */
  val EvalDocs = 20

  /** Benchmark contamination check (the decontamination pass every
    * training corpus runs against its eval suites): for each corpus doc,
    * the number of distinct word 5-grams it shares with ANY eval doc, its
    * total distinct 5-grams, and the containment rate. Only contaminated
    * docs (n_shared > 0) are emitted — at 100 TB that is the report a
    * pipeline materializes, not a row per clean doc.
    *
    * Shape: ONE corpus shingling pass; the eval-gram set is tiny and
    * BROADCAST into a left join, so corpus grams never shuffle for the
    * membership test; per-doc totals ride the same single groupBy
    * (wordShingles arrays are already distinct-per-doc, so plain count —
    * partial-aggregated map-side — replaces count_distinct). */
  def contamination(s: SparkSession, d: String, n: Int = 5): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, d)
      .select($"doc_id", explode(Dedup.wordShingles($"text", n)).as("g"))
    val evalGrams = grams.where($"doc_id" < EvalDocs).select($"g").distinct()
    grams.where($"doc_id" >= EvalDocs)
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy($"doc_id")
      .agg(sum(coalesce($"hit", lit(0L))).as("n_shared"),
           count(lit(1)).as("n_grams"))
      .where($"n_shared" > 0)
      .select($"doc_id", $"n_shared", $"n_grams",
        round($"n_shared".cast("double") / $"n_grams", 6).as("rate"))
  }

  // --------------------------------------------------------------- PII scrub

  /** Same regex dialect subset in Java (Spark) and RE2 (DuckDB): character
    * classes, bounded repetition — no backrefs, no lookaround. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "555-[0-9]{4}"

  /** PII redaction: count then replace emails, IPv4 addresses and
    * phone-shaped tokens with typed placeholder tags. The fixture corpus
    * is synthetic word salad with no PII, so each doc first gets a
    * deterministic injected contact tail (email + ip + phone derived from
    * doc_id) — FIXTURE STAGING, replayed identically by the oracle; the
    * operator under test is the scrubber. Entirely per-row regex
    * (codegen'd), zero shuffle — the map-side pass a 100 TB pipeline runs
    * inline with ingestion. Order matters and is fixed: emails first (an
    * email can embed digit runs), then IPs, then phones. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val injected = concat($"text",
      lit(" contact user"), $"doc_id".cast("string"),
      lit("@example.com ip 10.0."), pmod($"doc_id", lit(256L)).cast("string"),
      lit(".7 call 555-01"),
      lpad(pmod($"doc_id", lit(100L)).cast("string"), 2, "0"))
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace($"t", lit(EmailRe), lit("<EMAIL>")),
          lit(Ipv4Re), lit("<IP>")),
        lit(PhoneRe), lit("<PHONE>"))
    Tables.documents(s, d)
      .select($"doc_id", injected.as("t"))
      .select($"doc_id",
        size(regexp_extract_all($"t", lit(EmailRe), lit(0))).cast("bigint").as("n_email"),
        size(regexp_extract_all($"t", lit(Ipv4Re), lit(0))).cast("bigint").as("n_ip"),
        size(regexp_extract_all($"t", lit(PhoneRe), lit(0))).cast("bigint").as("n_phone"),
        scrubbed.as("scrubbed"))
  }

  // ---------------------------------------------------------------- mix plan

  /** Temperature-weighted source mixing plan (the multinomial-sampling
    * weights of multilingual/multi-source training): weight_i ∝
    * n_i^alpha with alpha = 0.5 — up-weights small sources relative to
    * proportional sampling — and integer per-source targets for a fixed
    * example budget. The plan is a per-source aggregate (tiny at any
    * corpus scale) that downstream samplers consume as a broadcast; the
    * actual draw is [[Maintenance.groupSampleOf]]-shaped. */
  def mixPlan(s: SparkSession, d: String, budget: Long = 1000L): DataFrame = {
    import s.implicits._
    val bySrc = Tables.documents(s, d)
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
      // √n scaled to an INTEGER (micro-units) per source BEFORE the
      // normalizer sums it: sum(sqrt(n)) as raw doubles was
      // order-dependent under partial aggregation on BOTH engines — it
      // flaked run-to-run under DuckDB's parallel sum when one source's
      // weight sat on a rounding boundary. sqrt (unlike pow(x, 0.5)) is
      // IEEE correctly-rounded, so li is bit-identical cross-engine, and
      // the integer sum is order-independent.
      .withColumn("li", round(sqrt($"n_docs") * 1e6).cast("bigint"))
    val z = bySrc.agg(sum($"li").as("z")) // integer normalizer
    bySrc.crossJoin(broadcast(z)) // 1-row scalar
      .select($"source", $"n_docs",
        // weight in parts-per-million via INTEGER floor-div — round(li/z, 6)
        // would put the hash-compared column right back on the cross-engine
        // half-boundary rounding class the integer normalizer exists to dodge
        expr("(li * 1000000) div z").as("weight_ppm"),
        floor((lit(budget) * $"li") / $"z").cast("bigint").as("target_docs"))
  }

  // ------------------------------------------------------------ filter funnel

  /** The composed curation gate: every quality signal evaluated in ONE
    * per-row pass, emitting keep + the FIRST failing rule (the funnel
    * report that tells a pipeline owner what each rule costs in yield).
    * Rule order is fixed: too_short → low_stopword → repetitive → lang.
    * Thresholds compare the same 6dp-rounded ratios the per-signal
    * queries emit, so the funnel is exactly consistent with
    * [[TextAnalysis.quality]] / [[TextAnalysis.repetitionOf]] /
    * [[TextAnalysis.langId]]. Pure map — zero exchanges (plan-asserted),
    * the gate a 100 TB pass runs before anything shuffle-bearing. */
  def filterFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", length($"text").as("n_chars"), toks($"text").as("tk"))
      .select($"doc_id", funnelReason.as("reason"), (funnelReason === "keep").as("keep"))
  }

  /** The funnel's first-fail reason, over a projection carrying `n_chars`
    * and the token array `tk` — ONE expression shared by [[filterFunnel]]
    * and the composed [[pipelineReport]]. */
  private def funnelReason: Column = {
    val tk = col("tk")
    val nToks = size(tk)
    val stopRatio =
      round(hitCount(tk, TextAnalysis.StopwordSets.head._2).cast("double") / nToks, 6)
    val bi = Dedup.wordShinglesOf(tk, 2) // with multiplicity
    val dupBigramFrac = when(size(bi) > 0,
        round(lit(1.0) - size(array_distinct(bi)).cast("double") / size(bi), 6))
      .otherwise(0.0)
    val topTokFrac =
      round(TextAnalysis.topTokenCount(tk).cast("double") / nToks, 6)
    when(col("n_chars") < 100 || nToks < 20, "too_short")
      .when(stopRatio < 0.05, "low_stopword")
      .when(dupBigramFrac > 0.2 || topTokFrac > 0.3, "repetitive")
      .when(TextAnalysis.langPredOf(tk) =!= "en", "lang")
      .otherwise("keep")
  }

  // --------------------------------------------------- end-to-end pipeline

  /** The FLAGSHIP composed pass — the actual shape of a production
    * curation job, chaining the library's operators over one corpus scan:
    *
    *   quality gate ([[funnelReason]], pure map) →
    *   exact dedup (deterministic representative: min doc_id per sha2(text),
    *   ONE window shuffle on the content hash — 32-byte keys, never text) →
    *   content-addressed train/val/test assignment
    *   ([[Maintenance.bucketCol]], per-row arithmetic) →
    *   per-(split, source) report: doc count + whitespace-token budget.
    *
    * One scan, one shuffle for the dedup window, one partial-aggregated
    * groupBy — the 100 TB plan is exactly this, just wider. Every stage
    * reuses the SAME expressions the per-signal queries assert, so the
    * pipeline's semantics are pinned transitively by their oracles; the
    * composed DuckDB oracle replays the whole chain end-to-end. */
  def pipelineReport(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val kept = Tables.documents(s, d)
      .select($"doc_id", $"text", $"source",
        length($"text").as("n_chars"), toks($"text").as("tk"))
      .where(funnelReason === "keep")
    val w = Window.partitionBy(sha2($"text", 256)).orderBy($"doc_id")
    val deduped = kept
      .withColumn("rn", row_number().over(w)).where($"rn" === 1)
    val bucket = Maintenance.bucketCol
    deduped
      .select(when(bucket < 90, "train").when(bucket < 95, "val")
                .otherwise("test").as("split"),
              $"source", size($"tk").as("n_toks"))
      .groupBy($"split", $"source")
      .agg(count(lit(1)).as("n_docs"),
           sum($"n_toks").cast("bigint").as("sum_toks"))
  }

  // ------------------------------------------------------- blocklist bloom

  /** Bloom geometry: m = 8192 bits (128 longs — a fixed-size bitmap
    * whatever the corpus), k = 5 hash functions. At the fixture's worst
    * case (sf0.1: 500 blocklist keys) the false-positive rate is
    * (1 − e^(−kn/m))^k ≈ 1.3e-3 — far inside the 1% bound the query
    * asserts. A production deployment sizes m from |blocklist|·10 bits;
    * the structure is corpus-scale-free either way. */
  val BloomBits = 8192
  val BloomHashes = 5

  /** k seeded positions for one key. xxhash64(key, seed) keeps the whole
    * family codegen'd — no UDFs in the build or probe path. */
  private def bloomPositions(key: Column): Column =
    array((0 until BloomHashes).map(i =>
      pmod(xxhash64(key, lit(i)), lit(BloomBits.toLong))): _*)

  /** Distributed Bloom-filter build + probe — dedup-against-blocklist,
    * the pre-join membership filter a 100 TB ingest runs before paying an
    * exact anti-join (same role as Spark's own runtime-filter
    * BloomFilterAggregate, built here from declarative pieces so the
    * bitmap is an inspectable artifact):
    *
    *  - BUILD: blocklist = the already-ingested snapshot (doc_id % 10
    *    == 0), keyed by sha2(text). Each key explodes to k bit
    *    positions; `groupBy(word) bit_or(1L << bit)` assembles the
    *    bitmap — ≤128 rows, shuffle carries O(k·|blocklist|) longs,
    *    never documents.
    *  - PROBE: every doc's k positions LEFT-join the BROADCAST bitmap
    *    (O(1) in corpus scale); a doc is a bloom member iff all k bits
    *    are set (min over hit flags).
    *  - The exact answer (semi-join on the full hash) runs beside it and
    *    the output row asserts the two Bloom guarantees: zero false
    *    negatives (every exact member bloom-hits) and false positives
    *    under 1% of non-members.
    *
    * Output one row (n_docs, n_members, no_false_neg_ok, fp_ok); the
    * oracle recomputes n_docs/n_members exactly and asserts both flags
    * constant-true. */
  def blocklistBloom(s: SparkSession, d: String): DataFrame =
    blocklistBloomOf(Tables.documents(s, d))

  /** Core over any (doc_id, text, …) frame — exposed so specs can plant
    * duplicates and assert the no-false-negative guarantee end-to-end. */
  def blocklistBloomOf(docsRaw: DataFrame): DataFrame = {
    val s = docsRaw.sparkSession
    import s.implicits._
    val docs = docsRaw.select($"doc_id", sha2($"text", 256).as("h"))
    val block = docs.where(pmod($"doc_id", lit(10L)) === 0)
    val bitmap = block
      .select(explode(bloomPositions($"h")).as("pos"))
      .select(($"pos" / 64).cast("long").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("m"))
      .groupBy($"word").agg(bit_or($"m").as("mask"))
    val bloomHits = docs
      .select($"doc_id", explode(bloomPositions($"h")).as("pos"))
      .select($"doc_id", ($"pos" / 64).cast("long").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("m"))
      .join(broadcast(bitmap), Seq("word"), "left")
      .select($"doc_id",
        (coalesce($"mask", lit(0L)).bitwiseAND($"m") =!= 0).cast("int").as("hit"))
      .groupBy($"doc_id").agg(min($"hit").as("bloom_member"))
    val exact = docs.join(
        broadcast(block.select($"h").distinct().withColumn("em", lit(1))),
        Seq("h"), "left")
      .select($"doc_id", coalesce($"em", lit(0)).as("exact_member"))
    exact.join(bloomHits, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"exact_member").cast("bigint").as("n_members"),
        max(when($"exact_member" === 1 && $"bloom_member" === 0, 1).otherwise(0))
          .as("false_neg"),
        sum(when($"exact_member" === 0 && $"bloom_member" === 1, 1).otherwise(0))
          .as("n_fp"))
      .select($"n_docs", $"n_members",
        ($"false_neg" === 0).cast("long").as("no_false_neg_ok"),
        ($"n_fp" <= ($"n_docs" - $"n_members") * 0.01).cast("long").as("fp_ok"))
  }

  // ------------------------------------------------------- quality pruning

  /** Percentile-threshold quality pruning: keep documents whose stopword
    * ratio (the [[TextAnalysis.quality]] signal, 6dp-rounded) is at or
    * above the corpus's exact 25th percentile — "drop the worst quartile",
    * the relative-threshold prune corpus curation uses when an absolute
    * cutoff is unknown. The threshold is ONE interpolated-percentile
    * scalar (distributed aggregate, no global sort) cross-joined back as
    * a broadcast; membership is stable because scores are 6dp-spaced
    * while cross-engine threshold arithmetic agrees to ~1e-15. At 100 TB
    * the same shape holds with approx_percentile when the exact sketch
    * is too slow — the fixture asserts the exact path. */
  def qualityPrune(s: SparkSession, d: String, p: Double = 0.25): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, d)
      .select($"doc_id", toks($"text").as("tk"))
      .select($"doc_id",
        round(hitCount($"tk", TextAnalysis.StopwordSets.head._2).cast("double")
          / size($"tk"), 6).as("score"))
    val thr = scored.agg(percentile($"score", lit(p)).as("thr"))
    scored.crossJoin(broadcast(thr)) // 1-row scalar
      .where($"score" >= $"thr")
      .select($"doc_id", $"score")
  }

  /** CIDR blocklist, parsed once: (prefixLen, shifted network int).
    * The single source of truth for BOTH the engine predicate and the
    * generated oracle SQL literals. */
  private[operators] val CidrBlocklist: Seq[(Int, Long)] =
    Seq("17.0.0.0/8", "50.0.0.0/8", "99.112.0.0/12",
        "120.42.0.0/16", "23.160.0.0/16").map { c =>
      val Array(net, p) = c.split("/")
      val o = net.split("\\.").map(_.toLong)
      val ip = (o(0) << 24) | (o(1) << 16) | (o(2) << 8) | o(3)
      (p.toInt, ip >> (32 - p.toInt))
    }

  /** Deterministic per-user synthetic client IP (the fixture carries no
    * network column): octets derived from user_id by coprime multipliers
    * — engine and oracle replay the identical arithmetic. */
  private def ipCol: Column =
    (col("user_id") % 223 + 1) * 16777216L +
      (col("user_id") * 7 % 256) * 65536L +
      (col("user_id") * 13 % 256) * 256L +
      (col("user_id") * 29 % 256)

  /** IP/CIDR blocklist filtering — the crawl-hygiene gate every
    * training-data ingest runs (datacenter ranges, known-abuse
    * networks). The matcher is the per-prefix-length compiled form of a
    * longest-prefix trie: the CIDR list is grouped by prefix length and
    * each group becomes ONE integer set-membership test on the
    * correspondingly right-shifted address — per row, zero joins, the
    * blocklist travels as broadcast literals (at a million-entry real
    * blocklist, the same grouping becomes one broadcast hash semi-join
    * per distinct prefix length — typically ≤ 25 — with identical
    * semantics). Shifts are floor division on non-negative ints, so
    * DuckDB replays them with `//` bit-exactly. */
  def ipBlocklist(s: SparkSession, d: String): DataFrame =
    ipBlocklistOf(Tables.events(s, d))

  /** Core over any (event_type, user_id) frame — the declared query and
    * CurationSpec's planted-CIDR law both drive this path. */
  def ipBlocklistOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    ipFlagsOf(events)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"blocked").as("n_blocked"),
        count_distinct(when($"blocked" === 1, $"user_id")).as("n_users_blocked"),
        (count(lit(1)) - sum($"blocked")).as("n_kept"))
  }

  /** Per-row flag frame: (event_type, user_id, ip, blocked). */
  private[operators] def ipFlagsOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val blockedPred = CidrBlocklist.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, nets) =>
        shiftright($"ip", 32 - p).isin(nets.map(_._2): _*)
      }
      .reduce(_ || _)
    events.select($"event_type", $"user_id")
      .withColumn("ip", ipCol.cast("bigint"))
      .withColumn("blocked", blockedPred.cast("bigint"))
  }

  /** k-anonymity / l-diversity audit (Sweeney; Machanavajjhala et al.) —
    * the release gate run before any user-grained table ships to a
    * training pipeline or external party. Quasi-identifier groups
    * (nation × market segment: the columns an adversary can join from
    * public data) are audited for group size ≥ k (re-identification
    * resistance) and for ≥ l distinct values of the SENSITIVE attribute
    * (banded account balance) within each group — k-anonymity alone is
    * defeated by a homogeneous group (everyone in the group shares the
    * sensitive value, so "anonymity" reveals it; that is the l-diversity
    * gap). Thresholds k=10 / l=6 sit where the sf0.01 fixture exercises
    * BOTH flag values (35 k-violations, 15 l-violations of 125 groups).
    * One grouped aggregate with a distinct-count — map-side partials +
    * one Expand pass, the same 100 TB shape as any count_distinct
    * rollup; no per-row state, no self-joins. The violating groups are
    * exactly the rows a generalization/suppression pass would rewrite
    * next. */
  def kAnonymity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000).cast("bigint").as("sens_band"))
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        countDistinct($"sens_band").as("sens_distinct"))
      .select($"c_nationkey", $"c_mktsegment", $"n", $"sens_distinct",
        ($"n" >= 10).cast("bigint").as("k_ok"),
        ($"sens_distinct" >= 6).cast("bigint").as("l_ok"))
  }

  // ----------------------------------------------------------------- oracles

  private lazy val oracleBase: Map[String, String] = {
    val en = TextAnalysis.StopwordSets.head._2.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    val langHits = TextAnalysis.StopwordSets.map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(tk, t -> list_contains($lst, t))) AS c_$l"
    }.mkString(",\n                 ")
    // IP + CIDR predicate generated from CidrBlocklist — one source of
    // truth with the engine; shifts replayed as floor division
    val ipSql = "(((user_id % 223) + 1) * 16777216 + ((user_id * 7) % 256) * 65536" +
      " + ((user_id * 13) % 256) * 256 + ((user_id * 29) % 256))"
    val blockedSql = CidrBlocklist.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (p, nets) =>
        s"(ip // ${1L << (32 - p)}) IN (${nets.map(_._2).mkString(", ")})"
      }.mkString(" OR ")
    Map(
      "curate_k_anonymity" -> """
        WITH g AS (
          SELECT c_nationkey, c_mktsegment, count(*) AS n,
                 count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                   AS sens_distinct
          FROM customer
          GROUP BY 1, 2)
        SELECT c_nationkey, c_mktsegment, n, sens_distinct,
               CAST(n >= 10 AS BIGINT) AS k_ok,
               CAST(sens_distinct >= 6 AS BIGINT) AS l_ok
        FROM g""",

      "curate_ip_blocklist" -> s"""
        WITH f AS (
          SELECT event_type, user_id, $ipSql AS ip FROM events),
        b AS (
          SELECT event_type, user_id,
                 CASE WHEN $blockedSql THEN 1 ELSE 0 END AS blocked
          FROM f)
        SELECT event_type, count(*) AS n_events,
               CAST(sum(blocked) AS BIGINT) AS n_blocked,
               count(DISTINCT CASE WHEN blocked = 1 THEN user_id END)
                 AS n_users_blocked,
               CAST(count(*) - sum(blocked) AS BIGINT) AS n_kept
        FROM b GROUP BY event_type""",

      "curate_contamination" -> s"""
        WITH base AS (
          SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
        ng AS (
          SELECT DISTINCT doc_id,
                 array_to_string(tk[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS g
          FROM base JOIN generate_series(1, ${TextAnalysis.MaxDocTokens}) gs(i) ON i <= len(tk) - 4),
        ev AS (SELECT DISTINCT g FROM ng WHERE doc_id < $EvalDocs)
        SELECT doc_id,
               CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               count(*) AS n_grams,
               round(CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS rate
        FROM ng LEFT JOIN ev ON ng.g = ev.g
        WHERE ng.doc_id >= $EvalDocs
        GROUP BY ng.doc_id
        HAVING sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) > 0""",

      "curate_pii_scrub" -> s"""
        WITH inj AS (
          SELECT doc_id,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.7 call 555-01'
                      || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ip,
               CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
                   '$Ipv4Re', '<IP>', 'g'),
                 '$PhoneRe', '<PHONE>', 'g') AS scrubbed
        FROM inj""",

      "curate_blocklist_bloom" -> """
        SELECT count(*) AS n_docs,
               CAST(sum(CASE WHEN EXISTS (
                 SELECT 1 FROM documents b
                 WHERE b.doc_id % 10 = 0 AND b.text = d.text)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
               CAST(1 AS BIGINT) AS no_false_neg_ok,
               CAST(1 AS BIGINT) AS fp_ok
        FROM documents d""",

      "curate_quality_prune" -> s"""
        WITH sc AS (
          SELECT doc_id,
                 round(CAST(len(list_filter(string_split(lower(text), ' '),
                         t -> list_contains($en, t))) AS DOUBLE)
                       / len(string_split(lower(text), ' ')), 6) AS score
          FROM documents),
        thr AS (SELECT quantile_cont(score, 0.25) AS thr FROM sc)
        SELECT doc_id, score FROM sc, thr WHERE score >= thr""",

      "curate_mix_plan" -> """
        WITH bysrc AS (
          SELECT source, count(*) AS n_docs,
                 CAST(round(sqrt(n_docs) * 1000000) AS BIGINT) AS li
          FROM documents GROUP BY source),
        z AS (SELECT sum(li) AS z FROM bysrc)
        SELECT source, n_docs,
               CAST((li * 1000000) // z AS BIGINT) AS weight_ppm,
               CAST(floor(CAST(1000 * li AS DOUBLE) / CAST(z AS DOUBLE)) AS BIGINT)
                 AS target_docs
        FROM bysrc, z""",

      "curate_filter_funnel" -> s"""
        WITH base AS (
          SELECT doc_id, length(text) AS n_chars,
                 string_split(lower(text), ' ') AS tk
          FROM documents),
        topf AS (
          SELECT doc_id, max(c) AS maxc FROM (
            SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, unnest(tk) AS w FROM base) GROUP BY doc_id, w)
          GROUP BY doc_id),
        bistat AS (
          SELECT doc_id, count(*) AS nb, count(DISTINCT g) AS nbd FROM (
            SELECT doc_id, tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS g
            FROM base JOIN generate_series(1, ${TextAnalysis.MaxDocTokens}) gs(i) ON i <= len(tk) - 1)
          GROUP BY doc_id),
        feat AS (
          SELECT b.doc_id, n_chars, len(tk) AS n_toks,
                 round(CAST(len(list_filter(tk, t -> list_contains($en, t)))
                            AS DOUBLE) / len(tk), 6) AS stop_ratio,
                 round(COALESCE(1.0 - CAST(nbd AS DOUBLE) / nb, 0.0), 6) AS dupf,
                 round(CAST(maxc AS DOUBLE) / len(tk), 6) AS topfrac,
                 $langHits
          FROM base b
          JOIN topf ON b.doc_id = topf.doc_id
          LEFT JOIN bistat ON b.doc_id = bistat.doc_id),
        pred AS (
          SELECT *, greatest(c_en, c_de, c_es, c_fr, c_zh) AS best FROM feat)
        SELECT doc_id,
               CASE
                 WHEN n_chars < 100 OR n_toks < 20 THEN 'too_short'
                 WHEN stop_ratio < 0.05 THEN 'low_stopword'
                 WHEN dupf > 0.2 OR topfrac > 0.3 THEN 'repetitive'
                 WHEN NOT (c_en = best AND best > 0) THEN 'lang'
                 ELSE 'keep' END AS reason,
               (CASE
                 WHEN n_chars < 100 OR n_toks < 20 THEN 'too_short'
                 WHEN stop_ratio < 0.05 THEN 'low_stopword'
                 WHEN dupf > 0.2 OR topfrac > 0.3 THEN 'repetitive'
                 WHEN NOT (c_en = best AND best > 0) THEN 'lang'
                 ELSE 'keep' END) = 'keep' AS keep
        FROM pred"""
    )
  }

  /** The composed pipeline oracle REUSES the funnel oracle as a subquery
    * (CTE-in-subquery — the same structural-sharing discipline as the
    * Spark side reusing [[funnelReason]]), then replays dedup, the
    * hex-arithmetic split buckets, and the report. */
  private lazy val pipelineOracle: Map[String, String] = Map(
    "curate_pipeline" -> s"""
      WITH funnel AS (SELECT * FROM (${oracleBase("curate_filter_funnel")}) fq),
      kept AS (
        SELECT d.doc_id, d.text, d.source FROM documents d
        JOIN funnel ON d.doc_id = funnel.doc_id
        WHERE funnel.reason = 'keep'),
      dedup AS (
        SELECT doc_id, text, source FROM (
          SELECT kept.*, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM kept) t
        WHERE rn = 1)
      SELECT CASE WHEN ${Maintenance.hexBucketSql} < 90 THEN 'train'
                  WHEN ${Maintenance.hexBucketSql} < 95 THEN 'val'
                  ELSE 'test' END AS split,
             source, count(*) AS n_docs,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS sum_toks
      FROM dedup GROUP BY 1, 2""")

  val oracle: Map[String, String] = oracleBase ++ pipelineOracle
}
