package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Corpus-preparation operators — the curation passes a large-scale
  * training-data pipeline runs between raw ingest (the reference's
  * Kafka→parquet path) and tokenization: PII redaction, Gopher-style
  * quality gates, deterministic train/val/test assignment, fixed-stride
  * token chunking, paragraph/span-level exact dedup, and corpus
  * vocabulary profiling.
  *
  * Scale notes (100 TB): every operator here is either a narrow per-doc
  * map (PII, Gopher, split, chunking — linear in input splits, no
  * shuffle except the presentation sort) or a single hash shuffle on a
  * bounded key (span hash, term). Nothing collects to the driver and no
  * per-key state grows beyond the corpus-frequency count it aggregates.
  * All arithmetic is engine-agnostic (md5, RE2∩Java regex, integer
  * division) so the DuckDB oracle reproduces results bit-for-bit.
  */
object Corpus {

  // --- PII redaction --------------------------------------------------

  /** Patterns restricted to syntax shared by Java regex and RE2 (no
    * lookaround) so the oracle agrees. Applied in declaration order —
    * the replacement tokens contain no digits, so later passes never
    * re-match earlier redactions. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val IpRe    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Deterministic synthetic-PII injection: the test corpus carries no
    * digits or addresses, so the operator's inputs are derived from
    * doc_id identically in both engines — the redactor is exercised on
    * every row instead of trivially matching nothing. */
  def withSyntheticPii(text: Column, docId: Column): Column =
    concat(text,
      lit(" contact user"), docId.cast("string"),
      lit("@example.com call 555-"),
      lpad((docId % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((docId % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (docId % 256).cast("string"),
      lit("."), expr("(doc_id div 7) % 256").cast("string"), lit(".9"))

  /** The redaction formula as one struct-valued Column — counts each
    * PII class on the raw text, then rewrites email → phone → ip. */
  def piiRedactCol(text: Column): Column = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"),
        IpRe, "<IP>")
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(text, lit(IpRe), lit(0))).as("n_ips"),
      redacted.as("redacted"))
  }

  /** PII redaction pass: inject deterministic synthetic PII, count and
    * strip emails / NANP phone numbers / IPv4 addresses. Narrow map —
    * one codegen'd pass per split. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        piiRedactCol(withSyntheticPii(col("text"), col("doc_id"))).as("p"))
      .select(col("doc_id"), col("p.*"))
      .orderBy("doc_id")

  // --- Gopher-style quality gates --------------------------------------

  /** Gopher rule thresholds (Rae et al. 2021 §A1.1, adapted to the
    * short synthetic docs: the word-count floor is 40, not 50, so the
    * gate splits the corpus instead of failing it wholesale). */
  val MinWords = 40
  val MaxWords = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinAlphaFrac = 0.8
  val MinDistinctStopwords = 2

  /** The Gopher-gate formula as one struct-valued Column. */
  def gopherCol(text: Column): Column = gopherFromTokens(tokens(text))

  /** Gate math over an ALREADY-TOKENIZED column. Callers that tokenize
    * once and reuse the array must use this form: codegen's
    * subexpression elimination does not reach inside higher-order
    * functions, so passing `tokens(expensive_chain)` to the struct
    * below re-evaluates the full chain per lambda (measured ~4× the
    * per-row cost in corpusBuild). */
  def gopherFromTokens(ts: Column): Column = {
    val n = size(ts)
    val meanLen = round(
      aggregate(transform(ts, t => length(t)), lit(0), (a, x) => a + x)
        .cast("double") / n, 4)
    val alphaFrac = round(
      size(filter(ts, t => t.rlike("[a-z]"))).cast("double") / n, 4)
    val nStop = size(array_intersect(
      array_distinct(ts), array(TextAnalysis.Stopwords.map(lit): _*)))
    val passWords = n.between(MinWords, MaxWords)
    val passLen   = meanLen.between(MinMeanWordLen, MaxMeanWordLen)
    val passAlpha = alphaFrac >= MinAlphaFrac
    val passStop  = nStop >= MinDistinctStopwords
    struct(
      n.as("n_words"),
      meanLen.as("mean_word_len"),
      alphaFrac.as("alpha_frac"),
      nStop.as("n_stopwords"),
      passWords.as("pass_words"),
      passLen.as("pass_word_len"),
      passAlpha.as("pass_alpha"),
      passStop.as("pass_stop"),
      (passWords && passLen && passAlpha && passStop).as("gopher_pass"))
  }

  /** Gopher-style document quality gates: word count, mean word length,
    * alphabetic-word fraction, distinct-stopword floor, and the combined
    * keep/drop verdict. Narrow map. */
  def gopherFilters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), gopherCol(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
      .orderBy("doc_id")

  // --- Deterministic train/val/test split ------------------------------

  /** Hex-prefix thresholds over md5("split:" || doc_id): buckets are
    * uniform over the first byte, so 'e6'/'f3' give a 90/5/5 split
    * (230, 13, 13 of 256). String comparison on lowercase hex is
    * byte-identical in both engines. */
  val TrainUpper = "e6"
  val ValUpper   = "f3"

  def splitCol(docId: Column): Column = {
    val bucket = substring(md5(concat(lit("split:"), docId.cast("string"))), 1, 2)
    struct(
      bucket.as("bucket"),
      when(bucket < TrainUpper, "train")
        .when(bucket < ValUpper, "val")
        .otherwise("test").as("split"))
  }

  /** Deterministic train/val/test assignment — the reproducible
    * hash-split every training pipeline needs: no RNG, stable under
    * re-runs, re-partitioning and corpus growth (a doc's split never
    * changes when other docs arrive). Narrow map. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), splitCol(col("doc_id")).as("s"))
      .select(col("doc_id"), col("s.*"))
      .orderBy("doc_id")

  // --- Fixed-stride token chunking --------------------------------------

  /** Context-window chunking: 32-token windows advancing 24 tokens
    * (8-token overlap so no boundary n-gram is lost). */
  val ChunkSize = 32
  val ChunkStride = 24

  /** Chunk rows (doc_id, chunk_id, n_toks, chunk): every doc with ≥ 1
    * token emits ⌈max(n−size,0)/stride⌉+1 windows. Pure Catalyst
    * (sequence/posexplode/slice) — a narrow flatMap, no shuffle. */
  def tokenChunks(spark: SparkSession, dir: String): DataFrame = {
    val nChunks = when(col("n") <= ChunkSize, lit(1L))
      .otherwise(expr(s"(n - $ChunkSize + ${ChunkStride - 1}) div $ChunkStride + 1"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .withColumn("n", size(col("t")).cast("long"))
      .select(col("doc_id"), col("n"), col("t"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"),
        col("chunk_id").cast("int").as("chunk_id"),
        least(lit(ChunkSize), col("n") - col("chunk_id") * ChunkStride)
          .cast("int").as("n_toks"),
        array_join(
          slice(col("t"), (col("chunk_id") * ChunkStride + 1).cast("int"),
            lit(ChunkSize)), " ").as("chunk"))
      .orderBy("doc_id", "chunk_id")
  }

  // --- Span-level (paragraph) exact dedup -------------------------------

  /** Span width for paragraph-style exact dedup. The corpus has no line
    * structure (single-line synthetic docs), so the CCNet/Dolma
    * paragraph unit degenerates to fixed non-overlapping token spans —
    * on real data the splitter would be `split(text, '\n')` with the
    * identical downstream plan. */
  val SpanTokens = 16

  /** Paragraph/span-level exact dedup profile: hash every
    * non-overlapping [[SpanTokens]]-token span, count occurrences
    * corpus-wide, report per-doc duplicated-span fraction and the
    * keep verdict (< 50 % duplicated content).
    *
    * Plan: one narrow flatMap to span hashes, ONE hash shuffle on the
    * span md5 (a count window — each row learns its span's corpus
    * frequency in the shuffle that grouped it), one shuffle back on
    * doc_id for the per-doc profile. The span-count
    * frame is the only stateful piece and is corpus-frequency bounded —
    * at 100 TB it is a bucketed table incrementally maintained, exactly
    * like the exact-dedup hash index. The 4-decimal fraction is rounded
    * in INTEGER arithmetic (half-up) so partial-agg order and engine
    * rounding can't disagree. */
  def spanDedup(spark: SparkSession, dir: String): DataFrame = {
    val nSpans = expr(s"(n + ${SpanTokens - 1}) div $SpanTokens")
    val spans = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .withColumn("n", size(col("t")).cast("long"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), nSpans - 1)).as("sp"))
      .select(col("doc_id"),
        md5(array_join(
          slice(col("t"), (col("sp") * SpanTokens + 1).cast("int"),
            lit(SpanTokens)), " ")).as("h"))
    // corpus-wide span counts as a window over h: the span frame appears
    // ONCE in the plan (one explode+md5 pass) and the count reaches each
    // row in the same shuffle — the groupBy+join-back form paid the
    // explode twice and shuffled three times
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
    spans.withColumn("c", count(lit(1)).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_spans"),
        sum(when(col("c") >= 2, 1).otherwise(0)).cast("int").as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        (expr("(2 * 10000 * n_dup_spans + n_spans) div (2 * n_spans)")
          .cast("double") / 10000.0).as("dup_frac"))
      .withColumn("keep", col("dup_frac") < 0.5)
      .orderBy("doc_id")
  }

  // --- Corpus vocabulary profile ----------------------------------------

  val TopTermsK = 20

  /** Corpus-wide exact top-K terms by occurrence count with document
    * frequency — the heavy-hitters pass of vocabulary profiling. One
    * shuffle on the term with map-side partial counts; the top-K is
    * `TakeOrderedAndProject` (per-partition heaps merged on the driver,
    * K rows only — no single-partition window even when the vocabulary
    * is billions of terms). */
  def topTerms(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(TopTermsK)

  // --- Embedding scalar quantization ------------------------------------

  /** Int8 scalar-quantization error profile: per vector, min/max-scaled
    * 256-level quantization (floor(x+0.5) so the rounding rule is
    * explicit and engine-identical), reconstruction, and the L2 /
    * max-abs error — the compression feasibility scan run before
    * switching a 100 TB ANN corpus to int8 storage (4× smaller, SIMD
    * distance kernels). Narrow map over the embeddings table. */
  def quantizeProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
      .filter(col("mx") > col("mn"))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
      .withColumn("dq",
        transform(col("v"), x =>
          col("mn") + floor((x - col("mn")) / col("scale") + lit(0.5))
            * col("scale")))
      .select(col("vec_id"), col("label"),
        round(sqrt(aggregate(
          zip_with(col("v"), col("dq"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)), 4).as("qerr_l2"),
        round(array_max(
          zip_with(col("v"), col("dq"), (a, b) => abs(a - b))), 4)
          .as("qerr_max"))
      .orderBy("vec_id")

  // --- Sequence packing --------------------------------------------------

  /** Training-sequence token budget and the shard span that bounds each
    * packing window. */
  val SeqLen = 256L
  val ShardSpan = 4096L

  /** Concat-and-chunk sequence packing — the tokenizer-side layout pass
    * that turns variable-length documents into fixed-[[SeqLen]]-token
    * training rows: documents are concatenated in doc_id order and cut
    * every [[SeqLen]] tokens, so a document knows which sequences it
    * spans and at which offset its tokens start. Emits per doc:
    * the shard, token count, first/last sequence index and the offset
    * of the doc's first token inside its first sequence.
    *
    * Scale: packing is a running sum, and a corpus-wide running sum is
    * a single-partition window — the classic 100 TB trap. The window
    * here is partitioned by (source, shard = doc_id div [[ShardSpan]]):
    * every partition holds at most [[ShardSpan]] docs regardless of
    * corpus size, sequence indices are local to the shard (exactly how
    * production packers work — each output file is packed
    * independently), and the plan is one hash shuffle on the bounded
    * shard key. No state, no driver participation, deterministic under
    * any partitioning.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("shard", expr(s"doc_id div $ShardSpan"))
      .withColumn("cum_before", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("shard"), col("n_toks"),
        expr(s"cum_before div $SeqLen").as("seq_first"),
        expr(s"(cum_before + n_toks - 1) div $SeqLen").as("seq_last"),
        (col("cum_before") % SeqLen).as("tok_offset"))
      .orderBy("doc_id")
  }

  // --- URL canonicalization ----------------------------------------------

  /** Deterministic synthetic URL per document (the corpus carries no URL
    * column): mixed-case host, explicit default port, tracking params on
    * every third doc, fragments on every fifth — the mess a crawler
    * actually emits, derived from doc_id identically in both engines. */
  def syntheticUrl(docId: Column, source: Column): Column =
    concat(
      lit("HTTPS://WWW."), upper(source), lit(".Example.COM:443/docs/"),
      (docId % 50).cast("string"),
      when(docId % 3 === 0,
        concat(lit("/?utm_source=feed&utm_campaign=c"),
          (docId % 7).cast("string")))
        .otherwise(lit("/")),
      when(docId % 5 === 0, concat(lit("#sec"), (docId % 4).cast("string")))
        .otherwise(lit("")))

  /** Canonicalization formula: lowercase scheme+host, strip the default
    * :443/:80 port, drop the fragment, drop utm_* tracking params (and
    * the `?`/`&` they ride on when nothing else remains), collapse the
    * trailing slash. Pure regexp chain shared by Java regex and RE2 —
    * no lookaround. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val hostLower = concat(
      lower(regexp_extract(noFrag, "^([a-zA-Z]+://[^/]*)", 1)),
      regexp_replace(noFrag, "^[a-zA-Z]+://[^/]*", ""))
    val noPort = regexp_replace(hostLower, ":(443|80)/", "/")
    val noUtm = regexp_replace(noPort, "[?&]utm_[a-z]+=[a-zA-Z0-9_-]*", "")
    regexp_replace(regexp_replace(noUtm, "[?&]$", ""), "/$", "")
  }

  /** URL canonicalization + URL-level dedup — the crawl-side first
    * defence (cheaper than any content pass: most duplicate fetches are
    * the same URL with tracking noise). Canonicalize (narrow codegen'd
    * map), then one hash shuffle on the canonical URL for the group
    * profile: occurrence count and the kept (minimum) doc_id. At 100 TB
    * the group-by key is the canonical URL — bounded per-key by crawl
    * revisit count, no skew beyond genuinely hot URLs, and the
    * aggregation is partial map-side. */
  def urlDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        canonicalUrl(syntheticUrl(col("doc_id"), col("source"))).as("url"))
      .groupBy("url")
      .agg(count(lit(1)).as("n_fetches"), min(col("doc_id")).as("keep_doc"))
      .orderBy("url")

  // --- Text normalization ----------------------------------------------

  /** Deterministic synthetic mess for the normalizer: every third doc
    * gains a DECOMPOSED accent (e + U+0301), an HTML fragment, a tab
    * and run-on spaces — the clean synthetic corpus otherwise
    * exercises nothing. The combining sequence must survive the JSON
    * round-trip to the oracle, so it is injected via codepoints, not
    * source-literal bytes. */
  def withSyntheticMess(text: Column, docId: Column): Column =
    when(docId % 3 === 0,
      concat(text, lit(" e\u0301tude <b>bold</b>\tends  here")))
      .otherwise(text)

  /** Canonical text-normalization formula: Unicode NFC (native
    * codegen'd [[graft.functions.NfcNormalize]] — composed and
    * decomposed inputs must hash identically before any dedup), strip
    * HTML tags and control characters to spaces, collapse whitespace
    * runs, trim. */
  def normalizeTextCol(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val nfc = GraftColumnBridge.column(
      graft.functions.NfcNormalize(GraftColumnBridge.expression(text)))
    // tags and control chars fuse into one alternation — the patterns
    // can't produce different results sequenced vs fused (a control
    // char inside a tag is consumed by the tag arm either way), and one
    // regex pass over the document beats two
    val cleaned = regexp_replace(nfc, "<[^>]*>|[\\x00-\\x1f\\x7f]", " ")
    trim(regexp_replace(cleaned, " +", " "))
  }

  /** End-to-end corpus construction — the whole curation pipeline a
    * training run consumes, as ONE oracle-checked query:
    *
    *  1. Unicode/HTML normalization ([[normalizeTextCol]], with the
    *     deterministic mess injected so the stage is exercised);
    *  2. PII redaction ([[piiRedactCol]], deterministic synthetic PII);
    *  3. Gopher quality gate ([[gopherCol]]);
    *  4. exact content dedup on md5(text), keep-lowest-doc_id;
    *  5. benchmark decontamination over the RAW crawl text (benchmark
    *     suites are matched against text as crawled, before the
    *     normalize/redact transforms) — consumes the memoized
    *     [[Dedup.contamCounts]] inverted-index frame shared with
    *     [[Dedup.decontaminate]], thresholded at
    *     [[BuildContamOverlap]];
    *  6. deterministic train/val/test assignment ([[splitCol]]).
    *
    * Emits (doc_id, split, n_words, content_hash) for the surviving
    * corpus. Scale shape: stages 1–3 and 6 are narrow codegen'd maps;
    * stage 4 is one shuffle on the content hash; stage 5 is the
    * decontamination inverted index (eval side broadcast by the
    * benchmark-suite-is-small contract). The normalized frame is
    * cached across its consumers for the operator's duration. */
  /** Contamination threshold for [[corpusBuild]] — higher than
    * [[Dedup.MinContamOverlap]] because the synthetic corpus draws eval
    * and train docs from one generator (organic 3-gram overlap p99 ≈ 14
    * at sf0.01): the composition should drop only the
    * genuinely-extreme overlap, not a third of the corpus. A real
    * deployment tunes this against its eval suite. */
  val BuildContamOverlap = 15

  /** Max drop-list rows [[corpusBuild]] will broadcast to the anti-join
    * (8 bytes/row → ≤ 32 MB in one broadcast table). Past it, the
    * shuffle anti-join is the right plan anyway. */
  val BroadcastDropListMaxRows = 4L << 20

  def corpusBuild(spark: SparkSession, dir: String): DataFrame =
    corpusBuild(spark, dir, BroadcastDropListMaxRows)

  /** [[corpusBuild]] with an explicit broadcast cap — the spec drives
    * `broadcastCap = 0` to force the shuffle anti-join branch and
    * asserts both branches return identical rows. */
  private[graft] def corpusBuild(spark: SparkSession, dir: String,
                                 broadcastCap: Long): DataFrame = {
    val messy = withSyntheticMess(col("text"), col("doc_id"))
    val withPii = withSyntheticPii(normalizeTextCol(messy), col("doc_id"))
    val t = piiRedactCol(withPii).getField("redacted")
    // Two stacked projections evaluate the normalize→redact chain and
    // the tokenizer exactly ONCE each: P1 materializes the token array
    // (and the content hash — plain expressions, so codegen CSE shares
    // the chain between them), P2 derives the gate and token count from
    // the ARRAY column. This split is deliberate: subexpression
    // elimination does not reach inside higher-order functions, so a
    // single projection computing gopher(tokens(chain)) re-evaluates
    // the full chain per lambda (~4× the per-row cost, measured);
    // CollapseProject keeps the split because `ts` is non-cheap and
    // referenced many times. The window's shuffle then carries four
    // scalar columns, not document text.
    // widened scan: the normalize→redact→tokenize chain is the heaviest
    // per-row map in the engine — serializing it on the synthetic
    // corpus's single scan task would leave 31 cores idle (documentsWide
    // is a no-op on a real many-split corpus)
    val base = Tables.documentsWide(spark, dir)
      .select(col("doc_id"), md5(t).as("h"), tokens(t).as("ts"))
      .select(col("doc_id"), col("h"),
        coalesce(gopherFromTokens(col("ts")).getField("gopher_pass"),
          lit(false)).as("gp"),
        size(col("ts")).as("n_words"))
    // keep-lowest-doc_id dedup as a HASH AGGREGATE, not a window:
    // partial aggregation combines map-side (the shuffle moves distinct
    // hashes per partition, no per-group sort), and `gp`/`n_words` are
    // constant within an `h` group (h = md5 of the full text), so
    // `first` over the group is deterministic. The gate commutes with
    // the dedup for the same reason — filtering the aggregated row
    // keeps exactly the rows gate-then-dedup would, while reading a
    // materialized boolean instead of re-deriving the gate.
    val kept = base.groupBy(col("h"))
      .agg(min(col("doc_id")).as("doc_id"),
        first(col("gp")).as("gp"),
        first(col("n_words")).as("n_words"))
      .filter(col("gp") && col("doc_id") % Dedup.EvalStride =!= 0)
    // contamination runs against the RAW corpus text through the
    // memoized [[Dedup.contamCounts]] frame — benchmark suites are
    // compared against text as crawled (decontamination precedes the
    // normalize/redact transforms), and the inverted-index join is
    // computed ONCE per (session, dir) and shared with
    // [[Dedup.decontaminate]] instead of re-derived here
    val contaminated = Dedup.contamCounts(spark, dir)
      .filter(col("n_shared") >= BuildContamOverlap)
      .select("doc_id")
    // the drop-list is eval-adjacent (docs sharing >= BuildContamOverlap
    // shingles with the eval suite — bounded by eval-set size × near-dup
    // multiplicity, not by corpus size), so BROADCAST it: the static
    // planner can't see that contamCounts' materialized frame is tiny
    // and would sort-merge, shuffling every kept row just to anti-probe
    // a list that fits in one task. Guarded adaptively like the
    // engine's other driver/distributed splits — counting the memoized
    // localCheckpoint'd frame is a block scan, no recompute — so a
    // pathological corpus whose drop-list DOES grow with the corpus
    // falls back to the shuffle anti-join instead of OOMing the driver.
    val contamSide =
      if (contaminated.count() <= broadcastCap) broadcast(contaminated)
      else contaminated
    kept.join(contamSide, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        splitCol(col("doc_id")).getField("split").as("split"),
        col("n_words"),
        col("h").as("content_hash"))
      .orderBy("doc_id")
  }

  /** Normalization pass over the corpus: inject the deterministic mess,
    * normalize, report sizes. Narrow codegen'd map, no shuffle beyond
    * the presentation sort. At 100 TB this runs fused with ingest —
    * normalization before content hashing is what makes exact dedup
    * see through encoding variance. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val messy = withSyntheticMess(col("text"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), messy.as("raw"),
        normalizeTextCol(messy).as("text_norm"))
      .select(col("doc_id"), col("text_norm"),
        length(col("raw")).as("n_chars_raw"),
        length(col("text_norm")).as("n_chars_norm"))
      .orderBy("doc_id")
  }
}
