"""Corpus-construction operators: the steps between "curated
documents" and "training batches" in an LLM data pipeline.

Three ops a training-data engine must provide beyond dedup/quality
(reference has no analog -- these extend the engine per the
training-data mandate):

- deterministic stratified train/val/test split (hash of doc_id, not
  rand(): stable across reruns, engines, and cluster sizes);
- sequence packing stats (concat-and-chop docs into fixed token
  windows, per (lang, shard) so no ordered cumsum spans the corpus);
- benchmark decontamination (flag corpus docs sharing word n-grams
  with a held-out eval source -- the contamination audit run before
  every training job).

All pure Catalyst expressions; the only Python is plan construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    BLOOM_M_BITS,
    DECONTAM_NGRAM_K,
    EVAL_SOURCE,
    PACK_SHARDS,
    PACK_WINDOW_TOKENS,
    SPLIT_TEST_PCT,
    SPLIT_VAL_PCT,
    TOKEN_BUDGET,
    TOKEN_BUDGET_BUCKETS,
)
from ..functions import tokens
from ..functions.columns import md5_pct_bucket, round_half_up as rnd
from .text import _doc_quality


def corpus_train_split(documents: DataFrame) -> DataFrame:
    """Per (split, lang) sizing report for a deterministic hash split.

    Scale shape: the split column is a map-side expression over
    doc_id -- no shuffle to assign, one small agg shuffle to report.
    At 100 TB the same expression tags every row in place; nothing
    about the split depends on partition count or row order.
    """
    pct = md5_pct_bucket(F.col("doc_id"))
    split = (
        F.when(pct < SPLIT_TEST_PCT, F.lit("test"))
        .when(pct < SPLIT_TEST_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    per_doc = documents.select(
        split.alias("split"),
        "lang",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return per_doc.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        rnd(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def seq_pack_stats(documents: DataFrame) -> DataFrame:
    """Sequence-packing layout stats: docs are concatenated in doc_id
    order within (lang, shard) and chopped into PACK_WINDOW_TOKENS
    windows; report windows needed, boundary-crossing docs, and fill
    ratio per (lang, shard).

    Sharding is the scale design: packing needs an ordered running
    sum, which cannot parallelize within a partition key -- so the
    corpus is sharded deterministically (doc_id % PACK_SHARDS) and
    packed per shard, exactly how real pipelines pack per input file.
    The window sort is bounded by shard size, never corpus size.
    """
    win = PACK_WINDOW_TOKENS
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = documents.select(
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    cum = per_doc.withColumn("cum", F.sum("n_tokens").over(w))
    start_win = F.floor((F.col("cum") - F.col("n_tokens")) / win)
    end_win = F.floor((F.col("cum") - 1) / win)
    flagged = cum.select(
        "lang",
        "shard",
        "n_tokens",
        "cum",
        F.when((F.col("n_tokens") > 0) & (end_win > start_win), 1)
        .otherwise(0)
        .alias("crosses"),
    )
    n_windows = F.floor((F.max("cum") - 1) / win) + 1
    return flagged.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        n_windows.cast("bigint").alias("n_windows"),
        F.sum("crosses").cast("bigint").alias("boundary_docs"),
        rnd(F.max("cum") / (n_windows * float(win)), 6).alias("avg_fill"),
    )


def c4_pass_expr(toks):
    """The three C4 gates as one boolean column over a token array --
    shared by the batch accounting (corpus_quality_keep), the
    materializer (curate.curate_corpus) and the ingest gate
    (streaming.stream_curate): one definition of "quality"."""
    from ..constants import C4_MIN_TOKENS, C4_WORD_LEN_MAX, C4_WORD_LEN_MIN, STOPWORDS

    n = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda acc, wd: acc + F.length(wd))
    awl = total_len / n
    return (
        (n >= C4_MIN_TOKENS)
        & F.when(n > 0, (awl >= C4_WORD_LEN_MIN) & (awl <= C4_WORD_LEN_MAX)).otherwise(
            F.lit(False)
        )
        & (F.size(F.filter(toks, lambda w: w.isin(STOPWORDS))) > 0)
    )


def split_expr(doc_id):
    """Deterministic train/val/test split column from the md5 bucket
    of doc_id -- stable across engines, reruns, cluster sizes, and
    batch vs streaming execution (the property rand() lacks)."""
    pct = md5_pct_bucket(doc_id)
    return (
        F.when(pct < SPLIT_TEST_PCT, F.lit("test"))
        .when(pct < SPLIT_TEST_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def curation_tags(documents: DataFrame) -> DataFrame:
    """Per-doc curation flags shared by the accounting query
    (corpus_quality_keep) and the materializing pipeline
    (curate.curate_corpus) -- one definition, so the report can never
    drift from what actually ships.

    Columns: doc_id, split, lang, n_tokens, kept.  A doc is KEPT when
    it (a) passes all three C4 gates and (b) is the canonical copy of
    its exact-duplicate class (min doc_id per md5(text)).  Gates are
    map-side expressions; the canonical test is a min() WINDOW over
    text_hash -- ONE shuffle on the 32-char hash, no groupBy+join
    back (a join would shuffle the corpus twice and build a
    corpus-sized hash side at 100 TB).
    """
    from pyspark.sql import Window

    passes_c4 = c4_pass_expr(F.col("toks"))
    split = split_expr(F.col("doc_id"))
    n = F.size(F.col("toks"))
    # No repartition barrier here -- measured at sf0.1: the window's
    # own shuffle on text_hash already spreads the wide stages, and
    # an extra exchange carrying token arrays costs more than the
    # map-side flag computation saves (0.75s vs 1.26s; PLANS.md).
    per_doc = documents.select(
        "doc_id",
        "lang",
        F.md5("text").alias("text_hash"),
        tokens(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "lang",
        "text_hash",
        split.alias("split"),
        passes_c4.alias("passes_c4"),
        n.alias("n_tokens"),
    )
    keep_id = F.min("doc_id").over(Window.partitionBy("text_hash"))
    return per_doc.select(
        "doc_id",
        "split",
        "lang",
        "n_tokens",
        (F.col("passes_c4") & (F.col("doc_id") == keep_id)).alias("kept"),
    )


def corpus_quality_keep(documents: DataFrame) -> DataFrame:
    """End-to-end curation accounting: C4 quality gates + exact-dedup
    keep-list + deterministic split, reported per (split, lang) --
    the one query that says what actually ships to training after
    the whole filter chain runs.

    A doc is KEPT when it (a) passes all three C4 gates and (b) is
    the canonical copy of its exact-duplicate class (min doc_id per
    md5(text)).  Scale shape: gates are map-side expressions; the
    canonical-copy test is a min() WINDOW over text_hash -- ONE
    shuffle on the 32-char hash, no groupBy+join back (a join would
    shuffle the corpus twice and build a corpus-sized hash side at
    100 TB); the final report is a small agg.  No pair joins
    anywhere.
    """
    tagged = curation_tags(documents)
    return tagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        rnd(F.sum(F.col("kept").cast("int")) / F.count(F.lit(1)), 6).alias("keep_rate"),
    )


def corpus_stratified_sample(documents: DataFrame) -> DataFrame:
    """Deterministic per-language downsampling report: each language
    keeps SAMPLE_RATE_PCT[lang] percent of docs, selected by the md5
    bucket of 'sample:'||doc_id -- stable across engines, reruns and
    cluster sizes, and independent of the train/split hash (different
    salt).  The sizing report every data-mix ablation starts from.

    Scale shape: the keep decision is a map-side expression (the rate
    table folds into a CASE literal -- language cardinality is tiny);
    one small agg shuffle for the report.
    """
    from ..constants import SAMPLE_RATE_DEFAULT_PCT, SAMPLE_RATE_PCT

    rate = F.lit(None).cast("int")
    expr = None
    for lang, pct in sorted(SAMPLE_RATE_PCT.items()):
        cond = F.col("lang") == F.lit(lang)
        expr = F.when(cond, F.lit(pct)) if expr is None else expr.when(cond, F.lit(pct))
    rate = expr.otherwise(F.lit(SAMPLE_RATE_DEFAULT_PCT))
    bucket = md5_pct_bucket(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    per_doc = documents.select(
        "lang",
        rate.alias("rate_pct"),
        (bucket < rate).alias("sampled"),
        F.size(tokens(F.col("text"))).alias("n_tokens"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("rate_pct").alias("rate_pct"),
        F.sum(F.col("sampled").cast("int")).cast("bigint").alias("n_sampled"),
        F.sum(F.when(F.col("sampled"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("sampled_tokens"),
        rnd(F.sum(F.col("sampled").cast("int")) / F.count(F.lit(1)), 6).alias(
            "actual_rate"
        ),
    )


def _gram_stream(toks_frame: DataFrame, carry: list[str]) -> DataFrame:
    """One row per DECONTAM_NGRAM_K-word n-gram of a frame carrying a
    `toks` array column, with `carry` columns kept plus `pos` --
    THE single definition of the decontamination gram (size floor,
    positional-sequence explode per the Generate re-evaluation fix,
    concat_ws slice), shared by _gram_pairs and the fused
    curation_waterfall so the probes can never drift apart."""
    return (
        toks_frame.where(F.size("toks") >= DECONTAM_NGRAM_K)
        .select(
            *carry,
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - (DECONTAM_NGRAM_K - 1))
            ).alias("pos"),
            "toks",
        )
        .select(
            *carry,
            "pos",
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("pos"), DECONTAM_NGRAM_K)
            ).alias("gram"),
        )
    )


def _gram_pairs(documents: DataFrame):
    """Gram-bearing corpus frame plus one row per (doc, position)
    DECONTAM_NGRAM_K-word n-gram (via the shared _gram_stream); the
    repartition is the usual CollapseProject barrier so tokens(text)
    materializes once."""
    toks_d = (
        documents.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= DECONTAM_NGRAM_K)
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
    )
    return toks_d, _gram_stream(toks_d, ["doc_id", "source"])


def decontam_overlap(documents: DataFrame):
    """Shared core of the decontamination audit and the materializing
    pipeline: returns (toks_d, hits) where toks_d is the gram-bearing
    corpus frame and hits maps each contaminated non-eval doc_id to
    its distinct eval-gram overlap count.  One definition, so the
    audit can never drift from what the curate step actually drops."""
    toks_d, pairs = _gram_pairs(documents)
    eval_grams = (
        pairs.where(F.col("source") == EVAL_SOURCE).select("gram").distinct()
    )
    # count_distinct dedups per-doc grams AFTER the broadcast probe, so
    # no per-doc distinct shuffle is needed on the corpus side
    hits = (
        pairs.where(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("overlap"))
    )
    return toks_d, hits


def benchmark_decontam(documents: DataFrame) -> DataFrame:
    """Benchmark decontamination audit: per source, how many corpus
    docs share at least one DECONTAM_NGRAM_K-word n-gram with the
    held-out eval source (EVAL_SOURCE), plus the worst overlap.

    Scale shape: the eval gram set is small by construction (eval
    benchmarks are tiny next to the corpus) and broadcasts; corpus
    grams explode map-side into the broadcast-hash probe, then one
    shuffle aggregates hits per doc.  Never an n x m doc comparison.
    """
    # Grams are generated by exploding POSITIONS (a cheap integer
    # sequence) and building each n-gram once per output row with
    # slice+concat_ws.  Exploding a prebuilt word_shingles array
    # re-evaluates the whole O(grams x K) array expression per
    # GENERATED row (Generate keeps the generator expression inline;
    # measured ~40x slower at sf0.1).  The repartition is the usual
    # CollapseProject barrier so tokens(text) is materialized once.
    # size(toks) >= K <=> at least one gram.
    toks_d, hits = decontam_overlap(documents)
    return _contam_report(toks_d, hits)


def _contam_report(toks_d: DataFrame, hits: DataFrame) -> DataFrame:
    """Per-source contamination rollup shared by the broadcast-exact
    path (benchmark_decontam) and the Bloom-prefiltered path
    (bloom_decontam): one definition, so the two physical strategies
    can never drift in what they report."""
    per_doc = (
        toks_d.where(F.col("source") != EVAL_SOURCE)
        .select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select("source", F.coalesce("overlap", F.lit(0)).alias("overlap"))
    )
    contaminated = F.sum((F.col("overlap") > 0).cast("int"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        contaminated.cast("bigint").alias("n_contaminated"),
        F.max("overlap").cast("bigint").alias("max_overlap"),
        rnd(contaminated / F.count(F.lit(1)), 6).alias("contam_rate"),
    )


def corpus_source_mix(documents: DataFrame) -> DataFrame:
    """Domain-mix rebalancing report: per source, the corpus token
    share and the downsampling weight that would equalize the mix
    (uniform target across sources, capped at 1.0 -- under-represented
    domains are never upsampled here, matching how mix ablations
    downsample the head domains).  The sizing table a data-mix sweep
    starts from.  (No reference analog -- training-data mandate.)

    Scale shape: one corpus agg shuffle down to |sources| rows; the
    share/weight window runs over that tiny post-agg frame (a handful
    of rows -- the unpartitioned window never sees the corpus).
    """
    w = Window.partitionBy()
    per_source = documents.select(
        "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    share = F.col("total_tokens") / F.sum("total_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    # a source with zero tokens has nothing to downsample: weight 1.0
    # by definition -- guarded explicitly because target/0 diverges
    # between engines (Spark non-ANSI Divide -> NULL, DuckDB -> inf)
    weight = F.when(F.col("total_tokens") == 0, F.lit(1.0)).otherwise(
        F.least(F.lit(1.0), target / share)
    )
    return per_source.select(
        "source",
        "n_docs",
        "total_tokens",
        rnd(share, 6).alias("token_share"),
        rnd(weight, 6).alias("sample_weight"),
    )


def source_temperature_weights(documents: DataFrame) -> DataFrame:
    """Temperature-sampled data mix: per-source sampling probability
    proportional to token_share^alpha (alpha = MIX_TEMP_ALPHA), the
    XLM-R/GPT-3 smoothing that upweights tail domains without the
    hard equalize-or-cap rule of corpus_source_mix.  mix_boost is
    temp_prob/share -- > 1 means the domain is oversampled relative
    to its natural frequency.  (No reference analog -- training-data
    mandate; Conneau et al. 2020 §3.1, Brown et al. 2020 Table 2.2.)

    Scale shape: one corpus agg shuffle down to |sources| rows; the
    share/normalizer windows run over that tiny post-agg frame.
    Numeric determinism: alpha = 0.5 makes the power sqrt (IEEE
    correctly-rounded, unlike pow); the normalizer folds the sqrt
    terms in ASCENDING SORTED order via aggregate(array_sort(...)),
    so the double sum is order-independent across engines and
    partition layouts -- the only float sum here is engine-exact.
    """
    w = Window.partitionBy()
    per_source = documents.select(
        "source", F.size(tokens(F.col("text"))).alias("n_tokens")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    share = F.col("total_tokens") / F.sum("total_tokens").over(w)
    sq = F.sqrt(share)
    denom = F.aggregate(
        F.array_sort(F.collect_list(sq).over(w)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # a zero-token source contributes sqrt(0)=0 to the normalizer and
    # samples with probability 0; boost guarded to 0.0 because 0/0
    # diverges between engines (Spark non-ANSI -> NULL, DuckDB -> nan)
    temp_prob = sq / denom
    boost = F.when(F.col("total_tokens") == 0, F.lit(0.0)).otherwise(
        temp_prob / share
    )
    return per_source.select(
        "source",
        "n_docs",
        "total_tokens",
        rnd(share, 6).alias("token_share"),
        rnd(temp_prob, 6).alias("temp_prob"),
        rnd(boost, 4).alias("mix_boost"),
    )


def epoch_shuffle_key(seed: int):
    """md5('epoch{seed}:' || doc_id) -- the seeded, engine-independent
    epoch-permutation sort key.  ONE definition shared by the
    corpus_epoch_shuffle preview (#89) and curate.py's
    --epoch-shuffle stage (which writes it as a column), so the
    audit's "what does the loader feed first" order IS the order a
    loader realizes by sorting the written shards on
    (shuffle_key, doc_id)."""
    return F.md5(
        F.concat(F.lit(f"epoch{seed}:"), F.col("doc_id").cast("string"))
    )


def corpus_epoch_shuffle(documents: DataFrame) -> DataFrame:
    """Deterministic epoch-shuffle preview: the first EPOCH_PREVIEW_N
    docs of epoch EPOCH_SEED's global training order, where the order
    is the sort by md5('epoch{seed}:' || doc_id) -- a seeded,
    engine-independent permutation that changes completely between
    epochs (different salt) yet is identical across reruns, engines
    and cluster sizes.  The "what does the loader actually feed
    first" audit for a seeded training run.

    Scale shape: the full permutation is NEVER materialized --
    orderBy + limit compiles to TakeOrderedAndProject (per-partition
    top-N heaps, driver-side merge of N x P candidates), so cost is
    one scan plus an N-row merge regardless of corpus size.  The
    epoch_pos row_number then runs over the N surviving rows only
    (single task over EPOCH_PREVIEW_N rows by construction, not a
    corpus-global window).
    """
    from ..constants import EPOCH_PREVIEW_N, EPOCH_SEED

    key = epoch_shuffle_key(EPOCH_SEED)
    head = (
        documents.select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(EPOCH_PREVIEW_N)
    )
    w = Window.orderBy("shuffle_key", "doc_id")
    return head.select(
        F.row_number().over(w).cast("int").alias("epoch_pos"),
        "doc_id",
        "shuffle_key",
    )


# The two probe shifts of the Bloom filter: k = 2 hash functions
# derived from one xxhash64 (low bits and bits >> 17).  ONE
# definition shared by the batch verifier and the streaming
# quarantine gate -- if build and probe ever used different shifts,
# the "zero false negatives" contract would silently break.
BLOOM_SHIFTS = (0, 17)


def bloom_bits(hashes) -> "object":
    """Build the Bloom image (packed uint8 numpy array) from int64
    xxhash64 values -- the single bit-layout definition behind
    bloom_decontam and streaming.stream_bloom_quarantine.

    m AUTO-SIZES to the key count: next power of two >=
    BLOOM_BITS_PER_ITEM * n, floored at BLOOM_M_BITS (r9 -- the sf10
    probe caught the fixed-m image saturating once the eval suite
    outgrew it; see constants.py).  The probe derives m from the
    image length, so a build/probe pair can never disagree."""
    import numpy as np

    from ..constants import BLOOM_BITS_PER_ITEM, BLOOM_M_BITS

    hv = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    m = BLOOM_M_BITS
    while m < len(hv) * BLOOM_BITS_PER_ITEM:
        m <<= 1
    bits = np.zeros(m // 8, dtype=np.uint8)
    for shift in BLOOM_SHIFTS:
        p = ((hv >> np.uint64(shift)) % np.uint64(m)).astype(np.int64)
        np.bitwise_or.at(bits, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
    return bits


def bloom_probe(bits, hashes) -> "object":
    """Vectorized membership test against a bloom_bits image: True
    where ALL BLOOM_SHIFTS probe bits are set (possible member),
    False only for definite non-members.  m comes from the image
    itself (bits are packed 8/byte), never from a constant that
    could drift from the build side.  The numpy REFERENCE
    implementation -- production probing is the Catalyst twin
    bloom_probe_expr (bit-parity pytest-pinned); this one remains the
    test oracle and the small-batch path."""
    import numpy as np

    m = int(bits.size) * 8
    hv = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    hit = np.ones(len(hv), dtype=bool)
    for shift in BLOOM_SHIFTS:
        p = ((hv >> np.uint64(shift)) % np.uint64(m)).astype(np.int64)
        hit &= ((bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1).astype(bool)
    return hit


def bloom_words_scalar(spark, bits):
    """(words_column, m): the bloom_bits image as a SCALAR-SUBQUERY
    array<bigint> column plus its bit size -- the JVM-side carrier
    bloom_probe_expr probes against.

    Why this shape (r9, all measured at sf10 / 22.4M grams):
      * pandas_udf probe: the Arrow boundary itself cost 95-157 s
        even for a zero-work UDF -- the per-row crossing, not the
        bit test, was the op's entire scale problem;
      * F.lit(list/ndarray): pyspark expands to a 524k-child
        CreateArray (107 s of driver analysis before the first task);
      * THIS: one Arrow-built 1-row LocalRelation lifted into the
        expression via DataFrame.scalar() -- 0.6 s to build, probe
        runs whole-stage-codegen JVM-side at ~the xxhash scan rate.
    Little-endian int64 view of the packed uint8 image: word p>>6
    bit p&63 lands on byte p>>3 bit p&7, exactly bloom_bits' layout,
    so the numpy and Catalyst probes are bit-identical (pytest-pinned).
    """
    import pandas as pd

    words = bits.view("<i8")
    wdf = spark.createDataFrame(pd.DataFrame({"w": [words.tolist()]}))
    return wdf.select("w").scalar(), int(bits.size) * 8


def bloom_probe_expr(words_col, m: int, h):
    """Catalyst twin of bloom_probe: True where all BLOOM_SHIFTS
    probe bits are set, for an int64 hash COLUMN h.  m is a power of
    two (bloom_bits guarantees it), so unsigned-shift + mask
    reproduces the numpy uint64 modulo bit-for-bit."""
    hit = None
    for shift in BLOOM_SHIFTS:
        p = F.shiftrightunsigned(h, shift).bitwiseAND(F.lit(m - 1))
        word = F.element_at(words_col, (p / F.lit(64)).cast("int") + F.lit(1))
        b = F.bit_get(word, (p % F.lit(64)).cast("int")) == 1
        hit = b if hit is None else (hit & b)
    return hit


def bloom_decontam(documents: DataFrame) -> DataFrame:
    """Benchmark decontamination with a broadcast Bloom prefilter:
    the same per-source report as ``benchmark_decontam`` (identical
    oracle SQL -- the filter only prunes, the exact join decides),
    but shaped for the regime where the eval gram set has outgrown
    the broadcast-hash-join threshold.

    Scale shape: ``benchmark_decontam`` broadcasts the eval gram set
    and probes map-side -- the right plan while the benchmark suite
    fits in a broadcast (tens of MB).  Past that, Catalyst would fall
    back to shuffling EVERY corpus gram against the eval set.  Here
    the carried artifact is the Bloom image -- ~BLOOM_BITS_PER_ITEM/8
    bytes per EVAL gram (auto-sized at build, see bloom_bits; corpus
    size never enters the sizing math) -- and the probe is PURE
    CATALYST (bloom_probe_expr over a scalar-subquery word array:
    whole-stage codegen, no Python in the corpus-gram path; see
    bloom_words_scalar for the measured r9 history -- the sf10 probe
    caught first the fixed-size image saturating, then the Arrow
    boundary itself dominating).  The probe drops all but ~fp-rate of
    clean grams BEFORE the exact verify join, so the shuffle carries
    true hits plus a bounded ~2% of noise instead of the whole corpus
    gram stream.  False positives are removed by the exact join;
    false negatives are impossible (Bloom), so the answer is
    bit-identical to the exact path.

    The eval-gram-hash pull (Arrow toPandas) is an index artifact
    (bounded by the benchmark suite, never the corpus) -- same
    justification as the IVF codebook collects in
    operators/similarity.py."""
    toks_d, pairs = _gram_pairs(documents)
    eval_grams = (
        pairs.where(F.col("source") == EVAL_SOURCE).select("gram").distinct()
    )
    bits = bloom_bits(
        eval_grams.select(F.xxhash64("gram").alias("h"))
        .toPandas()["h"]
        .to_numpy(dtype="int64")
    )
    wcol, m = bloom_words_scalar(documents.sparkSession, bits)

    candidates = pairs.where(F.col("source") != EVAL_SOURCE).where(
        bloom_probe_expr(wcol, m, F.xxhash64("gram"))
    )
    # deliberately NOT F.broadcast: this op models the eval set past
    # the broadcast threshold, so the verify join is the shuffle path
    # -- whose volume the Bloom probe just bounded.  (AQE may still
    # pick broadcast at test scale; the logical shape is what's under
    # audit here.)
    hits = (
        candidates.join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("overlap"))
    )
    return _contam_report(toks_d, hits)


def token_budget_select(documents: DataFrame) -> DataFrame:
    """Greedy token-budget curation (the FineWeb/DataComp "best N
    tokens" step): walk docs in (quality DESC, doc_id ASC) order and
    keep each while the inclusive running token sum stays within
    TOKEN_BUDGET; report the kept/total split per source with the
    quality cutoff that emerged.  Quality is the composite
    text_quality_score formula (rounded to 6 -- an engine-exact
    ordering key), so selection is deterministic across engines,
    cluster sizes and reruns.

    Scale shape: a naive ``SUM() OVER (ORDER BY quality DESC)`` is a
    single-task global window.  Instead the running sum is two-phase:
    docs bucket by floor(quality * TOKEN_BUDGET_BUCKETS); per-bucket
    token totals aggregate to a frame of <= TOKEN_BUDGET_BUCKETS+1
    rows (the only unpartitioned window runs there); each doc's
    global cumsum = its bucket's strictly-better-bucket offset
    (broadcast back) + its within-bucket running sum.  Because the
    bucket id is monotone in the ordering key, the two-phase sum
    equals the oracle's single window bit-for-bit.  Within-bucket
    windows partition by bucket id: per-task work is bounded by the
    corpus share of one quality-granularity class (same watch-item
    class as customer_spend_deciles; a doc_id range sub-split is the
    swap if a profile ever shows one hot class)."""
    per_doc = (
        documents.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "source",
            F.size("toks").alias("n_tokens"),
            F.when(F.size("toks") > 0, _doc_quality(F.col("toks")))
            .otherwise(F.lit(0.0))
            .alias("quality"),
        )
        .withColumn(
            "qbucket",
            F.floor(F.col("quality") * TOKEN_BUDGET_BUCKETS).cast("int"),
        )
    )
    bucket_tot = per_doc.groupBy("qbucket").agg(F.sum("n_tokens").alias("btok"))
    wb = Window.orderBy(F.col("qbucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_tot.select(
        "qbucket", F.coalesce(F.sum("btok").over(wb), F.lit(0)).alias("boffset")
    )
    wd = (
        Window.partitionBy("qbucket")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = (
        per_doc.join(F.broadcast(offsets), "qbucket")
        .withColumn("cum", F.col("boffset") + F.sum("n_tokens").over(wd))
        .withColumn("kept", F.col("cum") <= TOKEN_BUDGET)
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min(F.when(F.col("kept"), F.col("quality"))).alias("cutoff_quality"),
    )


def contam_span_report(documents: DataFrame) -> DataFrame:
    """Per-doc contamination GEOMETRY: for every contaminated corpus
    doc, the number of contaminated n-gram islands (maximal runs of
    consecutive hit positions), the longest island, and the total hit
    count.  benchmark_decontam says HOW MANY docs are dirty; this says
    WHERE and HOW CONTIGUOUSLY -- one long verbatim span (a quoted
    benchmark item, surgically removable) reads very differently from
    scattered single-gram hits (natural phrase collisions).

    Scale shape: hit positions come from the same broadcast eval-gram
    probe as benchmark_decontam (map-side, no corpus shuffle); islands
    use the gaps-and-islands idiom -- pos minus row_number() over a
    doc-partitioned window is constant within a run -- so the only
    shuffle after the probe is keyed by doc_id and bounded by hits per
    doc, never doc length.  Output is one row per CONTAMINATED doc
    (the small set), not per corpus doc.
    """
    _, pairs = _gram_pairs(documents)
    eval_grams = (
        pairs.where(F.col("source") == EVAL_SOURCE).select("gram").distinct()
    )
    # (doc_id, pos) is unique by construction, so no distinct needed
    hit_pos = (
        pairs.where(F.col("source") != EVAL_SOURCE)
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id", "source", "pos")
    )
    wi = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        hit_pos.withColumn("grp", F.col("pos") - F.row_number().over(wi))
        .groupBy("doc_id", "source", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.max("run_len").cast("bigint").alias("longest_span_grams"),
        F.sum("run_len").cast("bigint").alias("n_contam_grams"),
    )


def curation_waterfall(documents: DataFrame) -> DataFrame:
    """The curation FUNNEL in one query: how many docs (and tokens)
    survive each cumulative stage of the standard pipeline --

        raw -> C4 quality -> exact-dedup canonical -> decontaminated
            -> token budget

    -- the first table a data lead asks for before a training run,
    and the cross-check that the stage operators (#42, #21, #41/#97,
    #96) compose the way their individual reports claim.  Every stage
    reuses the SHARED expression its standalone operator uses
    (c4_pass_expr, the min-doc_id-per-md5 canonical window,
    _gram_stream -- the one decontam gram definition behind
    decontam_overlap -- and token_budget_select's two-phase
    running sum), so the funnel can never drift from the parts.

    Scale shape (single corpus pass, r5): the corpus is tokenized
    ONCE into a persisted base frame that feeds BOTH the per-doc
    stats and the corpus-side gram stream of the decontam probe --
    previously the funnel shared the stage *expressions* but not a
    shared *scan*, costing 6 parquet scans / 10 exchanges for 5
    stage rows (five full corpus passes at 100 TB).  Now: 2 scans
    (corpus once + the small eval-source slice for the broadcast
    gram set), flags are map-side or ride the md5 window's one hash
    shuffle, and the doc-level flag frame is persisted so the
    two-phase budget machinery (bucket totals, then the within-
    bucket running sum) reads it twice without recomputation.  The
    caches spill to disk under memory pressure; at 100 TB they
    replace full corpus re-scans + re-tokenization, the cheaper
    side of the trade.  The budget running sum masks non-survivors
    to zero inside the same bucket-offset machinery (masked zeros
    keep the two-phase sum bit-equal to the oracle's single
    conditional window).  Output is 5 rows.
    """
    corpus = documents.where(F.col("source") != EVAL_SOURCE)
    # ONE corpus scan: tokenize + hash once; round-robin spread (not
    # a counted hash shuffle) so the cached partitions parallelize
    # the explode and window work downstream.
    # repartition FIRST (raw text through the round-robin exchange),
    # project AFTER: md5 + tokenize then run 32-way parallel in the
    # cache-build tasks instead of inside the few scan tasks.
    base = (
        corpus.select("doc_id", "text")
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            F.md5("text").alias("text_hash"),
            tokens(F.col("text")).alias("toks"),
        )
        .persist()
    )
    # Decontam probe: BOTH sides run through the shared _gram_stream
    # definition -- the corpus side over the cached base frame, the
    # eval side through _gram_pairs on the small eval slice (whose
    # repartition barrier keeps the Generate fix on that scan too).
    eval_grams = (
        _gram_pairs(documents.where(F.col("source") == EVAL_SOURCE))[1]
        .select("gram")
        .distinct()
    )
    # The funnel only needs the dirty/clean BIT, not the overlap
    # count -- a distinct doc_id marker set is cheaper than
    # count_distinct(gram) agg buffers.
    dirty = (
        _gram_stream(base, ["doc_id"])
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id")
        .distinct()
        .withColumn("dirty", F.lit(True))
    )
    per_doc = base.select(
        "doc_id",
        "text_hash",
        F.size("toks").alias("n_tokens"),
        c4_pass_expr(F.col("toks")).alias("c4"),
        F.when(F.size("toks") > 0, _doc_quality(F.col("toks")))
        .otherwise(F.lit(0.0))
        .alias("quality"),
    )
    wh = Window.partitionBy("text_hash")
    # exact duplicates share text, hence identical c4 flags -- so the
    # unconditional class min IS the first passing member, and this
    # stage equals corpus_quality_keep's kept definition exactly
    keep_id = F.min("doc_id").over(wh)
    flagged = (
        per_doc.withColumn(
            "canonical", F.col("c4") & (F.col("doc_id") == keep_id)
        )
        .join(dirty, "doc_id", "left")
        .withColumn(
            "clean",
            F.col("canonical") & ~F.coalesce("dirty", F.lit(False)),
        )
        .withColumn(
            "qbucket",
            F.floor(F.col("quality") * TOKEN_BUDGET_BUCKETS).cast("int"),
        )
        # doc-level flag frame: read twice (bucket totals + the
        # masked cumsum), persisted so the window/join upstream runs
        # once -- this is what turns 5 funnel stages into ONE pass
        .persist()
    )
    masked = F.when(F.col("clean"), F.col("n_tokens")).otherwise(F.lit(0))
    bucket_tot = flagged.groupBy("qbucket").agg(F.sum(masked).alias("btok"))
    wb = Window.orderBy(F.col("qbucket").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = bucket_tot.select(
        "qbucket", F.coalesce(F.sum("btok").over(wb), F.lit(0)).alias("boffset")
    )
    wd = (
        Window.partitionBy("qbucket")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    staged = (
        flagged.join(F.broadcast(offsets), "qbucket")
        .withColumn("cum", F.col("boffset") + F.sum(masked).over(wd))
        .withColumn(
            "budgeted", F.col("clean") & (F.col("cum") <= TOKEN_BUDGET)
        )
    )
    one = staged.agg(
        F.count(F.lit(1)).alias("raw_docs"),
        F.sum("n_tokens").alias("raw_tokens"),
        *[
            agg
            for flag in ("c4", "canonical", "clean", "budgeted")
            for agg in (
                F.sum(F.col(flag).cast("int")).alias(f"{flag}_docs"),
                F.sum(F.when(F.col(flag), F.col("n_tokens")).otherwise(0)).alias(
                    f"{flag}_tokens"
                ),
            )
        ],
    )
    stages = [
        ("1_raw", "raw"),
        ("2_quality", "c4"),
        ("3_canonical", "canonical"),
        ("4_decontaminated", "clean"),
        ("5_token_budget", "budgeted"),
    ]
    stack_args = ", ".join(
        f"'{label}', {flag}_docs, {flag}_tokens" for label, flag in stages
    )
    return one.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage, n_docs, n_tokens)"
    ).select(
        "stage",
        # empty corpus: the global agg row carries NULL sums -> 0
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
    )


def source_capped_selection(documents: DataFrame) -> DataFrame:
    """Per-DOMAIN token caps (head-domain suppression): within each
    source, keep docs in (quality DESC, doc_id ASC) order while the
    inclusive running token sum stays within SOURCE_TOKEN_CAP --
    oversized domains truncate to their best SOURCE_TOKEN_CAP tokens,
    small domains pass whole.  The domain-balancing complement to
    token_budget_select's single global budget (mix ablations cap the
    head domains; the global budget sizes the whole corpus).

    Scale shape: the running sum partitions by source NATURALLY, so
    there is no global window at all -- the exact contrast with the
    global budget's two-phase machinery.  Per-task work is bounded by
    one domain's doc count; if one domain ever dominates the corpus,
    swap in token_budget_select's bucket-offset decomposition inside
    that domain (same math, documented there).
    """
    from ..constants import SOURCE_TOKEN_CAP

    per_doc = (
        documents.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
        .repartition(documents.sparkSession.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "source",
            F.size("toks").alias("n_tokens"),
            F.when(F.size("toks") > 0, _doc_quality(F.col("toks")))
            .otherwise(F.lit(0.0))
            .alias("quality"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = per_doc.withColumn(
        "kept", F.sum("n_tokens").over(w) <= SOURCE_TOKEN_CAP
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min(F.when(F.col("kept"), F.col("quality"))).alias("cutoff_quality"),
    )


def _temp_bucket():
    """The deterministic per-doc temperature-sampling bucket:
    md5('temp:'||doc_id) mod 10000 -- ONE definition shared by
    corpus_temperature_sample, curate.py's sampling stage, and
    (string-identically) streaming.stream_temperature_sample, so the
    keep/drop membership of a doc can never differ between the
    report, the materializer, and the ingest gate."""
    from ..functions.columns import md5_mod_bucket

    return md5_mod_bucket(
        F.concat(F.lit("temp:"), F.col("doc_id").cast("string")), 10000
    )


def _temperature_thresholds(documents: DataFrame) -> DataFrame:
    """|sources|-row persisted thresholds frame (source, n_docs,
    rate, threshold): per-source keep rate boost_s / max(boost) from
    the PUBLISHED (4-rounded) mix_boost column, integer threshold
    floor(rate*10000) -- the shared sampling model behind
    corpus_temperature_sample's report and curate.py's materializing
    stage (bit-identical constants in every consumer)."""
    w = Window.partitionBy()
    weights = source_temperature_weights(documents).select(
        "source",
        "n_docs",
        F.col("mix_boost"),
        F.max("mix_boost").over(w).alias("max_boost"),
    )
    rate = F.when(
        F.col("max_boost") > 0, F.col("mix_boost") / F.col("max_boost")
    ).otherwise(F.lit(0.0))
    # |sources| rows feeding BOTH the sample predicate and the final
    # report: persist so the weights corpus scan runs once
    return weights.select(
        "source",
        "n_docs",
        rate.alias("rate"),
        F.floor(rate * 10000).cast("int").alias("threshold"),
    ).persist()


def corpus_temperature_sample(documents: DataFrame) -> DataFrame:
    """MATERIALIZE the temperature mix source_temperature_weights
    (#source_temperature_weights) reports: a deterministic per-doc
    keep/drop whose per-source keep rate is boost_s / max(boost) --
    the largest-boost (most up-weighted tail) source keeps 100% and
    every other source keeps proportionally less, preserving the
    temp_prob relative mix in ONE sampling pass without replacement
    (the way a real epoch builder downsamples; oversampling beyond 1x
    is the loader's repeat factor, out of sampling's reach).  The
    report -> transform closure (the corpus_span_excised pattern) for
    the data-mix side.

    Determinism discipline: rates derive from the PUBLISHED
    (4-rounded) mix_boost column, the integer threshold is
    floor(rate * 10000), and membership is the md5('temp:'||doc_id)
    bucket -- bit-identical constants and pure integer comparisons in
    both engines, stable across reruns and cluster sizes.

    Scale shape: the weights frame is |sources| rows riding a
    broadcast join; sampling is a map-side predicate; one per-source
    agg ends the plan.  Two corpus scans total (one builds the
    weights, one samples) -- the honest cost of a self-normalizing
    sample.
    """
    thresholds = _temperature_thresholds(documents)
    docs = documents.select("source", _temp_bucket().alias("bucket"))
    kept = (
        docs.join(F.broadcast(thresholds), "source")
        .where(F.col("bucket") < F.col("threshold"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return thresholds.join(kept, "source", "left").select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        rnd(F.col("rate"), 6).alias("keep_rate_target"),
        rnd(F.coalesce("n_kept", F.lit(0)) / F.col("n_docs"), 6).alias("kept_share"),
    )


def _dsir_tagged(documents: DataFrame, caches: list | None = None) -> DataFrame:
    """(doc_id, source, rate, kept): the per-doc DSIR keep/drop
    decision -- ONE definition shared by corpus_dsir_sample's report
    and curate.py's --dsir-sample materializing stage (the
    _temp_bucket discipline: membership can never differ between the
    report and the bytes written).  Weights are the PUBLISHED
    (4-rounded) dsir_logratio column, the threshold is
    floor(exp(w - w_max) * 10000), membership is the
    md5('dsir:'||doc_id) bucket."""
    from ..functions.columns import md5_mod_bucket
    from .text import dsir_importance_score

    # persist: the scored frame feeds the 1-row max AND the sampling
    # pass (released by the harnesses' per-query clearCache; curate
    # passes `caches` to release it via its stage-cache list)
    w = dsir_importance_score(documents).persist()
    if caches is not None:
        caches.append(w)
    wmax = w.agg(F.max("dsir_logratio").alias("w_max"))
    rate = F.exp(F.col("dsir_logratio") - F.col("w_max"))
    bucket = md5_mod_bucket(
        F.concat(F.lit("dsir:"), F.col("doc_id").cast("string")), 10000
    )
    return w.crossJoin(F.broadcast(wmax)).select(
        "doc_id",
        "source",
        rate.alias("rate"),
        (bucket < F.floor(rate * 10000).cast("int")).alias("kept"),
    )


def corpus_dsir_sample(documents: DataFrame) -> DataFrame:
    """MATERIALIZE the DSIR selection text.dsir_importance_score
    reports (the report -> transform closure, the
    corpus_temperature_sample pattern): a deterministic per-doc
    keep/drop whose keep probability is exp(w - w_max) -- importance
    resampling normalized so the best-matching doc keeps with
    probability 1 and every other doc proportionally to its
    exponentiated weight, the Xie et al. 2023 sampling rule made
    rerun-stable.  Reports per source: scored docs, kept docs, the
    mean target keep rate and the realized kept share.

    Determinism discipline: weights are the PUBLISHED (4-rounded)
    dsir_logratio column, the integer threshold is
    floor(exp(w - w_max) * 10000), and membership is the
    md5('dsir:'||doc_id) bucket -- bit-identical constants and pure
    integer comparisons in both engines.  Docs too short to score
    (< 2 tokens, no bigrams) are outside the sample frame by
    definition, exactly as they are absent from the report.

    Scale shape: the weight frame is the DSIR op's own plan (bounded
    512-number model, one corpus pass); w_max is a 1-row broadcast
    (the scalar-subquery idiom); sampling is a map-side predicate and
    one per-source agg ends the plan.
    """
    tagged = _dsir_tagged(documents).drop("doc_id")
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        rnd(F.avg("rate"), 6).alias("avg_keep_rate"),
        rnd(
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("kept_share"),
    )


def _ffd_assign(docs, win: int) -> dict:
    """First-fit-decreasing whole-doc window assignment -- THE single
    FFD rule shared by the seq_pack_bestfit report (#47n) and
    curate.py's --pack stage, so the report's window count and the
    written pack_window column can never drift.  ``docs`` is an
    iterable of (n_tokens, doc_id); returns {doc_id: window_id}.
    Token counts clamp to [0, win] (a doc longer than the window
    truncates to a full window of its own -- the standard rule);
    zero-token docs pack nothing and get window -1.  Deterministic:
    placement order is (tokens desc, doc_id asc), windows are
    numbered in creation order and probed first-fit in that order.
    """
    bins: list[int] = []  # used tokens per open window
    out: dict[int, int] = {}
    for t, d in sorted(
        ((max(0, min(int(t), win)), int(d)) for t, d in docs),
        key=lambda x: (-x[0], x[1]),
    ):
        if t == 0:
            out[d] = -1
            continue
        for i, used in enumerate(bins):
            if used + t <= win:
                bins[i] = used + t
                out[d] = i
                break
        else:
            bins.append(t)
            out[d] = len(bins) - 1
    return out


def seq_pack_bestfit(documents: DataFrame) -> DataFrame:
    """Whole-document sequence packing, first-fit-decreasing: where
    seq_pack_stats (#40) measures the concat-and-chop layout (docs
    split across window boundaries), this packs WHOLE docs into
    PACK_WINDOW_TOKENS windows -- the layout used when crossing a doc
    boundary mid-sequence is unacceptable (instruction tuning,
    long-context eval) -- and reports how many windows FFD needs vs
    the naive next-fit baseline, per (lang, shard).  Docs longer than
    the window truncate to a full window of their own (the standard
    rule).  (No reference analog -- training-data mandate; no oracle:
    bin packing is an ordered iterative algorithm outside SQL's
    reach, so the driver records the rows-only check and the python
    reference lives in pytest.)

    Spark shape: packing is inherently sequential WITHIN a key, so it
    runs per (lang, shard) group through Arrow-batched applyInPandas
    -- the documented escape hatch for per-group imperative logic --
    while groups pack in parallel across executors; group size is
    bounded by the shard fan-out exactly like #40's running sum.
    Deterministic: FFD order is (tokens desc, doc_id), next-fit order
    is doc_id, both sorted inside the group before packing.
    """
    import pandas as pd

    win = int(PACK_WINDOW_TOKENS)

    per_doc = documents.select(
        "lang",
        (F.col("doc_id") % PACK_SHARDS).cast("bigint").alias("shard"),
        "doc_id",
        # greatest(.., 0): size(NULL) is -1 under non-ANSI defaults
        F.greatest(F.size(tokens(F.col("text"))), F.lit(0)).alias("n_tokens"),
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        lang = pdf["lang"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        docs = sorted(
            (max(0, min(int(t), win)), int(d))
            for d, t in zip(pdf["doc_id"], pdf["n_tokens"])
        )
        total = int(sum(t for t, _ in docs))
        # next-fit, doc_id order: close the window when the doc
        # doesn't fit (the one-pass streaming writer baseline).
        # Zero-token docs pack nothing and must not touch a window
        # (an unguarded t=0 would rotate an exactly-full bin here and
        # open a phantom empty bin in FFD below).
        by_id = sorted(docs, key=lambda x: x[1])
        nf_bins, cur = 0, win  # cur = used space in the open bin
        for t, _ in by_id:
            if t == 0:
                continue
            if cur + t > win:
                nf_bins += 1
                cur = t
            else:
                cur += t
        # first-fit-decreasing via the shared assignment rule
        # (_ffd_assign -- the same {doc -> window} map curate.py's
        # --pack stage writes); the report needs only the window count
        asg = _ffd_assign(((t, d) for t, d in docs), win)
        n_ffd = 1 + max((w for w in asg.values() if w >= 0), default=-1)
        fill = round(total / (n_ffd * float(win)), 6) if n_ffd else 0.0
        return pd.DataFrame(
            [
                {
                    "lang": lang,
                    "shard": shard,
                    "n_docs": len(docs),
                    "total_tokens": total,
                    "n_windows_nextfit": nf_bins,
                    "n_windows_ffd": n_ffd,
                    "avg_fill_ffd": fill,
                }
            ]
        )

    schema = (
        "lang string, shard bigint, n_docs bigint, total_tokens bigint, "
        "n_windows_nextfit bigint, n_windows_ffd bigint, avg_fill_ffd double"
    )
    return per_doc.groupBy("lang", "shard").applyInPandas(pack, schema)
