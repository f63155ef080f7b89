"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.
All Catalyst expressions (split/regexp/aggregate) — no Python in the
row path, so they run at scan speed and are verifiable against a SQL
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sonnerie_spark.functions.portable_hash import phash

# Small marker-word lists per language (public common stopwords).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "est"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# BPE-ish token pattern: words, numbers, or single non-space symbols.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace-token and regex-token counts + char count per doc."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(t)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).alias("n_re_tokens"),
        F.length(t).alias("n_chars"),
    )


def quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + a composite score.

    Features: word count, mean word length, stopword ratio, distinct
    (type/token) ratio, punctuation ratio. The composite is a simple
    bounded sum — deterministic, order-independent.

    ``keep`` passes source columns through the projection so callers
    that need the text/metadata alongside the score avoid the
    attach-by-self-join shape (docs ⋈ quality_score(docs) on id):
    Catalyst does not collapse that self-join, so the whole subtree
    BELOW it — scan, anti-joins, classifier folds — was evaluated once
    per join side, plus a broadcast build (guide §2.4: remove shuffles
    outright). One projection evaluates it once.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*EN_STOPWORDS)))
    n_distinct = F.size(F.array_distinct(toks))
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9\\s]"), 0))
    mean_wl = (F.length(t) - (n - 1)) / n  # total non-space chars / words
    stop_ratio = n_stop / n
    distinct_ratio = n_distinct / n
    punct_ratio = n_punct / F.greatest(F.length(t), F.lit(1))
    score = (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.least(mean_wl / F.lit(8.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))) * 0.25
        + distinct_ratio * 0.25
    )
    # 6-decimal rounding via _r6 (module-level; see its docstring for
    # why floor(x*1e6 + 0.5)/1e6 and NOT round(x, 6)).
    return df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        n.alias("n_words"),
        _r6(mean_wl).alias("mean_word_len"),
        _r6(stop_ratio).alias("stopword_ratio"),
        _r6(distinct_ratio).alias("distinct_ratio"),
        _r6(punct_ratio).alias("punct_ratio"),
        _r6(score).alias("quality_score"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: argmax language by marker hit count.

    Deterministic tie-break: argmax by (hits, lang code) — ties pick the
    lexicographically greatest code. 'und' when nothing hits.
    """
    toks = tokens(F.lower(F.col(text_col)))

    def hits(markers: tuple[str, ...]):
        # one-arg lambda: a two-parameter lambda (incl. defaults) would
        # be treated as pyspark's (element, index) form
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    scores = [
        F.struct(hits(markers).alias("hits"), F.lit(lang).alias("lang"))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return df.select(
        F.col(id_col).alias("id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].alias("marker_hits"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, *, k: int = 5, n_mins: int = 4) -> DataFrame:
    """Document fingerprint: the ``n_mins`` smallest k-gram hashes.

    A winnowing-style content signature: robust to small edits, cheap to
    compare (array overlap). Per-row array expressions only.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    hashes = F.array_sort(F.transform(F.array_distinct(grams), lambda g: phash(g)))
    return df.select(
        F.col(id_col).alias("id"),
        F.slice(hashes, 1, n_mins).alias("fingerprint"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 2
) -> DataFrame:
    """Gopher-style repetition quality signal: the fraction of a doc's
    n-gram stream occupied by its single most common n-gram (high ->
    templated/repetitive text; pipelines drop docs above a threshold).

    Shape at scale: MAP-ONLY. The statistic is strictly per-document, so
    the former explode -> (doc, gram) hash agg -> per-doc agg shape
    shipped the whole corpus n-gram stream through TWO shuffles to
    compute something each row already holds: the top multiplicity of a
    document's gram array is the longest run of equal elements in its
    sorted copy (array_sort + one aggregate() fold, O(g log g) per row
    inside the scan stage — guide §2.3/§2.4, aggregate instead of
    shuffling). Both statistics stay integer counts, so the result is
    engine-exact; only the final fraction is a (rounded) division.

    Expression hygiene (measured, r12): the gram build must be
    evaluated ONCE per row. Filtering on a DERIVED count pushes the
    predicate below the projection and re-duplicates the build (the
    guide §4.4 duplication class, which applies to expensive Catalyst
    expressions too — 3 evaluations measured 4.4x slower than the
    shuffle shape it replaced), so empty docs are dropped by an
    equivalent cheap predicate on the raw text (>= n whitespace tokens
    <=> >= 1 n-gram <=> the explode emitted a row), and both statistics
    leave the gram projection inside ONE struct so no later projection
    references the array twice.
    """
    toks = tokens(F.col(text_col))
    n_toks = F.size(toks)
    grams = F.transform(
        F.slice(toks, 1, F.greatest(n_toks - (n - 1), F.lit(0))),
        _gram_builder(toks, n),
    )

    def _extend_run(acc, g):
        # concat_ws never yields NULL, so prev is NULL only before the
        # first element; eqNullSafe starts the first run at 1.
        new_run = (
            F.when(acc["prev"].eqNullSafe(g), acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc["best"], new_run).alias("best"),
        )

    top_n = F.aggregate(
        F.array_sort(F.col("_grams")),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        _extend_run,
        lambda acc: acc["best"],
    )
    stats = F.struct(
        F.size("_grams").cast("long").alias("n"), top_n.alias("t")
    )
    return (
        df.filter(F.size(tokens(F.col(text_col))) >= n)
        .select(F.col(id_col).alias("id"), grams.alias("_grams"))
        .select("id", stats.alias("_st"))
        .select(
            "id",
            F.col("_st.n").alias("n_ngrams"),
            F.col("_st.t").alias("top_ngram_n"),
            F.round(F.col("_st.t") / F.col("_st.n"), 6).alias(
                "top_ngram_frac"
            ),
        )
    )


def _gram_builder(toks, n: int):
    """Closure factory (NOT a default-arg lambda — pyspark would treat a
    two-parameter lambda as (element, index)) building the i-th n-gram
    by position; F.transform's 2-arg form supplies the index."""

    def build(_elem, idx):
        parts = [F.element_at(toks, idx + j + 1) for j in range(n)]
        return F.concat_ws(" ", *parts)

    return build


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many distinct
    k-gram shingles it shares with ANY benchmark document.

    The standard training-data hygiene pass (strip eval-set material
    from the corpus before training). Shape at 100 TB: the corpus
    explodes to (doc, shingle) once; the benchmark side — eval sets are
    tiny by definition — collapses to a distinct-shingle set and arrives
    via BROADCAST hash join, so the corpus is scanned exactly once with
    no shuffle on the quadratic side. Output: one row per CONTAMINATED
    document (``n_hits`` distinct shared shingles > 0); clean documents
    don't appear — anti-join this result to keep them.

    Uses the same distinct word-shingle definition as the n-gram dedup
    family (dedup.word_shingles), so thresholds transfer.
    """
    from sonnerie_spark.operators.dedup import word_shingles

    corpus_sh = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
    )
    bench_sh = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), k)).alias("shingle"))
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    num_bits: int = 1 << 20,
    num_hashes: int = 4,
) -> DataFrame:
    """Benchmark decontamination through a BLOOM FILTER of the
    benchmark's k-gram shingles — the variant of :func:`decontaminate`
    for when the "benchmark" side is itself large (all held-out
    validation splits + known eval suites + competitor test sets can
    reach many GB of distinct shingles, too big to broadcast raw): the
    filter is FIXED-SIZE (num_bits/63 packed words — a 2^30-bit filter
    is ~136 MiB) no matter how many shingles feed it, has no false
    negatives (no contaminated document ever slips through), and its
    false positives only ever over-flag, which for hygiene is the safe
    direction. Output: (id, n_probable_hits) per corpus document with
    at least one probable shared shingle; thresholds transfer from
    decontaminate minus the (deterministic, engine-identical) FP rate.

    Plan: benchmark shingles -> one map-side bit_or agg into the word
    table; the corpus shingle stream probes it with one BROADCAST
    equi-join + per-(doc, shingle) AND + per-doc count — the corpus is
    scanned once and never shuffled on the benchmark side's size.
    """
    from sonnerie_spark.operators.dedup import word_shingles
    from sonnerie_spark.operators.sketch import bloom_sketch

    bench_sh = benchmark.select(
        F.explode(word_shingles(F.col(text_col), k)).alias("v")
    )
    sk = bloom_sketch(bench_sh, "v", num_bits=num_bits, num_hashes=num_hashes)
    from sonnerie_spark.operators.sketch import bloom_might_contain

    corpus_sh = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("v"),
    )
    verdicts = bloom_might_contain(
        corpus_sh, sk, value="v", num_bits=num_bits, num_hashes=num_hashes
    )
    return (
        verdicts.filter("might_contain")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_probable_hits"))
    )


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII-style scrubbing: replace email-shaped and long-digit-run
    tokens with fixed placeholder tags, and count what was replaced.

    Pure Catalyst ``regexp_replace``/``regexp_count`` — scan-speed, no
    Python in the path. The two patterns are deliberately simple,
    engine-portable regexes (character classes only — identical
    semantics in Java regex and RE2/DuckDB): real deployments swap in
    their PII taxonomy here; the Spark plumbing (schema, counts,
    ordering of passes) is what this operator pins down.
    """
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    digits = "[0-9]{9,}"
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(t, F.lit(email)).alias("n_emails"),
        F.regexp_count(t, F.lit(digits)).alias("n_digit_runs"),
        F.regexp_replace(
            F.regexp_replace(t, email, "<EMAIL>"), digits, "<NUMBER>"
        ).alias("redacted"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, *, top_n: int = 3
) -> DataFrame:
    """Top-n characteristic terms per document by tf-idf.

    idf is the RAW inverse document frequency N/df (no logarithm):
    IEEE-754 requires division to be correctly rounded, so the score is
    bit-identical across engines, while ``ln`` is not correctly-rounded
    and would make oracle hash-matching flaky at rank boundaries. The
    ranking it induces is the same family of weighting; the docstring
    of the gate query documents the variant.

    Plan: explode to (doc, term) postings ONCE, one hash agg (tf by
    (doc, term), map-side partial), then df per term as a count window
    over the aggregated stream — tf holds exactly one row per distinct
    (doc, term), so ``count(*) OVER (PARTITION BY term)`` IS the
    distinct-document frequency. That replaces the old second corpus
    tokenization pass (toks.distinct().groupBy(term)) with one exchange
    of the already-collapsed (doc, term) table; the postings stream is
    the same volume an inverted-index build shuffles; no all-pairs
    anything.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    # Rank by the UNROUNDED score (bit-identical across engines: an
    # integer ratio, and IEEE division is correctly rounded); the
    # reported tfidf column rounds with the floor(x*1e6+0.5)/1e6
    # formulation — exact IEEE ops on identical doubles — because
    # HALF_UP round() disagrees between engines by 1 ulp at exact
    # decimal ties. Ranking by the rounded value would additionally let
    # distinct raw scores round equal and swap ranks.
    raw = F.col("tf") * F.col("n_docs") / F.col("df")
    scored = (
        tf.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n_docs))
        .withColumn("_raw", raw)
        .withColumn(
            "tfidf", F.floor(F.col("_raw") * 1e6 + F.lit(0.5)) / F.lit(1e6)
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("_raw").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select("id", "term", "tf", "df", "tfidf", "rk")
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, *, top_n: int = 30
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the counting
    step of one BPE tokenizer-training merge iteration (the top pair is
    the merge BPE would learn next).

    Pure integer pipeline: whitespace tokens -> per-token adjacent
    2-grams (built JVM-side with sequence+transform+substring, no
    Python) -> one hash agg on the pair key with map-side partials.
    Shuffle volume is bounded by the distinct-pair vocabulary (~|alphabet|^2),
    orders of magnitude below corpus size, so the stage is scan-bound at
    100 TB exactly like production BPE counting jobs.
    """
    from pyspark.sql import Window

    tok = df.select(F.explode(tokens(F.col(text_col))).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    top = counted.orderBy(F.col("n").desc(), F.col("pair")).limit(top_n)
    # rank over the already-limited top_n rows: the unpartitioned window
    # touches only top_n rows, not the vocabulary.
    w = Window.orderBy(F.col("n").desc(), F.col("pair"))
    return top.withColumn("rk", F.row_number().over(w))


def repeated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_df: int = 2,
    materialize: bool = False,
) -> DataFrame:
    """Span-level duplication detection: every position of a k-token
    span that occurs in >= min_df distinct documents — the counting core
    of substring-level dedup (the boilerplate/licence-header remover a
    corpus-cleaning pipeline runs between exact and near-dup passes).

    Two passes over the token stream, all JVM-side: (1) positions ->
    span hash (one md5 per span occurrence), (2) hash agg for distinct-
    doc frequency, (3) join flagged hashes back to positions. Shuffle
    volume is one row per span occurrence (two 8-byte ints + one hash);
    the df agg is map-side partial. Skew lives in hot spans and is
    bounded the same way as posting lists (min_df only FLAGS; no pair
    enumeration exists at all, so there is no quadratic path).

    The span stream feeds BOTH the frequency agg and the join probe —
    without materialization Spark computes the expensive build (one
    concat+md5 per span occurrence) twice, once per join side; the
    persist halves the dominant cost (same-session A/B 91.8 -> 35.6 s
    at 50 M tokens, tools/substr_scale.py).

    CACHE CONTRACT (default ``materialize=False``): the returned frame
    is lazy, so the operator cannot unpersist the span stream itself;
    Spark's ContextCleaner reclaims it once the frame becomes
    unreachable, and bench / long-lived loops should clear cache per
    query. A long-lived session that RETAINS results (e.g. a loop
    accumulating frames) should pass ``materialize=True``: the result
    is blockified (one eager localCheckpoint job) and the span-stream
    cache is released before returning, at the cost of running the
    flag-join eagerly.
    """
    toks = tokens(F.col(text_col))
    spans = (
        df.select(F.col(id_col).alias("id"), toks.alias("t"))
        .filter(F.size("t") >= k)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - k),
                    lambda i: F.struct(
                        i.alias("pos"),
                        phash(
                            F.concat_ws(" ", F.slice(F.col("t"), i + 1, k))
                        ).alias("span_h"),
                    ),
                )
            ).alias("s"),
        )
        .select("id", "s.pos", "s.span_h")
        .persist()
    )
    freq = (
        spans.select("id", "span_h")
        .distinct()
        .groupBy("span_h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    out = spans.join(freq, "span_h").select("id", "pos", "span_h", "df")
    if materialize:
        out = out.localCheckpoint(eager=True)
        spans.unpersist()
    return out


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into fixed-size token windows — the standard
    pre-training/RAG chunking pass (``stride`` < ``chunk_tokens`` gives
    overlapping windows; default stride = chunk_tokens, disjoint).

    Output: (id, chunk_idx, chunk_text, n_tokens), one row per window,
    covering every token (the last window may be short; empty documents
    produce one empty chunk, so no document silently disappears).

    Pure Catalyst: tokenize once, build window starts with ``sequence``,
    slice per start — all array expressions inside the row, so the
    operator is map-only and streams at scan speed at 100 TB; the output
    explode multiplies rows by ~n_tokens/stride, the unavoidable output
    size. No shuffle, no Python.
    """
    if stride is None:
        stride = chunk_tokens
    if not (0 < stride and 0 < chunk_tokens):
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
    )

    def to_chunk(s):
        return F.struct(
            (s / F.lit(stride)).cast("long").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(n - s, F.lit(chunk_tokens)).alias("n_tokens"),
        )

    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(starts, to_chunk)).alias("c"),
    ).select("id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus text normalization: strip C0 control characters (except
    tab/newline, which the collapse then folds), collapse ASCII
    whitespace runs to one space, trim, and apply Unicode NFC so
    visually identical strings (decomposed vs precomposed accents)
    compare and hash equal — the canonical first pass before exact/
    near dedup, where un-normalized text silently splits duplicate
    groups.

    The strip/collapse/trim run as Catalyst ``regexp_replace`` (JVM,
    scan speed). NFC has no Catalyst builtin, so it runs as one
    Arrow-batched pandas UDF over the already-cleaned column — the only
    Python in the pass, and str.map(unicodedata.normalize) per Arrow
    batch, not per-row serialization. Ordering is safe: the regexes
    touch only ASCII classes, which every NFC normalization leaves
    fixed. Emits (id, text, changed) — ``changed`` lets a pipeline
    route only rewritten docs to a re-dedup pass.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(col):  # type: ignore[misc]
        import unicodedata

        return col.map(
            lambda s: unicodedata.normalize("NFC", s) if s is not None else None
        )

    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.col(text_col), "[\\x00-\\x08\\x0B-\\x1F\\x7F]", ""
            ),
            "[ \\t]+",
            " ",
        )
    )
    # Two-step projection so the UDF column is computed once and the
    # changed flag compares against it, not a second UDF evaluation.
    step = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_orig"),
        nfc(cleaned).alias("text"),
    )
    return step.select(
        "id", "text", (F.col("text") != F.col("_orig")).alias("changed")
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_doc_frac: float = 0.01,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet-style paragraph
    dedup pass): a line whose trimmed form occurs in at least
    ``max(min_docs, min_doc_frac * n_docs)`` DISTINCT documents is
    boilerplate (cookie banners, nav menus, license footers); strip
    those lines from every document and reassemble the rest in order.

    Plan shape at corpus scale: one explode + two-phase distinct-doc
    count per line key (map-side partials; the hot keys are exactly the
    high-frequency ones, and their partial counts collapse to one row
    per partition), then a BROADCAST anti-join of the line stream
    against the hot set — by construction the hot set is tiny (lines
    repeated across >=1% of docs), so no second shuffle of the corpus.
    Reassembly sorts each doc's surviving lines by position inside one
    aggregation. Emits (id, text, n_removed); documents whose every
    line was boilerplate come back with empty text, not dropped.
    """
    # the document count rides the PLAN as a 1-row broadcast dimension
    # instead of a df.count() driver action — that action was a whole
    # blocking corpus-scan job before the main query even started
    # (guide §2.4/§5); greatest(min_docs, floor(frac * n)) reproduces
    # max(min_docs, int(frac * n)) exactly for the non-negative values
    # here (int() truncation == floor on positives)
    n_docs_dim = df.select(F.count(F.lit(1)).alias("n_docs"))
    threshold = F.greatest(
        F.lit(int(min_docs)).cast("long"),
        F.floor(F.lit(float(min_doc_frac)) * F.col("n_docs")),
    )
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    hot = (
        lines.filter(F.trim("line") != "")
        .groupBy(F.trim("line").alias("k"))
        .agg(F.countDistinct("id").alias("df"))
        .crossJoin(F.broadcast(n_docs_dim))
        .filter(F.col("df") >= threshold)
        .select("k")
    )
    kept = lines.join(
        F.broadcast(hot), F.trim(lines["line"]) == hot["k"], "left_anti"
    )
    per_doc = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    # Per-doc line totals are a map-only projection — size(split()) is
    # exactly the posexplode row count — instead of a third corpus
    # explode + shuffle-agg. The NULL-text filter replicates the
    # explode semantics (posexplode of a NULL array emits no rows, so
    # such docs never appeared in the aggregated totals).
    totals = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), "\n")).cast("long").alias("n_lines"),
    )
    return (
        totals.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("text", F.lit("")).alias("text"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide exact paragraph deduplication (the C4/RefinedWeb
    line-dedup pass — Raffel et al. 2020 §2.2, Penedo et al. 2023):
    every distinct paragraph keeps only its FIRST occurrence across the
    whole corpus, ordered by (document id, position); every later copy
    is removed from its document, and documents are reassembled from
    their surviving paragraphs in order. Complements
    :func:`strip_boilerplate` (which removes high-document-frequency
    lines from EVERY document): here exactly one copy of repeated
    content survives, so unique text is never lost.

    Paragraphs whose trimmed length is below ``min_chars`` are exempt —
    always kept, never counted as duplicates ('' and '-' separators are
    the cleaning passes' business, not dedup's).

    Plan shape at corpus scale: one explode, then ONE shuffle of
    (hash, id, pos, paragraph) for the first-occurrence window —
    ``row_number`` partitioned by ``md5(paragraph)``, a fixed-width
    128-bit shuffle key with the same negligible-collision contract as
    :func:`~sonnerie_spark.operators.dedup.exact_dedup`. Exempt rows
    get a per-row unique key instead of NULL so they never pile into
    one window partition (the short-paragraph skew hazard). Reassembly
    is the per-document aggregation. Emits (id, text, n_paragraphs,
    n_removed); a document whose every paragraph was a duplicate comes
    back with empty text, not dropped.
    """
    from pyspark.sql import Window

    paras = _explode_paragraphs(df, id_col, text_col, sep)
    eligible = F.length(F.trim(F.col("para"))) >= min_chars
    h = F.when(eligible, F.md5(F.col("para"))).otherwise(
        F.concat_ws("#", F.lit("u"), F.col("id"), F.col("pos"))
    )
    w = Window.partitionBy("h").orderBy("id", "pos")
    flagged = (
        paras.withColumn("h", h)
        .withColumn("dup", F.row_number().over(w) > 1)
        .drop("h")
    )
    return _reassemble_paragraphs(flagged, sep)


def _explode_paragraphs(df, id_col: str, text_col: str, sep: str):
    """(id, pos, para) stream for the paragraph-dedup family. ``sep``
    is a LITERAL separator (re-escaped before it reaches F.split's
    regex parameter — a caller passing '.' or '||' must split on the
    characters, exactly as array_join will rejoin with them)."""
    import re

    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias(
            "pos", "para"
        ),
    )


def _reassemble_paragraphs(flagged, sep: str):
    """Per-document reassembly over a (id, pos, para, dup) stream —
    the single copy both the one-shot and incremental paragraph dedups
    aggregate through, so their outputs can never drift."""
    return flagged.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("dup"), F.struct("pos", "para"))
                    )
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text"),
        F.count("*").cast("int").alias("n_paragraphs"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0))
        .cast("int")
        .alias("n_removed"),
    )


def _hashed_score_sum(toks: Column, salt: int, scale: int) -> Column:
    """Sum of per-token hashed weights, folded over the token array in
    place — the single source of the hashed classifier arithmetic
    (shared by :func:`classifier_score` and :func:`classifier_milli`
    so the two can never drift)."""
    from sonnerie_spark.functions.portable_hash import phash_salted

    def w(tok):
        return (phash_salted(tok, salt) % F.lit(2 * scale + 1)) - F.lit(scale)

    def add(acc, x):
        return acc + x

    return F.aggregate(F.transform(toks, w), F.lit(0).cast("long"), add)


def classifier_milli(
    text: Column, *, salt: int = 97, scale: int = 1000
) -> Column:
    """The hashed classifier's ``score_milli`` as a bare Column —
    floor(1000 * sum(weights) / n_tokens) — for filtering a corpus IN
    PLACE (``df.filter(classifier_milli(F.col("text")) >= t)``): a
    map-only predicate, no join against a scored frame, the shape a
    composed pipeline wants. Pinned equal to
    :func:`classifier_score`'s column by pytest (including the
    NULL-text-as-'' convention)."""
    toks = tokens(F.coalesce(text, F.lit("")))
    return F.floor(
        _hashed_score_sum(toks, salt, scale)
        * F.lit(1000.0)
        / F.greatest(F.size(toks), F.lit(1))
    )


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    weights: DataFrame | None = None,
    salt: int = 97,
    scale: int = 1000,
    threshold_milli: int = 0,
) -> DataFrame:
    """Linear bag-of-words classifier scoring — the model-based quality
    filter step (the DCLM / FineWeb-Edu pattern: score every document
    with a cheap linear classifier, keep above a threshold). Two
    weight sources:

    - ``weights`` (a (term, weight:long) DataFrame, e.g. exported from
      a trained fasttext/logistic model): explode + BROADCAST join —
      the model is vocabulary-sized, never corpus-sized — then a
      per-doc sum. Out-of-vocabulary tokens weigh 0.
    - hashed (default, ``weights=None``): each token's weight derives
      from the salted portable hash, ``phash(salt#tok) % (2*scale+1) -
      scale`` — an integer in [-scale, scale]. This is the
      deterministic, engine-portable stand-in the oracle can replay;
      it is also entirely MAP-ONLY (the sum folds over the token array
      in-place, no explode, no shuffle — the shape a real
      hashed-feature classifier keeps at 100 TB).

    Output per document: ``n_tokens``, integer ``score_sum``,
    ``score_milli`` = floor(1000 * score_sum / n_tokens) (mean weight
    in milli-units; floor of an exact-IEEE quotient of exact integers,
    so engines agree bit-for-bit), and ``keep`` =
    score_milli >= ``threshold_milli``. An empty text carries the
    single empty token (the engine-wide whitespace-token convention,
    shared with :func:`token_stats` and every oracle's
    ``regexp_split_to_array``), so it scores that token's weight.
    NULL text is coalesced to '' first — BOTH modes must emit exactly
    one row per input document (a bare explode would silently drop
    null-text docs from the weights mode).
    """
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    if weights is None:
        scored = df.select(
            F.col(id_col).alias("id"),
            F.size(toks).alias("n_tokens"),
            _hashed_score_sum(toks, salt, scale).alias("score_sum"),
        )
    else:
        ex = df.select(
            F.col(id_col).alias("id"), F.explode(toks).alias("term")
        )
        scored = (
            ex.join(F.broadcast(weights), "term", "left")
            .groupBy("id")
            .agg(
                F.count("*").cast("int").alias("n_tokens"),
                F.sum(F.coalesce(F.col("weight"), F.lit(0)))
                .cast("long")
                .alias("score_sum"),
            )
        )
    milli = F.floor(
        F.col("score_sum") * F.lit(1000.0)
        / F.greatest(F.col("n_tokens"), F.lit(1))
    )
    return scored.select(
        "id",
        "n_tokens",
        "score_sum",
        milli.alias("score_milli"),
        (
            (F.col("n_tokens") > 0)
            & (milli >= F.lit(threshold_milli))
        ).alias("keep"),
    )


def dedup_paragraphs_incremental(
    index,
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    sep: str = "\n",
    min_chars: int = 1,
    batch_id: str | None = None,
) -> DataFrame:
    """Incremental :func:`dedup_paragraphs`: dedup a batch's paragraphs
    against everything already ingested — via a persistent
    :class:`~sonnerie_spark.operators.dedup.ExactIndex` of paragraph
    hashes — AND within the batch, WITHOUT rescanning the corpus; then
    record the batch's new paragraph hashes in the index. The union of
    the per-batch outputs equals the one-shot pass over the
    concatenated corpus ordered by (batch, id, pos) — oracle-gated.

    This is the rolling-ingestion form of paragraph dedup: day N's
    shard arrives, loses every paragraph day 1..N-1 already published
    (plus its own internal repeats), and costs O(batch + matching
    index partitions) — the ExactIndex partition-pruning story, at
    paragraph granularity.

    A paragraph is a duplicate iff its hash is already indexed OR an
    earlier (id, pos) in THIS batch carries it; exempt (< ``min_chars``
    after trim) paragraphs are never deduped and never indexed. Same
    output schema as :func:`dedup_paragraphs`.

    Replay: with ``batch_id=None`` a re-run of an already-appended
    batch sees its own hashes in the index and returns every eligible
    paragraph as a duplicate — exactly-once delivery is the caller's
    job. Passing a ``batch_id`` makes replay IDEMPOTENT via the
    index's applied-batch ledger (the DdStore pattern): a replayed id
    skips the append under the index flock, and its probe subtracts
    the hash set the first run recorded, reconstructing the pre-batch
    index view exactly — any index hash in this batch is either
    pre-batch or in that recorded set, because later batches never
    re-append a hash this batch already published. So replay output ==
    first-run output, and union-over-batches == one-shot under any
    number of re-deliveries.

    Concurrency contract (ExactIndex.add's own): batches are applied
    by a SINGLE writer, sequentially. The probe (``seen``) and the
    append run as separate steps with the flock held only during the
    append, so two concurrent ingests could both probe before either
    appends and each keep a copy of the same paragraph.
    """
    from pyspark.sql import Window

    paras = _explode_paragraphs(df, id_col, text_col, sep)
    eligible = F.length(F.trim(F.col("para"))) >= min_chars
    flagged = paras.withColumn("h", F.when(eligible, F.md5(F.col("para"))))
    # batch-internal first occurrence; exempt rows get per-row unique
    # window keys (same skew guard as the one-shot pass)
    hw = F.coalesce(
        F.col("h"), F.concat_ws("#", F.lit("u"), F.col("id"), F.col("pos"))
    )
    w = Window.partitionBy(hw).orderBy("id", "pos")
    flagged = flagged.withColumn("rn", F.row_number().over(w)).persist()
    try:
        replay = batch_id is not None and index.batch_applied(batch_id)
        seen = index.seen(flagged.filter(F.col("h").isNotNull()).select("h"))
        if replay:
            # reconstruct the pre-batch index view: subtract exactly
            # the hashes the first run of THIS batch appended
            seen = seen.join(index.batch_hashes(batch_id), "h", "left_anti")
        # NULL h (exempt) never matches the join key -> never dup
        marked = flagged.join(
            seen.withColumn("_old", F.lit(True)), "h", "left"
        ).withColumn("dup", (F.col("rn") > 1) | F.col("_old").isNotNull())
        out = _reassemble_paragraphs(marked, sep)
        # materialize BOTH the result and the to-be-indexed hashes
        # BEFORE the append: a lazy recompute after the index mutates
        # would probe the batch's own hashes and flag everything dup
        out = out.localCheckpoint(eager=True)
        if not replay:
            fresh = (
                flagged.filter((F.col("rn") == 1) & F.col("h").isNotNull())
                .select("h")
                .join(seen, "h", "left_anti")
                .localCheckpoint(eager=True)
            )
            index.append_hashes(fresh, batch_id=batch_id)
        return out
    finally:
        flagged.unpersist()


# Gopher quality-rule stopword set (Rae et al. 2021, appendix A1.1):
# a document must contain at least two of these to pass the rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _r6(c: Column) -> Column:
    """6-decimal rounding via floor(x*1e6 + 0.5)/1e6 — multiply/add/
    floor are exact IEEE ops on identical doubles, so Spark and DuckDB
    agree on the tie resolution (round(x, 6) can differ by 1 ulp in the
    last digit between the engines' decimal paths)."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, published appendix A):
    the standard pre-training document filter. Per document: word count
    in [min_words, max_words]; mean word length in [min_mean_wl,
    max_mean_wl]; the '#'-to-word AND the '...'-to-word ratio EACH
    below max_symbol_ratio (the paper tests the symbols separately);
    under max_bullet_frac of lines starting with a
    bullet; under max_ellipsis_frac of lines ending in an ellipsis; at
    least min_alpha_frac of words containing an alphabetic character;
    and at least min_stop_hits distinct GOPHER_STOPWORDS present.

    Pure Catalyst (split/filter/aggregate on arrays — no explode, no
    shuffle, no Python), so it runs at scan speed and composes with
    column pruning: the scan reads only (id, text). ``keep`` is decided
    on the UNROUNDED fractions; the emitted fraction columns are
    6-decimal-rounded for stable cross-engine hashing. No reference
    analogue; training-data-pipeline extension surface.
    """
    t = F.col(text_col)
    toks = tokens(t)
    toks_lower = F.transform(toks, F.lower)
    n = F.size(toks)
    nd = n.cast("double")
    sum_wl = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_wl = sum_wl.cast("double") / nd
    # the published rule tests EACH symbol's ratio separately ("either
    # the hash symbol or ellipsis" over the threshold fails) — pooling
    # them would over-filter a doc with 0.07 of each
    hash_ratio = (
        F.size(F.regexp_extract_all(t, F.lit("#"), 0)).cast("double") / nd
    )
    ell_word_ratio = (
        F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0)).cast("double")
        / nd
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda x: F.ltrim(x).rlike("^[-*•]")))
        .cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / nd
    )
    # array_intersect, NOT filter(stops, s -> array_contains(lowered, s)):
    # a lambda body re-evaluates per element, so the filter form lowers
    # the whole token array once PER STOPWORD (measured 8x slower at
    # 50 M tokens); intersect lowers it once and counts the distinct
    # stopwords present — the same value.
    stop_hits = F.size(
        F.array_intersect(
            toks_lower, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    keep = (
        (n >= min_words)
        & (n <= max_words)
        & (mean_wl >= min_mean_wl)
        & (mean_wl <= max_mean_wl)
        & (hash_ratio < max_symbol_ratio)
        & (ell_word_ratio < max_symbol_ratio)
        & (bullet_frac < max_bullet_frac)
        & (ellipsis_frac < max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_words"),
        _r6(mean_wl).alias("mean_word_len"),
        _r6(hash_ratio).alias("hash_word_ratio"),
        _r6(ell_word_ratio).alias("ellipsis_word_ratio"),
        _r6(bullet_frac).alias("bullet_frac"),
        _r6(ellipsis_frac).alias("ellipsis_frac"),
        _r6(alpha_frac).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        keep.alias("keep"),
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, published
    section 2.2): keep only lines that end in a terminal punctuation
    mark (. ! ? or a closing quote) and have at least min_line_words
    words, drop any line mentioning 'javascript'; then flag the whole
    document as dropped (``keep`` = false) when fewer than
    min_kept_lines lines survive, or the page contains 'lorem ipsum'
    or a curly brace '{' (code/boilerplate tells).

    Entirely map-side Catalyst array ops (split -> filter ->
    array_join): no explode, no shuffle, no Python — per-document cost
    is linear in its own text, so the pass runs at scan speed at any
    corpus size. Emits the cleaned text plus kept/removed line counts
    so downstream mixing can weight by surviving content. No reference
    analogue; training-data-pipeline extension surface.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def line_ok(x: Column) -> Column:
        return (
            F.rtrim(x).rlike('[.!?"]$')
            & (F.size(F.split(F.trim(x), r"\s+")) >= min_line_words)
            & ~F.lower(x).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    n_kept = F.size(kept)
    keep = (
        (n_kept >= min_kept_lines)
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(kept, "\n").alias("text"),
        n_kept.alias("n_kept"),
        (F.size(lines) - n_kept).alias("n_removed"),
        keep.alias("keep"),
    )


def dedup_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_df: int = 2,
    materialize: bool = False,
) -> DataFrame:
    """ExactSubstr-style substring deduplication (Lee et al. 2021,
    public arXiv 2107.06499 "Deduplicating Training Data Makes Language
    Models Better"): REMOVE every token covered by a k-token span that
    occurs in >= min_df distinct documents. This is the removal pass on
    top of :func:`repeated_spans` (the flagging pass): where that
    operator maps duplication, this one edits it out — licence headers,
    quoted boilerplate, and copy-pasted passages vanish from every
    document while each document keeps its unique remainder.

    Plan shape: the span-hash stream and distinct-doc frequency agg are
    exactly repeated_spans' (one row per span occurrence, map-side
    partial agg, no pair enumeration — no quadratic path); the removal
    adds one per-doc flagged-position array (collect_set per id — size
    bounded by the doc's own span count) and a map-side index filter,
    linear in document length. Output text is whitespace-normalized
    (tokens rejoined with single spaces) for EVERY document so edited
    and untouched docs serialize consistently. Emits
    (id, text, n_removed). ``materialize`` forwards to
    :func:`repeated_spans` (see its cache contract) for sessions that
    retain results long-term.
    """
    if k < 1:
        raise ValueError(f"dedup_substrings: k must be >= 1, got {k}")
    flagged = repeated_spans(
        df, id_col, text_col, k=k, min_df=min_df, materialize=materialize
    )
    fp = flagged.groupBy("id").agg(
        F.sort_array(F.collect_set("pos")).alias("fp")
    )
    toks_df = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    j = toks_df.join(fp, "id", "left").withColumn(
        "fp", F.coalesce("fp", F.array().cast("array<int>"))
    )
    # token index i is covered iff some flagged span start p satisfies
    # p <= i <= p+k-1. Expand the flagged starts to the covered index
    # set ONCE and subtract with the hash-based array_except — a
    # per-index exists() over fp would be O(n_tokens * n_flagged) per
    # document, a single-row straggler on a 100k-token doc that is
    # mostly boilerplate; this form is O(n_tokens + k*n_flagged).
    # k is a plain Python int (constant-folded), NOT a lambda default
    # arg (the pyspark (element, index) two-param trap).
    idx = F.sequence(F.lit(0), F.size("t") - 1)
    covered = F.array_distinct(
        F.flatten(
            F.transform(F.col("fp"), lambda p: F.sequence(p, p + (k - 1)))
        )
    )
    kept_idx = F.array_except(idx, covered)
    return j.select(
        "id",
        F.array_join(
            F.transform(kept_idx, lambda i: F.get(F.col("t"), i)), " "
        ).alias("text"),
        (F.size("t") - F.size(kept_idx)).alias("n_removed"),
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a learned BPE merge table (rank order) to encode text —
    the application side of the tokenizer story whose training side is
    :func:`bpe_pair_counts` (count pairs -> learn merges -> ENCODE).

    For a valid BPE merge table (every multi-character merge operand
    was itself produced by an earlier-ranked merge), applying each
    merge with one left-to-right non-overlapping replace-all pass, in
    rank order, is EXACTLY the classic iterative lowest-rank-first BPE
    encoder (Sennrich et al. 2016, public arXiv 1508.07909): a later
    merge cannot create an earlier merge's operand, and merging (a,b)
    can never create a new adjacent (a,b) pair, so one pass per merge
    is exhaustive. That equivalence makes the encoder a pure Catalyst
    string-replace chain — map-side, no Python, no shuffle, linear in
    text size; pinned against an independent iterative-BPE Python model
    in the tests.

    Mechanics: every token is wrapped in OPEN (\x01) / CLOSE (\x02)
    control marks (assumed absent from the text) so a merge pattern
    ``OPEN a CLOSE OPEN b CLOSE`` can only match two complete adjacent
    tokens — a bare separator scheme would falsely match ``a`` as the
    suffix of a longer token (e.g. merge (e,r) inside "the|r"), and
    adjacent same-pair occurrences would share the separator and escape
    a single replace pass. Spaces keep word boundaries unmergeable.
    Returns (id, tokens array<string>, n_tokens).
    """
    op, cl = "\x01", "\x02"
    for a, b in merges:
        for part in (a, b):
            if not part or any(c.isspace() or c in (op, cl) for c in part):
                raise ValueError(
                    f"bpe_encode: merge operand {part!r} contains "
                    "whitespace/control marks or is empty - not a valid "
                    "BPE table entry (tokenization splits on whitespace, "
                    "and \\x01/\\x02 delimit tokens internally)"
                )
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    s = F.regexp_replace(t, "(.)", op + "$1" + cl)
    s = F.replace(s, F.lit(op + " " + cl), F.lit(" "))
    for a, b in merges:
        s = F.replace(
            s, F.lit(op + a + cl + op + b + cl), F.lit(op + a + b + cl)
        )
    # token boundary within a word is CLOSE+OPEN, across words
    # CLOSE+space+OPEN; unify, strip the outer marks, split
    s = F.replace(s, F.lit(cl + " " + op), F.lit(cl + op))
    s = F.regexp_replace(s, "^" + op + "|" + cl + "$", "")
    toks = F.split(s, cl + op)
    return df.select(
        F.col(id_col).alias("id"),
        toks.alias("tokens"),
        F.size(toks).alias("n_tokens"),
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int = 8,
    checkpoint_every: int = 16,
) -> list[tuple[str, str, int]]:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, public
    arXiv 1508.07909 "Neural Machine Translation of Rare Words with
    Subword Units"): learn ``num_merges`` merges from the corpus and
    return ``[(a, b, pair_count), ...]`` in learn order — the merge
    table :func:`bpe_encode` applies. Completes the tokenizer story
    whose single counting step is :func:`bpe_pair_counts`.

    Greedy objective, ties broken (count desc, a asc, b asc) so the
    learned table is deterministic and cross-engine reproducible
    (:func:`bpe_train_sql` is the chained-CTE DuckDB mirror).

    Scale shape — the loop never touches the corpus again after one
    scan: the corpus collapses to the DISTINCT-WORD frequency table by
    one distributed map-side-combined aggregation (vocabulary-sized,
    orders of magnitude below corpus size — the same reduction
    production BPE trainers apply), and the greedy merge loop then runs
    ON ONE EXECUTOR over that table as a single Arrow-batched grouped
    map — the single-node-trainer shape production BPE implementations
    use once the corpus has collapsed to word frequencies. The former
    per-merge DataFrame round (pair explode + hash agg + TakeOrdered(1)
    driver collect + replace projection) paid TWO jobs and a driver
    barrier PER MERGE (guide §2.4): real tokenizers learn 10^4-10^5
    merges, so the barrier count — not the vocab-sized compute —
    dominated at every scale. The result collect is num_merges rows (a
    bounded dimension collect, like the IVF centroid seeds); peak
    executor memory is one vocab table, bounded by distinct-word count,
    not corpus size.

    The in-task loop replays the exact published greedy semantics the
    DataFrame round implemented: per-position pair counts weighted by
    word frequency, argmax with (count desc, a asc, b asc) tie-break
    (Python tuple order on code points == Spark's UTF8 binary orderBy
    == the DuckDB mirror), and a left-to-right non-overlapping merge
    pass per word — pinned against the independent classic-trainer
    model and the chained-CTE oracle in the tests.

    Tokens containing the marker bytes are excluded from training (they
    cannot be represented; real text never contains \\x01/\\x02).
    ``checkpoint_every`` is retained for API compatibility; the
    executor-side loop has no lineage to truncate.
    """
    import pandas as pd  # noqa: F401  (applyInPandas contract)

    op, cl = "\x01", "\x02"
    words = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(
            (F.length("tok") >= 1)
            & ~F.col("tok").contains(op)
            & ~F.col("tok").contains(cl)
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_merges = int(num_merges)

    def train(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd  # self-contained for cloudpickle
        from collections import Counter

        # list(str) iterates code points — the same symbol split as the
        # former regexp_replace('(.)') (Java regex and RE2 both match
        # "." per code point)
        syms = [list(t) for t in pdf["tok"]]
        cnts = [int(c) for c in pdf["cnt"]]
        learned = []
        for _ in range(n_merges):
            pc: Counter = Counter()
            for s, c in zip(syms, cnts):
                for j in range(len(s) - 1):
                    pc[(s[j], s[j + 1])] += c
            if not pc:
                break  # corpus exhausted: every word is one symbol
            (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            learned.append((a, b, n))
            ab = a + b
            for i, s in enumerate(syms):
                L = len(s)
                if L < 2:
                    continue
                out = None
                j = 0
                while j < L:
                    if j + 1 < L and s[j] == a and s[j + 1] == b:
                        if out is None:
                            out = s[:j]
                        out.append(ab)
                        j += 2
                    else:
                        if out is not None:
                            out.append(s[j])
                        j += 1
                if out is not None:
                    syms[i] = out
        return pd.DataFrame(
            [(i + 1, a, b, n) for i, (a, b, n) in enumerate(learned)],
            columns=["rk", "a", "b", "n"],
        )

    rows = (
        words.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(train, "rk int, a string, b string, n long")
        .collect()
    )
    rows.sort(key=lambda r: r["rk"])
    return [(r["a"], r["b"], int(r["n"])) for r in rows]


def bpe_train_sql(table: str, text_col: str, *, num_merges: int = 8) -> str:
    """DuckDB mirror of :func:`bpe_train` as one chained-CTE query
    emitting ``(rk, a, b, n)`` — stage k's argmax feeds stage k+1's
    replace exactly like the Spark loop, so the learned table matches
    bit-for-bit (integer counts, binary-collation tie-breaks, the same
    non-overlapping replace)."""
    w0 = f"""w0 AS MATERIALIZED (
      SELECT regexp_replace(tok, '(.)', chr(1) || '\\1' || chr(2), 'g') AS s,
             count(*) AS cnt
      FROM (SELECT unnest(regexp_split_to_array(trim({text_col}), '\\s+')) AS tok
            FROM {table})
      WHERE length(tok) >= 1
        AND strpos(tok, chr(1)) = 0 AND strpos(tok, chr(2)) = 0
      GROUP BY tok
    )"""
    ctes = [w0]
    for k in range(num_merges):
        ctes.append(f"""p{k} AS MATERIALIZED (
      SELECT a, b, sum(cnt) AS n FROM (
        SELECT cnt, y[i] AS a, y[i + 1] AS b
        FROM (SELECT cnt, y, unnest(range(1, len(y))) AS i
              FROM (SELECT cnt,
                           regexp_split_to_array(
                             regexp_replace(s, '^\\x01|\\x02$', '', 'g'),
                             chr(2) || chr(1)) AS y
                    FROM w{k})
              WHERE len(y) >= 2)
      ) GROUP BY a, b
    )""")
        ctes.append(
            f"b{k} AS MATERIALIZED "
            f"(SELECT a, b, n FROM p{k} ORDER BY n DESC, a, b LIMIT 1)"
        )
        if k + 1 < num_merges:
            ctes.append(f"""w{k + 1} AS MATERIALIZED (
      SELECT replace(s, chr(1) || x.a || chr(2) || chr(1) || x.b || chr(2),
                     chr(1) || x.a || x.b || chr(2)) AS s, cnt
      FROM w{k}, b{k} x
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({k + 1} AS INT) AS rk, a, b, CAST(n AS BIGINT) AS n"
        f" FROM b{k}"
        for k in range(num_merges)
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"\n    {union}"
    )


# ln via correctly-rounded IEEE ops only. `ln` is the one op in the
# registry's gate values that IEEE 754 does NOT require to be correctly
# rounded, so JVM Math.log and a given libm can differ in the last ulp
# and flip a 1e-6-scaled floor (the bm25_topk r6 driver-red). sqrt and
# the four arithmetic ops ARE correctly rounded everywhere, so the same
# op sequence over the same doubles is bit-identical in any engine.
# k=16 reductions cover the FULL positive double range: |ln x| <= 709,
# so ln(y) <= 709/65536 = 0.011, z <= 0.0055, series truncation z^9/9
# ~ 1e-20; the dominant error is the sqrt chain's accumulated 0.5-ulp
# relative error amplified by 2^(k+1): ~1e-10 absolute on ln x —
# orders below every consumer's quantum (bm25's 1e-6 floor, DDSketch's
# ~0.02 bucket width). k=8 was accurate only to ~3e7 (r7 review).
_LN_CR_SQRTS = 16  # range reduction: ln(x) = 2^k * ln(x^(1/2^k))


def ln_cr(x: Column) -> Column:
    """Natural log of ``x`` — DOMAIN: x > 0 (strictly positive finite)
    ONLY. x = 0 returns finite garbage (~-2.2e5, via z = -1 — NOT
    -inf), and negative x surfaces as NaN only through the sqrt chain;
    neither misuse raises. Callers must guarantee positivity the way
    bm25 (idf arg >= ln 2) and dd_sketch (sgn guard) do. A runtime
    branch here is deliberately NOT added: a CaseWhen wrapper would
    block whole-stage codegen's common-subexpression hoisting of the
    16-sqrt chain in consumers (see :func:`ln_cr_append`'s 50x note).

    Uses only correctly-rounded IEEE double
    ops (+, -, *, /, sqrt) — bit-identical across JVM and libm engines.

    Range-reduce with ``_LN_CR_SQRTS`` = 16 square roots
    (y = x^(1/65536), so ln(y) <= 0.011 over the ENTIRE positive
    double range), then the atanh series
    ``ln(y) = 2(z + z^3/3 + z^5/5 + z^7/7)`` with z = (y-1)/(y+1).
    Absolute error < ~1e-10 for any positive finite double (dominated
    by the sqrt chain's accumulated half-ulp relative error amplified
    by the 2^17 rescale; series truncation is ~1e-20) — orders below
    every consumer's quantum. The op sequence here and in
    :func:`ln_cr_sql` is IDENTICAL (same associativity, same
    literals), which is what makes the value hashable cross-engine:
    even at a quantization boundary both engines floor the SAME bits.
    """
    y = x
    for _ in range(_LN_CR_SQRTS):
        y = F.sqrt(y)
    z = (y - F.lit(1.0)) / (y + F.lit(1.0))
    z2 = z * z
    s = (
        z
        + (z * z2) / F.lit(3.0)
        + (z * z2 * z2) / F.lit(5.0)
        + (z * z2 * z2 * z2) / F.lit(7.0)
    )
    return s * F.lit(float(2 ** (_LN_CR_SQRTS + 1)))


def ln_cr_append(df: DataFrame, src: Column, out: str) -> DataFrame:
    """Append column ``out`` = :func:`ln_cr` of ``src`` via STAGED
    projections, each intermediate (the sqrt chain, z, z²) computed
    once per row. Use this instead of the plain expression when the
    value feeds a CaseWhen branch or another context where whole-stage
    codegen cannot hoist common subexpressions: the single-expression
    form textually repeats the 16-sqrt chain 32x, and unhoisted that
    is ~50x slower per row (measured at k=8: dd_sketch 25 s -> <1 s
    at 20 M rows; k=16 doubles the unhoisted chain). CollapseProject keeps these stages separate because each
    intermediate is referenced more than once downstream; the op
    sequence — and therefore the value — is bit-identical to ln_cr.
    """
    y = src
    for _ in range(_LN_CR_SQRTS):
        y = F.sqrt(y)
    d = df.withColumn("__lncr_y", y)
    yc = F.col("__lncr_y")
    d = d.withColumn("__lncr_z", (yc - F.lit(1.0)) / (yc + F.lit(1.0)))
    z = F.col("__lncr_z")
    d = d.withColumn("__lncr_z2", z * z)
    z2 = F.col("__lncr_z2")
    s = (
        z
        + (z * z2) / F.lit(3.0)
        + (z * z2 * z2) / F.lit(5.0)
        + (z * z2 * z2 * z2) / F.lit(7.0)
    )
    return d.withColumn(
        out, s * F.lit(float(2 ** (_LN_CR_SQRTS + 1)))
    ).drop("__lncr_y", "__lncr_z", "__lncr_z2")


def ln_cr_sql(x: str) -> str:
    """DuckDB/ANSI mirror of :func:`ln_cr` — the IDENTICAL op sequence
    (left-associative sums/products, same literals), so the SQL oracle
    reproduces the Spark value bit-for-bit. ``x`` should be a short
    column reference (it is repeated textually). Same DOMAIN contract
    as :func:`ln_cr`: strictly positive finite only — x = 0 yields
    finite garbage, not -inf."""
    y = x
    for _ in range(_LN_CR_SQRTS):
        y = f"sqrt({y})"
    z = f"(({y} - 1.0) / ({y} + 1.0))"
    z2 = f"({z} * {z})"
    s = (
        f"({z} + ({z} * {z2}) / 3.0 + ({z} * {z2} * {z2}) / 5.0"
        f" + ({z} * {z2} * {z2} * {z2}) / 7.0)"
    )
    return f"({s} * {float(2 ** (_LN_CR_SQRTS + 1))!r})"


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 lexical retrieval (Robertson & Zaragoza 2009, the public
    Okapi BM25 formula): top-k corpus documents per query — the lexical
    complement to the embedding ANN family (similarity.py), and the
    retrieval pass a curation pipeline uses to find reference-like
    documents without embeddings.

    Integer-exact ranking: each matched term's contribution
    ``idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` is a deterministic
    IEEE expression of exact integers (tf, df, dl, N) and the exact
    ratio avgdl = sum(dl)/N — it is rounded to a 1e-6-scaled BIGINT
    before the per-(query, doc) sum, so the sum is order-independent
    and the ranking bit-exact in any engine (the same contract as the
    int8 dot-product ranking). idf is the standard
    ln(1 + (N - df + 0.5)/(df + 0.5)) — always positive — computed via
    :func:`ln_cr` (correctly-rounded ops only: JVM Math.log and libm
    may differ by 1 ulp, which flipped the 1e-6 floor in r6; the
    series form is bit-identical cross-engine by construction).

    Scale shape: postings (term, doc, tf, dl) are one shuffle of the
    token stream; corpus stats (N, sum dl) ride ONE 1-row aggregate
    broadcast via crossJoin; the query term table is tiny by definition
    and arrives BROADCAST, so the corpus never reshuffles for the
    match; the matched stream (bounded by the query terms' postings)
    pays one (q, doc) agg and a per-query top-k window over queries'
    own candidates. Emits (q_id, id, score_q6, rk).
    """
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    docs = corpus.select(
        F.col(id_col).alias("id"), toks.alias("t"), F.size(toks).alias("dl")
    )
    # Corpus stats come from a MAP-ONLY aggregate over the doc stream —
    # the former derivation from postings.distinct() ("share the
    # postings exchange") never actually shared it: Catalyst evaluated
    # the unmaterialized postings subtree (full corpus tokenization +
    # token-stream shuffle) once per reference — three times per query
    # (guide §2.4). A doc contributes to postings iff it has >= 1
    # token, so dl >= 1 reproduces the distinct()'s row set exactly.
    stats = (
        docs.select("id", "dl")
        .where(F.col("dl") >= 1)
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl"))
    )
    # The query term table is tiny by definition; blockify it once so
    # its three consumers (qvocab semi-filter, the match broadcast)
    # don't each re-evaluate its lineage.
    qterms = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.explode(F.array_distinct(tokens(F.col(q_text_col)))).alias("term"),
    ).localCheckpoint(eager=True)
    # restrict the token stream to the query vocabulary BEFORE the tf
    # aggregation, not after it: tf/df per surviving (id, term) are
    # unchanged by the restriction (filter-then-count == count-then-
    # filter on the group key), and the posting shuffle now carries
    # only query-term occurrences instead of the whole corpus token
    # stream (guide §2.3: shuffle fewer bytes). Every broadcast side
    # stays query-bounded (a full-vocabulary df table would not be
    # broadcastable at corpus scale).
    qvocab = qterms.select("term").distinct()
    p_q = (
        docs.select("id", "dl", F.explode("t").alias("term"))
        .join(F.broadcast(qvocab), "term")
        .groupBy("id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df per term rides a window over the query-bounded postings — the
    # former separate dfreq aggregate + broadcast join re-evaluated the
    # whole corpus pass a second time (guide §2.4); the window's term
    # shuffle moves only query-term postings. Same count, same idf.
    p_q = p_q.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = ln_cr(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / avgdl))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    matched = (
        p_q.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "q_id",
            "id",
            F.floor(contrib * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("c_q6"),
        )
    )
    scored = matched.groupBy("q_id", "id").agg(F.sum("c_q6").alias("score_q6"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_q6").desc(), F.col("id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("q_id", "id", "score_q6", "rk")
    )
