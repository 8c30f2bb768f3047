"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions / built-in functions — JVM-side, whole-
stage-codegen friendly, no Python in the hot path. Designed for the
100 TB documents case: every operator is a narrow map over the text
column (no shuffle), so it scales linearly with input splits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the heuristic language ID.
# Real pipelines plug in fastText/CLD3 via a pandas UDF; the heuristic
# keeps everything JVM-side and deterministic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr": ("le", "la", "de", "et", "est", "un", "que", "pour"),
    "zh": ("de", "le", "shi", "bu", "wo", "you", "zai", "ta"),
}

# BPE-ish token pattern: runs of letters, runs of digits, or a single
# non-space symbol — the shape subword tokenizers split on.
TOKEN_PATTERN = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# the [a-zA-Z] class spelled out for translate()-based counting
_ASCII_LETTERS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def portable_md5_prefix64(x: Column) -> Column:
    """THE engine-portable hash core: first 8 hex chars of md5(x) as
    a non-negative long. This exact expression is the cross-engine
    parity contract with every DuckDB oracle
    (``CAST(('0x'||substr(md5(x),1,8)) AS BIGINT)``) — all portable
    hashing (sampling buckets, fingerprints, classifier features,
    pack buckets) MUST route through this one definition so a change
    can never silently desynchronize one operator's certification."""
    return F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    t = F.col(text) if isinstance(text, str) else text
    return F.split(t, " ")


def _ws_tokens_sql(text_col: str) -> str:
    """SQL fragment of :func:`ws_tokens` over a plain column name —
    sameSemantics-identical (both parse to split(col, ' ', -1))."""
    return f"split(`{text_col}`, ' ')"


def sql_str_lit(value: str) -> str:
    """``value`` as a safely quoted SQL string literal. Every operator
    that interpolates caller-supplied strings into a parsed-SQL
    fragment MUST route through this (r14, advice item: a vocabulary
    word like "don't" would otherwise break the parse — or worse,
    silently change the expression)."""
    return "'%s'" % value.replace("\\", "\\\\").replace("'", "\\'")


def regex_tokens(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """BPE-ish regex tokenization -> array<string> (letter runs, digit
    runs, single symbols)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(t, F.lit(pattern), 0)


def token_count(text: Column | str, mode: str = "ws") -> Column:
    """Token count, whitespace or regex mode."""
    return F.size(ws_tokens(text) if mode == "ws" else regex_tokens(text))


def stopword_hits(tokens: Column | str, vocabulary: Sequence[str]) -> Column:
    """Number of tokens that are in ``vocabulary`` (with repeats).

    ``tokens`` may be a SQL fragment (str) — the r13 build-sweep form:
    the vocab literal array plus the filter lambda cost ~N+30 py4j
    round trips per call as Columns (language_id pays it per language)
    vs one parse; sameSemantics-identical."""
    if isinstance(tokens, str):
        vocab_sql = "array(%s)" % ",".join(sql_str_lit(w) for w in vocabulary)
        return F.expr(
            f"size(filter({tokens}, x -> array_contains({vocab_sql}, x)))"
        )
    vocab = F.array(*[F.lit(w) for w in vocabulary])
    return F.size(F.filter(tokens, lambda x: F.array_contains(vocab, x)))


def raw_text_stats(
    text_col: str = "text",
    toks: Column | None = None,
    sw: Column | None = None,
) -> dict[str, Column]:
    """Unrounded stat expressions keyed by name. The single source of
    truth for both ``text_stats`` (which rounds for display) and
    ``quality_score`` (which must combine UNROUNDED ratios so the
    composite is rounded exactly once, matching single-rounding
    oracles).

    ``toks``/``sw`` (r13): references to an already-materialized token
    array / stopword-hit count. The default (build them inline from
    ``text_col``) re-evaluates split(text) once per OCCURRENCE in the
    consumer's projection — HOF-bearing Projects run fully interpreted
    with no codegen and no subexpression elimination, so the collapsed
    d2 projection paid ~9 split passes + 3 stopword filter passes per
    row. Callers that project the array/count once (multi-referenced
    aliases block CollapseProject from re-inlining them) get each pass
    exactly once."""
    t = F.col(text_col)
    toks = ws_tokens(t) if toks is None else toks
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    # char-class counts via translate (delete the class, diff the
    # lengths) — bit-identical to the regexp_replace('[^...]') form
    # but a per-char table lookup instead of a regex engine pass:
    # 17x on the 64x scale replica (10.9 s -> 0.64 s for the three
    # counts), and these three counts were the single largest term of
    # both d2_text_quality and the c1 curation DAG at that octave
    alpha = n_chars - F.length(F.translate(t, _ASCII_LETTERS, ""))
    digits = n_chars - F.length(F.translate(t, "0123456789", ""))
    spaces = n_chars - F.length(F.translate(t, " ", ""))
    punct = n_chars - alpha - digits - spaces
    if sw is None:
        sw = stopword_hits(_ws_tokens_sql(text_col), STOPWORDS["en"])
    # n_chars is 0 for the empty document — routine in web corpora;
    # under Spark 4's default ANSI mode a bare division would ABORT
    # the whole job with DIVIDE_BY_ZERO, so empty docs get 0.0 ratios
    # (-> a finite rock-bottom quality score, filtered like any other
    # junk). n_tokens is never 0: ws_tokens('') is ['']. The certified
    # corpus contains no empty docs, so the oracle formulas (which
    # divide bare) remain hash-identical on certified data.
    def _ratio(num: Column, den: Column) -> Column:
        return F.when(den == 0, F.lit(0.0)).otherwise(num / den)

    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": _ratio(n_chars, n_tokens),
        "punct_ratio": _ratio(punct, n_chars),
        "digit_ratio": _ratio(digits, n_chars),
        "stopword_ratio": _ratio(sw, n_tokens),
    }


def _stopword_hits_sql(tokens: str, vocabulary: Sequence[str]) -> str:
    """SQL fragment of :func:`stopword_hits` over a SQL fragment."""
    vocab_sql = "array(%s)" % ",".join(sql_str_lit(w) for w in vocabulary)
    return f"size(filter({tokens}, x -> array_contains({vocab_sql}, x)))"


def _raw_text_stats_sql(
    text_col: str, toks: str, sw: str
) -> dict[str, str]:
    """SQL-fragment twin of :func:`raw_text_stats` over column NAMES
    (``toks``/``sw`` already projected) — parses to the identical
    expressions (same translate char classes, same guarded ratios,
    D-suffixed double literals matching F.lit(0.0)); exists so
    ``_stats_select`` can assemble its whole stat projection in one
    parse instead of ~40 py4j round trips (r14)."""
    t = f"`{text_col}`"
    n_chars = f"length({t})"
    n_tokens = f"size(`{toks}`)"
    alpha = f"({n_chars} - length(translate({t}, {sql_str_lit(_ASCII_LETTERS)}, '')))"
    digits = f"({n_chars} - length(translate({t}, '0123456789', '')))"
    spaces = f"({n_chars} - length(translate({t}, ' ', '')))"
    punct = f"({n_chars} - {alpha} - {digits} - {spaces})"

    def _ratio(num: str, den: str) -> str:
        return f"CASE WHEN {den} = 0 THEN 0.0D ELSE {num} / {den} END"

    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": _ratio(n_chars, n_tokens),
        "punct_ratio": _ratio(punct, n_chars),
        "digit_ratio": _ratio(digits, n_chars),
        "stopword_ratio": _ratio(f"`{sw}`", n_tokens),
    }


def _quality_sql(raw: dict[str, str]) -> str:
    """SQL-fragment twin of :func:`_quality_expr` — literal-for-literal
    the same arithmetic (left-associative, D-suffixed doubles)."""
    return (
        f"least({raw['n_tokens']} / 32.0D, 1.0D) * 0.4D "
        f"+ least({raw['stopword_ratio']} * 4.0D, 1.0D) * 0.3D "
        f"+ (1.0D - least({raw['punct_ratio']} * 4.0D, 1.0D)) * 0.2D "
        f"+ (1.0D - least({raw['digit_ratio']} * 4.0D, 1.0D)) * 0.1D"
    )


def _quality_expr(raw: dict[str, Column]) -> Column:
    """Composite [0,1] quality score from UNROUNDED ratio expressions
    (rounded once by the caller)."""
    return (
        F.least(raw["n_tokens"] / 32.0, F.lit(1.0)) * 0.4
        + F.least(raw["stopword_ratio"] * 4.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(raw["punct_ratio"] * 4.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(raw["digit_ratio"] * 4.0, F.lit(1.0))) * 0.1
    )


def _stats_select(
    df: DataFrame, text_col: str, with_quality: bool
) -> DataFrame:
    """Shared body of ``text_stats``/``quality_score`` (r13): the token
    array and the stopword-hit count are projected ONCE below the stat
    projection and referenced by name. Both temp aliases are referenced
    more than once by their consumers, which blocks CollapseProject
    from re-inlining them — without that, the collapsed projection
    re-evaluated split(text) at every occurrence (interpreted, no CSE:
    HOF-bearing Projects never enter whole-stage codegen). The final
    projection is HOF-free, so it DOES codegen and its duplicated
    translate() subtrees are subexpression-eliminated. Output
    expressions are unchanged — bit-identical stats/quality."""
    tk, swc = "__qs_toks", "__qs_sw"
    s1 = df.selectExpr("*", f"{_ws_tokens_sql(text_col)} AS `{tk}`")
    s2 = s1.selectExpr(
        "*", f"{_stopword_hits_sql(f'`{tk}`', STOPWORDS['en'])} AS `{swc}`"
    )
    raw = _raw_text_stats_sql(text_col, toks=tk, sw=swc)
    out_exprs = [f"`{c}`" for c in df.columns] + [
        f"CAST({raw['n_chars']} AS BIGINT) AS stat_n_chars",
        f"CAST({raw['n_tokens']} AS BIGINT) AS stat_n_tokens",
        f"round({raw['avg_token_len']}, 6) AS stat_avg_token_len",
        f"round({raw['punct_ratio']}, 6) AS stat_punct_ratio",
        f"round({raw['digit_ratio']}, 6) AS stat_digit_ratio",
        f"round({raw['stopword_ratio']}, 6) AS stat_stopword_ratio",
    ]
    if with_quality:
        out_exprs.append(f"round({_quality_sql(raw)}, 6) AS quality")
    return s2.selectExpr(*out_exprs)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature block: lengths, token stats, character-
    class ratios, stopword ratio. One narrow map (two collapsed-proof
    projections; tokens materialized once). Ratio columns are rounded
    to 6 decimals for output; use ``raw_text_stats`` when composing
    further arithmetic on them."""
    return _stats_select(df, text_col, with_quality=False)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1] from the stats block — the usual
    pretraining-filter shape (length window + stopword presence -
    punctuation/digit noise). The score combines the UNROUNDED ratios
    and rounds exactly once at the end, so it matches a single-rounding
    oracle formula bit-for-bit (the rounded stat_* display columns are
    not inputs to the score)."""
    return _stats_select(df, text_col, with_quality=True)


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts, argmax
    with ties -> alphabetically first language (deterministic).

    r13: the token array is projected once below the per-language hit
    counts (multi-referenced alias -> no CollapseProject re-inline);
    the old form inlined split(text) into all five interpreted filter
    lambdas — five tokenizations per row."""
    tk = "__lid_toks"
    base = df.select("*", F.expr(_ws_tokens_sql(text_col)).alias(tk))
    scored = base.select(
        "*", *[stopword_hits(f"`{tk}`", ws).alias(f"_hits_{lang}") for lang, ws in sorted(STOPWORDS.items())]
    )
    langs = sorted(STOPWORDS)
    # one parsed argmax projection (r14): the Column form built two
    # literal arrays + extract element-by-element (~15 py4j calls)
    hits = "array(%s)" % ", ".join(f"_hits_{lang}" for lang in langs)
    lang_arr = "array(%s)" % ", ".join(sql_str_lit(lang) for lang in langs)
    best = f"{lang_arr}[array_position({hits}, array_max({hits})) - 1]"
    return scored.selectExpr(
        *[f"`{c}`" for c in df.columns], f"{best} AS `{out_col}`"
    )


def rolling_fingerprint(
    tokens: Column, base: int = 257, mod: int = 1_000_000_007
) -> Column:
    """Deterministic polynomial rolling hash over the token stream —
    a document fingerprint: fp = sum(h(tok_i) * base^(n-1-i)) % mod,
    with h = xxhash64 folded into [0, mod). Expressed with
    F.aggregate, fully JVM-side. Fastest variant; the token hash is
    Spark-specific (see ``portable_fingerprint`` for the cross-engine
    form)."""
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + F.pmod(F.xxhash64(x), F.lit(mod))) % mod,
    )


def portable_fingerprint(
    tokens: Column | str, base: int = 257, mod: int = 1_000_000_007
) -> Column:
    """Rolling fingerprint with an engine-portable token hash: the
    first 8 hex chars of md5(token) as an integer, folded into
    [0, mod). Any engine with md5 reproduces it bit-for-bit (DuckDB:
    ``CAST(('0x'||substr(md5(x),1,8)) AS BIGINT)``), which makes the
    fingerprint oracle-checkable cross-engine. Same polynomial shape
    and cost profile as ``rolling_fingerprint`` (md5 is ~3x slower
    than xxhash64 per token — still a narrow JVM-side map)."""
    if isinstance(tokens, str):
        # SQL-fragment form (r13 build sweep): one parse instead of
        # the two-lambda py4j assembly; sameSemantics-identical
        return F.expr(
            f"aggregate({tokens}, CAST(0 AS BIGINT), (acc, x) -> "
            f"(acc * {base} + pmod(CAST(conv(substring(md5(x), 1, 8), "
            f"16, 10) AS BIGINT), {mod})) % {mod})"
        )
    return F.aggregate(
        tokens,
        F.lit(0).cast("long"),
        lambda acc, x: (
            acc * base
            + F.pmod(
                portable_md5_prefix64(x), F.lit(mod)
            )
        )
        % mod,
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_frac_max: float = 0.2,
    dup_2gram_max: float = 0.2,
) -> DataFrame:
    """Gopher-style repetition filters: most-frequent-word fraction and
    duplicate-2-gram fraction, plus the pass/fail flag pretraining
    curation applies (Rae et al. 2021 repetition rules, word-level).

    Output: [id_col, n_tokens, top_word_count, top_word_frac,
    dup_2gram_frac, repetition_ok].

    Entirely NARROW — no explode, no shuffle, no state: the integer
    counts (token count, max token multiplicity, distinct-2-gram
    count) come from ONE Arrow-batched pandas UDF over the raw text
    (``_repetition_counts``), and every fraction/threshold stays a
    Spark expression so the rounding arithmetic is the exact formula
    the DuckDB oracle reproduces. A 100 TB corpus runs this as a pure
    map stage (plan-pinned: no Exchange). The flag compares ROUNDED
    fractions so engines agree at thresholds.

    Why a UDF here: the counts were previously higher-order-function
    folds over the token array (sorted longest-equal-run + a 2-gram
    transform). HOF expressions are INTERPRETED — no codegen, no
    subexpression elimination — and the fold dominated the d2
    certification; the Arrow batch form computes the same integers
    ~2.2x faster at sf0.1 (bit-identical output, verified value-for-
    value). Python's ``text.split(" ")`` is exactly Spark's
    ``split(text, ' ')`` — single-space literal split, empty string
    -> [''] — which is what keeps the counts engine-identical."""
    raw = df.select(
        F.col(id_col), _repetition_counts(F.col(text_col)).alias("_r")
    )
    return raw.select(
        F.col(id_col), *_repetition_final_exprs(top_frac_max, dup_2gram_max)
    )


_REP_COUNTS_UDF = None


def _repetition_counts(col: Column) -> Column:
    """Arrow-batched integer counts behind the repetition metrics:
    struct<n, topc, d2> with n = whitespace token count, topc = max
    token multiplicity, d2 = distinct 2-gram count (n == 1 -> 1,
    mirroring the expression form's single-element gram window; NULL
    text -> NULL fields). The UDF closure is self-contained (stdlib +
    pandas only) so executors that cannot import this package still
    run it; the UDF object is created lazily because pandas_udf
    resolves its return type against an active session (module import
    must not require one)."""
    global _REP_COUNTS_UDF
    if _REP_COUNTS_UDF is None:
        from pyspark.sql.types import LongType, StructField, StructType

        rtype = StructType(
            [
                StructField("n", LongType()),
                StructField("topc", LongType()),
                StructField("d2", LongType()),
            ]
        )

        def counts(texts):
            import pandas as pd
            from collections import Counter

            ns, topcs, d2s = [], [], []
            for t in texts:
                if t is None:
                    ns.append(None), topcs.append(None), d2s.append(None)
                    continue
                toks = t.split(" ")
                n = len(toks)
                ns.append(n)
                topcs.append(max(Counter(toks).values()))
                d2s.append(1 if n == 1 else len(set(zip(toks, toks[1:]))))
            return pd.DataFrame(
                {
                    "n": pd.array(ns, dtype="Int64"),
                    "topc": pd.array(topcs, dtype="Int64"),
                    "d2": pd.array(d2s, dtype="Int64"),
                }
            )

        _REP_COUNTS_UDF = F.pandas_udf(counts, rtype)
    return _REP_COUNTS_UDF(col)


def _repetition_final_exprs(
    top_frac_max: float, dup_2gram_max: float
) -> list[Column]:
    """Fractions/flags over the ``_repetition_counts`` struct column
    ``_r`` — plain Spark expressions, so the divisions and 6-decimal
    rounds are the exact formulas the oracles carry."""
    n = F.col("_r.n")
    topc = F.col("_r.topc")
    n2 = F.greatest(n - 1, F.lit(1))
    d2 = F.col("_r.d2")
    top_frac = F.round(topc / n, 6)
    dup_frac = F.round(F.lit(1.0) - d2 / n2, 6)
    return [
        n.alias("n_tokens"),
        topc.cast("long").alias("top_word_count"),
        top_frac.alias("top_word_frac"),
        dup_frac.alias("dup_2gram_frac"),
        ((top_frac <= top_frac_max) & (dup_frac <= dup_2gram_max))
        .cast("long")
        .alias("repetition_ok"),
    ]


def with_repetition_flag(
    df: DataFrame,
    text_col: str = "text",
    top_frac_max: float = 0.2,
    dup_2gram_max: float = 0.2,
    out_col: str = "repetition_ok",
) -> DataFrame:
    """Append only the pass/fail repetition flag, keeping every input
    column — the filter-stage form (streaming-safe: pure narrow maps,
    no joins, no state; the Arrow-batched count UDF is stateless)."""
    if "_r" in df.columns:
        raise ValueError(
            "with_repetition_flag reserves the working column '_r';"
            " rename it on the input frame"
        )
    raw = df.select("*", _repetition_counts(F.col(text_col)).alias("_r"))
    flag = _repetition_final_exprs(top_frac_max, dup_2gram_max)[-1]
    return raw.select(*df.columns, flag.alias(out_col))


def classifier_weights(n_features: int = 256, seed: int = 13) -> list[float]:
    """Deterministic stand-in weight vector for the linear quality
    classifier: portable LCG (the same generator family as the LSH
    hyperplanes — no numpy state, reproducible on any engine) mapped
    into (-1, 1). Real deployments replace this with the trained
    fastText / logistic-regression weights; everything downstream is
    agnostic to where the numbers came from."""
    state = seed
    out = []
    for _ in range(n_features):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append((state / float(1 << 64)) * 2.0 - 1.0)
    return out


def classifier_quality_score(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = 256,
    seed: int = 13,
    weights: Sequence[float] | None = None,
    out_col: str = "clf_score",
) -> DataFrame:
    """Model-based quality scoring — the fastText/CCNet/DCLM filter
    stage of a pretraining pipeline — as a linear classifier over
    hashed bag-of-words features, mean-pooled and squashed with a
    sigmoid:

        score = sigmoid( Σ_t W[h(t) mod n_features] / n_tokens )

    Evaluated entirely as Catalyst expressions: ONE narrow projection,
    zero shuffle, zero Python; the weight vector is inlined as a
    literal array, so at 100 TB the score costs a per-token hash +
    array lookup inside whole-stage codegen with no side input at all
    (a trained model still fitting a literal/broadcast rides the same
    plan). Featurization uses the engine-portable md5-prefix token
    hash (the ``portable_fingerprint`` family), so any engine
    reproduces the exact score — which is what makes the operator
    oracle-certifiable, unlike an opaque model binary.

    ``weights`` defaults to :func:`classifier_weights` (seeded
    stand-in); pass trained weights in production."""
    if weights is None:
        weights = classifier_weights(n_features, seed)
    if len(weights) != n_features:
        raise ValueError(
            f"weights has {len(weights)} entries, expected n_features={n_features}"
        )
    # ONE parsed SQL expression (r13 build sweep): the literal weight
    # array alone cost n_features py4j round trips per build (~0.3 s
    # at 256), plus the fold lambda; sameSemantics-identical. The
    # token array is projected once below the score (two references —
    # the fold and the size — block CollapseProject, so the old form's
    # TWO split(text) evaluations per row become one).
    w_sql = "array(%s)" % ",".join(f"{float(w)!r}D" for w in weights)
    tk = "__clf_toks"
    base = df.select("*", F.expr(_ws_tokens_sql(text_col)).alias(tk))
    z_sql = (
        f"aggregate(`{tk}`, 0.0D, (acc, x) -> acc + element_at({w_sql}, "
        "CAST(pmod(CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT), "
        f"{n_features}) + 1 AS INT))) / size(`{tk}`)"
    )
    return base.select(
        *[F.col(c) for c in df.columns],
        F.expr(f"1.0D / (1.0D + exp(-({z_sql})))").alias(out_col),
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """CCNet/KenLM-style n-gram language-model quality scoring, fit on
    the corpus itself and scored per document — the classic "perplexity
    filter" stage of a pretraining pipeline (docs whose per-token
    log-probability under a corpus LM is far below typical are
    boilerplate/gibberish candidates).

    Model: add-k-smoothed bigram LM over whitespace tokens,

        P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)

    with V = |vocabulary|. Output per doc: ``n_bigrams`` and
    ``lm_logp`` = avg ln P over the doc's bigrams (rounded 6dp; 0.0
    for docs with < 2 tokens). Perplexity = exp(-lm_logp) is monotone
    in it, so filtering thresholds translate directly.

    Scale shape (the part that matters at 100 TB): fit and score are
    BOTH distributed —
      * unigram/bigram counts: explode + groupBy with map-side
        partials (shuffles fixed-width token keys, never documents);
      * V rides a broadcast 1-row aggregate (no driver collect);
      * scoring joins doc bigrams to the two count tables on their
        natural keys — plain shuffle equi-joins that AQE can convert
        to broadcast when the vocabulary is small;
      * final per-doc avg is one more hash agg on ``id_col``.
    Nothing is quadratic, nothing touches the driver, no Python. The
    bigram extraction guards single-token docs (no descending-
    ``sequence`` trap) and every arithmetic step is reproducible in
    DuckDB (see the d4 oracle)."""
    base = df.selectExpr(
        f"`{id_col}`", f"{_ws_tokens_sql(text_col)} AS _t"
    )
    uni = (
        base.selectExpr("explode(_t) AS _w1")
        .groupBy("_w1")
        .agg(F.count("*").alias("_c1"))
    )
    vocab = uni.agg(F.count("*").cast("double").alias("_V"))
    # bigram list per doc: struct(w1, w2) for i in [1, size-1]. Built
    # over sequence(1, size) — never empty, so no descending-sequence
    # trap — with the final (w2 IS NULL) element filtered out; a
    # single-token doc yields zero bigrams with no CASE-branch type
    # coercion issues. inline() explodes the struct array straight to
    # (_w1, _w2) columns — one projection instead of explode + unpack.
    pair_expr = (
        "filter(transform(sequence(1, size(_t)), i -> "
        "struct(element_at(_t, i) AS _w1, "
        "CASE WHEN i < size(_t) THEN element_at(_t, CAST(i + 1 AS INT)) "
        "ELSE CAST(NULL AS STRING) END AS _w2)), s -> s._w2 IS NOT NULL)"
    )
    doc_bi = base.selectExpr(f"`{id_col}`", f"inline({pair_expr})")
    bi = doc_bi.groupBy("_w1", "_w2").agg(F.count("*").alias("_c2"))
    k = float(add_k)
    scored = (
        doc_bi.join(uni, "_w1")
        .join(bi, ["_w1", "_w2"])  # fit-on-self: always matches
        .crossJoin(F.broadcast(vocab))
        .selectExpr(
            f"`{id_col}`",
            f"ln((_c2 + {k!r}D) / (_c1 + {k!r}D * _V)) AS _s",
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("_n"), F.round(F.avg("_s"), 6).alias("_lp")
    )
    return (
        df.selectExpr(f"`{id_col}`")
        .join(agg, id_col, "left")
        .selectExpr(
            f"`{id_col}`",
            "CAST(coalesce(_n, 0) AS BIGINT) AS n_bigrams",
            "coalesce(_lp, 0.0D) AS lm_logp",
        )
    )


def classifier_score_sql(
    text_expr: str = "text", n_features: int = 256, seed: int = 13
) -> str:
    """The DuckDB expression reproducing ``classifier_quality_score``
    bit-for-bit (same left-fold order, same portable hash, same
    literal weights) — the oracle side of the certification.

    Weights ride as QUOTED-string ``::DOUBLE`` casts: DuckDB parses a
    bare decimal literal as DECIMAL (max ~18 significant digits)
    before any cast, double-rounding arbitrary doubles — the
    string->DOUBLE parse is the correctly-rounded round trip."""
    w_sql = "[" + ", ".join(
        f"'{w!r}'::DOUBLE" for w in classifier_weights(n_features, seed)
    ) + "]"
    return (
        "1.0 / (1.0 + exp(-(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(str_split({text_expr}, ' '), "
        f"x -> ({w_sql})[(CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) "
        f"% {n_features}) + 1])), (acc, x) -> acc + x) "
        f"/ len(str_split({text_expr}, ' ')))))"
    )


def fit_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 256,
    reg: float = 1e-3,
) -> list[float]:
    """Train the hashed-BoW quality classifier DISTRIBUTIVELY (the fit
    side of the fastText/CCNet/DCLM filter stage): ridge regression on
    mean-pooled hashed bag-of-words features against a {0,1} label
    column (human labels, or a weak label like ``quality >= 0.5`` for
    CCNet-style self-training), solved via normal equations.

    The corpus never leaves the cluster: features are the sparse
    per-doc token-hash counts (explode + groupBy — the same portable
    md5-prefix hash ``classifier_quality_score`` applies at scoring
    time), X'X comes from a per-doc sparse self-join (O(s_d^2) pairs
    per doc for s_d <= n_features distinct features) aggregated to at
    most n_features^2 cells, and X'y is one more tiny aggregation.
    Only the (n_features x n_features) normal matrix — 65k doubles at
    the default 256 — is collected; the driver solves the ridge system
    with numpy and returns the weight list, ready to pass straight to
    ``classifier_quality_score(weights=...)`` (which inlines it as a
    literal — scoring stays a zero-shuffle codegen projection).

    Float caveat: partial-sum order makes the normal matrix 1-ulp
    nondeterministic across partitionings, so the FIT is certified by
    golden tests against a local numpy fit (allclose), not by the
    bit-exact oracle gate; SCORING with any fixed weight vector stays
    oracle-exact."""
    import numpy as np

    h = F.pmod(
        portable_md5_prefix64(F.col("_tok")),
        F.lit(n_features),
    )
    toks = (
        df.select(
            F.col(id_col),
            F.col(label_col).cast("double").alias("_y"),
            F.explode(ws_tokens(F.col(text_col))).alias("_tok"),
        )
        .withColumn("_j", h)
    )
    counts = toks.groupBy(id_col, "_y", "_j").agg(
        F.count("*").alias("_c")
    )
    total = counts.groupBy(id_col).agg(F.sum("_c").alias("_T"))
    xs = counts.join(total, id_col).select(
        F.col(id_col),
        "_y",
        "_j",
        (F.col("_c") / F.col("_T")).alias("_x"),
    )
    a = xs.select(F.col(id_col), F.col("_j").alias("_ja"), F.col("_x").alias("_xa"))
    b = xs.select(F.col(id_col), F.col("_j").alias("_jb"), F.col("_x").alias("_xb"))
    xtx_cells = (
        a.join(b, id_col)
        .groupBy("_ja", "_jb")
        .agg(F.sum(F.col("_xa") * F.col("_xb")).alias("_v"))
        .collect()
    )
    xty_cells = (
        xs.groupBy("_j").agg(F.sum(F.col("_x") * F.col("_y")).alias("_v")).collect()
    )
    XtX = np.zeros((n_features, n_features))
    for r in xtx_cells:
        XtX[r["_ja"], r["_jb"]] = r["_v"]
    Xty = np.zeros(n_features)
    for r in xty_cells:
        Xty[r["_j"]] = r["_v"]
    w = np.linalg.solve(XtX + reg * np.eye(n_features), Xty)
    return [float(v) for v in w]


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row corpus diagnostics — the before/after-curation summary
    every pipeline run logs: document count, exact-duplicate rate,
    token totals, doc-length distribution, and the language mix.

    Computed as ONE aggregation pass over a single narrow projection
    (per-doc stats + content hash + language vote), so the cost is a
    corpus scan plus a 1-row reduce: count/sum/avg/percentile ride
    map-side partials; the duplicate rate is approx_count_distinct
    over the md5 hash (HLL — no exact-distinct shuffle at 100 TB);
    the language mix aggregates the 5-way vote into per-language doc
    counts. Output columns: n_docs, n_unique_approx, dup_rate_approx,
    total_ws_tokens, avg_doc_tokens, p50_doc_tokens, p95_doc_tokens,
    n_docs_<lang> per language."""
    toks = ws_tokens(F.col(text_col))
    per_doc = language_id(
        df.select(
            F.col(id_col),
            F.col(text_col),
            F.size(toks).alias("_nt"),
            F.md5(F.col(text_col)).alias("_h"),
        ),
        text_col,
    )
    langs = sorted(STOPWORDS)
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.approx_count_distinct("_h").alias("n_unique_approx"),
        F.round(
            # HLL can overestimate distinct slightly -> clamp at 0
            F.greatest(
                F.lit(0.0),
                1.0 - F.approx_count_distinct("_h") / F.count("*"),
            ),
            4,
        ).alias("dup_rate_approx"),
        F.sum("_nt").alias("total_ws_tokens"),
        F.round(F.avg("_nt"), 2).alias("avg_doc_tokens"),
        F.percentile_approx("_nt", 0.5).alias("p50_doc_tokens"),
        F.percentile_approx("_nt", 0.95).alias("p95_doc_tokens"),
        *[
            F.sum(
                F.when(F.col("lang_pred") == lang, 1).otherwise(0)
            ).alias(f"n_docs_{lang}")
            for lang in langs
        ],
    )
