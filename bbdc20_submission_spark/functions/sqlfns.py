"""SQL-callable engine functions (Spark SQL scalar UDFs, SPARK-28264).

``register_sql_functions(spark)`` creates temporary SQL functions so
pure-SQL users get the engine's scalar vocabulary without touching the
DataFrame API:

    SELECT doc_id, sg_quality(text) AS q
    FROM documents WHERE sg_ws_tokens(text) >= 8

Every function body is a SQL EXPRESSION (resolved to the same Catalyst
operators the DataFrame operators compile to) — no Python UDFs, so
calling these from SQL costs exactly what the DataFrame path costs and
stays inside whole-stage codegen. Formula constants (stopword list,
token pattern, quality weights, fingerprint base/modulus) are
interpolated from the single Python source of truth in
``operators.text``, so the SQL surface cannot drift from the certified
DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from bbdc20_submission_spark.operators.text import STOPWORDS, TOKEN_PATTERN

_SW = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

# shared ratio fragments. Char-class counts go through translate
# (delete the class, diff the lengths) — bit-identical to the
# regexp_replace('[^...]') form but a per-char table lookup instead
# of a regex pass (17x at the 64x scale octave); keeps the SQL
# surface on the same fast expressions as operators.text
_NT = "size(split(t, ' '))"
_NC = "length(t)"
_LETTERS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_DIGITS = "(length(t) - length(translate(t, '0123456789', '')))"
_ALPHA = f"(length(t) - length(translate(t, '{_LETTERS}', '')))"
_SPACES = "(length(t) - length(translate(t, ' ', '')))"
_SWHITS = f"size(filter(split(t, ' '), x -> array_contains(array({_SW}), x)))"


def _definitions() -> dict[str, str]:
    punct = f"({_NC} - {_ALPHA} - {_DIGITS} - {_SPACES})"
    quality = (
        f"least({_NT} / 32.0, 1.0) * 0.4 "
        f"+ least({_SWHITS} / {_NT} * 4.0, 1.0) * 0.3 "
        f"+ (1.0 - least({punct} / {_NC} * 4.0, 1.0)) * 0.2 "
        f"+ (1.0 - least({_DIGITS} / {_NC} * 4.0, 1.0)) * 0.1"
    )
    return {
        # text analysis
        "sg_ws_tokens(t STRING) RETURNS INT": _NT,
        "sg_bpe_tokens(t STRING) RETURNS INT": (
            f"size(regexp_extract_all(t, '{TOKEN_PATTERN}', 0))"
        ),
        "sg_stopword_ratio(t STRING) RETURNS DOUBLE": f"{_SWHITS} / {_NT}",
        "sg_quality(t STRING) RETURNS DOUBLE": f"round({quality}, 6)",
        # portable rolling fingerprint (md5-prefix token hash, the d5
        # cross-engine form: conv(substr(md5, 1, 8)) folded mod 1e9+7)
        "sg_fingerprint(t STRING) RETURNS BIGINT": (
            "aggregate(split(t, ' '), CAST(0 AS BIGINT), (acc, x) -> "
            "(acc * 257 + pmod(CAST(conv(substring(md5(x), 1, 8), 16, 10) "
            "AS BIGINT), 1000000007)) % 1000000007)"
        ),
        # similarity scalars
        "sg_cosine(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE": (
            "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v) "
            "/ (sqrt(aggregate(a, 0.0D, (s, v) -> s + v * v)) "
            "* sqrt(aggregate(b, 0.0D, (s, v) -> s + v * v)))"
        ),
        "sg_hamming64(a BIGINT, b BIGINT) RETURNS INT": "CAST(bit_count(a ^ b) AS INT)",
        # hash-stable 6-decimal integerization (oracle authoring rule)
        "sg_micro(x DOUBLE) RETURNS BIGINT": (
            "CAST(floor(x * 1e6 + 0.5 + 1e-9) AS BIGINT)"
        ),
    }


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create the ``sg_*`` temporary SQL functions on this session;
    returns the registered names."""
    names = []
    for signature, body in _definitions().items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {signature} RETURN {body}"
        )
        names.append(signature.split("(", 1)[0])
    return names
