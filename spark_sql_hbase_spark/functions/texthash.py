"""Cross-engine deterministic text & hashing primitives.

Every dedup / text-analysis operator must be verifiable against an ANSI-SQL
oracle (DuckDB), so the primitives here are defined **twice in lockstep**:
once as PySpark Column expressions (JVM-side, codegen'd — no Python UDFs in
the hot path) and once as SQL-text generators producing the identical
value in DuckDB. Both sides use only constructs with engine-identical
semantics: lowercase-hex ``md5``, integer arithmetic, regex over
``[a-z0-9]`` classes.

Word hash: the first 14 hex digits of ``md5(word)`` as an integer — 56
bits, fits int64, identical in any engine with a standard md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD_P = 1_000_000_007  # rolling-hash / minhash modulus (keeps products < 2^63)
TOKEN_SPLIT_RE = "[^a-z0-9]+"


# -- tokenization -----------------------------------------------------------
def tokens(col: Column | str) -> Column:
    """Lowercased alphanumeric word tokens, empty strings removed.

    ``array_remove(split(...), '')`` rather than a ``filter`` lambda: both
    remove the boundary empties, but array_remove is a native codegen'd
    expression while HOF lambdas are interpreted per element — tokens()
    sits under every text operator and is referenced several times per
    row, so this is the engine's hottest expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), TOKEN_SPLIT_RE), "")


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        f" x -> x <> '')"
    )


# -- 56-bit word hash -------------------------------------------------------
def word_hash(col: Column) -> Column:
    """First 14 hex digits of md5 as a bigint (deterministic cross-engine)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def word_hash_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 14))::BIGINT)"


# -- word n-gram shingles ---------------------------------------------------
def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) from a token array.

    Implemented as ``zip_with`` over n shifted ``slice``s of the token
    array, so ``tok`` is evaluated a constant ~2n times per ROW. Never
    reference a derived array per-ELEMENT (e.g. ``element_at(tok, i+j)``
    inside a transform): higher-order lambdas are interpreted with no
    common-subexpression elimination and ``CollapseProject`` inlines
    aliases, so each reference re-runs the full tokenization — O(len·n)
    regex splits per row instead of O(n)."""
    m = F.size(tok) - (n - 1)  # shingle count when size >= n
    parts = [F.slice(tok, j + 1, m) for j in range(n)]
    joined = parts[0]
    for p in parts[1:]:
        joined = F.zip_with(joined, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(tok) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def shingles_sql(tok_expr: str, n: int = 3) -> str:
    join = " || ' ' || ".join(f"__t[__i + {j + 1}]" for j in range(n))
    return (
        f"(SELECT CASE WHEN len(__t) >= {n} THEN "
        f"list_distinct([{join} for __i in range(0, len(__t) - {n} + 1)]) "
        f"ELSE [] END FROM (SELECT {tok_expr} AS __t))"
    )


# -- rolling hash (document fingerprint) ------------------------------------
def rolling_hash(tok: Column) -> Column:
    """Order-sensitive polynomial rolling hash over word hashes, mod p.

    ``h = fold(tokens, 0, (acc, w) -> (acc*31 + md5_56(w) % p) % p)`` —
    a single JVM-side ``aggregate`` over the token array, O(len) per row,
    no shuffle, no Python.
    """
    return F.aggregate(
        tok,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * 31 + word_hash(w) % MOD_P) % MOD_P,
    )


def rolling_hash_sql(tok_expr: str) -> str:
    wh = word_hash_sql("x")
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tok_expr}, x -> {wh} % {MOD_P})), "
        f"(acc, h) -> (acc * 31 + h) % {MOD_P})"
    )


# -- simhash (60-bit) -------------------------------------------------------
SIMHASH_BITS = 60


def simhash_sql(doc_table: str, id_col: str, tok_expr: str) -> str:
    """DuckDB SQL computing the identical 60-bit simhash per document."""
    wh = word_hash_sql("w")
    votes = ",\n           ".join(
        f"SUM(CASE WHEN ((th >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN b{i} >= 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END"
        for i in range(SIMHASH_BITS)
    )
    return f"""
    WITH __tok AS (
        SELECT {id_col}, unnest({tok_expr}) AS w FROM {doc_table}
    ), __th AS (
        SELECT {id_col}, {wh} AS th FROM __tok
    ), __votes AS (
        SELECT {id_col}, {votes} FROM __th GROUP BY {id_col}
    )
    SELECT {id_col}, CAST({combine} AS BIGINT) AS simhash FROM __votes
    """


# -- stopword language scoring ---------------------------------------------
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "en", "por", "que"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "au", "ce", "que"],
}


def token_count(text: Column | str) -> Column:
    """``size(tokens(text))`` as ONE codegen'd regex pass over the text:
    tokens are the maximal ``[a-z0-9]`` runs of the lowered text, so
    counting the runs counts the tokens — no array is materialized and
    no ``tokens(...)`` reference exists to be re-inlined per consumer
    (round 14, guide §4.1; parity pinned by
    ``test_token_count_regex_matches_tokens``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit("[a-z0-9]+"))


def token_chars(text: Column | str) -> Column:
    """Total characters across tokens (Σ length) as one regex pass —
    equals the interpreted ``aggregate(tok, 0, acc + length(x))`` fold
    it replaces (round 14; same parity pin as :func:`token_count`)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(c), F.lit("[a-z0-9]"))


def term_token_count(text: Column | str, terms: list[str]) -> Column:
    """Number of tokens equal to ANY of ``terms``, counted with
    multiplicity, as ONE boundary-anchored alternation regex over the
    lowered text — replaces the interpreted per-token
    ``filter(tok, x -> array_contains(...))`` lambda (round 14).

    Exactness: a token is a maximal ``[a-z0-9]`` run, so a match of a
    term bounded by ``(?<![a-z0-9]) … (?![a-z0-9])`` is precisely a
    whole-token occurrence; with the boundary lookarounds at most one
    alternative can succeed at a position, so alternation order is
    irrelevant.  A term that is not itself a pure ``[a-z0-9]+`` string
    can never equal a token (tokens are lowercase alphanumeric by
    construction) and contributes 0 — exactly the old filter's
    behavior.  Parity pinned by
    ``test_stopword_count_regex_matches_hof``."""
    import re as _re

    c = F.col(text) if isinstance(text, str) else text
    valid = [t for t in dict.fromkeys(terms) if _re.fullmatch("[a-z0-9]+", t)]
    if not valid:
        return F.lit(0)
    alt = "|".join(valid)
    return F.regexp_count(F.lower(c), F.lit(f"(?<![a-z0-9])({alt})(?![a-z0-9])"))


def stopword_count(text: Column | str, lang: str) -> Column:
    """Stopword occurrences for ``lang`` — one alternation regex pass
    over the TEXT column (round 14: previously an interpreted HOF filter
    over the token array; same integer count, see
    :func:`term_token_count`).

    Context matters (both measured, round 14): this regex form wins in
    PROJECT shapes where codegen subexpression elimination shares the
    passes (lang_id gate −34%); the token-array twin
    (:func:`stopword_count_tokens`) wins in fused FILTER shapes where a
    bound token array feeds several counts through one tokenize
    (curation pipeline: HOF 0.99 vs regex 1.74 median).  Pick per
    context; the two are equality-pinned."""
    return term_token_count(text, STOPWORDS[lang])


def stopword_count_tokens(tok: Column, lang: str) -> Column:
    """The token-array twin of :func:`stopword_count` — the interpreted
    HOF filter over an (ideally bound-once) token array.  Kept as a
    first-class form because it measures FASTER in fused filter shapes
    (see :func:`stopword_count`); equality with the regex form is pinned
    by ``test_stopword_count_regex_matches_hof``."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tok, lambda x: F.array_contains(words, x)))


def stopword_count_sql(tok_expr: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tok_expr}, x -> list_contains([{lst}], x)))"
