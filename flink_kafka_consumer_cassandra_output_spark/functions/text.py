"""Text-analysis scalar functions (north-star: training-data pipeline ops).

Not present in the reference (its only string work is date-format + concat,
CassandraOutputFormat.java:106); required by the project north star
(BASELINE.json ``north_star``): language-ID, quality scoring, token
counting, document fingerprinting.  Everything is a pure Column expression
-- array/lambda builtins, no Python UDFs -- so the hot path stays inside
whole-stage codegen and scales linearly with no shuffle.

Determinism note: these functions are mirrored 1:1 by ANSI-SQL oracle
strings in ``plans/northstar_queries.py``; all ratios are single divisions
of exact integers, so Spark and DuckDB produce bitwise-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
#: Deliberately small and hard-coded: the oracle SQL must replicate them.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Word-ish tokens, BPE-flavored: runs of letters+digits or single
#: punctuation marks.  Same regex on both engines.
TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (fixture text is single-space separated)."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """Count of TOKEN_REGEX matches (a cheap BPE-like token estimate)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), F.lit(0))).cast("long")


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def stopword_count(col: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t))).cast("long")


def punct_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", "")).cast("long")


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality score: length band + stopword presence -
    punctuation excess.  Single double division at the end keeps it
    cross-engine deterministic."""
    n_tok = token_count(col)
    n_stop = stopword_count(col)
    n_punct = punct_count(col)
    n_chars = F.length(col).cast("long")
    score = (
        F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(40)).otherwise(F.lit(0))
        + F.when(n_stop * 100 >= n_tok * 5, F.lit(30)).otherwise(F.lit(0))
        + F.when(n_punct * 100 <= n_chars * 10, F.lit(30)).otherwise(F.lit(0))
    )
    return (score.cast("double") / F.lit(100.0))


def lang_scores(col: Column) -> dict[str, Column]:
    """Marker-hit count per language (the lang-ID heuristic's evidence)."""
    toks = tokens(F.lower(col))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")
    return out


def lang_id(col: Column) -> Column:
    """Argmax language with deterministic tiebreak (lexicographic lang key,
    'und' when no marker hits at all)."""
    scores = lang_scores(col)
    # struct-max trick: max by (score, reversed-lang) then take lang.
    best = None
    for lang in sorted(scores):  # deterministic iteration
        s = scores[lang]
        cand = F.struct(s.alias("s"), F.lit(lang).alias("l"))
        best = cand if best is None else F.when(s > best["s"], cand).otherwise(best)
    return F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.

    The rolling-hash analog of the north star; md5 is available verbatim in
    DuckDB so the oracle can replicate it."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


#: Rolling-hash parameters: multiplier 31 (Rabin-Karp classic), modulus 2^31
#: so ``acc*31 + token`` never exceeds 2^36 — exact in int64 on both engines.
ROLLING_MOD = 2_147_483_648
ROLLING_MULT = 31


def rolling_hash(col: Column) -> Column:
    """Polynomial (Rabin-Karp style) rolling hash over the token stream.

    Token values are 28-bit ints from md5 prefixes (shared with DuckDB);
    the left-fold ``acc*31 + tok (mod 2^31)`` is order-SENSITIVE — unlike
    the md5 :func:`fingerprint`, reordering tokens changes the hash, which
    is the property a rolling fingerprint exists to provide."""
    toks = tokens(col)
    tok_int = lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLLING_MULT + tok_int(t)) % F.lit(ROLLING_MOD),
    )


def rolling_hash_sql(text_sql: str = "text") -> str:
    """DuckDB twin of :func:`rolling_hash` (list_reduce starts at the first
    element, which equals the 0-init fold because ``0*31 + x1 = x1``)."""
    return (
        f"list_reduce(list_transform(string_split({text_sql}, ' '), "
        f"t -> CAST('0x' || substr(md5(t), 1, 7) AS BIGINT)), "
        f"(a, x) -> (a * {ROLLING_MULT} + x) % {ROLLING_MOD})"
    )


#: SimHash sketch width.  16 bits is sized to the tiny fixture vocabulary
#: (31 words); at real corpus scale the same construction widens to 64 bits
#: (md5 prefix of 16 hex chars) with proportionally more bands -- the code
#: below is the parameterization point.
SIMHASH_BITS = 16


def token_hashes16(col: Column) -> Column:
    """16-bit token hashes (md5 hex prefix), the SimHash vote inputs."""
    return F.transform(
        tokens(col), lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
    )


def simhash16(col: Column) -> Column:
    """16-bit SimHash sketch: per-bit majority vote over the token hashes.

    Per-row fold (no shuffle); the integer bit-sums are order-insensitive,
    so cross-engine parity is exact (DuckDB twin: :func:`simhash16_sql`)."""
    from functools import reduce

    hs = token_hashes16(col)

    def bit_sum(j: int) -> Column:
        pm = lambda h: F.when(  # noqa: E731
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))
        return F.aggregate(hs, F.lit(0), lambda a, x: a + pm(x))

    return reduce(
        lambda a, b: a + b,
        [
            F.when(bit_sum(j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(SIMHASH_BITS)
        ],
    ).cast("long")


def token_hashes16_sql(text_sql: str = "text") -> str:
    """DuckDB twin of :func:`token_hashes16` (a list<int> expression)."""
    return (
        f"list_transform(string_split({text_sql}, ' '), "
        "t -> CAST('0x' || substr(md5(t), 1, 4) AS INTEGER))"
    )


def simhash16_sql(hs_sql: str = "hs") -> str:
    """DuckDB twin of :func:`simhash16`, over a list<int> column/expression
    (pass :func:`token_hashes16_sql` through a CTE so it is computed once)."""
    return "CAST(" + " + ".join(
        f"(CASE WHEN list_sum(list_transform({hs_sql}, "
        f"h -> CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    ) + " AS BIGINT)"


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (basis for MinHash/Jaccard).

    Pure array expression: ``transform(sequence(0, size-n), i -> slice..)``
    -- per-row, no explode, no shuffle."""
    w = tokens(col)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    return F.when(
        F.size(w) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(n)])),
    ).otherwise(F.array(F.concat_ws(" ", w)))
