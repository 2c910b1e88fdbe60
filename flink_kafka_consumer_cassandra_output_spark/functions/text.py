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


#: SimHash sketch widths.  The width is the precision/cost knob and must be
#: sized to the corpus: the 16-bit sketch is the minimal demo (doc_simhash);
#: the near-dup candidate pipeline uses 32 bits because at 5k docs over a
#: 31-word vocabulary 16-bit sketches leave ~12% of ALL pairs within
#: hamming 3 (measured) -- candidate verification would approach all-pairs
#: -- while 32 bits cuts that to <2%.  At real corpus scale the same
#: construction widens further (md5 gives up to 128 bits).
SIMHASH_BITS = 16

#: Hard per-document token cap of the packed-counter fast path
#: (:func:`with_simhash`).  A vote counter lives in a 16-bit field, but the
#: binding limit is signed-long packing: the top field is shifted 48 bits,
#: so counts must stay <= 2^15 - 1 for the packed accumulator to fit in
#: int64 (n * (2^48 + 2^32 + 2^16 + 1) < 2^63).  Enforced at runtime with
#: a loud error; chunk longer documents upstream.
SIMHASH_MAX_TOKENS = 32767


def token_hashes(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """``bits``-wide token hashes (md5 hex prefix), the SimHash vote inputs.

    ``bits`` must be a multiple of 4 and <= 60 (the '0x'-literal cast stays
    inside a signed int64 on both engines)."""
    assert bits % 4 == 0 and bits <= 60
    return F.transform(
        tokens(col),
        lambda t: F.conv(F.substring(F.md5(t), 1, bits // 4), 16, 10).cast("long"),
    )


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash sketch: per-bit majority vote over the token hashes.

    Per-row fold (no shuffle); the integer bit-sums are order-insensitive,
    so cross-engine parity is exact (DuckDB twin: :func:`simhash_sql`)."""
    from functools import reduce

    hs = token_hashes(col, bits)

    def bit_sum(j: int) -> Column:
        pm = lambda h: F.when(  # noqa: E731
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))
        return F.aggregate(hs, F.lit(0), lambda a, x: a + pm(x))

    return reduce(
        lambda a, b: a + b,
        [
            F.when(bit_sum(j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        ],
    ).cast("long")


def simhash16(col: Column) -> Column:
    """The 16-bit sketch (doc_simhash's published shape)."""
    return simhash(col, 16)


def with_simhash(df, text_col: str, out_col: str, bits: int = SIMHASH_BITS):
    """Append a SimHash sketch column -- the FAST path, same values as
    :func:`simhash`.

    Higher-order-function folds are interpreted (not codegen'd), so the
    naive formulation's ``bits`` separate per-bit passes over the token
    array dominate sketch cost.  Here all per-bit vote counters are packed
    into ceil(bits/4) longs (4 x 16-bit counters each) and accumulated in
    ONE fold pass with a struct accumulator; a second projection unpacks
    counters into sketch bits (a vote sum > 0 <=> 2 * ones > n_tokens).
    The two-step ``withColumn`` is deliberate: the optimizer keeps the
    expensive fold in its own projection, computed once, instead of
    inlining it into every per-bit reference (verified in the plan).

    Limits: documents are capped at SIMHASH_MAX_TOKENS = 32767 (fixture max
    99; chunk longer documents).  The binding constraint is not the 16-bit
    field width but the SIGNED-LONG packing: the top sub-counter is shifted
    48 bits, so a count of 2^15 already pushes the packed accumulator past
    2^63 (ANSI mode then kills the fold with a cryptic ARITHMETIC_OVERFLOW;
    non-ANSI would silently corrupt).  The cap is ENFORCED before the fold
    runs: an oversized document raises a loud, actionable error.  Equality
    with the naive spec is pinned by tests; the DuckDB oracles keep the
    naive per-bit ``list_sum`` form -- the values are identical integers
    either way.
    """
    assert bits % 4 == 0 and bits <= 60
    n_longs = (bits + 3) // 4

    # The whole packed fold as ONE expr string (r17 plan-construction
    # optimization): the Column form cost several hundred py4j round-trips
    # per sketch (struct accumulator x n_longs fields x 4 bit-spreads);
    # the string parses the identical ArrayAggregate tree in one call.
    def spread_sql(k: int) -> str:
        terms = [
            f"shiftleft((shiftright(h, {4 * k + b}) & 1), {16 * b})"
            for b in range(min(4, bits - 4 * k))
        ]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    hs_sql = (
        f"transform(split({text_col}, ' '), "
        f"t -> CAST(conv(substring(md5(t), 1, {bits // 4}), 16, 10) AS BIGINT))"
    )
    zero_sql = "named_struct(" + ", ".join(
        f"'c{k}', CAST(0 AS BIGINT)" for k in range(n_longs)
    ) + ")"
    step_sql = "named_struct(" + ", ".join(
        f"'c{k}', (acc.c{k} + {spread_sql(k)})" for k in range(n_longs)
    ) + ")"
    packed = F.expr(f"aggregate({hs_sql}, {zero_sql}, (acc, h) -> {step_sql})")
    tmp_packed, tmp_n = f"__{out_col}_packed", f"__{out_col}_n"
    # The guard must run BEFORE the fold (the overflow happens inside the
    # fold's accumulator, not at unpack time), so the fold is the lazy
    # branch of a per-row conditional on the token count: assert_true
    # returns NULL on success and raises otherwise.
    # Null-tolerant: size(tokens(NULL)) is NULL under ANSI mode, and
    # assert_true treats a NULL condition as failure — a NULL document must
    # fall through to a NULL sketch, not die with a spurious overflow error.
    guard = F.assert_true(
        F.col(tmp_n).isNull() | (F.col(tmp_n) <= F.lit(SIMHASH_MAX_TOKENS)),
        F.concat(
            F.lit(
                "simhash packed vote counters overflow past "
                f"{SIMHASH_MAX_TOKENS} tokens (got "
            ),
            F.col(tmp_n).cast("string"),
            F.lit(f" in column {text_col!r}); chunk the document first"),
        ),
    )
    df = df.withColumn(
        tmp_n, F.size(tokens(F.col(text_col))).cast("long")
    ).withColumn(tmp_packed, F.when(guard.isNull(), packed))
    # Per-bit unpack as one expr string too (same values as the old
    # F.when chain: CASE ... ELSE 0 END summed left-associatively).
    terms = []
    for j in range(bits):
        k, b = divmod(j, 4)
        cnt = f"(shiftright({tmp_packed}.c{k}, {16 * b}) & 65535)"
        terms.append(
            f"(CASE WHEN ({cnt} * 2) > {tmp_n} THEN {1 << j} ELSE 0 END)"
        )
    summed = terms[0]
    for t in terms[1:]:
        summed = f"({summed} + {t})"
    # NULL text => NULL sketch: without the isNotNull gate every per-bit
    # term's NULL comparison falls into otherwise(0) and a null document
    # would silently sketch as 0 (a legal sketch value).
    sketch = F.when(F.col(tmp_n).isNotNull(), F.expr(summed)).cast("long")
    return df.withColumn(out_col, sketch).drop(tmp_packed, tmp_n)


def token_hashes_sql(text_sql: str = "text", bits: int = SIMHASH_BITS) -> str:
    """DuckDB twin of :func:`token_hashes` (a list<bigint> expression)."""
    return (
        f"list_transform(string_split({text_sql}, ' '), "
        f"t -> CAST('0x' || substr(md5(t), 1, {bits // 4}) AS BIGINT))"
    )


def simhash_sql(hs_sql: str = "hs", bits: int = SIMHASH_BITS) -> str:
    """DuckDB twin of :func:`simhash`, over a list column/expression (pass
    :func:`token_hashes_sql` through a CTE so it is computed once)."""
    return "CAST(" + " + ".join(
        f"(CASE WHEN list_sum(list_transform({hs_sql}, "
        f"h -> CASE WHEN (h // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    ) + " AS BIGINT)"


# Backwards-compatible 16-bit twins (doc_simhash oracle).
def token_hashes16_sql(text_sql: str = "text") -> str:
    return token_hashes_sql(text_sql, 16)


def simhash16_sql(hs_sql: str = "hs") -> str:
    return simhash_sql(hs_sql, 16)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (basis for MinHash/Jaccard).

    Pure array expression, per-row, no explode, no shuffle: ``arrays_zip``
    of n shifted ``slice`` views of the token array, then one concat per
    shingle.  The zip shape matters: higher-order lambdas are interpreted
    (not codegen), and any expression referenced INSIDE the lambda is
    re-evaluated per element -- the previous ``element_at(tokens(col), ..)``
    form re-split the text 3x per shingle, O(tokens^2) per row (measured
    7.7x slower at sf0.1).  Here ``tokens(col)`` appears only OUTSIDE the
    lambda, so the split is evaluated O(n) times per row."""
    w = tokens(col)
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(w, j + 1, m).alias(f"w{j}") for j in range(n)])
    return F.when(
        F.size(w) >= n,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(n)])),
    ).otherwise(F.array(F.concat_ws(" ", w)))
