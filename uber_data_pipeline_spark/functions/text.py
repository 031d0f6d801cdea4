"""Text analysis expression builders.

Every function here returns a Spark SQL expression STRING (used via
selectExpr / F.expr) and has a DuckDB twin right beside it, because
the correctness oracle re-computes the same value in DuckDB — the two
dialects must stay in lock-step. All of it is JVM-side (no Python
UDFs): array higher-order functions compile into whole-stage codegen.

Cross-engine-safe primitives (verified bit-for-bit):
- md5(varchar) -> lowercase hex in both engines
- instr(haystack, needle) 1-based in both
- polynomial rolling hash via fold: Spark aggregate() == DuckDB
  list_reduce() with a prepended init element
- word shingles: Spark slice(arr, i, n) == DuckDB list_slice(arr, i, i+n-1)
"""

from __future__ import annotations

SHINGLE_N = 3
HASH_MOD = 1_000_000_007

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "it", "on", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "de"),
}

# BPE-ish tokenizer: letter runs, digit runs, single other non-space.
# No backslash classes: Spark SQL string literals eat '\s' (-> 's')
# while DuckDB keeps it, so the same pattern string would diverge.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---- tokens & shingles ------------------------------------------------

TOKENS_SPARK = "split(text, ' ')"
TOKENS_DUCK = "string_split(text, ' ')"


def shingles_spark(tokens: str = "tokens", n: int = SHINGLE_N) -> str:
    return (
        f"CASE WHEN size({tokens}) >= {n} "
        f"THEN transform(sequence(1, size({tokens})-{n - 1}), "
        f"i -> concat_ws(' ', slice({tokens}, i, {n}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def shingles_duck(tokens: str = "tokens", n: int = SHINGLE_N) -> str:
    return (
        f"list_transform(range(1, greatest(len({tokens})-{n - 1}, 0)+1), "
        f"i -> array_to_string(list_slice({tokens}, i, i+{n - 1}), ' '))"
    )


# ---- rolling (polynomial) hash ---------------------------------------

def base_hash_spark(col: str) -> str:
    """Engine-neutral 64-bit-safe base hash of a string column/lambda
    var: first 12 hex chars of md5 as an integer (< 2^48), reduced mod
    1e9+7 — the same family as operators/dedup.py's SHINGLE_HASH_*,
    parameterized on the column name so row-local folds can hash
    arbitrary feature strings."""
    return (
        f"CAST(conv(substring(md5({col}), 1, 12), 16, 10) AS bigint)"
        " % 1000000007"
    )


def base_hash_duck(col: str) -> str:
    return (
        "list_reduce(list_prepend(0::BIGINT, list_transform(range(1, 13), "
        f"i -> (instr('0123456789abcdef', substring(md5({col}), i, 1)) - 1)"
        "::BIGINT)), (h, c) -> h * 16 + c) % 1000000007"
    )


def rolling_hash_spark(col: str = "text") -> str:
    # split('') yields the char array in ONE O(L) pass; the previous
    # substring(col, i, 1) indexing restarted the UTF-8 scan per
    # character — O(L^2) per document, 10.8x wall at the 10x soak
    # (r8, surfaced by the noop-sink bench). Value-identical on every
    # document (verified both engines, both SFs).
    return (
        f"aggregate(transform(split({col}, ''), "
        f"c -> CAST(ascii(c) AS bigint)), "
        f"CAST(0 AS bigint), (h, c) -> (h*31 + c) % {HASH_MOD})"
    )


def rolling_hash_duck(col: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({col}, ''), c -> ascii(c)::BIGINT)), "
        f"(h, c) -> (h*31 + c) % {HASH_MOD})"
    )


# ---- counting / ratios -------------------------------------------------

def stopword_count_spark(lang: str, tokens: str = "tokens") -> str:
    return (
        f"size(filter({tokens}, t -> "
        f"array_contains(array({_sql_list(STOPWORDS[lang])}), t)))"
    )


def stopword_count_duck(lang: str, tokens: str = "tokens") -> str:
    return (
        f"len(list_filter({tokens}, t -> "
        f"list_contains([{_sql_list(STOPWORDS[lang])}], t)))"
    )


PUNCT_STRIPPED_SPARK = "length(regexp_replace(text, '[A-Za-z0-9 ]', ''))"
PUNCT_STRIPPED_DUCK = "length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))"

DIGITS_ONLY_SPARK = "length(regexp_replace(text, '[^0-9]', ''))"
DIGITS_ONLY_DUCK = "length(regexp_replace(text, '[^0-9]', '', 'g'))"

REGEX_TOKEN_COUNT_SPARK = f"regexp_count(text, '{TOKEN_REGEX}')"
REGEX_TOKEN_COUNT_DUCK = f"len(regexp_extract_all(text, '{TOKEN_REGEX}'))"


# ---- PII patterns (Java regex and RE2 compatible subset: no ---------
# lookaround, explicit classes instead of \d/\w, and [.] / [+] instead
# of backslash escapes — Spark's SQL string literals eat unrecognized
# backslash escapes while DuckDB's don't, so fragments must be
# backslash-free to mean the same thing in both dialects)

PII_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_PHONE_RE = "[+][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
PII_IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def pii_count_spark(col: str, pattern: str) -> str:
    return f"regexp_count({col}, '{pattern}')"


def pii_count_duck(col: str, pattern: str) -> str:
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def pii_scrub_spark(col: str) -> str:
    """Nested replace: emails, then phones, then IPv4 -> typed tags."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{col}, '{PII_EMAIL_RE}', '<EMAIL>'), "
        f"'{PII_PHONE_RE}', '<PHONE>'), "
        f"'{PII_IPV4_RE}', '<IP>')"
    )


def pii_scrub_duck(col: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{col}, '{PII_EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{PII_PHONE_RE}', '<PHONE>', 'g'), "
        f"'{PII_IPV4_RE}', '<IP>', 'g')"
    )


# ---- language id (stopword-marker argmax, fixed tie order) -------------

_LANG_ORDER = ("en", "de", "fr", "es")


def langid_case(count_col: dict[str, str]) -> str:
    """Shared CASE — same string works in both dialects given per-lang
    score column names (fixed en>de>fr>es tie priority)."""
    e, d, f, s = (count_col[x] for x in _LANG_ORDER)
    return (
        f"CASE WHEN {e} >= {d} AND {e} >= {f} AND {e} >= {s} THEN 'en' "
        f"WHEN {d} >= {f} AND {d} >= {s} THEN 'de' "
        f"WHEN {f} >= {s} THEN 'fr' ELSE 'es' END"
    )
