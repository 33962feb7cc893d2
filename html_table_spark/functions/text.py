"""Text-analysis operators for training-data pipelines.

All of these are pure ``pyspark.sql.functions`` Column expressions — they
run JVM-side inside whole-stage codegen (no Python on the hot path) and each
has an exact ANSI-SQL twin runnable by DuckDB, which is how the driver's
correctness gate verifies them (__spark_entry__.oracle_sql).

Operators: token counting, quality scoring (length/punct/stopword ratios),
language-ID (stopword-hit heuristic), document fingerprinting (normalizing
content hash), shingling (word n-grams).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic mini stopword lists for the heuristic language scorer
STOPWORDS_EN = ("the", "a", "of", "and", "to")
_WS = r"\s+"


def tokens(text) -> Column:
    """Whitespace tokenization (empty string → no tokens)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, _WS)
    )


def token_count(text) -> Column:
    return F.size(tokens(text))


def char_count(text) -> Column:
    return F.length(text)


def avg_token_len(text) -> Column:
    toks = tokens(text)
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        / F.size(toks)
    )


def stopword_ratio(text, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*stopwords)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks)
    )


def punct_ratio(text) -> Column:
    stripped = F.regexp_replace(text, r"[^\p{L}\p{N}\s]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        (F.length(text) - F.length(stripped)).cast("double") / F.length(text)
    )


def quality_score(text) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane average token
    length, some stopwords, low punctuation noise. Rounded for cross-engine
    float comparability."""
    toks = token_count(text)
    length_term = F.least(toks.cast("double") / F.lit(50.0), F.lit(1.0))
    avg_term = F.when(
        (avg_token_len(text) >= 2.0) & (avg_token_len(text) <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    stop_term = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    # +1e-9 nudges exact .xxxx5 values off the rounding knife edge so the
    # score is stable across engines with different double summation order
    return F.round(0.4 * length_term + 0.3 * avg_term + 0.3 * stop_term + 1e-9, 4)


def lang_id(text) -> Column:
    """Deterministic stopword-hit language heuristic (the operator pattern a
    real n-gram model slots into): en if any English stopword token appears,
    else 'unk'."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS_EN)))
    return F.when(hits > 0, F.lit("en")).otherwise(F.lit("unk"))


def fingerprint(text) -> Column:
    """Normalizing content fingerprint: lowercase, collapse whitespace,
    trim, md5. Identical in DuckDB: md5(trim(regexp_replace(lower(t),
    '\\s+', ' ', 'g')))."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), _WS, " ")))


# Character-trigram profiles for the n-gram language-ID heuristic: the
# highest-frequency trigrams (with word-boundary markers folded to spaces)
# of each language, from public letter/trigram frequency tables. Small on
# purpose — the operator pattern (profile overlap + argmax) is what a real
# model slots into; profiles are plain data.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of",
           "of ", " to", "to ", "ed ", " in", "ion", "on ", "ent", "er "),
    "fr": (" de", "de ", " le", "le ", "es ", "ent", "nt ", " la", "la ",
           "ion", "et ", " et", "que", " qu", "ue ", "les", " pa", "re "),
    "de": ("er ", "en ", " de", "der", "ie ", " di", "die", "sch", "ein",
           "che", "ich", "nde", "ter", "und", " un", "nd ", " ei", "ch "),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "ión", "ent",
           "es ", "ión", " en", "en ", "ado", "que", " qu", "ue ", "ar "),
}


def char_trigrams(text) -> Column:
    """Distinct character trigrams of the lowercased, whitespace-folded
    text (leading/trailing boundary spaces added)."""
    t = F.concat(F.lit(" "), F.regexp_replace(F.lower(text), _WS, " "), F.lit(" "))
    k = F.length(t) - 2
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.substring(t, i, 3),
    )
    return F.array_distinct(grams)


def lang_id_ngram(text) -> Column:
    """N-gram language ID: score = |doc trigrams ∩ language profile| per
    language; argmax wins (ties → alphabetical; all-zero → 'unk'). Pure JVM
    array expressions with an exact SQL twin."""
    grams = char_trigrams(text)
    entries = []
    for lang in sorted(LANG_TRIGRAMS):
        profile = F.array(*[F.lit(g) for g in sorted(set(LANG_TRIGRAMS[lang]))])
        score = F.size(F.array_intersect(grams, profile))
        # argmax by (score, reverse-alphabetical tiebreak): array_max picks
        # the highest score; on ties the LAST struct field comparison picks
        # the maximal negated name → alphabetically first language
        entries.append(F.struct(score.alias("s"), F.lit(lang).alias("lang")))
    # tie-break must be deterministic and SQL-replicable: compare (s, lang)
    # and prefer the alphabetically FIRST language on equal scores by
    # scanning in order and keeping strict improvements only
    best = entries[0]
    for e in entries[1:]:
        best = F.when(e["s"] > best["s"], e).otherwise(best)
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("unk"))


# BPE-ish pre-tokenization: alphanumeric runs or single non-space symbols —
# the split a byte-pair encoder sees before merges. RE2 (DuckDB) and Java
# regex (Spark) agree on this character-class-only pattern.
_BPE_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r]"


def bpe_tokens(text) -> Column:
    """Token pieces under a BPE-style pre-tokenizer (JVM regexp, no Python)."""
    return F.regexp_extract_all(text, F.lit(_BPE_PATTERN), 0)


def bpe_token_count(text) -> Column:
    return F.size(bpe_tokens(text))


def alpha_token_count(text) -> Column:
    """Purely alphabetic tokens — the cheap signal for prose-vs-markup."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+"), 0))


def dup_token_ratio(text) -> Column:
    """Fraction of tokens that are repeats of an earlier token (Gopher-style
    repetition signal): 1 - distinct/total."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(toks)).cast("double") / n
    )


def top_token_ratio(text) -> Column:
    """Frequency of the most common token over total tokens — high values
    flag degenerate/repetitive documents."""
    toks = tokens(text)
    n = F.size(toks)
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(top.cast("double") / n)


def dup_shingle_ratio(text, n: int = 3) -> Column:
    """Fraction of word n-grams that are duplicates — the classic duplicate
    n-gram repetition filter."""
    sh = shingles(text, n)
    total = F.size(sh)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(sh)).cast("double") / total
    )


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles as an array column (JVM-side, no explode).
    Docs shorter than n tokens get a single whole-text shingle.

    Built as n-1 ``zip_with`` passes over shifted slices of the token array
    (n slices + (n-1)·k cheap concats) instead of one slice+concat_ws per
    start position (k slices) — higher-order functions are interpreted, not
    codegen'd, so per-element operation count is the cost model here
    (measured ~2× on the shingling stage)."""
    toks = tokens(text)
    k = F.size(toks) - (n - 1)
    shifted = [F.slice(toks, i + 1, k) for i in range(n)]
    grams = shifted[0]
    for part in shifted[1:]:
        grams = F.zip_with(grams, part, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k <= 0, F.array(F.concat_ws(" ", toks))).otherwise(grams)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
# Patterns restricted to the syntax subset where Java regex (Spark) and RE2
# (DuckDB) agree exactly — character classes, bounded repetition, no
# lookaround — so the scrub is oracle-verifiable byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"


def pii_scrub(text) -> Column:
    """Redact emails then IPv4 addresses with typed placeholders — the
    minimum-viable PII pass a training pipeline runs before tokenization.
    Email first: an address like ``a@1.2.3.4.com`` must scrub as one email
    rather than being mangled into ``a@<IP>.com``. (An address whose domain
    is a bare IP, ``a@10.0.0.1``, has no alphabetic TLD so it is not an
    email match; its IP is still redacted by the second pass.) Pure
    ``regexp_replace`` (JVM, codegen'd) — no Python on the hot path."""
    no_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PII_IPV4_RE, "<IP>")


def pii_email_count(text) -> Column:
    return F.regexp_count(text, F.lit(PII_EMAIL_RE))


def pii_ipv4_count(text) -> Column:
    """Count IPv4 literals that survive email scrubbing (an IP inside an
    email address is the email's PII, not a separate leak)."""
    return F.regexp_count(
        F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"), F.lit(PII_IPV4_RE)
    )
