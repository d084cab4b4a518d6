"""Text analysis for training-data pipelines — pure Column expressions.

Language-ID (stopword-hit heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting. All JVM-side
higher-order functions / regex — no Python in the hot path; every op has a
matching ANSI-SQL oracle form (see ``__spark_entry__.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal deterministic stopword profiles (top function words per language).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "at"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "es", "ein",
           "zu", "den", "mit", "auf", "für", "von"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no",
           "por", "con", "los", "para", "una"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
           "que", "pas", "pour", "dans", "sur"],
}

# BPE-ish token regex: word pieces OR single non-space punctuation.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"
PUNCT_RE = r"[^\sA-Za-z0-9_]"
# the NON-punct alphabet, spelled out for translate(): counting punctuation
# by deleting these chars is ~8x faster than regexp_count(PUNCT_RE) at
# sf1.0 (0.22 s vs 1.85 s / 50k docs) — regexp_count pays per MATCH, and
# punctuation matches are dense. Java \s is exactly these six chars.
_NON_PUNCT_CHARS = (
    " \t\n\x0b\x0c\r"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_"
)


def punct_count(col) -> Column:
    r"""Count of PUNCT_RE chars (non-space, non-word), via translate — the
    char-map equivalent of ``regexp_count(PUNCT_RE)``: both count one per
    codepoint outside the 69-char [\s A-Za-z 0-9 _] set."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.translate(F.coalesce(c, F.lit("")), _NON_PUNCT_CHARS, ""))


def tokens(col) -> Column:
    """Whitespace tokenization; empty array for null/empty input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.coalesce(c, F.lit("")), r"\s+"), lambda t: t != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col) -> Column:
    """Count of BPE-ish regex tokens (word pieces + punctuation marks).

    Computed as (# maximal word-piece runs) + (# punctuation chars) — the
    two BPE_TOKEN_RE alternation arms, counted separately (0.27 s vs
    0.94 s at sf1.0/50k docs): the runs regex finds ~55 matches/doc where
    the alternation finds ~90 (every punctuation char is its own match),
    and the punctuation arm needs no regex at all (translate). Identical
    counts by construction."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    runs = F.regexp_count(c, F.lit(r"[A-Za-z0-9_]+"))
    return runs + punct_count(c)


def stopword_hits(col, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: F.lower(t).isin(sw)))


def quality_score(col) -> Column:
    """Heuristic [0,1] quality score: penalizes very short docs, high
    punctuation density, and low alpha-token ratio. Deterministic and
    SQL-expressible (weights are part of the contract).

    The token array is let_-bound ONCE and shared by the length score, the
    alpha filter, and both ratio denominators — the unbound form
    re-tokenized ~4x per row via CollapseProject (code-review r4)."""
    from .expr import let_

    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    n_char = F.length(c)
    n_punct = punct_count(c)
    punct_ratio = F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(1.0))

    def _score(toks):
        n_tok = F.size(toks)
        alpha_tokens = F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$")))
        alpha_ratio = F.when(n_tok > 0, alpha_tokens / n_tok).otherwise(F.lit(0.0))
        len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
        return (
            F.lit(0.4) * len_score
            + F.lit(0.4) * alpha_ratio
            + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
        )

    return F.round(let_(tokens(c), _score), 6)


def langid_scores(col) -> Column:
    """struct of per-language stopword-hit rates, all computed from ONE
    let_-bound tokenization (r4 — the old list-of-Columns form re-tokenized
    per language and duplicated the shared denominator per projection).
    Select fields as ``langid_scores(c)["en"]`` etc."""
    from .expr import let_

    def rates(toks):
        n = F.greatest(F.size(toks), F.lit(1))

        def hit_rate(sw):
            return F.size(F.filter(toks, lambda t: F.lower(t).isin(sw))) / n

        return F.struct(
            *[hit_rate(STOPWORDS[lang]).alias(lang) for lang in STOPWORDS]
        )

    return let_(tokens(col), rates)


def langid(col) -> Column:
    """Predicted language = argmax stopword-hit rate; 'und' (undetermined)
    when no stopword hits at all. Ties break lexicographically (deterministic,
    mirrored in the SQL oracle).

    The token array is bound ONCE and shared by all four stopword profiles,
    and the argmax struct is bound once for the winner extraction — without
    the let-bindings Catalyst re-inlines the tokenization per profile and
    the whole argmax per reference (~6x the work per row).
    """
    from .expr import let_

    def score_all(toks):
        # argmax via greatest over (score, inverted-lang) structs: Spark
        # compares structs lexicographically, so max score wins; ties pick
        # the smallest lang.
        n = F.greatest(F.size(toks), F.lit(1))
        best = None
        for lang, sw in STOPWORDS.items():
            hits = F.size(F.filter(toks, _stopword_pred(sw)))
            cand = F.struct((hits / n).alias("s"), F.lit(_inv(lang)).alias("il"))
            best = cand if best is None else F.greatest(best, cand)
        return best

    def pick(best):
        return F.when(
            best.getField("s") > 0, _uninv(best.getField("il"))
        ).otherwise(F.lit("und"))

    return let_(tokens(col), lambda toks: let_(score_all(toks), pick))


def _stopword_pred(sw: list[str]):
    return lambda t: F.lower(t).isin(sw)


def _inv(lang: str) -> str:
    """Invert bytes so struct-max picks the lexicographically SMALLEST lang
    on score ties."""
    return "".join(chr(255 - ord(ch)) for ch in lang)


def _uninv(col: Column) -> Column:
    # invert back: translate over the known alphabet
    mapping = {_inv(k): k for k in STOPWORDS}
    out = F.lit(None).cast("string")
    for inv, orig in mapping.items():
        out = F.when(col == inv, F.lit(orig)).otherwise(out)
    return out


def doc_fingerprint(col) -> Column:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-collapsed
    text (≙ the reference's normalized-JSON SHA1 content addressing,
    ``python_server/libs/ft_validator.py:201``)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.trim(F.regexp_replace(F.lower(F.coalesce(c, F.lit(""))), r"\s+", " "))
    return F.md5(norm)


def word_ngrams(col, n: int = 3, distinct: bool = True) -> Column:
    """Word n-grams as array<string> (space-joined); ``distinct=False`` keeps
    every occurrence (needed by repetition metrics, which count multiplicity).

    The token array is let-bound: referenced raw, the tokenization subtree
    would be embedded n times inside the per-element lambda and re-evaluated
    PER SHINGLE — O(|doc|²) per document (measured ~50 ms/doc before the
    binding; ~1 ms after)."""
    from .expr import let_

    def body(t):
        # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, so a doc with
        # < n tokens would index element_at(t, 0) → ANSI error. Emit an
        # empty index array instead.
        idx = F.when(
            F.size(t) >= n, F.sequence(F.lit(1), F.size(t) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        joined = F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j).cast("int")) for j in range(n)]
            ),
        )
        return F.array_distinct(joined) if distinct else joined

    return let_(tokens(col), body)


def shingles(col, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> (MinHash input)."""
    return word_ngrams(col, n, distinct=True)


# ---------------------------------------------------------------- quality
# Gopher-style document quality gates (Rae et al. 2021, §A1.1 — public
# paper). Per-doc metrics are pure Column expressions (zero shuffle, zero
# Python); thresholds live in ``gopher_pass`` so callers tune per corpus.

def gopher_metrics(col, stop_lang: str = "en") -> Column:
    """struct(n_words, mean_word_len, symbol_ratio, frac_alpha_words,
    stop_hits) per document.

    - ``mean_word_len``: mean characters per whitespace token;
    - ``symbol_ratio``: (#, …, ellipsis) symbols per word;
    - ``frac_alpha_words``: fraction of words containing ≥1 [A-Za-z];
    - ``stop_hits``: count of ``stop_lang`` stopword tokens.

    The token array is let-bound once and shared by all five metrics
    (CollapseProject would otherwise re-tokenize per metric).
    """
    from .expr import let_

    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    sw = STOPWORDS[stop_lang]

    def body(w):
        n = F.size(w)
        nf = F.greatest(n, F.lit(1)).cast("double")
        total_len = F.aggregate(
            w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        n_sym = F.regexp_count(c, F.lit(r"#|\.\.\.|…"))
        n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
        n_stop = F.size(F.filter(w, _stopword_pred(sw)))
        return F.struct(
            n.alias("n_words"),
            F.round(total_len / nf, 6).alias("mean_word_len"),
            F.round(n_sym / nf, 6).alias("symbol_ratio"),
            F.round(n_alpha / nf, 6).alias("frac_alpha_words"),
            n_stop.alias("stop_hits"),
        )

    return let_(tokens(c), body)


def gopher_pass(
    metrics: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_frac_alpha_words: float = 0.8,
    min_stop_hits: int = 2,
) -> Column:
    """Gopher accept/reject verdict from a ``gopher_metrics`` struct.

    Defaults are the published Gopher thresholds; the two line-shape rules
    (bullet-start / ellipsis-end fractions) need line structure the corpus
    tables don't carry and are intentionally omitted."""
    m = metrics
    return (
        m["n_words"].between(min_words, max_words)
        & m["mean_word_len"].between(min_mean_word_len, max_mean_word_len)
        & (m["symbol_ratio"] <= max_symbol_ratio)
        & (m["frac_alpha_words"] >= min_frac_alpha_words)
        & (m["stop_hits"] >= min_stop_hits)
    )


# ------------------------------------------------------------- repetition
# Repetition filters (Rae et al. 2021 §A1.1: "repetitious documents are
# low quality"): duplicate-token fraction and most-frequent-n-gram mass.
# Both are per-row JVM expressions — zero shuffle, so at 10^12 docs they
# cost one map pass; the alternative (explode n-grams → groupBy(doc, gram))
# would shuffle the entire corpus token stream.

def dup_token_frac(col) -> Column:
    """1 − |distinct tokens| / |tokens|; 0.0 for empty docs."""
    from .expr import let_

    def body(w):
        n = F.size(w)
        return F.when(n > 0, F.round(
            F.lit(1.0) - F.size(F.array_distinct(w)) / n.cast("double"), 6
        )).otherwise(F.lit(0.0))

    return let_(tokens(col), body)


def top_gram_frac(col, n: int = 2) -> Column:
    """struct(top_gram, top_count, n_grams, frac): the most frequent word
    n-gram and the fraction of all n-gram slots it occupies.

    Single JVM pass per row: sort the (non-distinct) n-gram array, then one
    ``aggregate`` scan tracks the longest equal-run — O(g log g) per doc,
    no shuffle, no Python. Ties pick the lexicographically smallest gram
    (the sort order makes the first maximal run win under strict ``>``).
    """
    from .expr import let_

    def scan(grams):
        sorted_g = F.array_sort(grams)
        zero = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
            F.lit("").alias("best_gram"),
        )

        def merge(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
            better = run > acc["best"]
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.when(better, run).otherwise(acc["best"]).alias("best"),
                F.when(better, x).otherwise(acc["best_gram"]).alias("best_gram"),
            )

        acc = F.aggregate(sorted_g, zero, merge)
        n_g = F.size(grams)
        return F.struct(
            F.when(n_g > 0, acc["best_gram"]).otherwise(F.lit(None)).alias("top_gram"),
            acc["best"].alias("top_count"),
            n_g.alias("n_grams"),
            F.when(n_g > 0, F.round(acc["best"] / n_g.cast("double"), 6))
            .otherwise(F.lit(0.0)).alias("frac"),
        )

    return let_(word_ngrams(col, n, distinct=False), scan)


def rolling_fingerprint(col, n: int = 3) -> Column:
    """Shingle-set fingerprint: lexicographic min of md5(shingle) — a
    deterministic bottom-1 sketch of the shingle set."""
    return F.array_min(F.transform(shingles(col, n), lambda s: F.md5(s)))


def gopher_repetition(col) -> Column:
    """Gopher's within-document repetition signals over LINES and
    PARAGRAPHS (Rae et al. 2021, Table A1 rows 1-4):

    struct(n_lines, n_paras, dup_line_frac, dup_line_char_frac,
           dup_para_frac, dup_para_char_frac)

    - elements: lines split on ``\\n``, paragraphs on ``\\n\\n`` (the
      published recipe's separators); whitespace-only elements are excluded
      so blank-line runs don't read as repetition.
    - a "duplicate" is every occurrence BEYOND THE FIRST of a distinct
      element (the reference-filter counting rule); counted with one
      sorted-array run-length scan per row — same zero-shuffle trick as
      ``dup_token_frac``, equal elements made adjacent by any total order.
    - ``*_frac`` = duplicates / elements; ``*_char_frac`` = characters in
      duplicate occurrences / len(text). All 6dp-rounded, 0.0 for docs
      without elements.

    Paired thresholds in the paper: 0.30 (line/para frac), 0.20 (char
    fracs) — compose with a filter; this emits the signals.
    """
    from .expr import let_

    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    total = F.greatest(F.length(c), F.lit(1)).cast("double")

    def dup_scan(arr, out_n, out_frac, out_cfrac):
        """n elements + dup fraction fields from one sorted run-length scan."""

        def body(a):
            def scan(s):
                rep = F.filter(
                    F.transform(
                        s,
                        lambda x, i: F.when(
                            (i > 0) & (x == F.element_at(s, i)), F.length(x)
                        ),
                    ),
                    lambda v: v.isNotNull(),
                )

                def fields(r):
                    n = F.size(a)
                    dups = F.size(r)
                    chars = F.aggregate(
                        r, F.lit(0).cast("long"), lambda acc, x: acc + x
                    )
                    return F.struct(
                        n.cast("long").alias(out_n),
                        F.round(
                            dups / F.greatest(n, F.lit(1)).cast("double"), 6
                        ).alias(out_frac),
                        F.round(chars / total, 6).alias(out_cfrac),
                    )

                return let_(rep, fields)

            return let_(F.array_sort(a), scan)

        return let_(arr, body)

    # blank test is \s-aware: F.trim strips ONLY spaces, so an element like
    # "\n" or "\t" would otherwise count as content (hypothesis-found)
    blank = r"^\s*$"
    lines = F.filter(F.split(c, "\n"), lambda x: ~x.rlike(blank))
    paras = F.filter(F.split(c, "\n\n"), lambda x: ~x.rlike(blank))
    lm = dup_scan(lines, "n_lines", "dup_line_frac", "dup_line_char_frac")
    pm = dup_scan(paras, "n_paras", "dup_para_frac", "dup_para_char_frac")

    def combine(l):
        def inner(p):
            return F.struct(
                l["n_lines"].alias("n_lines"),
                p["n_paras"].alias("n_paras"),
                l["dup_line_frac"].alias("dup_line_frac"),
                l["dup_line_char_frac"].alias("dup_line_char_frac"),
                p["dup_para_frac"].alias("dup_para_frac"),
                p["dup_para_char_frac"].alias("dup_para_char_frac"),
            )

        return let_(pm, inner)

    return let_(lm, combine)


#: C4's terminal punctuation (Raffel et al. 2020 §2.2): a kept line must
#: end in one of these.
C4_TERMINAL_RE = r'[.!?"]$'


def c4_metrics(col, min_line_words: int = 5) -> Column:
    """The C4 cleaning heuristics (Raffel et al. 2020 §2.2) as one struct:

    struct(clean_text, n_lines_kept, n_lines_dropped, n_sentences,
           has_brace, has_lorem)

    - line keep rule: ends in terminal punctuation (``[.!?"]``), has ≥
      ``min_line_words`` whitespace words, and does not contain the word
      "javascript" (case-insensitive) — the paper's three line filters.
    - ``clean_text``: the kept lines rejoined with ``\\n`` (byte-stable).
    - ``n_sentences``: terminal-punctuation count over the CLEAN text —
      this engine's documented sentence proxy (the paper splits with a
      sentence tokenizer; a regex count is deterministic and
      SQL-replicable, and the ≥3 gate behaves identically on prose).
    - ``has_brace`` / ``has_lorem``: the page-level "{" and "lorem ipsum"
      markers (code and boilerplate pages).

    Zero shuffle, zero UDF: one line split + two filters per row, all
    let_-bound so nothing tokenizes twice. Gate with :func:`c4_pass`.
    """
    from .expr import let_

    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))

    def build(lines):
        kept = F.filter(
            lines,
            lambda l: F.trim(l).rlike(C4_TERMINAL_RE)
            & (F.size(tokens(l)) >= min_line_words)
            & ~F.lower(l).contains("javascript"),
        )

        def fields(k):
            clean = F.array_join(k, "\n")

            def out(cl):
                return F.struct(
                    cl.alias("clean_text"),
                    F.size(k).cast("long").alias("n_lines_kept"),
                    (F.size(lines) - F.size(k)).cast("long").alias(
                        "n_lines_dropped"
                    ),
                    F.regexp_count(cl, F.lit(r'[.!?]')).cast("long").alias(
                        "n_sentences"
                    ),
                    c.contains("{").alias("has_brace"),
                    F.lower(c).contains("lorem ipsum").alias("has_lorem"),
                )

            return let_(clean, out)

        return let_(kept, fields)

    lines = F.filter(F.split(c, "\n"), lambda x: ~x.rlike(r"^\s*$"))
    return let_(lines, build)


def c4_pass(metrics: Column, min_sentences: int = 3) -> Column:
    """C4's page gate over :func:`c4_metrics`: ≥ ``min_sentences``
    sentences survive cleaning, no "{", no "lorem ipsum"."""
    return (
        (metrics["n_sentences"] >= min_sentences)
        & ~metrics["has_brace"]
        & ~metrics["has_lorem"]
    )
