"""Text-analysis chains for the BM25 search store — the per-field
``analyzer`` the reference's ES mapping declares
(``examples/config.json:64-66``: ``"analyzer": "ik_max_word",
"search_analyzer": "ik_smart"``): index-time tokenization and
query-time term analysis MUST share one pipeline or "Spark ≠ spark"
on day one.

Each analyzer exists in three provably-equivalent forms:

* :meth:`Analyzer.tokens_col` — a pure column expression (JVM,
  whole-stage codegen; no UDF) applied when documents fold into the
  store, so a 100 TB corpus tokenizes without touching Python;
* :meth:`Analyzer.analyze_text` — the Python twin, applied to
  query strings driver-side (query terms are model-sized);
* :meth:`Analyzer.duckdb_tokens_sql` — the DuckDB-SQL twin, so
  registry oracles re-derive the identical tokens independently.

Cross-engine equality is pinned by ``tests/test_analysis.py`` over a
Unicode sample (Java regex vs RE2 vs ``unicodedata``).

INVARIANT every analyzer preserves: a NON-NULL text analyzes to at
least one token (possibly the single empty-string token ``['']``,
exactly what the raw whitespace split yields on empty text).  The CDC
fold's tombstone accounting keys on ``text IS NULL`` being the one
input that indexes nothing (``text.py`` ``apply_cdc_to_bm25_index``)
— an analyzer that returned ``[]`` for ``"!!!"`` would silently break
the dead counter and the docstats/dl contract.

The chain itself is the standard lexical stack (lowercase → Unicode
punctuation/symbol strip → whitespace split → optional stopword
removal → optional ASCII fold), the portable core of what ES calls
the ``standard`` analyzer, plus two optional token filters covering
the analyzer families real ES mappings actually declare:

* ``stem`` — a porter-lite English suffix stripper (the ES
  ``stemmer``/``porter_stem`` family): five anchored regex rules
  applied IN SEQUENCE to each token (``sses→ss``, ``ies→i``, plural
  ``-s``, ``-ing`` on stems ≥3, ``-ed`` on stems ≥2; a later rule
  sees the earlier rule's output, so ``meetings → meeting → meet`` —
  the porter cascade).  Each rule is one anchored regex carried
  verbatim by Java regex, RE2 and Python ``re`` — no ``\\w``
  (ASCII-vs-Unicode semantics differ per engine), no backtracking
  construct RE2 lacks.
* ``cjk_bigram`` — the ES ``cjk_bigram`` token filter (the portable
  core of the ``ik``/CJK family the reference's own mapping declares,
  ``examples/config.json:64-66``): a token consisting entirely of CJK
  ideographs (U+4E00–U+9FFF) and length ≥ 2 expands to its
  overlapping character bigrams; everything else passes through.
  Segmentation-free, so it needs no dictionary and stays a pure
  column expression.

Full dictionary segmenters (ik proper, kuromoji) remain out of scope
— the chain is configurable enough to slot one in as another named
entry.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# One separator class, shared verbatim by Java regex (Spark) and RE2
# (DuckDB): Unicode punctuation, Unicode symbols, whitespace.  The
# Python twin mirrors it via unicodedata general categories P*/S*
# (equality pinned by test over a Unicode sample).
_SEP = r"[\p{P}\p{S}\s]"

# Latin-1/Latin-A accent fold (lowercase side only — fold runs after
# lowercase).  Explicit map, not ICU: Spark `translate`, Python
# str.translate and a generated nested-`replace` DuckDB form all
# apply the identical table.  (DuckDB's own translate() is
# byte-indexed and corrupts multibyte chars — measured, not assumed.)
_FOLD_FROM = "áàâäãåéèêëíìîïóòôöõúùûüçñýÿ"
_FOLD_TO = "aaaaaaeeeeiiiiooooouuuucnyy"

_STOP_DEFAULT = ("the", "a", "of", "to", "in", "and", "is", "on")

# Porter-lite rules: (anchored pattern, replacement with <1> = group
# 1), applied IN SEQUENCE per token.  Patterns restricted to the
# regex subset Java regex, RE2 and Python `re` treat identically
# (anchors, char classes, bounded dot quantifiers — no \\w, no
# lookaround); each is $-anchored so at most one match fires per rule
# and the replace-first vs replace-all engine difference cannot bite.
_STEM_RULES = (
    ("sses$", "ss"),
    ("ies$", "i"),
    ("([^su])s$", "<1>"),
    ("(.{3,})ing$", "<1>"),
    ("(.{2,})ed$", "<1>"),
)

# CJK unified ideographs as LITERAL characters in the class (escape
# syntax differs across Java/RE2/Python; the resolved codepoints do
# not)
_CJK_RANGE = "一-鿿"
_CJK_WORD = "^[" + _CJK_RANGE + "]{2,}$"


class Analyzer:
    """One named analysis chain; see module docstring for the three
    equivalent forms.  ``name`` is persisted in the store's
    ``_bm_params`` row — stores written by a different analyzer never
    merge (the tokenizer-scheme guard, extended)."""

    def __init__(
        self,
        name: str,
        *,
        lowercase: bool = False,
        strip: bool = False,
        fold: bool = False,
        stopwords: Sequence[str] = (),
        stem: bool = False,
        cjk_bigram: bool = False,
    ):
        self.name = name
        self.lowercase = lowercase
        self.strip = strip
        self.fold = fold
        self.stopwords = tuple(stopwords)
        self.stem = stem
        self.cjk_bigram = cjk_bigram

    # ---------------- Spark column form ----------------

    def tokens_col(self, text: Column) -> Column:
        """array<string> of analyzed tokens; non-null text → ≥1 token
        (degenerate analyses pad to ``['']``, matching the raw
        whitespace split on empty text)."""
        if not self.strip:
            # whitespace family: trim + split, the legacy store scheme
            base = F.split(
                F.trim(F.lower(text) if self.lowercase else text),
                r"\s+",
            )
        else:
            s = F.lower(text) if self.lowercase else text
            if self.fold:
                s = F.translate(s, _FOLD_FROM, _FOLD_TO)
            # separator-trim then separator-split: empty/all-separator
            # strings yield [''] with no HOF filter (split of '' is
            # ['']) — the whole chain stays inside codegen
            base = F.split(
                F.regexp_replace(s, f"^{_SEP}+|{_SEP}+$", ""),
                f"{_SEP}+",
            )
        if self.stopwords:
            kept = F.filter(base, lambda t: ~t.isin(*self.stopwords))
            base = F.when(
                F.size(kept) == 0, F.array(F.lit(""))
            ).otherwise(kept)
        if self.stem:
            def stem_one(t):
                out = t
                for pat, rep in _STEM_RULES:
                    out = F.regexp_replace(
                        out, pat, rep.replace("<1>", "$1")
                    )
                return out

            base = F.transform(base, stem_one)
        if self.cjk_bigram:
            def expand(t):
                bigrams = F.transform(
                    F.sequence(F.lit(1), F.length(t) - 1),
                    lambda i: t.substr(i, F.lit(2)),
                )
                return F.when(t.rlike(_CJK_WORD), bigrams).otherwise(
                    F.array(t)
                )

            base = F.flatten(F.transform(base, expand))
        return base

    # ---------------- Python twin ----------------

    def analyze_text(self, s):
        """Driver-side twin of :meth:`tokens_col` (None → None)."""
        if s is None:
            return None
        if not self.strip:
            toks = re.split(r"\s+", (s.lower() if self.lowercase else s).strip())
        else:
            t = s.lower() if self.lowercase else s
            if self.fold:
                t = t.translate(str.maketrans(_FOLD_FROM, _FOLD_TO))
            t = "".join(
                " " if unicodedata.category(ch)[0] in "PS" else ch
                for ch in t
            )
            toks = [w for w in t.split() if w] or [""]
        if self.stopwords:
            toks = [w for w in toks if w not in self.stopwords] or [""]
        if self.stem:
            def stem_one(w: str) -> str:
                for pat, rep in _STEM_RULES:
                    w = re.sub(pat, rep.replace("<1>", "\\1"), w)
                return w

            toks = [stem_one(w) for w in toks]
        if self.cjk_bigram:
            out = []
            for w in toks:
                if re.fullmatch("[" + _CJK_RANGE + "]{2,}", w):
                    out.extend(w[i:i + 2] for i in range(len(w) - 1))
                else:
                    out.append(w)
            toks = out
        return toks

    def analyze_terms(self, terms: Sequence[str]) -> list[str]:
        """Query-side analysis: each raw term runs the chain; padded
        empty tokens are dropped (a query never searches ``''``).
        Idempotent — analyzing already-analyzed terms is a no-op — so
        layered entry points may each call it safely."""
        out: list[str] = []
        for t in terms:
            for w in self.analyze_text(t) or []:
                if w != "":
                    out.append(w)
        return out

    # ---------------- DuckDB twin ----------------

    def duckdb_tokens_sql(self, expr: str) -> str:
        """SQL producing the identical ``list<varchar>`` for ``expr``."""
        if not self.strip:
            inner = f"lower({expr})" if self.lowercase else expr
            base = f"string_split_regex(trim({inner}), '\\s+')"
        else:
            s = f"lower({expr})" if self.lowercase else expr
            if self.fold:
                for a, b in zip(_FOLD_FROM, _FOLD_TO):
                    s = f"replace({s}, '{a}', '{b}')"
            # verbatim class: DuckDB string literals are standard SQL
            # (no backslash processing), so RE2 receives _SEP as-is
            base = (
                f"string_split_regex(regexp_replace({s}, "
                f"'^{_SEP}+|{_SEP}+$', '', 'g'), '{_SEP}+')"
            )
        if self.stopwords:
            stops = ", ".join(f"'{w}'" for w in self.stopwords)
            kept = f"list_filter({base}, __t -> __t NOT IN ({stops}))"
            base = (
                f"(CASE WHEN len({kept}) = 0 THEN [''] ELSE {kept} END)"
            )
        if self.stem:
            inner = "__s"
            for pat, rep in _STEM_RULES:
                rd = rep.replace("<1>", "\\1")
                inner = f"regexp_replace({inner}, '{pat}', '{rd}')"
            base = f"list_transform({base}, __s -> {inner})"
        if self.cjk_bigram:
            base = (
                f"flatten(list_transform({base}, __w -> "
                f"CASE WHEN regexp_matches(__w, '{_CJK_WORD}') "
                f"THEN list_transform(range(1, length(__w)), "
                f"__i -> substring(__w, __i::INT, 2)) "
                f"ELSE [__w] END))"
            )
        return base


ANALYZERS: dict[str, Analyzer] = {
    # the legacy scheme: raw whitespace split, case-sensitive — the
    # default of every pre-existing store (params rows without an
    # ``analyzer`` column resolve here)
    "whitespace": Analyzer("whitespace"),
    # whitespace + lowercase, no punctuation handling
    "lowercase": Analyzer("lowercase", lowercase=True),
    # the ES-standard-shaped chain: lowercase + Unicode punct/symbol
    # strip
    "standard": Analyzer("standard", lowercase=True, strip=True),
    # standard + English stopword removal
    "standard_stop": Analyzer(
        "standard_stop",
        lowercase=True,
        strip=True,
        stopwords=_STOP_DEFAULT,
    ),
    # standard + Latin accent fold (café → cafe)
    "standard_fold": Analyzer(
        "standard_fold", lowercase=True, strip=True, fold=True
    ),
    # standard + porter-lite English stemmer (the ES stemmer filter
    # family: plural / -ing / -ed suffix stripping, cascaded)
    "standard_stem": Analyzer(
        "standard_stem", lowercase=True, strip=True, stem=True
    ),
    # standard + CJK ideograph bigrams (the segmentation-free core of
    # the ik/cjk analyzer family the reference's mapping declares)
    "cjk_bigram": Analyzer(
        "cjk_bigram", lowercase=True, strip=True, cjk_bigram=True
    ),
}


def get_analyzer(name: str) -> Analyzer:
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; available: "
            f"{sorted(ANALYZERS)}"
        ) from None
