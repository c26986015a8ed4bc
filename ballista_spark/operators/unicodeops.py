"""Unicode text normalization: NFKC/NFC/NFD/NFKD normal forms and accent
stripping — the standard tokenizer-training pre-pass (SentencePiece
defaults to NFKC; BERT-style vocabularies strip accents).

Spark SQL exposes no ICU normalization function, so this is one of the
repo's few sanctioned Python stages: an Arrow-batched ``pandas_udf``
(Series → Series, vectorized transfer, no per-row pickling) over
``unicodedata`` from the CPython standard library — deterministic across
workers because every executor ships the same CPython/unicodedata
version.  Map-only: no shuffle, no state, linear in corpus bytes; slot it
before :mod:`ballista_spark.operators.bpe` / :mod:`.unigram` fits so the
learned vocabulary never splits on compatibility variants (ﬁ vs fi,
full-width Ａ vs A, composed é vs e+◌́).

The reference engine has no Unicode normalization either
(`rust/core/proto/ballista.proto` scalar enum) — pipeline-completing
functionality, same charter as :mod:`.text` (which stays pure-JVM; this
module exists so that charter holds).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def unicode_normalize(text="text", form: str = "NFKC") -> F.Column:
    """``unicodedata.normalize(form, s)`` as a vectorized column; NULL in,
    NULL out.  ``form`` ∈ NFC/NFKC/NFD/NFKD."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm(F.col(text) if isinstance(text, str) else text)


def nfkc_normalize(text="text") -> F.Column:
    """NFKC normal form — the SentencePiece-default tokenizer pre-pass."""
    return unicode_normalize(text, "NFKC")


def strip_accents(text="text") -> F.Column:
    """Remove combining marks (BERT ``_run_strip_accents``, verbatim):
    NFD decompose, drop category-Mn codepoints, and return the
    decomposed remainder WITHOUT recomposing — BERT does not NFC the
    result, and recomposing diverges on scripts NFC composes (e.g.
    Hangul syllables recompose from Jamo; BERT leaves the Jamo), which
    would mismatch a vocab built with the reference tokenizer.
    ``é`` → ``e``, ``ñ`` → ``n``; NULL in, NULL out."""

    @F.pandas_udf(T.StringType())
    def _strip(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            decomposed = unicodedata.normalize("NFD", v)
            # category Mn (not combining-class != 0): BERT's documented
            # predicate.  The two differ on ccc=0 Mn marks (many Indic
            # matras/viramas), which BERT strips and combining() keeps.
            return "".join(
                c for c in decomposed if unicodedata.category(c) != "Mn"
            )

        return s.map(one)

    return _strip(F.col(text) if isinstance(text, str) else text)
