"""Reference-fidelity tokenizer as pure Catalyst expressions.

Replicates the reference mapper's tokenization byte-for-byte
(reference w7/src/python/map.py:9-18):

    line.lower()
    line.translate(maketrans(string.punctuation, ' '*len(string.punctuation)))
    line.split(' ')           # drop '' tokens

``string.punctuation`` is the fixed 32-char set ``!"#$%&'()*+,-./:;<=>?@
[\\]^_`{|}~``.  Using ``F.translate`` (not a regex) guarantees the exact
same character set with no regex-class surprises, and stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

import string

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT = string.punctuation  # 32 chars, stable across Python versions
PUNCT_SPACES = " " * len(PUNCT)

# SQL-literal-safe copy for oracle SQL strings (single quote doubled).
PUNCT_SQL = PUNCT.replace("'", "''")


def tokens(text: Column) -> Column:
    """array<string> of non-empty tokens, reference semantics."""
    cleaned = F.translate(F.lower(text), PUNCT, PUNCT_SPACES)
    return F.filter(F.split(cleaned, " "), lambda w: w != F.lit(""))


def make_reference_tokenizer():
    """Build the reference tokenizer as a self-contained closure.

    Returned function is defined in a local scope so cloudpickle ships it
    BY VALUE to Spark Python workers — executors never need this package
    importable (they only have the driver's pickled closure).  Module-
    level functions would pickle by reference and fail on workers with
    ``ModuleNotFoundError``.
    """
    import string as _string

    punct_table = str.maketrans(_string.punctuation, " " * len(_string.punctuation))

    def py_tokens(text: str) -> list[str]:
        # Verbatim reference semantics (w7/src/python/map.py:8-18):
        # per line → strip, lower, punctuation→spaces, split, drop ''.
        out: list[str] = []
        for line in text.split("\n"):
            line = line.strip().lower().translate(punct_table)
            out.extend(w for w in line.split(" ") if w != "")
        return out

    return py_tokens


def word_ngrams(tokens: Column, n: int) -> Column:
    """Contiguous word n-gram array (empty when the doc is shorter than
    n).  Pure JVM expressions; the guard matters because ``sequence``
    with start > stop generates a DESCENDING range."""

    def gram_at(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(tokens, i + k) for k in range(n)])

    return F.when(
        F.size(tokens) >= n,
        F.transform(F.sequence(F.lit(1), F.size(tokens) - (n - 1)), gram_at),
    ).otherwise(F.array().cast("array<string>"))


def tokenize_sql_duckdb(col: str) -> str:
    """The same tokenizer as a DuckDB expression producing a list, for
    oracle SQL strings."""
    return (
        f"list_filter(string_split(translate(lower({col}), "
        f"'{PUNCT_SQL}', '{PUNCT_SPACES}'), ' '), w -> w <> '')"
    )
