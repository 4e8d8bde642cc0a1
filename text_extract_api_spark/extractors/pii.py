"""Deterministic PII anonymization — a chain of JVM-side regexp_replace.

The reference performs PII removal by prompting an LLM with "Remove Any
personal information ... replacing it with 'ANONYMIZED'"
(``examples/example-mri-remove-pii.txt:1-2``, executed at
``extract/tasks.py:71-84``). The engine re-expresses the contract as a pure,
vectorized regex pass (north rule: deterministic PII regex/NER pass) — same
replacement token, fully reproducible, whole-stage-codegen fast.

Pattern order matters: SSN before generic phone (so a phone rule never eats
half an SSN), email first (emails contain digits/dots that later rules could
mangle). Patterns are restricted to syntax with identical semantics in Java
regex (Spark) and RE2 (the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TOKEN = "ANONYMIZED"

# (name, regex) — applied in order.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("intl_phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"),
    ("us_phone", "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"),
    ("short_phone", "[0-9]{3}-[0-9]{4}"),
]


# Single alternation, precedence = list order. One pass over each string
# instead of five chained regexp_replace passes (4 fewer intermediate string
# materializations per span — measurable at corpus scale). Alternation is
# leftmost-first in both Java regex (Spark) and RE2 (DuckDB), so precedence
# at a given position matches the chained semantics; equivalence on
# overlapping cases is covered by tests and the oracle gate.
COMBINED_PATTERN = "(" + "|".join(pat for _, pat in PII_PATTERNS) + ")"


def anonymize_col(c: Column) -> Column:
    return F.regexp_replace(c, COMBINED_PATTERN, TOKEN)


def anonymize_sql(expr: str) -> str:
    """The identical single-pass replace as DuckDB SQL (oracle parity)."""
    lit = COMBINED_PATTERN.replace("'", "''")
    return f"regexp_replace({expr}, '{lit}', '{TOKEN}', 'g')"
