"""Scalar column helpers (SURVEY.md §2.8) shared across operators."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def label_type(label: Column) -> Column:
    """Entity type of a BIO label: 'B-per' -> 'per'; 'O' -> 'O'.

    Reference: ``label.split('-')[-1]`` (bio_prf_eval.py:210-211).
    """
    return F.substring_index(label, "-", -1)


def is_entity_label(label: Column) -> Column:
    return label != F.lit("O")


def rule_type(token: Column) -> Column:
    """Deterministic mock-tagger type for a token (oracle.rule_tag_token).

    Entity iff capitalized-alphabetic OR in the fixed lexicon; lowercased
    first-letter buckets: a-f per, g-m loc, n-s org, t-z misc.  Kept
    SQL-expressible so the DuckDB oracle can reproduce it exactly.
    """
    from ..oracle import RULE_LEXICON

    first = F.lower(F.substring(token, 1, 1))
    return F.when(
        token.rlike("^[A-Z][a-zA-Z]*$") | token.isin(*sorted(RULE_LEXICON)),
        F.when(first <= "f", "per")
        .when(first <= "m", "loc")
        .when(first <= "s", "org")
        .otherwise("misc"),
    )
