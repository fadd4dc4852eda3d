"""Text scalar functions.

Reference parity: the only string operation in the reference is
first-sentence truncation — ``body.split('.').next()`` at
/root/reference/src/main.rs:36-39 and :52 (S3 in SURVEY.md §2.1).

Extensions (SURVEY §2.7 / driver north star): tokenization, quality
features, language-ID heuristics, fingerprinting live in
``operators/textstats.py``; this module keeps the reusable pure-Column
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token regex: alphanumeric runs; everything else is a boundary.
TOKEN_RE = "[a-z0-9]+"


def first_sentence(text: Column) -> Column:
    """Everything before the first '.' (reference src/main.rs:36-39).

    ``substring_index(text, '.', 1)`` returns the whole string when no '.'
    exists — same as Rust's ``split('.').next()``.
    """
    return F.substring_index(text, ".", 1)


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens as an array column (JVM regex split)."""
    t = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    return F.filter(F.split(F.trim(t), " "), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(F.trim(text), "\\s+"), lambda x: x != ""))
