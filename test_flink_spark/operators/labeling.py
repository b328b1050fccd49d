"""Weak-supervision topic labeling: score each document against keyword
lexicons and assign the argmax topic — the labeling-function primitive
(Snorkel-style) used to slice corpora by domain before mixing/sampling
(e.g. "code vs prose vs math" routing in pretraining pipelines).

Semantics (deterministic, engine-reproducible):
- a topic's score is the number of TOKEN OCCURRENCES matching its
  lexicon (occurrences, not distinct matches — a doc that says 'join'
  ten times is more of a join doc than one that says it once);
- label = topic with the highest score, ties broken by topic name
  ascending; all-zero docs get ``fallback_label``.

Scale design: pure array expressions per row — ZERO shuffle, composes
over readStream unchanged (same contract as quality_scores/language_id).
Lexicons are embedded as array literals (they're human-curated and
small); a 10k-term lexicon would swap the per-topic filter for one
broadcast join on an exploded token column without changing semantics."""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words


def topic_labels(
    df: DataFrame,
    lexicons: Mapping[str, Sequence[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    fallback_label: str = "other",
) -> DataFrame:
    """``(id_col, score_<topic>..., label, label_score)`` — per-topic
    occurrence counts plus the argmax label."""
    if not lexicons:
        raise ValueError("lexicons must be non-empty")
    names = sorted(lexicons)  # deterministic column order AND tie-break
    ws = words(F.col(text_col))
    score_cols = []
    for name in names:
        lex = F.array(*[F.lit(t) for t in lexicons[name]])
        score_cols.append(
            F.size(F.filter(ws, lambda w: F.array_contains(lex, w)))  # noqa: B023
            .cast("long")
            .alias(f"score_{name}")
        )
    scored = df.select(F.col(id_col), *score_cols)
    # argmax via a single greatest() + the first name (asc) reaching it
    best = F.greatest(*[F.col(f"score_{n}") for n in names])
    label = F.when(best <= 0, F.lit(fallback_label))
    for name in names:  # first match in ascending name order wins ties
        label = label.when(F.col(f"score_{name}") == best, F.lit(name))
    return scored.select(
        F.col(id_col),
        *[F.col(f"score_{n}") for n in names],
        label.alias("label"),
        F.when(best > 0, best).otherwise(F.lit(0)).cast("long").alias("label_score"),
    )


def topic_labels_oracle_sql(
    lexicons: Mapping[str, Sequence[str]],
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    fallback_label: str = "other",
) -> str:
    """DuckDB replay: identical tokenization, occurrence counts, greatest,
    and ascending-name tie-break."""
    names = sorted(lexicons)
    score_exprs = []
    for name in names:
        lex = "[" + ", ".join(f"'{t}'" for t in lexicons[name]) + "]"
        score_exprs.append(
            f"len(list_filter(w, x -> list_contains({lex}, x))) AS score_{name}"
        )
    greatest = "GREATEST(" + ", ".join(f"score_{n}" for n in names) + ")"
    case = f"CASE WHEN {greatest} <= 0 THEN '{fallback_label}'\n"
    for name in names:
        case += f"            WHEN score_{name} = {greatest} THEN '{name}'\n"
    case += "       END"
    scores = ",\n           ".join(score_exprs)
    score_list = ", ".join(f"CAST(score_{n} AS BIGINT) AS score_{n}" for n in names)
    return f"""
WITH ws AS (
    SELECT {id_col}, string_split_regex(trim({text_col}), '\\s+') AS w FROM {table}
), scored AS (
    SELECT {id_col},
           {scores}
    FROM ws
)
SELECT {id_col}, {score_list},
       {case} AS label,
       CAST(CASE WHEN {greatest} > 0 THEN {greatest} ELSE 0 END AS BIGINT)
         AS label_score
FROM scored
"""
