"""Boilerplate/template mining over transcript turns — the QUALITY side of
the boilerplate story. Every blocking-layer component here defends against
templated content (hot-block caps, banned-band masks, df valves); this
module is the operator that FINDS it: verbatim turn texts repeated across
many conversations (system greetings, canned refusals, templated tool
preambles) and the per-conversation boilerplate ratio a training-data
pipeline filters on (a conversation that is mostly template carries little
signal and inflates near-dup rates downstream).

Scale shape: turns drop to 16-byte digests in the first projection (long
texts ride exactly one exchange, the same trick as align.turn_signatures);
template discovery is one (digest, role) count-distinct aggregate with a
``min_df`` gate; per-conversation scoring joins turns to the template
digest set on the digest key (left_semi-shaped marker join) and reduces
with one conv-keyed aggregate. Character counts are exact longs; the only
double is the final ratio."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(role_col: str, text_col: str):
    # role-scoped digest: the same text as user input vs assistant output
    # is two different templates
    return F.md5(
        F.concat_ws("", F.col(role_col), F.coalesce(F.col(text_col), F.lit("")))
    )


def turn_templates(
    transcripts: DataFrame,
    min_df: int = 10,
    id_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Templates = verbatim (role, text) turn values occurring in at least
    ``min_df`` DISTINCT conversations. Returns one row per template:
    (template_digest, role, df, n_occurrences, n_chars, sample_text),
    df = distinct conversations, n_occurrences = total turn rows (a
    template can repeat within one conversation). sample_text is the
    verbatim text (all occurrences are identical by construction —
    any-value semantics via max, deterministic)."""
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    turns = transcripts.select(
        F.col(id_col).alias("_cid"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("_text"),
        _digest(role_col, text_col).alias("template_digest"),
    )
    return (
        turns.groupBy("template_digest", "role")
        .agg(
            F.count_distinct("_cid").alias("df"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max(F.length(F.coalesce(F.col("_text"), F.lit("")))).alias(
                "n_chars"
            ),
            F.max("_text").alias("sample_text"),
        )
        .where(F.col("df") >= F.lit(int(min_df)))
    )


def boilerplate_ratio(
    transcripts: DataFrame,
    templates: DataFrame | None = None,
    min_df: int = 10,
    id_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation boilerplate report:
    (conv_id, n_turns, n_template_turns, n_chars, n_template_chars,
    template_char_frac) — the fraction of the conversation's characters
    sitting in turns that are corpus-wide templates. Pass a precomputed
    ``templates`` frame (from turn_templates, possibly hand-curated) to
    score against a fixed registry; otherwise templates are mined from
    this corpus at ``min_df``. Zero-char conversations report frac 0.0."""
    if templates is None:
        templates = turn_templates(
            transcripts, min_df=min_df, id_col=id_col,
            role_col=role_col, text_col=text_col,
        )
    marks = templates.select("template_digest").distinct().withColumn(
        "_is_tpl", F.lit(1)
    )
    turns = transcripts.select(
        F.col(id_col).alias("conv_id"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len"),
        _digest(role_col, text_col).alias("template_digest"),
    )
    joined = turns.join(marks, "template_digest", "left").withColumn(
        "_is_tpl", F.coalesce("_is_tpl", F.lit(0))
    )
    agg = joined.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("_is_tpl").alias("n_template_turns"),
        F.sum("_len").alias("n_chars"),
        F.sum(F.col("_len") * F.col("_is_tpl")).alias("n_template_chars"),
    )
    return agg.withColumn(
        "template_char_frac",
        F.when(
            F.col("n_chars") > 0,
            F.col("n_template_chars").cast("double") / F.col("n_chars"),
        ).otherwise(F.lit(0.0)),
    )
