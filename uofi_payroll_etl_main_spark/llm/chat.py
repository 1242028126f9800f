"""Chat / SFT data prep: conversation structuring, template rendering,
turn statistics.

Post-training pipelines (SFT/RLHF) consume conversations -- ordered
(role, content) turns -- and flatten them through a chat template into
the token stream the trainer sees.  These operators cover that prep
Spark-side: everything is Catalyst arrays/HOFs (no UDF, no shuffle for
the per-conversation transforms), so rendering is a pure map stage a
100 TB corpus streams through at scan speed.

The corpus has no conversation table, so `synth_conversations` derives
a deterministic one from `documents` (fixed-width token windows with
alternating roles) -- the same pattern the media path uses
(multimodal.synth_media): synthesis is part of the operator surface,
and the downstream render/stat operators accept ANY frame with the
(id, turns) shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import bind1, normalize_text, tokens

__all__ = [
    "synth_conversations",
    "render_chatml",
    "conversation_stats",
    "preference_pairs",
]

TURN_TOKENS = 8


def synth_conversations(
    docs: DataFrame,
    turn_tokens: int = TURN_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic conversation structure from a document corpus:
    the normalized token stream is cut into `turn_tokens`-token turns
    with roles alternating user/assistant (user first).  Documents with
    no tokens yield an empty turns array.

    Output: (id, turns: array<struct<turn:int, role:string,
    content:string>>).  Pure projection -- one codegen transform over an
    index sequence, no explode, no shuffle."""
    # tokens bound once per row (text.bind1): an outer chain referenced
    # from the turn lambda would re-tokenize per turn
    def _turns(toks: Column) -> Column:
        n_turns = F.ceil(F.size(toks) / F.lit(int(turn_tokens))).cast("int")
        return F.when(
            F.size(toks) > 0,
            F.transform(
                F.sequence(F.lit(0), n_turns - 1),
                lambda i: F.struct(
                    i.cast("int").alias("turn"),
                    F.when(i % 2 == 0, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
                    F.concat_ws(
                        " ", F.slice(toks, i * turn_tokens + 1, int(turn_tokens))
                    ).alias("content"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<turn:int,role:string,content:string>>")
        )

    turns = bind1(tokens(normalize_text(text_col)), _turns)
    return docs.select(F.col(id_col), turns.alias("turns"))


def render_chatml(
    conv: DataFrame,
    id_col: str = "doc_id",
    turns_col: str = "turns",
) -> DataFrame:
    """Flatten conversations through a ChatML-style template:
    ``<|im_start|>role\\ncontent<|im_end|>\\n`` per turn, concatenated in
    turn order -- the training-text rendering an SFT loader tokenizes.
    Sentinels are literal strings; a tokenizer maps them to reserved
    special tokens downstream.

    Output: (id, n_turns, rendered).  One codegen transform +
    array_join per row: a pure map stage at any scale."""
    t = F.col(turns_col)
    rendered = F.array_join(
        F.transform(
            t,
            lambda s: F.concat(
                F.lit("<|im_start|>"),
                s["role"],
                F.lit("\n"),
                s["content"],
                F.lit("<|im_end|>\n"),
            ),
        ),
        "",
    )
    return conv.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_turns"),
        rendered.alias("rendered"),
    )


def conversation_stats(
    conv: DataFrame,
    id_col: str = "doc_id",
    turns_col: str = "turns",
) -> DataFrame:
    """Per-conversation structure profile: turn count, user/assistant
    token counts, and the assistant token share (the loss-mask fraction
    an SFT run actually trains on).  Degenerate conversations (no
    assistant turns, or wildly unbalanced shares) are what this feeds a
    filter for.

    Output: (id, n_turns, n_user_tokens, n_assistant_tokens,
    assistant_share).  Aggregates run INSIDE the array via codegen
    higher-order functions -- no explode, no shuffle."""
    t = F.col(turns_col)

    def tok_count(role: str) -> Column:
        return F.aggregate(
            F.filter(t, lambda s: s["role"] == role),
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.size(F.split(s["content"], " ")).cast("long"),
        )

    n_user = tok_count("user")
    n_asst = tok_count("assistant")
    total = n_user + n_asst
    return conv.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_turns"),
        n_user.alias("n_user_tokens"),
        n_asst.alias("n_assistant_tokens"),
        F.when(total > 0, F.round(n_asst / total, 6)).alias("assistant_share"),
    )


def preference_pairs(
    df: DataFrame,
    group_col: str = "prompt_id",
    id_col: str = "completion_id",
    score_col: str = "score",
) -> DataFrame:
    """DPO/RLHF preference-pair construction: per prompt group, pick
    the best-scored completion as `chosen` and the worst as `rejected`
    (reward-model scores, judge ratings, or any comparable signal).
    Groups with a single completion are dropped -- no pair to form.

    Tie-break contract (document it to your trainer): among equal top
    scores the HIGHEST completion id wins; among equal bottom scores
    the LOWEST id loses.  That makes the operator a pure struct
    min/max aggregate -- one shuffle on the prompt key with map-side
    partial aggregation, no window sort -- the cheapest deterministic
    shape (a row_number pair would cost a per-group sort for the same
    answer).  chosen != rejected is guaranteed: with >=2 distinct
    completion ids the (score, id) struct max and min always differ.

    Output: (group, chosen_id, rejected_id, chosen_score,
    rejected_score, margin, n_completions).  Rows with a null score
    are excluded up front (a null reward is "unrated", not "worst";
    struct min would otherwise sort it somewhere type-dependent).
    """
    rated = df.filter(F.col(score_col).isNotNull())
    hi = F.max(
        F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("i"))
    ).alias("hi")
    lo = F.min(
        F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("i"))
    ).alias("lo")
    agg = rated.groupBy(group_col).agg(
        hi, lo, F.count(F.lit(1)).cast("long").alias("n_completions")
    )
    return agg.filter(F.col("n_completions") >= 2).select(
        group_col,
        F.col("hi.i").alias("chosen_id"),
        F.col("lo.i").alias("rejected_id"),
        F.col("hi.s").alias("chosen_score"),
        F.col("lo.s").alias("rejected_score"),
        (F.col("hi.s") - F.col("lo.s")).alias("margin"),
        "n_completions",
    )
