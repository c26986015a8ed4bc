"""Conversation (SFT/chat) dataset operators: structural validation,
template rendering, stats, and turn-level dedup keys over a
``messages: array<struct<role string, content string>>`` column — the
post-training counterpart of the pretraining text operators.

Instruction-tuning pipelines curate conversations, not documents: the
unit of dedup is often the PROMPT (first user turn), the quality gates
are structural (roles must alternate, the last turn must be the
assistant's, no empty turns), and training consumes a rendered template
(ChatML-style role-tagged text), not the raw structs.

Everything here is pure JVM higher-order array expressions
(``transform`` / ``filter`` / ``exists`` / ``forall`` /
``aggregate`` / ``concat_ws``) — map-only, whole-stage codegen, zero
Python, zero shuffle; dedup composes with the engine's existing
operators (``dedup.exact_dedup`` on a rendered or prompt key,
``minhash_lsh_pairs`` for near-dup conversations).

Reference parity: no conversational surface exists in the reference
(`rust/core/proto/ballista.proto`); training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ChatML-ish rendering markers (template="chatml"); "plain" renders
#: "role: content" lines.
_TEMPLATES = ("chatml", "plain")


def _msgs(messages) -> F.Column:
    return F.col(messages) if isinstance(messages, str) else messages


def render_chat(messages="messages", template: str = "chatml") -> F.Column:
    """One training-ready string per conversation.

    ``chatml``: ``<|im_start|>role\\ncontent<|im_end|>`` per turn, joined
    with newlines; ``plain``: ``role: content`` lines.  NULL messages →
    NULL; NULL contents render as empty (gate them out first with
    :func:`is_valid_chat`).
    """
    if template not in _TEMPLATES:
        raise ValueError(f"template must be one of {_TEMPLATES}, got {template!r}")
    m = _msgs(messages)
    if template == "chatml":
        turn = lambda t: F.concat(  # noqa: E731
            F.lit("<|im_start|>"),
            t.getField("role"),
            F.lit("\n"),
            F.coalesce(t.getField("content"), F.lit("")),
            F.lit("<|im_end|>"),
        )
    else:
        turn = lambda t: F.concat(  # noqa: E731
            t.getField("role"),
            F.lit(": "),
            F.coalesce(t.getField("content"), F.lit("")),
        )
    return F.array_join(F.transform(m, turn), "\n")


def chat_stats(messages="messages") -> F.Column:
    """Struct of structural metrics per conversation: ``n_turns``,
    ``n_user``, ``n_assistant``, ``n_empty`` (NULL/blank contents),
    ``first_role``, ``last_role``, ``content_chars``.  One map-only
    expression — feed a threshold filter or the corpus report."""
    m = _msgs(messages)
    role = lambda t: t.getField("role")  # noqa: E731
    blank = lambda t: (  # noqa: E731
        t.getField("content").isNull()
        | (F.trim(t.getField("content")) == "")
    )
    return F.struct(
        F.size(m).alias("n_turns"),
        F.size(F.filter(m, lambda t: role(t) == "user")).alias("n_user"),
        F.size(F.filter(m, lambda t: role(t) == "assistant")).alias("n_assistant"),
        F.size(F.filter(m, blank)).alias("n_empty"),
        F.try_element_at(m, F.lit(1)).getField("role").alias("first_role"),
        F.try_element_at(m, F.lit(-1)).getField("role").alias("last_role"),
        F.aggregate(
            m,
            F.lit(0).cast("bigint"),
            lambda acc, t: acc
            + F.coalesce(F.length(t.getField("content")), F.lit(0)).cast("bigint"),
        ).alias("content_chars"),
    )


def is_valid_chat(
    messages="messages",
    allowed_roles: tuple = ("system", "user", "assistant"),
    require_alternating: bool = True,
    require_assistant_last: bool = True,
) -> F.Column:
    """Boolean structural gate (the standard SFT-ingest checks):

    - non-empty conversation, no NULL/blank contents, roles ∈ allowed;
    - an optional leading ``system`` turn, then user/assistant strictly
      alternating starting with ``user`` (``require_alternating``);
    - the final turn is the assistant's (``require_assistant_last`` —
      a trailing user turn carries no training signal).

    Pure JVM (``forall`` + one ``zip_with`` over the role sequence);
    NULL messages → false.
    """
    m = _msgs(messages)
    role = lambda t: t.getField("role")  # noqa: E731
    ok = (F.size(m) > 0) & F.forall(
        m,
        lambda t: t.getField("content").isNotNull()
        & (F.trim(t.getField("content")) != "")
        & role(t).isin(*allowed_roles),
    )
    # the dialogue body: drop ONE leading system turn if present
    body = F.when(
        F.try_element_at(m, F.lit(1)).getField("role") == "system", F.slice(m, 2, F.size(m))
    ).otherwise(m)
    if require_alternating:
        roles = F.transform(body, role)
        expected = F.transform(
            F.sequence(F.lit(1), F.size(roles)),
            lambda i: F.when(i % 2 == 1, F.lit("user")).otherwise(F.lit("assistant")),
        )
        ok = ok & (F.size(body) > 0) & F.forall(
            F.zip_with(roles, expected, lambda a, b: a == b), lambda x: x
        )
        # no system turns past the first position (body must be system-free)
        ok = ok & ~F.exists(body, lambda t: role(t) == "system")
    if require_assistant_last:
        ok = ok & (F.try_element_at(m, F.lit(-1)).getField("role") == "assistant")
    return F.coalesce(ok, F.lit(False))


def first_user_prompt(messages="messages") -> F.Column:
    """Content of the first ``user`` turn (NULL when none) — the
    standard conversation-dedup key: SFT sets are deduplicated by
    prompt, not by full transcript (answers legitimately vary).
    Compose with ``dedup.exact_dedup(df, text_col=<this>)`` or the
    MinHash operators for near-dup prompts."""
    m = _msgs(messages)
    users = F.filter(m, lambda t: t.getField("role") == "user")
    return F.try_element_at(users, F.lit(1)).getField("content")


def filter_valid_chats(
    df: DataFrame,
    messages_col: str = "messages",
    **kwargs,
) -> DataFrame:
    """Rows passing :func:`is_valid_chat` — the ingest gate."""
    return df.where(is_valid_chat(messages_col, **kwargs))


def assistant_spans(messages="messages", template: str = "chatml") -> F.Column:
    """Array of ``(start, end)`` character offsets (0-based, end
    exclusive) of each ASSISTANT turn's content inside
    :func:`render_chat`'s output — the loss-mask spans SFT training
    needs (loss is computed on assistant tokens only; user/system text
    is context).  ``rendered.substr(start, end-start) == content`` is
    pinned in tests against a Python mirror.

    One JVM ``aggregate`` threading a running offset through the turn
    array — map-only, like everything in this module.
    """
    if template not in _TEMPLATES:
        raise ValueError(f"template must be one of {_TEMPLATES}, got {template!r}")
    m = _msgs(messages)
    role_len = lambda t: F.length(t.getField("role"))  # noqa: E731
    content_len = lambda t: F.coalesce(  # noqa: E731
        F.length(t.getField("content")), F.lit(0)
    )
    if template == "chatml":
        # "<|im_start|>" (12) + role + "\n" (1) + content + "<|im_end|>" (10)
        pre = lambda t: F.lit(12) + role_len(t) + F.lit(1)  # noqa: E731
        post = F.lit(10)
    else:
        pre = lambda t: role_len(t) + F.lit(2)  # "role: "  # noqa: E731
        post = F.lit(0)
    zero = F.struct(
        F.lit(0).cast("bigint").alias("off"),
        F.array().cast("array<struct<start bigint, end bigint>>").alias("spans"),
    )

    def step(acc, t):
        start = acc.getField("off") + pre(t).cast("bigint")
        end = start + content_len(t).cast("bigint")
        next_off = end + post.cast("bigint") + F.lit(1).cast("bigint")  # "\n" joiner
        span = F.struct(start.alias("start"), end.alias("end"))
        return F.struct(
            next_off.alias("off"),
            F.when(
                t.getField("role") == "assistant",
                F.concat(acc.getField("spans"), F.array(span)),
            )
            .otherwise(acc.getField("spans"))
            .alias("spans"),
        )

    return F.aggregate(m, zero, step, lambda acc: acc.getField("spans"))


def redact_chat_pii(messages="messages", patterns: dict | None = None) -> F.Column:
    """The conversation with every turn's content passed through
    ``text.redact_pii`` (emails/phones/IPs → ``<CATEGORY>`` markers),
    roles untouched — SFT data needs the same scrub as pretraining text,
    per turn.  One ``transform`` wrapping the same pure-JVM
    ``regexp_replace`` chain; NULL contents stay NULL."""
    from ballista_spark.operators.text import redact_pii

    m = _msgs(messages)
    return F.transform(
        m,
        lambda t: F.struct(
            t.getField("role").alias("role"),
            F.when(
                t.getField("content").isNull(), F.lit(None).cast("string")
            )
            .otherwise(redact_pii(t.getField("content"), patterns))
            .alias("content"),
        ),
    )
