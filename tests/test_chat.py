"""Chat/SFT operators: rendering known answers, structural-gate truth
table, prompt-dedup composition, map-only plan gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.chat import (
    chat_stats,
    filter_valid_chats,
    first_user_prompt,
    is_valid_chat,
    render_chat,
)

SCHEMA = "doc_id long, messages array<struct<role string, content string>>"


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


GOOD = [("user", "hi"), ("assistant", "hello")]
GOOD_SYS = [("system", "be nice"), ("user", "hi"), ("assistant", "hello")]


def test_render_chatml_known_answer(spark):
    df = _mk(spark, [(0, GOOD)])
    [r] = df.select(render_chat("messages").alias("t")).collect()
    assert r.t == (
        "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\nhello<|im_end|>"
    )


def test_render_plain_and_null_content(spark):
    df = _mk(spark, [(0, [("user", None), ("assistant", "ok")]), (1, None)])
    got = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", render_chat("messages", "plain").alias("t")
        ).collect()
    }
    assert got[0] == "user: \nassistant: ok"
    assert got[1] is None


def test_render_rejects_unknown_template(spark):
    with pytest.raises(ValueError, match="template"):
        render_chat("messages", "jinja")


def test_stats(spark):
    df = _mk(spark, [(0, [("system", "s"), ("user", "hi"), ("assistant", " "),
                          ("user", "more")])])
    [r] = df.select(chat_stats("messages").alias("s")).collect()
    s = r.s
    assert (s.n_turns, s.n_user, s.n_assistant, s.n_empty) == (4, 2, 1, 1)
    assert (s.first_role, s.last_role) == ("system", "user")
    assert s.content_chars == 1 + 2 + 1 + 4


VALID_CASES = [
    (GOOD, True),
    (GOOD_SYS, True),
    ([("user", "a"), ("assistant", "b"), ("user", "c"), ("assistant", "d")], True),
    ([], False),  # empty
    ([("user", "hi")], False),  # no assistant last
    ([("assistant", "hi")], False),  # starts with assistant
    ([("user", "hi"), ("assistant", "")], False),  # blank content
    ([("user", "hi"), ("assistant", None)], False),  # NULL content
    ([("user", "a"), ("user", "b"), ("assistant", "c")], False),  # not alternating
    ([("system", "s"), ("system", "s2"), ("user", "a"), ("assistant", "b")], False),
    ([("tool", "x"), ("assistant", "y")], False),  # role outside allowed
    (None, False),  # NULL conversation
]


def test_valid_gate_truth_table(spark):
    df = _mk(spark, [(i, m) for i, (m, _) in enumerate(VALID_CASES)])
    got = {
        r.doc_id: r.ok
        for r in df.select("doc_id", is_valid_chat("messages").alias("ok")).collect()
    }
    for i, (msgs, want) in enumerate(VALID_CASES):
        assert got[i] == want, f"case {i}: {msgs}"
    kept = {r.doc_id for r in filter_valid_chats(df).collect()}
    assert kept == {i for i, (_, w) in enumerate(VALID_CASES) if w}


def test_relaxed_gate_options(spark):
    trailing_user = [("user", "a"), ("assistant", "b"), ("user", "c")]
    df = _mk(spark, [(0, trailing_user)])
    assert not df.select(is_valid_chat("messages").alias("ok")).collect()[0].ok
    assert df.select(
        is_valid_chat("messages", require_assistant_last=False).alias("ok")
    ).collect()[0].ok
    tool_chat = [("user", "a"), ("tool", "t"), ("assistant", "b")]
    df2 = _mk(spark, [(0, tool_chat)])
    ok = df2.select(
        is_valid_chat(
            "messages",
            allowed_roles=("user", "assistant", "tool"),
            require_alternating=False,
        ).alias("ok")
    ).collect()[0].ok
    assert ok


def test_prompt_dedup_composition(spark):
    from ballista_spark.operators.dedup import exact_dedup

    rows = [
        (0, [("user", "same prompt"), ("assistant", "answer A")]),
        (1, [("user", "same prompt"), ("assistant", "answer B")]),
        (2, [("user", "other prompt"), ("assistant", "answer C")]),
        (3, [("assistant", "no user turn")]),
    ]
    df = _mk(spark, rows).withColumn("prompt", first_user_prompt("messages"))
    got = {r.doc_id: r.prompt for r in df.collect()}
    assert got[0] == "same prompt" and got[3] is None
    flagged = exact_dedup(df.where("prompt is not null"), text_col="prompt",
                          key_col="doc_id")
    kept = {r.doc_id for r in flagged.where("is_canonical").collect()}
    assert kept == {0, 2}


def test_plan_is_pure_jvm_map_only(spark):
    df = _mk(spark, [(0, GOOD)])
    out = df.select(
        render_chat("messages").alias("t"),
        chat_stats("messages").alias("s"),
        is_valid_chat("messages").alias("ok"),
        first_user_prompt("messages").alias("p"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def py_assistant_spans(msgs, template="chatml"):
    """Python mirror: render and record assistant content offsets."""
    spans, off = [], 0
    for i, (role, content) in enumerate(msgs):
        c = content or ""
        if template == "chatml":
            pre, post = 12 + len(role) + 1, 10
        else:
            pre, post = len(role) + 2, 0
        start = off + pre
        end = start + len(c)
        if role == "assistant":
            spans.append((start, end))
        off = end + post + 1  # "\n" joiner
    return spans


@pytest.mark.parametrize("template", ["chatml", "plain"])
def test_assistant_spans_match_rendered_text(spark, template):
    from ballista_spark.operators.chat import assistant_spans

    rows = [
        (0, GOOD),
        (1, GOOD_SYS),
        (2, [("user", "a"), ("assistant", "b"), ("user", "cc"),
             ("assistant", "dddd")]),
        (3, [("user", "only user")]),
    ]
    df = _mk(spark, rows)
    out = df.select(
        "doc_id",
        render_chat("messages", template).alias("t"),
        assistant_spans("messages", template).alias("spans"),
    ).collect()
    by_id = {r.doc_id: r for r in out}
    for doc_id, msgs in rows:
        r = by_id[doc_id]
        got = [(s.start, s.end) for s in r.spans]
        assert got == py_assistant_spans(msgs, template), (doc_id, template)
        # every span slices the rendered text back to the turn content
        contents = [c for role, c in msgs if role == "assistant"]
        for (s, e), want in zip(got, contents):
            assert r.t[s:e] == want


def test_redact_chat_pii(spark):
    from ballista_spark.operators.chat import redact_chat_pii

    df = _mk(spark, [(0, [("user", "mail me at bob@x.com"),
                          ("assistant", "ok, noted"),
                          ("system", None)])])
    [r] = df.select(redact_chat_pii("messages").alias("m")).collect()
    assert [t.content for t in r.m] == ["mail me at <EMAIL>", "ok, noted", None]
    assert [t.role for t in r.m] == ["user", "assistant", "system"]
