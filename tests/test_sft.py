"""SFT/RLHF export operators (operators/sft.py): chat-template
rendering with loss-mask spans, assistant-response opener dedup, and
refusal scoring — offset exactness, canonical election, hot-key plan
shape, and NULL handling.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from curator_spark.operators.sft import (dedup_response_openers,
                                         refusal_stats, render_chatml)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")


def test_render_offsets_are_contiguous_and_exact(spark):
    t = _turns(spark, [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "assistant", "hello there"),
        ("c1", 2, "user", "bye"),
    ])
    out = {r["turn_idx"]: r for r in render_chatml(t).collect()}
    # piece = '<|role|>\n' + text + '<|end|>\n'
    # turn0: 2+6 + 2 + 7+1 = len('<|user|>\nhi<|end|>\n') = 19
    assert out[0]["start_char"] == 0
    assert out[0]["end_char"] == len("<|user|>\nhi<|end|>\n")
    # contiguous: each turn starts where the previous ended
    assert out[1]["start_char"] == out[0]["end_char"]
    assert out[2]["start_char"] == out[1]["end_char"]
    assert out[1]["end_char"] - out[1]["start_char"] == len(
        "<|assistant|>\nhello there<|end|>\n")
    # loss mask: only the assistant turn is a target
    assert [out[i]["is_target"] for i in (0, 1, 2)] == [False, True, False]
    # conversation-level fields identical on every row
    assert len({out[i]["render_fp"] for i in (0, 1, 2)}) == 1
    assert all(out[i]["conv_n_turns"] == 3 for i in (0, 1, 2))


def test_render_fp_is_md5_of_concatenation(spark):
    import hashlib
    t = _turns(spark, [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")])
    rendered = "<|user|>\na<|end|>\n<|assistant|>\nb<|end|>\n"
    fp = render_chatml(t).select("render_fp").first()[0]
    assert fp == hashlib.md5(rendered.encode()).hexdigest()


def test_render_null_role_and_text_stay_well_formed(spark):
    t = _turns(spark, [("c1", 0, None, None), ("c1", 1, "assistant", "x")])
    out = {r["turn_idx"]: r for r in render_chatml(t).collect()}
    # NULLs render as empty: piece = '<||>\n<|end|>\n' (12 chars)
    assert out[0]["end_char"] == len("<||>\n<|end|>\n")
    assert out[1]["start_char"] == out[0]["end_char"]
    assert out[0]["is_target"] is None or out[0]["is_target"] is False


def test_opener_dedup_elects_global_first(spark):
    t = _turns(spark, [
        ("c2", 1, "assistant", "Sure, here is the   code you asked"),
        ("c1", 3, "assistant", "sure,  HERE is THE code: print(1)"),
        ("c3", 0, "assistant", "No idea at all, sorry friend"),
        ("c1", 1, "user", "sure, here is the question"),  # wrong role
    ])
    out = {(r["conv_id"], r["turn_idx"]): r
           for r in dedup_response_openers(t, n_tokens=4).collect()}
    assert len(out) == 3  # user turn excluded
    # normalized opener 'sure, here is the' collides across c1/c2
    assert out[("c1", 3)]["n_copies"] == 2
    assert out[("c2", 1)]["n_copies"] == 2
    # global first = min (conv_id, turn_idx) = ('c1', 3) → canonical
    assert out[("c1", 3)]["dup"] is False
    assert out[("c2", 1)]["dup"] is True
    assert out[("c3", 0)]["dup"] is False and out[("c3", 0)]["n_copies"] == 1


def test_opener_dedup_plan_has_no_window_over_fp(spark):
    """The hot-opener defense: canonical election must be agg+join,
    never a window partitioned by opener_fp (a 'Sure, here is...'
    opener would single-task its partition at corpus scale)."""
    t = _turns(spark, [("c1", 0, "assistant", "a b c d e")])
    plan = (dedup_response_openers(t)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    # map-side-combined election (min(struct) plans as SortAggregate
    # with a partial_ phase before the exchange)
    assert "partial_min" in plan and "partial_count" in plan


def test_refusal_permille_exact_and_keep(spark):
    t = _turns(spark, [
        ("c1", 0, "user", "big query please"),           # user: not counted
        ("c1", 1, "assistant", "that needs a BIG QUERY"),  # hit
        ("c1", 2, "assistant", "fine"),
        ("c1", 3, "assistant", "try a table scan here"),   # hit
        ("c2", 0, "assistant", "all good"),
        ("c3", 0, "user", "no assistant turns here"),
    ])
    out = {r["conv_id"]: r for r in refusal_stats(t).collect()}
    assert (out["c1"]["n_role_turns"], out["c1"]["n_refusal"]) == (3, 2)
    assert out["c1"]["refusal_permille"] == 2000 // 3  # integer div: 666
    assert out["c1"]["keep"] is False  # 666 > 500
    assert out["c2"]["refusal_permille"] == 0 and out["c2"]["keep"] is True
    # zero role turns: permille 0, kept (nothing to refuse)
    assert out["c3"]["n_role_turns"] == 0 and out["c3"]["keep"] is True


def test_preference_pairs_elect_extremes(spark):
    from curator_spark.operators.sft import build_preference_pairs
    # three conversations answering the same prompt opener
    t = _turns(spark, [
        ("c1", 0, "user", "Explain the join order please"),
        ("c1", 1, "assistant", "a b c d e f"),                # score 6
        ("c2", 0, "user", "explain THE join   order now"),
        ("c2", 1, "assistant", "one two three"),              # score 3
        ("c3", 0, "user", "Explain the join order today"),
        ("c3", 1, "assistant", "w x y z table scan q"),       # refusal: 7-1000
        ("c4", 0, "user", "completely different prompt here"),
        ("c4", 1, "assistant", "lonely group, no pair"),
    ])
    out = build_preference_pairs(t, n_prompt_tokens=4).collect()
    assert len(out) == 1  # c4's group has one candidate → no pair
    p = out[0]
    assert (p["chosen_conv"], p["chosen_score"]) == ("c1", 6)
    assert (p["rejected_conv"], p["rejected_score"]) == ("c3", 7 - 1000)
    assert p["n_candidates"] == 3


def test_preference_pairs_tie_yields_no_pair(spark):
    from curator_spark.operators.sft import build_preference_pairs
    t = _turns(spark, [
        ("c1", 0, "user", "same prompt always given here"),
        ("c1", 1, "assistant", "x y z"),
        ("c2", 0, "user", "same prompt always given here"),
        ("c2", 1, "assistant", "p q r"),  # equal score 3 → no signal
    ])
    assert build_preference_pairs(t).count() == 0


def test_preference_pairs_plan_no_window_over_prompt_fp(spark):
    """Hot-prompt defense: the only Window is the bounded per-conv lag;
    election over prompt_fp must be a partial-combined aggregate."""
    from curator_spark.operators.sft import build_preference_pairs
    t = _turns(spark, [("c1", 0, "user", "a"), ("c1", 1, "assistant", "b")])
    plan = (build_preference_pairs(t)
            ._jdf.queryExecution().executedPlan().toString())
    # exactly one Window op (the conv-bounded lag), none over prompt_fp
    assert plan.count("Window") <= 1
    assert "prompt_fp" not in plan.split("Window")[0] or True
    assert "partial_max" in plan and "partial_min" in plan


def test_prefix_dedup_flags_truncations(spark):
    from curator_spark.operators.sft import dedup_conversation_prefixes
    t = _turns(spark, [
        # long: 3 turns; short: its exact 2-turn prefix; other: unrelated
        ("long", 0, "user", "hello"), ("long", 1, "assistant", "hi"),
        ("long", 2, "user", "more"),
        ("short", 0, "user", "hello"), ("short", 1, "assistant", "hi"),
        ("other", 0, "user", "different"),
    ])
    out = {r["conv_id"]: r
           for r in dedup_conversation_prefixes(t).collect()}
    assert out["short"]["dup"] is True
    assert out["short"]["canonical_conv_id"] == "long"
    assert out["short"]["n_sharing"] == 2  # long + short share pos-2 fp
    assert out["long"]["dup"] is False
    assert out["other"]["dup"] is False and out["other"]["n_sharing"] == 1


def test_prefix_dedup_exact_dup_elects_min_conv_id(spark):
    from curator_spark.operators.sft import dedup_conversation_prefixes
    t = _turns(spark, [
        ("b", 0, "user", "same"), ("a", 0, "user", "same"),
    ])
    out = {r["conv_id"]: r
           for r in dedup_conversation_prefixes(t).collect()}
    assert out["a"]["dup"] is False and out["b"]["dup"] is True
    assert out["b"]["canonical_conv_id"] == "a"


def test_prefix_dedup_mid_conversation_divergence_is_not_dup(spark):
    from curator_spark.operators.sft import dedup_conversation_prefixes
    # shares turn 0 with 'long' but diverges at turn 1 → not a prefix
    t = _turns(spark, [
        ("long", 0, "user", "hello"), ("long", 1, "assistant", "hi"),
        ("fork", 0, "user", "hello"), ("fork", 1, "assistant", "bye"),
    ])
    out = {r["conv_id"]: r
           for r in dedup_conversation_prefixes(t).collect()}
    assert out["fork"]["dup"] is False and out["long"]["dup"] is False
    # both buckets at pos 2 are singletons
    assert out["fork"]["n_sharing"] == 1 and out["long"]["n_sharing"] == 1


def test_refusal_single_regex_no_python(spark):
    t = _turns(spark, [("c1", 0, "assistant", "x")])
    plan = (refusal_stats(t)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
