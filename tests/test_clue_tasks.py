"""Chinese QA tail of BASE_TASKS (eval/language.py: clue_c3/wsc/cmrc, xtreme).

Parity targets: reference evaluator_utils.normalize_answer_cn + the
concat-logprob / short-generation-CN evaluators.
"""

import pytest

from dreamllm_tpu.eval.language import (
    MC_TASK_RENDERERS,
    cn_em_include_f1,
    normalize_answer_cn,
    run_gen_qa_cn,
    run_mc_task,
)


@pytest.mark.parametrize("raw,expect", [
    ("北京。", "北京"),
    ("北 京", "北京"),
    ("《红楼梦》", "红楼梦"),
    ("hello_world!", "helloworld"),
    ("答案，是？", "答案是"),
])
def test_normalize_answer_cn(raw, expect):
    assert normalize_answer_cn(raw) == expect


def test_cn_em_include_f1():
    em, inc, f1 = cn_em_include_f1("北京", ["北京"])
    assert (em, inc, f1) == (1.0, 1.0, 1.0)
    em, inc, f1 = cn_em_include_f1("是北京市", ["北京"])
    assert em == 0.0 and inc == 1.0 and 0 < f1 < 1
    em, inc, f1 = cn_em_include_f1("上海", ["北京"])
    assert em == 0.0 and inc == 0.0 and f1 == 0.0
    # multiple golds: best one counts
    em, _, _ = cn_em_include_f1("南京", ["北京", "南京"])
    assert em == 1.0


def test_run_gen_qa_cn_scripted(tmp_path):
    rows = [
        {"context": "故宫在北京。", "question": "故宫在哪里？", "answers": ["北京"]},
        {"context": "长江很长。", "question": "哪条江很长？",
         "answers": {"text": ["长江"]}},  # SQuAD-style gold dict
    ]

    def fake_generate(prompt):
        if "故宫" in prompt:
            return prompt + "北京。\n问题：下一个"
        return prompt + "黄河"

    out = run_gen_qa_cn(fake_generate, "clue_cmrc", rows,
                        out_path=str(tmp_path / "cmrc.json"))
    assert out["em"] == 0.5 and out["include"] == 0.5
    assert 0 < out["f1"] <= 1


def test_clue_c3_renderer():
    ctx, conts, idx = MC_TASK_RENDERERS["clue_c3"]({
        "context": ["男：你好。", "女：你好。"],
        "question": "他们在做什么？",
        "choice": ["打招呼", "吵架", "吃饭"],
        "answer": "打招呼",
    })
    assert "问题：" in ctx and len(conts) == 3 and idx == 0
    # integer label form
    _, _, idx2 = MC_TASK_RENDERERS["clue_c3"]({
        "context": "文本", "question": "q", "choices": ["a", "b"], "label": 1,
    })
    assert idx2 == 1


def test_clue_wsc_span2_index_targets_right_occurrence():
    # pronoun string occurs BEFORE the queried occurrence: substitution must
    # target span2_index, not the first match
    row = {
        "text": "他走后，小明告诉小红他赢了。",
        "target": {"span1_text": "小明", "span2_text": "他", "span2_index": 10},
        "label": 0,
    }
    _, conts, _ = MC_TASK_RENDERERS["clue_wsc"](row)
    assert "他走后，小明告诉小红小明赢了" in conts[0]


def test_clue_c3_answer_whitespace_drift():
    _, _, idx = MC_TASK_RENDERERS["clue_c3"]({
        "context": "文", "question": "q",
        "choice": ["打 招呼", "吵架"], "answer": "打招呼。",
    })
    assert idx == 0


def test_run_mc_task_skips_malformed_rows():
    rows = [
        {"context": "文", "question": "q", "choice": ["a", "b"], "answer": "a"},
        {"context": "文", "question": "q", "choice": ["a", "b"], "answer": "zzz"},
    ]
    out = run_mc_task(lambda c, conts: 0, "clue_c3", rows)
    assert out["skipped"] == 1 and out["n"] == 1 and out["accuracy"] == 1.0


def test_clue_wsc_renderer_and_scoring():
    row = {
        "text": "小明告诉小红他赢了。",
        "target": {"span1_text": "小明", "span2_text": "他"},
        "label": "true",
    }
    ctx, conts, idx = MC_TASK_RENDERERS["clue_wsc"](row)
    assert idx == 0 and "小明告诉小红小明赢了" in conts[0]
    # scripted scorer that prefers the substituted reading
    out = run_mc_task(lambda c, conts: 0, "clue_wsc", [row])
    assert out["accuracy"] == 1.0
