"""Math/codegen eval drivers + results DB (eval/code_math.py, eval/results_db.py).

Parity targets: reference tasks/{math_eval,codegen}.py answer extraction and
normalization semantics, the HumanEval functional-correctness protocol, and
db_utils' model/dataset/eval_count bookkeeping.
"""

import math

import pytest

from dreamllm_tpu.eval.code_math import (
    check_correctness,
    extract_code,
    extract_final_answer,
    gsm8k_gold_answer,
    math_equiv,
    minimum_code,
    normalize_final_answer,
    pass_at_k,
    render_gsm8k_prompt,
    render_math_prompt,
    run_gsm8k,
    run_humaneval,
    run_math,
    smoke_gsm8k,
    smoke_humaneval,
    smoke_math,
    truncate_completion,
)
from dreamllm_tpu.eval.results_db import ResultsDB


# ---------------------------------------------------------------------------
# Answer normalization / extraction
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("raw,expect", [
    ("x = 42", "42"),                       # keep RHS of =
    ("\\boxed{17}", "17"),                  # unwrap \boxed
    ("$\\frac{1}{2}$", "\\frac{1}{2}"),     # strip $
    ("100,000", "100000"),                  # drop thousands separators
    ("\\text{meters}", ""),                 # unit words removed
    ("10 square units", "10"),
])
def test_normalize_final_answer(raw, expect):
    assert normalize_final_answer(raw) == expect


@pytest.mark.parametrize("text,expect", [
    ("Therefore the final answer is 25.", "25"),
    ("The final answer is $\\frac{3}{4}$.", "\\frac{3}{4}"),
    ("so we get \\boxed{12} done", "12"),
    ("the result is 7 then 9", "9"),        # last-number fallback
    # nested braces inside \boxed (MATH gold format) must not truncate
    ("thus $\\boxed{\\frac{7}{2}}$", "\\frac{7}{2}"),
    ("$\\boxed{2\\sqrt{3}}$.", "2\\sqrt{3}"),
])
def test_extract_final_answer(text, expect):
    assert extract_final_answer(text) == expect


def test_math_gold_with_braced_boxed_is_winnable():
    rows = [{"problem": "Half of 7?", "solution":
             "It is $\\boxed{\\frac{7}{2}}$.", "type": "Algebra", "level": "Level 1"}]
    out = run_math(lambda p: p + "The final answer is 3.5.", rows)
    assert out["accuracy"] == 1.0


def test_math_equiv():
    assert math_equiv("25", "25")
    assert math_equiv("1/2", "0.5")                     # numeric fraction
    assert math_equiv("\\frac{1}{2}", "0.5")            # latex fraction
    assert math_equiv("100,000", "100000")
    assert math_equiv("$3$", "3")
    assert not math_equiv("24", "25")
    assert not math_equiv("", "5")


def test_gsm8k_gold():
    assert gsm8k_gold_answer("blah <<3*4=12>>12. #### 12") == "12"
    assert gsm8k_gold_answer("#### 1,234") == "1234"


# ---------------------------------------------------------------------------
# Math / GSM8K drivers with a scripted model
# ---------------------------------------------------------------------------


def test_run_math_scripted(tmp_path):
    rows = smoke_math()

    def fake_generate(prompt):
        # answer the first correctly, the second wrong
        if "2 + 3" in prompt:
            return prompt + "Adding gives 5. The final answer is 5."
        return prompt + "It is 3. The final answer is 3."

    out = run_math(fake_generate, rows, out_path=str(tmp_path / "math.json"))
    assert out["accuracy"] == 0.5
    assert out["by_type"]["Prealgebra"] == 0.5
    assert out["by_level"] == {"1": 1.0, "2": 0.0}


def test_run_math_majority_vote():
    calls = {"n": 0}

    def flaky(prompt):
        calls["n"] += 1
        # 2 of 3 votes say 5, one says 7
        ans = "5" if calls["n"] % 3 else "7"
        return prompt + f"The final answer is {ans}."

    rows = [smoke_math()[0]]
    out = run_math(flaky, rows, votes=3)
    assert out["accuracy"] == 1.0
    assert calls["n"] == 3


def test_run_gsm8k_scripted():
    def fake_generate(prompt):
        if "apples" in prompt.rsplit("Question:", 1)[-1]:
            return prompt + " 3 * 4 = 12. The final answer is 12."
        return prompt + " 5 * 2 = 10. The final answer is 10."

    out = run_gsm8k(fake_generate, smoke_gsm8k())
    assert out["accuracy"] == 1.0


def test_prompts_end_with_cue():
    assert render_math_prompt("P?").endswith("Solution:\n")
    assert render_gsm8k_prompt("Q?").endswith("Answer:")


# ---------------------------------------------------------------------------
# Codegen: extraction, exec harness, pass@k
# ---------------------------------------------------------------------------


def test_minimum_code_repairs_truncation():
    broken = "def f(x):\n    return x + 1\n\ndef g(y:"
    fixed = minimum_code(broken)
    assert "def f" in fixed and "def g" not in fixed


def test_extract_code_markdown():
    text = "Here you go:\n```python\ndef f():\n    return 1\n```\n"
    assert extract_code(text, markdown=True).startswith("def f")


def test_truncate_completion_stops_at_toplevel():
    comp = "    return a + b\n\nprint(add(1, 2))\n"
    assert "print" not in truncate_completion(comp)


def test_check_correctness():
    ok, _ = check_correctness("assert 1 + 1 == 2\n")
    assert ok
    bad, err = check_correctness("assert 1 + 1 == 3\n")
    assert not bad and "AssertionError" in err
    slow, err = check_correctness(
        "import time\ntime.sleep(30)\n", timeout=1.0
    )
    assert not slow and err == "timeout"


def test_pass_at_k_estimator():
    assert pass_at_k(1, 1, 1) == 1.0
    assert pass_at_k(1, 0, 1) == 0.0
    # n=2, c=1, k=1 -> 0.5
    assert math.isclose(pass_at_k(2, 1, 1), 0.5)
    # n=10, c=3, k=5 -> 1 - C(7,5)/C(10,5) = 1 - 21/252
    assert math.isclose(pass_at_k(10, 3, 5), 1 - 21 / 252)


def test_run_humaneval_scripted(tmp_path):
    def fake_generate(prompt):
        if "add" in prompt:
            return prompt + "    return a + b\n"
        return prompt + "    return x + 3\n"  # wrong double()

    out = run_humaneval(
        fake_generate, smoke_humaneval(), out_path=str(tmp_path / "he.json")
    )
    assert out["pass@1"] == 0.5
    assert out["n"] == 2


def test_run_humaneval_full_rewrite():
    # model re-emits the whole function (markdown-less full def): the rewrite
    # replaces prompt+completion concatenation
    def fake_generate(prompt):
        return prompt + "    pass\n\ndef add(a, b):\n    return a + b\n"

    out = run_humaneval(fake_generate, smoke_humaneval()[:1])
    assert out["pass@1"] == 1.0


def test_run_humaneval_rewrite_keeps_prompt_preamble():
    # HumanEval prompts open with imports; a full rewrite must not drop them
    prob = {
        "task_id": "Pre/0",
        "prompt": 'from typing import List\n\n\ndef first(xs: List[int]) -> int:\n'
                  '    """Return the first element."""\n',
        "test": "def check(candidate):\n    assert candidate([3, 1]) == 3\n",
        "entry_point": "first",
    }

    def fake_generate(prompt):
        return prompt + ("    pass\n\ndef first(xs: List[int]) -> int:\n"
                         "    return xs[0]\n")

    out = run_humaneval(fake_generate, [prob])
    assert out["pass@1"] == 1.0


def test_check_correctness_kills_grandchildren():
    import subprocess
    import time as _time

    marker = f"cm_orphan_{id(object())}"
    prog = (
        "import subprocess, time\n"
        f"subprocess.Popen(['sleep', '60'], env={{'ORPHAN': '{marker}'}})\n"
        "time.sleep(60)\n"
    )
    ok, err = check_correctness(prog, timeout=1.5)
    assert not ok and err == "timeout"
    _time.sleep(0.3)
    out = subprocess.run(
        ["ps", "axe"], capture_output=True, text=True
    ).stdout
    assert marker not in out, "grandchild survived the timeout kill"


# ---------------------------------------------------------------------------
# Results DB
# ---------------------------------------------------------------------------


def test_results_db_roundtrip(tmp_path):
    path = str(tmp_path / "eval.sqlite")
    with ResultsDB(path) as db:
        c1 = db.record("model-a", "mmlu", {"accuracy": 0.5}, n=100)
        c2 = db.record("model-a", "mmlu", {"accuracy": 0.6}, n=100)
        db.record("model-b", "mmlu", {"accuracy": 0.4}, n=100)
        assert (c1, c2) == (1, 2)
        assert db.latest("model-a", "mmlu")["accuracy"] == 0.6
        assert db.history("model-a", "mmlu") == [(1, 0.5), (2, 0.6)]
        table = db.compare()
        assert "model-a" in table and "0.6000" in table and "0.4000" in table

    # persistence across connections
    with ResultsDB(path) as db:
        assert db.latest("model-b", "mmlu")["accuracy"] == 0.4


def test_results_db_mirrors(tmp_path):
    """record() pushes one flat row per run to every mirror; a failing
    mirror is logged, never raised (reference swallows redis errors the
    same way, db_utils.py)."""
    import json

    from dreamllm_tpu.eval.results_db import JsonlMirror, MetricsMirror

    class Boom(MetricsMirror):
        def push(self, row):
            raise RuntimeError("mirror down")

    jl = JsonlMirror(str(tmp_path / "mirror" / "runs.jsonl"))
    with ResultsDB(str(tmp_path / "m.sqlite"), mirrors=[jl, Boom()]) as db:
        db.record("model-a", "mmlu", {"accuracy": 0.5, "note": "str dropped"}, n=10)
        db.record("model-a", "mmlu", {"accuracy": 0.7}, n=10)
        # sqlite store unaffected by the failing mirror
        assert db.latest("model-a", "mmlu")["accuracy"] == 0.7

    rows = [json.loads(l) for l in open(jl.path)]
    assert [r["eval_count"] for r in rows] == [1, 2]
    assert rows[0]["metrics"] == {"accuracy": 0.5}  # non-numeric filtered
    assert rows[1]["model"] == "model-a" and rows[1]["n"] == 10


def test_results_db_dashboard_html(tmp_path):
    from dreamllm_tpu.eval.results_db import export_dashboard_html

    with ResultsDB(str(tmp_path / "d.sqlite")) as db:
        db.record("m<1>", "mmlu", {"accuracy": 0.41}, n=5)
        db.record("m<1>", "mmlu", {"accuracy": 0.52}, n=5)
        db.record("m<1>", "gsm8k", {"accuracy": 0.33}, n=5)
        db.record("m2", "mmlu", {"accuracy": 0.61}, n=5)
        out = export_dashboard_html(db, str(tmp_path / "dash" / "index.html"))
    doc = open(out).read()
    assert "m&lt;1&gt;" in doc and "m2" in doc            # names escaped
    assert "0.5200" in doc and "0.6100" in doc            # latest per cell
    assert "0.41" in doc                                   # history trend shown
    assert doc.count("<td class='na'>") == 1               # m2 has no gsm8k


def test_results_db_record_result(tmp_path):
    with ResultsDB(str(tmp_path / "e.sqlite")) as db:
        db.record_result("m", {
            "task": "math", "accuracy": 0.5, "n": 2,
            "by_level": {"1": 1.0}, "by_type": {"Algebra": 0.0},
        })
        got = db.latest("m", "math")
        assert got["accuracy"] == 0.5
        assert got["level/1"] == 1.0
        assert got["type/Algebra"] == 0.0
