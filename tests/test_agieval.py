"""AGIEval driver (eval/agieval.py) — answer extraction, templates, scoring.

Parity target: reference agi_utils.get_post_process/get_metrics +
agi_prompt templates + agieval_post_metrics average.
"""

import json

import pytest

from dreamllm_tpu.eval.agieval import (
    extract_agieval_answer,
    load_agieval,
    render_agieval_prompt,
    run_agieval,
    smoke_agieval,
)


@pytest.mark.parametrize("gen,subset,expect", [
    ("The answer is B.", None, "B"),
    (" C", None, "C"),
    ("答案是 A", None, "A"),
    ("I think (D) is right", None, "D"),
    ("no letter here", None, ""),
    ("Both A and C apply", "gaokao_physics", "A,C"),
    # multi-select: order- and duplicate-insensitive (answer SETS)
    ("C 和 A 都对", "gaokao_physics", "A,C"),
    ("A对，A是矢量，C也对", "gaokao_physics", "A,C"),
    ("The answer is therefore 42", "math", "42"),
    # first paragraph only
    ("A\n\nB is also tempting", None, "A"),
    # lowercase / embedded letters don't count
    ("a banana", None, ""),
])
def test_extract_agieval_answer(gen, subset, expect):
    assert extract_agieval_answer(gen, subset) == expect


def test_render_templates():
    en = render_agieval_prompt("sat_math", {"question": "Q?", "options": ["(A)1", "(B)2"]})
    assert "Choose from the following options" in en and en.endswith("The answer is")
    zh = render_agieval_prompt("gaokao_biology", {"question": "问?", "options": ["(A)x"]})
    assert "从以下选项中选择" in zh and zh.endswith("答案是")
    cloze = render_agieval_prompt("math", {"question": "Compute 2+2."})
    assert cloze.endswith("Answer:")


def test_run_agieval_scripted(tmp_path):
    def fake_generate(prompt):
        if "x + 2 = 5" in prompt:
            return " B"
        if "10%" in prompt:
            return " The answer is C"
        if "矢量" in prompt:
            return " A和C"
        if "2 \\cdot 7" in prompt:
            return " The answer is therefore 14"
        return " Z"

    out = run_agieval(
        fake_generate, smoke_agieval(), out_path=str(tmp_path / "agi.json")
    )
    assert out["accuracy"] == 1.0
    assert out["by_subset"]["sat_math"] == 1.0
    assert out["by_subset"]["gaokao_physics"] == 1.0
    assert out["by_subset"]["math"] == 1.0
    # average over subsets (agieval_post_metrics)
    assert out["average"] == 1.0
    saved = json.loads((tmp_path / "agi.json").read_text())
    assert saved["n"] == 4


def test_multiselect_gold_string_forms():
    # dataset golds appear as lists, 'AC', or 'C,A' — all one answer set
    for gold in (["A", "C"], ["C", "A"], "AC", "CA", "A,C"):
        row = {"question": "q", "options": ["(A)x", "(B)y", "(C)z"], "label": gold}
        out = run_agieval(lambda p: " C和A", {"gaokao_physics": [row]})
        assert out["accuracy"] == 1.0, gold


def test_run_agieval_wrong_and_empty():
    def bad_generate(prompt):
        return " nothing useful"

    out = run_agieval(bad_generate, {"sat_math": smoke_agieval()["sat_math"]})
    assert out["accuracy"] == 0.0


def test_load_agieval_layout(tmp_path):
    rows = [{"question": "q", "options": ["(A)1"], "label": "A"}]
    (tmp_path / "sat-math.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows)
    )
    loaded = load_agieval(str(tmp_path), ["sat_math"])
    assert loaded == {"sat_math": rows}
    # missing explicit subset -> hard error
    with pytest.raises(FileNotFoundError):
        load_agieval(str(tmp_path), ["lsat_ar"])
    # auto-discovery skips absent subsets
    assert "sat_math" in load_agieval(str(tmp_path))
