"""C-Eval/CMMLU csv loader (eval/language.load_ceval_csv)."""

import pytest

from dreamllm_tpu.eval.language import load_ceval_csv, run_mmlu


def _write(tmp_path, name, header, rows):
    lines = [",".join(header)] + [",".join(str(c) for c in r) for r in rows]
    (tmp_path / name).write_text("\n".join(lines))


def test_load_ceval_split_dir(tmp_path):
    d = tmp_path / "val"
    d.mkdir()
    _write(tmp_path / "val", "law_val.csv",
           ["id", "question", "A", "B", "C", "D", "answer"],
           [[0, "q1", "w", "x", "y", "z", "B"], [1, "q2", "w", "x", "y", "z", "D"]])
    got = load_ceval_csv(str(tmp_path), "val")
    assert list(got) == ["law_val"] or list(got) == ["law"]
    samples = next(iter(got.values()))
    assert [s.answer for s in samples] == [1, 3]
    assert samples[0].choices == ["w", "x", "y", "z"]


def test_load_cmmlu_flat_headers(tmp_path):
    # CMMLU-style capitalized header, flat layout
    _write(tmp_path, "physics_test.csv",
           ["Question", "A", "B", "C", "D", "Answer"],
           [["q", "1", "2", "3", "4", "a"]])
    got = load_ceval_csv(str(tmp_path), "test")
    assert got["physics"][0].answer == 0


def test_load_ceval_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_ceval_csv(str(tmp_path), "val")


def test_run_with_task_name(tmp_path):
    _write(tmp_path, "law_val.csv",
           ["id", "question", "A", "B", "C", "D", "answer"],
           [[0, "q1", "w", "x", "y", "z", "A"]])
    test = load_ceval_csv(str(tmp_path), "val")
    out = run_mmlu(lambda ctx, conts: 0, test, task_name="ceval")
    assert out["task"] == "ceval"
    assert out["accuracy"] == 1.0
