"""AGIEval driver: generation-scored letter MC + math cloze.

TPU-native counterpart of the reference's AGIEval/gaokao path
(omni/eval/language_eval/llama_evaluation_main/llama_evaluation/utils/
agi_utils.py + prompts/agi_prompt.py). Behavior parity:

- standard AGIEval jsonl layout: ``{subset.replace('_','-')}.jsonl`` rows with
  ``passage``/``question``/``options``/``label`` (MC) or ``answer`` (cloze)
- English vs Chinese prompt templates keyed by subset (agi_prompt.py:18-24)
- answer post-processing: strip "The answer is"/"答案是" prefixes, take the
  first standalone A-G letter — all letters joined for gaokao_physics
  (multi-select), math cloze compared with the math-equivalence chain
  (agi_utils.get_post_process/get_metrics)
- per-subset accuracy + the "agieval average" summary metric
  (task_utils.agieval_post_metrics)

Host-side text processing only; generation arrives via ``generate_fn`` so the
driver runs against in-process jitted decode or the serving shim.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Sequence

from dreamllm_tpu.eval.code_math import math_equiv

GenerateFn = Callable[[str], str]

ENGLISH_QA = {
    "lsat_ar", "lsat_lr", "lsat_rc", "logiqa_en", "sat_math", "sat_en",
    "aqua_rat", "sat_en_without_passage", "gaokao_english",
}
CHINESE_QA = {
    "logiqa_zh", "jec_qa_kd", "jec_qa_ca", "gaokao_chinese",
    "gaokao_geography", "gaokao_history", "gaokao_biology",
    "gaokao_chemistry", "gaokao_physics", "gaokao_mathqa",
}
ENGLISH_CLOZE = {"math"}
CHINESE_CLOZE = {"gaokao_mathcloze"}
MULTI_SELECT = {"gaokao_physics"}

SUBSETS = sorted(ENGLISH_QA | CHINESE_QA | ENGLISH_CLOZE | CHINESE_CLOZE)

_LETTER_RE = re.compile(r"(?<![a-zA-Z0-9_])([A-G])(?![a-zA-Z0-9_])")
_ANSWER_PREFIXES = ("The answer is therefore", "The answer is", "答案是")


def is_cloze(subset: str) -> bool:
    return subset in ENGLISH_CLOZE or subset in CHINESE_CLOZE


def load_agieval_jsonl(data_dir: str, subset: str) -> list[dict]:
    """AGIEval repo layout: ``{subset with - for _}.jsonl``."""
    path = os.path.join(data_dir, subset.replace("_", "-") + ".jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def render_agieval_prompt(subset: str, row: dict) -> str:
    """Zero-shot prompt in the reference's template family."""
    passage = (row.get("passage") or "").strip()
    question = (row.get("question") or "").strip()
    if is_cloze(subset):
        head = "问题" if subset in CHINESE_CLOZE else "Problem"
        cue = "答案：" if subset in CHINESE_CLOZE else "Answer:"
        body = f"{passage} {question}".strip()
        return f"{head}: {body}\n{cue}"
    options = row.get("options") or []
    opts = " ".join(str(o).strip() for o in options)
    if subset in CHINESE_QA:
        return f"问题: {passage} {question}\n从以下选项中选择: {opts}\n答案是"
    return (
        f"Problem: {passage} {question}\n"
        f"Choose from the following options: {opts}\nThe answer is"
    )


def extract_agieval_answer(generated: str, subset: str | None = None) -> str:
    """Post-process a generation into a comparable answer
    (agi_utils.get_post_process)."""
    result = generated.split("\n\n")[0]
    for prefix in _ANSWER_PREFIXES:
        if prefix in result:
            result = result.split(prefix)[1]
    if subset and is_cloze(subset):
        return result.strip()
    letters = _LETTER_RE.findall(result)
    if not letters:
        return ""
    if subset in MULTI_SELECT:
        # answer SETS: 'C和A' or 'A对…A是…C对' name exactly {A, C} — dedupe
        # and canonicalize order so set-equal answers compare equal
        return ",".join(sorted(set(letters)))
    return letters[0]


def _gold_label(row: dict, subset: str) -> str:
    if is_cloze(subset):
        return str(row.get("answer", row.get("label", ""))).strip()
    label = row.get("label", row.get("answer", ""))
    if isinstance(label, (list, tuple)):
        return ",".join(sorted({str(x).strip() for x in label}))
    label = str(label).strip()
    if subset in MULTI_SELECT and len(label) > 1:
        # dataset golds appear both as lists and as 'AC'/'A,C' strings
        letters = [c for c in label if c.isalpha()]
        if letters:
            return ",".join(sorted(set(letters)))
    return label


def agieval_match(pred: str, gold: str, subset: str) -> bool:
    if is_cloze(subset):
        return math_equiv(pred, gold)
    return pred == gold and pred != ""


def run_agieval(
    generate_fn: GenerateFn,
    subsets: dict[str, list[dict]],
    *,
    max_samples_per_subset: int | None = None,
    out_path: str | None = None,
) -> dict:
    """Generation-scored AGIEval over pre-loaded subset rows."""
    per_subset: dict[str, float] = {}
    results = []
    n_total, n_correct = 0, 0
    for subset, rows in subsets.items():
        if max_samples_per_subset:
            rows = rows[:max_samples_per_subset]
        sub_correct = 0
        for row in rows:
            prompt = render_agieval_prompt(subset, row)
            gen = generate_fn(prompt)
            if gen.startswith(prompt):
                gen = gen[len(prompt):]
            pred = extract_agieval_answer(gen, subset)
            gold = _gold_label(row, subset)
            ok = agieval_match(pred, gold, subset)
            sub_correct += ok
            results.append(
                {"subset": subset, "pred": pred, "label": gold, "correct": bool(ok)}
            )
        per_subset[subset] = sub_correct / max(len(rows), 1)
        n_total += len(rows)
        n_correct += sub_correct
    out = {
        "task": "agieval",
        "accuracy": n_correct / max(n_total, 1),
        "average": sum(per_subset.values()) / max(len(per_subset), 1),
        "n": n_total,
        "by_subset": per_subset,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1, ensure_ascii=False)
    return out


def load_agieval(
    data_dir: str, subsets: Sequence[str] | None = None
) -> dict[str, list[dict]]:
    """Load requested (default: all present) subsets from an AGIEval dir."""
    names = list(subsets) if subsets else SUBSETS
    out = {}
    for name in names:
        try:
            out[name] = load_agieval_jsonl(data_dir, name)
        except FileNotFoundError:
            if subsets:  # explicit request -> hard error
                raise
    if not out:
        raise FileNotFoundError(f"no AGIEval jsonl files under {data_dir}")
    return out


def smoke_agieval() -> dict[str, list[dict]]:
    return {
        "sat_math": [
            {"question": "If x + 2 = 5, what is x?",
             "options": ["(A)2", "(B)3", "(C)5", "(D)7"], "label": "B"},
            {"question": "What is 10% of 200?",
             "options": ["(A)10", "(B)2", "(C)20", "(D)100"], "label": "C"},
        ],
        "gaokao_physics": [
            {"question": "下列哪些是矢量？",
             "options": ["(A)速度", "(B)质量", "(C)力", "(D)温度"],
             "label": ["A", "C"]},
        ],
        "math": [
            {"question": "Compute $2 \\cdot 7$.", "answer": "14"},
        ],
    }
