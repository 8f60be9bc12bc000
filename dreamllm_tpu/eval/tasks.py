"""NLP task harness: few-shot prompt rendering + task drivers over the
logprob/generate scorers.

TPU-native equivalent of the reference's vendored ``llama_evaluation``
toolkit core (omni/eval/language_eval — multich/MMLU/BBH tasks, few-shot
prompt templates covered by its test_prompt.py). The redis/influx results DB
and streamlit frontend are cluster infrastructure and intentionally absent;
results go to JSON.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Callable, Sequence

import numpy as np

CHOICE_LETTERS = "ABCDEFGH"


@dataclasses.dataclass
class MCSample:
    question: str
    choices: Sequence[str]
    answer: int                      # index into choices
    subject: str | None = None


def render_mc_prompt(
    sample: MCSample,
    few_shot: Sequence[MCSample] = (),
    *,
    instruction: str | None = None,
    subject_in_instruction: bool = True,
) -> tuple[str, list[str]]:
    """MMLU-style rendering → (context, per-choice continuations).

    Context ends with "Answer:" and continuations are " A"/" B"/... so the
    scorer compares single-letter logprobs (the llama_evaluation convention).
    """
    parts = []
    if instruction is None and sample.subject and subject_in_instruction:
        subj = sample.subject.replace("_", " ")
        instruction = (
            f"The following are multiple choice questions (with answers) about {subj}."
        )
    if instruction:
        parts.append(instruction + "\n")

    def block(s: MCSample, with_answer: bool) -> str:
        lines = [s.question]
        for i, c in enumerate(s.choices):
            lines.append(f"{CHOICE_LETTERS[i]}. {c}")
        lines.append(
            f"Answer: {CHOICE_LETTERS[s.answer]}" if with_answer else "Answer:"
        )
        return "\n".join(lines)

    for fs in few_shot:
        parts.append(block(fs, with_answer=True) + "\n")
    parts.append(block(sample, with_answer=False))
    context = "\n".join(parts)
    continuations = [f" {CHOICE_LETTERS[i]}" for i in range(len(sample.choices))]
    return context, continuations


def render_cloze_prompt(
    sample: MCSample, few_shot: Sequence[MCSample] = ()
) -> tuple[str, list[str]]:
    """HellaSwag/PIQA-style: score each full continuation after the context."""
    parts = []
    for fs in few_shot:
        parts.append(fs.question + " " + fs.choices[fs.answer])
    parts.append(sample.question)
    context = "\n".join(parts)
    return context, [" " + c for c in sample.choices]


def evaluate_multiple_choice(
    choose_fn: Callable[[str, Sequence[str]], int],
    samples: Sequence[MCSample],
    *,
    style: str = "letter",  # "letter" (MMLU) | "cloze" (HellaSwag)
    few_shot: Sequence[MCSample] = (),
    out_path: str | None = None,
) -> dict:
    """Run a task. ``choose_fn(context, continuations) -> index`` — e.g.
    functools.partial(eval.nlp.multiple_choice, params, cfg, tokenizer)."""
    render = render_mc_prompt if style == "letter" else render_cloze_prompt
    correct, results = 0, []
    by_subject: dict[str, list[int]] = {}
    for s in samples:
        ctx, conts = render(s, few_shot)
        pred = int(choose_fn(ctx, conts))
        ok = pred == s.answer
        correct += ok
        results.append({"pred": pred, "answer": s.answer, "subject": s.subject})
        if s.subject:
            by_subject.setdefault(s.subject, []).append(int(ok))
    out = {
        "accuracy": correct / max(len(samples), 1),
        "n": len(samples),
        "by_subject": {k: float(np.mean(v)) for k, v in by_subject.items()},
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f)
    return out
