"""End-to-end language-eval task drivers: MMLU (logprob MC) + BBH (generation).

TPU-native counterpart of the reference's ``llama_evaluation`` task layer
(omni/eval/language_eval/llama_evaluation_main/llama_evaluation/tasks/mmlu.py
per-subject few-shot letter scoring; evaluator/local_evaluator.py:125-154
short_generation_evaluator for BBH-style tasks; prompts/bbh_prompt.py
few-shot prompt files). Design differences, deliberate:

  * Scoring runs through the framework's own jitted logprob/decode paths
    (eval/nlp.py, generation/sampler.py) or the HTTP shim (serve/server.py)
    via the same two-function scorer interface — no fairscale model-parallel
    wrapper, no CUDA subprocess pool.
  * Datasets load from local files in the tasks' standard public formats
    (MMLU csv subject files; BBH task json + few-shot prompt txt). Nothing is
    vendored; ``*_smoke`` builtins make every driver runnable with zero
    downloads.
  * Results go to JSON, optionally accumulated in the sqlite results store
    (eval/results_db.py — the reference's redis/influx mirrors + streamlit
    frontend are cluster infrastructure, intentionally absent).

Sibling drivers: eval/code_math.py (MATH/GSM8K/HumanEval), eval/agieval.py.
"""

from __future__ import annotations

import csv
import json
import os
import re
import string
from typing import Callable, Sequence

import numpy as np

from dreamllm_tpu.eval.tasks import CHOICE_LETTERS, MCSample, render_mc_prompt

GenerateFn = Callable[[str], str]           # prompt -> generated text
ChooseFn = Callable[[str, Sequence[str]], int]  # (context, continuations) -> idx


# ---------------------------------------------------------------------------
# Dataset loading — standard public file layouts, local paths only
# ---------------------------------------------------------------------------


def load_mmlu_csv(data_dir: str, split: str = "test") -> dict[str, list[MCSample]]:
    """MMLU in its standard csv layout: ``{split}/{subject}_{split}.csv`` rows
    ``question, A, B, C, D, answer_letter`` (no header). Accepts both
    ``data_dir/{split}/`` and flat ``data_dir/`` file placement."""
    base = os.path.join(data_dir, split)
    if not os.path.isdir(base):
        base = data_dir
    out: dict[str, list[MCSample]] = {}
    for fn in sorted(os.listdir(base)):
        if not fn.endswith(f"_{split}.csv"):
            continue
        subject = fn[: -len(f"_{split}.csv")]
        samples = []
        with open(os.path.join(base, fn), newline="") as f:
            for row in csv.reader(f):
                if len(row) < 6:
                    continue
                q, choices, ans = row[0], row[1:5], row[5].strip().upper()
                if ans not in CHOICE_LETTERS[:4]:
                    continue
                samples.append(
                    MCSample(
                        question=q,
                        choices=choices,
                        answer=CHOICE_LETTERS.index(ans),
                        subject=subject,
                    )
                )
        if samples:
            out[subject] = samples
    if not out:
        raise FileNotFoundError(f"no MMLU '*_{split}.csv' files under {data_dir}")
    return out


def load_ceval_csv(data_dir: str, split: str = "val") -> dict[str, list[MCSample]]:
    """C-Eval / CMMLU layout: headered csv ``id,question,A,B,C,D,answer`` (or
    ``Question,A,B,C,D,Answer``) per subject, under ``data_dir/{split}/`` or
    flat as ``{subject}_{split}.csv`` (reference ceval/cmmlu task families,
    task_utils.py:285-287)."""
    base = os.path.join(data_dir, split)
    flat = not os.path.isdir(base)
    if flat:
        base = data_dir
    out: dict[str, list[MCSample]] = {}
    for fn in sorted(os.listdir(base)):
        if not fn.endswith(".csv") or (flat and not fn.endswith(f"_{split}.csv")):
            continue
        subject = fn[: -len(f"_{split}.csv")] if fn.endswith(f"_{split}.csv") else fn[:-4]
        samples = []
        with open(os.path.join(base, fn), newline="") as f:
            reader = csv.reader(f)
            header = next(reader, None)
            if not header:
                continue
            cols = [h.strip().lower() for h in header]
            try:
                iq = cols.index("question")
                ia = [cols.index(c) for c in ("a", "b", "c", "d")]
                ians = cols.index("answer")
            except ValueError:
                continue
            for row in reader:
                if len(row) <= max(ians, *ia, iq):
                    continue
                ans = row[ians].strip().upper()
                if ans not in CHOICE_LETTERS[:4]:
                    continue
                samples.append(
                    MCSample(
                        question=row[iq],
                        choices=[row[i] for i in ia],
                        answer=CHOICE_LETTERS.index(ans),
                        subject=subject,
                    )
                )
        if samples:
            out[subject] = samples
    if not out:
        raise FileNotFoundError(f"no C-Eval/CMMLU csv files under {data_dir}")
    return out


def load_bbh_tasks(data_dir: str, tasks: Sequence[str] | None = None) -> dict[str, list[dict]]:
    """BBH in its standard layout: ``{task}.json`` with
    ``{"examples": [{"input": ..., "target": ...}]}``."""
    if tasks is None:
        tasks = sorted(
            fn[:-5] for fn in os.listdir(data_dir) if fn.endswith(".json")
        )
    out = {}
    for t in tasks:
        with open(os.path.join(data_dir, f"{t}.json")) as f:
            out[t] = json.load(f)["examples"]
    if not out:
        raise FileNotFoundError(f"no BBH task json files under {data_dir}")
    return out


def load_bbh_fewshot_prefix(prompts_dir: str, task: str) -> str:
    """Few-shot CoT prompt file (BBH repo ``cot-prompts/{task}.txt`` format:
    an instruction line, then ``Q: ...\\nA: ...`` blocks). Returns the file
    body to prepend verbatim; empty string when the file is absent."""
    path = os.path.join(prompts_dir, f"{task}.txt")
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        body = f.read().strip()
    # the canonical files open with a "BIG-bench canary" guard line; drop it
    lines = [l for l in body.splitlines() if "canary" not in l.lower()]
    return "\n".join(lines).strip()


# ---------------------------------------------------------------------------
# Answer normalization / extraction (BBH generation scoring)
# ---------------------------------------------------------------------------

_ARTICLES = re.compile(r"\b(a|an|the)\b")
_PUNCT = str.maketrans("", "", string.punctuation)


def normalize_answer(text: str) -> str:
    """Lowercase, strip punctuation/articles/extra whitespace (SQuAD-style
    normalization, equivalent of the reference's exact_match preprocessing)."""
    text = text.lower().translate(_PUNCT)
    text = _ARTICLES.sub(" ", text)
    return " ".join(text.split())


def extract_generated_answer(generated: str) -> str:
    """Pull the model's answer out of a free-form completion.

    Honors the BBH CoT convention ``... the answer is X.`` when present,
    otherwise takes the text up to the next question block.
    """
    text = generated.split("\nQ:")[0].split("\n\n")[0].strip()
    m = re.search(r"(?:answer is|answer:)\s*(.+)", text, re.IGNORECASE)
    if m:
        text = m.group(1).strip()
    return text.rstrip(".").strip()


_LETTER_PRED = re.compile(r"^\(?([A-Za-z])[).:]?(?:\s|$)")


def answers_match(pred: str, target: str) -> bool:
    """Exact match after normalization, with option-letter equivalence: a
    ``(A)``-style target also matches a bare ``A`` (and vice versa). Letters
    compare on the RAW strings — normalization strips articles, which would
    eat a standalone ``a``."""
    mt = re.fullmatch(r"\(?([A-Za-z])\)?", target.strip())
    if mt:  # target is an option letter
        mp = _LETTER_PRED.match(pred.strip())
        return bool(mp and mp.group(1).lower() == mt.group(1).lower())
    p, t = normalize_answer(pred), normalize_answer(target)
    return p == t and p != ""


# ---------------------------------------------------------------------------
# Task drivers
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Base MC task zoo — BoolQ / PIQA / SIQA / HellaSwag / WinoGrande / ARC /
# OBQA / SciQ / RACE (reference BASE_TASKS, llama_evaluation task_utils.py:
# 428-433, + submission_scripts/submission_dev_*.py prompt formats). Each
# renderer maps one public-format json(l) row to
# (context, continuations, answer_idx) for logprob-argmax scoring.
# ---------------------------------------------------------------------------


def load_jsonl(path: str) -> list[dict]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _render_boolq(r):
    # submission_dev_boolq.py:49-50 prompt
    q = r["question"][0].upper() + r["question"][1:]
    ctx = f"Choose yes or no to answer the question.\n\n{r['passage']}\n\n{q}?\nAnswer:"
    ans = r["answer"]
    ans = {True: 1, False: 0, "true": 1, "false": 0}.get(ans, ans)
    return ctx, [" no", " yes"], int(ans)


def _render_piqa(r):
    return (f"Question: {r['goal']}\nAnswer:",
            [" " + r["sol1"], " " + r["sol2"]], int(r["label"]))


def _render_siqa(r):
    conts = [" " + r["answerA"], " " + r["answerB"], " " + r["answerC"]]
    return (f"{r['context']}\nQuestion: {r['question']}\nAnswer:",
            conts, int(r["label"]) - 1)


def _render_hellaswag(r):
    ctx = r.get("ctx") or (r.get("ctx_a", "") + " " + r.get("ctx_b", "")).strip()
    return ctx, [" " + e for e in r["endings"]], int(r["label"])


def _render_winogrande(r):
    # fill the blank with each option; score the completed suffix after the
    # shared prefix (standard partial-evaluation protocol)
    pre, _, post = r["sentence"].partition("_")
    conts = [f"{opt}{post}" for opt in (r["option1"], r["option2"])]
    return pre, conts, int(r["answer"]) - 1


def _letters_to_idx(key: str) -> int:
    key = key.strip().upper()
    return ord(key) - ord("A") if key.isalpha() else int(key) - 1


def _render_arc(r):
    ch = r["choices"]
    texts, labels = list(ch["text"]), [str(x) for x in ch["label"]]
    ctx = f"Question: {r['question']}\nAnswer:"
    try:
        ans = labels.index(str(r["answerKey"]).strip())
    except ValueError:
        ans = _letters_to_idx(r["answerKey"])
    return ctx, [" " + t for t in texts], ans


def _render_obqa(r):
    return _render_arc({**r, "question": r.get("question_stem", r.get("question"))})


def _render_sciq(r):
    # fixed order: distractors then correct, so the answer index is stable
    conts = [r["distractor1"], r["distractor2"], r["distractor3"], r["correct_answer"]]
    ctx = f"Question: {r['question']}\nAnswer:"
    return ctx, [" " + c for c in conts], 3


def _render_race(r):
    opts = r["options"]
    ctx = (f"Article: {r['article']}\n\nQuestion: {r['question']}\nAnswer:")
    return ctx, [" " + o for o in opts], _letters_to_idx(r["answer"])


MC_TASK_RENDERERS: dict[str, Callable[[dict], tuple[str, list[str], int]]] = {
    "boolq": _render_boolq,
    "piqa": _render_piqa,
    "siqa": _render_siqa,
    "hellaswag": _render_hellaswag,
    "winogrande": _render_winogrande,
    "arc_e": _render_arc,
    "arc_c": _render_arc,
    "obqa": _render_obqa,
    "sciq": _render_sciq,
    "race_m": _render_race,
    "race_h": _render_race,
}


def run_mc_task(
    choose_fn: ChooseFn,
    task: str,
    rows: Sequence[dict],
    *,
    max_samples: int | None = None,
    out_path: str | None = None,
) -> dict:
    """Zero/few-shot logprob-MC driver over a base task's raw json rows."""
    render = MC_TASK_RENDERERS[task]
    rows = list(rows)[:max_samples] if max_samples else list(rows)
    results, n_correct, n_skipped = [], 0, 0
    for r in rows:
        try:
            ctx, conts, ans = render(r)
        except (KeyError, ValueError, TypeError, IndexError) as e:
            # one malformed raw row (answer/choice drift, missing field)
            # must not kill a whole eval run
            n_skipped += 1
            results.append({"skipped": str(e)[:200]})
            continue
        pred = int(choose_fn(ctx, conts))
        n_correct += pred == ans
        results.append({"pred": pred, "answer": ans})
    n_scored = len(rows) - n_skipped
    out = {"task": task, "accuracy": n_correct / max(n_scored, 1),
           "n": n_scored, "skipped": n_skipped}
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


# ---------------------------------------------------------------------------
# Generation-scored QA tasks — TriviaQA / NaturalQuestions / DROP
# (reference BASE_TASKS tail, task_utils.py:431-432). SQuAD-style EM/F1 over
# the normalized answer against all gold aliases.
# ---------------------------------------------------------------------------


def squad_em_f1(prediction: str, golds: Sequence[str]) -> tuple[float, float]:
    pred = normalize_answer(prediction)
    em, f1 = 0.0, 0.0
    for gold in golds:
        g = normalize_answer(str(gold))
        em = max(em, float(pred == g))
        pt, gt = pred.split(), g.split()
        if not pt or not gt:
            # official SQuAD scoring: if either side normalizes to empty,
            # f1 = em for that gold (otherwise an exact empty-vs-empty match
            # would score em=1 with f1=0)
            f1 = max(f1, float(pred == g))
            continue
        common = 0
        gt_pool = list(gt)
        for t in pt:
            if t in gt_pool:
                gt_pool.remove(t)
                common += 1
        if common:
            p = common / len(pt)
            r = common / len(gt)
            f1 = max(f1, 2 * p * r / (p + r))
    return em, f1


def _qa_triviaqa(r):
    ans = r.get("answer", {})
    if isinstance(ans, dict):
        golds = list(ans.get("aliases", [])) or [ans.get("value", "")]
    else:
        golds = [str(ans)]
    return f"Question: {r['question']}\nAnswer:", golds


def _qa_naturalqa(r):
    golds = r.get("answer", r.get("answers", []))
    if isinstance(golds, str):
        golds = [golds]
    return f"Question: {r['question']}\nAnswer:", list(golds)


def _qa_drop(r):
    spans = r.get("answers_spans", {}).get("spans") or r.get("answers", [])
    return (f"Passage: {r['passage']}\nQuestion: {r['question']}\nAnswer:",
            list(spans))


GEN_QA_RENDERERS: dict[str, Callable[[dict], tuple[str, list[str]]]] = {
    "triviaqa": _qa_triviaqa,
    "naturalqa": _qa_naturalqa,
    "drop_gen": _qa_drop,
}


def run_gen_qa(
    generate_fn: GenerateFn,
    task: str,
    rows: Sequence[dict],
    *,
    max_samples: int | None = None,
    out_path: str | None = None,
) -> dict:
    """Generation-scored QA: render prompt, generate, take the first line,
    score EM + token-F1 against all golds."""
    render = GEN_QA_RENDERERS[task]
    rows = list(rows)[:max_samples] if max_samples else list(rows)
    results, em_sum, f1_sum = [], 0.0, 0.0
    for r in rows:
        prompt, golds = render(r)
        gen = generate_fn(prompt).strip().split("\n")[0]
        em, f1 = squad_em_f1(gen, golds)
        em_sum += em
        f1_sum += f1
        results.append({"pred": gen, "em": em, "f1": f1})
    n = max(len(rows), 1)
    out = {"task": task, "accuracy": em_sum / n, "em": em_sum / n,
           "f1": f1_sum / n, "n": len(rows)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


# ---------------------------------------------------------------------------
# Chinese QA tail of BASE_TASKS: clue_c3 / clue_wsc (logprob MC) and
# clue_cmrc / xtreme (short-generation QA with char-level CN metrics)
# (reference evaluator/{local_evaluator,evaluator_utils}.py:
#  concat_logprob_evaluator, wsc_concat_logprob_evaluator,
#  short_generation_cn_evaluator, normalize_answer_cn)
# ---------------------------------------------------------------------------

_CN_PUNC = set(string.punctuation) | set("‘’´`《》，。？！")


def normalize_answer_cn(s: str) -> str:
    """Strip whitespace, punctuation (ASCII + common CJK), underscores —
    the reference's normalize_answer_cn (evaluator_utils.py:181-195)."""
    s = s.replace("_", "")
    s = "".join(ch for ch in s if ch not in _CN_PUNC)
    return "".join(s.split()).strip()


def cn_em_include_f1(prediction: str, golds: Sequence[str]) -> tuple[float, float, float]:
    """(exact-match, include, char-level F1) against all golds, CN-normalized
    (reference exact_match/include_answer/f1_score with en=False)."""
    from collections import Counter

    pred = normalize_answer_cn(prediction)
    em = inc = f1 = 0.0
    for gold in golds:
        g = normalize_answer_cn(str(gold))
        em = max(em, float(pred == g))
        inc = max(inc, float(bool(g) and g in pred))
        common = Counter(pred) & Counter(g)
        n_same = sum(common.values())
        if n_same and pred and g:
            p, r = n_same / len(pred), n_same / len(g)
            f1 = max(f1, 2 * p * r / (p + r))
        elif not pred and not g:
            f1 = 1.0
    return em, inc, f1


def _qa_cn(r):
    ctx = r.get("context", r.get("passage", ""))
    golds = r.get("answers", r.get("answer", []))
    if isinstance(golds, dict):  # SQuAD-style {"text": [...]}
        golds = golds.get("text", [])
    if isinstance(golds, str):
        golds = [golds]
    golds = [g["text"] if isinstance(g, dict) else g for g in golds]
    prompt = (f"文章：{ctx}\n" if ctx else "") + f"问题：{r['question']}\n回答："
    return prompt, list(golds)


def run_gen_qa_cn(
    generate_fn: GenerateFn,
    task: str,
    rows: Sequence[dict],
    *,
    max_samples: int | None = None,
    out_path: str | None = None,
) -> dict:
    """Chinese short-generation QA (clue_cmrc, xtreme): generate, cut at the
    next 问题: block, score EM + include + char-F1."""
    rows = list(rows)[:max_samples] if max_samples else list(rows)
    results = []
    em_s = inc_s = f1_s = 0.0
    for r in rows:
        prompt, golds = _qa_cn(r)
        gen = generate_fn(prompt)
        if gen.startswith(prompt):
            gen = gen[len(prompt):]
        elif "回答：" in gen:
            gen = gen.split("回答：", 1)[1]
        gen = gen.split("问题：")[0].strip().split("\n")[0]
        em, inc, f1 = cn_em_include_f1(gen, golds)
        em_s += em
        inc_s += inc
        f1_s += f1
        results.append({"pred": gen, "em": em, "include": inc, "f1": f1})
    n = max(len(rows), 1)
    out = {"task": task, "accuracy": em_s / n, "em": em_s / n,
           "include": inc_s / n, "f1": f1_s / n, "n": len(rows)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1, ensure_ascii=False)
    return out


def _render_clue_c3(r):
    """C3: multi-turn context (list of lines or str) + question + choices;
    answer may be the choice text or an index. The reference scores
    len-normalized choice logprob — pass normalize_by_length to the scorer."""
    ctx = r.get("context", r.get("passage", ""))
    if isinstance(ctx, (list, tuple)):
        ctx = "\n".join(ctx)
    choices = list(r["choice"] if "choice" in r else r["choices"])
    ans = r.get("answer", r.get("label", 0))
    if isinstance(ans, str):
        # raw C3 data drifts in whitespace between answer and choices
        stripped = [normalize_answer_cn(c) for c in choices]
        try:
            idx = stripped.index(normalize_answer_cn(ans))
        except ValueError:
            raise ValueError(
                f"clue_c3 answer {ans!r} not among choices {choices!r}"
            ) from None
    else:
        idx = int(ans)
    return f"{ctx}\n问题：{r['question']}\n回答：", [f" {c}" for c in choices], idx


def _render_clue_wsc(r):
    """CLUE WSC coreference: the 'true' reading substitutes the noun span for
    the pronoun; label 0 = coreferent (true reading wins). Mirrors the
    reference's paired-substitution concat scoring (argmax%2 over pairs).
    Substitution targets ``span2_index`` when present — the pronoun string
    may occur earlier in the sentence than the queried occurrence."""
    text = r["text"]
    tgt = r.get("target", {})
    span1 = tgt.get("span1_text", r.get("span1", ""))
    span2 = tgt.get("span2_text", r.get("span2", ""))
    i2 = tgt.get("span2_index")
    if i2 is not None and text[i2 : i2 + len(span2)] == span2:
        substituted = text[:i2] + span1 + text[i2 + len(span2):]
    else:
        substituted = text.replace(span2, span1, 1)
    label = r.get("label", 0)
    if isinstance(label, str):
        label = 0 if label.lower() in ("true", "1", "yes") else 1
    return "下面的句子是否自然？", [f" {substituted}", f" {text}"], int(label)


MC_TASK_RENDERERS["clue_c3"] = _render_clue_c3
MC_TASK_RENDERERS["clue_wsc"] = _render_clue_wsc
GEN_QA_CN_TASKS = ("clue_cmrc", "xtreme")


def run_mmlu(
    choose_fn: ChooseFn,
    test: dict[str, list[MCSample]],
    dev: dict[str, list[MCSample]] | None = None,
    *,
    k_shot: int = 5,
    max_samples_per_subject: int | None = None,
    out_path: str | None = None,
    task_name: str = "mmlu",
) -> dict:
    """Per-subject few-shot letter-scored MMLU (reference tasks/mmlu.py).

    ``choose_fn(context, continuations) -> index`` — see :func:`local_scorers`
    / :func:`online_scorers`.
    """
    per_subject: dict[str, float] = {}
    results = []
    n_total, n_correct = 0, 0
    for subject, samples in test.items():
        fs = (dev or {}).get(subject, [])[:k_shot]
        if max_samples_per_subject:
            samples = samples[:max_samples_per_subject]
        sub_correct = 0
        for s in samples:
            ctx, conts = render_mc_prompt(s, fs)
            pred = int(choose_fn(ctx, conts))
            ok = pred == s.answer
            sub_correct += ok
            results.append({"subject": subject, "pred": pred, "answer": s.answer})
        per_subject[subject] = sub_correct / max(len(samples), 1)
        n_total += len(samples)
        n_correct += sub_correct
    out = {
        "task": task_name,
        "accuracy": n_correct / max(n_total, 1),
        "n": n_total,
        "by_subject": per_subject,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


def run_bbh(
    generate_fn: GenerateFn,
    tasks: dict[str, list[dict]],
    *,
    prompts_dir: str | None = None,
    max_samples_per_task: int | None = None,
    out_path: str | None = None,
) -> dict:
    """Generation-scored BBH (reference short_generation_evaluator,
    local_evaluator.py:125-154): render ``{few-shot prefix}\\n\\nQ: {input}\\nA:``,
    greedy-generate, extract the answer, exact-match against the target."""
    per_task: dict[str, float] = {}
    results = []
    n_total, n_correct = 0, 0
    for task, examples in tasks.items():
        prefix = load_bbh_fewshot_prefix(prompts_dir, task) if prompts_dir else ""
        if max_samples_per_task:
            examples = examples[:max_samples_per_task]
        task_correct = 0
        for ex in examples:
            prompt = (prefix + "\n\n" if prefix else "") + f"Q: {ex['input']}\nA:"
            gen = generate_fn(prompt)
            pred = extract_generated_answer(gen)
            ok = answers_match(pred, ex["target"])
            task_correct += ok
            results.append(
                {"task": task, "pred": pred, "target": ex["target"], "correct": bool(ok)}
            )
        per_task[task] = task_correct / max(len(examples), 1)
        n_total += len(examples)
        n_correct += task_correct
    out = {
        "task": "bbh",
        "accuracy": n_correct / max(n_total, 1),
        "n": n_total,
        "by_task": per_task,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


# ---------------------------------------------------------------------------
# Scorer adapters: in-process params or the HTTP shim
# ---------------------------------------------------------------------------


def local_scorers(params, llm_cfg, tokenizer, *, max_new_tokens: int = 100,
                  normalize_by_length: bool = False):
    """(choose_fn, generate_fn) over in-process params via the framework's
    jitted logprob scorer and while_loop decoder.

    ``normalize_by_length``: CHARACTER-length-normalized choice logprob —
    the reference's concat evaluator divides the summed logprob by
    ``len(choice)`` in characters (local_evaluator.py:55), and the online
    scorer here does the same, so the local path must match (token-count
    normalization flips argmax on CJK choices where tokens != chars)."""
    import functools

    import jax
    import jax.numpy as jnp

    from dreamllm_tpu.eval.nlp import choice_logprobs, multiple_choice
    from dreamllm_tpu.generation.sampler import SamplingConfig, generate_text

    if normalize_by_length:
        def choose(context, continuations):
            lps = choice_logprobs(params, llm_cfg, tokenizer, context,
                                  list(continuations))
            lps = [lp / max(len(c), 1) for lp, c in zip(lps, continuations)]
            return int(np.argmax(lps))
    else:
        choose = functools.partial(
            multiple_choice, params, llm_cfg, tokenizer,
            normalize_by_length=False,
        )

    scfg = SamplingConfig(max_new_tokens=max_new_tokens, greedy=True)

    def generate(prompt: str) -> str:
        ids = [1] + tokenizer.encode(prompt)
        arr = jnp.asarray([ids], jnp.int32)
        out = generate_text(
            params, llm_cfg, arr, jnp.asarray([len(ids)], jnp.int32), scfg,
            rng=jax.random.PRNGKey(0),
        )
        n = int(out["lengths"][0])
        return tokenizer.decode(list(np.asarray(out["tokens"][0][:n])))

    return choose, generate


def online_scorers(base_url: str, *, max_new_tokens: int = 100,
                   normalize_by_length: bool = False):
    """(choose_fn, generate_fn) against a running serve/ ModelServer
    (reference evaluator/online_evaluator.py path)."""
    from dreamllm_tpu.serve.server import OnlineClient

    client = OnlineClient(base_url)

    def choose(context: str, continuations: Sequence[str]) -> int:
        lps = client.logprob(context, list(continuations))
        if normalize_by_length:
            # char-length normalization like the reference's concat scorer
            lps = [lp / max(len(c), 1) for lp, c in zip(lps, continuations)]
        return int(np.argmax(lps))

    def generate(prompt: str) -> str:
        return client.generate(prompt, max_new_tokens=max_new_tokens, temperature=0.0)

    return choose, generate


# ---------------------------------------------------------------------------
# Built-in smoke data: every driver runnable with zero downloads
# ---------------------------------------------------------------------------


def smoke_mmlu() -> tuple[dict[str, list[MCSample]], dict[str, list[MCSample]]]:
    test = {
        "elementary_arithmetic": [
            MCSample("What is 2 + 2?", ["3", "4", "5", "22"], 1,
                     subject="elementary_arithmetic"),
            MCSample("What is 10 / 2?", ["2", "4", "5", "10"], 2,
                     subject="elementary_arithmetic"),
        ],
        "geography": [
            MCSample("The capital of France is", ["Berlin", "Paris", "Rome", "Lyon"],
                     1, subject="geography"),
        ],
    }
    dev = {
        "elementary_arithmetic": [
            MCSample("What is 1 + 1?", ["1", "2", "3", "11"], 1,
                     subject="elementary_arithmetic"),
        ],
        "geography": [
            MCSample("The capital of Italy is", ["Rome", "Milan", "Paris", "Oslo"],
                     0, subject="geography"),
        ],
    }
    return test, dev


def smoke_bbh() -> dict[str, list[dict]]:
    return {
        "boolean_expressions": [
            {"input": "not ( True ) and ( True ) is", "target": "False"},
            {"input": "True and not not ( not False ) is", "target": "True"},
        ],
        "date_understanding": [
            {"input": "Today is Jan 1, 2020. What is the date tomorrow? Options: "
                      "(A) 01/02/2020 (B) 01/01/2019", "target": "(A)"},
        ],
    }
