"""Math and code-generation eval drivers (MATH, GSM8K, HumanEval-style).

TPU-native counterpart of the reference's quantitative/codegen task drivers:
omni/eval/language_eval/llama_evaluation_main/llama_evaluation/tasks/
{math_eval,codegen}.py + utils/{math_utils,codegen_utils}.py. Behavior parity:

- few-shot "Problem:/Solution:" prompting ending in "The final answer is X."
  (math_eval.py:78-90), GSM8K 4-shot "Question:/Answer:" (prompts/gsm8k_4shot)
- Minerva-style final-answer normalization (math_utils.py:56-92, which itself
  follows arXiv:2206.14858 p.18) and string/numeric equivalence (is_equiv)
- optional majority vote over k sampled generations (math_eval.py:105-140)
- per-level / per-subject accuracy breakdown (math_eval.py:28-67)
- codegen: markdown/AST code extraction (codegen_utils.py:13-66), subprocess
  functional-correctness check and unbiased pass@k (the human_eval protocol
  used by codegen.py:28-43)

Everything here is host-side text processing — generation comes in through a
``generate_fn`` so the same drivers run against in-process jitted decode or
the serving shim (eval.language.local_scorers / online_scorers).
"""

from __future__ import annotations

import ast
import json
import math
import os
import re
import subprocess
import sys
import tempfile
from collections import Counter, defaultdict
from typing import Callable, Sequence

GenerateFn = Callable[[str], str]

# ---------------------------------------------------------------------------
# Final-answer normalization (Minerva, arXiv:2206.14858 appendix D)
# ---------------------------------------------------------------------------

_SUBSTITUTIONS = [
    ("an ", ""), ("a ", ""), (".$", "$"), ("\\$", ""), (r"\ ", ""),
    (" ", ""), ("mbox", "text"), (",\\text{and}", ","),
    ("\\text{and}", ","), ("\\text{m}", "\\text{}"),
]

_REMOVED = [
    "square", "ways", "integers", "dollars", "mph", "inches", "ft",
    "hours", "km", "units", "\\ldots", "sue", "points", "feet",
    "minutes", "digits", "cents", "degrees", "cm", "gm", "pounds",
    "meters", "meals", "edges", "students", "childrentickets", "multiples",
    "\\text{s}", "\\text{.}", "\\text{\ns}", "\\text{}^2",
    "\\text{}^3", "\\text{\n}", "\\text{}", r"\mathrm{th}",
    r"^\circ", r"^{\circ}", r"\;", r",\!", "{,}", '"', "\\dots",
]


def normalize_final_answer(answer: str) -> str:
    """Normalize a quantitative-reasoning final answer for comparison."""
    answer = answer.split("=")[-1]
    for before, after in _SUBSTITUTIONS:
        answer = answer.replace(before, after)
    for expr in _REMOVED:
        answer = answer.replace(expr, "")

    answer = re.sub(r"(.*?)(\$)(.*?)(\$)(.*)", "$\\3$", answer)
    answer = re.sub(r"(\\text\{)(.*?)(\})", "\\2", answer)
    answer = re.sub(r"(\\textbf\{)(.*?)(\})", "\\2", answer)
    answer = re.sub(r"(\\overline\{)(.*?)(\})", "\\2", answer)
    answer = re.sub(r"(\\boxed\{)(.*)(\})", "\\2", answer)

    # shorthand TeX: \fracab -> \frac{a}{b}, \sqrta -> \sqrt{a}
    answer = re.sub(r"(frac)([^{])(.)", "frac{\\2}{\\3}", answer)
    answer = re.sub(r"(sqrt)([^{])", "sqrt{\\2}", answer)
    answer = answer.replace("$", "")

    if answer.replace(",", "").isdigit():
        answer = answer.replace(",", "")
    return answer


def _as_number(s: str) -> float | None:
    s = s.strip().rstrip(".").replace(",", "").replace("$", "").replace("%", "")
    try:
        return float(s)
    except ValueError:
        # simple a/b fractions
        m = re.fullmatch(r"(-?\d+\.?\d*)/(-?\d+\.?\d*)", s)
        if m:
            try:
                return float(m.group(1)) / float(m.group(2))
            except (ValueError, ZeroDivisionError):
                return None
        m = re.fullmatch(r"\\frac\{(-?\d+\.?\d*)\}\{(-?\d+\.?\d*)\}", s)
        if m:
            try:
                return float(m.group(1)) / float(m.group(2))
            except (ValueError, ZeroDivisionError):
                return None
    return None


def math_equiv(pred: str, target: str) -> bool:
    """Answer equivalence: normalized string match, then numeric match
    (reference is_equiv + is_latex_equal fallback chain; the sympy LaTeX
    branch is gated out because antlr is not available in this image — the
    numeric comparison covers its common wins)."""
    if pred is None or target is None:
        return False
    p, t = normalize_final_answer(str(pred)), normalize_final_answer(str(target))
    if p == t:
        return True
    pn, tn = _as_number(p), _as_number(t)
    return pn is not None and tn is not None and abs(pn - tn) < 1e-6


_FINAL_RE = re.compile(r"[Tt]he final answer is\s*\$?(.+?)\$?\s*(?:\.\s*$|\.?\s*\n|\.?\s*$)")
_NUMBER_RE = re.compile(r"-?\d[\d,]*\.?\d*")
_GSM8K_GOLD_RE = re.compile(r"####\s*(-?[\d,\.]+)")


def _last_boxed(text: str) -> str | None:
    """Balanced-brace content of the last ``\\boxed{...}`` — MATH answers
    routinely nest braces (``\\boxed{\\frac{7}{2}}``), so a non-greedy regex
    would truncate at the first ``}``."""
    start = text.rfind("\\boxed{")
    if start < 0:
        return None
    depth = 0
    for i in range(start + len("\\boxed"), len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                return text[start + len("\\boxed{") : i]
    return None


def extract_final_answer(text: str) -> str:
    """'The final answer is X.' -> X; else last \\boxed{}; else last number
    (reference get_final_answer/get_answer_str chain, math_eval.py:86-91)."""
    m = _FINAL_RE.findall(text)
    if m:
        return m[-1].strip().rstrip(".")
    boxed = _last_boxed(text)
    if boxed is not None:
        return boxed.strip()
    m = _NUMBER_RE.findall(text)
    if m:
        return m[-1].replace(",", "")
    return ""


def gsm8k_gold_answer(answer_field: str) -> str:
    """GSM8K gold answers end with '#### N'."""
    m = _GSM8K_GOLD_RE.search(answer_field)
    return m.group(1).replace(",", "") if m else answer_field.strip()


# ---------------------------------------------------------------------------
# Few-shot prompts (same Problem/Solution + final-answer convention as the
# reference's prompts/{math_4shot,gsm8k_4shot}.py; examples written fresh)
# ---------------------------------------------------------------------------

MATH_FEWSHOT = [
    (
        "What is the value of $3^2 + 4^2$?",
        "We compute $3^2 = 9$ and $4^2 = 16$, so $3^2 + 4^2 = 9 + 16 = 25$. "
        "The final answer is 25.",
    ),
    (
        "Solve for $x$: $2x - 6 = 0$.",
        "Adding 6 to both sides gives $2x = 6$, so $x = 3$. "
        "The final answer is 3.",
    ),
    (
        "What is the slope of the line through $(0, 1)$ and $(2, 5)$?",
        "The slope is $\\frac{5 - 1}{2 - 0} = \\frac{4}{2} = 2$. "
        "The final answer is 2.",
    ),
    (
        "How many positive divisors does 12 have?",
        "The divisors of 12 are 1, 2, 3, 4, 6, 12 — six of them. "
        "The final answer is 6.",
    ),
]

GSM8K_FEWSHOT = [
    (
        "A baker makes 24 muffins and sells 9 in the morning and 7 in the "
        "afternoon. How many muffins are left?",
        "The baker sold 9 + 7 = 16 muffins. So 24 - 16 = 8 muffins are left. "
        "The final answer is 8.",
    ),
    (
        "Tickets cost $5 each. If Maya buys 4 tickets and pays with a $50 "
        "bill, how much change does she get?",
        "Four tickets cost 4 * 5 = $20. Her change is 50 - 20 = $30. "
        "The final answer is 30.",
    ),
    (
        "A train travels 60 miles per hour for 3 hours. How far does it go?",
        "Distance is speed times time: 60 * 3 = 180 miles. "
        "The final answer is 180.",
    ),
    (
        "Sam reads 15 pages a day. How many pages does he read in two weeks?",
        "Two weeks is 14 days, so he reads 15 * 14 = 210 pages. "
        "The final answer is 210.",
    ),
]


def render_math_prompt(problem: str, fewshot: Sequence[tuple[str, str]] = MATH_FEWSHOT) -> str:
    parts = [f"Problem:\n{q}\n\nSolution:\n{a}" for q, a in fewshot]
    parts.append(f"Problem:\n{problem}\n\nSolution:\n")
    return "\n\n".join(parts)


def render_gsm8k_prompt(question: str, fewshot: Sequence[tuple[str, str]] = GSM8K_FEWSHOT) -> str:
    parts = [f"Question: {q}\nAnswer: {a}" for q, a in fewshot]
    parts.append(f"Question: {question}\nAnswer:")
    return "\n\n".join(parts)


def _continuation(generated: str, prompt: str) -> str:
    """Model output minus the echoed prompt (scorers may return either), cut
    at the next few-shot boundary."""
    if generated.startswith(prompt):
        generated = generated[len(prompt):]
    else:
        # echo-free output; also handle scorers that re-render the prompt
        tail = prompt[-40:]
        pos = generated.find(tail)
        if pos >= 0:
            generated = generated[pos + len(tail):]
    for stop in ("\n\nProblem:", "\n\nQuestion:"):
        cut = generated.find(stop)
        if cut >= 0:
            generated = generated[:cut]
    return generated


# ---------------------------------------------------------------------------
# MATH / GSM8K drivers
# ---------------------------------------------------------------------------


def _majority(answers: Sequence[str]) -> str:
    """Most common non-empty normalized answer (math_eval major_vote)."""
    counts = Counter(normalize_final_answer(a) for a in answers if a)
    if not counts:
        return ""
    norm, _ = counts.most_common(1)[0]
    for a in answers:  # return an original spelling of the winner
        if a and normalize_final_answer(a) == norm:
            return a
    return norm


def run_math(
    generate_fn: GenerateFn,
    rows: Sequence[dict],
    *,
    votes: int = 1,
    max_samples: int | None = None,
    out_path: str | None = None,
) -> dict:
    """MATH-style eval: rows with ``problem``/``solution`` (+optional
    ``type``/``level``). Gold answer = \\boxed{} content of the solution.
    Per-level and per-type accuracy like the reference dump_result."""
    rows = list(rows)[:max_samples] if max_samples else list(rows)
    results = []
    level_cors: dict = defaultdict(list)
    type_cors: dict = defaultdict(list)
    n_correct = 0
    for r in rows:
        gold = extract_final_answer(r.get("solution", r.get("answer", "")))
        prompt = render_math_prompt(r["problem"])
        answers = [
            extract_final_answer(_continuation(generate_fn(prompt), prompt))
            for _ in range(max(votes, 1))
        ]
        pred = answers[0] if votes <= 1 else _majority(answers)
        ok = math_equiv(pred, gold)
        n_correct += ok
        if "level" in r:
            lvl = re.sub(r"\D", "", str(r["level"])) or str(r["level"])
            level_cors[lvl].append(ok)
        if "type" in r:
            type_cors[str(r["type"])].append(ok)
        results.append({"pred": pred, "answer": gold, "correct": bool(ok)})
    n = max(len(rows), 1)
    out = {
        "task": "math",
        "accuracy": n_correct / n,
        "n": len(rows),
        "by_level": {k: sum(v) / len(v) for k, v in sorted(level_cors.items())},
        "by_type": {k: sum(v) / len(v) for k, v in sorted(type_cors.items())},
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


def run_gsm8k(
    generate_fn: GenerateFn,
    rows: Sequence[dict],
    *,
    votes: int = 1,
    max_samples: int | None = None,
    out_path: str | None = None,
) -> dict:
    """GSM8K eval: rows with ``question``/``answer`` ('#### N' gold)."""
    rows = list(rows)[:max_samples] if max_samples else list(rows)
    results, n_correct = [], 0
    for r in rows:
        gold = gsm8k_gold_answer(r["answer"])
        prompt = render_gsm8k_prompt(r["question"])
        answers = [
            extract_final_answer(_continuation(generate_fn(prompt), prompt))
            for _ in range(max(votes, 1))
        ]
        pred = answers[0] if votes <= 1 else _majority(answers)
        ok = math_equiv(pred, gold)
        n_correct += ok
        results.append({"pred": pred, "answer": gold, "correct": bool(ok)})
    n = max(len(rows), 1)
    out = {"task": "gsm8k", "accuracy": n_correct / n, "n": len(rows)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


# ---------------------------------------------------------------------------
# Codegen: extraction + functional correctness + pass@k
# ---------------------------------------------------------------------------


def minimum_code(code: str) -> str:
    """Longest prefix of whole `def` blocks that parses (truncation repair,
    reference codegen_utils.minimum_code)."""
    chunks = code.split("\ndef ")
    for i in range(len(chunks), 0, -1):
        candidate = "\ndef ".join(chunks[:i])
        try:
            ast.parse(candidate)
            return candidate
        except SyntaxError:
            continue
    return code


def extract_markdown_code(text: str, python_only: bool = True) -> list[str]:
    pattern = r"```python\n([\s\S]*?)\n```" if python_only else r"```(?:python\n)?([\s\S]*?)```"
    return [m.strip() for m in re.findall(pattern, text)]


def extract_code(text: str, markdown: bool = False) -> str:
    """Model output -> runnable code (reference extract_function)."""
    if markdown:
        blocks = extract_markdown_code(text) or extract_markdown_code(text, python_only=False)
        return "\n\n".join(blocks)
    try:
        ast.parse(text)
        return text
    except SyntaxError:
        return minimum_code(text)


def truncate_completion(completion: str) -> str:
    """Cut a raw continuation at the first top-level statement — the standard
    HumanEval stop heuristic for base models that keep generating after the
    function body."""
    lines = completion.split("\n")
    out = []
    for ln in lines:
        if out and ln and not ln[0].isspace() and not ln.startswith(")"):
            break
        out.append(ln)
    return "\n".join(out)


def check_correctness(program: str, timeout: float = 5.0) -> tuple[bool, str]:
    """Run a self-contained test program in an isolated subprocess.

    The program passes iff the interpreter exits 0 within the timeout
    (assertions raise on failure). ``-I`` isolates from site-packages and env;
    the child is its own process group so a timeout can't leak grandchildren.
    """
    import signal

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(program)
        path = f.name
    try:
        proc = subprocess.Popen(
            [sys.executable, "-I", path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            start_new_session=True,
        )
        try:
            _, err = proc.communicate(timeout=timeout)
            return proc.returncode == 0, (err or "")[-500:]
        except subprocess.TimeoutExpired:
            # kill the WHOLE process group: the candidate may have spawned
            # grandchildren that a plain child-kill would orphan
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            proc.communicate()
            return False, "timeout"
    finally:
        os.unlink(path)


def pass_at_k(n: int, c: int, k: int) -> float:
    """Unbiased pass@k estimator: 1 - C(n-c, k)/C(n, k) (HumanEval paper)."""
    if n - c < k:
        return 1.0
    return 1.0 - math.prod(1.0 - k / i for i in range(n - c + 1, n + 1))


def run_humaneval(
    generate_fn: GenerateFn,
    problems: Sequence[dict],
    *,
    samples_per_task: int = 1,
    ks: Sequence[int] = (1,),
    timeout: float = 5.0,
    max_samples: int | None = None,
    out_path: str | None = None,
) -> dict:
    """HumanEval-layout functional-correctness eval.

    ``problems``: dicts with ``task_id``, ``prompt`` (function signature +
    docstring), ``test`` (defines ``check``), ``entry_point``. For each task,
    draw ``samples_per_task`` completions, repair/truncate them, execute
    ``prompt+completion`` + ``test`` + ``check(entry_point)`` in a subprocess,
    and report unbiased pass@k (reference codegen.py evaluate_human_eval +
    human_eval.evaluation protocol).
    """
    problems = list(problems)[:max_samples] if max_samples else list(problems)
    results = []
    per_task_counts = []
    for prob in problems:
        n_pass = 0
        for _ in range(samples_per_task):
            raw = generate_fn(prob["prompt"])
            completion = _continuation(raw, prob["prompt"])
            rewrite = re.search(
                rf"^def {re.escape(prob['entry_point'])}\b", completion, re.M
            )
            if rewrite:
                # full-function rewrite (markdown / repeated signature): the
                # rewrite replaces the prompt's function, but the prompt's
                # PREAMBLE (imports/helpers before the signature) must stay —
                # HumanEval prompts often open with `from typing import List`
                code = completion
                if "```" in code:
                    # strip fences FIRST — slicing from the def and then
                    # ast-parsing would choke on a trailing ``` line
                    code = extract_code(code, markdown=True) or completion
                try:
                    # clean rewrite (imports + helpers + entry): keep it all
                    ast.parse(code)
                    completion = code
                except SyntaxError:
                    m_entry = re.search(
                        rf"^def {re.escape(prob['entry_point'])}\b", code, re.M
                    )
                    # keep helper functions the model defined BEFORE the
                    # entry point (slicing from the entry def alone would
                    # NameError on them)
                    m_first = re.search(r"^(?:def|class) \w+", code, re.M)
                    starts = [m.start() for m in (m_entry, m_first) if m]
                    completion = extract_code(code[min(starts):] if starts else code)
                sig = re.search(
                    rf"^def {re.escape(prob['entry_point'])}\b",
                    prob["prompt"], re.M,
                )
                preamble = prob["prompt"][: sig.start()] if sig else ""
                body = preamble + completion
            else:
                completion = truncate_completion(completion)
                body = prob["prompt"] + completion
            program = "\n".join(
                [body, "", prob["test"], "", f"check({prob['entry_point']})"]
            )
            ok, err = check_correctness(program, timeout=timeout)
            n_pass += ok
            results.append({
                "task_id": prob["task_id"], "completion": completion,
                "passed": bool(ok), "error": "" if ok else err,
            })
        per_task_counts.append((samples_per_task, n_pass))
    metrics = {
        f"pass@{k}": sum(pass_at_k(n, c, k) for n, c in per_task_counts)
        / max(len(per_task_counts), 1)
        for k in ks
        if all(n >= k for n, _ in per_task_counts) or not per_task_counts
    }
    out = {
        "task": "humaneval",
        "accuracy": metrics.get("pass@1", 0.0),
        "n": len(problems),
        **metrics,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump({**out, "results": results}, f, indent=1)
    return out


# ---------------------------------------------------------------------------
# Zero-download smoke sets
# ---------------------------------------------------------------------------


def smoke_math() -> list[dict]:
    return [
        {"problem": "What is $2 + 3$?", "solution": "Adding, $2+3=5$. "
         "The final answer is $\\boxed{5}$.", "type": "Prealgebra", "level": "Level 1"},
        {"problem": "What is $10 \\div 4$ as a decimal?", "solution":
         "$10/4 = 2.5$. The final answer is $\\boxed{2.5}$.",
         "type": "Prealgebra", "level": "Level 2"},
    ]


def smoke_gsm8k() -> list[dict]:
    return [
        {"question": "Ali has 3 bags with 4 apples each. How many apples?",
         "answer": "3 bags times 4 apples is <<3*4=12>>12. #### 12"},
        {"question": "A pen costs $2. How much do 5 pens cost?",
         "answer": "5 * 2 = <<5*2=10>>10. #### 10"},
    ]


def smoke_humaneval() -> list[dict]:
    return [
        {
            "task_id": "Smoke/0",
            "prompt": 'def add(a, b):\n    """Return the sum of a and b."""\n',
            "test": "def check(candidate):\n    assert candidate(1, 2) == 3\n"
                    "    assert candidate(-1, 1) == 0\n",
            "entry_point": "add",
        },
        {
            "task_id": "Smoke/1",
            "prompt": 'def double(x):\n    """Return twice x."""\n',
            "test": "def check(candidate):\n    assert candidate(2) == 4\n",
            "entry_point": "double",
        },
    ]
