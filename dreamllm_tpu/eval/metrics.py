"""Evaluation metrics: VQA accuracy, ANLS, POPE, CIDEr-D.

Self-contained ports of the metric definitions the reference vendors
(omni/eval/vqa/pyevaltools/vqaEval.py — the official VQA normalization +
min(matches/3, 1) consensus accuracy; doctextVQAeval.py — ANLS; POPE yes/no
stats; pycocoevalcap CIDEr-D). Pure numpy/python — metrics are host-side.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

# --- VQA answer normalization (vqaEval.py conventions) ---

_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't", "dont": "don't",
    "hadnt": "hadn't", "hasnt": "hasn't", "havent": "haven't", "hed": "he'd",
    "hes": "he's", "im": "i'm", "isnt": "isn't", "itd": "it'd", "itll": "it'll",
    "lets": "let's", "shed": "she'd", "shes": "she's", "shouldve": "should've",
    "shouldnt": "shouldn't", "thats": "that's", "theres": "there's", "theyd": "they'd",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've", "wasnt": "wasn't",
    "werent": "weren't", "whats": "what's", "wheres": "where's", "wholl": "who'll",
    "whos": "who's", "wont": "won't", "wouldve": "would've", "wouldnt": "wouldn't",
    "youd": "you'd", "youll": "you'll", "youre": "you're", "youve": "you've",
}
_NUMBER_WORDS = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9", "ten": "10",
}
_ARTICLES = {"a", "an", "the"}
_PUNCT = re.compile(r"[;/\[\]\"{}()=+\\_\-><@`,?!.]")


def normalize_vqa_answer(ans: str) -> str:
    ans = ans.replace("\n", " ").replace("\t", " ").strip().lower()
    ans = _PUNCT.sub("", ans)
    ans = ans.replace(":", "")
    words = []
    for w in ans.split():
        w = _NUMBER_WORDS.get(w, w)
        w = _CONTRACTIONS.get(w, w)
        if w not in _ARTICLES:
            words.append(w)
    return " ".join(words)


def vqa_accuracy(prediction: str, gt_answers: list[str]) -> float:
    """Official consensus accuracy: avg over leave-one-out subsets of
    min(#matches/3, 1)."""
    pred = normalize_vqa_answer(prediction)
    gts = [normalize_vqa_answer(a) for a in gt_answers]
    if len(gts) == 1:
        return float(pred == gts[0])
    accs = []
    for i in range(len(gts)):
        others = gts[:i] + gts[i + 1:]
        matches = sum(1 for a in others if a == pred)
        accs.append(min(matches / 3.0, 1.0))
    return sum(accs) / len(accs)


# --- ANLS (DocVQA / InfographicVQA) ---


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def anls(prediction: str, gt_answers: list[str], threshold: float = 0.5) -> float:
    """Average Normalized Levenshtein Similarity (max over gts, thresholded)."""
    pred = prediction.strip().lower()
    best = 0.0
    for gt in gt_answers:
        g = gt.strip().lower()
        denom = max(len(pred), len(g))
        sim = 1.0 - _levenshtein(pred, g) / denom if denom else 1.0
        best = max(best, sim)
    return best if best >= threshold else 0.0


# --- POPE (hallucination yes/no) ---


def pope_metrics(predictions: list[str], labels: list[str]) -> dict:
    def to_bool(s):
        s = s.strip().lower()
        return "yes" in s[:5]

    tp = fp = tn = fn = 0
    for p, l in zip(predictions, labels):
        pb, lb = to_bool(p), to_bool(l)
        if pb and lb:
            tp += 1
        elif pb and not lb:
            fp += 1
        elif not pb and not lb:
            tn += 1
        else:
            fn += 1
    n = max(tp + fp + tn + fn, 1)
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return {
        "accuracy": (tp + tn) / n,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "yes_ratio": (tp + fp) / n,
    }


# --- CIDEr-D (caption) ---


def _ngrams(tokens: list[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def cider_d(
    candidates: dict[str, str],
    references: dict[str, list[str]],
    n_max: int = 4,
    sigma: float = 6.0,
) -> float:
    """CIDEr-D over {id: caption} vs {id: [refs]} (pycocoevalcap semantics:
    tf-idf n-gram cosine with gaussian length penalty, scaled by 10)."""
    ids = list(candidates)
    # document frequency over reference sets
    df = [defaultdict(int) for _ in range(n_max)]
    for rid in ids:
        for n in range(n_max):
            seen = set()
            for ref in references[rid]:
                seen |= set(_ngrams(ref.lower().split(), n + 1).keys())
            for g in seen:
                df[n][g] += 1
    log_docs = math.log(max(len(ids), 1))

    def tfidf_vec(counts: Counter, n: int):
        vec, norm = {}, 0.0
        length = sum(counts.values())
        for g, c in counts.items():
            idf = log_docs - math.log(max(df[n][g], 1))
            w = (c / length if length else 0.0) * idf
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    scores = []
    for rid in ids:
        cand_toks = candidates[rid].lower().split()
        per_n = []
        for n in range(n_max):
            cvec, cnorm = tfidf_vec(_ngrams(cand_toks, n + 1), n)
            sims = []
            for ref in references[rid]:
                ref_toks = ref.lower().split()
                rvec, rnorm = tfidf_vec(_ngrams(ref_toks, n + 1), n)
                num = sum(min(cvec.get(g, 0.0), v) * v for g, v in rvec.items())
                denom = cnorm * rnorm
                sim = num / denom if denom > 0 else 0.0
                delta = len(cand_toks) - len(ref_toks)
                sim *= math.exp(-(delta**2) / (2 * sigma**2))
                sims.append(sim)
            per_n.append(sum(sims) / max(len(sims), 1))
        scores.append(10.0 * sum(per_n) / n_max)
    return sum(scores) / max(len(scores), 1)
