"""VQA / captioning inference harness.

TPU-native equivalent of the reference's VQA driver
(omni/eval/vqa/{eval_dreamllm,vqa_inference,multi_hardware_eval}.py):
prompt = system + image span + question through the vicuna template
(vqa_inference.py:97-215, 194-201), batched greedy/beam decode, task/metric
dispatch (utils/eval_utils.py:75-124). The subprocess-per-GPU sharding
(multi_hardware_eval.py:25-64) becomes `jax.process_index()`-strided data
sharding — no subprocesses, one SPMD program.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dreamllm_tpu.data.conversation import TEMPLATES, render_prompt
from dreamllm_tpu.data.dataset_types import Message
from dreamllm_tpu.eval.metrics import anls, cider_d, pope_metrics, vqa_accuracy
from dreamllm_tpu.generation import SamplingConfig, generate_text
from dreamllm_tpu.models.clip import clip_preprocess
from dreamllm_tpu.models.dreamllm import DreamLLMConfig, multimodal_embed


@dataclasses.dataclass
class VQATask:
    name: str
    metric: str           # "vqa_acc" | "anls" | "em" | "relaxed" | "pope" | "cider" | "exact"
    prompt_suffix: str = ""   # e.g. "\nAnswer the question using a single word or phrase."
    fixed_question: str | None = None  # tasks with a constant prompt (OCR)


# task table — full map of the reference's task/metric dispatch
# (utils/eval_utils.py:75-124: task_mapping + metric_mapping + OCR_prompt)
_WORD = "\nAnswer the question using a single word or phrase."
TASKS = {
    # VQA consensus accuracy
    "vqav2": VQATask("vqav2", "vqa_acc", _WORD),
    "okvqa": VQATask("okvqa", "vqa_acc", _WORD),
    "vizwiz": VQATask("vizwiz", "vqa_acc", "\nWhen the provided information is insufficient, respond with 'Unanswerable'.\nAnswer the question using a single word or phrase."),
    "textvqa": VQATask("textvqa", "vqa_acc", _WORD),
    # ANLS
    "docvqa": VQATask("docvqa", "anls", _WORD),
    "infovqa": VQATask("infovqa", "anls", _WORD),
    "stvqa": VQATask("stvqa", "anls", _WORD),
    # exact match ("EM")
    "tallyqa": VQATask("tallyqa", "em", _WORD),
    "ocrvqa": VQATask("ocrvqa", "em", _WORD),
    "ai2d": VQATask("ai2d", "em", _WORD),
    # relaxed accuracy ("RA", ±5% numeric tolerance)
    "chartqa": VQATask("chartqa", "relaxed", _WORD),
    # OCR transcription (fixed prompt, exact-match scoring; OCR_prompt)
    "ocr": VQATask("ocr", "em", "", fixed_question="what is written in the image?"),
    # POPE hallucination splits (eval_utils.py POPE_random/popular/adversarial)
    "pope": VQATask("pope", "pope", _WORD),
    "pope_random": VQATask("pope_random", "pope", _WORD),
    "pope_popular": VQATask("pope_popular", "pope", _WORD),
    "pope_adversarial": VQATask("pope_adversarial", "pope", _WORD),
    # captioning (CIDEr-D)
    "coco_caption": VQATask("coco_caption", "cider", ""),
    "nocaps": VQATask("nocaps", "cider", ""),
    "textcaps": VQATask("textcaps", "cider", ""),
    "vizwiz_caption": VQATask("vizwiz_caption", "cider", ""),
    "screen2words": VQATask("screen2words", "cider", ""),
    "image_paragraph": VQATask("image_paragraph", "cider", ""),
    # multiple-choice letters
    "mmbench": VQATask("mmbench", "exact", "\nAnswer with the option's letter from the given choices directly."),
    "mmvet": VQATask("mmvet", "exact", ""),
}


def build_vqa_prompt(cfg: DreamLLMConfig, question: str, template: str = "vicuna_v1.1") -> str:
    """system + <im_start> + N×<im_patch> + <im_end> + question
    (vqa_inference.py:194-201). Returns the text with literal special tokens;
    ids are assembled by encode_vqa_prompt."""
    image_tokens = "<im_start>" + "<im_patch>" * cfg.image_embed_len + "<im_end>"
    return render_prompt(
        TEMPLATES[template],
        [Message("user", image_tokens + "\n" + question)],
    )


def encode_vqa_prompt(
    tokenizer, cfg: DreamLLMConfig, question: str, template: str = "vicuna_v1.1"
) -> tuple[np.ndarray, int]:
    """→ (ids [S], image_position). Splits around the image span so plain
    text tokenization never sees special tokens."""
    st = cfg.special_tokens
    image_tokens = "<im_start>" + "<im_patch>" * cfg.image_embed_len + "<im_end>"
    prompt = build_vqa_prompt(cfg, question, template)
    before, after = prompt.split(image_tokens)
    ids = [st.bos] + tokenizer.encode(before)
    image_pos = len(ids) + 1
    ids += [st.im_start] + [st.im_patch] * cfg.image_embed_len + [st.im_end]
    ids += tokenizer.encode(after)
    return np.asarray(ids, np.int32), image_pos


def shard_for_process(items: Sequence, index: int | None = None, count: int | None = None):
    """Strided split across hosts (replaces CUDA_VISIBLE_DEVICES subprocess
    pools, multi_hardware_eval.py:25-64)."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    return list(items[index::count])


def run_vqa(
    params,
    cfg: DreamLLMConfig,
    tokenizer,
    samples: Iterable[dict],      # {question, image (HWC [0,1] float), answers|label, id}
    *,
    task: str = "vqav2",
    max_new_tokens: int = 32,
    batch_size: int = 8,
    num_beams: int = 1,
    template: str = "vicuna_v1.1",
    out_path: str | None = None,
) -> dict:
    """Batched inference + metric. Returns {"score": ..., "predictions": [...]}."""
    t = TASKS[task]
    samples = list(samples)
    preds = []

    # conversation-separator stopping (reference KeywordsStoppingCriteria,
    # vqa_inference.py:96-146): templates whose separator is not EOS (the
    # ###-separated vicuna_v0 style) must not decode past the turn boundary.
    # Single-token separators halt device-side; everything is truncated from
    # the decoded text either way.
    from dreamllm_tpu.generation.stopping import (
        stops_for_template, truncate_at_stop,
    )

    stop_strings, halt_ids = stops_for_template(
        TEMPLATES[template], tokenizer, eos_id=cfg.special_tokens.eos
    )

    scfg = SamplingConfig(
        greedy=True, max_new_tokens=max_new_tokens,
        eos_token_id=cfg.special_tokens.eos, pad_token_id=cfg.special_tokens.pad,
        halt_tokens=halt_ids,
    )

    # one compiled embed+decode program per (batch, bucketed-seq) shape:
    # eager dispatch per op is the throughput killer on remote-attached TPUs,
    # and bucketing prompt lengths to 64 keeps recompiles rare
    @jax.jit
    def embed_and_beam(params, ids, lens, img_pos, imgs):
        from dreamllm_tpu.generation.sampler import beam_search

        embeds = multimodal_embed(params, cfg, ids, images=imgs, image_positions=img_pos)
        out = beam_search(
            params["llm"], cfg.llm, ids, lens,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
            eos_token_id=cfg.special_tokens.eos,
            pad_token_id=cfg.special_tokens.pad,
            halt_tokens=halt_ids,
            inputs_embeds=embeds,
        )
        out["lengths"] = jnp.sum(out["tokens"] != cfg.special_tokens.pad, axis=-1)
        return out

    @jax.jit
    def embed_and_generate(params, ids, lens, img_pos, imgs, rng):
        embeds = multimodal_embed(params, cfg, ids, images=imgs, image_positions=img_pos)
        return generate_text(params["llm"], cfg.llm, ids, lens, scfg,
                             rng=rng, inputs_embeds=embeds)

    for i in range(0, len(samples), batch_size):
        chunk = samples[i : i + batch_size]
        encoded = [
            encode_vqa_prompt(
                tokenizer, cfg,
                (t.fixed_question or s["question"]) + t.prompt_suffix, template,
            )
            for s in chunk
        ]
        maxlen = -(-max(len(e[0]) for e in encoded) // 64) * 64  # bucket to 64
        b = len(chunk)
        ids = np.zeros((b, maxlen), np.int32)
        lens = np.zeros((b,), np.int32)
        img_pos = np.full((b, 1), -1, np.int32)
        for j, (e, pos) in enumerate(encoded):
            ids[j, : len(e)] = e
            lens[j] = len(e)
            img_pos[j, 0] = pos
        # preprocess the whole chunk in ONE device dispatch and keep the
        # result on device: a per-sample eager resize + host fetch costs ~3
        # tunnel round-trips and a ~600 KB pull PER SAMPLE on the remote TPU
        raws = [np.asarray(chunk[j]["image"], np.float32) for j in range(b)]
        if len({r.shape for r in raws}) == 1:
            pre = clip_preprocess(jnp.asarray(np.stack(raws)), cfg.vision.image_size)
        else:  # mixed raw sizes: one dispatch per size is unavoidable
            pre = jnp.concatenate([
                clip_preprocess(jnp.asarray(r)[None], cfg.vision.image_size)
                for r in raws
            ])
        imgs = pre[:, None]  # [b, 1, S, S, 3], stays on device

        if num_beams > 1:
            # jitted like the greedy path: an eager beam loop dispatches
            # every op through the remote tunnel (~24 ms each)
            out = embed_and_beam(
                params, jnp.asarray(ids), jnp.asarray(lens),
                jnp.asarray(img_pos), jnp.asarray(imgs),
            )
        else:
            out = embed_and_generate(
                params, jnp.asarray(ids), jnp.asarray(lens),
                jnp.asarray(img_pos), jnp.asarray(imgs), jax.random.PRNGKey(i),
            )
        for j, s in enumerate(chunk):
            n = int(out["lengths"][j])
            text = tokenizer.decode(np.asarray(out["tokens"][j, :n]).tolist()).strip()
            if stop_strings:
                text = truncate_at_stop(text, stop_strings)
            preds.append({"id": s.get("id", i + j), "prediction": text, **{
                k: s[k] for k in ("answers", "label", "references") if k in s
            }})

    score = score_predictions(preds, t.metric)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"task": task, "score": score, "predictions": preds}, f)
    return {"score": score, "predictions": preds}


def score_predictions(preds: list[dict], metric: str) -> float:
    if metric == "vqa_acc":
        return float(np.mean([vqa_accuracy(p["prediction"], p["answers"]) for p in preds]))
    if metric == "anls":
        return float(np.mean([anls(p["prediction"], p["answers"]) for p in preds]))
    if metric == "pope":
        return pope_metrics([p["prediction"] for p in preds],
                            [p["label"] for p in preds])["f1"]
    if metric == "cider":
        cands = {str(p["id"]): p["prediction"] for p in preds}
        refs = {str(p["id"]): p["references"] for p in preds}
        return cider_d(cands, refs)
    if metric == "em":
        from dreamllm_tpu.eval.metrics import exact_match

        return float(np.mean([exact_match(p["prediction"], p["answers"]) for p in preds]))
    if metric == "relaxed":
        from dreamllm_tpu.eval.metrics import relaxed_accuracy

        return float(np.mean([relaxed_accuracy(p["prediction"], p["answers"]) for p in preds]))
    if metric == "exact":
        from dreamllm_tpu.eval.mmbench import extract_option_letter

        def _hit(p):
            label = str(p.get("label", "")).strip()
            pred = p["prediction"].strip()
            if len(label) == 1 and label.upper() in "ABCD":
                # letter-choice task (mmbench-style): 'A.' / 'The answer is
                # A' / option-text answers must not be scored as wrong
                letter = extract_option_letter(pred, p.get("options"))
                return letter == label.upper()
            return pred.lower() == label.lower()

        return float(np.mean([_hit(p) for p in preds]))
    raise ValueError(metric)


def merge_prediction_shards(paths: list[str], out_path: str) -> dict:
    """Merge per-host shard files (eval_dreamllm.py:46-47 merge_outputs)."""
    if not paths:
        raise ValueError("merge_prediction_shards: no shard files to merge")
    all_preds, task = [], None
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        task = d["task"]
        all_preds += d["predictions"]
    metric = TASKS[task].metric
    score = score_predictions(all_preds, metric)
    with open(out_path, "w") as f:
        json.dump({"task": task, "score": score, "predictions": all_preds}, f)
    return {"task": task, "score": score, "n": len(all_preds)}
