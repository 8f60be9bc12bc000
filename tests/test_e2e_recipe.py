"""Chained full-recipe end-to-end through the REAL CLI entry points.

The reference's documented workflow (projects/dreamllm/README.md:21-27 +
scripts/train/dreamllm/*.sh + the checkpoint mixing of
configs/stage2/base.py:44-48) is: train stage1-creation and
stage1-comprehension separately, MIX those checkpoints via per-plugin
paths, train stage2 interleaved, then SFT, then eval. This test executes
that whole chain back-to-back at toy scale via ``python -m
projects.dreamllm.train --config_file ...`` subprocesses — exactly where
cross-stage bugs (checkpoint key drift, frozen-mask mismatches, plugin
re-init) live — then drives interleaved generation, the VQA harness, and
the 4-phase FID protocol on the final SFT params.

Shell-script twin: scripts/e2e_recipe.sh (same chain, human-runnable).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = "projects/dreamllm/configs/e2e"


def _run_cli(module: str, config: str, root: str, extra=(), timeout=1500):
    """One real CLI invocation in a CPU-forced child (the sitecustomize on
    this machine pins JAX_PLATFORMS=axon at interpreter start; the entry
    points honor DREAMLLM_PLATFORM via default_setup)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update({
        "DREAMLLM_E2E_ROOT": root,
        "DREAMLLM_PLATFORM": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    })
    r = subprocess.run(
        [sys.executable, "-m", module, "--config_file", config, *extra],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, (
        f"{module} --config_file {config} failed (rc={r.returncode})\n"
        f"stdout: {r.stdout[-3000:]}\nstderr: {r.stderr[-3000:]}"
    )
    return r


def _metrics(root: str, stage: str) -> list[dict]:
    rows = []
    for f in sorted(glob.glob(os.path.join(root, stage, "logs", "*", "metrics.jsonl"))):
        with open(f) as fh:
            rows.extend(json.loads(line) for line in fh)
    assert rows, f"no metrics.jsonl under {root}/{stage}"
    return rows


def _ckpt(root: str, stage: str) -> str:
    p = os.path.join(root, stage, "checkpoint-000008")
    assert os.path.isdir(p), f"stage {stage} left no checkpoint at {p}"
    return p


def test_full_recipe_chain(tmp_path):
    root = str(tmp_path / "e2e")

    # ---- stage 1a: creation-only (dream queries + SD projector) ----
    _run_cli("projects.dreamllm.train", f"{CFG}/stage1_creation.py", root)
    _ckpt(root, "stage1_creation")
    rows = _metrics(root, "stage1_creation")
    assert all(np.isfinite(r["train/loss"]) for r in rows)
    assert all(r["train/lm_loss"] == 0.0 for r in rows)  # loss_weight_lm=0

    # ---- stage 1b: comprehension-only (vision projector) ----
    _run_cli("projects.dreamllm.train", f"{CFG}/stage1_comprehension.py", root)
    _ckpt(root, "stage1_comprehension")
    rows = _metrics(root, "stage1_comprehension")
    lm = [r["train/lm_loss"] for r in rows]
    assert all(np.isfinite(lm)) and all(r["train/vm_loss"] == 0.0 for r in rows)

    # ---- stage 2: interleaved, MIXING the two stage-1 checkpoints ----
    r2 = _run_cli("projects.dreamllm.train", f"{CFG}/stage2_interleaved.py", root)
    _ckpt(root, "stage2")
    assert "stage-mixed plugins" in r2.stdout + r2.stderr, (
        "stage2 did not load the per-plugin stage-1 checkpoints"
    )
    rows = _metrics(root, "stage2")
    lm2 = [r["train/lm_loss"] for r in rows]
    # trunk unfrozen at toy scale memorizes fast: the LM loss must drop
    assert np.mean(lm2[-2:]) < np.mean(lm2[:2]), lm2

    # ---- stage 3: SFT (whole-model resume from stage 2; NEFTune on) ----
    r3 = _run_cli("projects.dreamllm.train", f"{CFG}/sft.py", root)
    _ckpt(root, "sft")
    assert "loaded params from" in r3.stdout + r3.stderr, (
        "sft did not resume from the stage-2 checkpoint"
    )
    lm3 = [r["train/lm_loss"] for r in _metrics(root, "sft")]
    # SFT's first loss is NOT comparable to stage-2's last (the data format
    # shifts to label-masked conversations and NEFTune noises the embeddings)
    # — continuity is asserted via the "loaded params from" log above; here
    # assert it trains: the loss must drop over the 8 toy steps
    assert np.mean(lm3[-2:]) < np.mean(lm3[:2]), lm3

    # ---- interleaved generation from the SFT params ----
    ri = _run_cli(
        "projects.dreamllm.inference", f"{CFG}/sft.py", root,
        extra=("+mode=interleaved", "+prompt=a story about a robot",
               "+max_new_tokens=16", "+max_images=1", "+num_inference_steps=2"),
    )
    assert "wrote interleaved document" in ri.stdout + ri.stderr
    docs = glob.glob(os.path.join(root, "sft", "logs", "*", "samples", "document.md"))
    assert docs, "inference left no document.md under the sft run dir"

    # ---- VQA smoke through the eval CLI ----
    assets = tmp_path / "assets"
    assets.mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    samples = []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            assets / f"img{i}.png")
        samples.append({"id": i, "question": f"what is in image {i}?",
                        "image": f"img{i}.png", "answers": ["a pattern"] * 10})
    (assets / "vqa.json").write_text(json.dumps(samples))
    rv = _run_cli(
        "projects.dreamllm.eval_vqa", f"{CFG}/sft.py", root,
        extra=("+task=vqav2", f"+data_json={assets}/vqa.json",
               f"+image_root={assets}", "+eval_batch_size=4", "+max_new_tokens=8"),
    )
    merged = [line for line in rv.stdout.splitlines() if line.startswith("{")]
    assert merged, "eval_vqa printed no merged-result JSON"
    score = json.loads(merged[-1])
    assert score["n"] == 4 and np.isfinite(score["score"])

    # ---- FID-protocol smoke through the eval CLI ----
    mkref = (
        "import os, numpy as np, json;"
        "os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from dreamllm_tpu.eval.fid import activation_statistics, init_inception_params;"
        "from dreamllm_tpu.eval.text2img import extract_inception_features;"
        "ref=np.random.default_rng(1).random((8,32,32,3)).astype('float32');"
        "feats=extract_inception_features(init_inception_params(jax.random.PRNGKey(2)), ref, 8);"
        "mu,sigma=activation_statistics(feats);"
        f"np.savez(r'{assets}/fid_ref.npz', mu=mu, sigma=sigma);"
        f"json.dump(['a red square','a blue circle'], open(r'{assets}/caps.json','w'))"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    rr = subprocess.run([sys.executable, "-c", mkref], cwd=REPO, env=env,
                        capture_output=True, text=True, timeout=600)
    assert rr.returncode == 0, rr.stderr[-2000:]
    rf = _run_cli(
        "projects.dreamllm.eval_t2i", f"{CFG}/sft.py", root,
        extra=(f"+captions_json={assets}/caps.json",
               f"+fid_reference={assets}/fid_ref.npz",
               "+num_seeds=1", "+num_inference_steps=2", "+fid_image_size=32",
               "+sample_batch_size=2", "+max_captions=2"),
    )
    m = [line for line in (rf.stdout + rf.stderr).splitlines() if "FID:" in line]
    assert m, "eval_t2i printed no FID"
    fid = float(m[-1].split("FID:")[1].split()[0])
    assert np.isfinite(fid) and fid >= 0.0, fid
