"""Every project entry point and config must parse and import.

Regression guard: projects/stable_diffusion/train.py shipped for a while
with an IndentationError because nothing imported it — entry points that
only run under a launcher need at least a compile check.
"""
from __future__ import annotations

import ast
import importlib
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
PROJECT_FILES = sorted(
    p for p in (ROOT / "projects").rglob("*.py") if "__pycache__" not in p.parts
)
SCRIPT_FILES = sorted(
    p for p in (ROOT / "scripts").rglob("*.py") if "__pycache__" not in p.parts
)


@pytest.mark.parametrize(
    "path", PROJECT_FILES + SCRIPT_FILES,
    ids=lambda p: str(p.relative_to(ROOT)),
)
def test_parses(path):
    ast.parse(path.read_text(), filename=str(path))


ENTRY_MODULES = [
    "projects.dreamllm.train",
    "projects.dreamllm.inference",
    "projects.dreamllm.eval_nlp",
    "projects.dreamllm.serve",
    "projects.dreamllm.eval_t2i",
    "projects.dreamllm.eval_vqa",
    "projects.dreamllm_sdxl.train",
    "projects.dreamllm_sdxl.inference",
    "projects.llava.train",
    "projects.stable_diffusion.train",
    "projects.stable_diffusion.train_sdxl",
    "projects.stable_diffusion.sample",
]


@pytest.mark.parametrize("mod", ENTRY_MODULES)
def test_imports(mod):
    try:
        importlib.import_module(mod)
    except ModuleNotFoundError as e:
        pytest.skip(f"module not present: {e}")


CONFIG_FILES = sorted(
    p for p in (ROOT / "projects").rglob("configs/**/*.py")
    if "__pycache__" not in p.parts and p.name != "__init__.py"
)


@pytest.mark.parametrize(
    "path", CONFIG_FILES, ids=lambda p: str(p.relative_to(ROOT)),
)
def test_config_hydrates(path):
    """Every shipped config must load AND hydrate into the typed model/head
    dataclasses (schema drift in a config is otherwise only caught by a
    full training launch). Param init is deliberately skipped."""
    from dreamllm_tpu.config import LazyConfig

    try:
        cfg = LazyConfig.load(str(path))
    except ValueError as e:
        if "must define a `config` object" in str(e):
            return  # shared fragment (common.py) — imported by real configs
        raise
    if not isinstance(cfg, dict) or "trainer" not in cfg:
        return  # non-train configs
    if {"model", "sd_head"} <= set(cfg):  # dreamllm-family joint configs
        from projects.dreamllm.train import build_model_cfg

        model_cfg, head_cfg = build_model_cfg(cfg)
        assert model_cfg.llm.hidden_size == head_cfg.llm_hidden_size
    elif "sd_head" in cfg:  # plain-SD project (head only)
        from dreamllm_tpu.config import instantiate
        from dreamllm_tpu.models.sd.head import SDHeadConfig

        h = instantiate(cfg["sd_head"])
        if cfg.get("head_type") == "sdxl":
            from dreamllm_tpu.models.sd.sdxl import SDXLHeadConfig

            head_cfg = SDXLHeadConfig(**h)
            assert head_cfg.unet.addition_embed_type == "text_time"
        else:
            head_cfg = SDHeadConfig(**h)
        assert head_cfg.projector_cfg().in_dim == head_cfg.llm_hidden_size
    elif "model" in cfg:  # llava project (LLM+vision only)
        from dreamllm_tpu.config import instantiate
        from dreamllm_tpu.models.dreamllm import DreamLLMConfig

        m = instantiate(cfg["model"])
        frozen = tuple(m.pop("frozen", ()))
        model_cfg = DreamLLMConfig(**m, frozen=frozen)
        patches = model_cfg.vision.image_size // model_cfg.vision.patch_size
        assert model_cfg.image_embed_len == patches * patches
