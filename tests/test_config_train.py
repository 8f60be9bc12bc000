"""Config system + checkpointing + trainer loop tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamllm_tpu.config import LazyCall, LazyConfig, instantiate
from dreamllm_tpu.config.arg_parser import LazyArgumentParser, LazyArguments, from_dict
from dreamllm_tpu.train.checkpoints import (
    checkpoint_step,
    latest_checkpoint,
    load_opt_state,
    load_params,
    save_checkpoint,
)


def target_fn(a, b=2):
    return a + b


class TestLazyConfig:
    def test_lazycall_freezes(self):
        rec = LazyCall(target_fn)(a=1, b=3)
        assert rec["_target_"].endswith("target_fn")
        assert instantiate(rec) == 4

    def test_nested_instantiate(self):
        rec = {"outer": LazyCall(target_fn)(a=LazyCall(target_fn)(a=1), b=1)}
        out = instantiate(rec)
        assert out["outer"] == 4  # inner: 1+2=3, outer: 3+1

    def test_load_and_overrides(self, tmp_path):
        p = tmp_path / "cfg.py"
        p.write_text(
            "config = dict(model=dict(lr=1e-3, name='base'), data=dict(bs=8))\n"
        )
        cfg = LazyConfig.load(str(p))
        assert cfg["model"]["lr"] == 1e-3
        LazyConfig.apply_overrides(cfg, ["model.lr=5e-4", "data.bs=16", "+new.key=1"])
        assert cfg["model"]["lr"] == 5e-4
        assert cfg["data"]["bs"] == 16
        assert cfg["new"]["key"] == 1
        with pytest.raises(KeyError):
            LazyConfig.apply_overrides(cfg, ["nonexistent.path=1"])

    def test_snapshot_roundtrip(self, tmp_path):
        cfg = {"a": [1, 2], "b": {"c": "x"}}
        path = str(tmp_path / "snap.py")
        LazyConfig.save(cfg, path)
        back = LazyConfig.load(path)
        assert back == cfg

    def test_config_files_are_python(self, tmp_path):
        p = tmp_path / "cfg.py"
        p.write_text(
            "base = 10\nconfig = dict(lr=base * 2, layers=[i for i in range(3)])\n"
        )
        cfg = LazyConfig.load(str(p))
        assert cfg["lr"] == 20 and cfg["layers"] == [0, 1, 2]


class TestArgParser:
    def test_parse_and_hydrate(self, tmp_path):
        p = tmp_path / "cfg.py"
        p.write_text("config = dict(seed=7, model=dict(width=32))\n")
        args, cfg = LazyArgumentParser(LazyArguments).parse(
            ["--config_file", str(p), "model.width=64", "seed=9"]
        )
        assert args.seed == 9
        assert cfg["model"]["width"] == 64

    def test_from_dict_strict(self):
        @dataclasses.dataclass
        class Inner:
            x: int = 0

        @dataclasses.dataclass
        class Outer:
            inner: Inner = dataclasses.field(default_factory=Inner)
            name: str = ""

        out = from_dict(Outer, {"inner": {"x": 3}, "name": "n"})
        assert out.inner.x == 3
        with pytest.raises(ValueError):
            from_dict(Outer, {"bogus": 1})


class TestCheckpoints:
    def _params(self, seed=0):
        k = jax.random.PRNGKey(seed)
        return {
            "llm": {"w": jax.random.normal(k, (4, 4)), "norm": jnp.ones((4,))},
            "dream_embedding": {"queries": jax.random.normal(k, (2, 4))},
        }

    def test_save_load_roundtrip(self, tmp_path):
        root = str(tmp_path / "ckpts")
        params = self._params()
        opt = {"mu": jax.tree.map(jnp.zeros_like, params)}
        path = save_checkpoint(root, 100, params, opt)
        assert checkpoint_step(path) == 100
        assert latest_checkpoint(root) == path
        back = load_params(path, like=params)
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        opt_back = load_opt_state(path, like=opt)
        assert jax.tree.structure(opt_back) == jax.tree.structure(opt)

    def test_stage_mixing_override(self, tmp_path):
        rootA, rootB = str(tmp_path / "a"), str(tmp_path / "b")
        pa, pb = self._params(0), self._params(1)
        pathA = save_checkpoint(rootA, 10, pa)
        pathB = save_checkpoint(rootB, 20, pb)
        mixed = load_params(pathA, like=pa, overrides={"dream_embedding": pathB})
        np.testing.assert_array_equal(
            np.asarray(mixed["llm"]["w"]), np.asarray(pa["llm"]["w"])
        )
        np.testing.assert_array_equal(
            np.asarray(mixed["dream_embedding"]["queries"]),
            np.asarray(pb["dream_embedding"]["queries"]),
        )

    def test_latest_picks_highest(self, tmp_path):
        root = str(tmp_path / "c")
        save_checkpoint(root, 5, self._params())
        p2 = save_checkpoint(root, 50, self._params())
        assert latest_checkpoint(root) == p2


class TestTrainerLoop:
    def test_loop_logs_saves_resumes(self, tmp_path):
        from dreamllm_tpu.train.step import TrainState
        from dreamllm_tpu.train.trainer import Trainer, TrainerConfig

        # toy quadratic problem exercising the full loop machinery
        import optax

        params = {"llm": {"w": jnp.ones((4,)) * 5.0}}
        tx = optax.sgd(0.1)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))

        @jax.jit
        def step_fn(state, batch, rng):
            def loss_fn(p):
                return jnp.sum((p["llm"]["w"] - batch["target"]) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(g, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(state.step + 1, new_params, opt_state), {"loss": loss}

        def data():
            while True:
                yield {"target": jnp.zeros((4,))}

        out_dir = str(tmp_path / "run")
        cfg = TrainerConfig(max_steps=10, log_steps=5, save_steps=5, output_dir=out_dir)
        tr = Trainer(cfg, step_fn, data(), state)
        final = tr.train()
        assert int(final.step) == 10
        assert float(jnp.abs(final.params["llm"]["w"]).sum()) < 5.0  # converging
        assert latest_checkpoint(out_dir) is not None

        # resume: new trainer continues from step 10 (no more steps to run)
        tr2 = Trainer(cfg, step_fn, data(), state)
        final2 = tr2.train()
        assert int(final2.step) == 10
