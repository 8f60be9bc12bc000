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

    def test_save_total_limit_prunes_oldest(self, tmp_path):
        """HF save_total_limit semantics (the reference's recipes set 3,
        dreamllm_sdxl stage1/base.py:81): after each save only the newest N
        checkpoint dirs survive, and the latest is always loadable."""
        import os

        from dreamllm_tpu.train.step import TrainState
        from dreamllm_tpu.train.trainer import Trainer, TrainerConfig

        import optax

        params = {"llm": {"w": jnp.ones((4,))}}
        tx = optax.sgd(0.1)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params))

        @jax.jit
        def step_fn(state, batch, rng):
            return TrainState(state.step + 1, state.params, state.opt_state), {"loss": jnp.float32(0)}

        def data():
            while True:
                yield {}

        out_dir = str(tmp_path / "run")
        cfg = TrainerConfig(max_steps=10, log_steps=10, save_steps=2,
                            output_dir=out_dir, save_total_limit=2)
        Trainer(cfg, step_fn, data(), state).train()
        kept = sorted(n for n in os.listdir(out_dir) if n.startswith("checkpoint-"))
        assert kept == ["checkpoint-000008", "checkpoint-000010"], kept
        assert latest_checkpoint(out_dir).endswith("checkpoint-000010")

    def test_resume_continues_data_and_rng(self, tmp_path):
        """Train 5 steps, 'kill', resume: the sample sequence CONTINUES
        (batches 5..9) instead of repeating from the stream start, and the
        host RNG continues too (reference trainer.py:698-757)."""
        from dreamllm_tpu.train.step import TrainState
        from dreamllm_tpu.train.trainer import Trainer, TrainerConfig
        import optax

        def make_state():
            params = {"llm": {"w": jnp.ones((4,)) * 5.0}}
            tx = optax.sgd(0.01)
            return tx, TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                  opt_state=tx.init(params))

        consumed: list[int] = []
        rngs_seen: list[tuple] = []

        def make_step(tx):
            def step_fn(state, batch, rng):
                rngs_seen.append(tuple(np.asarray(jax.device_get(rng)).tolist()))

                def loss_fn(p):
                    return jnp.sum((p["llm"]["w"] - batch["target"]) ** 2)

                loss, g = jax.value_and_grad(loss_fn)(state.params)
                updates, opt_state = tx.update(g, state.opt_state, state.params)
                new_params = optax.apply_updates(state.params, updates)
                return TrainState(state.step + 1, new_params, opt_state), {"loss": loss}
            return step_fn

        def data():
            i = 0
            while True:
                consumed.append(i)
                yield {"target": jnp.full((4,), float(i % 3))}
                i += 1

        out = str(tmp_path / "run")
        # ---- run 1: 5 steps, save at 5 ----
        tx, state = make_state()
        cfg = TrainerConfig(max_steps=5, log_steps=0, save_steps=5, output_dir=out)
        Trainer(cfg, make_step(tx), data(), state, rng=jax.random.PRNGKey(7)).train()
        run1_consumed = list(consumed)
        run1_rngs = list(rngs_seen)
        assert run1_consumed == [0, 1, 2, 3, 4]

        # ---- run 2: fresh process state, resume to 10 ----
        consumed.clear()
        rngs_seen.clear()
        tx, state = make_state()
        cfg = TrainerConfig(max_steps=10, log_steps=0, save_steps=10, output_dir=out)
        Trainer(cfg, make_step(tx), data(), state, rng=jax.random.PRNGKey(7)).train()
        # data skipped forward: steps 5..9 consume batches 5..9 (the first 5
        # are drained during resume, not trained on)
        assert consumed == list(range(10))
        assert rngs_seen[:1] != run1_rngs[:1] or len(rngs_seen) == 5
        # RNG continuity: run 2's first step key equals what a continuous
        # 10-step run would use at its 6th step (index 5)
        key = jax.random.PRNGKey(7)
        for _ in range(6):
            key, sub = jax.random.split(key)
        expected = tuple(np.asarray(jax.device_get(sub)).tolist())
        assert rngs_seen[0] == expected

        # ---- uninterrupted 10-step reference produces the same final params
        consumed.clear(); rngs_seen.clear()
        tx, state = make_state()
        out2 = str(tmp_path / "run_cont")
        cfg = TrainerConfig(max_steps=10, log_steps=0, save_steps=100, output_dir=out2)
        final_cont = Trainer(cfg, make_step(tx), data(), state,
                             rng=jax.random.PRNGKey(7)).train()
        from dreamllm_tpu.train.checkpoints import load_params
        final_resumed = load_params(latest_checkpoint(out) or "", )
        np.testing.assert_allclose(
            np.asarray(final_cont.params["llm"]["w"]),
            np.asarray(final_resumed["llm"]["w"]), rtol=1e-6,
        )

    def test_shardstream_state_roundtrip(self, tmp_path):
        """ShardStream fast-forwards to the saved position: sequence
        continues instead of repeating."""
        import io
        import json
        import tarfile

        from dreamllm_tpu.data.webdataset import ShardStream

        shard = str(tmp_path / "00000.tar")
        with tarfile.open(shard, "w") as tf:
            for i in range(20):
                d = json.dumps({"v": i}).encode()
                ti = tarfile.TarInfo(f"{i:05d}.json")
                ti.size = len(d)
                tf.addfile(ti, io.BytesIO(d))

        def make():
            return ShardStream([shard], shuffle_buffer=4, seed=3, resample=False,
                               map_fn=lambda s: s["json"]["v"])

        ref = list(make())  # the full deterministic sequence
        s1 = make()
        it = iter(s1)
        first = [next(it) for _ in range(7)]
        state = s1.state_dict()
        assert first == ref[:7]

        s2 = make()
        s2.load_state_dict(state)
        rest = list(s2)
        assert rest == ref[7:]

    def test_nonfinite_update_skipped_inside_jit(self):
        """The NaN filter lives INSIDE the jitted step (no per-step host
        float()): a NaN batch drops the params/opt-state update on-device
        and reports aux['update_skipped']=1."""
        from dreamllm_tpu.models.clip import CLIPVisionConfig
        from dreamllm_tpu.models.dreamllm import DreamLLMConfig
        from dreamllm_tpu.models.llama import LlamaConfig
        from dreamllm_tpu.models.projector import ProjectorConfig
        from dreamllm_tpu.models.dreamllm import init_dreamllm_params
        from dreamllm_tpu.train import (
            OptimizerConfig, init_train_state, make_optimizer, make_train_step,
        )

        cfg = DreamLLMConfig(
            llm=LlamaConfig(vocab_size=40000, hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, max_position_embeddings=64),
            vision=CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                    num_hidden_layers=2, num_attention_heads=2,
                                    image_size=8, patch_size=4),
            vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
            n_dream_queries=4, image_embed_len=4,
        )
        params = init_dreamllm_params(jax.random.PRNGKey(0), cfg)
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10))
        state = init_train_state(params, tx)
        step = make_train_step(cfg, tx, head_in_params=False, grad_accum=1,
                               remat=False, use_flash=False, donate=False)

        ids = np.ones((2, 16), np.int64)
        batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids)}

        # finite batch: update applied
        s1, aux1 = step(state, batch, jax.random.PRNGKey(1))
        assert float(aux1["update_skipped"]) == 0.0
        assert float(jnp.abs(s1.params["llm"]["final_norm"]
                             - state.params["llm"]["final_norm"]).max()) > 0

        # poison params -> NaN loss -> update dropped, state bit-identical
        bad_params = dict(state.params)
        bad_params["llm"] = dict(bad_params["llm"])
        bad_params["llm"]["final_norm"] = state.params["llm"]["final_norm"] * jnp.nan
        bad_state = init_train_state(bad_params, tx)
        s2, aux2 = step(bad_state, batch, jax.random.PRNGKey(1))
        assert float(aux2["update_skipped"]) == 1.0
        assert int(s2.step) == 1  # step still advances (data was consumed)
        for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(bad_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
