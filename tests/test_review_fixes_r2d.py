"""Regression tests for the round-2 final review slice (CLIP/FID/utils/
native/projects findings)."""

import json
import os

import numpy as np
import pytest

from dreamllm_tpu.models.dreamllm import DreamLLMConfig
from dreamllm_tpu.models.llama import LlamaConfig
from dreamllm_tpu.models.clip import CLIPVisionConfig
from dreamllm_tpu.models.projector import ProjectorConfig
from dreamllm_tpu.data.tokenization import ToyTokenizer


def _tiny_cfg():
    return DreamLLMConfig(
        llm=LlamaConfig(
            vocab_size=32064, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
            max_position_embeddings=128,
        ),
        vision=CLIPVisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        vision_projector=ProjectorConfig(projector_type="linear", in_dim=16, out_dim=32),
        n_dream_queries=4,
        image_embed_len=4,
    )


class TestPackedDataStream:
    def test_pack_true_yields_multisegment_rows(self):
        """data_stream(pack=True) must actually pack (stage2_longcontext
        advertised packing but nothing consumed the flag)."""
        from projects.dreamllm.train import data_stream

        cfg = _tiny_cfg()
        config = dict(
            seed=0,
            data=dict(
                datasets=["synthetic_pairs"],
                size_list=[64],
                batch_size=2,
                max_seq_len=128,
                max_images=2,
                max_dreams=2,
                image_size=28,
                image_size_dm=16,
                pack=True,
                pack_block=4,
            ),
        )
        stream = data_stream(config, cfg, ToyTokenizer(vocab_size=cfg.llm.vocab_size))
        batch = next(stream)
        assert batch["input_ids"].shape == (2, 128)
        # synthetic pair samples are short (< 64 tokens incl. spans), so a
        # 128-token packed row must hold more than one segment
        segs = np.asarray(batch["segment_ids"])
        assert segs.max() >= 2, f"packing produced single-segment rows: {segs.max()}"

    def test_pack_false_unchanged(self):
        from projects.dreamllm.train import data_stream

        cfg = _tiny_cfg()
        config = dict(
            seed=0,
            data=dict(
                datasets=["synthetic_pairs"], size_list=[64], batch_size=2,
                max_seq_len=128, max_images=2, max_dreams=2,
                image_size=28, image_size_dm=16,
            ),
        )
        batch = next(data_stream(config, cfg, ToyTokenizer(vocab_size=cfg.llm.vocab_size)))
        assert batch["input_ids"].shape == (2, 128)

    def test_longcontext_config_keys_consumed(self):
        """The long-context config's data keys must all be ones data_stream
        reads (max_length was a silent no-op)."""
        import runpy

        ns = runpy.run_path("projects/dreamllm/configs/stage2_longcontext.py")
        d = ns["config"]["data"]
        assert "max_length" not in d
        assert d.get("pack") is True and d.get("max_seq_len") == 16384


class TestInitDistributedStrict:
    def test_explicit_env_failure_raises(self, monkeypatch):
        import jax

        from dreamllm_tpu.utils import comm

        def boom(**kw):
            raise RuntimeError("connection to coordinator failed")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
        with pytest.raises(RuntimeError, match="coordinator"):
            comm.init_distributed()

    def test_single_host_autodetect_failure_swallowed(self, monkeypatch):
        import jax

        from dreamllm_tpu.utils import comm

        def boom(**kw):
            raise RuntimeError("could not auto-detect")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MASTER_ADDR", "JAX_NUM_PROCESSES"):
            monkeypatch.delenv(v, raising=False)
        comm.init_distributed()  # no raise

    def test_already_initialized_swallowed(self, monkeypatch):
        import jax

        from dreamllm_tpu.utils import comm

        def boom(**kw):
            raise RuntimeError("distributed runtime already initialized")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
        comm.init_distributed()  # idempotent, even with explicit env


class TestMetricsJsonlNonScalar:
    def test_array_metric_serializes(self, tmp_path):
        import jax.numpy as jnp

        from dreamllm_tpu.utils.metrics_logger import MetricsLogger

        m = MetricsLogger(str(tmp_path), use_wandb=False)
        m.log({"loss": 1.5, "per_task": jnp.asarray([0.1, 0.9]),
               "name": "run", "np_vec": np.arange(3)}, step=1)
        m.finish()
        row = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[-1])
        assert row["train/loss"] == 1.5
        assert row["train/per_task"] == pytest.approx([0.1, 0.9])
        assert row["train/np_vec"] == [0, 1, 2]
        assert row["train/name"] == "run"


class TestSDCaptionSeedStability:
    def test_crc32_not_builtin_hash(self):
        """Caption conditioning must be stable across interpreter processes
        (PYTHONHASHSEED salts builtin hash())."""
        for path in ("projects/stable_diffusion/train.py",
                     "projects/stable_diffusion/sample.py"):
            src = open(path).read()
            assert "abs(hash(" not in src, path
            assert "zlib.crc32" in src, path


class TestNativeLoaderStatsAfterClose:
    def test_stats_snapshot_after_exhaustion(self, tmp_path):
        pytest.importorskip("PIL")
        import io
        import tarfile

        from PIL import Image

        from dreamllm_tpu.data.native_loader import NativeImageTextLoader, NativeLoaderUnavailable

        tar = tmp_path / "shard.tar"
        with tarfile.open(tar, "w") as tf:
            for i in range(3):
                img = Image.fromarray(np.full((8, 8, 3), i * 40, np.uint8))
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                ti = tarfile.TarInfo(f"{i:04d}.jpg")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
                cap = f"caption {i}".encode()
                ti = tarfile.TarInfo(f"{i:04d}.txt")
                ti.size = len(cap)
                tf.addfile(ti, io.BytesIO(cap))
        try:
            loader = NativeImageTextLoader([str(tar)], image_size=16)
        except NativeLoaderUnavailable:
            pytest.skip("native plane unavailable")
        n = sum(1 for _ in loader)
        assert n == 3
        # iterating to exhaustion auto-closes; stats must come from the
        # snapshot, not the freed handle
        assert loader._closed
        assert loader.stats["decoded"] == 3
        assert loader.stats["failed"] == 0


class TestResumableBatchStream:
    def _make(self, pack=False):
        from dreamllm_tpu.data.builder import BuilderConfig, DreamLLMBuilder
        from dreamllm_tpu.data.registry import DataManager
        from dreamllm_tpu.data.stream import BatchStream
        import dreamllm_tpu.data.catalog  # noqa: F401

        cfg = _tiny_cfg()
        mixed = DataManager()(["synthetic_pairs"], size_list=[64])
        bcfg = BuilderConfig(
            max_seq_len=128, image_embed_len=4, n_dream_queries=4,
            special=cfg.special_tokens, max_images=2, max_dreams=2,
            image_size=28, image_size_dm=16,
        )
        builder = DreamLLMBuilder(ToyTokenizer(vocab_size=cfg.llm.vocab_size), bcfg, seed=7)
        kw = dict(pad_token_id=cfg.special_tokens.pad, max_images=2, max_dreams=2,
                  seq_len=128, image_size=28, image_size_dm=16,
                  image_embed_len=4, n_dream_queries=4)
        return BatchStream(mixed, builder, 2, kw, pack=pack, pack_block=4,
                           image_embed_len=4, n_dream_queries=4), (mixed, bcfg, kw)

    def test_unpacked_resume_exact(self):
        """state_dict → fresh stream + load_state_dict continues the exact
        sample sequence (VERDICT #8: resume that actually resumes)."""
        s1, (mixed, bcfg, kw) = self._make()
        for _ in range(3):
            next(s1)
        snap = json.loads(json.dumps(s1.state_dict()))  # must be JSON-safe
        expect = [next(s1) for _ in range(2)]

        s2, _ = self._make()
        s2.load_state_dict(snap)
        got = [next(s2) for _ in range(2)]
        for a, b in zip(expect, got):
            assert a.keys() == b.keys()
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    def test_packed_resume_no_repeat(self):
        """Packed resume may skip pending rows but must never repeat samples:
        the cursor only moves forward."""
        s1, _ = self._make(pack=True)
        for _ in range(3):
            next(s1)
        snap = s1.state_dict()
        s2, _ = self._make(pack=True)
        s2.load_state_dict(snap)
        assert s2._i == snap["cursor"]
        b = next(s2)
        assert np.asarray(b["input_ids"]).shape == (2, 128)
        assert s2._i > snap["cursor"]

    def test_mapped_stream_forwards_protocol(self):
        from dreamllm_tpu.data.stream import MappedStream

        s1, _ = self._make()
        m = MappedStream(s1, lambda b: b)
        assert hasattr(m, "state_dict")
        next(m)
        st = m.state_dict()
        m.load_state_dict(st)
        # wrapper over a plain generator must NOT claim the protocol
        plain = MappedStream(iter([{"x": 1}]), lambda b: b)
        assert not hasattr(plain, "state_dict")
