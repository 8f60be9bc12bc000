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


class TestServeEngineShutdown:
    def _small(self):
        import jax
        import jax.numpy as jnp

        from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, dtype=jnp.float32,
        )
        return cfg, init_llama_params(jax.random.PRNGKey(0), cfg)

    def test_stop_fails_inflight_and_rejects_new(self):
        """stop() must resolve every in-flight/queued request (not strand
        them until their 600 s timeout) and reject later submits."""
        import threading

        from dreamllm_tpu.generation.sampler import SamplingConfig
        from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

        cfg, params = self._small()
        eng = ContinuousBatchingEngine(
            params, cfg, SamplingConfig(greedy=True, eos_token_id=127),
            EngineConfig(slots=2, prefill_len=16, max_len=64, chunk_steps=4),
        ).start()
        errs = []

        def long_req():
            try:
                eng.submit([1, 5, 9], max_new_tokens=48, timeout=60)
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t = threading.Thread(target=long_req)
        t.start()
        # let it get admitted / start decoding, then stop
        import time

        time.sleep(1.0)
        eng.stop()
        t.join(timeout=30)
        assert not t.is_alive(), "submitter stranded after stop()"
        # either it finished in time (empty errs) or it was failed cleanly
        for e in errs:
            assert isinstance(e, RuntimeError) and "stopped" in str(e)
        with pytest.raises(RuntimeError, match="stopped"):
            eng.submit([1, 2, 3])

    def test_admit_left_truncation_keeps_bos(self):
        from dreamllm_tpu.generation.sampler import SamplingConfig
        from dreamllm_tpu.serve.engine import ContinuousBatchingEngine, EngineConfig

        cfg, params = self._small()
        ecfg = EngineConfig(slots=1, prefill_len=16, max_len=32, chunk_steps=2,
                            bos_token_id=1)
        eng = ContinuousBatchingEngine(
            params, cfg, SamplingConfig(greedy=True, eos_token_id=127), ecfg)
        seen = {}
        orig = eng.prefill_fn

        class Spy:
            empty_cache = staticmethod(orig.empty_cache)

            def __call__(self, params, cache, ids, clen, start, rng, samp):
                seen.setdefault("chunks", []).append(np.asarray(ids)[0])
                return orig(params, cache, ids, clen, start, rng, samp)

        eng.prefill_fn = Spy()
        from dreamllm_tpu.serve.engine import _Request

        prompt = [1] + list(range(2, 2 + 60))  # BOS + 60 tokens > cap 31
        eng._admit(_Request(prompt, 1))
        first_chunk = seen["chunks"][0]
        assert first_chunk[0] == 1, "BOS dropped by left truncation"
        # the rest must be the TAIL of the prompt (recent context kept)
        flat = np.concatenate(seen["chunks"])
        total = sum(1 for _ in flat)  # 2 chunks of 16
        assert prompt[-1] in flat.tolist()


class TestBatcherShutdown:
    def test_stop_waits_then_fails_queued(self):
        import threading
        import time

        from dreamllm_tpu.serve.batching import DynamicBatcher

        release = threading.Event()

        def slow_batch(items):
            release.wait(10)
            return [i * 2 for i in items]

        b = DynamicBatcher(slow_batch, max_batch=1, window_ms=1).start()
        results = []

        def worker():
            try:
                results.append(b.submit(21, timeout=30))
            except Exception as e:  # noqa: BLE001
                results.append(e)

        t1 = threading.Thread(target=worker)
        t1.start()
        time.sleep(0.2)  # t1's batch is in-flight inside slow_batch

        def stopper():
            b.stop()  # waits for the in-flight batch

        t2 = threading.Thread(target=stopper)
        t2.start()
        time.sleep(0.2)
        with pytest.raises(RuntimeError, match="stopped"):
            b.submit(99)  # rejected: _stopped already set
        release.set()
        t1.join(timeout=15)
        t2.join(timeout=15)
        assert results == [42], results  # in-flight batch completed cleanly


class TestGenerateTextExactLengths:
    def test_midstream_pad_id_counted(self):
        """lengths must be the exact emit count even when a generated token
        equals pad_token_id (<unk>=0 in LLaMA vocabs)."""
        import jax
        import jax.numpy as jnp

        from dreamllm_tpu.generation.sampler import SamplingConfig, generate_text
        from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params

        cfg = LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
            max_position_embeddings=128, dtype=jnp.float32,
        )
        params = init_llama_params(jax.random.PRNGKey(3), cfg)
        ids = jnp.asarray([[1, 7, 11]], jnp.int32)
        lens = jnp.asarray([3], jnp.int32)
        base = generate_text(params, cfg, ids, lens,
                             SamplingConfig(greedy=True, max_new_tokens=8,
                                            eos_token_id=999, pad_token_id=0))
        toks = np.asarray(base["tokens"][0])
        assert int(base["lengths"][0]) == 8  # no EOS hit: all 8 emitted
        # now declare a token the model DID emit mid-stream as the pad id;
        # greedy decode is unchanged, so lengths must still be 8
        mid = int(toks[3])
        out = generate_text(params, cfg, ids, lens,
                            SamplingConfig(greedy=True, max_new_tokens=8,
                                           eos_token_id=999, pad_token_id=mid))
        np.testing.assert_array_equal(np.asarray(out["tokens"][0]), toks)
        assert int(out["lengths"][0]) == 8, "mid-stream pad-id token uncounted"


class TestPrefetchStream:
    def _counting_stream(self):
        class S:
            def __init__(self):
                self.i = 0

            def __iter__(self):
                return self

            def __next__(self):
                self.i += 1
                return {"x": self.i}

            def state_dict(self):
                return {"i": self.i}

            def load_state_dict(self, st):
                self.i = int(st["i"])

        return S()

    def test_order_preserved(self):
        from dreamllm_tpu.data.stream import PrefetchStream

        p = PrefetchStream(self._counting_stream(), depth=3)
        got = [next(p)["x"] for _ in range(10)]
        assert got == list(range(1, 11))
        p.close()

    def test_state_tracks_delivered_not_prefetched(self):
        """state_dict must describe the last DELIVERED batch even though the
        producer has buffered ahead — a resume rebuilds the lookahead."""
        import time

        from dreamllm_tpu.data.stream import PrefetchStream

        inner = self._counting_stream()
        p = PrefetchStream(inner, depth=4)
        for _ in range(3):
            next(p)
        time.sleep(0.3)  # let the producer run ahead into the buffer
        assert inner.i > 3  # it DID prefetch
        st = p.state_dict()
        assert st == {"i": 3}
        # resume into a fresh pipeline: continues at 4
        inner2 = self._counting_stream()
        p2 = PrefetchStream(inner2, depth=4)
        p2.load_state_dict(st)
        assert next(p2)["x"] == 4
        p.close()
        p2.close()

    def test_stateless_inner_hides_protocol(self):
        from dreamllm_tpu.data.stream import PrefetchStream

        p = PrefetchStream(iter([{"x": 1}, {"x": 2}]), depth=2)
        assert not hasattr(p, "state_dict")
        assert next(p) == {"x": 1}
        p.close()

    def test_finite_stream_stopiteration(self):
        from dreamllm_tpu.data.stream import PrefetchStream

        p = PrefetchStream(iter([{"x": 1}]), depth=2)
        assert next(p) == {"x": 1}
        with pytest.raises(StopIteration):
            next(p)


class TestBuilderStreamHardening:
    def test_build_breaker_on_systematic_failure(self):
        from dreamllm_tpu.data.stream import BatchStream

        class Bad:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                raise TypeError("broken schema")

        class B:
            import numpy as _np
            rng = _np.random.default_rng(0)

            def build(self, s):
                raise AssertionError("unreached")

        s = BatchStream(Bad(), B(), 2, dict(seq_len=16))
        s.max_consecutive_failures = 5
        with pytest.raises(RuntimeError, match="consecutive sample failures"):
            next(s)

    def test_pair_budget_never_negative(self):
        """max_seq_len smaller than the image span must drop the caption,
        not keep it via a negative slice (ids would overflow and leave a
        dangling partial patch run)."""
        from dreamllm_tpu.data.builder import BuilderConfig, DreamLLMBuilder
        from dreamllm_tpu.data.dataset_types import ImageTextPair

        cfg = _tiny_cfg()
        bcfg = BuilderConfig(
            max_seq_len=8,  # < [bos] + image span (1+4+1) + caption + [eos]
            image_embed_len=4, n_dream_queries=4,
            special=cfg.special_tokens, max_images=1, max_dreams=1,
            image_size=28, image_size_dm=16, i2t_probability=1.0,
        )
        b = DreamLLMBuilder(ToyTokenizer(vocab_size=cfg.llm.vocab_size), bcfg, seed=0)
        img = np.zeros((28, 28, 3), np.uint8)
        out = b.build(ImageTextPair(image=img, text="a very long caption " * 10))
        assert len(out.input_ids) <= bcfg.max_seq_len
        # t2i branch too
        bcfg2 = BuilderConfig(
            max_seq_len=8, image_embed_len=4, n_dream_queries=4,
            special=cfg.special_tokens, max_images=1, max_dreams=1,
            image_size=28, image_size_dm=16, i2t_probability=0.0,
        )
        b2 = DreamLLMBuilder(ToyTokenizer(vocab_size=cfg.llm.vocab_size), bcfg2, seed=0)
        out2 = b2.build(ImageTextPair(image=img, text="a very long caption " * 10))
        assert len(out2.input_ids) <= bcfg2.max_seq_len

    def test_batchstream_embed_len_defaults_from_collate_kw(self):
        from dreamllm_tpu.data.stream import BatchStream

        class Src:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                return None

        class B:
            import numpy as _np
            rng = _np.random.default_rng(0)

        s = BatchStream(Src(), B(), 2,
                        dict(seq_len=64, image_embed_len=7, n_dream_queries=3))
        assert s.image_embed_len == 7 and s.n_dream_queries == 3


class TestEvalDataReviewFixes:
    def test_humaneval_markdown_rewrite_with_helper(self, tmp_path):
        """A fenced full-function rewrite with a helper defined before the
        entry point must pass (previously the trailing fence and the dropped
        helper each made it fail)."""
        from dreamllm_tpu.eval.code_math import run_humaneval

        problems = [{
            "task_id": "T/0",
            "prompt": "def add2(a, b):\n    \"\"\"Add.\"\"\"\n",
            "test": "def check(f):\n    assert f(1, 2) == 3\n",
            "entry_point": "add2",
        }]

        def gen(prompt):
            return ("Here is my solution:\n```python\n"
                    "def _inc(x):\n    return x + 1\n\n"
                    "def add2(a, b):\n    return _inc(a) + b - 1\n"
                    "```\nHope this helps!")

        out = run_humaneval(gen, problems, samples_per_task=1)
        assert out["pass@1"] == 1.0, out

    def test_pipe_stream_surfaces_truncation(self):
        import tarfile

        from dreamllm_tpu.data.webdataset import open_stream

        # command emits partial bytes then fails: EOF must raise, not look
        # like a clean end of stream
        st = open_stream("pipe:printf 'partial'; exit 3")
        with pytest.raises(OSError, match="status 3"):
            while st.read(4):
                pass
        st.close()
        # clean exit stays clean
        st = open_stream("pipe:printf 'ok'")
        data = b""
        while True:
            b_ = st.read(4)
            if not b_:
                break
            data += b_
        assert data == b"ok"
        st.close()

    def test_map_fn_warn_and_continue(self, tmp_path):
        import io
        import tarfile

        from dreamllm_tpu.data.webdataset import ShardStream

        tar = tmp_path / "s.tar"
        with tarfile.open(tar, "w") as tf:
            for i in range(4):
                cap = f"cap{i}".encode()
                ti = tarfile.TarInfo(f"{i}.txt")
                ti.size = len(cap)
                tf.addfile(ti, io.BytesIO(cap))

        def bad_map(s):
            if s["__key__"] == "1":
                raise KeyError("odd sample")
            return s["txt"]

        import itertools

        stream = ShardStream([str(tar)], shuffle_buffer=1, resample=False,
                             map_fn=bad_map)
        got = sorted(itertools.islice(iter(stream), 3))
        assert got == ["cap0", "cap2", "cap3"]

    def test_squad_both_empty_f1(self):
        from dreamllm_tpu.eval.language import squad_em_f1

        em, f1 = squad_em_f1("the", ["a the"])  # both normalize to ""
        assert em == 1.0 and f1 == 1.0
        em, f1 = squad_em_f1("word", ["the"])   # gold empty, pred not
        assert em == 0.0 and f1 == 0.0

    def test_results_db_reads_are_readonly(self, tmp_path):
        from dreamllm_tpu.eval.results_db import ResultsDB

        db = ResultsDB(str(tmp_path / "r.sqlite"))
        assert db.latest("typo-model", "mmlu") == {}
        assert db.history("typo-model", "mmlu") == []
        # lookups must NOT have created a models row
        assert db.find_model_id("typo-model") is None
        # explicit eval_count=0 is honored
        db.record("m", "mmlu", {"accuracy": 0.5}, eval_count=0)
        rows = db.history("m", "mmlu")
        assert rows == [(0, 0.5)]


class TestOptimEvalReviewFixes:
    def test_cosine_restarts_past_end_returns_floor(self):
        from dreamllm_tpu.train.optim import OptimizerConfig, make_lr_schedule

        cfg = OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                              total_steps=100, schedule="cosine_restarts",
                              num_cycles=2)
        sched = make_lr_schedule(cfg)
        assert float(sched(50)) > 0  # mid-training: alive
        # at/past the end: floor, NOT a restart back to peak lr
        assert float(sched(100)) < 1e-3 * 0.02
        assert float(sched(10_000)) < 1e-3 * 0.02

    def test_8bit_v_small_values_not_zeroed(self):
        """v entries far below the block max must not dequantize to 0 (the
        update would blow up by ~1/eps)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from dreamllm_tpu.train.optim8bit import adamw_8bit

        tx = adamw_8bit(1e-3)
        # one block where grad^2 spans 6 orders of magnitude
        g = jnp.full((256,), 1e-3, jnp.float32).at[0].set(1.0)
        p = jnp.zeros((256,), jnp.float32)
        state = tx.init(p)
        up1, state = tx.update(g, state, p)
        up2, state = tx.update(g, state, p)
        # with a zeroed v, |update| for the small-grad entries explodes to
        # ~lr * m / eps ~ 1e2; healthy Adam keeps |update| <= ~lr
        assert float(jnp.max(jnp.abs(up2))) < 5e-3, np.asarray(up2)[:4]

    def test_mmbench_letter_not_english_article(self):
        from dreamllm_tpu.eval.mmbench import extract_option_letter

        opts = {"A": "cat", "B": "horse", "C": "dog", "D": "fish"}
        assert extract_option_letter("a dog", opts) == "C"
        assert extract_option_letter("A", opts) == "A"
        assert extract_option_letter("(b)", opts) == "B"
        assert extract_option_letter("c.", opts) == "C"
        assert extract_option_letter("B. horse", opts) == "B"

    def test_vqa_exact_metric_letter_choice(self):
        from dreamllm_tpu.eval.vqa import score_predictions

        preds = [
            {"prediction": "A.", "label": "A"},
            {"prediction": "The answer is B", "label": "B"},
            {"prediction": "a dog", "label": "C",
             "options": {"A": "cat", "B": "horse", "C": "dog", "D": "fish"}},
            {"prediction": "plain text", "label": "plain text"},
        ]
        assert score_predictions(preds, "exact") == 1.0

    def test_vqa_normalize_preserves_decimals(self):
        from dreamllm_tpu.eval.metrics import normalize_vqa_answer

        assert normalize_vqa_answer("2.5") == "2.5"
        assert normalize_vqa_answer("a dog.") == "dog"

    def test_merge_empty_shards_clear_error(self):
        from dreamllm_tpu.eval.vqa import merge_prediction_shards

        with pytest.raises(ValueError, match="no shard files"):
            merge_prediction_shards([], "/tmp/never.json")
