"""Regression tests for the data/config review findings (webdataset decode/
grouping/breaker, catalog natsort, lazy booleans, PEP604 hydration, registry
kwarg filtering, VQA hyphen normalization)."""

import dataclasses
import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from dreamllm_tpu.data.webdataset import (
    ShardStream,
    default_decoder,
    group_tar_entries,
)


def _jpg_bytes(v=128, size=8):
    arr = np.full((size, size, 3), v, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG")
    return buf.getvalue()


def _add(tf, name, data):
    ti = tarfile.TarInfo(name)
    ti.size = len(data)
    tf.addfile(ti, io.BytesIO(data))


def test_multidot_image_entries_decode(tmp_path):
    """'key.image_00.jpg' (interleaved shards) must decode as an image."""
    p = str(tmp_path / "s.tar")
    with tarfile.open(p, "w") as tf:
        _add(tf, "0001.image_00.jpg", _jpg_bytes(10))
        _add(tf, "0001.image_2.jpg", _jpg_bytes(20))
        _add(tf, "0001.image_10.jpg", _jpg_bytes(30))
        _add(tf, "0001.json", b'{"texts": ["a"], "matched_text_index": [0]}')
    sample = next(iter(group_tar_entries(p)))
    s = default_decoder(sample)
    imgs = {k: v for k, v in s.items() if k.startswith("image")}
    assert len(imgs) == 3
    for v in imgs.values():
        assert isinstance(v, np.ndarray) and v.shape == (8, 8, 3)


def test_catalog_natural_image_order():
    from dreamllm_tpu.data.catalog import _natkey

    keys = ["image_0.jpg", "image_10.jpg", "image_2.jpg"]
    assert sorted(keys, key=_natkey) == ["image_0.jpg", "image_2.jpg", "image_10.jpg"]


def test_directory_keys_do_not_collide(tmp_path):
    p = str(tmp_path / "s.tar")
    with tarfile.open(p, "w") as tf:
        _add(tf, "a/0001.jpg", _jpg_bytes(10))
        _add(tf, "a/0001.txt", b"caption a")
        _add(tf, "b/0001.jpg", _jpg_bytes(200))
        _add(tf, "b/0001.txt", b"caption b")
    samples = list(group_tar_entries(p))
    assert len(samples) == 2
    keys = {s["__key__"] for s in samples}
    assert keys == {"a/0001", "b/0001"}


def test_breaker_resets_on_filtered_but_decoded_samples(tmp_path):
    """Decode errors separated by filtered-out good samples are not
    'consecutive' — the stream must survive them."""
    p = str(tmp_path / "s.tar")
    with tarfile.open(p, "w") as tf:
        for i in range(9):
            data = b"\x00not-a-jpeg" if i % 3 == 0 else _jpg_bytes(50)
            _add(tf, f"{i:04d}.jpg", data)
            _add(tf, f"{i:04d}.txt", b"x")
    stream = ShardStream(
        [p], shuffle_buffer=0,
        filters=[lambda s: False],  # everything filtered out
        max_consecutive_failures=2, resample=False,
    )
    # 3 scattered decode failures > max_consecutive_failures, but never
    # consecutive: the epoch must end cleanly (the breaker raising
    # RuntimeError would surface here)
    it = iter(stream)
    with pytest.raises(StopIteration):
        next(it)  # all filtered; stream ends without tripping the breaker


def test_parse_value_hydra_booleans():
    from dreamllm_tpu.config.lazy import _parse_value

    assert _parse_value("false") is False
    assert _parse_value("true") is True
    assert _parse_value("null") is None
    assert _parse_value("False") is False
    assert _parse_value("3") == 3
    assert _parse_value("hello") == "hello"


def test_from_dict_pep604_union():
    from dreamllm_tpu.config.arg_parser import from_dict

    @dataclasses.dataclass
    class Sub:
        x: int = 1

    @dataclasses.dataclass
    class Args:
        sub: Sub | None = None

    got = from_dict(Args, {"sub": {"x": 5}})
    assert isinstance(got.sub, Sub) and got.sub.x == 5


def test_registry_filters_foreign_kwargs():
    from dreamllm_tpu.data.registry import DatasetInfo

    calls = {}

    def strict_factory(alpha: int = 1):
        calls["alpha"] = alpha
        return "ds"

    info = DatasetInfo(name="t", factory=strict_factory)
    assert info.build(alpha=3, quality=False) == "ds"  # 'quality' dropped
    assert calls["alpha"] == 3


def test_vqa_hyphen_normalization():
    from dreamllm_tpu.eval.metrics import normalize_vqa_answer

    assert normalize_vqa_answer("well-lit") == normalize_vqa_answer("well lit")
    assert normalize_vqa_answer("well-lit") == "well lit"


def test_batcher_stop_fails_queued_and_rejects_new():
    import threading
    import time as _time

    from dreamllm_tpu.serve.batching import DynamicBatcher

    started = threading.Event()

    def slow_batch(items):
        started.set()
        _time.sleep(0.3)
        return ["ok"] * len(items)

    b = DynamicBatcher(slow_batch, max_batch=1, window_ms=1).start()
    results = {}

    def submit(i):
        try:
            results[i] = b.submit(f"p{i}", timeout=5)
        except Exception as e:
            results[i] = e

    threads = [threading.Thread(target=submit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    started.wait(2)
    b.stop()
    for t in threads:
        t.join(timeout=10)
    # no request may be left hanging: each either completed or got the
    # stop error — and none waited out a long timeout
    assert len(results) == 3
    assert all(r == "ok" or isinstance(r, RuntimeError) for r in results.values())
    with pytest.raises(RuntimeError, match="stopped"):
        b.submit("late", timeout=1)


def test_checkpoint_atomic_and_skips_partial(tmp_path):
    import jax.numpy as jnp

    from dreamllm_tpu.train.checkpoints import (
        latest_checkpoint,
        load_params,
        save_checkpoint,
    )

    root = str(tmp_path / "ck")
    params = {"llm": {"w": jnp.ones((4,))}}
    save_checkpoint(root, 10, params)
    # a half-written dir (no meta.json) must never win latest_checkpoint
    import os

    os.makedirs(os.path.join(root, "checkpoint-000020", "llm"), exist_ok=True)
    best = latest_checkpoint(root)
    assert best and best.endswith("checkpoint-000010")
    assert "llm" in load_params(best)
    # re-saving the same step must not crash (orbax refuses overwrites)
    save_checkpoint(root, 10, params)


def test_sdxl_default_vae_scaling():
    from dreamllm_tpu.models.sd.sdxl import SDXLHeadConfig

    assert SDXLHeadConfig().vae.scaling_factor == 0.13025
