"""Remote shard streaming (file:// http:// pipe:) + the quality filter stack."""

import io
import json
import os
import pickle
import tarfile
import threading

import numpy as np
import pytest

from dreamllm_tpu.data.filters import (
    DEFAULT_CAPTION_BLACKLIST,
    caption_blacklist,
    english_only,
    expand_pickle_index,
    has_caption_and_image,
    min_image_size,
    no_urls,
    quality_filters,
)
from dreamllm_tpu.data.webdataset import ShardStream, group_tar_entries, open_stream


def make_tar(path, samples):
    """samples: list of (key, caption or None, (h, w) or None, extra_json)."""
    from PIL import Image

    with tarfile.open(path, "w") as tf:
        for key, caption, hw, meta in samples:
            if hw is not None:
                buf = io.BytesIO()
                Image.fromarray(
                    np.zeros((hw[0], hw[1], 3), np.uint8)
                ).save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            if caption is not None:
                data = caption.encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            if meta is not None:
                data = json.dumps(meta).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


@pytest.fixture
def shard(tmp_path):
    p = str(tmp_path / "shard-000.tar")
    make_tar(p, [
        ("a", "a clean caption of a dog", (64, 64), None),
        ("b", "getty watermark stock photo", (64, 64), None),     # blacklist
        ("c", "café au lait très bon", (64, 64), None),           # non-ascii
        ("d", "see https://example.com/pic", (64, 64), None),     # url
        ("e", "tiny but fine words here", (8, 8), None),          # small image
        ("f", None, (64, 64), None),                              # no caption
        ("g", "caption without image", None, None),               # no image
    ])
    return p


class TestOpenStream:
    def test_plain_and_file_scheme(self, shard):
        keys = [s["__key__"] for s in group_tar_entries(shard)]
        assert keys == list("abcdefg")
        keys = [s["__key__"] for s in group_tar_entries("file://" + shard)]
        assert keys == list("abcdefg")

    def test_pipe_scheme(self, shard):
        keys = [s["__key__"] for s in group_tar_entries(f"pipe:cat {shard}")]
        assert keys == list("abcdefg")

    def test_http_scheme(self, shard):
        import http.server

        os.chdir(os.path.dirname(shard))
        httpd = http.server.HTTPServer(
            ("127.0.0.1", 0), http.server.SimpleHTTPRequestHandler
        )
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{port}/{os.path.basename(shard)}"
            keys = [s["__key__"] for s in group_tar_entries(url)]
            assert keys == list("abcdefg")
        finally:
            httpd.shutdown()

    def test_object_store_rewrites_to_pipe(self, monkeypatch, shard):
        seen = {}
        import dreamllm_tpu.data.webdataset as wd

        real = wd.open_stream

        def spy(url, timeout=120.0):
            seen["url"] = url
            if url.startswith("pipe:"):
                return real(f"pipe:cat {shard}", timeout)
            return real(url, timeout)

        monkeypatch.setattr(wd, "open_stream", spy)
        out = wd.open_stream("s3://bucket/key.tar")
        assert out.read(4) is not None
        assert seen["url"].startswith("pipe:")


class TestFilters:
    def s(self, txt="ok words", img=True, hw=(64, 64)):
        return {
            "txt": txt,
            "image": np.zeros((*hw, 3), np.uint8) if img else None,
        }

    def test_has_caption_and_image(self):
        assert has_caption_and_image(self.s())
        assert not has_caption_and_image(self.s(txt=""))
        assert not has_caption_and_image(self.s(txt="  "))
        assert not has_caption_and_image(self.s(img=False))

    def test_blacklist(self):
        f = caption_blacklist()
        assert f(self.s("a dog playing in the park"))
        assert not f(self.s("Getty Images watermark"))
        assert not f(self.s("photo_01.JPG final"))
        assert not f(self.s("follow @user for more"))
        custom = caption_blacklist(["banana"])
        assert not custom(self.s("a BANANA republic"))
        assert custom(self.s("Getty Images"))  # custom list replaces default

    def test_english_only(self):
        assert english_only(self.s("plain ascii text"))
        assert not english_only(self.s("café"))
        assert not english_only(self.s("图片"))

    def test_no_urls(self):
        assert no_urls(self.s("a caption"))
        assert not no_urls(self.s("http://x.co/a"))
        assert not no_urls(self.s("go to www.example.com now"))

    def test_min_image_size(self):
        f = min_image_size(16)
        assert f(self.s(hw=(32, 64)))
        assert not f(self.s(hw=(16, 64)))
        assert not f(self.s(img=False))

    def test_stack_order_and_composition(self):
        fs = quality_filters(min_side=16)
        assert len(fs) == 5
        good = self.s("a clean caption")
        assert all(f(good) for f in fs)

    def test_stream_applies_stack(self, shard):
        stream = ShardStream(
            [shard], resample=False, shuffle_buffer=0,
            filters=quality_filters(min_side=16),
        )
        keys = [s["__key__"] for s in stream]
        assert keys == ["a"]  # only the clean sample survives


class TestPickleIndex:
    def test_expand(self, tmp_path):
        idx1 = tmp_path / "part0.pkl"
        idx2 = tmp_path / "part1.pkl"
        with open(idx1, "wb") as f:
            pickle.dump([
                {"url": "s3://b/s0.tar", "nsamples": 100},
                {"url": "s3://b/s1.tar", "nsamples": 50},
            ], f)
        with open(idx2, "wb") as f:
            pickle.dump([{"url": "/local/s2.tar", "nsamples": 25}], f)
        shards, n = expand_pickle_index([str(idx1), str(idx2)])
        assert shards == ["s3://b/s0.tar", "s3://b/s1.tar", "/local/s2.tar"]
        assert n == 175

    def test_catalog_pkl_layout(self, tmp_path, monkeypatch, shard):
        from dreamllm_tpu.data.catalog import _shards

        d = tmp_path / "corpus"
        d.mkdir()
        with open(d / "index.pkl", "wb") as f:
            pickle.dump([{"url": shard, "nsamples": 7}], f)
        monkeypatch.setenv("DREAMLLM_DATA_ROOT", str(tmp_path))
        assert _shards("corpus") == [shard]

    def test_catalog_listing_layout(self, tmp_path, monkeypatch, shard):
        from dreamllm_tpu.data.catalog import _shards

        with open(tmp_path / "corpus.shards", "w") as f:
            f.write(f"# comment\n{shard}\nfile://{shard}\n")
        monkeypatch.setenv("DREAMLLM_DATA_ROOT", str(tmp_path))
        assert _shards("corpus") == [shard, f"file://{shard}"]
