"""Dataset catalog: registered factories for the corpora the reference trains
on (omni/data/constants.py:44-232 — laion400m/laion-coco/blip-laion/mmc4
/obelics/llava-instruct/...), plus synthetic datasets for offline smoke runs.

Real datasets resolve shard paths under ``$DREAMLLM_DATA_ROOT`` and stream
via data/webdataset.py; registration is lazy, so missing data only fails when
a dataset is actually built.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from dreamllm_tpu.data.dataset_types import (
    ConversationSample,
    ImageTextPair,
    InstructInterleavedImageText,
    InterleavedImageText,
    Message,
)
from dreamllm_tpu.data.registry import register_dataset
from dreamllm_tpu.data.webdataset import IterableAsMapStyle, ShardStream

DATA_ROOT_ENV = "DREAMLLM_DATA_ROOT"


def _shards(subdir: str) -> list[str]:
    """Resolve a corpus subdir to a shard URL list. Three layouts:

      * ``{root}/{subdir}/*.tar`` — local tar shards
      * ``{root}/{subdir}/*.pkl`` — pickle shard indexes (OBELICS-style:
        records of {"url", "nsamples"}; urls may be remote — reference
        omni/data/constants.py:23-36)
      * ``{root}/{subdir}.shards`` — text file, one shard URL per line
        (file:// http:// pipe: s3:// gs:// all stream via
        webdataset.open_stream — replaces megfile/gopen object-store access)
    """
    root = os.environ.get(DATA_ROOT_ENV)
    if not root:
        raise RuntimeError(
            f"set ${DATA_ROOT_ENV} to the dataset root to use real datasets"
        )
    shards = sorted(glob.glob(os.path.join(root, subdir, "*.tar")))
    if shards:
        return shards
    indexes = sorted(glob.glob(os.path.join(root, subdir, "*.pkl")))
    if indexes:
        from dreamllm_tpu.data.filters import expand_pickle_index

        shards, _ = expand_pickle_index(indexes)
        return shards
    listing = os.path.join(root, f"{subdir}.shards")
    if os.path.exists(listing):
        with open(listing) as f:
            shards = [l.strip() for l in f if l.strip() and not l.startswith("#")]
        if shards:
            return shards
    raise RuntimeError(f"no shards under {root}/{subdir}")


def _pair_wds(subdir: str, size: int):
    def factory(quality: bool = True, min_side: int = 0,
                json_caption_key: str | None = None, **kw):
        from dreamllm_tpu.data.filters import has_caption_and_image, quality_filters
        from dreamllm_tpu.data.webdataset import default_decoder

        filters = (
            quality_filters(min_side=min_side) if quality else [has_caption_and_image]
        )

        def decoder(raw):
            s = default_decoder(raw)
            # caption stored in a json sidecar under a configurable key
            # (reference json_caption_key, unified_it_pair_webdataset.py:89-92)
            if json_caption_key and not s.get("txt") and isinstance(s.get("json"), dict):
                s["txt"] = s["json"].get(json_caption_key, "")
            return s

        stream = ShardStream(
            _shards(subdir),
            decoder=decoder,
            map_fn=lambda s: ImageTextPair(image=s["image"], text=s.get("txt", "")),
            filters=filters,
            **kw,
        )
        return IterableAsMapStyle(stream, size)

    return factory


def _interleaved_wds(subdir: str, size: int):
    def factory(**kw):
        def to_sample(s):
            meta = s["json"]
            return InterleavedImageText(
                texts=meta.get("text_list", meta.get("texts", [])),
                images=[s[k] for k in sorted(s) if k.startswith("image")],
                matched_text_index=meta.get("matched_text_index", []),
                matched_sim=meta.get("matched_sim"),
            )

        stream = ShardStream(_shards(subdir), map_fn=to_sample,
                             filters=[lambda s: "json" in s], **kw)
        return IterableAsMapStyle(stream, size)

    return factory


def _instruct_interleaved_wds(subdir: str, size: int):
    """SFT-format shards: interleaved doc + an ``instruction`` field
    (reference conversation_it_interleaved_dataset.py)."""

    def factory(**kw):
        def to_sample(s):
            meta = s["json"]
            return InstructInterleavedImageText(
                texts=meta.get("text_list", meta.get("texts", [])),
                images=[s[k] for k in sorted(s) if k.startswith("image")],
                matched_text_index=meta.get("matched_text_index", []),
                matched_sim=meta.get("matched_sim"),
                instruction=meta.get("instruction", ""),
            )

        stream = ShardStream(_shards(subdir), map_fn=to_sample,
                             filters=[lambda s: "json" in s], **kw)
        return IterableAsMapStyle(stream, size)

    return factory


def _conversation_json(subdir: str, size: int):
    def factory(**kw):
        import json

        root = os.environ.get(DATA_ROOT_ENV, "")
        path = os.path.join(root, subdir)
        with open(path) as f:
            raw = json.load(f)

        class Conv:
            def __len__(self):
                return len(raw)

            def __getitem__(self, i):
                item = raw[i]
                msgs = [
                    Message("user" if m["from"] in ("human", "user") else "assistant",
                            # normalize placeholder whitespace ("<image>\n..."
                            # in llava-instruct json) so the split on <image>
                            # doesn't leave stray newlines in the prompt
                            m["value"].replace("<image>\n", "<image>")
                                      .replace("\n<image>", "<image>"))
                    for m in item["conversations"]
                ]
                images = []
                if "image" in item:
                    from PIL import Image

                    images = [np.asarray(Image.open(
                        os.path.join(root, "images", item["image"])).convert("RGB"))]
                return ConversationSample(messages=msgs, images=images)

        return Conv()

    return factory


# --- real corpora (names mirror the reference's registry) ---
for name, sub, size, kind in [
    ("laion400m", "laion400m", 400_000_000, "pair"),
    ("laion_coco", "laion-coco", 600_000_000, "pair"),
    ("blip_laion", "blip-laion", 115_000_000, "pair"),
    ("journeydb", "journeydb", 4_000_000, "pair"),
    ("mmc4_core", "mmc4-core", 7_000_000, "interleaved"),
    ("obelics", "obelics", 141_000_000, "interleaved"),
    ("mmc4_instruct", "mmc4-instruct", 500_000, "instruct_interleaved"),
]:
    if kind == "pair":
        factory = _pair_wds(sub, size)
    elif kind == "instruct_interleaved":
        factory = _instruct_interleaved_wds(sub, size)
    else:
        factory = _interleaved_wds(sub, size)
    register_dataset(name, factory, dataset_type=kind, approx_size=size)

register_dataset(
    "llava_instruct", _conversation_json("llava_instruct_150k.json", 150_000),
    dataset_type="conversation", approx_size=150_000,
)
register_dataset(
    "llava_pretrain_cc3m", _conversation_json("ccs_synthetic_filtered_large.json", 558_000),
    dataset_type="conversation", approx_size=558_000,
)


# --- additional dataset kinds (reference datasets/ variants) ---


def hf_it_pair_dataset(name_or_path: str, image_key="image", text_key="text",
                       split="train", size: int | None = None, **_):
    """HF `datasets` image-text pairs (reference hf_it_pair_dataset.py)."""
    import datasets as hfds

    ds = hfds.load_dataset(name_or_path, split=split)

    class HF:
        def __len__(self):
            return size or len(ds)

        def __getitem__(self, i):
            row = ds[int(i) % len(ds)]
            return ImageTextPair(image=np.asarray(row[image_key]), text=row[text_key])

    return HF()


def simple_it_pair_dataset(root: str, captions_json: str = "captions.json",
                           size: int | None = None, **_):
    """Folder of images + {filename: caption} json (reference
    simple_it_pair_dataset.py)."""
    import json

    with open(os.path.join(root, captions_json)) as f:
        table = sorted(json.load(f).items())

    class Simple:
        def __len__(self):
            return size or len(table)

        def __getitem__(self, i):
            from PIL import Image

            name, caption = table[int(i) % len(table)]
            img = np.asarray(Image.open(os.path.join(root, name)).convert("RGB"))
            return ImageTextPair(image=img, text=caption)

    return Simple()


def simple_text_only_dataset(path: str, size: int | None = None, **_):
    """One document per line (reference simple_hf_text_only_dataset.py)."""
    from dreamllm_tpu.data.dataset_types import TextOnly

    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]

    class Text:
        def __len__(self):
            return size or len(lines)

        def __getitem__(self, i):
            return TextOnly(text=lines[int(i) % len(lines)])

    return Text()


register_dataset("hf_it_pair", hf_it_pair_dataset, dataset_type="pair")
register_dataset("simple_it_pair", simple_it_pair_dataset, dataset_type="pair")
register_dataset("simple_text_only", simple_text_only_dataset, dataset_type="text")


# --- synthetic datasets (offline smoke/testing) ---


def _synthetic_pairs(size: int = 64, image_size: int = 16, **_):
    rng = np.random.default_rng(0)

    class Synth:
        def __len__(self):
            return size

        def __getitem__(self, i):
            img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
            return ImageTextPair(image=img, text=f"synthetic caption number {i % 17}")

    return Synth()


def _synthetic_interleaved(size: int = 64, image_size: int = 16, **_):
    rng = np.random.default_rng(1)

    class Synth:
        def __len__(self):
            return size

        def __getitem__(self, i):
            img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
            return InterleavedImageText(
                texts=[f"doc {i} first chunk", "second chunk"],
                images=[img],
                matched_text_index=[0],
            )

    return Synth()


register_dataset("synthetic_pairs", _synthetic_pairs, dataset_type="pair", approx_size=64)
register_dataset("synthetic_interleaved", _synthetic_interleaved,
                 dataset_type="interleaved", approx_size=64)
