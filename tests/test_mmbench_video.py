"""MMBench helpers + video frame sampling + video-text builder path."""

import numpy as np
import pytest

from dreamllm_tpu.data import BuilderConfig, DreamLLMBuilder
from dreamllm_tpu.data.builder import IGNORE
from dreamllm_tpu.data.dataset_types import VideoTextPair
from dreamllm_tpu.data.tokenization import ToyTokenizer
from dreamllm_tpu.eval.mmbench import (
    build_mmbench_prompt,
    circular_accuracy,
    export_results,
    extract_option_letter,
)
from dreamllm_tpu.utils.video import sample_video_frames


class TestMMBench:
    def test_prompt(self):
        p = build_mmbench_prompt("What color?", {"A": "red", "B": "blue"}, hint="a hint")
        assert "Hint: a hint" in p and "A. red" in p and "B. blue" in p
        assert "C." not in p

    @pytest.mark.parametrize("pred,expect", [
        ("A", "A"), ("(b)", "B"), ("C. something", "C"), ("D: because", "D"),
        ("the answer is unclear", None),
    ])
    def test_extract_letter(self, pred, expect):
        assert extract_option_letter(pred) == expect

    def test_extract_by_option_text(self):
        opts = {"A": "red", "B": "blue"}
        assert extract_option_letter("I think it is blue.", opts) == "B"

    def test_circular(self):
        recs = [
            {"group_id": 1, "prediction": "A", "answer": "A"},
            {"group_id": 1, "prediction": "B", "answer": "B"},  # rotated variant
            {"group_id": 2, "prediction": "A", "answer": "C"},
            {"group_id": 2, "prediction": "C", "answer": "C"},
        ]
        assert circular_accuracy(recs) == 0.5

    def test_export_tsv(self, tmp_path):
        recs = [{"index": 1, "question": "q", "options": {"A": "x"}, "prediction": "A"}]
        out = str(tmp_path / "res.xlsx")
        export_results(recs, out)
        import os

        assert os.path.exists(out) or os.path.exists(str(tmp_path / "res.tsv"))


class TestVideo:
    def test_sample_from_gif(self, tmp_path):
        from PIL import Image

        frames = [
            Image.fromarray(np.full((8, 8, 3), i * 30, np.uint8)) for i in range(5)
        ]
        path = str(tmp_path / "v.gif")
        frames[0].save(path, save_all=True, append_images=frames[1:])
        out = sample_video_frames(path, num_frames=3)
        assert out.shape == (3, 8, 8, 3)

    def test_sample_from_dir(self, tmp_path):
        from PIL import Image

        for i in range(4):
            Image.fromarray(np.full((8, 8, 3), i * 40, np.uint8)).save(
                str(tmp_path / f"f{i}.png")
            )
        out = sample_video_frames(str(tmp_path), num_frames=2)
        assert out.shape == (2, 8, 8, 3)

    def test_builder_video_pair(self):
        cfg = BuilderConfig(max_seq_len=64, image_embed_len=4, n_dream_queries=4,
                            max_images=2, image_size=8, image_size_dm=16)
        b = DreamLLMBuilder(ToyTokenizer(), cfg)
        frames = [np.full((8, 8, 3), 0.5, np.float32)] * 3
        s = b.build(VideoTextPair(frames=frames, text="a video of rain"))
        assert len(s.images) == 2  # capped at max_images
        st = cfg.special
        span = np.isin(s.input_ids, [st.im_patch, st.im_start, st.im_end])
        assert np.all(s.labels[span] == IGNORE)
        assert (s.labels != IGNORE).sum() == 5  # 4 caption words + eos
