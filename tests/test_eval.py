"""Eval suite tests: metric correctness vs hand-computed values, FID math,
Inception shapes, CLIP text tower parity vs transformers, logprob scoring,
t2i protocol plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dreamllm_tpu.eval.fid import (
    compute_fid,
    frechet_distance,
    activation_statistics,
    init_inception_params,
    inception_pool3,
)
from dreamllm_tpu.eval.metrics import (
    anls,
    cider_d,
    normalize_vqa_answer,
    pope_metrics,
    vqa_accuracy,
)
from dreamllm_tpu.eval.nlp import multiple_choice, perplexity, sequence_logprob
from dreamllm_tpu.eval.text2img import T2IProtocol, clip_select, run_protocol
from dreamllm_tpu.models.clip_text import (
    CLIPTextConfig,
    clip_similarity,
    clip_text_forward,
    init_clip_text_params,
)
from dreamllm_tpu.models.llama import LlamaConfig, init_llama_params


class TestVQAMetrics:
    def test_normalization(self):
        assert normalize_vqa_answer("The cat!") == "cat"
        assert normalize_vqa_answer("Two") == "2"
        assert normalize_vqa_answer("dont") == "don't"

    def test_consensus_accuracy(self):
        gts = ["cat"] * 10
        assert vqa_accuracy("cat", gts) == 1.0
        assert vqa_accuracy("dog", gts) == 0.0
        gts = ["cat"] * 3 + ["dog"] * 7
        assert 0.9 <= vqa_accuracy("cat", gts) <= 1.0

    def test_anls(self):
        assert anls("hello", ["hello"]) == 1.0
        assert anls("helo", ["hello"]) == pytest.approx(0.8)
        assert anls("xyz", ["hello"]) == 0.0  # below threshold

    def test_pope(self):
        m = pope_metrics(["yes", "no", "yes", "no"], ["yes", "no", "no", "yes"])
        assert m["accuracy"] == 0.5
        assert m["yes_ratio"] == 0.5

    def test_cider_identical_scores_high(self):
        cands = {"1": "a cat on a mat", "2": "dogs run fast"}
        refs = {"1": ["a cat on a mat"], "2": ["dogs run very fast"]}
        score = cider_d(cands, refs)
        assert score > 3.0  # identical candidate 1 pushes it up
        worse = cider_d({"1": "bananas", "2": "bananas"}, refs)
        assert worse < score

    def test_exact_match_and_relaxed(self):
        from dreamllm_tpu.eval.metrics import exact_match, relaxed_accuracy

        assert exact_match(" Four ", ["four"]) == 1.0
        assert exact_match("4", ["four"]) == 0.0
        # ChartQA relaxed accuracy: ±5% numeric tolerance
        assert relaxed_accuracy("104", ["100"]) == 1.0
        assert relaxed_accuracy("106", ["100"]) == 0.0
        assert relaxed_accuracy("52.4%", ["52.4"]) == 1.0
        assert relaxed_accuracy("0", ["0"]) == 1.0
        assert relaxed_accuracy("blue", ["Blue"]) == 1.0
        assert relaxed_accuracy("blueish", ["blue"]) == 0.0


def _pycoco_cider_d(cands, refs, n_max=4, sigma=6.0):
    """Literal transcription of pycocoevalcap ciderD_scorer.py (the scorer
    the reference's caption_eval.py runs via COCOEvalCap) — an independent
    golden for metrics.cider_d. Inputs pre-tokenized: {id: [tok]} /
    {id: [[tok]]}."""
    import math
    from collections import defaultdict

    def precook(toks):
        counts = [defaultdict(int) for _ in range(n_max)]
        for n in range(n_max):
            for i in range(len(toks) - n):
                counts[n][tuple(toks[i:i + n + 1])] += 1
        return counts

    ids = list(cands)
    crefs = {i: [precook(r) for r in refs[i]] for i in ids}
    ctest = {i: precook(cands[i]) for i in ids}
    doc_freq = defaultdict(int)
    for i in ids:
        for ngram in set(g for ref in crefs[i] for n in range(n_max) for g in ref[n]):
            doc_freq[ngram] += 1
    ref_len = math.log(float(len(ids)))

    def counts2vec(cnts, toks):
        vec = [defaultdict(float) for _ in range(n_max)]
        norm = [0.0] * n_max
        length = len(toks)
        for n in range(n_max):
            for ngram, tf in cnts[n].items():
                df = math.log(max(1.0, float(doc_freq[ngram])))
                vec[n][ngram] = float(tf) * (ref_len - df)
                norm[n] += vec[n][ngram] ** 2
        return vec, [math.sqrt(x) for x in norm], length

    def sim(vh, nh, lh, vr, nr, lr):
        delta = float(lh - lr)
        val = [0.0] * n_max
        for n in range(n_max):
            for ngram, w in vh[n].items():
                val[n] += min(w, vr[n][ngram]) * vr[n][ngram]
            if nh[n] != 0 and nr[n] != 0:
                val[n] /= nh[n] * nr[n]
            val[n] *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
        return val

    scores = []
    for i in ids:
        vh, nh, lh = counts2vec(ctest[i], cands[i])
        acc = [0.0] * n_max
        for j, r in enumerate(crefs[i]):
            vr, nr, lr = counts2vec(r, refs[i][j])
            for n, v in enumerate(sim(vh, nh, lh, vr, nr, lr)):
                acc[n] += v
        score = sum(acc) / n_max / len(crefs[i]) * 10.0
        scores.append(score)
    return sum(scores) / len(scores)


class TestCiderGolden:
    """metrics.cider_d vs an independent pycocoevalcap transcription."""

    def test_identical_candidate_scores_ten(self):
        # cand == only ref, every n-gram order populated, unique per image:
        # cosine 1 at every n, delta 0 -> 10.0 exactly
        cands = {
            "1": "red birds fly over tall green trees today",
            "2": "slow trains cross wide frozen rivers at night",
        }
        refs = {k: [v] for k, v in cands.items()}
        assert cider_d(cands, refs) == pytest.approx(10.0, abs=1e-9)

    def test_matches_pycocoevalcap_transcription(self):
        from dreamllm_tpu.eval.metrics import caption_tokenize

        rng = np.random.default_rng(7)
        vocab = ["cat", "dog", "mat", "sat", "on", "the", "a", "red", "big",
                 "runs", "tree", "bird", "sky", "blue"]
        cands, refs = {}, {}
        for i in range(12):
            cands[str(i)] = " ".join(rng.choice(vocab, rng.integers(3, 10)))
            refs[str(i)] = [
                " ".join(rng.choice(vocab, rng.integers(3, 10)))
                for _ in range(int(rng.integers(1, 4)))
            ]
        ours = cider_d(cands, refs)
        golden = _pycoco_cider_d(
            {k: caption_tokenize(v) for k, v in cands.items()},
            {k: [caption_tokenize(r) for r in v] for k, v in refs.items()},
        )
        assert ours == pytest.approx(golden, rel=1e-9)
        assert 0.0 < ours < 10.0


class TestFID:
    def test_frechet_known_gaussians(self):
        # analytic: two isotropic gaussians differing only in mean
        d = 4
        mu1, mu2 = np.zeros(d), np.ones(d) * 3.0
        s = np.eye(d)
        assert frechet_distance(mu1, s, mu2, s) == pytest.approx(9.0 * d, rel=1e-6)

    def test_stats_and_fid(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((400, 6))
        assert compute_fid(a, a.copy()) == pytest.approx(0.0, abs=1e-8)

    @pytest.mark.slow
    def test_inception_shapes(self):
        p = init_inception_params(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 299, 299, 3))
        f = inception_pool3(p, x)
        assert f.shape == (1, 2048)

    def test_inception_resizes(self):
        p = init_inception_params(jax.random.PRNGKey(0))
        f = inception_pool3(p, jnp.zeros((1, 64, 64, 3)))
        assert f.shape == (1, 2048)


class TestCLIPText:
    TINY = dict(vocab_size=99, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=12)

    def test_parity_with_hf(self):
        from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

        torch.manual_seed(0)
        hf_cfg = HFCfg(**self.TINY, attn_implementation="eager",
                       bos_token_id=0, eos_token_id=98)
        hf = CLIPTextModel(hf_cfg).eval()
        cfg = CLIPTextConfig(**self.TINY)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        L = cfg.num_hidden_layers
        pre = "text_model.encoder.layers.{l}."
        t = np.transpose

        def stack(fmt, tr=lambda x: x):
            return jnp.asarray(np.stack([tr(sd[fmt.format(l=l)]) for l in range(L)]))

        params = {
            "token_embedding": jnp.asarray(sd["text_model.embeddings.token_embedding.weight"]),
            "position_embedding": jnp.asarray(sd["text_model.embeddings.position_embedding.weight"]),
            "final_ln_w": jnp.asarray(sd["text_model.final_layer_norm.weight"]),
            "final_ln_b": jnp.asarray(sd["text_model.final_layer_norm.bias"]),
            "layers": {
                "ln1_w": stack(pre + "layer_norm1.weight"),
                "ln1_b": stack(pre + "layer_norm1.bias"),
                "ln2_w": stack(pre + "layer_norm2.weight"),
                "ln2_b": stack(pre + "layer_norm2.bias"),
                "wq": stack(pre + "self_attn.q_proj.weight", t),
                "bq": stack(pre + "self_attn.q_proj.bias"),
                "wk": stack(pre + "self_attn.k_proj.weight", t),
                "bk": stack(pre + "self_attn.k_proj.bias"),
                "wv": stack(pre + "self_attn.v_proj.weight", t),
                "bv": stack(pre + "self_attn.v_proj.bias"),
                "wo": stack(pre + "self_attn.out_proj.weight", t),
                "bo": stack(pre + "self_attn.out_proj.bias"),
                "fc1_w": stack(pre + "mlp.fc1.weight", t),
                "fc1_b": stack(pre + "mlp.fc1.bias"),
                "fc2_w": stack(pre + "mlp.fc2.weight", t),
                "fc2_b": stack(pre + "mlp.fc2.bias"),
            },
        }
        ids = np.array([[5, 9, 30, 98, 0, 0], [7, 98, 0, 0, 0, 0]])
        with torch.no_grad():
            hout = hf(torch.from_numpy(ids))
        last, pooled = clip_text_forward(params, cfg, jnp.asarray(ids))
        np.testing.assert_allclose(
            np.asarray(last), hout.last_hidden_state.numpy(), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled), hout.pooler_output.numpy(), rtol=2e-3, atol=2e-4
        )

    def test_similarity_shape_and_scale(self):
        img = jnp.asarray(np.random.default_rng(0).standard_normal((3, 16)))
        txt = jnp.asarray(np.random.default_rng(1).standard_normal((5, 8)))
        vp = jnp.asarray(np.random.default_rng(2).standard_normal((16, 4)))
        tp = jnp.asarray(np.random.default_rng(3).standard_normal((8, 4)))
        logits = clip_similarity(img, txt, vp, tp, logit_scale=100.0)
        assert logits.shape == (3, 5)
        assert float(jnp.max(jnp.abs(logits))) <= 100.0 + 1e-3


class TestNLP:
    def setup_method(self):
        self.cfg = LlamaConfig(
            vocab_size=200, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64,
        )
        self.params = init_llama_params(jax.random.PRNGKey(0), self.cfg)

    def test_logprob_additivity(self):
        ids = jnp.asarray([[1, 5, 9, 12, 0, 0]])
        full = sequence_logprob(self.params, self.cfg, ids,
                                jnp.asarray([1]), jnp.asarray([4]))
        a = sequence_logprob(self.params, self.cfg, ids, jnp.asarray([1]), jnp.asarray([3]))
        b = sequence_logprob(self.params, self.cfg, ids, jnp.asarray([3]), jnp.asarray([4]))
        np.testing.assert_allclose(float(full[0]), float(a[0]) + float(b[0]), rtol=1e-4)

    def test_multiple_choice_picks_repetition(self):
        """A random LM still assigns higher normalized logprob to a
        continuation it has seen in-context than to unrelated tokens...
        not guaranteed — instead verify determinism + valid index."""
        class Tok:
            def encode(self, text):
                return [ord(c) % 150 + 10 for c in text[:8]]

        idx = multiple_choice(self.params, self.cfg, Tok(), "context", ["aa", "bb", "cc"])
        assert idx in (0, 1, 2)
        idx2 = multiple_choice(self.params, self.cfg, Tok(), "context", ["aa", "bb", "cc"])
        assert idx == idx2

    def test_perplexity_positive(self):
        ids = jnp.asarray([[1, 5, 9, 12, 7, 0]])
        p = perplexity(self.params, self.cfg, ids, jnp.asarray([5]))
        assert p > 1.0 and np.isfinite(p)


class TestT2IProtocol:
    def test_clip_select_picks_best(self):
        n, s = 3, 4
        cands = np.random.default_rng(0).random((n, s, 8, 8, 3)).astype(np.float32)

        def score_fn(images, captions):
            # score = brightness; best = brightest per caption
            return images.mean(axis=(1, 2, 3))

        best = clip_select(cands, ["a", "b", "c"], score_fn)
        expect = cands[np.arange(n), cands.mean(axis=(2, 3, 4)).argmax(axis=1)]
        np.testing.assert_array_equal(best, expect)

    @pytest.mark.slow
    def test_run_protocol_end_to_end_tiny(self):
        inception = init_inception_params(jax.random.PRNGKey(0))

        def pipeline_fn(captions, rng):
            return jax.random.uniform(rng, (len(captions), 16, 16, 3))

        def score_fn(images, captions):
            return images.mean(axis=(1, 2, 3))

        ref = np.random.default_rng(1).random((8, 16, 16, 3)).astype(np.float32)
        out = run_protocol(
            pipeline_fn, score_fn, inception,
            ["cap one", "cap two"], ref,
            T2IProtocol(num_seeds=2, num_inference_steps=1, batch_size=2),
            shard=False,
        )
        assert np.isfinite(out["fid"]) and out["n"] == 2

    def test_lncoco_caption_loader(self, tmp_path):
        import json

        from dreamllm_tpu.eval.text2img import lncoco_protocol, load_lncoco_captions

        rows = [
            {"image_id": 42, "caption": "first narrative of image 42"},
            {"image_id": 42, "caption": "second narrative of image 42"},
            {"image_id": 7, "caption": "only narrative of image 7"},
            {"image_id": 9, "caption": "narrative of image 9"},
        ]
        p = tmp_path / "lncoco_captions_val2017.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))

        caps = load_lncoco_captions(str(p), seed=0)
        # one caption per image, insertion order preserved
        assert len(caps) == 3
        assert caps[0].endswith("image 42")
        assert caps[1] == "only narrative of image 7"
        assert caps[2] == "narrative of image 9"
        trimmed = load_lncoco_captions(str(p), seed=0, max_images=2)
        assert trimmed == caps[:2]  # same seed -> same draw, truncated

        proto = lncoco_protocol()
        assert (proto.num_seeds, proto.num_inference_steps, proto.guidance_scale) == (1, 100, 3.0)


def test_sample_and_select_matches_materialized_path():
    """Running best-of-S (memory-safe protocol path) must pick exactly the
    images the materialize-everything path picks."""
    from dreamllm_tpu.eval.text2img import (
        T2IProtocol,
        clip_select,
        sample_and_select,
        sample_candidates,
    )

    def pipeline_fn(captions, rng):
        return jax.random.uniform(rng, (len(captions), 8, 8, 3))

    def score_fn(images, captions):
        return np.asarray(images).mean(axis=(1, 2, 3))

    caps = ["a", "b", "c", "d", "e"]
    proto = T2IProtocol(num_seeds=3, num_inference_steps=1, batch_size=2)
    cands = sample_candidates(pipeline_fn, caps, proto)
    expect = clip_select(cands, caps, score_fn)
    got = sample_and_select(pipeline_fn, caps, score_fn, proto)
    np.testing.assert_allclose(got, expect, rtol=1e-6)
