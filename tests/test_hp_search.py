"""HP-search: space sampling, objective semantics, search loop
(reference omni/train/trainer_utils.py:238-330)."""

import numpy as np

from dreamllm_tpu.train.hp_search import (
    HPDim,
    default_compute_objective,
    default_hp_space,
    hyperparameter_search,
)


def test_default_space_bounds():
    rng = np.random.default_rng(0)
    space = {d.name: d for d in default_hp_space()}
    for _ in range(50):
        lr = space["learning_rate"].sample(rng)
        assert 1e-6 <= lr <= 1e-4
        ep = space["num_train_epochs"].sample(rng)
        assert 1 <= ep <= 5 and isinstance(ep, int)
        bs = space["per_device_train_batch_size"].sample(rng)
        assert bs in (4, 8, 16, 32, 64)


def test_objective_eval_loss_vs_sum():
    # loss-only -> eval_loss; other metrics -> their sum, speed metrics dropped
    assert default_compute_objective({"eval_loss": 1.5, "epoch": 2}) == 1.5
    m = {"eval_loss": 1.5, "acc": 0.8, "f1": 0.6, "eval_runtime": 99.0,
         "steps_per_second": 3.0}
    assert default_compute_objective(m) == 0.8 + 0.6


def test_random_search_finds_minimum_region():
    # quadratic in lr (log space): optimum at 1e-5
    def train_fn(hp):
        return {"eval_loss": (np.log10(hp["learning_rate"]) + 5.0) ** 2}

    best = hyperparameter_search(
        train_fn, [HPDim("learning_rate", "loguniform", 1e-6, 1e-4)],
        n_trials=64, seed=3,
    )
    assert abs(np.log10(best.hyperparameters["learning_rate"]) + 5.0) < 0.5
    assert best.objective < 0.25


def test_maximize_direction():
    def train_fn(hp):
        return {"score": hp["x"]}

    best = hyperparameter_search(
        train_fn, [HPDim("x", "uniform", 0.0, 1.0)],
        n_trials=32, direction="maximize", seed=1,
    )
    assert best.objective > 0.9
