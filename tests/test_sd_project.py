"""Plain-SD project: the SDXL twin entry point trains end-to-end (reference
ships a separate train_sdxl.py, projects/stable_diffusion/train_sdxl.py:1-80
+ configs/base_xl.py:1 — here the same loop with head_type='sdxl')."""

import numpy as np
import pytest


@pytest.mark.slow
def test_sdxl_twin_train_smoke(tmp_path):
    from projects.stable_diffusion.train_sdxl import main

    final = main([
        "--config_file", "projects/stable_diffusion/configs/smoke_xl.py",
        f"run_dir={tmp_path}", f"trainer.output_dir={tmp_path}",
    ])
    assert int(final.step) == 3
    # dual-conditioning params exist and trained finite
    assert "global_projector" in final.params
    for leaf in [final.params["unet"]["conv_in"]["w"],
                 final.params["global_projector"]["layers"][0]["w"]
                 if "layers" in final.params["global_projector"]
                 else list(final.params["global_projector"].values())[0]]:
        arr = np.asarray(leaf, dtype=np.float32)
        assert np.all(np.isfinite(arr))


@pytest.mark.slow
def test_sd_train_smoke_still_green(tmp_path):
    """head_type switch must not regress the plain-SD path."""
    from projects.stable_diffusion.train import main

    final = main([
        "--config_file", "projects/stable_diffusion/configs/smoke.py",
        f"run_dir={tmp_path}", f"trainer.output_dir={tmp_path}",
    ])
    assert int(final.step) == 4
    assert "global_projector" not in final.params
