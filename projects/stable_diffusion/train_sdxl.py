"""Plain SDXL fine-tuning entry point — the reference ships this as a
separate script (reference projects/stable_diffusion/train_sdxl.py:1-80 with
configs/base_xl.py:1); here it is the same loop as ``train.py`` with the
SDXL head forced on (dual conditioning, add_time_ids micro-conditioning,
fp32-VAE policy — models/sd/sdxl.py).

    python -m projects.stable_diffusion.train_sdxl --config_file .../smoke_xl.py
"""

from __future__ import annotations

from projects.stable_diffusion.train import main as _main


def main(argv=None):
    return _main(argv, force_head_type="sdxl")


if __name__ == "__main__":
    main()
