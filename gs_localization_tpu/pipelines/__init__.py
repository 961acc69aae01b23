"""End-to-end workflow pipelines (the reference's per-dataset scripts, §2.7,
generalized into reusable parameterized stages):

- ``train_map``   : 3DGS map training from a COLMAP scene (gs/ stage).
- ``localize``    : PnP-initialized batched pose refinement vs a trained map
                    (pipelines/ stage).
- ``render_eval`` : render views + PSNR/SSIM metrics (render.py/metrics.py).
"""

from .train_map import TrainPipelineConfig, train_map
from .localize import LocalizePipelineConfig, localize_queries
from .render_eval import render_and_eval
