"""Blend gate constants shared by the kernels AND the binning cull.

Kept in a dependency-free module: binning must import the gate value (its
per-tile opacity cull is exact ONLY if its threshold equals the kernels'),
and blend pulls in kernel machinery binning must not depend on.

Reference semantics (SURVEY.md §2.1): alpha = min(0.99, opa*exp(power)),
skip alpha < 1/255, stop when T < 1e-4 (forward.cu:328-366).
"""

import math

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
LOG_T_EPS = float(math.log(1e-4))
