"""SfM / retrieval / PnP initialization front-end.

The reference drives this stage through hloc + pycolmap (SURVEY.md §2.6,
§3.3): SuperPoint/SuperGlue feature matching, NetVLAD retrieval, and
PnP-RANSAC initial poses. Here we provide:

- ``pnp``       : native PnP-RANSAC (DLT hypotheses + Gauss-Newton polish),
                  replacing pycolmap.absolute_pose_estimation for init poses.
- ``retrieval`` : global-descriptor top-k retrieval (dot products — on TPU
                  this is one matmul).
- ``evaluate``  : the reference's median / threshold-recall pose metrics.
- ``io``        : results files (name qw qx qy qz tx ty tz) and query lists
                  with intrinsics — interop with existing hloc artifacts.
- ``incremental``: native incremental SfM with unknown poses (essential-
                  matrix bootstrap + PnP registration + JAX LM bundle
                  adjustment), replacing pycolmap.incremental_mapping.
"""

from .pnp import pnp_ransac
from .retrieval import top_k_retrieval
from .evaluate import pose_errors, summarize_errors, THRESHOLDS
from .io import read_pose_results, write_pose_results, read_query_list_with_intrinsics
from .bundle_adjust import BAProblem, bundle_adjust, bundle_adjust_np
from .incremental import (
    Reconstruction, decompose_essential, essential_ransac,
    incremental_mapping,
)
from .evaluate import umeyama_alignment
from .superglue import (
    convert_torch_weights_superglue, load_superglue, matches_as_pairs,
    superglue_match,
)
