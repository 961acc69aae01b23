"""Gaussian splat parameter pytree.

Field semantics mirror the reference ``GaussianModel``
(/root/reference/gaussian_splatting/scene/gaussian_model.py:26-41,124-147):

- ``xyz``            (N, 3)        world positions
- ``features_dc``    (N, 1, 3)     SH DC band
- ``features_rest``  (N, K-1, 3)   higher SH bands, K = (sh_degree+1)^2
- ``scaling``        (N, 3)        log-space scales (activation: exp)
- ``rotation``       (N, 4)        wxyz quaternion (activation: normalize)
- ``opacity``        (N, 1)        logit opacity (activation: sigmoid)
- ``live``           (N,)          bool — TPU-native fixed-capacity design: arrays
                                   are padded to a static capacity and dead slots
                                   are masked out. This replaces the reference's
                                   dynamic cat/prune tensor surgery
                                   (gaussian_model.py:258-327) which would force
                                   recompilation every densify step under XLA.

``sh_degree``/``max_sh_degree`` are static aux fields (they select the traced
SH basis), so bumping the active degree triggers exactly one recompile, same
cost model as the reference's ``oneupSHdegree``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import sh as sh_lib


@struct.dataclass
class GaussianParams:
    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    live: jnp.ndarray
    sh_degree: int = struct.field(pytree_node=False, default=3)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ------------------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.live.astype(jnp.int32))

    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        sq = jnp.sum(self.rotation * self.rotation, axis=-1, keepdims=True)
        return self.rotation * jax.lax.rsqrt(jnp.maximum(sq, 1e-20))

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jnp.ndarray:
        """(N, K, 3) concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def one_up_sh_degree(self) -> "GaussianParams":
        if self.sh_degree < self.max_sh_degree:
            return self.replace(sh_degree=self.sh_degree + 1)
        return self

    def grown(self, new_capacity: int) -> "GaussianParams":
        """Pad every per-Gaussian array to a larger static capacity.

        The TPU-native analog of the reference's unbounded tensor growth
        (gaussian_model.py:258-327): capacity is static per compilation, so
        when densification exhausts the free list the host pads all arrays
        (dead slots, masked ``live=False``) and the next step re-jits once
        at the new capacity.
        """
        cap = self.capacity
        assert new_capacity >= cap, (new_capacity, cap)
        if new_capacity == cap:
            return self

        def pad(a, fill=0.0):
            width = [(0, new_capacity - cap)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, width, constant_values=fill)

        rot = pad(self.rotation)
        # keep dead-slot quaternions valid so normalize() stays finite
        rot = rot.at[cap:, 0].set(1.0)
        return self.replace(
            xyz=pad(self.xyz),
            features_dc=pad(self.features_dc),
            features_rest=pad(self.features_rest),
            scaling=pad(self.scaling, fill=-10.0),
            rotation=rot,
            opacity=pad(self.opacity, fill=-10.0),
            live=pad(self.live, fill=False),
        )

    # ------------------------------------------------------------------
    @classmethod
    def empty(cls, capacity: int, sh_degree: int = 3, active_sh_degree: int = 0
              ) -> "GaussianParams":
        k = sh_lib.num_sh_coeffs(sh_degree)
        return cls(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
            features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
            scaling=jnp.full((capacity, 3), -10.0, jnp.float32),
            rotation=jnp.concatenate(
                [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], axis=1
            ).astype(jnp.float32),
            opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
            live=jnp.zeros((capacity,), bool),
            sh_degree=active_sh_degree,
            max_sh_degree=sh_degree,
        )

    @classmethod
    def from_arrays(
        cls,
        xyz: np.ndarray,
        features_dc: np.ndarray,
        features_rest: np.ndarray,
        scaling: np.ndarray,
        rotation: np.ndarray,
        opacity: np.ndarray,
        sh_degree: int,
        active_sh_degree: Optional[int] = None,
        capacity: Optional[int] = None,
    ) -> "GaussianParams":
        """Build from dense (unpadded) arrays, padding to ``capacity``."""
        p = xyz.shape[0]
        cap = capacity or p
        assert cap >= p, f"capacity {cap} < points {p}"

        def pad(a, fill=0.0):
            a = jnp.asarray(a, jnp.float32)
            if cap == p:
                return a
            width = [(0, cap - p)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, width, constant_values=fill)

        live = jnp.arange(cap) < p
        rot = pad(rotation)
        # keep dead-slot quaternions valid so normalize() stays finite
        rot = jnp.where(live[:, None], rot, jnp.array([1.0, 0, 0, 0]))
        return cls(
            xyz=pad(xyz),
            features_dc=pad(features_dc),
            features_rest=pad(features_rest),
            scaling=pad(scaling, fill=-10.0),
            rotation=rot,
            opacity=pad(opacity, fill=-10.0),
            live=live,
            sh_degree=sh_degree if active_sh_degree is None else active_sh_degree,
            max_sh_degree=sh_degree,
        )

    @classmethod
    def from_pcd(
        cls,
        points: np.ndarray,
        colors: np.ndarray,
        sh_degree: int = 3,
        capacity: Optional[int] = None,
        point_size: float = 1.0,
        mean_sq_dist: Optional[np.ndarray] = None,
    ) -> "GaussianParams":
        """Initialize from a colored point cloud (SfM points).

        Mirrors create_from_pcd (gaussian_model.py:124-147): DC features from
        RGB2SH, isotropic log-scales from sqrt(mean 3-NN squared distance),
        identity quats, opacity sigmoid^-1(0.1).
        """
        from ..ops.knn import mean_knn_sq_dist  # local import: avoids cycle

        p = points.shape[0]
        if p == 0:
            raise ValueError(
                "cannot initialize a Gaussian map from 0 points — the SfM "
                "stage produced an empty cloud (check feature extraction / "
                "triangulation upstream)")
        k = sh_lib.num_sh_coeffs(sh_degree)
        if mean_sq_dist is None:
            mean_sq_dist = mean_knn_sq_dist(jnp.asarray(points, jnp.float32), k=3)
        dist = jnp.clip(jnp.asarray(mean_sq_dist, jnp.float32), 1e-7, None)
        scales = jnp.log(jnp.sqrt(dist) * point_size)[:, None].repeat(3, axis=1)
        fdc = sh_lib.rgb_to_sh_dc(np.asarray(colors, np.float32))[:, None, :]
        frest = np.zeros((p, k - 1, 3), np.float32)
        rot = np.zeros((p, 4), np.float32)
        rot[:, 0] = 1.0
        opacity = np.full((p, 1), _inverse_sigmoid(0.1), np.float32)
        return cls.from_arrays(
            xyz=points,
            features_dc=fdc,
            features_rest=frest,
            scaling=np.asarray(scales),
            rotation=rot,
            opacity=opacity,
            sh_degree=sh_degree,
            active_sh_degree=0,
            capacity=capacity,
        )


def _inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1.0 - x)))


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
