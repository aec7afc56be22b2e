"""Offline map -> localization feature map converter.

Re-design of the ``featureExtracter`` CLI
(/root/reference/L_SLAM/src/io_module/feature_extracter.cpp:30-133, driven by
scripts/map_convert_for_localization.sh): load a dense aggregated map cloud,
voxel-partition it into chunks, estimate local surface structure per point,
classify planar points as surf features and edge/boundary points as corner
features, insert into a FeatureMap cube grid, and save the cube manifest.

The reference chains PCL normal estimation + region-growing + boundary
estimation per 50 m chunk under OpenMP; here a k-NN PCA over the whole cloud
runs as one batched device computation: eigenvalue ratios of the local
covariance give planarity (surf) and linearity (corner) directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MapConfig
from ..maps import feature_map as fm
from ..ops import neighbors
from ..utils import cloud as cloud_lib
from . import map_io


def classify_map_points(
    xyz: np.ndarray,
    k: int = 10,
    planar_thresh: float = 0.05,
    linear_thresh: float = 5.0,
    chunk: int = 1024,
):
    """Per-point structure classification via k-NN PCA.

    Returns (is_surf [N], is_corner [N]).  planar: smallest eigenvalue tiny
    relative to the others; linear: largest dominates the middle.
    """
    pts = jnp.asarray(xyz, jnp.float32)
    n = pts.shape[0]
    mask = jnp.ones(n, bool)

    idx, _ = neighbors.knn_chunked(pts, pts, mask, k, chunk)
    nb = pts[idx]                                    # [N, k, 3]
    centroid = jnp.mean(nb, axis=-2, keepdims=True)
    a = nb - centroid
    cov = jnp.einsum("nki,nkj->nij", a, a) / k
    evals = jnp.linalg.eigvalsh(cov)                 # ascending
    l0, l1, l2 = evals[:, 0], evals[:, 1], evals[:, 2]
    is_surf = (l0 < planar_thresh * jnp.maximum(l1, 1e-12)) & (
        l1 > 0.05 * jnp.maximum(l2, 1e-12)
    )
    is_corner = (l2 > linear_thresh * jnp.maximum(l1, 1e-12)) & ~is_surf
    return np.asarray(is_surf), np.asarray(is_corner)


def extract_feature_map(
    xyz: np.ndarray,
    cfg: MapConfig,
    k: int = 10,
    batch_insert: int = 8192,
) -> fm.FeatureMapState:
    """Dense map cloud -> FeatureMapState of corner/surf features."""
    is_surf, is_corner = classify_map_points(np.asarray(xyz), k=k)
    state = fm.create(cfg)
    surf_pts = np.asarray(xyz)[is_surf]
    corner_pts = np.asarray(xyz)[is_corner]

    def insert(points, as_corner):
        nonlocal state
        for lo in range(0, len(points), batch_insert):
            c = cloud_lib.from_points(
                jnp.asarray(points[lo : lo + batch_insert], jnp.float32),
                capacity=batch_insert,
            )
            empty = cloud_lib.empty(1)
            if as_corner:
                state = fm.add_feature_cloud(state, c, empty, cfg)
            else:
                state = fm.add_feature_cloud(state, empty, c, cfg)

    insert(corner_pts, True)
    insert(surf_pts, False)
    return state


def convert_map_for_localization(pcd_path: str, out_dir: str, cfg: MapConfig) -> int:
    """The map_convert_for_localization.sh flow: PCD in, cube manifest out."""
    from . import pcd as pcd_io

    xyz, _ = pcd_io.read_pcd(pcd_path)
    state = extract_feature_map(xyz, cfg)
    return map_io.save_feature_map(state, cfg, out_dir)
