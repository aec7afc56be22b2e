"""Typed configuration for the whole framework.

The reference scatters configuration over three tiers — ROS parameter server
defaults (ScanRegistration.cpp:32-49, LaserOdometry.cpp:40-83,
LaserMatcher.cpp:49-118), launch-file per-sensor bindings
(L_SLAM/launch/node/*.launch), and hard-coded solver constants.  Here every
knob lives in one frozen dataclass tree so a config fully determines a compiled
program (static shapes included).

Capacity fields (``max_*``) are the static-shape bounds replacing the
reference's dynamically sized clouds.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RegistrationConfig:
    """Feature-extraction parameters (RegistrationParams, ScanRegistration.h:43-119;
    defaults ScanRegistration.cpp:32-49)."""

    scan_period: float = 0.1          # sweep duration [s]
    n_feature_regions: int = 6        # azimuthal regions per ring
    curvature_region: int = 5         # +/- neighbors for curvature
    max_corner_sharp: int = 2         # sharp corners kept per region
    max_corner_less_sharp: int = 20   # 10 * max_corner_sharp in reference
    max_surface_flat: int = 4         # flat surfs kept per region
    surface_curvature_threshold: float = 0.02
    corner_curvature_threshold: float = 1.0
    less_flat_filter_size: float = 0.2  # voxel leaf for less-flat cloud
    blind_threshold: float = 0.9996     # cos-angle threshold for blind/occluded
    min_range: float = 0.5              # blind radius cull
    max_range: float = 150.0
    # classification (pointClassify, ScanRegistration.cpp:547-666)
    classify_eig_ratio12: float = 100.0
    classify_eig_ratio13: float = 10000.0
    classify_line_tol: float = 0.08
    # static capacities
    n_rings: int = 16
    max_points_per_ring: int = 2048
    max_sharp: int = 256          # capacity of the sharp-corner cloud
    max_less_sharp: int = 2048
    max_flat: int = 1024          # 2 * max_surface_flat * regions * rings bound
    max_less_flat: int = 8192


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Scan-to-scan solver (LaserOdometry.cpp:24-25 and scanMatch)."""

    max_iterations: int = 25
    delta_r_abort: float = 0.1     # [deg] (converge thresholds, :636-644)
    delta_t_abort: float = 0.1     # [cm-scale: |dt|*100]
    refresh_every: int = 5         # correspondences re-found every 5 iters (:358)
    n_rings: int = 16              # scan rings of the sensor (ring-NN buckets)
    nn_sq_dist_max: float = 25.0   # 1-NN gate (:364)
    ring_span: float = 2.5         # adjacent-ring search window (:372)
    residual_scale: float = 0.05   # matB = -0.05 * coeff.intensity (:575)
    corner_weight_slope: float = 1.8  # robust weight after iter 5 (feature_utils.h:55)
    weight_min: float = 0.1
    eig_threshold: float = 10.0    # degeneracy (:596)
    min_matched: int = 10
    # native-mode safeguards (no reference equivalent — the reference's 0.05
    # under-relaxation plays this role): per-step trust region and a floor on
    # the iteration at which convergence may be declared (after one refresh)
    trust_region_t: float = 0.3
    trust_region_r: float = 0.05
    min_converge_iter: int = 6
    # stream the NN distance tile in query chunks of this size (0 = one
    # [Q, M] tile).  Caps peak memory of the batched solve at
    # [B, chunk, M] — set for very large B (memory, not speed)
    nn_query_chunk: int = 0
    # NN kernel selection: "auto" = streaming Pallas VMEM kernels on TPU
    # (with a probe-compile fallback to dense), dense XLA races elsewhere;
    # "pallas"/"dense" force a path.  COOPER_USE_PALLAS=0/1 overrides for
    # experiments (ops/neighbors.resolve_backend)
    kernel_backend: str = "auto"
    # MXU precision of the NN cross-term matmul only (None = package default,
    # 'highest').  'high' = 3-pass bf16: ~5% faster solves, but near-tie NN
    # races can flip, perturbing poses at the convergence-tolerance scale
    # (~1e-3) — leave at None when bit-stable trajectories matter
    nn_precision: str | None = None
    # unroll the inner GN iterations instead of lax.fori_loop — identical
    # results, larger program, better XLA fusion across refresh boundaries
    unroll_iters: bool = False
    # native-mode chaining stabilizer: de-warp the query sweep with the
    # warm-start twist (constant-velocity prior), then solve the residual
    # motion RIGIDLY (s=1 for every point).  The reference's s-scaled warp
    # makes each solve's error couple to the previous sweep's projection
    # error with loop gain that can exceed 1 (pitch/height see-saw); the
    # reference stays stable only through its 0.05 residual under-relaxation.
    # De-warp + rigid solve caps the gain at ~E[1-s] ~ 0.5.  Ignored in
    # parity_mode (the reference has no such stage)
    cv_dewarp: bool = True
    # number of de-warp/solve passes: pass k re-de-warps the ORIGINAL clouds
    # with pass k-1's solved twist and re-solves.  The constant-velocity
    # prior is exact only at constant motion; under varying yaw rate the
    # residual in-sweep distortion biases the rigid fit (measured ~0.5 deg
    # rotation bias per sweep at ~6 deg/sweep yaw on a figure-eight — the
    # bias mapping then compounds through its map inserts).  A second pass
    # de-warps with the measured twist instead of the prior, cutting the
    # rotation bias ~5x at 2x odometry cost.  1 = reference schedule
    # (LaserOdometry solves once per sweep)
    dewarp_passes: int = 1


@dataclasses.dataclass(frozen=True)
class ScanMatchConfig:
    """Scan-to-map solver (ScanMatch.cpp)."""

    max_iterations: int = 10
    delta_r_abort: float = 0.05
    delta_t_abort: float = 0.05
    knn: int = 5
    nn_sq_dist_max: float = 5.0       # 5th-NN gate (ScanMatch.cpp:102)
    plane_max_dist: float = 0.2       # findPlane inlier check (:122)
    line_eig_ratio: float = 5.0       # findLine lambda2 > 5*lambda1 (feature_utils.h:145)
    weight_slope: float = 0.9         # map-variant robust weight (feature_utils.h:70,102)
    weight_min: float = 0.1
    eig_threshold: float = 100.0      # degeneracy (:223)
    min_matched: int = 50
    use_score: bool = True
    score_threshold: float = 800.0    # (:24)
    match_percentage_threshold: float = 0.4
    # scanMatchLocal downsample leaves (:29-30)
    local_corner_leaf: float = 0.2
    local_surf_leaf: float = 0.4
    # Marquardt-scaled diagonal damping: solve (JtJ + lam*diag(JtJ)) dx = Jtb.
    # 0 = pure GN (the reference's dynamics, ScanMatch.cpp:196-201).  The
    # undamped solve can enter a correspondence-flip limit cycle: 5-NN sets
    # re-found each iteration flip between poses ~5 mm apart, above the 1 mm
    # convergence threshold, so the solve never "converges" and success is
    # forfeited even at high score (the reference author hit exactly this —
    # "??? should we take the result when not converge?", ScanMatch.cpp:342).
    # The loop-closure fine match engages it via LoopConfig.fine_damping.
    lm_damping: float = 0.0
    # 5-NN kernel selection — see OdometryConfig.kernel_backend.  The
    # streaming Pallas top-k (ops/pallas/knn_stream.py) measures 10x the
    # dense path on surround-map-sized references (BENCH.md round 3).  A
    # grid-bucketed search (the per-cube kd-tree equivalent) was tried and
    # retired in round 4: the batched bucket query (a [Q, 27*cap] gather
    # from a [2^17, cap] table per problem) measured ~10x SLOWER than the
    # dense masked-distance race and faulted the TPU worker under vmap
    # (round-3 probe; conclusions in BENCH.md "Known floor")
    kernel_backend: str = "auto"


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Cube-grid feature map (FeatureMap.h; params LaserMatcher.cpp:107-113)."""

    cube_size: float = 50.0
    n_cubes: Tuple[int, int, int] = (21, 11, 21)
    valid_distance: float = 150.0        # lidarValidDistance (active-area cull)
    corner_cube_capacity: int = 4096     # points stored per cube
    surf_cube_capacity: int = 8192
    corner_leaf: float = 0.2             # insertion re-voxelize leaves
    surf_leaf: float = 0.4
    margin_cubes: int = 3                # sensor kept >= 3 cubes from boundary
    # dedup_active policy: "centroid" is pcl::VoxelGrid parity
    # (FeatureMap.h:289-306, the default); "anchor" keeps each voxel's
    # oldest observation instead (see feature_map.dedup_active) — measured
    # marginally better on the figure-eight (0.061 vs 0.066 m aligned ATE)
    dedup_policy: str = "centroid"
    # surround gather capacities (static shapes for the solver)
    surround_corner_capacity: int = 32768
    surround_surf_capacity: int = 65536
    # vertical-FOV active-area cull (DynamicFeatureMap::InVerticalFov,
    # DynamicFeatureMap.h:748-804): surround cubes whose vertical angle from
    # the sensor lies outside [-down, +up] degrees contribute nothing.  The
    # reference applies this only in the out-of-core map; 0/0 disables.
    vfov_up_deg: float = 0.0
    vfov_down_deg: float = 0.0


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """LaserMatcher shared knobs (LaserMatcher.cpp:45-170).

    The reference's ``inputFrameSkip`` (process 1 in every skip+1 odometry
    frames, LaserLocalization.cpp:175-178) maps to
    ``PipelineConfig.mapping_stride`` — one knob, not two.
    ``dynamic_mode`` switches the pipeline's map to the out-of-core
    DynamicFeatureMap with disk paging (LaserMatcher.cpp:107-118).
    """

    corner_leaf: float = 0.2     # prepareFeatureFrame voxel leaves (:288-301)
    surf_leaf: float = 0.4
    dynamic_mode: bool = False
    map_directory: str = "/tmp/cooper_dynamic_map"  # cube PCD store for dynamic_mode
    max_frame_corner: int = 4096   # downsampled incoming stack capacities
    max_frame_surf: int = 8192
    # in-loop map hygiene: voxel re-deduplicate the active cubes every Nth
    # mapping solve (downsizeValidCloud runs every pass in the reference,
    # FeatureMap.h:289-306; a stride amortizes the gather/scatter cost)
    dedup_stride: int = 4
    # deliberate deviation: when the scan-match score gate REJECTS a solve,
    # the reference still commits the solved pose and inserts the frame into
    # the map at it (ScanMatch returns false but writes transformf,
    # ScanMatch.cpp:325-346; LaserMapping ignores the bool and
    # featureMapUpdate inserts unconditionally, LaserMatcher.cpp:327-331,
    # 349-355) — registering exactly the geometry the gate flagged.  False
    # (default): fall back to the DEAD-RECKONED merge guess for the pose and
    # the insert (the treatment LaserLocalization gives the same gate,
    # LaserLocalization.cpp:140-166); rejected frames then carry at worst
    # odometry drift, and the map never starves.  True: reference dynamics.
    commit_rejected_solves: bool = False


@dataclasses.dataclass(frozen=True)
class UKFConfig:
    """UKF fusion (ukf_pose_estimator.hpp:35-60, unscented_kalman_filter.hpp)."""

    state_dim: int = 16    # [p(3), v(3), q(4), acc_bias(3), gyro_bias(3)]
    input_dim: int = 6     # [acc(3), gyro(3)]
    measure_dim: int = 10  # [p(3), v(3), q(4)]
    lam: float = 1.0       # sigma-point lambda (:45)
    # process noise scaling (pos/vel x10, quat x5, biases 1e-6)
    process_noise_pos: float = 10.0 * 1e-3
    process_noise_vel: float = 10.0 * 1e-3
    process_noise_quat: float = 5.0 * 1e-3
    process_noise_bias: float = 1e-6
    measure_noise_pos: float = 0.01
    measure_noise_vel: float = 0.1
    measure_noise_quat: float = 0.001
    cool_time_duration: float = 1.0   # predict cool-down (:70)
    max_velocity: float = 30.0        # clamp before correct (LaserLocalization.cpp:158)
    reset_jump: float = 5.0           # UKF reset when correction jumps > 5 m


@dataclasses.dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe gating (keyframe_updater.hpp:12-48)."""

    keyframe_delta_trans: float = 0.25
    keyframe_delta_angle: float = 0.05


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Loop detection thresholds (loop_detector.hpp:57-63, 106-164)."""

    distance_thresh: float = 5.0          # radius for trajectory NN
    estimated_distance_thresh: float = 25.0
    accum_distance_thresh: float = 30.0   # traveled-distance gap
    min_loop_interval: float = 3.0        # distance since last loop
    max_candidates: int = 6
    candidate_cluster_dist: float = 5.0
    # fine matching reuses ScanMatchConfig with scanMatchLocal leaves, plus
    # Marquardt damping (ScanMatchConfig.lm_damping): the stacked
    # multi-keyframe reference makes the undamped GN prone to a
    # correspondence-flip limit cycle just above the convergence thresholds
    # (measured: lam=1 converges in 7 iters to the cycle's center pose;
    # lam=0 oscillates forever — BENCH.md round-5 notes)
    fine_damping: float = 1.0


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    """Pose-graph backend (graph.cpp, solver_g2o.cpp)."""

    max_iterations: int = 50            # LM iterations (g2o budget is 1000; LM
                                        # on TPU converges far faster per-iter cost)
    max_nodes: int = 1024
    max_edges: int = 2048
    lm_init_lambda: float = 1e-4
    lm_lambda_factor: float = 10.0
    # hand-set information matrices (graph.cpp:281-291, 334-341)
    seq_info_trans: Tuple[float, float, float] = (0.8, 0.4, 0.8)
    seq_info_rot: Tuple[float, float, float] = (1.0, 2.0, 1.0)
    loop_info: float = 2.0
    # inner linear solver: "dense" (Cholesky/LU on the [6N,6N] system, best
    # for small graphs) or "cg" (matrix-free block-Jacobi PCG over per-edge
    # 6x6 blocks — O(E+N) memory, the scalable path for city-size graphs)
    solver: str = "dense"
    pcg_iters: int = 64                 # CG iterations for solver="cg"


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    registration: RegistrationConfig = RegistrationConfig()
    odometry: OdometryConfig = OdometryConfig()
    scan_match: ScanMatchConfig = ScanMatchConfig()
    feature_map: MapConfig = MapConfig()
    matcher: MatcherConfig = MatcherConfig()
    ukf: UKFConfig = UKFConfig()
    keyframe: KeyframeConfig = KeyframeConfig()
    loop: LoopConfig = LoopConfig()
    pose_graph: PoseGraphConfig = PoseGraphConfig()
    mapping_stride: int = 2   # mapping every Nth sweep (rate decoupling)
    # run the pose-graph backend in-loop: mapping outputs are gated into
    # keyframes, loops are detected/optimized, and the odom->graph correction
    # is applied to the reported trajectory (the Graph node riding the
    # mapping output, graph.cpp:301-378)
    enable_graph: bool = False


# Per-sensor presets mirroring the launch-file parameter sets
# (launch/node/lidar_mapping.launch, lidar_localization.launch).

def vlp16() -> PipelineConfig:
    return PipelineConfig(
        registration=RegistrationConfig(n_rings=16, max_points_per_ring=2048),
        odometry=OdometryConfig(n_rings=16),
    )


def hdl32() -> PipelineConfig:
    return PipelineConfig(
        registration=RegistrationConfig(n_rings=32, max_points_per_ring=2048),
        odometry=OdometryConfig(n_rings=32),
    )


def hdl64() -> PipelineConfig:
    return PipelineConfig(
        registration=RegistrationConfig(n_rings=64, max_points_per_ring=2048),
        odometry=OdometryConfig(n_rings=64),
    )


def pandar40() -> PipelineConfig:
    return PipelineConfig(
        registration=RegistrationConfig(n_rings=40, max_points_per_ring=2048),
        odometry=OdometryConfig(n_rings=40),
    )


def tiny_test() -> PipelineConfig:
    """Small capacities for fast CPU tests."""
    return PipelineConfig(
        registration=RegistrationConfig(
            n_rings=8,
            max_points_per_ring=256,
            max_sharp=64,
            max_less_sharp=256,
            max_flat=128,
            max_less_flat=1024,
        ),
        feature_map=MapConfig(
            n_cubes=(7, 5, 7),
            corner_cube_capacity=512,
            surf_cube_capacity=1024,
            surround_corner_capacity=2048,
            surround_surf_capacity=4096,
        ),
        matcher=MatcherConfig(max_frame_corner=512, max_frame_surf=1024),
        pose_graph=PoseGraphConfig(max_nodes=64, max_edges=128),
    )
