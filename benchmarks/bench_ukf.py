"""UKF fusion update throughput (BASELINE config 4).

The reference runs one 16-state UKF predict per IMU sample (~100 Hz) and one
correct per accepted mapping solve
(/root/reference/L_SLAM/src/kf_fusion/kf/unscented_kalman_filter.hpp:71-148,
ukf_pose_estimator.hpp:67-97).  This bench measures batched predict+correct
cycles/s: B independent filters, each doing one IMU predict (sigma points via
Cholesky, PoseSystem::f propagation, unscented moments) and one 10-dim pose
correct (augmented-state sigma points, Kalman gain).

Usage: python benchmarks/bench_ukf.py [batch] [steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.config import UKFConfig
from cooper_mapper_tpu.fusion import ukf_estimator

BASELINE_RATE = 100.0  # one filter at IMU rate (~100 Hz predicts) on the TX2


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    cfg = UKFConfig(cool_time_duration=0.0)

    base = ukf_estimator.create(cfg)
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), base
    )

    def cycle(st, inputs):
        acc, gyro, pos, vel, quat = inputs
        st = jax.vmap(
            lambda s, a, g: ukf_estimator.predict(s, a, g, 0.01, cfg)
        )(st, acc, gyro)
        st = jax.vmap(
            lambda s, p, v, q: ukf_estimator.correct(s, p, v, q, cfg)
        )(st, pos, vel, quat)
        return st, st.ukf.mean[:, 0]

    @jax.jit
    def run(st, seq):
        st, trace = jax.lax.scan(lambda s, i: cycle(s, i), st, seq)
        return st, trace

    def make_seq(seed):
        rng = np.random.RandomState(seed)
        q = np.zeros((steps, batch, 4), np.float32)
        q[..., 0] = 1.0
        return (
            jnp.asarray(0.1 * rng.randn(steps, batch, 3), jnp.float32),
            jnp.asarray(0.01 * rng.randn(steps, batch, 3), jnp.float32),
            jnp.asarray(0.05 * rng.randn(steps, batch, 3), jnp.float32),
            jnp.asarray(0.05 * rng.randn(steps, batch, 3), jnp.float32),
            jnp.asarray(q),
        )

    out, trace = run(state, make_seq(0))
    jax.block_until_ready(trace)

    reps = 4
    dts = []
    for r in range(1, reps + 1):
        seq = make_seq(r)
        t0 = time.perf_counter()
        jax.device_get(run(state, seq)[1])
        dts.append(time.perf_counter() - t0)
    dt = min(dts)

    updates_per_s = batch * steps / dt
    print({
        "batch": batch,
        "steps": steps,
        "ukf_predict_correct_cycles_per_s": round(updates_per_s, 1),
        "wall_per_cycle_us": round(dt / (batch * steps) * 1e6, 3),
        "vs_tx2_imu_rate": round(updates_per_s / BASELINE_RATE, 1),
    })


if __name__ == "__main__":
    main()
