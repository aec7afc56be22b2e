"""Roofline anchor microbenches on the real chip.

The axon relay can acknowledge block_until_ready without the execution
having really finished (see CLAUDE.md); every measured call here therefore
(a) varies its input, (b) iterates the kernel K times INSIDE one jit via
lax.scan (amortizing relay round-trips), and (c) is forced with
jax.device_get of a scalar consumer.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import cooper_mapper_tpu  # noqa: F401

d = jax.devices()[0]
print("device_kind:", d.device_kind)

K = 16
n = 4096
def mm_loop(a, b):
    def body(c, _):
        c = (c @ b) * (1.0 / n)   # rescale to keep values finite
        return c, ()
    c, _ = jax.lax.scan(body, a, None, length=K)
    return jnp.sum(c)

for dt, prec, name in ((jnp.bfloat16, None, "bf16"),
                       (jnp.float32, "highest", "f32_highest")):
    with jax.default_matmul_precision(prec or "default"):
        f = jax.jit(mm_loop)
        a = jnp.ones((n, n), dt); b = jnp.ones((n, n), dt) / n
        float(jax.device_get(f(a, b)))  # compile+warm
        ts = []
        for r in range(5):
            a2 = a * (1.0 + (r + 1) * 1e-3)
            t0 = time.perf_counter()
            float(jax.device_get(f(a2, b)))
            ts.append(time.perf_counter() - t0)
        dt_s = min(ts)
        print(f"matmul {name} {n}^3 x{K}: {2*K*n**3/dt_s/1e12:.1f} TFLOP/s "
              f"({dt_s*1e3:.1f} ms)")

# HBM: K passes of read+write over a 1 GB f32 array
nb = 256 * 1024 * 1024
def bw_loop(x):
    def body(y, _):
        return y * 1.0000001 + 1e-9, ()
    y, _ = jax.lax.scan(body, x, None, length=K)
    return jnp.sum(y[:8])
f = jax.jit(bw_loop)
x = jnp.ones((nb,), jnp.float32)
float(jax.device_get(f(x)))
ts = []
for r in range(5):
    x2 = x + (r + 1) * 1e-6
    jax.block_until_ready(x2)
    t0 = time.perf_counter()
    float(jax.device_get(f(x2)))
    ts.append(time.perf_counter() - t0)
bw = 2 * K * x.nbytes / min(ts) / 1e9
print(f"HBM r+w bandwidth: {bw:.0f} GB/s ({min(ts)*1e3:.1f} ms for "
      f"{K} GB moved)")

# VPU elementwise: K passes of fused mul/add/min/select over a VMEM-sized
# tile would need Pallas; approximate the vector-issue peak with a fused
# elementwise chain (8 ops per element per pass) on an HBM-resident array —
# the measured number is a LOWER bound on VPU peak (HBM-bound at ~8 ops/elem)
def vpu_loop(x):
    def body(y, _):
        y = jnp.minimum(y * 1.0001 + 0.1, y + 1.0) * 0.999
        y = jnp.where(y > 0.5, y - 0.25, y + 0.125)
        return y, ()
    y, _ = jax.lax.scan(body, x, None, length=K)
    return jnp.sum(y[:8])
f = jax.jit(vpu_loop)
nv = 64 * 1024 * 1024
x = jnp.ones((nv,), jnp.float32) * 0.3
float(jax.device_get(f(x)))
ts = []
for r in range(5):
    x2 = x + (r + 1) * 1e-6
    jax.block_until_ready(x2)
    t0 = time.perf_counter()
    float(jax.device_get(f(x2)))
    ts.append(time.perf_counter() - t0)
ops = 8 * K * nv / min(ts) / 1e12
print(f"fused elementwise chain: {ops:.2f} T elem-ops/s "
      f"({min(ts)*1e3:.1f} ms, 8 ops/elem x{K} passes over 256 MB)")
