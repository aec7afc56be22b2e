"""Isolate: vmapped fused_races_pallas at bench shapes — compile hang bisect.

Stages print with timestamps so a hang points at the exact step.
Usage: python bench_artifacts/probe_fused_batch.py [batch] [tq]
"""
import os
import sys
import time

os.environ.setdefault("COOPER_USE_PALLAS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import cooper_mapper_tpu  # noqa: F401
from cooper_mapper_tpu.ops.pallas import nn1 as nn1_mod

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
TQ = int(sys.argv[2]) if len(sys.argv) > 2 else 128
t00 = time.time()
say = lambda m: print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)

say(f"backend={jax.default_backend()} B={B} TQ={TQ}")

rng = np.random.RandomState(0)
Q, M, R = 512, 4864, 16
q = jnp.asarray(rng.uniform(-10, 10, (Q, 3)), jnp.float32)
r = jnp.asarray(rng.uniform(-10, 10, (M, 3)), jnp.float32)
ring = jnp.asarray(rng.randint(0, R, M), jnp.int32)
mask = jnp.asarray(rng.rand(M) > 0.1)

say("single-problem compile start (surf shape)")
out = nn1_mod.fused_races_pallas(q, r, ring, mask, with_same=True,
                                 ring_span=2.5, tile_q=TQ)
jax.block_until_ready(out)
say("single-problem done")

tile = lambda a: jnp.broadcast_to(a[None], (B,) + a.shape)
f = jax.jit(jax.vmap(
    lambda q, r, g, m: nn1_mod.fused_races_pallas(
        q, r, g, m, with_same=True, ring_span=2.5, tile_q=TQ)
))
say(f"vmap({B}) compile start")
out = f(tile(q), tile(r), tile(ring), tile(mask))
jax.block_until_ready(out)
say("vmap compile+run done")

dts = []
for k in range(4):
    q2 = q + 0.001 * k
    t0 = time.perf_counter()
    jax.device_get(f(tile(q2), tile(r), tile(ring), tile(mask)))
    dts.append(time.perf_counter() - t0)
say(f"steady: {min(dts)*1e3:.1f} ms per batch-{B} fused surf search")
