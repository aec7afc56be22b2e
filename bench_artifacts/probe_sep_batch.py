"""Differential probe: SEPARATE-kernel (nn1 + masked B/C) path at batch 512.

If this steady-states fine while probe_fused_batch hangs, the fused kernel's
runtime is the problem; if both hang, the relay is degraded.
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
TM = int(sys.argv[2]) if len(sys.argv) > 2 else 4864
t00 = time.time()
say = lambda m: print(f"[{time.time()-t00:7.1f}s] {m}", flush=True)
say(f"backend={jax.default_backend()} B={B} TM={TM}")

rng = np.random.RandomState(0)
Q, M, R = 512, 4864, 16
q = jnp.asarray(rng.uniform(-10, 10, (Q, 3)), jnp.float32)
r = jnp.asarray(rng.uniform(-10, 10, (M, 3)), jnp.float32)
ring = jnp.asarray(rng.randint(0, R, M), jnp.int32)
mask = jnp.asarray(rng.rand(M) > 0.1)


def sep(q, r, g, m):
    ia, da = nn1_mod.nn1_pallas(q, r, m, tile_q=128, tile_m=TM)
    ib, db = nn1_mod.nn1_masked_pallas(q, g[ia], ia, r, g, m, "same", 2.5,
                                       tile_q=128, tile_m=TM)
    ic, dc = nn1_mod.nn1_masked_pallas(q, g[ia], ia, r, g, m, "adj", 2.5,
                                       tile_q=128, tile_m=TM)
    return ia, da, ib, db, ic, dc


tile = lambda a: jnp.broadcast_to(a[None], (B,) + a.shape)
f = jax.jit(jax.vmap(sep))
say("vmap compile start")
jax.block_until_ready(f(tile(q), tile(r), tile(ring), tile(mask)))
say("vmap compile+run done")

for k in range(4):
    q2 = q + 0.001 * (k + 1)
    t0 = time.perf_counter()
    jax.device_get(f(tile(q2), tile(r), tile(ring), tile(mask)))
    say(f"rep {k}: {(time.perf_counter()-t0)*1e3:.1f} ms")
