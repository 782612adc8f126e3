"""On-chip compile check for the Pallas fused-traverse kernel.

The round-4 A/B (scripts/pallas_ab.sh) showed the LZT_PALLAS=1 path dies
in Mosaic lowering on the live chip, but bench.py swallowed the traceback.
This invokes pallas_traverse directly — tiny shapes first, then the exact
bench shapes — with traceback filtering off so the real Mosaic error lands
in the job log. No training; <2 min on chip.
"""
import os
import traceback

os.environ["JAX_TRACEBACK_FILTERING"] = "off"

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from lightzero_tpu.search.pallas_traverse import pallas_traverse


def check(tag, B, N, A, tie_break_first):
    C = 7 * A + 2
    D = N + 1
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    packed = jax.random.uniform(ks[0], (B, N, C), jnp.float32)
    # children column: mix of -1 (absent) and valid indices
    child = jax.random.randint(ks[1], (B, N, A), -1, N).astype(jnp.float32)
    packed = packed.at[:, :, 0:A].set(child)
    packed = packed.at[:, :, 2 * A:3 * A].set(1.0)  # all legal
    vmin = jnp.zeros((B,), jnp.float32)
    vmax = jnp.ones((B,), jnp.float32)
    root = jnp.zeros((B, 4), jnp.float32).at[:, 2].set(1.0)
    noise = jnp.zeros((D, B, A), jnp.float32)
    try:
        out = pallas_traverse(
            packed, vmin, vmax, root, noise,
            A=A, N=N, max_depth=D, discount=0.997,
            pb_c_base=19652.0, pb_c_init=1.25, value_delta_max=0.01,
            tie_break_first=tie_break_first, tie_break_epsilon=1e-5,
            interpret=False,
        )
        jax.block_until_ready(out)
        print(f"[{tag}] OK scal[0]={out[0][0]}", flush=True)
        return True
    except Exception:
        print(f"[{tag}] FAILED:", flush=True)
        traceback.print_exc()
        return False


ok = True
ok &= check("tiny-first", B=8, N=11, A=4, tie_break_first=True)
ok &= check("tiny-noise", B=8, N=11, A=4, tie_break_first=False)
ok &= check("bench-first", B=1024, N=51, A=4, tie_break_first=True)
print("DONE ok=%s" % ok, flush=True)
