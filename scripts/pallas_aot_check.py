"""Chipless AOT compile check for the Pallas traverse kernel.

Uses jax.jit(...).lower(ShapeDtypeStruct...).compile() so only the
terminal's AOT compile helper is exercised — no device arrays, no
execution — safe to run while a training job owns the chip.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
from functools import partial

from lightzero_tpu.search.pallas_traverse import pallas_traverse

S = jax.ShapeDtypeStruct


def check(tag, B, N, A, tie_break_first):
    C = 7 * A + 2
    D = N + 1
    f = partial(
        pallas_traverse,
        A=A, N=N, max_depth=D, discount=0.997,
        pb_c_base=19652.0, pb_c_init=1.25, value_delta_max=0.01,
        tie_break_first=tie_break_first, tie_break_epsilon=1e-5,
        interpret=False,
    )
    args = (
        S((B, N, C), jnp.float32),   # packed
        S((B,), jnp.float32),        # vmin
        S((B,), jnp.float32),        # vmax
        S((B, 4), jnp.float32),      # root_stats
        S((D, B, A), jnp.float32),   # noise_u
    )
    try:
        jax.jit(f).lower(*args).compile()
        print(f"[{tag}] COMPILE OK", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # keep the Mosaic op line, drop the helper log spam
        keep = [ln for ln in msg.splitlines()
                if ("Mosaic" in ln or "MLIR" in ln or "arith." in ln
                    or "vector<" in ln or "tpu." in ln or "error" in ln.lower())]
        print(f"[{tag}] COMPILE FAILED: " + " | ".join(keep[:8]), flush=True)
        if "-v" in sys.argv:
            traceback.print_exc()
        return False


if __name__ == "__main__":
    ok = True
    ok &= check("tiny-first", B=8, N=11, A=4, tie_break_first=True)
    ok &= check("bench-first", B=1024, N=51, A=4, tie_break_first=True)
    ok &= check("bench-noise", B=1024, N=51, A=4, tie_break_first=False)
    print("DONE ok=%s" % ok, flush=True)
    sys.exit(0 if ok else 1)
