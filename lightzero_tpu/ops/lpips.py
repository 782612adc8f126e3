"""LPIPS perceptual distance for the UniZero tokenizer's reconstruction
loss (role of reference lzero/model/unizero_world_models/lpips.py, which
wraps a pretrained torch VGG16).

TPU-native design: the VGG16 feature trunk is plain flax conv stacks whose
parameters are FROZEN constants (never trained), folded into the jitted
loss. Pretrained weights load from an .npz at $LZT_LPIPS_WEIGHTS (keys
``convN_M/kernel``, ``linK`` matching VGG16 + the LPIPS linear heads);
without the file a deterministic He-normal random trunk is used — random
deep conv features are a documented, usable proxy for perceptual distance
(and keep the subsystem runnable in this no-egress image). The reference
hard-requires the torch checkpoint; here the gate is
``perceptual_loss_weight > 0`` (as in tokenizer.py:283-301).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (layer_name, out_channels); 'M' = 2x2 max pool between
# blocks. LPIPS taps the last relu of each block.
_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512),
]
_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@functools.lru_cache(maxsize=1)
def _params():
    path = os.environ.get("LZT_LPIPS_WEIGHTS", "")
    loaded = dict(np.load(path)) if path and os.path.exists(path) else {}
    rng = np.random.default_rng(0)
    params = {}
    cin = 3
    for item in _PLAN:
        if item == "M":
            continue
        name, cout = item
        if f"{name}/kernel" in loaded:
            k = loaded[f"{name}/kernel"].astype(np.float32)
        else:
            std = float(np.sqrt(2.0 / (3 * 3 * cin)))
            k = rng.normal(0.0, std, (3, 3, cin, cout)).astype(np.float32)
        params[name] = k
        cin = cout
    for i, tap in enumerate(_TAPS):
        key = f"lin{i}"
        cout = dict(x for x in _PLAN if x != "M")[tap]
        if key in loaded:
            w = np.abs(loaded[key].astype(np.float32)).reshape(cout)
        else:
            w = np.full((cout,), 1.0 / cout, np.float32)
        params[key] = w
    return params


def _features(x: jnp.ndarray) -> list:
    """x: (B, H, W, 3) in [0, 1] → tapped VGG feature maps."""
    p = _params()
    h = (2.0 * x - 1.0 - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    for item in _PLAN:
        if item == "M":
            if h.shape[1] < 2 or h.shape[2] < 2:
                break  # small inputs: stop before pooling away all pixels
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        name, _ = item
        h = jax.lax.conv_general_dilated(
            h, p[name], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h)
        if name in _TAPS:
            feats.append(h)
    return feats


def lpips_distance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance per batch element. x, y: (B, H, W, C) in [0, 1];
    grayscale/stacked inputs are averaged down/broadcast to 3 channels."""
    def to3(v):
        if v.shape[-1] == 3:
            return v
        return jnp.repeat(jnp.mean(v, axis=-1, keepdims=True), 3, axis=-1)

    fx, fy = _features(to3(x)), _features(to3(y))
    total = jnp.zeros(x.shape[0], x.dtype)
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        w = _params()[f"lin{i}"]
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total
