"""Golden tests: JAX scaling transforms vs reference torch implementations
(lzero/policy/scaling_transform.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from lightzero_tpu.ops import (
    DiscreteSupport,
    scalar_transform,
    inverse_scalar_transform,
    phi_transform,
    cross_entropy_loss,
    visit_count_temperature,
)
from lightzero_tpu.ops.action import select_action

from conftest import has_reference, load_reference_module

pytestmark = pytest.mark.unittest


def _ref_scaling():
    return load_reference_module("lzero/policy/scaling_transform.py", "ref_scaling")


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_scalar_transform_golden():
    import torch

    ref = _ref_scaling()
    x = np.random.RandomState(0).uniform(-300, 300, size=(64,)).astype(np.float32)
    ours = np.asarray(scalar_transform(jnp.asarray(x)))
    theirs = ref.scalar_transform(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_inverse_scalar_transform_golden():
    import torch

    ref = _ref_scaling()
    support = DiscreteSupport(-300.0, 301.0, 1.0)
    ref_support = ref.DiscreteSupport(-300.0, 301.0, 1.0)
    logits = np.random.RandomState(1).randn(8, support.size).astype(np.float32)
    ours = np.asarray(inverse_scalar_transform(jnp.asarray(logits), support))
    handle = ref.InverseScalarTransform(ref_support)
    theirs = handle(torch.from_numpy(logits)).numpy().squeeze(-1)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_phi_transform_golden(smoothing):
    import torch

    ref = _ref_scaling()
    support = DiscreteSupport(-10.0, 11.0, 1.0)
    ref_support = ref.DiscreteSupport(-10.0, 11.0, 1.0)
    x = np.random.RandomState(2).uniform(-12, 12, size=(32,)).astype(np.float32)
    ours = np.asarray(phi_transform(support, jnp.asarray(x), smoothing))
    theirs = ref.phi_transform(ref_support, torch.from_numpy(x), smoothing).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_h_roundtrip():
    support = DiscreteSupport(-300.0, 301.0, 1.0)
    x = jnp.asarray(np.linspace(-250, 250, 41, dtype=np.float32))
    hx = scalar_transform(x)
    target = phi_transform(support, hx)
    # build logits that softmax to ~the two-hot target
    logits = jnp.log(target + 1e-9)
    back = inverse_scalar_transform(logits, support)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-2, atol=2e-2)


def test_phi_sums_to_one():
    support = DiscreteSupport(-5.0, 6.0, 1.0)
    x = jnp.asarray(np.random.RandomState(3).uniform(-8, 8, size=(100,)).astype(np.float32))
    t = phi_transform(support, x)
    np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-5)


def test_cross_entropy_loss_matches_manual():
    logits = jnp.asarray(np.random.RandomState(4).randn(6, 11).astype(np.float32))
    target = jnp.asarray(np.random.RandomState(5).dirichlet(np.ones(11), size=6).astype(np.float32))
    out = np.asarray(cross_entropy_loss(logits, target))
    import scipy.special as sp

    manual = -(np.asarray(target) * sp.log_softmax(np.asarray(logits), axis=-1)).sum(-1)
    np.testing.assert_allclose(out, manual, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference tree not mounted")
def test_visit_count_temperature_golden():
    ref = _ref_scaling()
    for steps in [0, 49_999, 50_000, 74_999, 75_000, 100_000]:
        assert visit_count_temperature(True, 0.25, 100_000, steps) == ref.visit_count_temperature(
            True, 0.25, 100_000, steps
        )
    assert visit_count_temperature(False, 0.7, 100_000, 10) == 0.7


def test_select_action_deterministic():
    counts = [5, 20, 1, 0]
    a, ent = select_action(counts, temperature=1.0, deterministic=True)
    assert a == 1
    assert ent > 0


def test_sample_from_visit_counts_batched():
    import jax

    from lightzero_tpu.ops.action import sample_from_visit_counts

    counts = jnp.asarray([[5.0, 20.0, 1.0, 0.0], [0.0, 0.0, 0.0, 7.0]])
    a, ent = sample_from_visit_counts(jax.random.PRNGKey(0), counts, 1.0, deterministic=True)
    assert a.tolist() == [1, 3]
    # zero-count (illegal/unvisited) actions can never be sampled
    a2, _ = sample_from_visit_counts(jax.random.PRNGKey(1), counts, 100.0)
    assert a2[1] == 3
