"""Text-encoder path exercised OFFLINE via a random-weight BERT built from
config (reference HFLanguageRepresentationNetwork, common.py:478 — the
reference needs downloaded weights; the tiny_random constructor removes
that gate for CI)."""
import numpy as np
import pytest

pytestmark = pytest.mark.unittest


def test_tiny_random_encoder_shapes_and_padding():
    from lightzero_tpu.models.text_encoders import HFLanguageEncoder

    enc = HFLanguageEncoder.tiny_random(hidden_size=32, max_length=16)
    texts = ["open the mailbox", "go north", "take the jeweled egg from the tree"]
    emb = enc.encode(texts)
    assert emb.shape == (3, 32)
    assert emb.dtype == np.float32
    assert np.all(np.isfinite(emb))
    # deterministic for fixed weights + tokenizer
    np.testing.assert_allclose(emb, enc.encode(texts), rtol=1e-6)
    # different text -> different embedding
    assert not np.allclose(emb[0], emb[1])


def test_mean_pooling_ignores_padding():
    from lightzero_tpu.models.text_encoders import HFLanguageEncoder

    enc = HFLanguageEncoder.tiny_random(hidden_size=16, max_length=8, pooling="mean")
    short = enc.encode(["go"])           # heavy padding in a batch with long
    batch = enc.encode(["go", "a much longer observation with many words"])
    # the short text's embedding must not depend on the other batch row's length
    np.testing.assert_allclose(short[0], batch[0], rtol=1e-4, atol=1e-5)


def test_encoder_feeds_jax_policy_as_vector_obs():
    import jax
    import jax.numpy as jnp

    from lightzero_tpu.models.text_encoders import HFLanguageEncoder

    enc = HFLanguageEncoder.tiny_random(hidden_size=24, max_length=16)
    obs = jnp.asarray(enc.encode(["you are in a maze of twisty passages"]))
    assert obs.shape == (1, 24)
    # vector obs consumable by any mlp-model policy
    assert jnp.all(jnp.isfinite(obs))
