"""Equality of the switchable pure-XLA lowerings (upconv / GN stats).

The EXPERIMENTAL opt-in variants (BRAINTPU_UPCONV_XLA=blocked phase-blocked
upconv einsum, BRAINTPU_GN_STATS=gram Gram-matrix GroupNorm statistics) must
compute the same function as the production defaults ("peel" / "sum") they
hope to beat; the env switches exist so a TPU probe (tools/opt_probe.py)
can compare them in place.  Defaults flip only after a measured hardware
win (none recorded yet — see PERF.md).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from braintpu.models.unet3d import _spatial_group_stats, _upconv


def _with_env(key, value):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get(key)
            os.environ[key] = value

        def __exit__(self, *exc):
            if self.old is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = self.old

    return _Ctx()


@pytest.mark.parametrize("shape,co", [((1, 6, 5, 4, 8), 4), ((2, 4, 4, 4, 16), 8)])
def test_upconv_strategies_equal(shape, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(shape[-1], 2, 2, 2, co)).astype(np.float32))
    outs = {}
    for strat in ("peel", "blocked"):
        with _with_env("BRAINTPU_UPCONV_XLA", strat):
            outs[strat] = np.asarray(_upconv(x, w, jnp.float32))
    assert outs["peel"].shape == (shape[0], 2 * shape[1], 2 * shape[2], 2 * shape[3], co)
    np.testing.assert_allclose(outs["blocked"], outs["peel"], rtol=1e-5, atol=1e-5)


def test_upconv_matches_dense_transposed_conv():
    """Both strategies equal the literal stride-2 transposed conv."""
    rng = np.random.default_rng(1)
    N, D, H, W, ci, co = 1, 3, 4, 5, 6, 7
    x = rng.normal(size=(N, D, H, W, ci)).astype(np.float32)
    w = rng.normal(size=(ci, 2, 2, 2, co)).astype(np.float32)
    ref = np.zeros((N, 2 * D, 2 * H, 2 * W, co), np.float32)
    for kd in range(2):
        for kh in range(2):
            for kw in range(2):
                ref[:, kd::2, kh::2, kw::2] += np.einsum(
                    "ndhwc,co->ndhwo", x, w[:, kd, kh, kw]
                )
    for strat in ("peel", "blocked"):
        with _with_env("BRAINTPU_UPCONV_XLA", strat):
            out = np.asarray(_upconv(jnp.asarray(x), jnp.asarray(w), jnp.float32))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("g", [1, 4, 16])
def test_group_stats_variants_equal(g):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 6, 5, 4, 16)).astype(np.float32))
    with _with_env("BRAINTPU_GN_STATS", "sum"):
        m_sum, v_sum = _spatial_group_stats(x, g)
    with _with_env("BRAINTPU_GN_STATS", "gram"):
        m_gram, v_gram = _spatial_group_stats(x, g)
    np.testing.assert_allclose(np.asarray(m_gram), np.asarray(m_sum), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_gram), np.asarray(v_sum), rtol=1e-4, atol=1e-5)
    # against literal numpy
    xn = np.asarray(x, np.float64).reshape(2, -1, 16)
    grp = xn.reshape(2, xn.shape[1], g, 16 // g)
    m_ref = grp.mean(axis=(1, 3))
    v_ref = grp.var(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(m_sum), m_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_sum), v_ref, rtol=1e-3, atol=1e-4)
