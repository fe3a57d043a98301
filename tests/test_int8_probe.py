"""int8 Pallas matmul probe — exact vs the XLA int32 reference (interpret)."""

import numpy as np

import jax.numpy as jnp

from braintpu.ops.int8_probe import int8_matmul, xla_int8_matmul


def test_int8_matmul_exact():
    rng = np.random.default_rng(0)
    M = N = K = 1024
    x = jnp.asarray(rng.integers(-127, 128, (M, K)).astype(np.int8))
    y = jnp.asarray(rng.integers(-127, 128, (K, N)).astype(np.int8))
    got = int8_matmul(x, y, bm=256, bn=256, bk=256, interpret=True)
    ref = xla_int8_matmul(x, y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
