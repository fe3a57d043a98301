import numpy as np


def test_region_counts_np_equals_device_path():
    """The host bincount fast path must produce the SAME integer counts as
    the jitted confusion_counts kernel, including labels absent from the
    volumes (e.g. ET spelled 4)."""
    import jax.numpy as jnp

    from braintpu.metrics.segmentation import (
        _region_counts_np,
        confusion_counts,
    )

    rng = np.random.default_rng(3)
    pred = rng.integers(0, 4, (23, 19, 17)).astype(np.uint8)
    gt = rng.integers(0, 4, (23, 19, 17)).astype(np.uint8)
    regions = ((1,), (2,), (3,), (1, 2, 3), (1, 3), (3,), (4,))
    got = _region_counts_np(pred, gt, regions)
    want = np.asarray(
        confusion_counts(jnp.asarray(pred), jnp.asarray(gt), regions)
    ).astype(np.int64)
    np.testing.assert_array_equal(got, want)
