"""Training-step and multi-chip sharding tests (virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from braintpu.models import UNetConfig, init_params
from braintpu.parallel import (
    DataParallelPatchRunner,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    shard_train_state,
)
from braintpu.train import (
    TrainConfig,
    create_train_state,
    deep_supervision_weights,
    dice_bce_loss,
    labels_to_region_targets,
    soft_dice_loss,
    train_step,
)
from braintpu.infer import stack_folds

pytestmark = pytest.mark.slow  # full fit()/resume/DP loops: the suite's heaviest file


def tiny_cfg(**kw):
    defaults = dict(
        in_channels=4,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        conv_per_stage=2,
        norm="batch",
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
    )
    defaults.update(kw)
    return UNetConfig(**defaults)


def make_batch(n=2, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.normal(size=(n, size, size, size, 4)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 4, (n, size, size, size)).astype(np.int32)),
    }


def test_region_targets():
    # INTERNAL label space (what data.py feeds): 1=ED, 2=NCR, 3=ET.
    # TC = NCR+ET = {2,3}; matches region_probs_to_labels painting where
    # the TC channel is drawn as internal label 2.
    labels = jnp.asarray([[0, 1, 2, 3]])
    t = np.asarray(labels_to_region_targets(labels))
    np.testing.assert_array_equal(t[0, :, 0], [0, 1, 1, 1])  # WT
    np.testing.assert_array_equal(t[0, :, 1], [0, 0, 1, 1])  # TC
    np.testing.assert_array_equal(t[0, :, 2], [0, 0, 0, 1])  # ET


def test_dice_loss_perfect_and_worst():
    targets = jnp.ones((1, 4, 4, 4, 3))
    assert float(soft_dice_loss(jnp.full((1, 4, 4, 4, 3), 20.0), targets)) < 1e-3
    assert float(soft_dice_loss(jnp.full((1, 4, 4, 4, 3), -20.0), targets)) > 0.99


def test_ds_weights_normalized():
    w = np.asarray(deep_supervision_weights(3))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    assert w[0] > w[1] > w[2]
    assert w[2] == 0.0  # nnU-Net mutes the coarsest head
    np.testing.assert_allclose(w[:2], [2 / 3, 1 / 3], rtol=1e-6)


def test_train_step_reduces_loss():
    cfg = tiny_cfg()
    tc = TrainConfig(base_lr=5e-3, max_steps=100)
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = create_train_state(params, tc)
    batch = make_batch()
    losses = []
    for _ in range(8):
        state, metrics = train_step(state, batch, cfg, tc)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_bn_running_stats_updated():
    cfg = tiny_cfg()
    tc = TrainConfig()
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = create_train_state(params, tc)
    before = np.asarray(state.params["encoder"][0][0]["mean"])
    state, _ = train_step(state, make_batch(), cfg, tc)
    after = np.asarray(state.params["encoder"][0][0]["mean"])
    assert not np.allclose(before, after)


def test_mesh_and_param_shardings():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    assert mesh.shape == {"data": 4, "model": 2}
    cfg = tiny_cfg(base_features=64, max_features=128)  # wide → shardable
    params = init_params(cfg, jax.random.PRNGKey(0))
    sh = param_shardings(params, cfg, mesh, min_ch=64)
    spec = sh["encoder"][0][0]["w"].spec
    assert spec[-1] == "model"  # 64-channel conv weight TP-sharded
    # seg head stays replicated
    assert sh["decoder"][0]["seg"]["w"].spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_dp_tp():
    """Full train step over a 4x2 (data x model) mesh: compiles and runs."""
    mesh = make_mesh(data=4, model=2)
    cfg = tiny_cfg(base_features=8, max_features=64)
    tc = TrainConfig(base_lr=1e-3, max_steps=100)
    params = init_params(cfg, jax.random.PRNGKey(0))
    state = create_train_state(params, tc)
    state, shardings = shard_train_state(state, cfg, mesh)
    step_fn = make_sharded_train_step(mesh, cfg, tc, shardings)
    batch = make_batch(n=4)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics2 = step_fn(state, batch)
    assert float(metrics2["loss"]) < float(metrics["loss"]) * 1.5


def test_sharded_equals_single_device():
    """DP-sharded step must produce the same loss trajectory as single-chip."""
    cfg = tiny_cfg()
    tc = TrainConfig(base_lr=1e-3, max_steps=100)
    batch = make_batch(n=4, seed=3)

    # train_step donates its input state, so build each run from fresh params
    s1 = create_train_state(init_params(cfg, jax.random.PRNGKey(1)), tc)
    s1, m1 = train_step(s1, batch, cfg, tc)

    mesh = make_mesh(data=4, model=1)
    s2 = create_train_state(init_params(cfg, jax.random.PRNGKey(1)), tc)
    s2, shardings = shard_train_state(s2, cfg, mesh)
    step_fn = make_sharded_train_step(mesh, cfg, tc, shardings)
    s2, m2 = step_fn(s2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)


def test_data_parallel_patch_runner_matches_single():
    cfg = tiny_cfg()
    params = init_params(cfg, jax.random.PRNGKey(0))
    stacked = stack_folds([params])
    mesh = make_mesh(data=8, model=1)
    runner = DataParallelPatchRunner(stacked, cfg, mesh, batch_size=8)
    rng = np.random.default_rng(0)
    vols = [rng.normal(size=(4, 24, 16, 16)).astype(np.float32) for _ in range(3)]
    probs = runner.run(vols)
    assert len(probs) == 3
    assert probs[0].shape == (24, 16, 16, 3)
    # cross-check against the single-case engine path
    from braintpu.infer import predict_probs

    ref = np.asarray(predict_probs(stacked, jnp.asarray(vols[0]), cfg, tta=False))
    np.testing.assert_allclose(probs[0], ref, atol=2e-4)


def test_fold_parallel_forward_matches_serial():
    """Fold-sharded psum ensemble == serial fold mean (8-device CPU mesh)."""
    import jax
    import jax.numpy as jnp
    from braintpu.models.unet3d import UNetConfig, init_params, apply_unet
    from braintpu.parallel.distributed import (
        make_fold_parallel_forward,
        pad_folds_for_axis,
    )
    from braintpu.infer.sliding_window import stack_folds

    cfg = UNetConfig(
        in_channels=2,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        patch_size=(8, 8, 8),
        norm="instance",
        compute_dtype=jnp.float32,
    )
    folds = [init_params(cfg, jax.random.PRNGKey(i)) for i in range(5)]
    stacked = stack_folds(folds)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 8, 2))

    # serial reference: plain mean of per-fold sigmoid maps
    serial = sum(
        jax.nn.sigmoid(apply_unet(p, x, cfg)) for p in folds
    ) / len(folds)

    mesh = make_mesh(data=4, model=1)
    padded, w = pad_folds_for_axis(stacked, 5, mesh.shape["data"])
    assert jax.tree_util.tree_leaves(padded)[0].shape[0] == 8  # 5 -> 8
    fwd = make_fold_parallel_forward(cfg, mesh, num_folds=5)
    got = fwd(padded, w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(serial), atol=2e-5)


def test_train_step_axial_preserves_attn():
    """BN-stat merge must keep non-BN decoder keys (attn) and stay
    optimizer-compatible across steps (regression: attn params were dropped
    after step 1, silently disabling attention and breaking optax)."""
    cfg = tiny_cfg(
        axial_attention=True, attn_heads=2, attn_dim_head=4,
        no_attention_levels=(0,),
    )
    tc = TrainConfig(base_lr=1e-3, max_steps=10)
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "attn" in params["decoder"][1]
    # snapshot before train_step donates (and deletes) the param buffers
    w0 = np.asarray(params["decoder"][1]["attn"]["axes"][0]["qkv"]).copy()
    state = create_train_state(params, tc)
    batch = make_batch()
    state, m1 = train_step(state, batch, cfg, tc)
    assert "attn" in state.params["decoder"][1]
    state, m2 = train_step(state, batch, cfg, tc)  # step 2 exercised optax merge
    assert np.isfinite(float(m2["loss"]))
    # attention params actually receive gradients
    w2 = np.asarray(state.params["decoder"][1]["attn"]["axes"][0]["qkv"])
    assert not np.allclose(w0, w2)


def test_momentum_buffers_mirror_param_shardings():
    """Optax momentum (TraceState.trace, nested inside the chain tuple) must
    get the SAME TP shardings as params, not fall back to replication."""
    import jax.tree_util as tu

    from braintpu.parallel import make_mesh, shard_train_state

    cfg = tiny_cfg(base_features=64, max_features=256)
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    state = create_train_state(init_params(cfg, jax.random.PRNGKey(0)), TrainConfig())
    _, sh = shard_train_state(state, cfg, mesh)
    n_p = sum(1 for s in tu.tree_leaves(sh.params) if "model" in str(s.spec))
    n_m = sum(1 for s in tu.tree_leaves(sh.opt_state) if "model" in str(s.spec))
    assert n_p > 0 and n_m == n_p


def test_pad_folds_handles_axis_larger_than_twice_folds():
    """pad > num_folds (5 folds on 16 devices) must still produce a full,
    zero-weighted pad (regression: x[:pad] under-padded)."""
    import numpy as np

    from braintpu.parallel.distributed import pad_folds_for_axis

    stacked = {"w": jnp.arange(5 * 3, dtype=jnp.float32).reshape(5, 3)}
    padded, w = pad_folds_for_axis(stacked, 5, 16)
    assert padded["w"].shape[0] == 16
    assert w.shape[0] == 16
    assert float(w.sum()) == pytest.approx(1.0)
    assert np.all(np.asarray(w[5:]) == 0)


def test_fullconv_mirror_sharded_matches_single_device():
    """fullconv_predict_sharded (mirrors over the mesh, psum merge) equals
    the single-device fullconv ensemble on a virtual 8-device mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from braintpu.infer.fullconv import fullconv_predict, fullconv_predict_sharded
    from braintpu.models.unet3d import UNetConfig, init_params
    from braintpu.parallel.mesh import make_mesh

    cfg = UNetConfig(
        norm="instance", base_features=8, num_pool=2, patch_size=(8, 8, 8),
        compute_dtype=jnp.float32,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    stacked = jax.tree_util.tree_map(lambda x: jnp.stack([x, x * 1.1]), params)
    vol = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 4)).astype(np.float32)
    )
    ref = fullconv_predict(stacked, vol, cfg, num_mirror=8)
    mesh = make_mesh(data=jax.device_count())
    got = fullconv_predict_sharded(stacked, vol, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # the jitted shard_map forward is cached per (cfg, mesh, axis, folded,
    # bucket) — a fresh closure per call retraced + recompiled the whole
    # ensemble every case (regression)
    from braintpu.infer.fullconv import _sharded_mirror_fwd

    assert _sharded_mirror_fwd(cfg, mesh, "data", False, (16, 16, 16)) is (
        _sharded_mirror_fwd(cfg, mesh, "data", False, (16, 16, 16))
    )
    got2 = fullconv_predict_sharded(stacked, vol, cfg, mesh)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=0)


def test_fit_checkpoint_resume(tmp_path):
    """fit(): checkpoints periodically and resumes from the latest step."""
    import itertools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from braintpu.models.unet3d import UNetConfig, init_params
    from braintpu.train import TrainConfig, create_train_state, fit, latest_step

    cfg = UNetConfig(
        norm="batch", base_features=4, num_pool=1, patch_size=(8, 8, 8),
        compute_dtype=jnp.float32,
    )
    tc = TrainConfig(base_lr=1e-3, max_steps=100)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "image": jnp.asarray(rng.normal(size=(1, 8, 8, 8, 4)).astype(np.float32)),
                "labels": jnp.asarray(rng.integers(0, 4, (1, 8, 8, 8)).astype(np.int32)),
            }

    ckdir = tmp_path / "ck"
    state = create_train_state(init_params(cfg, jax.random.PRNGKey(0)), tc)
    state = fit(state, batches(), cfg, tc, num_steps=4, checkpoint_dir=ckdir, checkpoint_every=2)
    assert int(state.step) == 4
    assert latest_step(ckdir) == 4

    # resume: a fresh state fast-forwards to the checkpointed step
    metrics_seen = []
    state2 = create_train_state(init_params(cfg, jax.random.PRNGKey(1)), tc)
    state2 = fit(
        state2, batches(), cfg, tc, num_steps=6, checkpoint_dir=ckdir,
        checkpoint_every=2, on_metrics=metrics_seen.append,
    )
    assert int(state2.step) == 6
    assert len(metrics_seen) == 2  # only steps 5 and 6 ran
    assert latest_step(ckdir) == 6
    # restored params continued FROM the step-4 state (two more steps of
    # training applied), not the fresh PRNGKey(1) init: a resume that
    # fast-forwards the counter but keeps fresh params must fail here
    def flat(params):
        return np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(params)]
        )

    fresh = flat(create_train_state(init_params(cfg, jax.random.PRNGKey(1)), tc).params)
    p4 = flat(state.params)
    p6 = flat(state2.params)
    assert not np.array_equal(p6, fresh), (
        "resumed params equal the fresh init — checkpoint restore is broken"
    )
    # two SGD steps at lr 1e-3 move params a little from step-4, but far
    # less than the distance to an unrelated random init
    assert float(np.abs(p6 - p4).max()) < float(np.abs(fresh - p4).max())


def test_augment_patch_properties():
    """Augmentations preserve shapes/dtypes; intensity-only configs leave
    labels untouched; seeded runs are deterministic."""
    import numpy as np

    from braintpu.train.augment import AugmentConfig, augment_patch

    rng = np.random.default_rng(0)
    img = rng.normal(size=(4, 12, 12, 12)).astype(np.float32)
    seg = rng.integers(0, 4, (12, 12, 12)).astype(np.int32)

    # force every transform on
    cfg = AugmentConfig(
        p_spatial=1, p_noise=1, p_blur=1, p_brightness=1, p_contrast=1,
        p_lowres=1, p_gamma=1,
    )
    out1, s1 = augment_patch(np.random.default_rng(7), img, seg, cfg)
    out2, s2 = augment_patch(np.random.default_rng(7), img, seg, cfg)
    assert out1.shape == img.shape and s1.shape == seg.shape
    assert out1.dtype == np.float32
    np.testing.assert_array_equal(out1, out2)  # deterministic under seed
    np.testing.assert_array_equal(s1, s2)
    assert not np.allclose(out1, img)

    # intensity-only: labels pass through unchanged
    cfg2 = AugmentConfig(p_spatial=0, p_noise=1, p_blur=1, p_gamma=1)
    _, s3 = augment_patch(np.random.default_rng(1), img, seg, cfg2)
    np.testing.assert_array_equal(s3, seg)

def test_patch_sampler_with_augmentation(tmp_path):
    """PatchSampler yields augmented batches of the requested geometry —
    on a synthetic on-disk case, never machine-local scratch state."""
    import numpy as np

    from braintpu.io import nifti
    from braintpu.io.brats import find_cases
    from braintpu.train.augment import AugmentConfig
    from braintpu.train.data import PatchSampler

    rng = np.random.default_rng(0)
    case_dir = tmp_path / "BraTS-GLI-77777-000"
    case_dir.mkdir()
    shape = (24, 24, 24)
    aff = np.eye(4)
    seg = np.zeros(shape, np.int16)
    seg[8:16, 8:16, 8:16] = 2
    seg[10:14, 10:14, 10:14] = 3
    for mod in ("t1", "t1ce", "t2", "flair"):
        vol = np.abs(rng.normal(300, 60, shape)).astype(np.float32)
        nifti.save(vol, case_dir / f"BraTS-GLI-77777-000_{mod}.nii.gz", affine=aff)
    nifti.save(seg, case_dir / "BraTS-GLI-77777-000_seg.nii.gz", affine=aff)

    cases = find_cases(tmp_path)
    assert cases
    s = PatchSampler(cases, patch_size=(16, 16, 16), batch_size=2,
                     seed=0, augment=AugmentConfig())
    b = next(iter(s))
    assert b["image"].shape == (2, 16, 16, 16, 4)
    assert b["labels"].shape == (2, 16, 16, 16)
    assert set(np.unique(np.asarray(b["labels"]))) <= {0, 1, 2, 3}


def test_param_shardings_axial_tree_matches():
    """Sharding trees must mirror axial param trees exactly (attn and
    encoder_attn subtrees replicated) or device_put structure-mismatches."""
    mesh = make_mesh(data=4, model=2)
    for mode in ("decoder", "full"):
        cfg = tiny_cfg(axial_attention=True, axial_mode=mode,
                       attn_heads=1, attn_dim_head=4)
        params = init_params(cfg, jax.random.PRNGKey(0))
        sh = param_shardings(params, cfg, mesh)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(sh))
        placed = jax.device_put(params, sh)  # would raise on mismatch
        assert jax.tree_util.tree_structure(placed) == jax.tree_util.tree_structure(params)


def test_fit_with_sharded_step_fn():
    """fit()'s documented sharded-training path: step_fn from
    make_sharded_train_step must accept fit's (state, batch, key) calls."""
    from braintpu.train.trainer import fit

    cfg = tiny_cfg()
    tc = TrainConfig(base_lr=1e-3, max_steps=100)
    mesh = make_mesh(data=4, model=1)
    state = create_train_state(init_params(cfg, jax.random.PRNGKey(0)), tc)
    state, shardings = shard_train_state(state, cfg, mesh)
    step_fn = make_sharded_train_step(mesh, cfg, tc, shardings)
    batches = (make_batch(n=4, seed=s) for s in range(3))
    losses = []
    state = fit(state, batches, num_steps=3, cfg=cfg, tc=tc,
                step_fn=step_fn, rng=jax.random.PRNGKey(9),
                on_metrics=lambda m: losses.append(m["loss"]))
    assert int(state.step) == 3
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)


def test_train_step_axial_full_updates_attn_bn_stats():
    """AXIAL_UNET_FULL training updates the attention blocks' BatchNorm
    running stats (previously a refuse-to-train NotImplementedError guard:
    the stats were not threaded through the merge and would silently
    freeze at init)."""
    cfg = tiny_cfg(
        axial_attention=True, axial_mode="full", attn_heads=2,
        attn_dim_head=4, no_attention_levels=(0,),
    )
    tc = TrainConfig(base_lr=1e-3, max_steps=10)
    params = init_params(cfg, jax.random.PRNGKey(0))
    assert "encoder_attn" in params
    enc_key = next(iter(params["encoder_attn"]))
    assert "bn" in params["encoder_attn"][enc_key]
    state = create_train_state(params, tc)
    batch = make_batch()
    state, m1 = train_step(state, batch, cfg, tc)
    bn1 = state.params["encoder_attn"][enc_key]["bn"]
    # running mean moved off its zero init; var off its ones init
    assert float(np.abs(np.asarray(bn1["mean"])).max()) > 0
    # a decoder attn_block with BN also updates
    dec_stage = next(
        s for s in state.params["decoder"] if "attn_block" in s
    )
    assert float(np.abs(np.asarray(dec_stage["attn_block"]["bn"]["mean"])).max()) > 0
    # second step remains optax-compatible and finite
    state, m2 = train_step(state, batch, cfg, tc)
    assert np.isfinite(float(m2["loss"]))


def test_fit_axial_full_no_longer_refuses(tmp_path):
    """fit() trains the full axial variant end-to-end (guard removed)."""
    cfg = tiny_cfg(
        axial_attention=True, axial_mode="full", attn_heads=2,
        attn_dim_head=4, no_attention_levels=(0,),
    )
    tc = TrainConfig(base_lr=1e-3, max_steps=4)
    state = create_train_state(init_params(cfg, jax.random.PRNGKey(0)), tc)
    batches = (make_batch(seed=i) for i in range(2))
    from braintpu.train.trainer import fit

    out = fit(state, batches, cfg, tc, num_steps=2)
    assert int(out.step) == 2


def test_training_improves_dice_end_to_end():
    """Capability proof: fit() on learnable synthetic data beats random
    init on a HELD-OUT case — the full train→predict→evaluate loop, not
    just a falling loss.  Labels are an intensity-threshold function of
    the image, so a tiny net can learn them in a few hundred steps."""
    from braintpu.infer.sliding_window import region_probs_to_labels
    from braintpu.models.unet3d import apply_unet
    from braintpu.train.trainer import fit

    cfg = tiny_cfg(base_features=8, max_features=32)
    tc = TrainConfig(base_lr=5e-2, max_steps=120)

    def synth_case(seed):
        r = np.random.default_rng(seed)
        img = r.normal(0.0, 0.3, (16, 16, 16, 4)).astype(np.float32)
        blob = np.zeros((16, 16, 16), bool)
        c = r.integers(5, 11, 3)
        zz, yy, xx = np.ogrid[:16, :16, :16]
        blob = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) <= 16
        img[blob] += 2.0  # bright tumor on every channel
        labels = np.where(blob, 2, 0).astype(np.int32)  # internal NCR
        return img, labels

    def batches():
        i = 0
        while True:
            img, lab = synth_case(i)
            yield {
                "image": jnp.asarray(img[None]),
                "labels": jnp.asarray(lab[None]),
            }
            i += 1

    def case_dice(params, seed=999):
        img, lab = synth_case(seed)  # held out (train used seeds 0..119)
        logits = apply_unet(params, jnp.asarray(img[None]), cfg)
        seg = np.asarray(
            region_probs_to_labels(jax.nn.sigmoid(logits))[0]
        )
        # label 2 (internal NCR) is what the threshold function produces
        a, b = seg == 2, lab == 2
        denom = int(a.sum()) + int(b.sum())
        return 1.0 if denom == 0 else 2.0 * int((a & b).sum()) / denom

    params0 = init_params(cfg, jax.random.PRNGKey(0))
    d0 = case_dice(params0)
    state = create_train_state(params0, tc)
    state = fit(state, batches(), cfg, tc, num_steps=120)
    d1 = case_dice(state.params)
    assert d1 > max(d0, 0.5), (d0, d1)
