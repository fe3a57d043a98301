"""End-to-end checkpoint ingestion from the on-disk nnU-Net results layout.

The reference loads 2 trainer dirs × 5 folds of
``fold_N/model_final_checkpoint.model`` from a RESULTS_FOLDER tree
(/root/reference/run_brats2021_inference_singlethread.py:262-264, layout per
PROJECT_DOCUMENTATION.md:505-519). These tests build that exact file layout
with torch-saved synthetic checkpoints (tiny configs; no trained weights
exist in this environment) and drive the full
discover → convert → stack → predict path through the real CLI.
"""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from braintpu.ckpt import discover_nnunet_tree  # noqa: E402
from braintpu.models.unet3d import UNetConfig  # noqa: E402

from test_unet_parity import make_torch_state_dict  # noqa: E402

TRAINER1 = "nnUNetTrainerV2BraTSRegions_DA4_BN_BD__nnUNetPlansv2.1"
TRAINER2 = "nnUNetTrainerV2BraTSRegions_DA4_BN_BD_largeUnet_Groupnorm__nnUNetPlansv2.1"


def tiny4(norm="batch", encoder_scale=1):
    """Tiny 4-modality 3-region config (engine-compatible shapes)."""
    import jax.numpy as jnp

    return UNetConfig(
        in_channels=4,
        num_classes=3,
        base_features=4,
        max_features=16,
        num_pool=2,
        conv_per_stage=2,
        encoder_scale=encoder_scale,
        norm=norm,
        group_norm_groups=2,
        patch_size=(16, 16, 16),
        compute_dtype=jnp.float32,
    )


def build_results_tree(root, folds=(0, 1), cfg1=None, cfg2=None):
    """Synthesize the reference RESULTS_FOLDER layout with torch .model files."""
    cfg1 = cfg1 or tiny4("batch", 1)
    cfg2 = cfg2 or tiny4("group", 2)
    task = root / "3d_fullres" / "Task500_BraTS2021"
    for trainer, cfg, seed0 in ((TRAINER1, cfg1, 100), (TRAINER2, cfg2, 200)):
        tdir = task / trainer
        tdir.mkdir(parents=True, exist_ok=True)
        (tdir / "plans.pkl").write_bytes(pickle.dumps({"plans_per_stage": {}}))
        for f in folds:
            fdir = tdir / f"fold_{f}"
            fdir.mkdir()
            sd = make_torch_state_dict(cfg, seed=seed0 + f)
            # nnU-Net saves a dict with state_dict + training metadata, and a
            # trainer-init sidecar pkl next to it
            torch.save(
                {"state_dict": sd, "epoch": 1000, "optimizer_state_dict": None},
                fdir / "model_final_checkpoint.model",
            )
            (fdir / "model_final_checkpoint.model.pkl").write_bytes(
                pickle.dumps({"init": (), "name": trainer.split("__")[0]})
            )
    return task


def test_discover_nnunet_tree(tmp_path):
    build_results_tree(tmp_path / "nnUNet_results", folds=(0, 1, 2))
    tree = discover_nnunet_tree(tmp_path / "nnUNet_results")
    assert set(tree) == {"model1", "model2"}
    for model, trainer in (("model1", TRAINER1), ("model2", TRAINER2)):
        entry = tree[model]
        assert entry.trainer == trainer
        assert entry.fold_indices == [0, 1, 2]
        assert entry.plans_pkl is not None and entry.plans_pkl.name == "plans.pkl"
        for f, p in entry.folds.items():
            assert p.name == "model_final_checkpoint.model"
            assert p.parent.name == f"fold_{f}"
    # discovery also works from any ancestor or the task dir itself
    assert set(discover_nnunet_tree(tmp_path)) == {"model1", "model2"}
    assert set(
        discover_nnunet_tree(tmp_path / "nnUNet_results" / "3d_fullres" / "Task500_BraTS2021")
    ) == {"model1", "model2"}


def test_discover_heuristic_and_unknown_skipped(tmp_path):
    task = tmp_path / "3d_fullres" / "TaskXXX"
    for name in (
        "nnUNetTrainerV2_custom__plans",        # heuristic → model1
        "myTrainer_largeUnet_Groupnorm__plans",  # heuristic → model2
        "resnet50_imagenet",                     # unclassifiable → skipped
    ):
        fdir = task / name / "fold_0"
        fdir.mkdir(parents=True)
        (fdir / "model_final_checkpoint.model").write_bytes(b"x")
    # non-numeric fold dirs are ignored
    odd = task / "nnUNetTrainerV2_custom__plans" / "fold_all"
    odd.mkdir()
    (odd / "model_final_checkpoint.model").write_bytes(b"x")

    tree = discover_nnunet_tree(tmp_path)
    assert set(tree) == {"model1", "model2"}
    assert tree["model1"].trainer == "nnUNetTrainerV2_custom__plans"
    assert tree["model1"].fold_indices == [0]
    assert tree["model2"].trainer == "myTrainer_largeUnet_Groupnorm__plans"


def test_convert_tree_missing_fold_errors(tmp_path):
    from braintpu.ckpt import convert_nnunet_tree

    build_results_tree(tmp_path / "res", folds=(0,))
    with pytest.raises(ValueError, match="fold"):
        convert_nnunet_tree(
            tmp_path / "res", tmp_path / "out",
            configs={"model1": tiny4("batch", 1), "model2": tiny4("group", 2)},
            folds=[0, 1],
        )
    with pytest.raises(FileNotFoundError):
        convert_nnunet_tree(tmp_path / "empty", tmp_path / "out")


@pytest.fixture
def tiny_model_constants(monkeypatch):
    """Swap the full-size production configs for tiny ones across the CLI."""
    import braintpu.models as models
    import braintpu.models.unet3d as unet3d

    cfg1, cfg2 = tiny4("batch", 1), tiny4("group", 2)
    for mod in (models, unet3d):
        monkeypatch.setattr(mod, "MODEL1_BN", cfg1)
        monkeypatch.setattr(mod, "MODEL2_GN_LARGE", cfg2)
    return cfg1, cfg2


def test_cli_tree_convert_then_segment(tmp_path, synth_case, tiny_model_constants, capsys):
    """The VERDICT-required path: real file layout → cli convert-checkpoint
    (tree mode) → cli segment from the converted npz root; plus segmenting
    DIRECTLY from the raw torch tree must give identical voxels."""
    from braintpu import cli

    cfg1, cfg2 = tiny_model_constants
    res_root = tmp_path / "nnUNet_results"
    build_results_tree(res_root, folds=(0, 1), cfg1=cfg1, cfg2=cfg2)

    ckpt_root = tmp_path / "ckpts"
    rc = cli.main([
        "convert-checkpoint", "--input", str(res_root), "--output", str(ckpt_root),
    ])
    assert rc == 0
    for model in ("model1", "model2"):
        for f in (0, 1):
            assert (ckpt_root / model / f"fold_{f}.npz").is_file()

    common = [
        "--folds", "2", "--mode", "fullconv", "--no-tta",
        "--convention", "internal", "--no-et-postprocess",
    ]
    out_npz = tmp_path / "seg_npz"
    rc = cli.main([
        "segment", "--input", str(synth_case), "--output", str(out_npz),
        "--checkpoints", str(ckpt_root), *common,
    ])
    assert rc == 0
    seg_files = list(out_npz.glob("*.nii.gz"))
    assert len(seg_files) == 1

    # direct ingestion from the raw reference layout (no pre-conversion)
    out_raw = tmp_path / "seg_raw"
    rc = cli.main([
        "segment", "--input", str(synth_case), "--output", str(out_raw),
        "--checkpoints", str(res_root), *common,
    ])
    assert rc == 0

    from braintpu.io import nifti

    a = nifti.load(seg_files[0]).get_fdata(dtype=np.float32)
    b = nifti.load(next(out_raw.glob("*.nii.gz"))).get_fdata(dtype=np.float32)
    np.testing.assert_array_equal(a, b)
    assert set(np.unique(a)).issubset({0.0, 1.0, 2.0, 3.0})


def test_cli_segment_missing_fold_message(tmp_path, synth_case, tiny_model_constants):
    """Asking for more folds than the tree holds must fail with guidance."""
    from braintpu import cli

    cfg1, cfg2 = tiny_model_constants
    res_root = tmp_path / "nnUNet_results"
    build_results_tree(res_root, folds=(0,), cfg1=cfg1, cfg2=cfg2)
    with pytest.raises(SystemExit, match="random-weights"):
        cli.main([
            "segment", "--input", str(synth_case), "--output", str(tmp_path / "o"),
            "--checkpoints", str(res_root), "--folds", "2", "--mode", "fullconv",
            "--no-tta", "--convention", "internal",
        ])


def test_convert_tree_config_subset(tmp_path):
    """A caller-supplied configs dict selects which models to convert."""
    from braintpu.ckpt import convert_nnunet_tree

    build_results_tree(tmp_path / "res", folds=(0,))
    written = convert_nnunet_tree(
        tmp_path / "res", tmp_path / "out", configs={"model1": tiny4("batch", 1)}
    )
    assert [p.parent.name for p in written] == ["model1"]
    with pytest.raises(ValueError, match="match none"):
        convert_nnunet_tree(
            tmp_path / "res", tmp_path / "out2", configs={"nope": tiny4("batch", 1)}
        )


def test_pytree_npz_roundtrip_preserves_empty_containers(tmp_path):
    import numpy as np

    from braintpu.ckpt.convert import load_pytree_npz, save_pytree_npz

    tree = {
        "encoder": [np.ones((2, 2), np.float32)],
        "extra": [],
        "attn": {},
        "__EMPTY_DICT__": np.zeros(3, np.float32),  # adversarial real key
    }
    path = tmp_path / "t.npz"
    save_pytree_npz(tree, path)
    back = load_pytree_npz(path)
    assert back["extra"] == []
    assert back["attn"] == {}
    assert np.array_equal(back["__EMPTY_DICT__"], tree["__EMPTY_DICT__"])
    assert np.array_equal(back["encoder"][0], tree["encoder"][0])
