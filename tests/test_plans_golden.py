"""Golden test: ingest the REAL nnU-Net plans pickle shipped with the
reference (/root/reference/data/temp_inference_output1) and assert that
``config_from_plans`` reproduces the exact MODEL1/MODEL2 topology the
checkpoints were trained with (SURVEY.md §2.3).

Round-1 VERDICT flagged that ingestion was only ever exercised on
hand-built dicts; this test retires that gap by parsing the actual
artifact that defines the architecture.
"""

from pathlib import Path

import pytest

from braintpu.models import (
    MODEL1_BN,
    MODEL2_GN_LARGE,
    config_from_plans,
    load_nnunet_plans,
)
from braintpu.models.unet3d import decoder_channels, encoder_features

REAL_PLANS = Path("/root/reference/data/temp_inference_output1")

pytestmark = pytest.mark.skipif(
    not REAL_PLANS.exists(), reason="reference plans pickle not mounted"
)


@pytest.fixture(scope="module")
def plans():
    return load_nnunet_plans(REAL_PLANS)


def test_real_plans_toplevel_keys(plans):
    # the keys config_from_plans depends on, present in the real artifact
    for key in (
        "plans_per_stage",
        "num_modalities",
        "num_classes",
        "all_classes",
        "base_num_features",
        "conv_per_stage",
        "normalization_schemes",
        "use_mask_for_norm",
        "transpose_forward",
        "transpose_backward",
    ):
        assert key in plans, key
    assert plans["num_stages"] == 1
    assert plans["preprocessor_name"] == "GenericPreprocessor"


def test_real_plans_model1_topology(plans):
    cfg, pre = config_from_plans(plans, norm="batch", encoder_scale=1)

    # SURVEY.md §2.3: patch 128³, 5 pools of 2×2×2, six 3×3×3 conv stages,
    # base 32, cap 320, conv_per_stage 2, 4 modalities, 3 region classes.
    assert cfg.patch_size == (128, 128, 128)
    assert cfg.num_pool == 5
    assert cfg.pool_kernel == (2, 2, 2)
    assert cfg.conv_kernel == (3, 3, 3)
    assert cfg.base_features == 32
    assert cfg.conv_per_stage == 2
    assert cfg.in_channels == 4
    assert cfg.num_classes == 3
    assert cfg.max_features == 320

    # The ingested config must equal the hard-coded flagship constant.
    assert cfg == MODEL1_BN

    # Derived channel progression: 32→64→128→256→320 encoder, 320 bottleneck.
    assert encoder_features(cfg) == [32, 64, 128, 256, 320]
    assert decoder_channels(cfg)


def test_real_plans_model2_topology(plans):
    cfg, _ = config_from_plans(plans, norm="group", encoder_scale=2)
    assert cfg == MODEL2_GN_LARGE
    assert encoder_features(cfg) == [64, 128, 256, 320, 320]


def test_real_plans_preprocess_plan(plans):
    _, pre = config_from_plans(plans)

    # nonCT z-score over the nonzero mask, per channel (SURVEY.md §2.3).
    assert pre.normalization_schemes == {0: "nonCT", 1: "nonCT", 2: "nonCT", 3: "nonCT"}
    assert pre.use_mask_for_norm == {0: True, 1: True, 2: True, 3: True}
    assert pre.target_spacing == (1.0, 1.0, 1.0)
    assert pre.transpose_forward == (0, 1, 2)
    assert pre.transpose_backward == (0, 1, 2)
    assert pre.all_classes == (1, 2, 3)
    assert pre.batch_size == 5  # train-time batch from the plans
    assert pre.pool_kernel_sizes == ((2, 2, 2),) * 5
    assert pre.conv_kernel_sizes == ((3, 3, 3),) * 6
