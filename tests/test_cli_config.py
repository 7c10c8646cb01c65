"""CLI flag -> config dispatch (reference: models/vqgan_fcm.py:58-96 flag
matrix, favae_scripts/train_favae.py:264-272 downsample presets) and the
remaining manifest builders. No jit — fast."""

import numpy as np
import pytest

from favae_tpu.cli.train_favae import build_parser, config_from_args
from favae_tpu.config import (DSL_NONE, DSL_NONPAIR, DSL_PAIR,
                              FCM_ATTN, FCM_CONV, FCM_NONE, FCM_RES)


def parse(argv):
    return build_parser().parse_args(["--ds", "t"] + argv)


@pytest.mark.parametrize("flag,fcm,dsl", [
    ("--use_non_pair_conv", FCM_CONV, DSL_NONPAIR),
    ("--use_same_conv_gauss", FCM_CONV, DSL_PAIR),
    ("--use_same_gauss_resblock", FCM_RES, DSL_PAIR),
    ("--use_gauss_resblock", FCM_RES, DSL_NONPAIR),
    ("--use_gauss_attn", FCM_ATTN, DSL_NONPAIR),
    ("--use_ffl_with_fcm", FCM_CONV, DSL_NONE),
])
def test_fcm_flag_dispatch(flag, fcm, dsl):
    model_cfg, _, _ = config_from_args(parse([flag, "--use_cosine_sim"]))
    assert model_cfg.fcm_kind == fcm
    assert model_cfg.dsl_mode == dsl
    assert model_cfg.quantizer.use_cosine_sim


@pytest.mark.parametrize("f,ch_mult,attn", [
    (16, (1, 1, 2, 2, 4), (16,)),
    (8, (1, 2, 2, 4), (32,)),
    (4, (1, 2, 4), ()),
])
def test_downsample_factor_presets(f, ch_mult, attn):
    model_cfg, _, _ = config_from_args(
        parse(["--use_gauss_resblock", "--downsample_factor", str(f)]))
    assert model_cfg.codec.ch_mult == ch_mult
    assert model_cfg.codec.attn_resolutions == attn
    assert model_cfg.codec.downsample_factor == f


def test_preset_selects_published_config():
    model_cfg, loss_cfg, _ = config_from_args(
        parse(["--preset", "imagenet_f4"]))
    assert model_cfg.quantizer.codebook_size == 8192
    assert model_cfg.quantizer.dim == 3
    assert model_cfg.quantizer.codebook_dim == 256
    assert loss_cfg.disc_start_epochs == 5


def test_patch_discriminator_flag():
    model_cfg, _, _ = config_from_args(
        parse(["--use_same_conv_gauss", "--use_patch_discriminator",
               "--disc_n_layers", "2"]))
    assert model_cfg.discriminator.kind == "patch"
    assert model_cfg.discriminator.num_layers == 2


def test_celebahq_manifest_builder(tmp_path):
    from favae_tpu.data.manifest import build_celebahq_manifest
    (tmp_path / "mapping.txt").write_text(
        "idx orig_idx orig_file\n"
        "0 100 000100.jpg\n"
        "1 200 000200.jpg\n"
        "2 300 000300.jpg\n")
    (tmp_path / "partition.txt").write_text(
        "000100.jpg 0\n000200.jpg 2\n000300.jpg 0\n")
    m = build_celebahq_manifest(str(tmp_path / "imgs"),
                                str(tmp_path / "mapping.txt"),
                                str(tmp_path / "partition.txt"), split=0)
    assert len(m) == 2
    assert m[0].endswith("0.jpg") and m[1].endswith("2.jpg")

    caps = tmp_path / "caps"
    caps.mkdir()
    (caps / "000100.txt").write_text("a face\nanother caption\n")
    m2 = build_celebahq_manifest(str(tmp_path / "imgs"),
                                 str(tmp_path / "mapping.txt"),
                                 str(tmp_path / "partition.txt"),
                                 captions_root=str(caps), split=0)
    # one entry per caption line, only for images with caption files
    assert len(m2) == 2
    assert m2[0][1] == "a face" and m2[1][1] == "another caption"


def test_ffhq_manifest_builder(tmp_path):
    import json
    from favae_tpu.data.manifest import build_ffhq_manifest
    meta = {
        "0": {"category": "training",
              "image": {"file_path": "images/00000.png"}},
        "1": {"category": "validation",
              "image": {"file_path": "images/00001.png"}},
    }
    (tmp_path / "ffhq.json").write_text(json.dumps(meta))
    m = build_ffhq_manifest(str(tmp_path), str(tmp_path / "ffhq.json"),
                            "training")
    assert len(m) == 1 and m[0].endswith("00000.png")


def test_preset_gate_flags_override():
    """Epoch-gate flags must override a preset's schedule (the reference CLI
    always honors them, train_favae.py:82-103); unset flags keep the
    preset's values."""
    _, loss_default, _ = config_from_args(
        parse(["--preset", "celebahq_expe5"]))
    _, loss_over, _ = config_from_args(
        parse(["--preset", "celebahq_expe5", "--disc_start_epochs", "7",
               "--ffl_start_epochs", "3"]))
    assert loss_over.disc_start_epochs == 7
    assert loss_over.ffl_start_epochs == 3
    assert loss_default.disc_start_epochs == 1  # preset value preserved
    assert loss_default.ffl_start_epochs == 0


def test_bench_preset_contract():
    """Every preset bench.py can be pointed at (FAVAE_BENCH_PRESET) must
    resolve in config.py: a PRESETS entry, a <name>_losses factory, and a
    measured GFLOP/image constant — a broken name would crash the one-shot
    driver bench artifact (bench.py:158-159,212)."""
    import os
    import sys
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from favae_tpu import config as cfg_mod

    for preset in bench.GFLOP_PER_IMAGE_BY_PRESET:
        assert preset in cfg_mod.PRESETS, preset
        model_cfg = cfg_mod.PRESETS[preset]()
        loss_cfg = getattr(cfg_mod, preset + "_losses")()
        assert model_cfg is not None and loss_cfg is not None
        assert bench.GFLOP_PER_IMAGE_BY_PRESET[preset] > 0
