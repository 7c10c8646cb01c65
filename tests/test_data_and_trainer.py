"""Data pipeline, checkpointing, and a tiny end-to-end trainer fit."""

import os
import pickle

import numpy as np
import jax
import pytest

from favae_tpu.config import (
    CodecConfig, DiscriminatorConfig, LossConfig, QuantizerConfig,
    TrainConfig, VQGANConfig, DSL_NONPAIR, FCM_RES,
)
from favae_tpu.data.pipeline import DataLoader, PklImageDataset, SyntheticDataset
from favae_tpu.data.manifest import save_manifest, build_imagenet_manifest
from favae_tpu.train.favae_trainer import FavaeTrainer
from favae_tpu.train.schedule import cosine_warmup_lr
from favae_tpu.utils.checkpoint import CheckpointManager, restore_checkpoint, save_checkpoint


def test_synthetic_loader_batches():
    ds = SyntheticDataset(resolution=16, size=20)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 5
    assert batches[0].shape == (4, 16, 16, 3)
    assert batches[0].dtype == np.float32


def test_loader_sharding_partitions_data():
    ds = SyntheticDataset(resolution=8, size=32)
    dl0 = DataLoader(ds, batch_size=4, shuffle=False, shard_index=0, shard_count=2)
    dl1 = DataLoader(ds, batch_size=4, shuffle=False, shard_index=1, shard_count=2)
    assert len(dl0) == len(dl1) == 4
    b0 = next(iter(dl0))
    b1 = next(iter(dl1))
    assert not np.allclose(b0, b1)


def test_pkl_dataset_with_images_and_corrupt_skip(tmp_path):
    from PIL import Image
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray((np.random.RandomState(i).rand(20, 24, 3) * 255)
                        .astype(np.uint8)).save(p)
        paths.append(str(p))
    # insert a corrupt entry: the loader must skip to the next readable index
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    manifest = [paths[0], str(bad), paths[2]]
    mpath = tmp_path / "m.pkl"
    with open(mpath, "wb") as f:
        pickle.dump(manifest, f)

    ds = PklImageDataset(str(mpath), resolution=16)
    x0 = ds.get(0)
    assert x0.shape == (16, 16, 3)
    assert x0.min() >= -1.0 and x0.max() <= 1.0
    x1 = ds.get(1)  # bad -> falls through to entry 2
    x2 = ds.get(2)
    np.testing.assert_array_equal(x1, x2)


def test_caption_dataset(tmp_path):
    from PIL import Image
    p = tmp_path / "img.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    with open(tmp_path / "m.pkl", "wb") as f:
        pickle.dump([[str(p), "a face"]], f)
    ds = PklImageDataset(str(tmp_path / "m.pkl"), resolution=8,
                         with_captions=True, with_clip_image=True)
    x, clip_x, cap = ds.get(0)
    assert x.shape == (8, 8, 3) and clip_x.shape == (224, 224, 3)
    assert cap == "a face"
    dl = DataLoader(ds, batch_size=1, shuffle=False, num_workers=1)
    bx, bclip, bcaps = next(iter(dl))
    assert bx.shape == (1, 8, 8, 3) and bcaps == ["a face"]


def test_imagenet_manifest_builder(tmp_path):
    from PIL import Image
    for cls in ("n01", "n02"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(d / "a.jpg")
    m = build_imagenet_manifest(str(tmp_path), "train")
    assert len(m) == 2 and m[0].endswith("a.jpg")


def test_uint8_loader_and_device_normalize(tmp_path):
    """The uint8 fast path must reproduce the reference transform exactly:
    resized uint8 + on-device to_unit_range == host-side f32 normalize."""
    import jax.numpy as jnp
    from PIL import Image
    from favae_tpu.train.favae_step import to_unit_range

    paths = []
    for i in range(4):
        p = tmp_path / f"img{i}.png"
        Image.fromarray((np.random.RandomState(i).rand(20, 24, 3) * 255)
                        .astype(np.uint8)).save(p)
        paths.append(str(p))
    mpath = tmp_path / "m.pkl"
    with open(mpath, "wb") as f:
        pickle.dump(paths, f)

    ds8 = PklImageDataset(str(mpath), resolution=16, output_dtype="uint8")
    ds32 = PklImageDataset(str(mpath), resolution=16)
    x8 = ds8.get(0)
    assert x8.dtype == np.uint8 and x8.shape == (16, 16, 3)
    np.testing.assert_allclose(np.asarray(to_unit_range(jnp.asarray(x8))),
                               ds32.get(0), atol=1e-6)

    # process-pool decode yields identical batches to the thread pool
    dl_proc = DataLoader(ds8, batch_size=2, shuffle=False, num_workers=2,
                         use_processes=True)
    dl_thr = DataLoader(ds8, batch_size=2, shuffle=False, num_workers=2)
    try:
        for a, b in zip(dl_proc, dl_thr):
            assert a.dtype == np.uint8
            np.testing.assert_array_equal(a, b)
    finally:
        dl_proc.close()


def test_cosine_warmup_schedule():
    kw = dict(warmup_epochs=2, epochs=10, lr=1.0, min_lr=0.1)
    assert cosine_warmup_lr(0.0, **kw) == 0.0
    assert abs(cosine_warmup_lr(1.0, **kw) - 0.5) < 1e-9
    assert abs(cosine_warmup_lr(2.0, **kw) - 1.0) < 1e-9
    assert abs(cosine_warmup_lr(10.0, **kw) - 0.1) < 1e-9
    assert cosine_warmup_lr(5.0, enabled=False, **kw) == 1.0


def tiny_setup(tmp_path, name="ckpt"):
    model_cfg = VQGANConfig(
        codec=CodecConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), resolution=32, z_channels=64),
        quantizer=QuantizerConfig(codebook_size=32, dim=64, use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind="conv", num_layers=2),
        fcm_kind=FCM_RES, dsl_mode=DSL_NONPAIR, compute_dtype="float32",
    )
    loss_cfg = LossConfig(gaussian_kernel=3, dsl_init_sigma=1.0,
                          disc_start_epochs=1, ffl_start_epochs=0)
    train_cfg = TrainConfig(batch_size=8, epochs=2, print_steps=1, img_steps=100)
    return FavaeTrainer(model_cfg, loss_cfg, train_cfg, str(tmp_path / name))


def test_trainer_fit_and_resume(tmp_path):
    trainer = tiny_setup(tmp_path)
    ds = SyntheticDataset(resolution=32, size=16)
    train_dl = DataLoader(ds, batch_size=8, num_workers=1)
    val_dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1)
    trainer.fit(train_dl, val_dl, epochs=2)  # epoch 0: no disc; epoch 1: disc

    assert os.path.isdir(trainer.ckpt.latest_path)
    assert os.path.isdir(trainer.ckpt.best_path)

    # resume round-trip into a fresh trainer
    trainer2 = tiny_setup(tmp_path)
    trainer2.resume()
    assert trainer2.start_epoch == 2
    a = jax.tree_util.tree_leaves(trainer.state.params_g)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kmeans_init_wiring(tmp_path):
    """--kmeans_init replaces the codebook from the first batch before step 0
    (reference: models/l2_quantize.py:352-368 init_embed_)."""
    model_cfg = VQGANConfig(
        codec=CodecConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), resolution=32, z_channels=64),
        quantizer=QuantizerConfig(codebook_size=16, dim=64, use_cosine_sim=True,
                                  kmeans_init=True, kmeans_iters=4),
        discriminator=DiscriminatorConfig(kind="conv", num_layers=2),
        fcm_kind=FCM_RES, dsl_mode=DSL_NONPAIR, compute_dtype="float32",
    )
    loss_cfg = LossConfig(gaussian_kernel=3, dsl_init_sigma=1.0)
    train_cfg = TrainConfig(batch_size=1, epochs=1)
    trainer = FavaeTrainer(model_cfg, loss_cfg, train_cfg, str(tmp_path / "ck"))

    before = np.asarray(trainer.state.cb_state.embed).copy()
    ds = SyntheticDataset(resolution=32, size=8)
    x0 = np.stack([ds.get(i) for i in range(8)])  # divisible by the 8-dev mesh
    trainer._data_dependent_init(x0)

    embed = np.asarray(trainer.state.cb_state.embed)
    bins = np.asarray(trainer.state.cb_state.cluster_size)
    assert not np.allclose(before, embed)
    # cosine codebook: every row l2-normalized; bins count all latent tokens
    np.testing.assert_allclose(np.linalg.norm(embed, axis=-1), 1.0, atol=1e-4)
    assert np.isclose(bins.sum(), 8 * 16 * 16)  # B * (32/2)^2 tokens
    np.testing.assert_allclose(np.asarray(trainer.state.cb_state.embed_avg),
                               embed)


def test_actnorm_init_wiring(tmp_path):
    """ActNorm loc/scale are data-initialized from the first batch
    (reference: models/discriminator.py:67-86)."""
    model_cfg = VQGANConfig(
        codec=CodecConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), resolution=32, z_channels=64),
        quantizer=QuantizerConfig(codebook_size=16, dim=64, use_cosine_sim=True),
        discriminator=DiscriminatorConfig(kind="patch", num_layers=2,
                                          use_actnorm=True),
        fcm_kind=FCM_RES, dsl_mode=DSL_NONPAIR, compute_dtype="float32",
    )
    loss_cfg = LossConfig(gaussian_kernel=3, dsl_init_sigma=1.0)
    train_cfg = TrainConfig(batch_size=1, epochs=1)
    trainer = FavaeTrainer(model_cfg, loss_cfg, train_cfg, str(tmp_path / "ck"))

    ds = SyntheticDataset(resolution=32, size=8)
    x0 = np.stack([ds.get(i) for i in range(8)])  # divisible by the 8-dev mesh
    trainer._data_dependent_init(x0)

    disc = trainer.state.params_d["discriminator"]
    n_norm = 0
    for name, layer in disc.items():
        if "loc" in layer:
            n_norm += 1
            loc = np.asarray(layer["loc"])
            scale = np.asarray(layer["scale"])
            assert not np.allclose(loc, 0.0), name
            assert not np.allclose(scale, 1.0), name
            assert np.all(np.isfinite(loc)) and np.all(scale > 0)
    assert n_norm == 2  # norm_1, norm_2


def test_trainer_resume_from_explicit_path(tmp_path):
    """--resume_path warm-starts a NEW run directory from another run's
    checkpoint (reference: train_favae.py:334-341 torch.loads an arbitrary
    --resume_path)."""
    trainer = tiny_setup(tmp_path, "run_a")
    ds = SyntheticDataset(resolution=32, size=16)
    dl = DataLoader(ds, batch_size=8, num_workers=1)
    trainer.fit(dl, dl, epochs=1)

    trainer2 = tiny_setup(tmp_path, "run_b")
    trainer2.resume(os.path.join(str(tmp_path / "run_a"), "latest"))
    assert trainer2.start_epoch == 1
    a = jax.tree_util.tree_leaves(trainer.state.params_g)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the new run checkpoints into its own directory
    assert trainer2.ckpt.save_dir.endswith("run_b")


def test_trainer_resume_path_torch_warmstart(tmp_path, monkeypatch):
    """A torch .pt resume_path routes through convert_favae and replaces the
    model weights while keeping fresh optimizers (weights-only warm start)."""
    import favae_tpu.utils.torch_convert as tc
    from favae_tpu.train.favae_state import merge_params

    trainer = tiny_setup(tmp_path)
    fake_pt = tmp_path / "expe.pt"
    fake_pt.write_bytes(b"placeholder")

    params = merge_params(trainer.state.params_g, trainer.state.params_d)
    bumped = jax.tree_util.tree_map(lambda a: np.asarray(a) + 1.0, params)
    opt_before = jax.tree_util.tree_leaves(trainer.state.opt_g)

    def fake_convert(path, cfg):
        assert path == str(fake_pt)
        return bumped, trainer.state.batch_stats, trainer.state.cb_state

    monkeypatch.setattr(tc, "convert_favae", fake_convert)
    before = np.asarray(jax.tree_util.tree_leaves(trainer.state.params_g)[0]).copy()
    trainer.resume(str(fake_pt))
    after = np.asarray(jax.tree_util.tree_leaves(trainer.state.params_g)[0])
    np.testing.assert_allclose(after, before + 1.0)
    assert trainer.start_epoch == 0  # weights-only: no epoch restored
    # optimizer state untouched (still the fresh init)
    for x, y in zip(opt_before, jax.tree_util.tree_leaves(trainer.state.opt_g)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_crash_window_old_fallback(tmp_path):
    """Die after `latest` was renamed away but before the new write landed:
    try_resume must restore from latest.old (the reference's tmp->rename
    invariant, utils.py:108-119: never a moment without a valid ckpt)."""
    state = {"a": np.arange(4, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ck"))
    save_checkpoint(mgr.latest_path, state, {"epoch": 5, "best_score": 0.5})
    # simulate the crash: latest renamed to .old, replacement never written
    os.rename(mgr.latest_path, mgr.latest_path + ".old")
    # plus a partial (uncommitted) tmp dir from the interrupted writer
    os.makedirs(mgr.latest_path + ".tmp")
    restored, meta = mgr.try_resume(state)
    assert restored is not None and meta["epoch"] == 5
    np.testing.assert_array_equal(restored["a"], state["a"])
    assert mgr.best_score == 0.5


def test_checkpoint_crash_window_tmp_fallback(tmp_path):
    """Die between the two swap renames: a COMMITTED latest.tmp (the newer
    state) must win over latest.old."""
    state_old = {"a": np.zeros(4, dtype=np.float32)}
    state_new = {"a": np.ones(4, dtype=np.float32)}
    mgr = CheckpointManager(str(tmp_path / "ck"))
    save_checkpoint(mgr.latest_path, state_old, {"epoch": 1})
    scratch = str(tmp_path / "scratch")
    save_checkpoint(scratch, state_new, {"epoch": 2})
    os.rename(mgr.latest_path, mgr.latest_path + ".old")
    os.rename(scratch, mgr.latest_path + ".tmp")  # committed marker inside
    restored, meta = mgr.try_resume(state_new)
    assert meta["epoch"] == 2
    np.testing.assert_array_equal(restored["a"], state_new["a"])
    # steady state restored: latest exists again
    assert os.path.isdir(mgr.latest_path)


def test_checkpoint_atomic_roundtrip(tmp_path):
    state = {"a": np.arange(5, dtype=np.float32), "b": {"c": np.zeros((), np.float32)}}
    p = str(tmp_path / "ck")
    save_checkpoint(p, state, {"epoch": 3})
    restored, meta = restore_checkpoint(p, state)
    np.testing.assert_array_equal(restored["a"], state["a"])
    assert meta["epoch"] == 3
    # overwrite must be atomic-ish (old removed, new valid)
    state2 = {"a": np.ones(5, dtype=np.float32), "b": {"c": np.ones((), np.float32)}}
    save_checkpoint(p, state2, {"epoch": 4})
    restored2, meta2 = restore_checkpoint(p, state2)
    np.testing.assert_array_equal(restored2["a"], state2["a"])
    assert meta2["epoch"] == 4


def test_checkpoint_cadence_and_final_epoch(tmp_path):
    """save_every_epoch>1 skips off-cadence epochs (latest AND best — each
    save is a full state fetch over the relay, the knob must bound both)
    but the final epoch always persists, so a finished run is never lost."""
    mgr = CheckpointManager(str(tmp_path / "ck"), save_every_epoch=4)
    scores = [5.0, 4.0, 3.0, 2.0, 1.0, 0.5]  # improves every epoch
    for epoch, s in enumerate(scores):
        state = {"a": np.full(3, float(epoch), np.float32)}
        mgr.on_epoch_end(epoch, s, state, is_last=epoch == len(scores) - 1)
        if epoch in (0, 3):  # between cadence hits: nothing new written
            _, meta = restore_checkpoint(mgr.latest_path, state), None
    # final epoch (5, off-cadence) must have been persisted via is_last
    restored, meta = restore_checkpoint(mgr.latest_path,
                                        {"a": np.zeros(3, np.float32)})
    assert meta["epoch"] == len(scores)
    np.testing.assert_array_equal(restored["a"], np.full(3, 5.0, np.float32))
    # best tracks best-among-persisted epochs (cadence epochs 0,4 + last 5)
    b, bmeta = restore_checkpoint(mgr.best_path,
                                  {"a": np.zeros(3, np.float32)})
    assert bmeta["score"] == 0.5
    # default cadence=1 remains reference-exact: every epoch persists
    mgr2 = CheckpointManager(str(tmp_path / "ck2"))
    mgr2.on_epoch_end(0, 9.0, {"a": np.zeros(2, np.float32)})
    _, m2 = restore_checkpoint(mgr2.latest_path, {"a": np.zeros(2, np.float32)})
    assert m2["epoch"] == 1
