"""Real multi-process `jax.distributed` tests (VERDICT r2 tasks 1 & 4).

The virtual 8-device mesh exercises sharding but never the multi-PROCESS paths:
`jax.distributed.initialize` ordering, `jax.make_array_from_process_local_data`
(`mesh.host_to_global`'s multi-host branch), and cross-process collectives. These
tests spawn real subprocesses on the CPU backend (Gloo collectives) to cover them —
the JAX counterpart of the reference actually launching Lightning DDP
(reference train_diff.py:72-76).

Skipped (not failed) if the coordinator port cannot be bound in this sandbox.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).with_name("_dist_worker.py")


def _free_port() -> int:
    try:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            return s.getsockname()[1]
    except OSError:
        pytest.skip("cannot bind a localhost port in this sandbox")


def _worker_env(port: int, pid: int, n_procs: int) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES=str(n_procs),
        JAX_PROCESS_ID=str(pid),
    )
    return env


def test_initialize_ordering_single_process():
    """Round-2 regression: `maybe_initialize_distributed` consulted
    `jax.process_count()` (which initializes the XLA backend) BEFORE
    `jax.distributed.initialize()`, so every launch with coordinator env vars
    set died with "must be called before any JAX calls". A 1-process cluster
    through the real env-var path must come up clean."""
    port = _free_port()
    proc = subprocess.run(
        [sys.executable, str(WORKER)], env=_worker_env(port, 0, 1),
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["process_count"] == 1
    assert rec["local_rows_roundtrip"]


def _single_process_expectation():
    """The same first global batch + train step, computed in-process."""
    from stedm_tpu.data.loader import Loader

    class RangeDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.arange(3, dtype=np.float32) + i,)

    ld = Loader(RangeDS(), batch_size=4, shuffle=True, seed=7, drop_last=False,
                num_workers=1)
    ld.epoch = 0
    x = next(iter(ld))[0].astype(np.float64)
    w = np.full((3,), 0.5)
    y = x @ w
    loss = np.mean(y ** 2)
    grad = 2.0 * (x.T @ y) / x.shape[0]
    return loss, w - 0.01 * grad


def test_two_process_dp_step_matches_single_process():
    """2-process cluster: per-rank `Loader.process_shard` rows assembled via
    `make_array_from_process_local_data` must produce the identical psum'd loss
    and updated weights as the single-process run over the same global batch
    (the loss/grad are row-permutation-invariant, so rank interleaving is
    allowed to reorder rows)."""
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(WORKER)], env=_worker_env(port, pid, 2),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            if p.returncode != 0 and ("Failed to bind" in err
                                      or "address already in use" in err.lower()):
                pytest.skip(f"coordinator port unavailable: {err[-300:]}")
            assert p.returncode == 0, err[-2000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            p.kill()

    loss_exp, w_exp = _single_process_expectation()
    for rec in outs:
        assert rec["process_count"] == 2
        assert rec["global_devices"] == 4          # 2 procs x 2 local devices
        assert rec["global_batch_shape"] == [4, 3]
        assert rec["local_rows_roundtrip"]
        np.testing.assert_allclose(rec["loss"], loss_exp, rtol=1e-5)
        np.testing.assert_allclose(rec["w_new"], w_exp, rtol=1e-5)
    # both ranks computed the same replicated result
    assert outs[0]["loss"] == outs[1]["loss"]


def _run_predict_cluster(n_procs: int):
    port = _free_port()
    envs = []
    for pid in range(n_procs):
        env = _worker_env(port, pid, n_procs)
        env["STEDM_DIST_MODE"] = "predict"
        envs.append(env)
    procs = [subprocess.Popen([sys.executable, str(WORKER)], env=env,
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True) for env in envs]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            if p.returncode != 0 and ("Failed to bind" in err
                                      or "address already in use" in err.lower()):
                pytest.skip(f"coordinator port unavailable: {err[-300:]}")
            assert p.returncode == 0, err[-2000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            p.kill()
    return outs


def test_two_process_sharded_predict_matches_single_process():
    """The DDP predict-sampler equivalent (reference predict_diff.py:84-89)
    across real processes: a tiny STEDM DDIM sampler jitted over the 2-process
    mesh with the batch sharded on `data`. Each process's `local_rows` must be
    its own disjoint share, and stitching both processes' rows must reproduce
    the single-process trajectory (per-sample math is topology-invariant)."""
    two = _run_predict_cluster(2)
    one = _run_predict_cluster(1)

    assert one[0]["global_shape"] == [4, 32, 32, 3]
    for rec in two:
        assert rec["finite"]
        assert rec["global_shape"] == [4, 32, 32, 3]
        assert rec["local_rows_shape"] == [2, 32, 32, 3]   # disjoint halves
    stitched = two[0]["row_means"] + two[1]["row_means"]
    np.testing.assert_allclose(stitched, one[0]["row_means"],
                               rtol=1e-4, atol=1e-4)
    # the generated rows are non-degenerate images, not zeros
    assert one[0]["local_rows_std"] > 1e-3
