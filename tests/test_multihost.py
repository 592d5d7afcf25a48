"""REAL multi-process execution of the --distributed path.

Launches 2 CPU subprocesses (4 virtual devices each -> 8 global) with
jax.distributed.initialize over a localhost coordinator and runs the full
CLI protocol end to end: hybrid DCN/ICI mesh build (process boundary =
DCN granule, parallel/mesh.py), per-process global-array epoch feeding
(mesh.py::_put -> make_array_from_process_local_data), entity-sharded
training + eval at an ODD entity count, single-writer checkpointing with
cross-process barriers, and --resume.  The training trajectory must match
a single-process run over the same 8-device mesh.
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_ARGS = [
    "--dataset", "synthetic", "--synthetic_entities", "199",
    "--model", "FFTRotH", "--rank", "5", "--valid", "1",
    "--batch_size", "128", "--eval_batch_size", "64",
    "--neg_sample_size", "8", "--optimizer", "Adam",
    "--learning_rate", "0.01", "--bias", "learn", "--multi_c",
    "--dtype", "float32", "--mesh", "4x2",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(save_dir: str, extra, n_local_devices: int, dist=None):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # pin CPU (sitecustomize gotcha)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    cmd = [
        sys.executable, "-m", "complexhyperbolickge_tpu.cli.run",
        *BASE_ARGS, *extra, "--save_dir", save_dir,
    ]
    if dist is not None:
        pid, port = dist
        cmd += ["--distributed", "--coordinator", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(pid)]
    return subprocess.Popen(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_pair(save_dir: str, extra):
    port = _free_port()
    procs = [_launch(save_dir, extra, 4, dist=(i, port)) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {i} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
    return outs


def _train_losses(text: str):
    return [float(m) for m in re.findall(r"average train loss: ([-\d.]+)", text)]


def _test_mrr(text: str):
    ms = re.findall(r"test MR: [\d.]+ \| MRR: ([\d.]+)", text)
    assert ms, f"no test metrics in output:\n{text[-2000:]}"
    return float(ms[0])  # first = whole-split test metrics


def test_distributed_two_process_cli_matches_single_process(tmp_path):
    # --- single-process baseline over the same 8-device (4,2) mesh, in a
    # SUBPROCESS so it shares the distributed runs' env exactly (the pytest
    # process has x64 on, which changes jax.random.randint's sampled bits
    # and hence the negative-sample stream) ---
    sp_dir = str(tmp_path / "single")
    p = _launch(sp_dir, ["--max_epochs", "2"], 8)
    sp_out, _ = p.communicate(timeout=900)
    assert p.returncode == 0, sp_out[-4000:]
    sp_losses = _train_losses(sp_out)
    sp_mrr = _test_mrr(sp_out)
    assert len(sp_losses) == 2

    # --- 2-process run ---
    mh_dir = str(tmp_path / "multi")
    outs = _run_pair(mh_dir, ["--max_epochs", "2"])
    mh_losses = _train_losses(outs[0])
    assert len(mh_losses) == 2

    # trajectory parity: same data/PRNG streams, different reduction
    # topology (hybrid mesh) -> equal up to f32 reduction rounding
    np.testing.assert_allclose(mh_losses, sp_losses, rtol=1e-4)
    mh_mrr = _test_mrr(outs[0])
    assert abs(mh_mrr - sp_mrr) < 0.02

    # single-writer checkpoint landed, canonical (unpadded) shapes
    from complexhyperbolickge_tpu.train.checkpoint import load_checkpoint

    st = load_checkpoint(mh_dir, device_put=False)
    for k in ("entity", "bh", "bt"):
        assert st["params"][k].shape[0] == 199, k
    assert st["epoch"] == 2

    # --- resume for one more epoch, still 2-process ---
    outs2 = _run_pair(mh_dir, ["--max_epochs", "3", "--resume"])
    assert "Resumed from epoch 2" in outs2[0]
    resumed_losses = _train_losses(outs2[0])
    assert len(resumed_losses) == 1  # only epoch 3 trained
    _test_mrr(outs2[0])  # full final protocol ran


def test_distributed_mesh_is_hybrid():
    """make_mesh under multi-process must route the process boundary onto
    the OUTER data axis (create_hybrid_device_mesh, process_is_granule).
    Verified in-process with a fake 2-process device list."""

    class FakeDev:
        def __init__(self, pid, did):
            self.process_index = pid
            self.id = did
            self.platform = "cpu"
            self.device_kind = "cpu"

        def __repr__(self):
            return f"d{self.id}@p{self.process_index}"

    from complexhyperbolickge_tpu.parallel.mesh import make_mesh

    devs = [FakeDev(pid, pid * 4 + i) for pid in range(2) for i in range(4)]
    mesh = make_mesh((4, 2), devices=devs)
    arr = np.asarray(mesh.devices)
    assert arr.shape == (4, 2)
    # each process's devices occupy contiguous rows of the data axis: the
    # 'model' axis (entity-sharded gathers + rank-count psums) stays ICI
    rows_pid = [{d.process_index for d in row} for row in arr]
    assert all(len(s) == 1 for s in rows_pid)
    assert rows_pid[0] == rows_pid[1] and rows_pid[2] == rows_pid[3]
    assert rows_pid[0] != rows_pid[2]


def test_mesh_slice_misalignment_is_an_error():
    """Real TPU slices: a mesh that cannot keep the model axis inside one
    slice must error (DCN would carry latency-sensitive collectives)."""

    class FakeDev:
        def __init__(self, sid, did):
            self.slice_index = sid
            self.process_index = sid
            self.id = did
            self.platform = "tpu"
            self.device_kind = "tpu"

    from complexhyperbolickge_tpu.parallel.mesh import make_mesh

    devs = [FakeDev(sid, sid * 3 + i) for sid in range(3) for i in range(3)]
    with pytest.raises(ValueError, match="slice"):
        make_mesh((4, 2), devices=devs[:9])  # 3 slices, data axis 4


def test_mesh_process_misalignment_falls_back_to_flat():
    """Process granules (multi-process CPU/GPU): a layout that cannot keep
    granules on the data axis falls back to a FLAT mesh instead of
    forbidding previously-legal shapes (e.g. 8 single-GPU processes with
    --mesh 4x2, or a model axis spanning processes)."""

    class FakeDev:
        def __init__(self, pid, did):
            self.process_index = pid
            self.id = did
            self.platform = "cpu"
            self.device_kind = "cpu"

    from complexhyperbolickge_tpu.parallel.mesh import make_mesh

    devs = [FakeDev(pid, pid) for pid in range(8)]  # 8 procs x 1 device
    mesh = make_mesh((4, 2), devices=devs)
    assert np.asarray(mesh.devices).shape == (4, 2)
