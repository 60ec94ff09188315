"""Genuinely multi-process (DCN analogue) sharded RX: two OS processes,
each with 4 virtual CPU devices, joined by jax.distributed — SURVEY §2.9
P7 / §7 step 7.  The reference has nothing to mirror here (it is
single-box by design); this is the scale dimension the TPU framework
adds."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(420)
def test_two_process_sharded_rx(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = []
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)       # worker sets its own device count
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(ROOT / "tools" / "multihost_worker.py"),
             "--coordinator", coord, "--num-procs", "2",
             "--proc-id", str(pid), "--local-devices", "4",
             "--out", str(tmp_path / f"r{pid}.json")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=390)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid}:\n{out[-3000:]}"
        assert "PASS" in out, out[-3000:]
    r0 = json.loads((tmp_path / "r0.json").read_text())
    assert r0["n_processes"] == 2
    assert r0["global_devices"] == 8
    assert r0["ok_local"] == r0["expect_local"] == 4
