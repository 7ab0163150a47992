"""2-process multi-host integration test (SURVEY §5.8; reference
train.py:47-63 Lightning DDP).

Spawns two real OS processes, each with 4 virtual CPU devices, joined via
jax.distributed into one 8-device mesh. Asserts the trained parameters are
identical on both hosts (the check_ddp_consistency analogue) and that the
loss decreased.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(mode: str):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(pid), str(port), mode],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT process=(\d) primary=(\w+) hash=(\S+) "
                      r"loss0=(\S+) lossN=(\S+)", out)
        assert m, f"no RESULT line in:\n{out}"
        results[int(m.group(1))] = m

    assert set(results) == {0, 1}
    assert results[0].group(2) == "True" and results[1].group(2) == "False"
    # replicated params must be byte-identical across hosts
    assert results[0].group(3) == results[1].group(3), (
        f"replicas diverged: {results[0].group(3)} vs {results[1].group(3)}")
    # the (identical) global loss trace decreased
    for pid in (0, 1):
        assert float(results[pid].group(5)) < float(results[pid].group(4))
    # both hosts computed the SAME global loss each step
    assert results[0].group(4) == results[1].group(4)
    assert results[0].group(5) == results[1].group(5)


@pytest.mark.timeout(600)
def test_two_process_training_keeps_replicas_identical():
    _run_two_process("nerf")


@pytest.mark.timeout(600)
def test_two_process_eg3d_training_keeps_replicas_identical():
    """Same DDP-consistency contract for the EG3D system: mapping +
    synthesis + triplane render + w_avg EMA all under the 2-process mesh."""
    _run_two_process("eg3d")
