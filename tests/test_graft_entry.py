"""Regression tests for the driver entry points (__graft_entry__.py).

The round-1 multichip dryrun died in the driver's environment on a libtpu
client/terminal version mismatch because the dryrun initialized (and eagerly
dispatched to) the default TPU backend before falling back to CPU devices.
These tests run the entry points in clean subprocesses — the way the driver
does — and assert the dryrun never touches any non-CPU backend.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Reproduce the driver: it sets the virtual-device flag itself.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600,
    )


def test_dryrun_never_touches_default_backend():
    """dryrun_multichip(8) must complete with ONLY the cpu backend initialized.

    This is the strongest possible assertion that zero TPU computations were
    issued: the TPU client object is never created, so no compile or execute
    could have reached it (the round-1 failure mode).
    """
    proc = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)\n"
        "from jax._src import xla_bridge as xb\n"
        "initialized = set(xb._backends)\n"
        "assert initialized == {'cpu'}, f'non-CPU backend touched: {initialized}'\n"
        "print('BACKENDS_OK')\n"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "BACKENDS_OK" in proc.stdout


def test_entry_then_dryrun_same_process():
    """entry() may initialize the default backend first; the dryrun must still
    run entirely on CPU devices afterwards (default_device pinning path).

    The default platform is pinned to CPU inside the subprocess: what the
    test guards is the dryrun's behavior AFTER backends are initialized,
    which a CPU default exercises identically — and the machine's
    sitecustomize force-registers the tunneled TPU platform (ignoring
    JAX_PLATFORMS env), so an un-pinned subprocess hangs whenever the
    tunnel is down."""
    proc = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__\n"
        "fn, args = __graft_entry__.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "float(out['rgb_fine'].sum())\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "print('SAME_PROCESS_OK')\n"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "SAME_PROCESS_OK" in proc.stdout
