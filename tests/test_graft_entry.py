"""Driver entry-point tests: dryrun_multichip runs at mesh sizes below the
available device count (direct path) and bootstraps a virtual-CPU subprocess
when the runtime exposes fewer devices than requested."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_direct_uses_device_slice():
    # 8 virtual devices available (conftest); a 4-device request must slice
    # rather than error with "mesh != devices".
    assert len(jax.devices()) == 8
    graft.dryrun_multichip(4)


def test_dryrun_respawns_when_underprovisioned():
    # Simulate the driver's environment: a process whose JAX runtime has one
    # device. dryrun_multichip(2) must re-exec on a virtual CPU mesh and pass.
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "assert len(jax.devices()) == 1; "
            "import __graft_entry__ as g; g.dryrun_multichip(2)")
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
