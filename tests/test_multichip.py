"""Multi-chip sharding validation on a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU backend at interpreter startup
(before any test code runs), so the 8-device CPU mesh must be created in
a subprocess with PALLAS_AXON_POOL_IPS unset."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax
assert len(jax.devices()) == 8, jax.devices()
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
print("MULTICHIP-8-OK")
"""


@pytest.mark.timeout(1000)
def test_dryrun_multichip_8_cpu_devices():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = REPO
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=980)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MULTICHIP-8-OK" in r.stdout
