"""Driver-contract checks for __graft_entry__.py on the CPU mesh."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_bootstraps_when_underprovisioned():
    """Driver contract: in a process that sees FEWER devices than requested
    (the driver's env exposes one tunneled TPU chip), dryrun_multichip must
    self-bootstrap a virtual CPU mesh in a subprocess rather than raise."""
    import __graft_entry__ as ge
    repo = os.path.dirname(os.path.abspath(ge.__file__))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo, env.get("PYTHONPATH", "")) if p)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "g.dryrun_multichip(4)\n"
        "print('BOOTSTRAP_OK')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BOOTSTRAP_OK" in proc.stdout
    assert "dryrun_multichip(4): OK" in proc.stdout


def test_entry_small_compiles():
    """entry() compiles the flagship forward; use small shapes here to keep
    CPU test time sane (the driver compiles the real 64^3 single-chip)."""
    import __graft_entry__ as ge
    model, variables, x = ge._flagship(patch=(16, 16, 16), channels=4,
                                       batch=1)

    def forward(variables, x):
        return model.apply(variables, x, train=False)

    out = jax.jit(forward)(variables, x)
    assert out.shape == (1, 16, 16, 16, 2)
    assert np.isfinite(np.asarray(out)).all()
