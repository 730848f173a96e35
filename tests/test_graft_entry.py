"""The driver gate: dryrun_multichip must work even when the calling
process already initialized the backend (e.g. after compile-checking
``entry()`` on the real TPU) — the round-1 failure mode (MULTICHIP_r01).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ~3 min on this host; the round driver independently runs dryrun_multichip
# every round, so the default guard path skips this duplicate.
@pytest.mark.slow
def test_dryrun_multichip_with_initialized_backend():
    # A clean subprocess that locks the backend to a 1-device CPU platform
    # first (standing in for the driver's single-chip TPU use), then calls
    # dryrun_multichip(8): the subprocess fallback must produce a green run.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"  # backend now frozen at 1 device
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DP step ok" in proc.stdout
    assert "SP halo-exchange solve ok" in proc.stdout
