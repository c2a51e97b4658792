"""Guard the driver entry points: single-chip compile check + the 8-device
multi-chip dryrun (the driver's MULTICHIP check — must stay green)."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_direct():
    """With 8 virtual CPU devices (conftest), the impl runs in-process."""
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_dryrun_multichip_reexec_bootstraps_devices():
    """The subprocess path the driver hits on a 1-chip host: a child with NO
    pre-set device-count flag must still assemble the full mesh."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # simulate the driver's bare environment
    env.pop("JAX_PLATFORM_NAME", None)
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as ge\n"
        "ge.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True, timeout=1200)
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "dryrun_multichip ok" in proc.stdout
