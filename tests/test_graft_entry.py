"""Driver-entry regression tests.

Round-1 regression: dryrun_multichip never bootstrapped the virtual CPU
mesh, so in the driver's process (jax initialized on the single real TPU)
it failed with "mesh needs 8 devices, have 1" (MULTICHIP_r01.json rc=1).
These tests run it in subprocesses reproducing both driver scenarios.
"""

import subprocess
import sys

import pytest

REPO = __file__.rsplit("/tests/", 1)[0]


def _run(code: str):
    return subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "XLA_FLAGS": ""},
    )


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    r = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_dryrun_multichip_jax_preinitialized():
    # The driver scenario: jax backends already initialized with ONE device
    # before dryrun_multichip is called.
    r = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_dryrun_subprocess_isolation_mechanism():
    """The subprocess runner works end-to-end (child is a fresh process
    that bootstraps its own CPU mesh)."""
    import __graft_entry__ as g
    g._dryrun_in_subprocess(4)


def test_dryrun_noncpu_backend_delegates_to_subprocess(monkeypatch):
    """BACKEND CONTRACT (VERDICT r2 #8): a process whose jax is already
    initialized on a real (non-CPU) backend must not be rebound to the
    virtual CPU mesh — dryrun_multichip delegates to a subprocess."""
    import __graft_entry__ as g
    calls = []
    monkeypatch.setattr(g, "_initialized_platform", lambda: "tpu")
    monkeypatch.setattr(g, "_dryrun_in_subprocess",
                        lambda n: calls.append(n))
    g.dryrun_multichip(8)
    assert calls == [8]


def test_initialized_platform_reports_cpu_in_tests():
    """With backends initialized on the conftest CPU lane, the detector
    sees 'cpu' (the in-process path); before any backend is initialized
    it must report None without initializing one as a side effect."""
    import jax

    import __graft_entry__ as g
    before = g._initialized_platform()
    assert before in (None, "cpu")
    jax.devices()
    assert g._initialized_platform() == "cpu"
