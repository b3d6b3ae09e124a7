"""The examples/ demos must keep running — they are the user-facing
composition of the whole stack (probe -> measure -> adapt -> transfer,
Opus over OFDM, files over sound)."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=480):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )


def test_adaptive_modem_good_channel():
    r = _run("adaptive_modem.py", "--snr", "9", "--bytes", "300")
    assert r.returncode == 0, r.stderr
    assert "adapt: ofdm-coded" in r.stdout
    assert "OK (byte-identical)" in r.stdout


def test_adaptive_modem_unusable_channel():
    r = _run("adaptive_modem.py", "--snr", "-12")
    assert r.returncode == 1
    assert "channel unusable" in r.stderr
