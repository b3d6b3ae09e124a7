"""Test configuration: force the CPU backend with 8 virtual devices.

Tests run on CPU with 8 virtual XLA devices so all mesh/sharding code paths
(shard_map over ICI-style meshes) are exercised without TPU hardware, and so
compile times stay in CI territory.

This environment's sitecustomize registers a remote-TPU PJRT plugin and
overrides the ``jax_platforms`` config to "axon,cpu" in every Python
process, so the JAX_PLATFORMS env var alone cannot keep tests off the
(single, shared, sometimes-busy) TPU tunnel. jax is already imported by the
time any conftest runs, but no backend has been initialized yet — so
resetting the config here, before the first jax computation, pins all test
compute to CPU.
"""

import os

import jax

# Must happen before the first backend initialization anywhere in the test
# process: 8 virtual CPU devices for mesh/sharding tests.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (no-op on the CPU pin unless
# ANET_CPU_COMPILE_CACHE=1 — XLA:CPU's AOT loader floods stderr with a
# feature-string mismatch warning per cached program; see
# anet.utils.compilecache).
from anet.utils.compilecache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()

os.environ.setdefault("JAX_ENABLE_X64", "0")


def pytest_sessionstart(session):
    # Fail fast and loudly if something initialized a non-CPU backend.
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert jax.device_count() == 8, (
        f"expected 8 virtual CPU devices, got {jax.device_count()}"
    )


import pytest  # noqa: E402


@pytest.fixture
def interpret_tpu_kernels(monkeypatch):
    """Returns a callable that flips the process into 'pretend TPU' mode:
    jax.default_backend reports 'tpu' and every stream-relevant Pallas
    kernel routes through interpret mode, so CPU tests drive the TPU
    dispatch branches. Call it AFTER computing the CPU golden reference."""

    def _patch():
        import functools

        import anet.kernels as K

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu", raising=True)
        for name in (
            "sync_search_fused",
            "sync_search_blockmax",
            "probe_at_fused",
            "demod_at_fused",
            "demod_at_energies_fused",
            "demod_probe_fused",
            "decide_tones_tm",
            "decide_frame_tm",
            "ofdm_track_decide_fused",
        ):
            monkeypatch.setattr(
                K, name, functools.partial(getattr(K, name), interpret=True)
            )
        # fec._viterbi passes interpret=False explicitly; force it
        real_vit = K.viterbi_trellis
        monkeypatch.setattr(
            K,
            "viterbi_trellis",
            lambda *a, **kw: real_vit(*a, **{**kw, "interpret": True}),
        )
        return K

    return _patch
