"""Persistent XLA compilation cache for anet's tools and benchmarks.

Compiles through this image's remote-TPU tunnel cost 20-40 s each; a cold
``python bench.py`` spends most of its watchdog budget compiling the
measured matrix rather than measuring it (the round-3 bench skipped 5 of
6 extra metrics on "time budget" before this existed). JAX's persistent
compilation cache makes every later process warm — measured 0.8 s -> 0.02 s
for a toy program through the tunnel, and minutes -> seconds for the bench
matrix.

Opt-in per entry point (bench.py, tools/*, tests/conftest.py,
__graft_entry__.py) — deliberately NOT enabled from library code, so
importing anet never changes a host application's global jax config.
"""

from __future__ import annotations

import os

# The cache lives IN THE REPO (committed) so a fresh checkout starts warm:
# the driver's bench capture runs in a cold environment where ~/.cache is
# empty, and a cold compile of the bench matrix through the remote tunnel
# exceeds the bench watchdog (the round-3 artifact silently degraded to a
# CPU run because of exactly this). Falls back to ~/.cache when the repo
# tree is missing or read-only.
_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_HOME_DIR = os.path.expanduser("~/.cache/anet-jax")
DEFAULT_DIR = (
    os.path.join(_REPO_ROOT, ".jax_cache")
    # only when anet runs from a source checkout (not an installed package)
    if os.path.exists(os.path.join(_REPO_ROOT, "bench.py"))
    else _HOME_DIR
)


def enable(cache_dir: str | None = None) -> None:
    """Point jax at a persistent compilation cache (idempotent).

    Set ``ANET_NO_COMPILE_CACHE=1`` to disable (e.g. when benchmarking
    compile time itself). Must run before the first jax computation.

    Skipped when jax is pinned to the CPU backend (unless
    ``ANET_CPU_COMPILE_CACHE=1``): XLA:CPU's AOT loader re-checks the
    compile machine's feature string on load and rejects the
    ``prefer-no-scatter``/``prefer-no-gather`` pseudo-features with a
    giant SIGILL warning per cached program — measured harmless but it
    floods test output, and CPU compiles are local and cheap. The
    remote-TPU tunnel (20-40 s per compile) is what the cache is for.
    """
    if os.environ.get("ANET_NO_COMPILE_CACHE"):
        return
    import jax

    platforms = jax.config.jax_platforms or ""
    if platforms == "cpu" and not os.environ.get("ANET_CPU_COMPILE_CACHE"):
        return
    path = cache_dir or os.environ.get("ANET_COMPILE_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        # read-only checkout: fall back to the home cache (still useful
        # within one machine; just not pre-warmed)
        path = _HOME_DIR
        os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
