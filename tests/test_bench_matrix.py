"""bench.py's measured matrix, smoke-run on CPU at tiny sizes.

The bench is the driver's only perf artifact; a broken entry (an import
error, a geometry regression) would otherwise surface only as an
"error" field in BENCH_r{N}.json at the end of a round. Every entry
must produce a record with frames_ok = 1.0 here.
"""

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def bench(monkeypatch_module=None):
    os.environ["ANET_BENCH_INNER"] = "1"
    os.environ["ANET_BENCH_CPU"] = "1"
    os.environ["ANET_BENCH_STREAM_BATCH"] = "4"
    os.environ["ANET_BENCH_STREAM_ITERS"] = "1"
    os.environ["ANET_BENCH_EXTRA_ITERS"] = "1"
    import bench as b

    importlib.reload(b)
    return b


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(model_name="mfsk16-fast", lock=True),
        dict(model_name="mfsk16-fast", lock=False),
        dict(model_name="mfsk16-fast", dynamic=True),
        dict(model_name="mfsk16-fast", dynamic=True, lock=True),
        dict(model_name="ofdm-fast", lock=True),
        dict(model_name="mfsk4-coded", lock=True),
        dict(model_name="mfsk4-coded-stream", dynamic=True, lock=True),
        dict(model_name="mfsk16-fast", lock=True, int8=True),
    ],
    ids=lambda k: "-".join(
        [k["model_name"]]
        + [n for n in ("dynamic", "lock", "int8") if k.get(n)]
    ),
)
def test_measure_stream_entries(bench, kwargs):
    r = bench.measure_stream(payload_len=64, **kwargs)
    assert r["details"]["frames_ok_fraction"] == 1.0, r
    assert r["value"] > 0


def test_measure_aligned_entries(bench):
    for model in ("mfsk16-fast", "ofdm-fast", "mfsk4-coded"):
        r = bench.measure_aligned(model, 64, batch=8, iters=1)
        assert r["details"]["frames_ok_fraction"] == 1.0, r
        assert r["value"] > 0
