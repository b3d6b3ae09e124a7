"""CLI and modem model registry tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anet.cli import main
from anet.models import ModemModel, get_model, list_models, register
from anet.dsp.params import ModemConfig


def test_models_registry():
    models = list_models()
    assert len(models) >= 6
    names = {m.name for m in models}
    assert {"fsk2-robust", "mfsk16-fast", "mfsk32-dense"} <= names
    flagship = get_model("mfsk16-fast")
    assert flagship.config == ModemConfig()
    with pytest.raises(KeyError, match="unknown modem model"):
        get_model("nope")
    with pytest.raises(ValueError, match="already registered"):
        register(ModemModel("mfsk16-fast", ModemConfig(), "dup"))


def test_all_models_loop_back():
    """Every registered preset must decode its own frames cleanly."""
    import jax.numpy as jnp

    from anet.dsp import ofdm
    from anet.dsp.ofdm import OfdmConfig
    from anet.dsp.pipeline import loopback

    payload = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, 24, dtype=np.uint8)
    )
    for model in list_models():
        if isinstance(model.config, OfdmConfig):
            cap = jnp.concatenate(
                [jnp.zeros(50), ofdm.transmit(model.config, payload), jnp.zeros(50)]
            )
            res = ofdm.receive_frame(model.config, cap, 24)
            ok = bool(res.frame.ok)
        else:
            ok = bool(loopback(model.config, payload, pad_before=50).frame.ok)
        assert ok, f"model {model.name} failed its own loopback"


def test_cli_models_and_modem_roundtrip(tmp_path, capsys):
    assert main(["models"]) == 0
    out = capsys.readouterr().out
    assert "mfsk16-fast" in out

    payload = tmp_path / "payload.bin"
    payload.write_bytes(os.urandom(150))
    cap = tmp_path / "cap.f32"
    back = tmp_path / "back.bin"
    assert main(["modem-tx", str(payload), "--out", str(cap)]) == 0
    assert main([
        "modem-rx", str(cap), "--len", "150", "--out", str(back),
        ]) == 0
    assert back.read_bytes() == payload.read_bytes()
    out = capsys.readouterr().out
    assert "ok=True" in out


def test_cli_modem_rx_reports_failure(tmp_path, capsys):
    cap = tmp_path / "noise.f32"
    np.random.default_rng(0).normal(0, 1, 60_000).astype(np.float32).tofile(cap)
    assert main(["modem-rx", str(cap), "--len", "64"]) == 2
    assert "ok=False" in capsys.readouterr().out


def test_cli_sweep_emits_json(capsys):
    rc = main([
        "sweep", "--snr-points", "2", "--snr-min", "-12", "--frames", "16",
        "--payload", "16", "--model", "mfsk4-voice",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    points = [json.loads(l) for l in lines]
    assert len(points) == 2
    assert all({"snr_db", "ber", "fer", "bits"} <= set(p) for p in points)


def test_cli_discover_empty(capsys):
    rc = main(["discover", "--timeout", "0.2"])
    # no receivers on odd port in CI -> exit 1; if one is around, 0 is fine
    assert rc in (0, 1)


def test_link_adaptation_monotone_rate():
    from anet.models import OPERATING_SNR_DB, net_bit_rate_bps, suggest_model

    # every preset has a threshold entry
    assert set(OPERATING_SNR_DB) == {m.name for m in list_models()}
    rates = [net_bit_rate_bps(suggest_model(snr)) for snr in range(-10, 25, 2)]
    # chosen net rate never decreases as the channel improves
    assert all(b >= a for a, b in zip(rates, rates[1:]))
    # hopeless channel falls back to the most robust preset
    assert suggest_model(-30.0).name == "fsk2-robust"
    assert net_bit_rate_bps(suggest_model(25.0)) >= 28_000


def test_random_modem_configs_loop_back():
    """Property: any valid MFSK config round-trips its own frames."""
    import jax.numpy as jnp

    from anet.dsp.pipeline import loopback

    rng = np.random.default_rng(0xA044)
    tried = 0
    while tried < 6:
        sps = int(rng.choice([32, 64, 128]))
        rate = 48_000 // sps
        m = int(rng.choice([2, 4, 8, 16]))
        spacing = int(rng.choice([1, 2]))
        base = float(rng.integers(500, 4000))
        try:
            cfg = ModemConfig(
                symbol_rate_hz=rate,
                num_tones=m,
                base_freq_hz=base,
                tone_spacing_multiple=spacing,
                preamble_symbols=int(rng.choice([16, 32])),
                phase_continuous=bool(rng.integers(0, 2)),
                fec=str(rng.choice(["none", "conv"])),
            )
        except ValueError:
            continue  # randomly drew a Nyquist-violating plan; redraw
        tried += 1
        payload = jnp.asarray(rng.integers(0, 256, 24, dtype=np.uint8))
        res = loopback(cfg, payload, pad_before=int(rng.integers(0, 300)))
        assert bool(res.frame.ok), f"config failed its own loopback: {cfg}"


def test_cli_models_snr_suggestion(capsys):
    assert main(["models", "--snr", "-8"]) == 0
    assert "fsk2-robust" in capsys.readouterr().out
    assert main(["models", "--snr", "16", "--margin", "1"]) == 0
    out = capsys.readouterr().out
    assert "ofdm" in out and "bps net" in out


def test_waveform_snr_normalization():
    """waveform_snr_db makes both families' estimates comparable to the
    AWGN scale OPERATING_SNR_DB uses (MFSK measured exact, OFDM ~0.3 dB)."""
    import jax
    import jax.numpy as jnp

    from anet.channel import awgn
    from anet.dsp import ofdm
    from anet.dsp.family import waveform_snr_db
    from anet.dsp.ofdm import OfdmConfig
    from anet.dsp.pipeline import receive_frame, transmit

    payload = jnp.asarray(np.random.default_rng(0).integers(0, 256, 128, np.uint8))
    cfg = ModemConfig()
    wave = transmit(cfg, payload)  # unpadded: exact waveform SNR
    noisy = jnp.concatenate([awgn(jax.random.PRNGKey(0), wave, 12.0), jnp.zeros(10)])
    r = receive_frame(cfg, noisy, 128)
    assert abs(float(waveform_snr_db(cfg, r.frame.snr_db)) - 12.0) < 1.0

    oc = OfdmConfig()
    ow = ofdm.transmit(oc, payload)
    noisy_o = jnp.concatenate([awgn(jax.random.PRNGKey(0), ow, 15.0), jnp.zeros(10)])
    ro = ofdm.receive_frame(oc, noisy_o, 128)
    assert abs(float(waveform_snr_db(oc, ro.frame.snr_db)) - 15.0) < 1.0


def test_cli_modem_rx_prints_link_suggestion(tmp_path, capsys):
    import os

    payload = tmp_path / "p.bin"
    payload.write_bytes(os.urandom(64))
    cap = tmp_path / "c.f32"
    assert main(["modem-tx", str(payload), "--out", str(cap)]) == 0
    assert main(["modem-rx", str(cap), "--len", "64"]) == 0
    out = capsys.readouterr().out
    assert "link: waveform snr ~" in out and "suggest" in out


def test_cli_sweep_echo_flag(capsys):
    """--echo adds multipath; coded OFDM still sweeps clean at high SNR."""
    rc = main([
        "sweep", "--model", "ofdm-coded", "--snr-points", "1", "--snr-min",
        "14", "--frames", "8", "--payload", "32", "--echo", "0.25",
    ])
    assert rc == 0
    point = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert point["fer"] == 0.0


def test_classify_capture_across_presets():
    """Every preset's capture classifies back to itself with payload_len
    (the shared-preamble OFDM group disambiguates via the header gate)."""
    from anet.channel import awgn
    from anet.dsp import family
    from anet.models import classify_capture, get_model

    rng = np.random.default_rng(21)
    for name in ("mfsk16-fast", "mfsk4-coded", "ofdm-fast", "ofdm-coded", "ofdm-max"):
        cfg = get_model(name).config
        p = jnp.asarray(rng.integers(0, 256, 64, np.uint8))
        w = np.asarray(family.transmit_fn(cfg)(p))
        cap = np.zeros(len(w) + 3000, np.float32)
        cap[900 : 900 + len(w)] = w
        cap = np.asarray(awgn(jax.random.PRNGKey(2), jnp.asarray(cap), 18.0))
        ranked = classify_capture(cap, payload_len=64)
        assert ranked[0].name == name, (name, ranked[:3])
        assert ranked[0].header_ok is True
        assert ranked[0].offset == 900


def test_classify_capture_no_match():
    """Pure noise classifies to nothing convincing."""
    from anet.models import classify_capture

    noise = np.random.default_rng(3).normal(size=48000).astype(np.float32)
    ranked = classify_capture(noise)
    assert ranked and ranked[0].quality < 0.3


def test_cli_modem_rx_auto(tmp_path, capsys):
    """--model auto picks the right preset end to end through the CLI."""
    import anet.cli as cli
    from anet.dsp import family
    from anet.models import get_model

    cfg = get_model("mfsk8-audible").config
    rng = np.random.default_rng(4)
    payload = bytes(rng.integers(0, 256, 40, np.uint8))
    src = tmp_path / "msg.bin"
    src.write_bytes(payload)
    cap = tmp_path / "cap.npy"
    rc = cli.main(
        ["modem-tx", str(src), "--out", str(cap), "--model", "mfsk8-audible"]
    )
    assert rc == 0
    out = tmp_path / "got.bin"
    rc = cli.main(
        ["modem-rx", str(cap), "--model", "auto", "--len", "40", "--out", str(out)]
    )
    captured = capsys.readouterr().out
    assert rc == 0
    assert "auto-detect: mfsk8-audible" in captured
    assert out.read_bytes() == payload
