"""Unit tests for bench.py's serving-config resolution.

The bench JSON line is the driver's durable perf record, so `resolve_serving`
must degrade instead of dying: a failing `auto:R` calibration (or a bad spec
string) falls back to the uniform-interval serving mode, and a malformed
guidance-window string is dropped. These branches can't be exercised on the
chip without breaking a real bench run — they are covered here on CPU.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

_cache = jax.config.jax_compilation_cache_dir

import bench  # noqa: E402  (repo root on sys.path)

# bench.py points the compile cache at its TPU dir on import; restore the
# test harness's .jax_cache so later tests in this process stay warm
jax.config.update("jax_compilation_cache_dir", _cache)

N_STEPS = 50


def _resolve(spec="", interval=3, levels=1, cfg="", calibrate=None):
    logs = []
    serving, mode = bench.resolve_serving(spec, interval, levels, cfg, N_STEPS,
                                          calibrate=calibrate,
                                          log=logs.append)
    return serving, mode, logs


def test_uniform_default():
    serving, mode, _ = _resolve(interval=3)
    assert serving == {"cache_interval": 3, "cache_levels": 1}
    assert mode == "deepcache_interval_3_levels_1"


def test_exact_mode_label():
    _, mode, _ = _resolve(interval=1)
    assert mode == "exact"


def test_explicit_positions():
    serving, mode, _ = _resolve(spec="0,5,10")
    assert serving["cache_schedule"] == (0, 5, 10)
    assert serving["cache_interval"] == 1
    assert mode.endswith("refreshes_3")


def test_auto_schedule_uses_calibration():
    drift = np.linspace(1.0, 0.1, N_STEPS - 1)
    serving, mode, _ = _resolve(spec="auto:5", calibrate=lambda: drift)
    assert len(serving["cache_schedule"]) == 5
    assert serving["cache_schedule"][0] == 0
    assert mode.endswith("refreshes_5")


def test_auto_calibration_failure_falls_back_to_uniform():
    def boom():
        raise RuntimeError("tunnel dropped")

    serving, mode, logs = _resolve(spec="auto:10", interval=3, calibrate=boom)
    assert serving == {"cache_interval": 3, "cache_levels": 1}
    assert mode == "deepcache_interval_3_levels_1"
    assert any("falling back to uniform interval 3" in m for m in logs)


def test_bad_spec_string_falls_back():
    serving, mode, logs = _resolve(spec="nonsense:xyz", interval=3)
    assert serving == {"cache_interval": 3, "cache_levels": 1}
    assert any("falling back" in m for m in logs)


def test_cfg_interval_parses_and_composes():
    serving, mode, _ = _resolve(spec="uniform:5", cfg="0.2:0.8")
    assert serving["cfg_interval"] == (0.2, 0.8)
    assert mode.endswith("_cfgint_0.2_0.8")
    assert serving["cache_schedule"]  # composition kept the schedule


def test_malformed_cfg_interval_dropped():
    serving, mode, logs = _resolve(cfg="abc")
    assert "cfg_interval" not in serving
    assert "cfgint" not in mode
    assert any("unparseable" in m for m in logs)


def test_defaults_resolve_without_env():
    # the shipped defaults (auto:R + a cfg window) resolve with a fake drift
    drift = np.abs(np.sin(np.arange(N_STEPS - 1))) + 0.01
    spec = bench.CACHE_SCHEDULE or "auto:5"
    assert spec.startswith("auto:")
    n_refresh = int(spec.split(":")[1])
    cfg_str = bench.CFG_INTERVAL or "0.3:0.7"
    lo, _, hi = cfg_str.partition(":")
    serving, mode, _ = _resolve(spec=spec, cfg=cfg_str,
                                calibrate=lambda: drift)
    assert len(serving["cache_schedule"]) == n_refresh
    assert serving["cfg_interval"] == (float(lo), float(hi))
    assert f"refreshes_{n_refresh}" in mode and "cfgint" in mode


def test_bench_lock_skipped_when_parent_holds(monkeypatch):
    # a sweep script that already holds the flock exports this var so its
    # child bench runs don't deadlock against the inherited lock
    monkeypatch.setenv("STEDM_BENCH_LOCK_HELD", "1")
    fh, status = bench._acquire_bench_lock()
    assert fh is None and status == "inherited"


def test_bench_lock_acquired_and_times_out(monkeypatch, tmp_path):
    # points at tmp_path (never the production /tmp/stedm_bench.lock — a test
    # run must not make a concurrent `flock -n` sweep launch refuse)
    import fcntl

    monkeypatch.delenv("STEDM_BENCH_LOCK_HELD", raising=False)
    lock = str(tmp_path / "bench.lock")
    fh, status = bench._acquire_bench_lock(timeout_s=0.0, path=lock)
    assert fh is not None and status == "held"
    # prove acquisition actually happened: an independent fd can't take it
    probe = open(lock, "w")
    with pytest.raises(OSError):
        fcntl.flock(probe, fcntl.LOCK_EX | fcntl.LOCK_NB)
    # while held, a second (zero-timeout) acquisition warns but proceeds,
    # and says so in its status — the JSON `lock` field carries this
    fh2, status2 = bench._acquire_bench_lock(timeout_s=0.0, path=lock)
    assert fh2 is not None and status2 == "unserialized"
    fcntl.flock(fh, fcntl.LOCK_UN)
    fh.close()
    fh2.close()
    probe.close()


def test_bench_lock_path_env_override(monkeypatch, tmp_path):
    monkeypatch.delenv("STEDM_BENCH_LOCK_HELD", raising=False)
    monkeypatch.setenv("STEDM_BENCH_LOCK_PATH", str(tmp_path / "env.lock"))
    fh, status = bench._acquire_bench_lock(timeout_s=0.0)
    assert status == "held" and (tmp_path / "env.lock").exists()
    fh.close()


def test_quality_certificate_default_config_passes():
    # the shipped bench default must be a priced, budget-passing point
    cert = bench.quality_certificate(bench.CACHE_SCHEDULE, 0,
                                     bench.CACHE_LEVELS, bench.CFG_INTERVAL)
    assert cert["quality_budget_pass"] is True
    assert cert["cached_vs_exact_fid_rp"] is not None
    assert cert["cached_vs_exact_fid_rp"] < cert["fid_budget"]
    assert cert["fid_budget"] == pytest.approx(bench.FID_NOISE_FLOOR / 10, rel=1e-3)


def test_quality_certificate_unpriced_config_fails():
    cert = bench.quality_certificate("auto:2", 0, 1, "0.2:0.8")
    assert cert["quality_budget_pass"] is False
    assert cert["cached_vs_exact_fid_rp"] is None
    assert "unpriced" in cert["quality_pricing"]
    # levels>1 points were never FID-priced per-config either
    cert2 = bench.quality_certificate("", 3, 2, "")
    assert cert2["quality_budget_pass"] is False


def test_quality_certificate_exact_mode_trivially_passes():
    cert = bench.quality_certificate("", 1, 1, "")
    assert cert["quality_budget_pass"] is True
    assert cert["quality_pricing"] == "exact reference trajectory"


def test_assemble_record_uses_explicit_specs_not_globals():
    # ADVICE r4: the certificate key must come from the specs the caller
    # resolved with, not from the module's env-derived globals
    drift = np.linspace(1.0, 0.1, N_STEPS - 1)
    serving, mode = bench.resolve_serving("auto:2", 0, 1, "0.2:0.8", N_STEPS,
                                          calibrate=lambda: drift,
                                          log=lambda m: None)
    rec = bench.assemble_record(
        imgs_per_sec=30.0, exact_ips=8.0, baseline=5.856, psnr=20.0,
        mode=mode, serving=serving, calibration="test",
        serving_reps=[30.0], exact_reps=[8.0],
        schedule_spec="auto:2", cache_interval=0, cache_levels=1,
        cfg_interval_str="0.2:0.8", flops_source="test")
    # ("auto:2", 0, "0.2:0.8") is unpriced — even though the module-global
    # default config IS priced; a globals re-read would wrongly pass here
    assert rec["quality_budget_pass"] is False
    assert rec["cached_vs_exact_fid_rp"] is None


def test_resolve_flops_sidecar_hit(monkeypatch, tmp_path):
    import json as _json

    sidecar = tmp_path / "flops_cache.json"
    key = f"flagship_b{bench.BATCH}_p{bench.PATCH}"
    sidecar.write_text(_json.dumps(
        {key: {"eps_flops": 3.4e12, "dec_flops": 0.8e12, "backend": "test"}}))
    monkeypatch.setattr(bench, "FLOPS_CACHE_PATH", str(sidecar))
    monkeypatch.delenv("STEDM_BENCH_RECOST", raising=False)
    per_img, src = bench.resolve_flops(None, None, None)  # no compiles needed
    assert per_img == pytest.approx(
        (bench.STEPS * 3.4e12 + 0.8e12) / bench.BATCH)
    assert "committed sidecar" in src


def test_resolve_flops_falls_back_to_hand_estimate(monkeypatch, tmp_path):
    # no sidecar + model=None -> the cost-analysis path raises -> hand estimate
    monkeypatch.setattr(bench, "FLOPS_CACHE_PATH",
                        str(tmp_path / "missing.json"))
    monkeypatch.setattr(bench, "_ASSETS_DIR", str(tmp_path))
    per_img, src = bench.resolve_flops(None, None, None)
    assert per_img == pytest.approx(0.17e12 * 2 * bench.STEPS + 0.4e12)
    assert "hand estimate" in src


def test_committed_bench_assets_exist_and_load():
    # VERDICT r4 task 1: both critical-path assets ship in the repo so a
    # driver-launched `python bench.py` does zero tunnel work after timing
    assert Path(bench.DEFAULT_DRIFT_NPY).exists(), (
        "committed drift profile missing — run tools/save_bench_assets.py")
    drift = np.load(bench.DEFAULT_DRIFT_NPY)
    assert drift.shape == (N_STEPS - 1,) and np.all(np.isfinite(drift))
    # the profile must actually place the default schedule
    from stedm_tpu.core.cache_schedule import positions_from_spec
    pos = positions_from_spec(bench.CACHE_SCHEDULE or "auto:5", N_STEPS, drift)
    assert pos[0] == 0 and len(set(pos)) == len(pos)
    import json as _json
    with open(bench.FLOPS_CACHE_PATH) as f:
        cache = _json.load(f)
    ent = cache[f"flagship_b{bench.BATCH}_p{bench.PATCH}"]
    assert ent["eps_flops"] > 1e12 and ent["dec_flops"] > 1e11


def test_priced_table_matches_records():
    """Staleness guard (VERDICT r4 task 6): every PRICED_FID_RP certificate
    entry must be backed 1:1 by a record in the pricing ledger
    (tools/bench_assets/pricing_records.json), and records that carry a raw
    pricing-run artifact must match that artifact's fid_rp_vs_exact row —
    editing the table, the protocol, or the artifacts out of sync fails."""
    import json as _json

    assets = Path(bench._ASSETS_DIR)
    with open(assets / "pricing_records.json") as f:
        ledger = _json.load(f)["records"]
    rec_by_key = {}
    for rec in ledger:
        key = (rec["key"][0], int(rec["key"][1]), rec["key"][2])
        assert key not in rec_by_key, f"duplicate ledger record for {key}"
        rec_by_key[key] = rec
    assert set(rec_by_key) == set(bench.PRICED_FID_RP), (
        "table/ledger key mismatch: "
        f"{set(rec_by_key) ^ set(bench.PRICED_FID_RP)}")
    for key, fid in bench.PRICED_FID_RP.items():
        rec = rec_by_key[key]
        assert rec["fid_rp"] == pytest.approx(fid, abs=1e-9), key
        assert rec["source"], key
        if "artifact" in rec:
            with open(assets / "pricing" / rec["artifact"]) as f:
                art = _json.load(f)
            row = art[rec["artifact_key"]]
            assert row["fid_rp_vs_exact"] == pytest.approx(fid, abs=1e-9), (
                f"{key}: table says {fid}, artifact "
                f"{rec['artifact']}[{rec['artifact_key']}] says "
                f"{row['fid_rp_vs_exact']}")


def test_assembled_record_schema():
    # the durable JSON record must be self-contained: mode + exact numbers,
    # both baseline bounds, resolved placement + calibration provenance, the
    # quality certificate, timing reps, and the lock outcome (VERDICT r3 #7)
    import json

    drift = np.linspace(1.0, 0.1, N_STEPS - 1)
    serving, mode = bench.resolve_serving(bench.CACHE_SCHEDULE, 3, 1,
                                          bench.CFG_INTERVAL, N_STEPS,
                                          calibrate=lambda: drift,
                                          log=lambda m: None)
    rec = bench.assemble_record(
        imgs_per_sec=37.2, exact_ips=7.98, baseline=5.856, psnr=12.7,
        mode=mode, serving=serving, calibration="bench-time",
        serving_reps=[33.9, 37.1, 37.2], exact_reps=[7.97, 7.98, 7.98],
        flops_source="committed sidecar flops_cache.json[flagship_b8_p256]")
    json.dumps(rec)  # must be serializable
    for key in ("metric", "value", "unit", "vs_baseline",
                "vs_baseline_realistic", "mode", "exact_value",
                "exact_vs_baseline", "exact_vs_baseline_realistic",
                "cached_vs_exact_psnr_db", "refresh_positions", "calibration",
                "flops_source",
                "fid_noise_floor", "fid_budget", "cached_vs_exact_fid_rp",
                "quality_budget_pass", "quality_pricing", "value_reps",
                "exact_value_reps", "lock"):
        assert key in rec, key
    assert rec["quality_budget_pass"] is True  # shipped default is priced
    assert rec["refresh_positions"][0] == 0
    # TF32 realistic bound is half the bf16-optimistic one -> 2x multiple
    assert rec["vs_baseline_realistic"] == pytest.approx(
        2 * rec["vs_baseline"], abs=2e-4)  # both independently rounded to 4dp
    assert rec["exact_vs_baseline"] == pytest.approx(7.98 / 5.856, rel=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
