"""Auto-tuner tests (cache plumbing; real sweeps need an accelerator)."""

import json

import pytest

from nbody_tpu import tune


@pytest.fixture(autouse=True)
def fake_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    return tmp_path


def test_bucket_rounds_to_power_of_two():
    assert tune._bucket(65536) == "65536"
    assert tune._bucket(65537) == "131072"
    assert tune._bucket(1000) == "1024"


def test_best_config_roundtrip(tmp_path):
    path = tune._cache_path()
    path.parent.mkdir(parents=True)
    entry = {"variant": "mxu_bf16", "tile_i": 1024, "tile_j": 8192,
             "g_interactions_per_s": 205.0}
    path.write_text(json.dumps(
        {tune._key(): {"euler": {"65536": entry}}}))
    assert tune.best_config(65536) == entry
    assert tune.best_config(50000) == entry  # same bucket
    assert tune.best_config(200000) is None
    assert tune.best_config(65536, family="hermite") is None


def test_best_config_legacy_flat_schema_served_for_euler(tmp_path):
    """Pre-family caches (r3) stored euler winners flat under the device
    key; they must still be served for family='euler' so a tuned chip
    keeps its winner across the schema change."""
    path = tune._cache_path()
    path.parent.mkdir(parents=True)
    entry = {"variant": "sym", "tile_i": 64, "tile_j": 4096,
             "g_interactions_per_s": 285.0}
    path.write_text(json.dumps({tune._key(): {"65536": entry}}))
    assert tune.best_config(65536) == entry
    assert tune.best_config(65536, family="hermite") is None


def test_best_config_families_are_independent(tmp_path):
    path = tune._cache_path()
    path.parent.mkdir(parents=True)
    euler = {"variant": "sym", "tile_i": 64, "tile_j": 4096,
             "g_interactions_per_s": 285.0}
    hermite = {"variant": "one_sided", "tile_i": 32, "tile_j": 16384,
               "g_interactions_per_s": 52.0}
    p3m = {"blk": 256, "g_interactions_per_s": 900.0}
    path.write_text(json.dumps({tune._key(): {
        "euler": {"65536": euler},
        "hermite": {"65536": hermite},
        "p3m": {"64": p3m},
    }}))
    assert tune.best_config(65536) == euler
    assert tune.best_config(65536, family="hermite") == hermite
    assert tune.best_config(48, family="p3m") == p3m
    assert tune.best_config(65536, family="ds") is None


def test_p3m_kernel_blk_consumes_tuned_winner(tmp_path):
    from nbody_tpu.ops import p3m_kernel

    path = tune._cache_path()
    path.parent.mkdir(parents=True)
    path.write_text(json.dumps({tune._key(): {
        "p3m": {"1024": {"blk": 512, "g_interactions_per_s": 1.0}}}}))
    p3m_kernel._tuned_blk.cache_clear()
    try:
        assert p3m_kernel.p3m_kernel_blk(1000) == 512
        # un-tuned capacity buckets fall back to the heuristic ladder
        # frozen from the r5 on-chip sweep (scripts/tpu_r5_p3m_tune.py)
        assert p3m_kernel.p3m_kernel_blk(128) == 128
        assert p3m_kernel.p3m_kernel_blk(200) == 256
        assert p3m_kernel.p3m_kernel_blk(6680) == 512
    finally:
        p3m_kernel._tuned_blk.cache_clear()


def test_best_config_empty_cache():
    assert tune.best_config(65536) is None
    assert tune.best_config(65536, family="ds_hermite") is None


def test_unknown_family_rejected():
    with pytest.raises((ValueError, RuntimeError)):
        tune.autotune(1024, family="nope")


def test_autotune_requires_accelerator():
    with pytest.raises(RuntimeError, match="accelerator"):
        tune.autotune(1024)


def test_auto_variant_falls_back_to_vpu_on_cpu():
    from nbody_tpu.models import BodySystem
    from nbody_tpu.params import NBodyParams

    s = BodySystem(128, NBodyParams(), backend="xla", variant="auto", seed=0)
    assert s.variant == "vpu"


def test_corrupt_cache_ignored(tmp_path):
    path = tune._cache_path()
    path.parent.mkdir(parents=True)
    path.write_text("{not json")
    assert tune.best_config(65536) is None


def test_drift_gate_rejects_divergent_variants():
    """The speed winner cannot ship if its energy drift diverges from the
    exact vpu anchor (VERDICT r1: gate variant=auto on a drift bound)."""
    results = [
        {"variant": "vpu", "tile_i": 256, "tile_j": 1024,
         "g_interactions_per_s": 140.0},
        {"variant": "mxu_bf16", "tile_i": 1024, "tile_j": 8192,
         "g_interactions_per_s": 205.0},
        {"variant": "mxu_bf16", "tile_i": 2048, "tile_j": 8192,
         "g_interactions_per_s": 210.0},
    ]
    drifts = {("vpu", 64, 8192): 0.566,             # the measured anchor scale
              ("mxu_bf16", 1024, 8192): 0.571,      # 0.9% off: passes 2% gate
              ("mxu_bf16", 2048, 8192): 0.589}      # 4.1% off: rejected
    logs = []
    gated = tune._gate_by_drift(
        results, lambda v, ti, tj: drifts[(v, ti, tj)], log=logs.append
    )
    names = {(r["variant"], r["tile_i"]) for r in gated}
    # fastest (2048) rejected on drift; next (1024) qualifies and the walk
    # stops there — slower candidates are never drift-tested
    assert ("mxu_bf16", 2048) not in names
    assert names == {("mxu_bf16", 1024)}
    assert any("REJECTED" in line for line in logs)


def test_drift_gate_vpu_leader_skips_anchor_rollout():
    """When the fastest candidate is already the exact kernel, the gate must
    not burn TPU time measuring drifts at all."""
    calls = []

    def drift_of(v, ti, tj):
        calls.append((v, ti, tj))
        return 0.0

    results = [
        {"variant": "vpu", "tile_i": 64, "tile_j": 32768,
         "g_interactions_per_s": 200.0},
        {"variant": "mxu_bf16", "tile_i": 1024, "tile_j": 8192,
         "g_interactions_per_s": 150.0},
    ]
    gated = tune._gate_by_drift(results, drift_of, log=lambda *a: None)
    assert [r["variant"] for r in gated] == ["vpu"]
    assert calls == []  # no anchor, no candidate drift runs


def test_drift_gate_all_rejected_raises():
    results = [{"variant": "mxu_bf16", "tile_i": 1024, "tile_j": 8192,
                "g_interactions_per_s": 205.0}]
    with pytest.raises(RuntimeError, match="drift gate"):
        tune._gate_by_drift(
            results,
            lambda v, ti, tj: 0.0 if v == "vpu" else 1.0,
            log=lambda *a: None,
        )


def test_p3m_tuned_blk_cache_invalidation(monkeypatch):
    """p3m_kernel_blk memoizes tune-cache reads (they hit the filesystem);
    a winner written later in the same process must be served after the
    save-path invalidation (_tuned_blk.cache_clear — review finding r4:
    the memoized miss was permanent)."""
    import nbody_tpu.tune as tune
    from nbody_tpu.ops import p3m_kernel as pk

    pk._tuned_blk.cache_clear()
    try:
        monkeypatch.setattr(tune, "best_config", lambda n, family="euler": None)
        assert pk.p3m_kernel_blk(100) == 128   # heuristic, miss memoized
        monkeypatch.setattr(tune, "best_config",
                            lambda n, family="euler": {"blk": 512})
        assert pk.p3m_kernel_blk(100) == 128   # still the memoized miss
        pk._tuned_blk.cache_clear()            # what autotune(save=True) does
        assert pk.p3m_kernel_blk(100) == 512   # new winner visible
    finally:
        pk._tuned_blk.cache_clear()            # drop monkeypatched entries
