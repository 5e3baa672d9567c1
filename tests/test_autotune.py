"""Autotuner Policy tests (sweep itself is exercised on hardware)."""

from swtpu.dispatch.autotune import Policy, load, save


def test_policy_empty_falls_back():
    p = Policy()
    c = p.choose(1000, 1000)
    assert c["plan"] in ("scan", "stripe")


def test_policy_observe_and_choose():
    p = Policy()
    p.observe(1024, 1024, "scan", None, None, seconds=0.1)
    p.observe(1024, 1024, "stripe", 1024, 256, seconds=0.01)
    c = p.choose(1024, 1024)
    assert c["plan"] == "stripe"
    # nearest-size lookup
    c2 = p.choose(1100, 1000)
    assert c2["plan"] == "stripe"
    # a worse observation doesn't displace the best
    p.observe(1024, 1024, "scan", None, None, seconds=1.0)
    assert p.choose(1024, 1024)["plan"] == "stripe"


def test_save_load_roundtrip(tmp_path):
    p = Policy()
    p.observe(512, 512, "scan", None, None, 0.05)
    f = tmp_path / "tuned.json"
    save(p.table, str(f))
    t = load(str(f))
    assert t["entries"][0]["best"]["plan"] == "scan"
    assert load(str(tmp_path / "missing.json")) is None


def test_choose_plan_uses_tuned_table(tmp_path, monkeypatch):
    import json
    from swtpu.dispatch import plan as planmod

    f = tmp_path / "tuned.json"
    f.write_text(json.dumps({"entries": [
        {"m": 1000, "n": 1000,
         "best": {"plan": "stripe", "T": 1024, "R": 8, "CB": 2, "C": 128,
                  "unroll": 32, "s": 0.001, "gcups": 1.0},
         "all": []}]}))
    monkeypatch.setenv("SWTPU_TUNED_TABLE", str(f))
    monkeypatch.setattr(planmod, "_policy_cache",
                        {"loaded": False, "policy": None})
    monkeypatch.setattr(planmod, "current_platform", lambda: "tpu")
    assert planmod.choose_plan(900, 900) == "stripe"
    # without a table, thresholds apply
    monkeypatch.delenv("SWTPU_TUNED_TABLE")
    monkeypatch.setattr(planmod, "_policy_cache",
                        {"loaded": False, "policy": None})
    monkeypatch.chdir(tmp_path)
    from swtpu.runtime_native import available
    # tiny problems: native host tier when the lib is built, scan else
    assert planmod.choose_plan(8, 8) == ("host" if available() else "scan")
