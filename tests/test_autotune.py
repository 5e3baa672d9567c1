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
