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


def test_batch_tuned_config_reaches_searcher(tmp_path, monkeypatch):
    """A sweep_batch entry in the tuned table (batch| signature, keyed on
    (window, B*qlen)) provably configures the batch_score_fn the database
    searcher builds."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from swtpu.dispatch import plan as planmod
    from swtpu.dist import database as db
    from swtpu.kernels import pallas_fill as pf

    f = tmp_path / "tuned.json"
    f.write_text(json.dumps({"entries": [
        {"m": 128, "n": 3 * 24, "sig": "batch|linear",
         "best": {"plan": "stripe", "T": None, "R": 8, "CB": 1, "C": None,
                  "unroll": 8, "s": 0.001, "gcups": 1.0,
                  "kind": "sweep-batch"},
         "all": []}]}))
    monkeypatch.setenv("SWTPU_TUNED_TABLE", str(f))
    monkeypatch.setattr(planmod, "_policy_cache",
                        {"loaded": False, "policy": None})
    captured = {}
    orig = pf.batch_score_fn

    def spy(*a, **k):
        fn = orig(*a, **k)
        captured.update(fn.config)
        return fn

    monkeypatch.setattr(pf, "batch_score_fn", spy)
    fn = db.make_searcher(None, qlen=24, shard_len=104, window=128,
                          plan="stripe", interpret=True)
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 128).astype(np.int8)
    reads = db.pad_queries([ref[10:34].copy()], 24)
    shards, _ = db.shard_reference(ref, 1, 24)
    hits = fn(jnp.asarray(np.repeat(reads, 3, axis=0)),
              jnp.asarray(shards[:1]))
    assert int(hits.scores[0]) == 72
    assert captured["R"] == 8 and captured["CB"] == 1
    assert captured["unroll"] == 8


def test_sweep_batch_produces_entries(monkeypatch):
    """CPU smoke of the batch sweep (interpret kernels, tiny shapes)."""
    from swtpu.dispatch import autotune

    monkeypatch.setattr("swtpu.dispatch.plan.current_platform",
                        lambda: "cpu")
    table = autotune.sweep_batch(shapes=((2, 16, 64),),
                                 r_candidates=(8,), cb_candidates=(1,),
                                 unrolls=(None,), verbose=False,
                                 allow_non_tpu=True)
    (e,) = table["entries"]
    assert e["sig"] == "batch|linear"
    assert e["m"] == 64 and e["n"] == 32
    assert e["best"]["R"] == 8 and e["best"]["kind"] == "sweep-batch"


def test_best_promotion_is_kind_aware():
    """A floor-subtracted single observation (kind='observed', up to ~20x
    optimistic when the dispatch floor dominates a tiny problem) must not
    displace a dispatch-amortized sweep best; sweep rows always supersede
    observed bests; within one methodology higher GCUPS wins (ADVICE r3)."""
    from swtpu.dispatch.autotune import Policy

    pol = Policy({"entries": []})
    pol.observe(512, 512, "stripe", T=512, C=128, seconds=1e-3,
                R=4, kind="sweep")
    e = pol.table["entries"][0]
    assert e["best"]["kind"] == "sweep"

    # an optimistic observation: 10x faster on paper
    pol.observe(512, 512, "stripe", T=1024, C=128, seconds=1e-4,
                R=8, kind="observed")
    assert e["best"]["kind"] == "sweep" and e["best"]["T"] == 512, \
        "observed row displaced a sweep best"

    # observed rows still compete among themselves when no sweep exists
    pol.observe(256, 256, "scan", T=None, C=None, seconds=1e-3)
    pol.observe(256, 256, "stripe", T=256, C=128, seconds=1e-4)
    e2 = [x for x in pol.table["entries"] if x["m"] == 256][0]
    assert e2["best"]["plan"] == "stripe"

    # a sweep row supersedes an observed best even at lower paper GCUPS
    pol.observe(256, 256, "scan", T=None, C=None, seconds=5e-4,
                kind="sweep")
    assert e2["best"]["kind"] == "sweep" and e2["best"]["plan"] == "scan"

    # merge applies the same rule
    other = Policy({"entries": []})
    other.observe(512, 512, "stripe", T=2048, C=128, seconds=1e-5,
                  R=16, kind="observed")
    pol.merge(other.table)
    assert e["best"]["kind"] == "sweep" and e["best"]["T"] == 512
