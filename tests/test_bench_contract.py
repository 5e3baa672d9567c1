"""bench.py capture contract: a blocked backend must never leave stdout
without a parseable JSON artifact.

Round-3 failure mode (VERDICT r3 Weak #1): the probe loop waited out its
whole budget before printing the honest fallback line, so the driver's
outer timeout (rc=124) captured nothing. The contract now is:

1. the FIRST failed probe immediately prints a provisional value-0 JSON
   line (flushed) — an outer kill at any later moment still finds it;
2. budget exhaustion prints a final value-0 line with the last failure;
3. a recovered backend prints the real measurement last.

Consumers take the last JSON line on stdout. The reference's analog of
this contract is its committed measured logs (experiments-lassen/*.log):
a sweep that produced no artifact was a failed sweep.
"""

import importlib.util
import json
import subprocess


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "swtpu_bench", __file__.rsplit("/tests/", 1)[0] + "/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def _json_lines(captured: str):
    out = []
    for line in captured.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


class _Blocked:
    """Fake subprocess.run: every probe blocks past its bound."""

    def __init__(self):
        self.calls = 0

    def __call__(self, cmd, timeout=None, **kw):
        self.calls += 1
        raise subprocess.TimeoutExpired(cmd, timeout)


class _RecoverAfter:
    """Fake subprocess.run: fails n times, then succeeds."""

    def __init__(self, n):
        self.calls, self.n = 0, n

    def __call__(self, cmd, timeout=None, **kw):
        self.calls += 1
        if self.calls <= self.n:
            raise subprocess.TimeoutExpired(cmd, timeout)


def test_provisional_line_prints_on_first_failed_probe(monkeypatch, capsys):
    """The artifact exists from the first failure on — an outer kill
    during any later probe still captures a parseable line."""
    blocked = _Blocked()
    monkeypatch.setattr("subprocess.run", blocked)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("SWTPU_BENCH_PROBE_BUDGET_S", "1")

    ok, last = bench._await_backend()
    assert ok is False
    assert "probe" in last

    lines = _json_lines(capsys.readouterr().out)
    assert len(lines) >= 1, "first failed probe must emit a JSON line"
    prov = lines[0]
    assert prov["value"] == 0.0
    assert prov["metric"] == "single_chip_fill_GCUPS"
    assert "provisional" in prov["details"]
    assert "unreachable" in prov["details"]["error"].lower()


def test_exhausted_budget_main_prints_final_unreachable_line(
        monkeypatch, capsys):
    """main() with a permanently blocked backend: last JSON line is the
    final (non-provisional) honest value-0 record, printed BEFORE the
    long-shot measurement attempt (round 5) — and when that attempt also
    dies (init truly hung), main returns cleanly with the value-0 line
    standing."""
    monkeypatch.setattr("subprocess.run", _Blocked())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("SWTPU_BENCH_PROBE_BUDGET_S", "1")

    def hung_init():
        raise RuntimeError("backend init died")

    monkeypatch.setattr(bench, "_measure_and_print", hung_init)
    bench.main()                      # must NOT raise
    lines = _json_lines(capsys.readouterr().out)
    assert len(lines) >= 2, "provisional + final"
    final = lines[-1]
    assert final["value"] == 0.0
    assert final["vs_baseline"] == 0.0
    assert "provisional" not in final["details"]
    assert "unreachable" in final["details"]["error"].lower()
    # every line on the way is parseable and carries the metric name
    assert all(ln["metric"] == "single_chip_fill_GCUPS" for ln in lines)


def test_exhausted_budget_still_attempts_measurement(monkeypatch, capsys):
    """Round-5 tunnel mode: init SUCCEEDS but takes ~400 s — longer than
    any probe bound, so every probe times out on a chip that would
    measure fine. After the exhausted budget main must try the real
    measurement anyway; its line supersedes the value-0 records."""
    monkeypatch.setattr("subprocess.run", _Blocked())
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("SWTPU_BENCH_PROBE_BUDGET_S", "1")

    def slow_but_fine():
        print(json.dumps({"metric": "single_chip_fill_GCUPS",
                          "value": 101.0, "unit": "GCUPS",
                          "vs_baseline": 187.0, "details": {}}))

    monkeypatch.setattr(bench, "_measure_and_print", slow_but_fine)
    bench.main()
    lines = _json_lines(capsys.readouterr().out)
    assert lines[-1]["value"] == 101.0, \
        "real measurement must supersede the unreachable records"
    assert any(ln["value"] == 0.0 for ln in lines[:-1]), \
        "the honest value-0 artifact still precedes it"


def test_recovery_supersedes_provisional(monkeypatch, capsys):
    """Probe fails once, then recovers: _await_backend returns ok and the
    provisional line is all that was printed (the real measurement would
    follow from main)."""
    fake = _RecoverAfter(1)
    monkeypatch.setattr("subprocess.run", fake)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("SWTPU_BENCH_PROBE_BUDGET_S", "300")

    ok, last = bench._await_backend()
    assert ok is True and last == ""
    assert fake.calls == 2
    lines = _json_lines(capsys.readouterr().out)
    assert len(lines) == 1 and "provisional" in lines[0]["details"]


def test_default_budget_fits_driver_window():
    """The round-3 regression: a 2400 s default probe budget overran the
    driver timeout. Pin the default well inside a ~15-minute window."""
    import os
    assert "SWTPU_BENCH_PROBE_BUDGET_S" not in os.environ
    # read the default straight from the module source contractually:
    # _await_backend uses 600 when the env var is unset
    import inspect
    src = inspect.getsource(bench._await_backend)
    assert "600" in src and "2400" not in src


def test_probe_bound_is_short():
    """Individual probes are bounded <= 120 s so several attempts fit the
    budget (6 x 240 s probes was the rc=124 signature)."""
    import inspect
    src = inspect.getsource(bench._await_backend)
    assert "120.0" in src and "240.0" not in src
