"""The bench.py subprocess section driver: merge, error, and kill paths.

The driver exists because a tunneled-relay death mid-bench hangs device
ops inside native code (SIGALRM never fires there) — each section runs as
a kill-able child instead. These tests substitute a stub child script so
no device or heavy section code is involved.
"""

import json
import sys
import textwrap

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def _stub(tmp_path, body: str) -> list:
    p = tmp_path / "stub.py"
    p.write_text(textwrap.dedent(body))
    return [sys.executable, str(p)]


def test_merges_metrics_and_remaps_child_backend_errors(tmp_path,
                                                        monkeypatch):
    # the gdino child reports a backend blip -> the parent re-probes;
    # pretend the backend is alive so the run continues
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **kw: None)
    cmd = _stub(tmp_path, """\
        import json, os
        name = os.environ["SOLA_BENCH_ONLY"]
        print("log noise, not JSON")
        errors = {"backend": "flaky probe"} if name == "gdino" else {}
        print(json.dumps({"metrics": {name + "_x": 1.0},
                          "errors": errors}))
    """)
    metrics, errors = bench._run_sections_subprocess(None, cmd=cmd)
    assert metrics == {f"{n}_x": 1.0 for n, _ in bench.SECTIONS}
    # a child's transient "backend" error is remapped to its section name
    # so it cannot read as whole-bench backend death
    assert errors == {"gdino": "flaky probe"}


def test_only_filter_and_bad_json_reported(tmp_path):
    cmd = _stub(tmp_path, "print('garbage, no JSON')\n")
    metrics, errors = bench._run_sections_subprocess({"selection"}, cmd=cmd)
    assert metrics == {}
    assert list(errors) == ["selection"]
    assert "no JSON from section" in errors["selection"]


def test_hung_section_killed_and_driver_continues(tmp_path, monkeypatch):
    # budget + 180 = 6 s hard timeout per section
    monkeypatch.setattr(bench, "SECTIONS",
                        [("trackgen", -174), ("selection", -174)])
    # the post-kill backend probe must run on CPU, fast, in this test env
    monkeypatch.setenv("PYTHONPATH", "/root/repo")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("SOLA_PROBE_BUDGET", "60")
    cmd = _stub(tmp_path, "import time\ntime.sleep(60)\n")
    metrics, errors = bench._run_sections_subprocess(None, cmd=cmd)
    assert metrics == {}
    # both sections hit the hard kill; the alive (CPU) probe let the
    # driver continue past the first rather than bail out
    assert set(errors) == {"trackgen", "selection"}
    assert all("killed after" in v for v in errors.values())


def test_child_json_roundtrip_shape():
    """The parent parses exactly what a child main() prints: a dict with
    'metrics' (+ optional 'errors'). Guard the contract."""
    payload = {"metric": "selection_forward_throughput_64trk_64frm",
               "value": None, "unit": "pairs/s", "vs_baseline": None,
               "metrics": {"a": 1}, "errors": {"roberta": "boom"}}
    line = json.dumps(payload)
    parsed = json.loads(line)
    assert parsed.get("metrics") == {"a": 1}
    assert parsed.get("errors") == {"roberta": "boom"}


def test_cumulative_emit_after_every_section(tmp_path, monkeypatch):
    """The round-4 lesson: the driver's watchdog must never zero the
    record. emit() fires after every section with the cumulative state."""
    monkeypatch.setattr(bench, "SECTIONS",
                        [("trackgen", 60), ("selection", 60)])
    cmd = _stub(tmp_path, """\
        import json, os
        name = os.environ["SOLA_BENCH_ONLY"]
        print(json.dumps({"metrics": {name + "_x": 1.0}}))
    """)
    seen = []
    bench._run_sections_subprocess(
        None, cmd=cmd, emit=lambda m, e: seen.append((dict(m), dict(e))))
    assert len(seen) == 2
    assert seen[0][0] == {"trackgen_x": 1.0}
    assert seen[1][0] == {"trackgen_x": 1.0, "selection_x": 1.0}


def test_total_budget_skips_sections_and_records_them(tmp_path,
                                                      monkeypatch):
    """With no clock left, remaining sections are recorded as skipped —
    a deliberate gap, not a killed child."""
    import time as _time
    monkeypatch.setattr(bench, "SECTIONS",
                        [("trackgen", 60), ("selection", 60)])
    cmd = _stub(tmp_path, """\
        import json, os
        print(json.dumps({"metrics": {os.environ["SOLA_BENCH_ONLY"]: 1.0}}))
    """)
    # deadline already in the past: everything skips
    metrics, errors = bench._run_sections_subprocess(
        None, cmd=cmd, deadline=_time.monotonic() - 1, total_budget=2400)
    assert metrics == {}
    assert set(errors) == {"trackgen", "selection"}
    assert all(v.startswith("skipped:") for v in errors.values())


def test_killed_child_partials_salvaged(tmp_path, monkeypatch):
    """A child the parent kills on budget still contributes its last
    partial {"metrics": ...} line (bench._partial emissions)."""
    monkeypatch.setattr(bench, "SECTIONS", [("trackgen", -174)])  # 6 s kill
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PYTHONPATH", "/root/repo")
    monkeypatch.setenv("SOLA_PROBE_BUDGET", "60")
    cmd = _stub(tmp_path, """\
        import json, time
        print(json.dumps({"metrics": {"sam2_encode_fps": 9.9}}), flush=True)
        time.sleep(60)
    """)
    metrics, errors = bench._run_sections_subprocess(None, cmd=cmd)
    assert metrics == {"sam2_encode_fps": 9.9}
    assert "killed after" in errors["trackgen"]


def test_deterministic_overrun_not_retried(tmp_path, monkeypatch):
    """ADVICE r4: a child that times out while the relay is alive is a
    deterministic overrun — it must NOT burn a second budget."""
    monkeypatch.setattr(bench, "SECTIONS", [("trackgen", -174)])
    monkeypatch.setattr(bench, "_probe_backend", lambda *a, **kw: None)
    marker = tmp_path / "runs.txt"
    cmd = _stub(tmp_path, f"""\
        import time
        with open({str(marker)!r}, "a") as f:
            f.write("run\\n")
        time.sleep(60)
    """)
    metrics, errors = bench._run_sections_subprocess(None, cmd=cmd)
    assert "killed after" in errors["trackgen"]
    assert marker.read_text().count("run") == 1


def test_build_record_schema_and_headline():
    rec = bench._build_record(
        {"sam2_propagation_object_fps": 160.0,
         "loader_train_pairs_per_s": 500.0,
         "selection_train_pairs_per_s": 700.0}, {})
    assert rec["metric"] == "sam2_propagation_object_fps"
    assert rec["value"] == 160.0
    assert rec["vs_baseline"] == round(160.0 / 17.5, 2)
    assert rec["metrics"]["train_step_idle_frac"] == round(1 - 500 / 700, 3)
    # without the headline metric the record falls back, never crashes
    rec2 = bench._build_record({}, {"trackgen": "skipped: no clock"})
    assert rec2["value"] is None
    assert rec2["errors"]["trackgen"].startswith("skipped")


def test_effective_budget_trackgen_hard_slice():
    import time as _time
    deadline = _time.monotonic() + 10_000
    assert bench._effective_budget("trackgen", 4500, deadline,
                                   2400) == int(2400 * 0.55)
    # non-headline sections are bounded by the remaining clock only
    assert bench._effective_budget("selection", 1200, deadline, 2400) == 1200
    # below the warm minimum: skip signal
    assert bench._effective_budget(
        "trackgen", 4500, _time.monotonic() + 100, 2400) is None


def test_child_backend_death_confirmed_bails(tmp_path, monkeypatch):
    """A child reporting backend-unreachable + a parent probe agreeing
    stops the run instead of burning a probe budget per section."""
    monkeypatch.setattr(bench, "SECTIONS",
                        [("trackgen", 60), ("selection", 60)])
    monkeypatch.setattr(bench, "_probe_backend",
                        lambda *a, **kw: "still dead")
    cmd = _stub(tmp_path, """\
        import json
        print(json.dumps({"metrics": {},
                          "errors": {"backend": "unreachable"}}))
    """)
    metrics, errors = bench._run_sections_subprocess(None, cmd=cmd)
    assert metrics == {}
    assert errors["trackgen"] == "unreachable"
    assert "selection" not in errors       # never ran
    assert "remaining sections skipped" in errors["backend"]
