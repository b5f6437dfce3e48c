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
