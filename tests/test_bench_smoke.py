"""bench.py smoke: the driver's metric surface must emit one valid
headline JSON line even where pallas is unavailable (CPU backend).

Runs the real bench.py in a subprocess with tiny MVT_BENCH_B/ITERS on
the CPU backend: the pallas candidates skip, the XLA words candidate
audits, and exactly one JSON object with the contract keys must appear
on stdout.  Guards the scoring surface against Python-level regressions
that only a TPU run would otherwise catch.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_headline_json():
    env = dict(os.environ)
    env.update(MVT_BENCH_B="256", MVT_BENCH_ITERS="8",
               JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # bench.py has no platform override hook; force CPU like conftest does
    prog = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy\n"
        "runpy.run_path('bench.py', run_name='__main__')\n"
    )
    r = subprocess.run([sys.executable, "-c", prog], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    json_lines = [ln for ln in r.stdout.splitlines()
                  if ln.startswith("{")]
    assert len(json_lines) == 1, (r.stdout, r.stderr[-2000:])
    rec = json.loads(json_lines[0])
    assert rec["metric"] == "1080p_scan_frames_per_sec_per_chip"
    for key in ("value", "unit", "vs_baseline", "impl", "roofline_gbps",
                "bytes_per_frame", "audit"):
        assert key in rec, (key, rec)
    # on CPU the XLA words path must audit (checksum Ok, under roofline)
    assert rec.get("audit_failed") is None, rec
    assert rec["value"] > 0
    assert rec["impl"] == "xla-words"
    # ADVICE r2: candidates that failed/skipped ABOVE the published one
    # must be machine-visible in the metric of record — on CPU both
    # pallas candidates skip, so the key must be present and name them
    failed = {f["impl"] for f in rec["failed_candidates"]}
    assert failed == {"pallas-words-T", "pallas-words"}, rec


def test_dispatch_batch_bench_smoke():
    """The cross-video dispatch-batching decision tool (PERFORMANCE.md
    "Cross-video dispatch batching") must keep running and keep its
    oracle audit: all three strategies bit-equal the oracle motion
    vector, JSON contract keys present."""
    env = dict(os.environ)
    env["MVT_JAX_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "benchmarks/dispatch_batch_bench.py",
         "--videos", "3", "--frames", "16", "--width", "320",
         "--height", "240", "--repeats", "2"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, (r.stdout, r.stderr[-2000:])
    json_lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, (r.stdout, r.stderr[-2000:])
    rec = json.loads(json_lines[0])
    assert rec["bench"] == "dispatch_batch"
    assert rec["platform"] == "cpu"
    assert "bit-equal the oracle" in rec["audit"]
    for strat in ("pervideo", "pipelined", "merged"):
        assert rec[strat]["median_s"] > 0, rec
    assert rec["pervideo"]["dispatches"] == 3
    assert rec["merged"]["dispatches"] == 1


def test_sad_bench_variant_parsers():
    """The sad_bench variant grammar (prod/ctrl/comp families) stays
    stable: the comp compute-bound controls added in round 4 must not
    shadow or be shadowed by the prod/ctrl parsers."""
    import importlib.util

    path = os.path.join(REPO, "benchmarks", "sad_bench.py")
    spec = importlib.util.spec_from_file_location("sad_bench_mod", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    assert m.parse_comp("comp") == ("flat", None)
    assert m.parse_comp("compf4") == ("flat", 4)
    assert m.parse_comp("comph2") == ("sliced", 2)
    assert m.parse_comp("comph1") is None          # S >= 2 only
    assert m.parse_comp("compf0") is None          # F >= 1 only
    assert m.parse_comp("prod") is None
    assert m.parse_prod("comp") is None
    assert m.parse_ctrl("comp") is None
    assert m.parse_sliced("comph2") is None
    assert m.parse_prod("prodhp") == ("highest", None)
    assert m.parse_prod("prodf2") == ("hilo", 2)
    assert m.parse_ctrl("ctrlf2") == (True, 2)
    assert m.parse_sliced("prodh2") == 2
