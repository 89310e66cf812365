"""Smoke tests for the benchmark dashboard (benchmarks/app.py) — the
stdlib analogue of the reference's Dash app (reference
benchmarks/app.py: dataset picker, run launcher, results browser)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer


def _serve(tmp_path):
    from benchmarks.app import _App, make_handler
    app = _App(tmp_path)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return app, srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_index_and_run_views(tmp_path):
    payload = {
        "engine": "host", "mode": "fast", "dataset": "dssim",
        "results": [{"case": "x", "category": "dssim", "n_seqs": 4,
                     "sp": 0.9, "tc": 0.8, "precision": 0.9, "f1": 0.9,
                     "wall_s": 1.0}],
        "categories": {},
        "summary": {"cases": 1, "mean_sp": 0.9, "mean_tc": 0.8,
                    "total_wall_s": 1.0},
    }
    (tmp_path / "host-fast-1.json").write_text(json.dumps(payload))
    (tmp_path / "broken.json").write_text("{not json")   # must be skipped
    app, srv, base = _serve(tmp_path)
    try:
        idx = urllib.request.urlopen(base + "/").read().decode()
        assert "kalign-tpu benchmark dashboard" in idx
        assert "host-fast-1.json" in idx
        assert "<svg" in idx                  # comparison chart rendered
        run = urllib.request.urlopen(
            base + "/run?f=host-fast-1.json").read().decode()
        assert "0.9" in run
        missing = urllib.request.urlopen(base + "/run?f=nope.json")
        assert "not found" in missing.read().decode()
        try:
            urllib.request.urlopen(base + "/bogus")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()


def test_launch_status_renders(tmp_path, monkeypatch):
    """Launch with a stubbed runner; the status panel must render the
    run label and completion without error."""
    import benchmarks.app as A

    monkeypatch.setattr(A, "load_cases", lambda d, p: ["c1"])
    monkeypatch.setattr(A, "run_case", lambda c, m, e, t, x: {
        "case": "c1", "category": "dssim", "n_seqs": 4, "sp": 1.0,
        "tc": 1.0, "precision": 1.0, "f1": 1.0, "wall_s": 0.0})
    monkeypatch.setattr(A, "aggregate", lambda rs: {})
    app, srv, base = _serve(tmp_path)
    try:
        urllib.request.urlopen(base + "/launch?dataset=dssim&mode=fast"
                               "&engine=host")
        for _ in range(100):
            if app.current is not None and app.current.done:
                break
            import time
            time.sleep(0.05)
        assert app.current.done and app.current.error is None, \
            app.current.error
        idx = urllib.request.urlopen(base + "/").read().decode()
        assert "dssim-fast-host" in idx and "done" in idx
        stored = list(tmp_path.glob("dssim-fast-host-*.json"))
        assert len(stored) == 1
        assert json.loads(stored[0].read_text())["summary"]["cases"] == 1
    finally:
        srv.shutdown()
