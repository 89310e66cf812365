"""Benchmark dashboard — run suites and browse results from a browser.

The reference ships a Dash app for this (benchmarks/app.py:1-603:
dataset picker, background run launcher, results tables, cross-run
comparison charts).  This is the dependency-free analogue: a stdlib
http.server that

  * lists the dataset registry and stored result files,
  * launches benchmark runs (dataset x mode x engine) on a background
    worker thread, streaming per-case progress,
  * renders finished runs through benchmarks.report plus an inline SVG
    mean-SP/TC comparison chart across stored runs.

Usage:
    python -m benchmarks.app [--port 8050] [--results-dir DIR]
"""

import argparse
import html
import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from benchmarks.datasets import load_cases
from benchmarks.runner import run_case, aggregate
from benchmarks import report as report_mod

RESULTS_DIR = Path(__file__).parent / "results"
DATA_DIR = Path(__file__).parent.parent / "tests" / "data"

_MODES = ("default", "fast", "precise")
_ENGINES = ("host", "tpu", "tpu-fast")
_DATASETS = ("all", "balibase", "dssim")


class _RunState:
    """One background benchmark run (the Dash app's interval-polled
    launcher, reference app.py:210-320, as a worker thread)."""

    def __init__(self, dataset, mode, engine):
        self.dataset, self.mode, self.engine = dataset, mode, engine
        self.results = []
        self.total = 0
        self.error = None
        self.done = False
        self.started = time.time()

    @property
    def label(self):
        return f"{self.dataset}-{self.mode}-{self.engine}"

    def run(self, results_dir):
        try:
            cases = load_cases(self.dataset, str(DATA_DIR))
            self.total = len(cases)
            for c in cases:
                self.results.append(
                    run_case(c, self.mode, self.engine, 1, False))
            payload = dict(
                engine=self.engine, mode=self.mode, dataset=self.dataset,
                results=self.results, categories=aggregate(self.results),
                summary=dict(
                    cases=len(self.results),
                    mean_sp=round(sum(r["sp"] for r in self.results)
                                  / max(len(self.results), 1), 4),
                    mean_tc=round(sum(r["tc"] for r in self.results)
                                  / max(len(self.results), 1), 4),
                    total_wall_s=round(sum(r["wall_s"]
                                           for r in self.results), 3)))
            results_dir.mkdir(parents=True, exist_ok=True)
            out = results_dir / f"{self.label}-{int(self.started)}.json"
            out.write_text(json.dumps(payload, indent=1))
        except Exception as e:  # surfaced in the status panel
            self.error = f"{type(e).__name__}: {e}"
        finally:
            self.done = True


class _App:
    def __init__(self, results_dir):
        self.results_dir = Path(results_dir)
        self.current = None
        self.lock = threading.Lock()

    # -- data -------------------------------------------------------------
    def stored_runs(self):
        runs = []
        for f in sorted(self.results_dir.glob("*.json")):
            try:
                p = json.loads(f.read_text())
                runs.append((f.name, p))
            except (json.JSONDecodeError, OSError):
                continue
        return runs

    def launch(self, dataset, mode, engine):
        with self.lock:
            if self.current is not None and not self.current.done:
                return False
            self.current = _RunState(dataset, mode, engine)
            threading.Thread(target=self.current.run,
                             args=(self.results_dir,), daemon=True).start()
            return True

    # -- views ------------------------------------------------------------
    def _chart(self, runs):
        """Inline SVG grouped bars: mean SP and TC per stored run (the
        Dash app's px.bar comparison view)."""
        if not runs:
            return ""
        w_bar, gap, h = 26, 34, 150
        width = 120 + gap * len(runs) * 2
        parts = [f'<svg width="{width}" height="{h + 40}" '
                 f'font-family="system-ui" font-size="10">']
        for i, (name, p) in enumerate(runs):
            s = p.get("summary", {})
            for j, (key, color) in enumerate(
                    (("mean_sp", "#4a7"), ("mean_tc", "#47a"))):
                v = float(s.get(key, 0) or 0)
                bh = int(v * h)
                x = 40 + i * gap * 2 + j * w_bar
                parts.append(
                    f'<rect x="{x}" y="{40 + h - bh}" width="{w_bar - 2}" '
                    f'height="{bh}" fill="{color}"><title>'
                    f'{html.escape(name)} {key}={v:.4f}</title></rect>')
            parts.append(
                f'<text x="{40 + i * gap * 2}" y="{h + 52}" '
                f'transform="rotate(30 {40 + i * gap * 2} {h + 52})">'
                f'{html.escape(name[:24])}</text>')
        parts.append(f'<text x="2" y="50">SP/TC</text></svg>')
        return "".join(parts)

    def index(self):
        cur = self.current
        status = ""
        if cur is not None:
            state = ("failed: " + cur.error if cur.error else
                     "done" if cur.done else
                     f"running {len(cur.results)}/{cur.total or '?'} cases")
            status = (f"<p><b>{html.escape(cur.label)}</b>: {state} "
                      f"({time.time() - cur.started:.0f} s)"
                      + ("" if cur.done else
                         " — <a href='/'>refresh</a>") + "</p>")
        opts = lambda vals: "".join(
            f"<option>{v}</option>" for v in vals)
        runs = self.stored_runs()
        rows = "".join(
            f"<tr><td><a href='/run?f={urllib.parse.quote(name)}'>"
            f"{html.escape(name)}</a></td>"
            f"<td>{p.get('summary', {}).get('cases', '?')}</td>"
            f"<td>{p.get('summary', {}).get('mean_sp', '?')}</td>"
            f"<td>{p.get('summary', {}).get('mean_tc', '?')}</td></tr>"
            for name, p in runs)
        return (f"<!doctype html><html><head><style>{report_mod._CSS}"
                "</style><title>kalign-tpu benchmarks</title></head><body>"
                "<h1>kalign-tpu benchmark dashboard</h1>"
                f"{status}"
                "<form action='/launch' method='get'>"
                f"dataset <select name='dataset'>{opts(_DATASETS)}</select> "
                f"mode <select name='mode'>{opts(_MODES)}</select> "
                f"engine <select name='engine'>{opts(_ENGINES)}</select> "
                "<button>run</button></form>"
                f"{self._chart(runs)}"
                "<table><caption>Stored runs</caption>"
                "<tr><th>file</th><th>cases</th><th>mean SP</th>"
                f"<th>mean TC</th></tr>{rows}</table>"
                "</body></html>")

    def run_view(self, fname):
        f = self.results_dir / Path(fname).name
        if not f.exists():
            return "<p>not found</p>"
        return report_mod.render(json.loads(f.read_text()))


def make_handler(app):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, body, code=200):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urllib.parse.urlparse(self.path)
            q = urllib.parse.parse_qs(u.query)
            if u.path == "/":
                self._send(app.index())
            elif u.path == "/launch":
                app.launch(q.get("dataset", ["all"])[0],
                           q.get("mode", ["default"])[0],
                           q.get("engine", ["host"])[0])
                self.send_response(303)
                self.send_header("Location", "/")
                self.end_headers()
            elif u.path == "/run":
                self._send(app.run_view(q.get("f", [""])[0]))
            else:
                self._send("<p>not found</p>", 404)
    return Handler


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmarks.app")
    p.add_argument("--port", type=int, default=8050)
    p.add_argument("--results-dir", default=str(RESULTS_DIR))
    args = p.parse_args(argv)
    app = _App(args.results_dir)
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(app))
    print(f"serving on http://127.0.0.1:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
