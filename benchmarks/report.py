"""Static HTML report from benchmark results JSON (the reference ships
a Dash dashboard, benchmarks/app.py; this emits a dependency-free
single file instead).

    python -m benchmarks --json results.json
    python -m benchmarks.report results.json report.html
"""

import argparse
import html
import json
import sys

_CSS = """
body{font-family:system-ui,sans-serif;margin:2em;max-width:70em}
table{border-collapse:collapse;margin:1em 0}
td,th{border:1px solid #ccc;padding:.3em .6em;text-align:right}
th{background:#f0f0f0}
td:first-child,th:first-child{text-align:left}
.bar{display:inline-block;height:.8em;background:#4a7;vertical-align:middle}
caption{font-weight:bold;text-align:left;padding:.3em 0}
"""


def _bar(frac, width=120):
    w = max(0, min(int(frac * width), width))
    return f'<span class="bar" style="width:{w}px"></span>'


def render(payload):
    out = ["<!doctype html><html><head><meta charset='utf-8'>"
           f"<title>kalign-tpu benchmark report</title>"
           f"<style>{_CSS}</style></head><body>"]
    s = payload.get("summary", {})
    out.append(f"<h1>kalign-tpu benchmark report</h1>"
               f"<p>engine <b>{html.escape(str(payload.get('engine')))}</b>, "
               f"mode <b>{html.escape(str(payload.get('mode')))}</b> — "
               f"{s.get('cases', '?')} cases, mean SP "
               f"<b>{s.get('mean_sp', '?')}</b>, mean TC "
               f"<b>{s.get('mean_tc', '?')}</b>, total wall "
               f"{s.get('total_wall_s', '?')} s</p>")

    out.append("<table><caption>Per category</caption>"
               "<tr><th>category</th><th>cases</th><th>mean SP</th>"
               "<th></th><th>mean TC</th><th></th><th>wall (s)</th></tr>")
    for c in payload.get("categories", []):
        out.append(
            f"<tr><td>{html.escape(c['category'])}</td><td>{c['cases']}"
            f"</td><td>{c['mean_sp']:.4f}</td><td>{_bar(c['mean_sp'])}"
            f"</td><td>{c['mean_tc']:.4f}</td><td>{_bar(c['mean_tc'])}"
            f"</td><td>{c['total_wall_s']:.2f}</td></tr>")
    out.append("</table>")

    out.append("<table><caption>Per case</caption>"
               "<tr><th>case</th><th>category</th><th>n</th><th>SP</th>"
               "<th>TC</th><th>precision</th><th>F1</th><th>wall (s)</th>"
               "<th>external</th></tr>")
    for r in payload.get("results", []):
        ext = ", ".join(
            f"{e['tool']} SP {e['sp']:.3f} ({e['wall_s']:.1f}s)"
            for e in r.get("external", []))
        out.append(
            f"<tr><td>{html.escape(r['case'])}</td>"
            f"<td>{html.escape(r['category'])}</td><td>{r['n_seqs']}</td>"
            f"<td>{r['sp']:.4f}</td><td>{r['tc']:.4f}</td>"
            f"<td>{r['precision']:.4f}</td><td>{r['f1']:.4f}</td>"
            f"<td>{r['wall_s']:.2f}</td><td>{html.escape(ext)}</td></tr>")
    out.append("</table>")

    t = payload.get("throughput")
    if t:
        out.append(f"<p>Throughput: <b>{t['value']}</b> alignments/s "
                   f"({t['families']} x {t['n_seq']} seqs x {t['length']} aa, "
                   f"engine {html.escape(t['engine'])})</p>")
    out.append("</body></html>")
    return "\n".join(out)


def main(argv=None):
    p = argparse.ArgumentParser(prog="benchmarks.report")
    p.add_argument("results")
    p.add_argument("output", nargs="?", default="report.html")
    args = p.parse_args(argv)
    payload = json.load(open(args.results))
    with open(args.output, "w") as fh:
        fh.write(render(payload))
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
