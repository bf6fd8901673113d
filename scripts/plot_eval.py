"""Render the eval sweep as SVG curves — rebuild of the reference's
MAE/RMSE-vs-corpus-size graphics (``scripts/plot_all_exec.py:21-31``,
``graphics/*_songs/``) without a plotting dependency: the charts are
emitted as standalone SVG by a small pure-Python writer.

Reads the JSON-lines emitted by ``scripts/sweep.py`` (one object per
corpus size: n_docs, mrr, top1_acc, jaccard_mae, jaccard_rmse, wall_s)
and writes three charts into ``graphics/``:

- ``eval_error.svg``      — Jaccard-estimate MAE + RMSE vs corpus size
- ``eval_retrieval.svg``  — MRR + top-1 accuracy vs corpus size
- ``eval_wall.svg``       — search wall seconds vs corpus size

Usage: python scripts/plot_eval.py sweep.jsonl [--out graphics/]
       python scripts/sweep.py --sizes 500,1000,2000 | python scripts/plot_eval.py -
"""

from __future__ import annotations

import argparse
import html
import json
import math
import os
import sys

# Palette: first two categorical slots (fixed order) of the validated
# default palette; light-mode surface + text tokens. Two-series charts
# use slots 1-2; validated adjacent CVD dE 24.7 / normal 33.6 (PASS).
SERIES = ["#2a78d6", "#eb6834"]
SURFACE = "#fcfcfb"
TEXT_PRIMARY = "#0b0b0b"
TEXT_SECONDARY = "#52514e"
GRID = "#e4e3e0"

W, H = 560, 340
ML, MR, MT, MB = 62, 96, 46, 44  # right margin fits direct labels
FONT = "font-family='system-ui,sans-serif'"


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n round-valued ticks covering [lo, hi] (lo/hi may be equal)."""
    if hi <= lo:
        hi = lo + (abs(lo) or 1.0)
    span = hi - lo
    step = 10 ** math.floor(math.log10(span / n))
    for m in (1, 2, 2.5, 5, 10):
        if span / (step * m) <= n:
            step *= m
            break
    t0 = math.floor(lo / step) * step
    ticks = []
    t = t0
    while t <= hi + step * 1e-9:
        if t >= lo - step * 1e-9:
            ticks.append(round(t, 10))
        t += step
    return ticks or [lo, hi]


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e6:
        return f"{int(v):,}"
    return f"{v:.4g}"


def line_chart(rows: list[dict], series: list[tuple[str, str]], *,
               title: str, y_label: str, y_zero: bool = True) -> str:
    """One SVG line chart: x = n_docs (log scale), one polyline per
    (key, label) in ``series``. Colors follow the fixed slot order."""
    xs = [r["n_docs"] for r in rows]
    lx = [math.log10(x) for x in xs]
    x0, x1 = min(lx), max(lx) or 1.0
    if x1 == x0:
        x0, x1 = x0 - 0.5, x1 + 0.5
    ys_all = [float(r[k]) for k, _ in series for r in rows
              if r.get(k) is not None]
    ylo = 0.0 if y_zero else min(ys_all)
    yticks = _nice_ticks(ylo, max(ys_all))
    ylo, yhi = yticks[0], yticks[-1]
    pw, ph = W - ML - MR, H - MT - MB

    def X(v: float) -> float:
        return ML + (math.log10(v) - x0) / (x1 - x0) * pw

    def Y(v: float) -> float:
        return MT + ph - (v - ylo) / (yhi - ylo) * ph

    out = [f"<svg xmlns='http://www.w3.org/2000/svg' width='{W}' "
           f"height='{H}' viewBox='0 0 {W} {H}' role='img' "
           f"aria-label='{html.escape(title)}'>",
           f"<rect width='{W}' height='{H}' fill='{SURFACE}'/>",
           f"<text x='{ML}' y='24' {FONT} font-size='15' "
           f"font-weight='600' fill='{TEXT_PRIMARY}'>"
           f"{html.escape(title)}</text>"]
    # recessive grid + y ticks
    for t in yticks:
        y = Y(t)
        out.append(f"<line x1='{ML}' y1='{y:.1f}' x2='{W - MR}' "
                   f"y2='{y:.1f}' stroke='{GRID}' stroke-width='1'/>")
        out.append(f"<text x='{ML - 8}' y='{y + 4:.1f}' {FONT} "
                   f"font-size='11' text-anchor='end' "
                   f"fill='{TEXT_SECONDARY}'>{_fmt(t)}</text>")
    # x ticks at the data points
    for v in xs:
        x = X(v)
        out.append(f"<line x1='{x:.1f}' y1='{MT + ph}' x2='{x:.1f}' "
                   f"y2='{MT + ph + 4}' stroke='{TEXT_SECONDARY}' "
                   f"stroke-width='1'/>")
        out.append(f"<text x='{x:.1f}' y='{MT + ph + 17}' {FONT} "
                   f"font-size='11' text-anchor='middle' "
                   f"fill='{TEXT_SECONDARY}'>{_fmt(v)}</text>")
    out.append(f"<text x='{ML + pw / 2:.0f}' y='{H - 8}' {FONT} "
               f"font-size='11' text-anchor='middle' "
               f"fill='{TEXT_SECONDARY}'>corpus size (docs, log scale)"
               f"</text>")
    out.append(f"<text x='14' y='{MT + ph / 2:.0f}' {FONT} "
               f"font-size='11' text-anchor='middle' "
               f"fill='{TEXT_SECONDARY}' "
               f"transform='rotate(-90 14 {MT + ph / 2:.0f})'>"
               f"{html.escape(y_label)}</text>")
    # series: 2px line, 8px (r=4) markers with a 2px surface ring,
    # direct label at the line end (identity never color-alone)
    for i, (key, label) in enumerate(series):
        color = SERIES[i]
        pts = [(X(r["n_docs"]), Y(float(r[key]))) for r in rows
               if r.get(key) is not None]
        if not pts:
            continue
        path = " ".join(f"{x:.1f},{y:.1f}" for x, y in pts)
        out.append(f"<polyline points='{path}' fill='none' "
                   f"stroke='{color}' stroke-width='2' "
                   f"stroke-linejoin='round'/>")
        for x, y in pts:
            out.append(f"<circle cx='{x:.1f}' cy='{y:.1f}' r='4' "
                       f"fill='{color}' stroke='{SURFACE}' "
                       f"stroke-width='2'/>")
        ex, ey = pts[-1]
        out.append(f"<text x='{ex + 8:.1f}' y='{ey + 4:.1f}' {FONT} "
                   f"font-size='11' fill='{TEXT_PRIMARY}'>"
                   f"{html.escape(label)}</text>")
    # legend row (>= 2 series; single-series charts skip it)
    if len(series) > 1:
        lx_pos = ML
        for i, (_, label) in enumerate(series):
            out.append(f"<circle cx='{lx_pos + 4}' cy='{MT - 10}' r='4' "
                       f"fill='{SERIES[i]}'/>")
            out.append(f"<text x='{lx_pos + 12}' y='{MT - 6}' {FONT} "
                       f"font-size='11' fill='{TEXT_PRIMARY}'>"
                       f"{html.escape(label)}</text>")
            lx_pos += 12 + 7 * len(label) + 18
    out.append("</svg>")
    return "\n".join(out)


def render_all(rows: list[dict], out_dir: str) -> list[str]:
    rows = sorted(rows, key=lambda r: r["n_docs"])
    os.makedirs(out_dir, exist_ok=True)
    charts = [
        ("eval_error.svg",
         line_chart(rows, [("jaccard_mae", "MAE"),
                           ("jaccard_rmse", "RMSE")],
                    title="Jaccard-estimate error vs corpus size",
                    y_label="error")),
        ("eval_retrieval.svg",
         line_chart(rows, [("mrr", "MRR"), ("top1_acc", "top-1 acc")],
                    title="Retrieval quality vs corpus size",
                    y_label="score")),
        ("eval_wall.svg",
         line_chart(rows, [("wall_s", "wall s")],
                    title="Search wall time vs corpus size",
                    y_label="seconds")),
    ]
    paths = []
    for name, svg in charts:
        p = os.path.join(out_dir, name)
        with open(p, "w") as f:
            f.write(svg)
        paths.append(p)
    return paths


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="sweep JSONL file, or - for stdin")
    ap.add_argument("--out", default="graphics")
    args = ap.parse_args()
    src = sys.stdin if args.input == "-" else open(args.input)
    rows = []
    for ln in src:
        ln = ln.strip()
        if ln.startswith("{"):
            rows.append(json.loads(ln))
    if not rows:
        print("no sweep rows found", file=sys.stderr)
        return 1
    for p in render_all(rows, args.out):
        print(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
