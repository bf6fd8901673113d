"""SVG eval-curve renderer (scripts/plot_eval.py) — the rebuild of the
reference's MAE/RMSE graphics (``scripts/plot_all_exec.py:21-31``,
``graphics/*_songs/``). No Ray needed: pure rendering."""

from __future__ import annotations

import os
import sys
import xml.etree.ElementTree as ET

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROWS = [
    {"n_docs": 500, "mrr": 0.98, "top1_acc": 0.96, "jaccard_mae": 0.012,
     "jaccard_rmse": 0.020, "wall_s": 3.1},
    {"n_docs": 2000, "mrr": 0.95, "top1_acc": 0.92, "jaccard_mae": 0.015,
     "jaccard_rmse": 0.024, "wall_s": 5.6},
    {"n_docs": 8000, "mrr": 0.93, "top1_acc": 0.90, "jaccard_mae": 0.018,
     "jaccard_rmse": 0.029, "wall_s": 11.2},
]

SVG_NS = "{http://www.w3.org/2000/svg}"


def _render(tmp_path):
    from scripts.plot_eval import render_all
    return render_all(ROWS, str(tmp_path))


def test_renders_three_valid_svgs(tmp_path):
    paths = _render(tmp_path)
    assert [os.path.basename(p) for p in paths] == [
        "eval_error.svg", "eval_retrieval.svg", "eval_wall.svg"]
    for p in paths:
        root = ET.parse(p).getroot()  # well-formed XML
        assert root.tag == f"{SVG_NS}svg"
        assert root.get("role") == "img" and root.get("aria-label")


def test_series_geometry_and_labels(tmp_path):
    paths = _render(tmp_path)
    err = ET.parse(paths[0]).getroot()
    lines = err.findall(f"{SVG_NS}polyline")
    assert len(lines) == 2  # MAE + RMSE
    texts = [t.text for t in err.findall(f"{SVG_NS}text")]
    # legend + direct end-labels for both series; x ticks at data points
    assert texts.count("MAE") == 2 and texts.count("RMSE") == 2
    for n in ("500", "2,000", "8,000"):
        assert n in texts
    # markers: one per point per series, r=4 with surface ring
    circles = [c for c in err.findall(f"{SVG_NS}circle")
               if c.get("r") == "4" and c.get("stroke")]
    assert len(circles) == 2 * len(ROWS)
    # y increases downward: MAE rises with corpus size in the fixture,
    # so the polyline's y coordinates must be strictly decreasing in SVG y
    mae_pts = [tuple(map(float, p.split(",")))
               for p in lines[0].get("points").split()]
    assert mae_pts[0][1] > mae_pts[1][1] > mae_pts[2][1]
    assert mae_pts[0][0] < mae_pts[1][0] < mae_pts[2][0]


def test_single_series_has_no_legend(tmp_path):
    paths = _render(tmp_path)
    wall = ET.parse(paths[2]).getroot()
    assert len(wall.findall(f"{SVG_NS}polyline")) == 1
    # exactly one "wall s" text: the direct end-label, no legend row
    texts = [t.text for t in wall.findall(f"{SVG_NS}text")]
    assert texts.count("wall s") == 1


def test_handles_none_metric(tmp_path):
    from scripts.plot_eval import render_all
    rows = [dict(r) for r in ROWS]
    rows[1]["jaccard_mae"] = None  # sweep emits None when no golden hits
    paths = render_all(rows, str(tmp_path))
    err = ET.parse(paths[0]).getroot()
    lines = err.findall(f"{SVG_NS}polyline")
    assert len(lines) == 2
    # the MAE polyline skips the None point
    assert len(lines[0].get("points").split()) == 2
