"""Gates for the dependency-free SVG visualisation surface: the output
is exact XML, so structure (element counts, coordinates, monotone
color mapping) is asserted instead of pixels."""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from dtaidistance_spark import kernels as K
from dtaidistance_spark import visualisation as V

S1 = np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0])
S2 = np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0])

NS = {"svg": "http://www.w3.org/2000/svg"}


def _parse(svg: str):
    return ET.fromstring(svg)


class TestPlotWarping:
    def test_structure(self):
        svg = V.plot_warping(S1, S2)
        root = _parse(svg)  # well-formed XML
        lines = root.findall("svg:line", NS)
        polys = root.findall("svg:polyline", NS)
        _, m = K.warping_paths(S1, S2)
        path = K.best_path(m)
        assert len(lines) == len(path)  # one segment per path pair
        assert len(polys) == 2  # both series
        pts1 = polys[0].get("points").split()
        pts2 = polys[1].get("points").split()
        assert len(pts1) == len(S1) and len(pts2) == len(S2)

    def test_alignment_endpoints_touch_series(self):
        svg = V.plot_warping(S1, S2)
        root = _parse(svg)
        polys = root.findall("svg:polyline", NS)
        p1 = {tuple(map(float, p.split(","))) for p in polys[0].get("points").split()}
        p2 = {tuple(map(float, p.split(","))) for p in polys[1].get("points").split()}
        for ln in root.findall("svg:line", NS):
            a = (float(ln.get("x1")), float(ln.get("y1")))
            b = (float(ln.get("x2")), float(ln.get("y2")))
            assert any(abs(a[0]-q[0]) < 0.02 and abs(a[1]-q[1]) < 0.02 for q in p1)
            assert any(abs(b[0]-q[0]) < 0.02 and abs(b[1]-q[1]) < 0.02 for q in p2)

    def test_explicit_path_and_file(self, tmp_path):
        path = [(0, 0), (1, 1), (2, 2)]
        f = tmp_path / "warp.svg"
        svg = V.plot_warping(S1, S2, path=path, filename=str(f))
        assert f.read_text() == svg
        assert len(_parse(svg).findall("svg:line", NS)) == 3


class TestPlotWarpingPaths:
    def test_heatmap_shading_monotone_in_cost(self):
        svg = V.plot_warpingpaths(S1, S2)
        root = _parse(svg)
        cells = [e for e in root.findall("svg:rect", NS)
                 if e.get("class") == "cell"]
        _, m = K.warping_paths(S1, S2)
        body = m[1:, 1:]
        finite = int(np.isfinite(body).sum())
        assert len(cells) == finite
        # reconstruct (i, j) -> gray and check anti-monotonicity vs cost
        cell = 6.0
        margin = 6.0 * cell
        grays = {}
        for e in cells:
            i = round((float(e.get("y")) - margin) / cell)
            j = round((float(e.get("x")) - margin) / cell)
            grays[(i, j)] = int(re.match(r"rgb\((\d+),", e.get("fill")).group(1))
        items = sorted(grays)
        for a in items:
            for b in items:
                if body[a] < body[b]:
                    assert grays[a] >= grays[b], (a, b)
        # path polyline ends at the bottom-right cell
        polys = root.findall("svg:polyline", NS)
        px, py = map(float, polys[0].get("points").split()[-1].split(","))
        assert px == pytest.approx(margin + (len(S2) - 0.5) * cell, abs=0.01)
        assert py == pytest.approx(margin + (len(S1) - 0.5) * cell, abs=0.01)

    def test_banded_matrix_skips_inf_cells(self):
        svg = V.plot_warpingpaths(S1, S2, window=2)
        root = _parse(svg)
        cells = [e for e in root.findall("svg:rect", NS)
                 if e.get("class") == "cell"]
        _, m = K.warping_paths(S1, S2, window=2)
        assert len(cells) == int(np.isfinite(m[1:, 1:]).sum())
        assert len(cells) < len(S1) * len(S2)  # band really pruned


class TestPlotLinkage:
    def _z(self):
        rows = [
            {"id_a": "0", "id_b": "1", "dist": 1.0},
            {"id_a": "2", "id_b": "3", "dist": 2.0},
            {"id_a": "0", "id_b": "2", "dist": 5.0},
        ]
        from dtaidistance_spark.clustering.hierarchical import linkage_matrix

        return linkage_matrix(rows, 4)

    def test_structure_and_labels(self):
        Z = self._z()
        svg = V.plot_linkage(Z, labels=["a", "b", "c", "d"])
        root = _parse(svg)
        merges = [e for e in root.findall("svg:path", NS)
                  if e.get("class") == "merge"]
        texts = [e.text for e in root.findall("svg:text", NS)]
        assert len(merges) == len(Z) == 3
        assert sorted(texts) == ["a", "b", "c", "d"]

    def test_inf_merge_drawn_dashed(self):
        rows = [{"id_a": "0", "id_b": "1", "dist": 1.0}]  # 2 comps of 3
        from dtaidistance_spark.clustering.hierarchical import linkage_matrix

        Z = linkage_matrix(rows, 3)
        assert math.isinf(Z[-1][2])
        root = _parse(V.plot_linkage(Z))
        dashes = [e for e in root.findall("svg:path", NS)
                  if e.get("stroke-dasharray")]
        assert len(dashes) == 1

    def test_compat_surfaces(self, tmp_path):
        from dtaidistance_spark.compat import clustering, dtw_visualisation

        series = [np.array([0.0, 0, 0]), np.array([0.1, 0, 0]),
                  np.array([5.0, 5, 5]), np.array([5.1, 5, 5])]
        lt = clustering.hierarchical.LinkageTree()
        lt.fit(series)
        f = tmp_path / "dendro.svg"
        svg = lt.plot(filename=str(f))
        assert f.read_text() == svg and svg.startswith("<svg")
        svg2 = dtw_visualisation.plot_warping(S1, S2)
        svg3 = dtw_visualisation.plot_warpingpaths(S1, S2)
        assert svg2.startswith("<svg") and svg3.startswith("<svg")
        _parse(svg2), _parse(svg3)
