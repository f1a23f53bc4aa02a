"""Unit tests for the doc build step (render_docs.py).

The drift guard (tests/test_docs.py) depends on render_docs extracting the
right figures from the bench artifacts and rewriting exactly the marker
spans — exercise that machinery against synthetic artifacts in a tmp root.
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

import render_docs  # noqa: E402

TAIL = (
    "device: TPU v5 lite0\n"
    "TPI-2000m (size 67): 0.4 ms/tile -> 2800 Mpixel/s (spread 2.0%)\n"
    "Sx-500m (240 ray px): 0.4 ms/tile -> 3200 Mpixel/s (spread 2.0%)\n"
)
DETAILS = (
    "| 8192x8192 (67 Mpix): TPI-2000m / Sx-500m (Pallas) | "
    "16.0 ms (4100 Mpix/s) / 12.0 ms (5400 Mpix/s, grouped-VPU roofline "
    "1.4 ms -> 11%) |\n"
    "| fused | 2.6 ms total = 0.44 ms per descriptor-scale (2900 Mpix/s) |\n"
)


def _make_root(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(json.dumps({"tail": TAIL}))
    (tmp_path / "BENCH_DETAILS.md").write_text(DETAILS)
    (tmp_path / "README.md").write_text(
        "TPI-2000m <!--F:tpi_headline-->1<!--/F--> Mpixel/s, "
        "Sx <!--F:sx_headline-->2<!--/F--> Mpixel/s, "
        "8192: <!--F:tpi_8192-->3<!--/F--> / <!--F:sx_8192-->4<!--/F-->, "
        "fused <!--F:fused_ms-->5<!--/F--> ms, "
        "unknown <!--F:nonexistent-->keep<!--/F-->\n"
    )
    return tmp_path


def test_figures_extracted_from_artifacts(tmp_path):
    figs = render_docs.figures_from_artifacts(_make_root(tmp_path))
    assert figs == {
        "tpi_headline": "2800",
        "sx_headline": "3200",
        "tpi_8192": "4100",
        "sx_8192": "5400",
        "fused_ms": "0.44",
    }


def test_refresh_rewrites_only_known_spans(tmp_path):
    root = _make_root(tmp_path)
    changed = render_docs.refresh(root=root)
    assert changed
    text = (root / "README.md").read_text()
    assert "<!--F:tpi_headline-->2800<!--/F-->" in text
    assert "<!--F:sx_headline-->3200<!--/F-->" in text
    assert "<!--F:fused_ms-->0.44<!--/F-->" in text
    # spans without a fresh value are left untouched, markers intact
    assert "<!--F:nonexistent-->keep<!--/F-->" in text
    # idempotent: a second refresh is a no-op, check mode agrees
    assert not render_docs.refresh(root=root)
    assert not render_docs.refresh(root=root, check=True)


def test_check_mode_detects_staleness_without_writing(tmp_path):
    root = _make_root(tmp_path)
    before = (root / "README.md").read_text()
    assert render_docs.refresh(root=root, check=True)
    assert (root / "README.md").read_text() == before  # nothing written
