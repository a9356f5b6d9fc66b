"""CLI entry-point smoke tests (demo / map / lab).

The reference's only entry points are ROS node main()s; the CLI is this
framework's equivalent operator surface (`python -m kissmpc_tpu.cli ...`).
"""

import os

import numpy as np

from kissmpc_tpu.cli import main


def test_cli_demo_runs(capsys):
    rc = main(["demo", "--horizon", "10", "--dt", "0.1", "--ticks", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tick" in out.lower() or out.strip()


def test_cli_map_packs_synthetic_pgm(tmp_path):
    # binary P5 occupancy map: free field with one dark blob
    H, W = 40, 60
    img = np.full((H, W), 254, np.uint8)
    img[10:20, 20:35] = 0
    p = tmp_path / "m.pgm"
    with open(p, "wb") as f:
        f.write(f"P5\n{W} {H}\n255\n".encode())
        f.write(img.tobytes())
    out = tmp_path / "c.npz"
    rc = main(["map", str(p), "-o", str(out), "--min-radius", "2.0"])
    assert rc == 0
    data = np.load(out)
    assert len(data["radii"]) >= 1


def test_cli_lab_runs_if_map_available(capsys):
    map_path = "/root/reference/obstacle_handling/rrc_lab.pgm"
    if not os.path.exists(map_path):
        import pytest

        pytest.skip("reference lab map not available")
    rc = main([
        "lab", "--map", map_path, "--batch", "4", "--ticks", "3",
        "--horizon", "10", "--dt", "0.1",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "circles" in out and "tick" in out
