"""Auto-running field parity: whenever diffusers AND a cached checkpoint
exist on the host, the end-to-end checkpoint comparison (our fp32 frame
program vs diffusers fp32 CPU — BASELINE config 1) runs as part of the
suite; zero-egress CI skips and relies on the composed torch-parity tier
(test_torch_parity_composed.py)."""

import os

import pytest

pytestmark = pytest.mark.slow


def test_field_parity_runs_when_assets_present(capsys):
    pytest.importorskip("diffusers")
    from videosd_tpu.tools.parity import DEFAULT_MODEL, find_snapshot, main

    snap = os.environ.get("VIDEOSD_SNAPSHOT") or find_snapshot(DEFAULT_MODEL)
    if snap is None:
        pytest.skip(f"no cached snapshot of {DEFAULT_MODEL}")
    rc = main(["--weights", snap, "--size", "256", "--steps", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "psnr:" in out


def test_find_snapshot_layout(tmp_path):
    """find_snapshot resolves the HF-hub cache layout (newest snapshot)."""
    from videosd_tpu.tools.parity import find_snapshot

    d = tmp_path / "models--a--b" / "snapshots"
    (d / "old").mkdir(parents=True)
    (d / "new").mkdir()
    os.utime(d / "old", (1, 1))
    assert find_snapshot("a/b", cache=str(tmp_path)).endswith("new")
    assert find_snapshot("missing/repo", cache=str(tmp_path)) is None
