"""Bench ladder-protection routing (bench.py::ladder_path).

The committed per-round bench artifact (``bench_local_rNN.json``) is the
idle-machine per-query history; VERDICT r8 item 3 documented a loaded
driver rerun (loadavg 10.94, only 1.21x slower) clobbering it because the
old guard also required a 1.5x slowdown. The contract now: with an
existing ladder file, a LOADED machine always routes to the ``-contended``
sidecar (no ratio test); an idle machine always writes the main file —
idle-but-slower is a genuine regression that belongs in the ladder.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ladder_path  # noqa: E402

IDLE_LOAD = 0.5
LOADED = (os.cpu_count() or 8)  # way above the cpu/4 threshold


def test_first_run_always_writes_main_file(tmp_path):
    # nothing committed yet: even a loaded run creates the main file
    # (some artifact beats no artifact; the next idle run replaces it)
    p = ladder_path(str(tmp_path), "09", LOADED, 9.9)
    assert p.endswith("bench_local_r09.json")


def test_loaded_rerun_routes_to_sidecar_regardless_of_ratio(tmp_path):
    (tmp_path / "bench_local_r09.json").write_text('{"value": 44.8}\n')
    # loadavg alone trips the guard — no slowdown-ratio escape hatch
    p = ladder_path(str(tmp_path), "09", LOADED, 0.1)
    assert p.endswith("bench_local_r09-contended.json")
    # a slow calibration probe alone also trips it
    p = ladder_path(str(tmp_path), "09", IDLE_LOAD, 2.5)
    assert p.endswith("bench_local_r09-contended.json")


def test_idle_rerun_overwrites_main_file(tmp_path):
    (tmp_path / "bench_local_r09.json").write_text('{"value": 44.8}\n')
    # idle machine: main file, even though this could be a slower run —
    # an idle regression is real data, not contention noise
    p = ladder_path(str(tmp_path), "09", IDLE_LOAD, 0.1)
    assert p.endswith("bench_local_r09.json")


def test_nondefault_scale_factor_routes_to_sidecar(tmp_path, monkeypatch):
    # an idle x10 probe must never clobber the committed x5 ladder file
    monkeypatch.setenv("SPARK_GRAFT_SCALE_FACTOR", "10")
    p = ladder_path(str(tmp_path), "12", 0.1, 0.8)
    assert p.endswith("bench_local_r12_x10.json")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_FACTOR", "5")
    p = ladder_path(str(tmp_path), "12", 0.1, 0.8)
    assert p.endswith("bench_local_r12.json")


def test_factor_one_is_a_main_file_run(tmp_path, monkeypatch):
    # ADVICE r12: factor=1 only disables the scale check — the base
    # ladder is identical, so an idle base-only rerun must refresh the
    # main file, not vanish into an _x1 sidecar
    monkeypatch.setenv("SPARK_GRAFT_SCALE_FACTOR", "1")
    p = ladder_path(str(tmp_path), "13", IDLE_LOAD, 0.1)
    assert p.endswith("bench_local_r13.json")


def test_moderate_loadavg_routes_to_sidecar(tmp_path):
    # VERDICT r12 item 2: the r12 clobber ran at loadavg 4.23 — under
    # the old cpus/4=8 bar but far from idle. Absolute bar is now 2.0.
    (tmp_path / "bench_local_r13.json").write_text('{"value": 79.6}\n')
    p = ladder_path(str(tmp_path), "13", 4.23, 0.1)
    assert p.endswith("bench_local_r13-contended.json")


def test_nondefault_sf_dir_routes_to_sidecar(tmp_path):
    # an sf0.01 smoke run must never replace the sf0.1 ladder file
    p = ladder_path(str(tmp_path), "13", IDLE_LOAD, 0.1, sf=0.01)
    assert p.endswith("bench_local_r13_sf0p01.json")
    p = ladder_path(str(tmp_path), "13", IDLE_LOAD, 0.1, sf=0.1)
    assert p.endswith("bench_local_r13.json")


def test_calibration_drift_vs_committed_artifact_routes_to_sidecar(tmp_path):
    # even an apparently-idle run (low loadavg, calibration under the
    # absolute 2.0s bar) is contended if its calibration loop drifted
    # >15% from the value the committed artifact itself recorded
    (tmp_path / "bench_local_r13.json").write_text(
        '{"value": 79.6, "machine": {"calibration_sec": 1.0}}\n'
    )
    p = ladder_path(str(tmp_path), "13", IDLE_LOAD, 1.2)
    assert p.endswith("bench_local_r13-contended.json")
    # within 15%: main file
    p = ladder_path(str(tmp_path), "13", IDLE_LOAD, 1.1)
    assert p.endswith("bench_local_r13.json")


def test_factor_one_never_clobbers_scale_check(tmp_path, monkeypatch):
    # ADVICE r13: factor=1 skips the scale check entirely, so letting it
    # overwrite a committed main file that CARRIES a scale_check section
    # would silently drop the per-query slope evidence — route to an
    # _x1 sidecar in exactly that case
    monkeypatch.setenv("SPARK_GRAFT_SCALE_FACTOR", "1")
    (tmp_path / "bench_local_r14.json").write_text(
        '{"value": 100.0, "scale_check": {"slope": 1.19},'
        ' "machine": {"calibration_sec": 1.0}}\n'
    )
    p = ladder_path(str(tmp_path), "14", IDLE_LOAD, 1.0)
    assert p.endswith("bench_local_r14_x1.json")
    # a main file WITHOUT a scale_check is still replaceable by factor=1
    (tmp_path / "bench_local_r14.json").write_text(
        '{"value": 100.0, "machine": {"calibration_sec": 1.0}}\n'
    )
    p = ladder_path(str(tmp_path), "14", IDLE_LOAD, 1.0)
    assert p.endswith("bench_local_r14.json")
